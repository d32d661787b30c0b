"""Trace-affecting environment knobs, resolved ONCE at import.

Every knob here selects between algorithm variants at TRACE time; all
variants return identical group elements, but the traced programs differ.
Consumers (ops/field.py, ops/msm.py) read the module attributes — never
``os.environ`` directly — and the persistent AOT store (utils/aot.py) keys
artifacts on :func:`snapshot`, which reads those same live attributes back
from the consumer modules. Key and behavior therefore always come from the
same source: mutating the environment after import changes neither, and
monkeypatching a consumer attribute (tests do) changes both.
"""

from __future__ import annotations

import os

#: "0" = force XLA path, "1" = force pallas (interpret off-TPU), "auto"
PALLAS: str = os.environ.get("VKZG_PALLAS", "auto")

#: balanced signed-digit windows for Pippenger (VKZG_SIGNED=0 -> unsigned)
SIGNED: bool = os.environ.get("VKZG_SIGNED", "1") != "0"

#: unroll factor for the CIOS rounds scan (1 = smallest compile graphs)
MUL_UNROLL: int = int(os.environ.get("VKZG_MUL_UNROLL", "1"))

#: override for the single-MSM Pippenger window width (None = mode-aware
#: default, ops/msm.py::_auto_c)
WINDOW_C: int | None = None
_wc = os.environ.get("VKZG_WINDOW_C", "")
if _wc:
    WINDOW_C = int(_wc)
    if not 1 <= WINDOW_C <= 16:
        raise ValueError(
            f"VKZG_WINDOW_C must be an integer in [1, 16], got {_wc!r}"
        )


def snapshot() -> str:
    """The RESOLVED trace-affecting knob state, read live from the modules
    that consume each knob (utils/aot.py hashes this into artifact keys)."""
    from .ops import field as _field
    from .ops import msm as _msm

    return (
        f"pallas={_msm._PALLAS_ENV};signed={_msm._signed_default()};"
        f"unroll={_field._MUL_UNROLL};window_c={_msm._WINDOW_C}"
    )
