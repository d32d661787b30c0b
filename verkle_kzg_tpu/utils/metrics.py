"""Lightweight host-side observability counters.

The reference has no metrics at all (SURVEY.md §5: one println in a bench).
Here the protocol layers record the work they dispatch — MSM sizes, batch
shapes, transcript digests — so production deployments can account for
device work without profiling overhead. Counters are process-local and
explicitly reset; recording costs a dict update.

Counters fire at the PYTHON call layer: a ``record`` reached inside a
``jax.jit``-traced function runs once per compilation, not per execution —
the wired call sites (scheme commits/proves, verkle commit passes, msm_*
entry points) are all eager-side for this reason.
"""

from __future__ import annotations

import collections
import contextlib
import time

_COUNTERS: dict = collections.defaultdict(float)


def record(name: str, value: float = 1.0) -> None:
    """Accumulate ``value`` into counter ``name``."""
    _COUNTERS[name] += value


def counters() -> dict:
    """Snapshot of all counters."""
    return dict(_COUNTERS)


def reset_counters() -> None:
    _COUNTERS.clear()


@contextlib.contextmanager
def timed_region(name: str):
    """Accumulates wall seconds into ``<name>.seconds`` and a call count
    into ``<name>.calls``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record(f"{name}.seconds", time.perf_counter() - t0)
        record(f"{name}.calls")
