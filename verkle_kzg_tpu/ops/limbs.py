"""Host <-> device conversion between python bigints and limb planes.

Device representation: little-endian 16-bit limbs stored as uint32, shape
(..., NLIMBS). All heavy modular arithmetic happens on these planes
(ops/field.py); these helpers only run on the host at protocol boundaries.
"""

from __future__ import annotations

import numpy as np

from ..params import LIMB_BITS, LIMB_MASK, NLIMBS


def ints_to_limbs(xs, nlimbs: int = NLIMBS) -> np.ndarray:
    """list/array of python ints -> (len(xs), nlimbs) uint32 limb array."""
    out = np.empty((len(xs), nlimbs), dtype=np.uint32)
    for row, x in enumerate(xs):
        x = int(x)
        for i in range(nlimbs):
            out[row, i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def int_to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    return ints_to_limbs([x], nlimbs)[0]


def limbs_to_ints(arr) -> list:
    """(..., nlimbs) limb array -> flat list of python ints (row-major)."""
    a = np.asarray(arr, dtype=np.uint64)
    flat = a.reshape(-1, a.shape[-1])
    out = []
    for row in flat:
        x = 0
        for i, limb in enumerate(row.tolist()):
            x |= int(limb) << (LIMB_BITS * i)
        out.append(x)
    return out


def limbs_to_int(arr) -> int:
    return limbs_to_ints(np.asarray(arr).reshape(1, -1))[0]
