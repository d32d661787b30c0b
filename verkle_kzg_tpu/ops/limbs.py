"""Host <-> device conversion between python bigints and limb planes.

Device representation: little-endian 16-bit limbs stored as uint32; batched
arrays carry limbs on axis -2 and elements on the minor lane axis (see
ops/field.py). These helpers run on the host at protocol boundaries, so
they are byte-buffer based (int.to_bytes + numpy reinterpret) rather than
per-limb python loops — ~10x faster at verkle scale (millions of values).
"""

from __future__ import annotations

import numpy as np

from ..params import LIMB_BITS, LIMB_MASK, NLIMBS


def ints_to_limbs(xs, nlimbs: int = NLIMBS) -> np.ndarray:
    """list/array of python ints -> (len(xs), nlimbs) uint32 limb array."""
    nbytes = 2 * nlimbs
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(xs), nlimbs)
    return arr.astype(np.uint32)


def int_to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    return ints_to_limbs([x], nlimbs)[0]


def limbs_to_ints(arr) -> list:
    """(..., nlimbs) limb array -> flat list of python ints (row-major)."""
    a = np.ascontiguousarray(np.asarray(arr), dtype=np.uint32)
    assert (a <= LIMB_MASK).all(), "limbs_to_ints requires normalized limbs"
    a = a.astype("<u2")
    nlimbs = a.shape[-1]
    nbytes = 2 * nlimbs
    flat = a.reshape(-1, nlimbs).tobytes()
    return [
        int.from_bytes(flat[i * nbytes : (i + 1) * nbytes], "little")
        for i in range(len(flat) // nbytes)
    ]


def limbs_to_int(arr) -> int:
    return limbs_to_ints(np.asarray(arr).reshape(1, -1))[0]
