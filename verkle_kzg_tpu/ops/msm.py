"""Multi-scalar multiplication (MSM) on TPU: batched Pippenger.

The reference's MSM is a naive serial fold (``vector-commit/src/utils.rs:16-19``
— one full scalar-mul per element). Here the TPU-native design is:

  * **Pippenger bucket method**, all windows processed SIMULTANEOUSLY as a
    vmapped batch axis (window-parallel), with points streamed through a
    ``lax.fori_loop`` so the trace is tiny and shapes are static.
  * **Lane parallelism**: points are split over `lanes` independent
    accumulator lanes so each sequential fori step performs a
    (windows x lanes)-wide batch of complete mixed additions — fat VPU work —
    then lanes are tree-reduced.
  * **Complete formulas** (ops/curve.py) make every step branchless: no
    special-casing of infinity/doubling anywhere in the hot loop.
  * Bucket post-processing (sum of suffix sums) is a log-depth
    ``associative_scan`` in the group.

Scalars: Fr standard form (..., 16); points: affine Montgomery (..., 2, 16).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..params import LIMB_BITS, NLIMBS
from . import curve as C
from . import field as F

L = NLIMBS
TOTAL_BITS = LIMB_BITS * L  # 256


def tree_reduce_points(p: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Log-depth reduction of projective points along ``axis`` via complete
    addition (the batched analog of the reference's serial sum fold).
    Unrolled halving — best for SMALL axes (compile size grows with log n)."""
    p = jnp.moveaxis(p, axis, 0)
    while p.shape[0] > 1:
        n = p.shape[0]
        half = n // 2
        folded = C.add(p[:half], p[half : 2 * half])
        if n % 2:
            folded = jnp.concatenate([folded, p[2 * half :]], axis=0)
        p = folded
    return p[0]


def suffix_scan_points(p: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Inclusive SUFFIX sums of points along ``axis`` (Hillis-Steele), as a
    fori_loop whose compiled body is ONE batched complete add — log-depth
    runtime with constant compile size (unlike associative_scan, which
    inlines the operator once per stage)."""
    p = jnp.moveaxis(p, axis, 0)
    n = p.shape[0]
    if n == 1:
        return jnp.moveaxis(p, 0, axis)
    log_steps = (n - 1).bit_length()
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * (p.ndim - 1), 0)

    def sstep(k, x):
        sh = jnp.int32(1) << k
        shifted = jnp.roll(x, -sh, axis=0)
        valid = idx + sh < n
        return jnp.where(valid, C.add(x, shifted), x)

    p = jax.lax.fori_loop(0, log_steps, sstep, p)
    return jnp.moveaxis(p, 0, axis)


def scan_reduce_points(p: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Sum of points along ``axis`` with constant compile size (suffix scan,
    then take element 0). Use for LARGE axes."""
    return jnp.take(suffix_scan_points(p, axis), 0, axis=axis)


def msm_naive(points_proj: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """Oracle MSM: per-point scalar_mul + tree reduction. Same semantics as
    ``inner_product`` over points (``vector-commit/src/utils.rs:16-19``)."""
    prods = C.scalar_mul(points_proj, scalars)
    return tree_reduce_points(prods, axis=0)


def window_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(..., L) standard-form scalars -> (W, ...) uint32 window digits,
    LSB window first, W = ceil(256/c)."""
    w = math.ceil(TOTAL_BITS / c)
    shifts = jnp.arange(LIMB_BITS, dtype=jnp.uint32)
    bits = (scalars[..., None] >> shifts) & jnp.uint32(1)  # (..., L, 16) LSB
    bits = bits.reshape(scalars.shape[:-1] + (TOTAL_BITS,))
    pad = w * c - TOTAL_BITS
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), jnp.uint32)], axis=-1
        )
    bits = bits.reshape(scalars.shape[:-1] + (w, c))
    weights = (jnp.uint32(1) << jnp.arange(c, dtype=jnp.uint32))
    digits = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)
    return jnp.moveaxis(digits, -1, 0)


def msm_pippenger(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int = 8,
    lanes: int = 8,
) -> jnp.ndarray:
    """Single MSM of N (point, scalar) pairs -> one projective point.

    ``c``: window bits (buckets per window = 2**c, bucket 0 unused).
    ``lanes``: independent accumulation lanes (parallel width multiplier).
    """
    n = points_affine.shape[0]
    nbuckets = 1 << c
    w = math.ceil(TOTAL_BITS / c)

    # Pad N up to a multiple of lanes with infinity sentinels (digit 0).
    steps = math.ceil(n / lanes)
    padded = steps * lanes
    if padded != n:
        pad_pts = jnp.zeros((padded - n, 2, L), jnp.uint32)
        pad_sc = jnp.zeros((padded - n, L), jnp.uint32)
        points_affine = jnp.concatenate([points_affine, pad_pts], axis=0)
        scalars = jnp.concatenate([scalars, pad_sc], axis=0)

    digits = window_digits(scalars, c)  # (W, padded)
    digits = digits.reshape(w, steps, lanes).astype(jnp.int32)
    pts = points_affine.reshape(steps, lanes, 2, L)

    # Bucket state for ALL windows at once: (W, lanes, 2^c, 3, L).
    buckets0 = C.infinity((w, lanes, nbuckets))
    w_idx = jnp.arange(w)[:, None]
    l_idx = jnp.arange(lanes)[None, :]

    def step(s, buckets):
        d = digits[:, s, :]  # (W, lanes)
        cur = buckets[w_idx, l_idx, d]  # (W, lanes, 3, L)
        p = jnp.broadcast_to(pts[s][None], (w, lanes, 2, L))
        new = C.mixed_add(cur, p)
        # Keep bucket 0 parked at infinity (zero digits and padding go there,
        # and it is excluded from the weighted sum anyway).
        return buckets.at[w_idx, l_idx, d].set(new)

    buckets = jax.lax.fori_loop(0, steps, step, buckets0)

    # Merge lanes: (W, lanes, 2^c, 3, L) -> (W, 2^c, 3, L).
    merged = scan_reduce_points(buckets, axis=1)

    # Weighted bucket sum sum_b b*B_b = sum of suffix sums S_1..S_{2^c-1}:
    # TWO suffix scans (S_b = sum_{j>=b} B_j; then T_b = sum_{j>=b} S_j;
    # the answer is T_1 — with bucket 0 dropped, index 0 of the second scan).
    body = merged[:, 1:]  # drop bucket 0; (W, 2^c - 1, 3, L)
    s1 = suffix_scan_points(body, axis=1)
    window_sums = jnp.take(suffix_scan_points(s1, axis=1), 0, axis=1)  # (W,3,L)

    # Horner over windows, top window first: acc = 2^c * acc + S_w.
    # Nested fori keeps the compiled body at ONE doubling + one add.
    def horner(i, acc):
        wi = w - 1 - i
        acc = jax.lax.fori_loop(0, c, lambda _, a: C.double(a), acc)
        return C.add(acc, window_sums[wi])

    return jax.lax.fori_loop(0, w, horner, C.infinity())


def msm_batched(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int = 8,
    lanes: int = 1,
) -> jnp.ndarray:
    """Batch of B independent MSMs: (B, N, 2, L) x (B, N, L) -> (B, 3, L).

    This is the verkle-tree hot path (SURVEY.md §3.5): thousands of
    width-256 node commitments fused into one padded device call. The batch
    axis provides the parallel width, so lanes defaults to 1.
    """
    fn = functools.partial(msm_pippenger, c=c, lanes=lanes)
    return jax.vmap(fn)(points_affine, scalars)


def msm_fixed_base(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int = 8,
    lanes: int = 8,
) -> jnp.ndarray:
    """MSM against a fixed CRS for a STACK of scalar vectors.

    (N, 2, L) points x (B, N, L) scalars -> (B, 3, L). Currently an alias of
    msm_batched with broadcast points; kept as the seam where a
    precomputed-table fixed-base kernel will slot in.
    """
    b = scalars.shape[0]
    pts = jnp.broadcast_to(points_affine[None], (b,) + points_affine.shape)
    return msm_batched(pts, scalars, c=c, lanes=lanes)
