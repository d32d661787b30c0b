"""Batched BN254 G1 group ops on limb planes (JAX), TPU-first design.

Replaces the ark_ec usage of the reference (SURVEY.md §2.3 item 2, e.g.
``vector-commit/src/ipa/mod.rs:3``). Unlike arkworks' Jacobian formulas with
data-dependent branches, we use the *complete* projective formulas of
Renes-Costello-Batina 2016 (eprint 2015/1060, algorithms 7-9 specialized to
a = 0): one branchless instruction sequence is correct for every input
combination — doubling, mixed signs, and the identity — which is exactly
what a traced/vectorized SIMD machine wants. The identity is (0 : 1 : 0).

Layout (see ops/field.py): batch axis MINOR (TPU lanes), limbs second-minor.
  * projective batch: uint32 (..., 3, 16, B)   [X, Y, Z]
  * affine batch:     uint32 (..., 2, 16, B)   [x, y],
    with (0, 0) as the infinity sentinel (not on the curve since b = 3).

Scalars are Fr in *standard* (non-Montgomery) form, shape (..., 16, B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import B, LIMB_BITS, NLIMBS, Q
from . import field as F
from .limbs import int_to_limbs, ints_to_limbs, limbs_to_ints

L = NLIMBS

_fq = "fq"


@functools.lru_cache(maxsize=None)
def _b3_mont() -> np.ndarray:
    """3*b = 9 in Montgomery form (the RCB16 curve constant); numpy so it's
    safe to close over from any jit trace. Shape (L, 1): broadcasts lanes."""
    return np.asarray(int_to_limbs((3 * B << 256) % Q), dtype=np.uint32)[:, None]


def _mul_b3(x: jnp.ndarray) -> jnp.ndarray:
    """x * 9 via add chain (x8 + x): 3 doublings + 1 add, cheaper than a
    full Montgomery multiply."""
    x2 = F.add(x, x, _fq)
    x4 = F.add(x2, x2, _fq)
    x8 = F.add(x4, x4, _fq)
    return F.add(x8, x, _fq)


# ---------------------------------------------------------------------------
# Constructors / predicates
# ---------------------------------------------------------------------------


def infinity(lead=(), b: int = 1) -> jnp.ndarray:
    """(lead..., 3, L, b) batch of the identity (0 : 1 : 0)."""
    p = jnp.zeros(tuple(lead) + (3, L, b), dtype=jnp.uint32)
    return p.at[..., 1, :, :].set(F.one_mont(_fq, tuple(lead), b))


def is_infinity(p: jnp.ndarray) -> jnp.ndarray:
    return F.is_zero(p[..., 2, :, :])


def affine_is_infinity(a: jnp.ndarray) -> jnp.ndarray:
    """(0,0) sentinel check for affine batches -> (..., B) bool."""
    return F.is_zero(a[..., 0, :, :]) & F.is_zero(a[..., 1, :, :])


def select(mask: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """mask (..., B) selects whole points."""
    return jnp.where(mask[..., None, None, :], p, q)


def neg(p: jnp.ndarray) -> jnp.ndarray:
    return p.at[..., 1, :, :].set(F.neg(p[..., 1, :, :], _fq))


def affine_neg(a: jnp.ndarray) -> jnp.ndarray:
    # the (0,0) infinity sentinel is fixed by F.neg (neg(0) = 0)
    return a.at[..., 1, :, :].set(F.neg(a[..., 1, :, :], _fq))


@jax.jit
def eq(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Projective equality via cross-multiplication -> (..., B) bool."""
    x1, y1, z1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    x2, y2, z2 = q[..., 0, :, :], q[..., 1, :, :], q[..., 2, :, :]
    both_inf = F.is_zero(z1) & F.is_zero(z2)
    one_inf = F.is_zero(z1) ^ F.is_zero(z2)
    mul = functools.partial(F.mont_mul, spec=_fq)
    same = F.eq(mul(x1, z2), mul(x2, z1)) & F.eq(mul(y1, z2), mul(y2, z1))
    return both_inf | (same & ~one_inf)


# ---------------------------------------------------------------------------
# Complete group law (RCB16, a = 0, b3 = 9)
# ---------------------------------------------------------------------------


@jax.jit
def add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete projective addition (algorithm 7). Works for ALL inputs."""
    X1, Y1, Z1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    X2, Y2, Z2 = q[..., 0, :, :], q[..., 1, :, :], q[..., 2, :, :]
    mul = functools.partial(F.mont_mul, spec=_fq)
    fadd = functools.partial(F.add, spec=_fq)
    fsub = functools.partial(F.sub, spec=_fq)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = fadd(X1, Y1)
    t4 = fadd(X2, Y2)
    t3 = mul(t3, t4)
    t4 = fadd(t0, t1)
    t3 = fsub(t3, t4)
    t4 = fadd(Y1, Z1)
    X3 = fadd(Y2, Z2)
    t4 = mul(t4, X3)
    X3 = fadd(t1, t2)
    t4 = fsub(t4, X3)
    X3 = fadd(X1, Z1)
    Y3 = fadd(X2, Z2)
    X3 = mul(X3, Y3)
    Y3 = fadd(t0, t2)
    Y3 = fsub(X3, Y3)
    X3 = fadd(t0, t0)
    t0 = fadd(X3, t0)
    t2 = _mul_b3(t2)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    Y3 = _mul_b3(Y3)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = fsub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = fadd(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = fadd(Z3, t0)

    return jnp.stack([X3, Y3, Z3], axis=-3)


@jax.jit
def double(p: jnp.ndarray) -> jnp.ndarray:
    """Complete projective doubling (algorithm 9)."""
    X, Y, Z = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    mul = functools.partial(F.mont_mul, spec=_fq)
    fadd = functools.partial(F.add, spec=_fq)
    fsub = functools.partial(F.sub, spec=_fq)

    t0 = mul(Y, Y)
    Z3 = fadd(t0, t0)
    Z3 = fadd(Z3, Z3)
    Z3 = fadd(Z3, Z3)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    t2 = _mul_b3(t2)
    X3 = mul(t2, Z3)
    Y3 = fadd(t0, t2)
    Z3 = mul(t1, Z3)
    t1 = fadd(t2, t2)
    t2 = fadd(t1, t2)
    t0 = fsub(t0, t2)
    Y3 = mul(t0, Y3)
    Y3 = fadd(X3, Y3)
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = fadd(X3, X3)

    return jnp.stack([X3, Y3, Z3], axis=-3)


@jax.jit
def mixed_add(p: jnp.ndarray, q_affine: jnp.ndarray) -> jnp.ndarray:
    """Complete mixed addition (algorithm 8): q affine with Z2 = 1.

    The affine (0,0) infinity sentinel is NOT on the curve, so it is handled
    with one select at the end (the only data-dependent select in the group
    law; it vectorizes to a cheap masked copy)."""
    X1, Y1, Z1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    X2, Y2 = q_affine[..., 0, :, :], q_affine[..., 1, :, :]
    mul = functools.partial(F.mont_mul, spec=_fq)
    fadd = functools.partial(F.add, spec=_fq)
    fsub = functools.partial(F.sub, spec=_fq)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = fadd(X2, Y2)
    t4 = fadd(X1, Y1)
    t3 = mul(t3, t4)
    t4 = fadd(t0, t1)
    t3 = fsub(t3, t4)
    t4 = mul(Y2, Z1)
    t4 = fadd(t4, Y1)
    Y3 = mul(X2, Z1)
    Y3 = fadd(Y3, X1)
    X3 = fadd(t0, t0)
    t0 = fadd(X3, t0)
    t2 = _mul_b3(Z1)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    Y3 = _mul_b3(Y3)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = fsub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = fadd(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = fadd(Z3, t0)

    out = jnp.stack([X3, Y3, Z3], axis=-3)
    return select(affine_is_infinity(q_affine), p, out)


# ---------------------------------------------------------------------------
# Scalar multiplication
# ---------------------------------------------------------------------------


def scalar_bits_msb(scalars: jnp.ndarray) -> jnp.ndarray:
    """(..., L, B) standard-form scalars -> (256, ..., B) bits, MSB first."""
    shifts = jnp.arange(LIMB_BITS, dtype=jnp.uint32)
    # (..., L, B) -> (..., L, 16, B): bit j of limb l is value bit 16l + j
    bits = (scalars[..., None, :] >> shifts[:, None]) & jnp.uint32(1)
    le = bits.reshape(scalars.shape[:-2] + (L * LIMB_BITS,) + scalars.shape[-1:])
    msb_first = le[..., ::-1, :]
    return jnp.moveaxis(msb_first, -2, 0)


@jax.jit
def scalar_mul(p: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """Branchless double-and-add: (..., 3, L, B) x (..., L, B) points/scalars.

    Semantics match ark ``Group::mul``; the oracle for Pippenger and the
    workhorse for CRS scaling and G1-NTT twiddles."""
    bits = scalar_bits_msb(scalars)  # (256, ..., B)
    acc0 = infinity(p.shape[:-3], p.shape[-1])

    def body(acc, bit):
        acc = double(acc)
        with_p = add(acc, p)
        acc = select(bit.astype(bool), with_p, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, bits)
    return acc


# ---------------------------------------------------------------------------
# Affine <-> projective, host <-> device
# ---------------------------------------------------------------------------


def from_affine(a: jnp.ndarray) -> jnp.ndarray:
    """Affine batch (with (0,0) sentinel) -> projective batch."""
    inf = affine_is_infinity(a)  # (..., B)
    lead, b = a.shape[:-3], a.shape[-1]
    one = F.one_mont(_fq, lead, b)
    z = F.select(inf, jnp.zeros_like(one), one)
    y = F.select(inf, one, a[..., 1, :, :])
    return jnp.stack([a[..., 0, :, :], y, z], axis=-3)


@jax.jit
def to_affine(p: jnp.ndarray) -> jnp.ndarray:
    """Projective -> affine ((0,0) for infinity) via one batched inversion
    over the lane axis (Montgomery's trick, 128-lane chunks)."""
    z = p[..., 2, :, :]
    zinv = F.batch_inv_mont(z, _fq, axis=-1)
    x = F.mont_mul(p[..., 0, :, :], zinv, _fq)
    y = F.mont_mul(p[..., 1, :, :], zinv, _fq)
    inf = F.is_zero(z)
    x = F.select(inf, jnp.zeros_like(x), x)
    y = F.select(inf, jnp.zeros_like(y), y)
    return jnp.stack([x, y], axis=-3)


def host_points_to_affine(points) -> jnp.ndarray:
    """List of hostmath affine points ((x, y) ints or None) -> (2, L, N)
    Montgomery-form device array with the (0,0) infinity sentinel."""
    xs, ys = [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(0)
        else:
            xs.append((pt[0] << 256) % Q)
            ys.append((pt[1] << 256) % Q)
    arr = np.stack([ints_to_limbs(xs).T, ints_to_limbs(ys).T], axis=0)  # (2, L, N)
    return jnp.asarray(arr, dtype=jnp.uint32)


def affine_to_host_points(a) -> list:
    """(2, L, N) Montgomery affine batch -> list of hostmath points."""
    arr = np.asarray(a)  # (2, L, N)
    n = arr.shape[-1]
    flat = limbs_to_ints(np.moveaxis(arr, -1, 0).reshape(n * 2, L))  # x0,y0,x1,...
    rinv = pow(1 << 256, Q - 2, Q)
    out = []
    for i in range(n):
        x = flat[2 * i] * rinv % Q
        y = flat[2 * i + 1] * rinv % Q
        out.append(None if (x == 0 and y == 0) else (x, y))
    return out


def host_point_to_projective(pt) -> jnp.ndarray:
    """Single host point -> (3, L, 1) projective."""
    return from_affine(host_points_to_affine([pt]))


def projective_to_host_points(p) -> list:
    """(..., 3, L, N) -> flat list of host points (lane-major per leading
    batch index)."""
    aff = to_affine(p)
    arr = np.asarray(aff)
    arr = arr.reshape((-1,) + arr.shape[-3:]) if arr.ndim > 3 else arr[None]
    out = []
    for blk in arr:
        out.extend(affine_to_host_points(blk))
    return out
