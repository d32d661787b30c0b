"""Fused BN254 G1 group-law Pallas kernels (complete RCB16 formulas).

One kernel launch per batched point operation: the ~11 Montgomery muls and
~16 modular add/subs of a complete projective add (Renes-Costello-Batina
2016, algorithms 7-9 specialized to a = 0, b3 = 9) run back-to-back inside
a single Mosaic program, so every temporary stays in vregs/VMEM. This is
the round-2 answer to the XLA path's per-scan-round dispatch overhead: the
MSM inner loop (``ops/msm.py``) spends its time in exactly these ops
(replacing the reference's serial fold, ``vector-commit/src/utils.rs:16-19``).

Layout matches ops/curve.py: projective (..., 3, L, B), affine (..., 2, L, B)
with the (0, 0) infinity sentinel; limbs in sublanes, batch in lanes.

All wrappers take ``interpret=`` so the exact kernel logic runs on CPU in
tests (compared bit-exactly against ops/curve.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import NLIMBS
from .pallas_field import (
    _rows_const,
    k_add,
    k_add_lazy,
    k_is_zero,
    k_lazy_to_reduced,
    k_mont_mul,
    k_mont_mul_lazy,
    k_mul9_lazy,
    k_mul_b3,
    k_sub,
    k_sub_lazy,
)

L = NLIMBS
_fq = "fq"


def _mul(a, b):
    return k_mont_mul(a, b, _fq)


def _fadd(a, b):
    return k_add(a, b, _fq)


def _fsub(a, b):
    return k_sub(a, b, _fq)


def _lmul(a, b):
    return k_mont_mul_lazy(a, b, _fq)


def _ladd(a, b):
    return k_add_lazy(a, b, _fq)


def _lsub(a, b):
    return k_sub_lazy(a, b, _fq)


# ---------------------------------------------------------------------------
# Group-law bodies on kernel VALUES: coords are (..., L, B) arrays
# ---------------------------------------------------------------------------


def k_point_add(p, q):
    """Complete projective addition (RCB16 algorithm 7) on (..., 3, L, B)
    values. Mirrors ops/curve.py::add instruction for instruction."""
    X1, Y1, Z1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    X2, Y2, Z2 = q[..., 0, :, :], q[..., 1, :, :], q[..., 2, :, :]

    t0 = _mul(X1, X2)
    t1 = _mul(Y1, Y2)
    t2 = _mul(Z1, Z2)
    t3 = _fadd(X1, Y1)
    t4 = _fadd(X2, Y2)
    t3 = _mul(t3, t4)
    t4 = _fadd(t0, t1)
    t3 = _fsub(t3, t4)
    t4 = _fadd(Y1, Z1)
    X3 = _fadd(Y2, Z2)
    t4 = _mul(t4, X3)
    X3 = _fadd(t1, t2)
    t4 = _fsub(t4, X3)
    X3 = _fadd(X1, Z1)
    Y3 = _fadd(X2, Z2)
    X3 = _mul(X3, Y3)
    Y3 = _fadd(t0, t2)
    Y3 = _fsub(X3, Y3)
    X3 = _fadd(t0, t0)
    t0 = _fadd(X3, t0)
    t2 = k_mul_b3(t2)
    Z3 = _fadd(t1, t2)
    t1 = _fsub(t1, t2)
    Y3 = k_mul_b3(Y3)
    X3 = _mul(t4, Y3)
    t2 = _mul(t3, t1)
    X3 = _fsub(t2, X3)
    Y3 = _mul(Y3, t0)
    t1 = _mul(t1, Z3)
    Y3 = _fadd(t1, Y3)
    t0 = _mul(t0, t3)
    Z3 = _mul(Z3, t4)
    Z3 = _fadd(Z3, t0)

    return jnp.stack([X3, Y3, Z3], axis=-3)


def k_point_double(p):
    """Complete projective doubling (RCB16 algorithm 9)."""
    X, Y, Z = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]

    t0 = _mul(Y, Y)
    Z3 = _fadd(t0, t0)
    Z3 = _fadd(Z3, Z3)
    Z3 = _fadd(Z3, Z3)
    t1 = _mul(Y, Z)
    t2 = _mul(Z, Z)
    t2 = k_mul_b3(t2)
    X3 = _mul(t2, Z3)
    Y3 = _fadd(t0, t2)
    Z3 = _mul(t1, Z3)
    t1 = _fadd(t2, t2)
    t2 = _fadd(t1, t2)
    t0 = _fsub(t0, t2)
    Y3 = _mul(t0, Y3)
    Y3 = _fadd(X3, Y3)
    t1 = _mul(X, Y)
    X3 = _mul(t0, t1)
    X3 = _fadd(X3, X3)

    return jnp.stack([X3, Y3, Z3], axis=-3)


def k_point_mixed_add(p, q_affine):
    """Complete mixed addition (RCB16 algorithm 8): q affine with Z2 = 1,
    (0, 0) sentinel handled by a final select (as in ops/curve.py)."""
    X1, Y1, Z1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    X2, Y2 = q_affine[..., 0, :, :], q_affine[..., 1, :, :]

    t0 = _mul(X1, X2)
    t1 = _mul(Y1, Y2)
    t3 = _fadd(X2, Y2)
    t4 = _fadd(X1, Y1)
    t3 = _mul(t3, t4)
    t4 = _fadd(t0, t1)
    t3 = _fsub(t3, t4)
    t4 = _mul(Y2, Z1)
    t4 = _fadd(t4, Y1)
    Y3 = _mul(X2, Z1)
    Y3 = _fadd(Y3, X1)
    X3 = _fadd(t0, t0)
    t0 = _fadd(X3, t0)
    t2 = k_mul_b3(Z1)
    Z3 = _fadd(t1, t2)
    t1 = _fsub(t1, t2)
    Y3 = k_mul_b3(Y3)
    X3 = _mul(t4, Y3)
    t2 = _mul(t3, t1)
    X3 = _fsub(t2, X3)
    Y3 = _mul(Y3, t0)
    t1 = _mul(t1, Z3)
    Y3 = _fadd(t1, Y3)
    t0 = _mul(t0, t3)
    Z3 = _mul(Z3, t4)
    Z3 = _fadd(Z3, t0)

    out = jnp.stack([X3, Y3, Z3], axis=-3)
    inf = k_is_zero(X2) & k_is_zero(Y2)  # (..., B)
    return jnp.where(inf[..., None, None, :], p, out)


def k_point_mixed_add_lazy(p, q_affine):
    """Lazy-domain complete mixed addition: p's coordinates live in [0, 2m)
    (the affine q is fully reduced, as produced by XLA-land), output in
    [0, 2m). Montgomery muls skip their conditional subtract entirely —
    ~20% fewer vector ops than the strict version. Normalize the final
    accumulators once with k_point_reduce."""
    X1, Y1, Z1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    X2, Y2 = q_affine[..., 0, :, :], q_affine[..., 1, :, :]

    t0 = _lmul(X1, X2)
    t1 = _lmul(Y1, Y2)
    t3 = _ladd(X2, Y2)
    t4 = _ladd(X1, Y1)
    t3 = _lmul(t3, t4)
    t4 = _ladd(t0, t1)
    t3 = _lsub(t3, t4)
    t4 = _lmul(Y2, Z1)
    t4 = _ladd(t4, Y1)
    Y3 = _lmul(X2, Z1)
    Y3 = _ladd(Y3, X1)
    X3 = _ladd(t0, t0)
    t0 = _ladd(X3, t0)
    t2 = k_mul9_lazy(Z1)
    Z3 = _ladd(t1, t2)
    t1 = _lsub(t1, t2)
    Y3 = k_mul9_lazy(Y3)
    X3 = _lmul(t4, Y3)
    t2 = _lmul(t3, t1)
    X3 = _lsub(t2, X3)
    Y3 = _lmul(Y3, t0)
    t1 = _lmul(t1, Z3)
    Y3 = _ladd(t1, Y3)
    t0 = _lmul(t0, t3)
    Z3 = _lmul(Z3, t4)
    Z3 = _ladd(Z3, t0)

    out = jnp.stack([X3, Y3, Z3], axis=-3)
    inf = k_is_zero(X2) & k_is_zero(Y2)  # (..., B)
    return jnp.where(inf[..., None, None, :], p, out)


def k_point_reduce(p, spec: str = _fq):
    """Normalize lazy [0, 2m) coordinates to [0, m) (any leading dims)."""
    return k_lazy_to_reduced(p, spec)


def k_point_add_lazy(p, q):
    """Lazy-domain complete projective addition (RCB16 algorithm 7):
    inputs/outputs in [0, 2m)."""
    X1, Y1, Z1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]
    X2, Y2, Z2 = q[..., 0, :, :], q[..., 1, :, :], q[..., 2, :, :]

    t0 = _lmul(X1, X2)
    t1 = _lmul(Y1, Y2)
    t2 = _lmul(Z1, Z2)
    t3 = _ladd(X1, Y1)
    t4 = _ladd(X2, Y2)
    t3 = _lmul(t3, t4)
    t4 = _ladd(t0, t1)
    t3 = _lsub(t3, t4)
    t4 = _ladd(Y1, Z1)
    X3 = _ladd(Y2, Z2)
    t4 = _lmul(t4, X3)
    X3 = _ladd(t1, t2)
    t4 = _lsub(t4, X3)
    X3 = _ladd(X1, Z1)
    Y3 = _ladd(X2, Z2)
    X3 = _lmul(X3, Y3)
    Y3 = _ladd(t0, t2)
    Y3 = _lsub(X3, Y3)
    X3 = _ladd(t0, t0)
    t0 = _ladd(X3, t0)
    t2 = k_mul9_lazy(t2)
    Z3 = _ladd(t1, t2)
    t1 = _lsub(t1, t2)
    Y3 = k_mul9_lazy(Y3)
    X3 = _lmul(t4, Y3)
    t2 = _lmul(t3, t1)
    X3 = _lsub(t2, X3)
    Y3 = _lmul(Y3, t0)
    t1 = _lmul(t1, Z3)
    Y3 = _ladd(t1, Y3)
    t0 = _lmul(t0, t3)
    Z3 = _lmul(Z3, t4)
    Z3 = _ladd(Z3, t0)

    return jnp.stack([X3, Y3, Z3], axis=-3)


def k_point_double_lazy(p):
    """Lazy-domain complete projective doubling (RCB16 algorithm 9)."""
    X, Y, Z = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]

    t0 = _lmul(Y, Y)
    Z3 = _ladd(t0, t0)
    Z3 = _ladd(Z3, Z3)
    Z3 = _ladd(Z3, Z3)
    t1 = _lmul(Y, Z)
    t2 = _lmul(Z, Z)
    t2 = k_mul9_lazy(t2)
    X3 = _lmul(t2, Z3)
    Y3 = _ladd(t0, t2)
    Z3 = _lmul(t1, Z3)
    t1 = _ladd(t2, t2)
    t2 = _ladd(t1, t2)
    t0 = _lsub(t0, t2)
    Y3 = _lmul(t0, Y3)
    Y3 = _ladd(X3, Y3)
    t1 = _lmul(X, Y)
    X3 = _lmul(t0, t1)
    X3 = _ladd(X3, X3)

    return jnp.stack([X3, Y3, Z3], axis=-3)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

# Max uint32 lanes worth of (coords, L, lanes) data per grid cell; a
# (3, 16, 512) block is 96 KB, leaving VMEM room for ~20 live temporaries.
_LANE_BLOCK = 512


def _point_call(kernel, arrs, coords_in, coords_out, interpret):
    """arrs[i]: (..., coords_in[i], L, B), identical leading dims + B.
    Grid = (prod(lead), lane blocks); each cell sees (c, L, blk) blocks."""
    lead = arrs[0].shape[:-3]
    n = arrs[0].shape[-1]
    g = int(np.prod(lead)) if lead else 1
    blk = min(_LANE_BLOCK, n)
    nb = -(-n // blk)
    pad = nb * blk - n
    flat = []
    for a, c in zip(arrs, coords_in):
        a = a.reshape((g, c) + a.shape[-2:])
        if pad:
            a = jnp.concatenate([a, jnp.zeros((g, c, L, pad), jnp.uint32)], axis=-1)
        flat.append(a)

    def spec(c):
        return pl.BlockSpec(
            (1, c, L, blk), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel,
        grid=(g, nb),
        in_specs=[spec(c) for c in coords_in],
        out_specs=spec(coords_out),
        out_shape=jax.ShapeDtypeStruct((g, coords_out, L, nb * blk), jnp.uint32),
        interpret=interpret,
    )(*flat)
    return out[..., :n].reshape(lead + (coords_out,) + arrs[0].shape[-2:])


@functools.partial(jax.jit, static_argnames="interpret")
def add(p, q, interpret: bool = False):
    """(..., 3, L, B) x (..., 3, L, B) -> (..., 3, L, B), one fused kernel."""

    def kernel(p_ref, q_ref, o_ref):
        o_ref[0] = k_point_add(p_ref[0], q_ref[0])

    return _point_call(kernel, [p, q], [3, 3], 3, interpret)


@functools.partial(jax.jit, static_argnames="interpret")
def double(p, interpret: bool = False):
    def kernel(p_ref, o_ref):
        o_ref[0] = k_point_double(p_ref[0])

    return _point_call(kernel, [p], [3], 3, interpret)


@functools.partial(jax.jit, static_argnames="interpret")
def mixed_add(p, q_affine, interpret: bool = False):
    """(..., 3, L, B) x (..., 2, L, B) -> (..., 3, L, B), one fused kernel."""

    def kernel(p_ref, q_ref, o_ref):
        o_ref[0] = k_point_mixed_add(p_ref[0], q_ref[0])

    return _point_call(kernel, [p, q_affine], [3, 2], 3, interpret)


# ---------------------------------------------------------------------------
# Fused scalar multiplication: the whole 256-step double-and-add chain of a
# batch of points runs inside ONE Mosaic kernel. The XLA scan
# (ops/curve.py::scalar_mul) pays per-HLO-op dispatch overhead on every one
# of its ~512 tiny point ops, which dominates the verkle sparse-commit
# fleet (the gathered-basis scalar-muls of tree.py::_sparse_commit — the
# per-node commits replacing ``node.rs:212-277``'s serial MSMs); in-kernel
# the same complete-formula chain runs back-to-back in VMEM. Identical
# formula sequence (double, complete mixed add, per-bit select), so the
# output coordinates are BIT-IDENTICAL to the XLA path, not just the same
# group element (the mixed add is the exact Z2=1 specialization of the
# projective add used there).
# ---------------------------------------------------------------------------


def _scalar_mul_kernel(bits_ref, pts_ref, o_ref):
    """bits_ref: (256, BB) uint32 0/1 MSB-first; pts_ref: (1, 2, L, BB)
    canonical affine (never infinity in the callers: CRS basis points —
    zero scalars yield the identity because no bit ever selects the add);
    o_ref: (1, 3, L, BB) canonical projective."""
    from ..params import FQ

    bsz = o_ref.shape[-1]
    p = pts_ref[0]
    zero = jnp.zeros((L, bsz), jnp.uint32)
    one = jnp.broadcast_to(_rows_const(FQ.r_mod_limbs), (L, bsz))
    acc0 = jnp.stack([zero, one, zero], axis=0)  # (0 : 1 : 0)

    def body(i, acc):
        acc = k_point_double_lazy(acc)
        with_p = k_point_mixed_add_lazy(acc, p)
        bit = bits_ref[i]  # (BB,)
        return jnp.where((bit != 0)[None, None, :], with_p, acc)

    acc = jax.lax.fori_loop(0, 256, body, acc0)
    o_ref[0] = k_point_reduce(acc)


@functools.partial(jax.jit, static_argnames="interpret")
def scalar_mul_affine(pts_affine, scalars_std, interpret: bool = False):
    """(2, L, B) canonical affine points x (L, B) STANDARD-form scalars ->
    (3, L, B) canonical projective products, one fused kernel launch.

    Bits are extracted once in XLA (cheap wide vector ops) and streamed as
    a (256, B) plane; each lane's full double-and-add chain runs in VMEM.
    (0, 0)-sentinel infinity lanes get their bits masked to zero, so they
    emit the identity — same group element as the XLA path's complete
    formulas (the mixed add is not complete for an affine infinity)."""
    from .curve import affine_is_infinity, scalar_bits_msb

    n = pts_affine.shape[-1]
    bits = scalar_bits_msb(scalars_std).astype(jnp.uint32)  # (256, B)
    bits = jnp.where(affine_is_infinity(pts_affine)[None, :], 0, bits)
    blk = min(512, n)
    nb = -(-n // blk)
    pad = nb * blk - n
    if pad:
        pts_affine = jnp.concatenate(
            [pts_affine, jnp.zeros((2, L, pad), jnp.uint32)], axis=-1
        )
        bits = jnp.concatenate(
            [bits, jnp.zeros((256, pad), jnp.uint32)], axis=-1
        )
    # pad lanes carry the (0,0) sentinel with all-zero bits: the add is
    # never selected, so they emit the identity and are sliced off below
    out = pl.pallas_call(
        _scalar_mul_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((256, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 2, L, blk), lambda j: (0, 0, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, L, blk), lambda j: (0, 0, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 3, L, nb * blk), jnp.uint32),
        interpret=interpret,
    )(bits, pts_affine[None])
    return out[0, ..., :n]
