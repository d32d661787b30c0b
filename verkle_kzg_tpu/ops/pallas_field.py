"""Pallas (Mosaic/TPU) field primitives: fused, fully-unrolled limb math.

This is the VMEM-resident fast path for the hot kernels (SURVEY.md §2.3
items 1-3; the reference's hot primitive is the serial MSM fold at
``vector-commit/src/utils.rs:16-19``). The XLA-traced path in ``ops/field.py``
is memory-bound: every ``lax.scan`` round of the CIOS Montgomery multiply
round-trips its (L+2, B) column window through HBM. Here a whole fused
sequence (a complete RCB16 point add = ~11 Montgomery muls + ~16 add/subs)
runs inside ONE Pallas kernel, so every intermediate lives in vector
registers / VMEM and HBM traffic collapses to the kernel's inputs/outputs.

Design notes (kernel-internal building blocks, all pure jnp on values):

  * Layout matches ops/field.py: uint32 (L, B) with limbs in SUBLANES and
    the element batch in LANES. (16, 128) int32 = exactly 2 vregs.
  * No sequential limb loops. Carry propagation is two carry-save passes
    (multi-bit carries) followed by a Kogge-Stone parallel-prefix pass for
    the remaining single-bit ripple: O(log L) full-width vector ops instead
    of an L-step scan.
  * Subtraction never goes signed: a - b + m is computed with the 16-bit
    two's-complement identity a + m + (0xFFFF ^ b) + 1 - 2^256 (the final
    borrow is the dropped carry-out of the top limb).
  * The CIOS rounds are unrolled statically (L = 16 rounds); the rotating
    column window is a (L+2, B) value manipulated with static concats
    (sublane shifts), never a carried scan state.

Every public wrapper takes ``interpret=`` so CPU tests can run the exact
kernel logic without a TPU (tests compare against ops/field.py bit-exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import FQ, FR, LIMB_BITS, LIMB_MASK, NLIMBS, FieldSpec

L = NLIMBS
_MASK = np.uint32(LIMB_MASK)
_SPECS: dict[str, FieldSpec] = {"fq": FQ, "fr": FR}

# Lane-block width for standalone wrappers (each grid cell owns this many
# field elements; (L, 512) uint32 = 32 KB, far under VMEM).
LANE_BLOCK = 512


def _rows_const(limbs) -> jnp.ndarray:
    """(L, 1) uint32 constant built from scalar literals: pallas kernels may
    not capture array constants, but scalar-broadcast rows are fine."""
    return jnp.concatenate(
        [jnp.full((1, 1), int(l), jnp.uint32) for l in limbs], axis=0
    )


@functools.lru_cache(maxsize=None)
def _kconst_ints(spec: str):
    fs = _SPECS[spec]
    return (
        tuple(int(l) for l in fs.modulus_limbs),
        np.uint32(fs.n0inv),
        tuple(0xFFFF ^ int(l) for l in fs.modulus_limbs),
    )


def _kconsts(spec: str):
    mod_l, n0inv, nmod_l = _kconst_ints(spec)
    return _rows_const(mod_l), n0inv, _rows_const(nmod_l)


# ---------------------------------------------------------------------------
# Kernel-internal primitives (operate on jnp VALUES inside a pallas kernel)
# ---------------------------------------------------------------------------


def _shift_down(x, k):
    """Limb rows move DOWN the limb axis (-2) by k (row i <- row i-k),
    zero-fill. Works for any leading batch dims."""
    z = jnp.zeros(x.shape[:-2] + (k,) + x.shape[-1:], x.dtype)
    return jnp.concatenate([z, x[..., :-k, :]], axis=-2)


def k_carry(x):
    """Exact 16-bit carry propagation over rows of a uint32 (R, B) lazy
    value with rows < 2^31. ONE carry-save pass (rows drop to
    <= 0xFFFF + 2^15 < 2^17 - 2) then Kogge-Stone parallel-prefix for the
    remaining single-bit ripple (g = row >> 16 is 0/1 and carry-out stays
    <= 1 in that range, so the prefix recurrence is exact). Bits carried
    past the top row are DROPPED (callers either guarantee fit or rely on
    the mod-2^(16R) semantics)."""
    x = (x & _MASK) + _shift_down(x >> LIMB_BITS, 1)
    g = x >> LIMB_BITS  # {0,1}
    p = jnp.where((x & _MASK) == _MASK, jnp.uint32(1), jnp.uint32(0))
    sh = 1
    while sh < x.shape[-2]:
        g = g | (p & _shift_down(g, sh))
        p = p & _shift_down(p, sh)
        sh *= 2
    cin = _shift_down(g, 1)
    return (x + cin) & _MASK


def _add_row0(x, v):
    """Limb row 0 += v without scatter (Mosaic has no scatter-add)."""
    return jnp.concatenate([x[..., 0:1, :] + v, x[..., 1:, :]], axis=-2)


def k_cond_sub(x, spec: str):
    """Rows-normalized x in [0, 2m) -> [0, m). One complement-subtract with
    carry-out test (carry out of the top limb <=> x >= m)."""
    _, _, nmod = _kconsts(spec)
    t = _add_row0(x + nmod, jnp.uint32(1))  # rows <= 2*0xFFFF + 1
    # (x + (2^256 - m)), with the carry-out kept in an extra top row
    z1 = jnp.zeros(x.shape[:-2] + (1,) + x.shape[-1:], jnp.uint32)
    t = k_carry(jnp.concatenate([t, z1], axis=-2))
    ge = t[..., L, :] > 0  # carry out => x >= m
    return jnp.where(ge[..., None, :], t[..., :L, :], x)


def k_add(a, b, spec: str):
    return k_cond_sub(k_carry(a + b), spec)


def k_sub(a, b, spec: str):
    """(a - b) mod m for reduced a, b: a + m + ~b + 1 with the 2^256 carry
    dropped by k_carry's top-row mask."""
    mod, _, _ = _kconsts(spec)
    s = _add_row0(a + mod + (b ^ _MASK), jnp.uint32(1))  # rows <= 3*0xFFFF + 1
    return k_cond_sub(k_carry(s), spec)


def k_double(a, spec: str):
    return k_add(a, a, spec)


def k_mul_b3(x):
    """x * 9 (the RCB16 b3 constant for BN254 G1) via x8 + x."""
    x2 = k_add(x, x, "fq")
    x4 = k_add(x2, x2, "fq")
    x8 = k_add(x4, x4, "fq")
    return k_add(x8, x, "fq")


def k_mont_mul(a, b, spec: str):
    """CIOS Montgomery product of reduced (L, B) operands, fully unrolled.
    Mont in -> Mont out, result reduced to [0, m).

    Per round, the partial products of a_i*b and m*N are FUSED before
    touching the (L+2, B) column accumulator: m only needs the true column
    0 (tracked via one (1, B) row add), so the two lo parts and the two hi
    parts merge first and the wide accumulator is updated once — about 25%
    fewer full-width ops per round than accumulating all four separately."""
    mod, n0inv, _ = _kconsts(spec)
    lead = jnp.broadcast_shapes(a.shape, b.shape)[:-2]
    bsz = max(a.shape[-1], b.shape[-1])
    z1 = jnp.zeros(lead + (1, bsz), jnp.uint32)
    z2 = jnp.zeros(lead + (2, bsz), jnp.uint32)
    cols = jnp.zeros(lead + (L + 2, bsz), jnp.uint32)
    cat = functools.partial(jnp.concatenate, axis=-2)
    for i in range(L):
        p = a[..., i : i + 1, :] * b  # (..., L, B), exact in uint32
        p_lo = p & _MASK
        # column 0 total BEFORE q's lo lands there (q_lo[0] makes it = 0
        # mod 2^16 by construction — m only needs cols[0] + p_lo[0])
        c0 = cols[..., 0:1, :] + p_lo[..., 0:1, :]
        m = (c0 * n0inv) & _MASK  # (..., 1, B)
        q = m * mod  # (..., L, B)
        s_lo = p_lo + (q & _MASK)
        s_hi = (p >> LIMB_BITS) + (q >> LIMB_BITS)
        cols = cols + cat([s_lo, z2]) + cat([z1, s_hi, z1])
        carry = cols[..., 0:1, :] >> LIMB_BITS  # low 16 bits are 0
        cols = cat([cols[..., 1:2, :] + carry, cols[..., 2:, :], z1])
    return k_cond_sub(k_carry(cols[..., :L, :]), spec)


def k_is_zero(x):
    """(..., L, B) -> (..., B) bool."""
    return jnp.all(x == 0, axis=-2)


# ---------------------------------------------------------------------------
# Lazy-reduction domain: values live in [0, 2m) between operations.
#
# Montgomery muls need NO conditional subtract at all in this domain
# (inputs < 2m give outputs < 4m^2/R + m < 2m because 4m < R for BN254),
# which removes ~20% of the op count of a fused point addition. Adds/subs
# conditionally subtract 2m instead of m. k_lazy_to_reduced normalizes
# [0, 2m) -> [0, m) at sequence boundaries.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _kconst2_ints(spec: str):
    fs = _SPECS[spec]
    m2 = 2 * fs.modulus
    m2_limbs = tuple((m2 >> (16 * i)) & 0xFFFF for i in range(L))
    nine_mont = (9 * (1 << 256)) % fs.modulus
    nine_limbs = tuple((nine_mont >> (16 * i)) & 0xFFFF for i in range(L))
    return (
        m2_limbs,
        tuple(0xFFFF ^ int(l) for l in m2_limbs),
        nine_limbs,
    )


def k_cond_sub_2m(x, spec: str):
    """Rows-normalized x in [0, 4m) -> [0, 2m)."""
    _, nmod2_l, _ = _kconst2_ints(spec)
    nmod2 = _rows_const(nmod2_l)
    t = _add_row0(x + nmod2, jnp.uint32(1))
    z1 = jnp.zeros(x.shape[:-2] + (1,) + x.shape[-1:], jnp.uint32)
    t = k_carry(jnp.concatenate([t, z1], axis=-2))
    ge = t[..., L, :] > 0
    return jnp.where(ge[..., None, :], t[..., :L, :], x)


def k_add_lazy(a, b, spec: str):
    """[0,2m) x [0,2m) -> [0,2m)."""
    return k_cond_sub_2m(k_carry(a + b), spec)


def k_sub_lazy(a, b, spec: str):
    """(a - b) mod 2m into [0,2m): a + 2m + ~b + 1 with dropped 2^256."""
    m2_l, _, _ = _kconst2_ints(spec)
    m2 = _rows_const(m2_l)
    s = _add_row0(a + m2 + (b ^ _MASK), jnp.uint32(1))
    return k_cond_sub_2m(k_carry(s), spec)


def k_mont_mul_lazy(a, b, spec: str):
    """CIOS Montgomery product WITHOUT the trailing conditional subtract:
    [0,2m) x [0,2m) -> [0,2m). Same fused-partial-product recurrence as
    k_mont_mul. ``a`` may have broadcastable (e.g. constant (L, 1)) shape."""
    mod, n0inv, _ = _kconsts(spec)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    lead = shape[:-2]
    bsz = shape[-1]
    z1 = jnp.zeros(lead + (1, bsz), jnp.uint32)
    z2 = jnp.zeros(lead + (2, bsz), jnp.uint32)
    cols = jnp.zeros(lead + (L + 2, bsz), jnp.uint32)
    cat = functools.partial(jnp.concatenate, axis=-2)
    for i in range(L):
        p = a[..., i : i + 1, :] * b
        p_lo = p & _MASK
        c0 = cols[..., 0:1, :] + p_lo[..., 0:1, :]
        m = (c0 * n0inv) & _MASK
        q = m * mod
        s_lo = p_lo + (q & _MASK)
        s_hi = (p >> LIMB_BITS) + (q >> LIMB_BITS)
        cols = cols + cat([s_lo, z2]) + cat([z1, s_hi, z1])
        carry = cols[..., 0:1, :] >> LIMB_BITS
        cols = cat([cols[..., 1:2, :] + carry, cols[..., 2:, :], z1])
    return k_carry(cols[..., :L, :])


def k_mul9_lazy(x):
    """9x into [0,2m) via the x8 + x chain. Each doubling stays under the
    4m < 2^256 headroom before its conditional subtract, so plain lazy
    adds are exact. (A Montgomery mul by the constant 9R would be fewer
    ops, but Mosaic cannot lower the sublane+lane broadcast it needs.)"""
    x2 = k_add_lazy(x, x, "fq")
    x4 = k_add_lazy(x2, x2, "fq")
    x8 = k_add_lazy(x4, x4, "fq")
    return k_add_lazy(x8, x, "fq")


def k_lazy_to_reduced(x, spec: str):
    """[0, 2m) -> [0, m) (same op as the strict domain's tail subtract)."""
    return k_cond_sub(x, spec)


# ---------------------------------------------------------------------------
# Standalone pallas_call wrappers (testing / direct use)
# ---------------------------------------------------------------------------


def _elementwise_call(kernel, n_in, arrs, interpret, lane_block=LANE_BLOCK):
    """All arrays (..., L, B) with identical shape; leading dims and lane
    blocks form the grid, one (L, blk) block per cell."""
    shape = arrs[0].shape
    lead = shape[:-2]
    g = int(np.prod(lead)) if lead else 1
    n = shape[-1]
    blk = min(lane_block, n)
    nb = -(-n // blk)
    pad = nb * blk - n
    flat = [a.reshape((g,) + shape[-2:]) for a in arrs]
    if pad:
        flat = [
            jnp.concatenate([a, jnp.zeros((g, L, pad), jnp.uint32)], axis=-1)
            for a in flat
        ]
    bspec = pl.BlockSpec((1, L, blk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(g, nb),
        in_specs=[bspec] * n_in,
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((g, L, nb * blk), jnp.uint32),
        interpret=interpret,
    )(*flat)
    return out[..., :n].reshape(shape)


def _mk_binop(kfn):
    def kernel(a_ref, b_ref, o_ref, *, spec):
        o_ref[0] = kfn(a_ref[0], b_ref[0], spec)

    return kernel


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def mont_mul(a, b, spec: str, interpret: bool = False):
    kern = functools.partial(_mk_binop(k_mont_mul), spec=spec)
    return _elementwise_call(kern, 2, [a, b], interpret)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def add(a, b, spec: str, interpret: bool = False):
    kern = functools.partial(_mk_binop(k_add), spec=spec)
    return _elementwise_call(kern, 2, [a, b], interpret)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def sub(a, b, spec: str, interpret: bool = False):
    kern = functools.partial(_mk_binop(k_sub), spec=spec)
    return _elementwise_call(kern, 2, [a, b], interpret)
