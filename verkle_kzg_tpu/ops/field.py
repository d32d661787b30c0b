"""Batched modular arithmetic on 16x16-bit limb planes (uint32), in JAX.

This is the TPU-native substitute for ark_ff (SURVEY.md §2.3 item 1;
consumed by the reference everywhere, e.g. ``vector-commit/src/ipa/mod.rs:4``).

LAYOUT (the load-bearing design decision): a field-element batch is a uint32
array of shape ``(..., L, B)`` — the LIMB axis is second-to-minor and the
ELEMENT batch axis is minor. On TPU the minor axis maps to the 128-wide
vector lanes, so every limb plane is a fully-packed vreg row; the
batch-minor layout measured ~30x faster than batch-major (a 16-wide minor
axis wastes 7/8 of every vreg). 16-bit limbs keep every limb product exactly
representable in uint32 and let lazy column accumulators stay far below
2**32 (worst case ~2**23 inside mont_mul) — no 64-bit multiply needed, the
op mix is pure int32/uint32 VPU work.

  * Multiplication is Montgomery (R = 2**256): schoolbook product into a
    rotating 17-row column window interleaved with the 16 reduction rounds
    (CIOS), fully unrolled: static straight-line code, no loop overhead.
  * Inversion is Fermat (a^(m-2)) as a ``lax.scan`` over the static exponent
    bits; batch inversion is Montgomery's trick via ``lax.associative_scan``
    (the scan analog of ark_ff::batch_inversion, ``precompute.rs:55``).

All functions take the field via the static ``spec`` string ("fq" | "fr").
Values are kept fully reduced (< modulus); Montgomery-form arrays are noted
as such in each docstring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import FQ, FR, LIMB_BITS, LIMB_MASK, NLIMBS, FieldSpec
from .limbs import int_to_limbs

L = NLIMBS
_MASK32 = np.uint32(LIMB_MASK)
_MASK32_I = np.int32(LIMB_MASK)

_SPECS: dict[str, FieldSpec] = {"fq": FQ, "fr": FR}

# Unroll factor for the CIOS rounds scan: 1 = smallest compile graphs (the
# right choice on this 1-core host for CPU testing), larger = fewer loop
# iterations at runtime. Override with VKZG_MUL_UNROLL (resolved once in
# knobs.py; part of the AOT artifact key via knobs.snapshot()).
from ..knobs import MUL_UNROLL as _MUL_UNROLL


@functools.lru_cache(maxsize=None)
class _Consts:
    """Per-field device constants, cached per spec name. Plain numpy: safe
    to close over from any jit trace."""

    def __init__(self, spec: str):
        fs = _SPECS[spec]
        self.spec = fs
        self.mod = np.asarray(fs.modulus_limbs, dtype=np.uint32)  # (L,)
        self.mod_col = self.mod[:, None]  # (L, 1) broadcasts over lanes
        self.n0inv = np.uint32(fs.n0inv)
        self.r_mod = np.asarray(fs.r_mod_limbs, dtype=np.uint32)
        self.r2_mod = np.asarray(fs.r2_mod_limbs, dtype=np.uint32)
        e = fs.inv_exponent
        nbits = e.bit_length()
        self.inv_bits = np.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32
        )


def consts(spec: str) -> _Consts:
    return _Consts(spec)


# ---------------------------------------------------------------------------
# Constructors / predicates  (shapes are (..., L, B))
# ---------------------------------------------------------------------------


def zeros(lead=(), b: int | None = None) -> jnp.ndarray:
    """(lead..., L, b) zeros; b=None gives a lane-less (lead..., L) vector
    (host-boundary use only — device math wants a trailing lane axis)."""
    shape = tuple(lead) + (L,) + ((b,) if b is not None else ())
    return jnp.zeros(shape, dtype=jnp.uint32)


def one_mont(spec: str, lead=(), b: int | None = None) -> jnp.ndarray:
    """Multiplicative identity in Montgomery form (= R mod m)."""
    one = consts(spec).r_mod  # (L,)
    shape = tuple(lead) + (L,) + ((b,) if b is not None else ())
    if b is not None:
        one = one[:, None]
    return jnp.broadcast_to(one, shape)


def const_mont(value: int, spec: str) -> np.ndarray:
    """Host helper: the integer ``value`` in Montgomery form, shape (L,)."""
    fs = _SPECS[spec]
    return np.asarray(int_to_limbs((value << 256) % fs.modulus), dtype=np.uint32)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """(..., L, B) -> (..., B) bool (also handles (..., L) -> (...))."""
    return jnp.all(a == 0, axis=_limb_axis(a))


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=_limb_axis(a))


def _limb_axis(a) -> int:
    # Limb axis is -2 when a trailing batch axis exists, else -1. We encode
    # this statically: arrays with ndim >= 2 and last dim != L, or by
    # convention ALL device arrays here are (..., L, B). Host-side (L,)
    # vectors are the only exception.
    return -2 if a.ndim >= 2 else -1


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask shape broadcastable to (..., B) (a/b minus the limb axis)."""
    if a.ndim >= 2:
        mask = jnp.broadcast_to(mask, a.shape[:-2] + a.shape[-1:])
    return jnp.where(jnp.expand_dims(mask, _limb_axis(a)), a, b)


# ---------------------------------------------------------------------------
# Carry machinery (static unrolled; limb axis -2)
# ---------------------------------------------------------------------------


def _carry(x: jnp.ndarray) -> jnp.ndarray:
    """Propagate 16-bit carries over the limb axis (uint32 columns), as a
    3-op lax.scan. Caller must guarantee the value fits in the limb count."""
    xs = jnp.moveaxis(x, -2, 0)

    def body(c, col):
        v = col + c
        return v >> LIMB_BITS, v & _MASK32

    _, out = jax.lax.scan(
        body, jnp.zeros(xs.shape[1:], jnp.uint32), xs, unroll=_MUL_UNROLL
    )
    return jnp.moveaxis(out, 0, -2)


def _carry_signed(d: jnp.ndarray) -> jnp.ndarray:
    """Signed borrow/carry propagation over the limb axis (int32 columns);
    the final carry's sign is folded into the top limb."""
    ds = jnp.moveaxis(d, -2, 0)

    def body(c, col):
        v = col + c
        return v >> LIMB_BITS, v & _MASK32_I  # arithmetic shift = floor div

    carry, out = jax.lax.scan(
        body, jnp.zeros(ds.shape[1:], jnp.int32), ds, unroll=_MUL_UNROLL
    )
    out = out.at[L - 1].add(carry << LIMB_BITS)
    return jnp.moveaxis(out, 0, -2)


def _cond_sub_mod(x: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Reduce x in [0, 2m) to [0, m): subtract m unless that underflows.
    x normalized (< 2^16 per limb), limb axis -2."""
    mod = consts(spec).mod_col
    dd = _carry_signed(x.astype(jnp.int32) - mod.astype(jnp.int32))
    underflow = dd[..., L - 1, :] < 0
    return jnp.where(underflow[..., None, :], x, dd.astype(jnp.uint32))


# ---------------------------------------------------------------------------
# Add / sub / neg (form-agnostic)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames="spec")
def add(a: jnp.ndarray, b: jnp.ndarray, spec: str) -> jnp.ndarray:
    return _cond_sub_mod(_carry(a + b), spec)


@functools.partial(jax.jit, static_argnames="spec")
def sub(a: jnp.ndarray, b: jnp.ndarray, spec: str) -> jnp.ndarray:
    # a + m - b in (0, 2m); limbwise can be negative -> int32 + signed carry
    d = (a + consts(spec).mod_col).astype(jnp.int32) - b.astype(jnp.int32)
    return _cond_sub_mod(_carry_signed(d).astype(jnp.uint32), spec)


def neg(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    return select(is_zero(a), a, sub(jnp.zeros_like(a), a, spec))


def double(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    return add(a, a, spec)


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS, fully unrolled straight-line code)
# ---------------------------------------------------------------------------


def _mont_mul_raw(a: jnp.ndarray, b: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Interleaved multiply+reduce (CIOS) over a rotating column window.

    The window is a (..., L+2, B) lazy-column array; each of the 16 rounds
    adds a_i * b and m_i * mod into it (VECTORIZED over the limb axis: one
    multiply + two padded adds each), then retires the lowest column.
    Structured as a lax.scan with a ~14-op body: compile size is constant in
    L; runtime loop overhead amortizes over the lane batch. Column bound
    <= 4 * 2^16 * 16 < 2^23. Output: 16 lazy columns (pre-carry).
    """
    cst = consts(spec)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    lead, bsz = shape[:-2], shape[-1]
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    mod = jnp.asarray(cst.mod_col)  # (L, 1)

    cols0 = jnp.zeros(lead + (L + 2, bsz), jnp.uint32)
    zero1 = jnp.zeros(lead + (1, bsz), jnp.uint32)
    a_rounds = jnp.moveaxis(a, -2, 0)  # (L, ..., B): round i uses limb i

    def pad_lo(p):  # (..., L, B) -> (..., L+2, B) at offset 0
        return jnp.concatenate([p, zero1, zero1], axis=-2)

    def pad_hi(p):  # offset 1
        return jnp.concatenate([zero1, p, zero1], axis=-2)

    def round_(cols, ai):
        p = ai[..., None, :] * b  # (..., L, B), exact in uint32
        cols = cols + pad_lo(p & _MASK32) + pad_hi(p >> LIMB_BITS)
        m = ((cols[..., 0, :] & _MASK32) * cst.n0inv) & _MASK32
        q = m[..., None, :] * mod
        cols = cols + pad_lo(q & _MASK32) + pad_hi(q >> LIMB_BITS)
        carry = cols[..., 0, :] >> LIMB_BITS
        cols = jnp.concatenate([cols[..., 1:, :], zero1], axis=-2)
        cols = cols.at[..., 0, :].add(carry)
        return cols, None

    cols, _ = jax.lax.scan(round_, cols0, a_rounds, unroll=_MUL_UNROLL)
    return cols[..., :L, :]


@functools.partial(jax.jit, static_argnames="spec")
def mont_mul(a: jnp.ndarray, b: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Montgomery product: (a * b * R^-1) mod m. Mont in -> Mont out.
    Result < 2m before the conditional subtract (m < R/4)."""
    return _cond_sub_mod(_carry(_mont_mul_raw(a, b, spec)), spec)


def mont_sq(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    return mont_mul(a, a, spec)


def to_mont(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Standard -> Montgomery form. Accepts any (even unreduced) 256-bit a."""
    r2 = consts(spec).r2_mod[:, None] if a.ndim >= 2 else consts(spec).r2_mod
    return mont_mul(a, jnp.broadcast_to(r2, a.shape), spec)


@functools.partial(jax.jit, static_argnames="spec")
def from_mont(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Montgomery -> standard form (multiply by 1 and reduce)."""
    one = jnp.zeros_like(a).at[..., 0, :].set(1) if a.ndim >= 2 else (
        jnp.zeros_like(a).at[0].set(1)
    )
    return mont_mul(a, one, spec)


@functools.partial(jax.jit, static_argnames="spec")
def reduce_columns(cols: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Collapse (..., L, B) lazy uint32 columns (sums of up to ~2^15
    Montgomery-form terms, accumulated with plain integer adds) back to a
    reduced Montgomery element: multiply by one with the lazy columns as
    the 'a' operand — _mont_mul_raw never requires normalized inputs for
    'b'... but DOES use a's rows as multipliers, so feed the lazy value as
    'b' and one as 'a'."""
    one = jnp.zeros_like(cols).at[..., 0, :].set(1)
    # value(cols) < 2^15 * m => value * R^-1 * R = value mod m via mont with
    # a = R^2? No: mont(one, cols) = cols * R^-1; then * R^2 * R^-1 = cols.
    v = _cond_sub_mod(_carry(_mont_mul_raw(one, cols, spec)), spec)
    r2 = jnp.broadcast_to(consts(spec).r2_mod[:, None], v.shape)
    return mont_mul(v, r2, spec)


def lazy_sum(a: jnp.ndarray, axis: int, spec: str) -> jnp.ndarray:
    """Modular sum of Montgomery elements over a BATCH axis via lazy columns.
    ``axis`` must not be the limb axis (-2) or the lane axis (-1).

    Reductions of >= 2^15 terms are chunked: 16-bit limb columns only hold
    ~2^16 lazy terms before uint32 overflow, so each 2^15-block collapses
    through one Montgomery pass and the (reduced) block results are summed
    recursively — arbitrary reduction sizes, still O(1) dispatches."""
    n = a.shape[axis]
    blk = 1 << 15
    if n > blk:
        axis_pos = axis % a.ndim
        nb = -(-n // blk)
        if nb * blk != n:
            padw = [(0, 0)] * a.ndim
            padw[axis_pos] = (0, nb * blk - n)
            a = jnp.pad(a, padw)
        a = a.reshape(
            a.shape[:axis_pos] + (nb, blk) + a.shape[axis_pos + 1 :]
        )
        cols = jnp.sum(a, axis=axis_pos + 1, dtype=jnp.uint32)
        return lazy_sum(reduce_columns(cols, spec), axis_pos, spec)
    cols = jnp.sum(a, axis=axis, dtype=jnp.uint32)
    return reduce_columns(cols, spec)


@functools.partial(jax.jit, static_argnames="spec")
def lazy_sum_lanes(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Modular sum over the LANE axis: (..., L, B) -> (..., L, 1).
    B must be < 2^16 (lazy column bound)."""
    assert a.shape[-1] < (1 << LIMB_BITS), "lazy_sum reduction too large"
    cols = jnp.sum(a, axis=-1, keepdims=True, dtype=jnp.uint32)
    return reduce_columns(cols, spec)


# ---------------------------------------------------------------------------
# Inversion
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames="spec")
def inv_mont(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Fermat inverse of Montgomery-form a (0 -> 0). Mont in -> Mont out."""
    cst = consts(spec)
    acc0 = one_mont(spec, a.shape[:-2], a.shape[-1])

    def body(acc, bit):
        acc = mont_sq(acc, spec)
        acc = select(bit.astype(bool), mont_mul(acc, a, spec), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, jnp.asarray(cst.inv_bits))
    return select(is_zero(a), a, acc)


@functools.partial(jax.jit, static_argnames=("spec", "axis"))
def batch_inv_mont(a: jnp.ndarray, spec: str, axis: int = -1) -> jnp.ndarray:
    """Montgomery's trick over a batch axis (default: the lane axis):
    one Fermat inverse + O(n) muls, log-depth via associative scans.
    Zero entries invert to zero (ark_ff::batch_inversion skip-zeros).

    Lane-axis inversion is chunked: the n lanes become ceil(n/128)
    independent 128-lane chains so the VPU stays fully packed."""
    lane_axis = a.ndim - 1
    if axis in (-1, lane_axis):
        n = a.shape[-1]
        k = min(n, 128)
        chunks = -(-n // k)
        pad = chunks * k - n
        x = a
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (pad,), jnp.uint32)], axis=-1
            )
        x = x.reshape(x.shape[:-1] + (chunks, k))  # (..., L, C, K)
        x = jnp.moveaxis(x, -2, 0)  # (C, ..., L, K)
        out = _batch_inv_lead(x, spec)
        out = jnp.moveaxis(out, 0, -2).reshape(a.shape[:-1] + (chunks * k,))
        return out[..., :n]
    ax = axis % a.ndim
    x = jnp.moveaxis(a, ax, 0)
    out = _batch_inv_lead(x, spec)
    return jnp.moveaxis(out, 0, ax)


def _batch_inv_lead(x: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Batch inversion over axis 0 of (n, ..., L, B) Montgomery arrays."""
    z = is_zero(x)
    one = one_mont(spec, x.shape[:-2], x.shape[-1])
    safe = select(z, one, x)

    mul = functools.partial(mont_mul, spec=spec)
    prefix = jax.lax.associative_scan(mul, safe, axis=0)
    suffix = jax.lax.associative_scan(mul, safe, axis=0, reverse=True)
    total_inv = inv_mont(prefix[-1], spec)

    n = x.shape[0]
    left = jnp.concatenate([one[:1], prefix[: n - 1]], axis=0)
    right = jnp.concatenate([suffix[1:], one[:1]], axis=0)
    inv = mul(mul(left, right), total_inv)
    return select(z, x, inv)


# ---------------------------------------------------------------------------
# Misc protocol helpers
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n", "spec"))
def powers_of_mont(x_mont: jnp.ndarray, n: int, spec: str) -> jnp.ndarray:
    """[1, x, ..., x^(n-1)] in Montgomery form: (L,) -> (n, L, 1)->(L, n).

    Mirrors ``vector-commit/src/utils.rs:44-55`` as a log-depth scan.
    Returns shape (L, n) (powers across lanes).
    """
    reps = jnp.broadcast_to(x_mont[None, :, None], (n, L, 1))
    reps = reps.at[0].set(one_mont(spec, (), 1))
    out = jax.lax.associative_scan(functools.partial(mont_mul, spec=spec), reps)
    return out[..., 0].T  # (L, n)
