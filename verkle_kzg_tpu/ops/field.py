"""Batched modular arithmetic on 16x16-bit limb planes (uint32), in JAX.

This is the TPU-native substitute for ark_ff (SURVEY.md §2.3 item 1;
consumed by the reference everywhere, e.g. ``vector-commit/src/ipa/mod.rs:4``).
Design:

  * A field element batch is a uint32 array of shape ``(..., 16)`` —
    little-endian 16-bit limbs. 16-bit limbs keep every limb product exactly
    representable in uint32 and let lazy column accumulators stay far below
    2**32 (worst case ~2**23 inside mont_mul), so no 64-bit widening multiply
    is ever needed — the op mix is pure int32/uint32 VPU work.
  * Multiplication is Montgomery (R = 2**256): schoolbook product into 32
    lazy columns with lo/hi split, then 16 interleaved reduction rounds.
  * Inversion is Fermat (a^(m-2)) as a ``lax.scan`` over the static exponent
    bits; batch inversion is Montgomery's trick via ``lax.associative_scan``
    (the scan-based equivalent of ark_ff::batch_inversion,
    ``vector-commit/src/precompute.rs:55``).

All functions take the field via the static ``spec`` string ("fq" | "fr") so
traced code specializes per field. Values are kept fully reduced (< modulus);
Montgomery-form arrays are noted as such in each docstring.
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

_SPECS: dict[str, FieldSpec] = {"fq": FQ, "fr": FR}


@functools.lru_cache(maxsize=None)
class _Consts:
    """Per-field device constants, cached per spec name."""

    def __init__(self, spec: str):
        fs = _SPECS[spec]
        self.spec = fs
        # Plain numpy constants: safe to close over from any jit trace
        # (device arrays created inside a trace would leak as tracers).
        self.mod = np.asarray(fs.modulus_limbs, dtype=np.uint32)
        self.n0inv = np.uint32(fs.n0inv)
        self.r_mod = np.asarray(fs.r_mod_limbs, dtype=np.uint32)  # one, Mont form
        self.r2_mod = np.asarray(fs.r2_mod_limbs, dtype=np.uint32)
        # Static MSB-first bit string of the Fermat exponent (modulus - 2).
        e = fs.inv_exponent
        nbits = e.bit_length()
        self.inv_bits = np.asarray(
            [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32
        )


def consts(spec: str) -> _Consts:
    return _Consts(spec)


# ---------------------------------------------------------------------------
# Constructors / predicates
# ---------------------------------------------------------------------------


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (L,), dtype=jnp.uint32)


def one_mont(spec: str, shape=()) -> jnp.ndarray:
    """Multiplicative identity in Montgomery form (= R mod m)."""
    return jnp.broadcast_to(consts(spec).r_mod, tuple(shape) + (L,))


def const_mont(value: int, spec: str) -> jnp.ndarray:
    """Host helper: embed the integer ``value`` in Montgomery form."""
    fs = _SPECS[spec]
    enc = (value << 256) % fs.modulus
    return jnp.asarray(int_to_limbs(enc), dtype=jnp.uint32)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """(..., L) -> (...,) bool. Valid for fully-reduced representations."""
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise where over the limb axis; mask shape (...,)."""
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# Carry machinery
# ---------------------------------------------------------------------------


def _carry(x: jnp.ndarray) -> jnp.ndarray:
    """Propagate 16-bit carries left->right over the last axis (uint32 cols),
    as a lax.scan (3-op body: compile-size stays constant in the limb count).

    Caller must guarantee the represented value fits in the limb count.
    """
    xt = jnp.moveaxis(x, -1, 0)

    def body(c, col):
        v = col + c
        return v >> LIMB_BITS, v & _MASK32

    _, out = jax.lax.scan(body, jnp.zeros(x.shape[:-1], jnp.uint32), xt)
    return jnp.moveaxis(out, 0, -1)


def _carry_signed(d: jnp.ndarray) -> jnp.ndarray:
    """Signed borrow/carry propagation for int32 limb columns."""
    dt = jnp.moveaxis(d, -1, 0)

    def body(c, col):
        v = col + c
        return v >> LIMB_BITS, v & jnp.int32(LIMB_MASK)  # arithmetic shift

    carry, out = jax.lax.scan(body, jnp.zeros(d.shape[:-1], jnp.int32), dt)
    out = jnp.moveaxis(out, 0, -1)
    # fold the final carry's sign into the top limb so callers can test < 0
    return out.at[..., L - 1].add(carry << LIMB_BITS)


def _cond_sub_mod(x: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Reduce x in [0, 2m) to [0, m): subtract m unless that underflows."""
    mod = consts(spec).mod
    d = _carry_signed(x.astype(jnp.int32) - mod.astype(jnp.int32))
    underflow = d[..., L - 1] < 0
    return jnp.where(underflow[..., None], x, d.astype(jnp.uint32))


# ---------------------------------------------------------------------------
# Add / sub / neg (form-agnostic: work for standard and Montgomery encodings)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames="spec")
def add(a: jnp.ndarray, b: jnp.ndarray, spec: str) -> jnp.ndarray:
    return _cond_sub_mod(_carry(a + b), spec)


@functools.partial(jax.jit, static_argnames="spec")
def sub(a: jnp.ndarray, b: jnp.ndarray, spec: str) -> jnp.ndarray:
    # a + m - b is in (0, 2m) for reduced a, b; limbwise values can go
    # negative before carry propagation, so work in int32.
    d = (a + consts(spec).mod).astype(jnp.int32) - b.astype(jnp.int32)
    return _cond_sub_mod(_carry_signed(d).astype(jnp.uint32), spec)


def neg(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    return select(is_zero(a), a, sub(zeros(a.shape[:-1]), a, spec))


def double(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    return add(a, a, spec)


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------


def _mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product into 32 lazy uint32 columns (each < 2**22).

    Horner over a's limbs (MSB first) as a lax.scan with an ~8-op body:
    cols <- (cols << 16 limbs) + split(a_i * b). Constant compile size.
    """
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    cols0 = jnp.zeros(shape + (2 * L,), dtype=jnp.uint32)
    zeros_pad = jnp.zeros(shape + (L,), dtype=jnp.uint32)
    zero1 = jnp.zeros(shape + (1,), dtype=jnp.uint32)
    a_limbs_msb = jnp.moveaxis(jnp.broadcast_to(a, shape + (L,)), -1, 0)[::-1]

    def body(cols, a_limb):
        p = a_limb[..., None] * b  # exact: (2^16-1)^2 < 2^32
        term = jnp.concatenate([p & _MASK32, zeros_pad], axis=-1)
        term = term + jnp.concatenate(
            [zero1, p >> LIMB_BITS, zeros_pad[..., 1:]], axis=-1
        )
        shifted = jnp.concatenate([zero1, cols[..., : 2 * L - 1]], axis=-1)
        return shifted + term, None

    cols, _ = jax.lax.scan(body, cols0, a_limbs_msb)
    return cols


def _mont_reduce(cols: jnp.ndarray, spec: str) -> jnp.ndarray:
    """32 lazy columns -> (value * R^-1) mod m, fully reduced.

    Requires represented value < m * R (true for products of reduced inputs
    and for lazy sums of < 2**16 Montgomery-form terms). 16 reduction rounds
    as a lax.scan with a rotating column window (~12-op body).
    """
    cst = consts(spec)
    shape = cols.shape[:-1]
    zeros_pad = jnp.zeros(shape + (L - 1,), dtype=jnp.uint32)
    zero1 = jnp.zeros(shape + (1,), dtype=jnp.uint32)

    def body(cols, _):
        m = ((cols[..., 0] & _MASK32) * cst.n0inv) & _MASK32
        p = m[..., None] * cst.mod  # (..., L)
        lo = jnp.concatenate([p & _MASK32, zeros_pad, zero1], axis=-1)
        hi = jnp.concatenate([zero1, p >> LIMB_BITS, zeros_pad], axis=-1)
        cols = cols + lo + hi
        carry = cols[..., 0] >> LIMB_BITS  # low 16 bits are now 0 (mod 2^16)
        cols = jnp.concatenate([cols[..., 1:], zero1], axis=-1)
        cols = cols.at[..., 0].add(carry)
        return cols, None

    cols, _ = jax.lax.scan(body, cols, None, length=L)
    res = _carry(cols[..., :L])
    return _cond_sub_mod(res, spec)


@functools.partial(jax.jit, static_argnames="spec")
def mont_mul(a: jnp.ndarray, b: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Montgomery product: (a * b * R^-1) mod m. Mont in -> Mont out."""
    return _mont_reduce(_mul_wide(a, b), spec)


def mont_sq(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    return mont_mul(a, a, spec)


def to_mont(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Standard -> Montgomery form. Accepts any (even unreduced) 256-bit a."""
    return mont_mul(a, consts(spec).r2_mod, spec)


@functools.partial(jax.jit, static_argnames="spec")
def from_mont(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Montgomery -> standard form (multiply by 1 and reduce)."""
    cols = jnp.zeros(a.shape[:-1] + (2 * L,), dtype=jnp.uint32)
    cols = cols.at[..., :L].set(a)
    return _mont_reduce(cols, spec)


@functools.partial(jax.jit, static_argnames="spec")
def reduce_columns(cols: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Reduce up-to-32 lazy uint32 columns to a field element (same form).

    Used for "lazy accumulation": sums of up to ~2**15 Montgomery-form terms
    can be accumulated as plain integer column adds (no modular reduction),
    then collapsed here with one Montgomery pass:
    value*R^-1 mod m, then re-multiplied by R^2*R^-1 = R. Mont in -> Mont out.
    """
    k = cols.shape[-1]
    if k < 2 * L:
        cols = jnp.concatenate(
            [cols, jnp.zeros(cols.shape[:-1] + (2 * L - k,), dtype=jnp.uint32)],
            axis=-1,
        )
    v = _mont_reduce(cols, spec)  # value * R^-1
    return mont_mul(v, consts(spec).r2_mod, spec)  # * R^2 * R^-1 = value


@functools.partial(jax.jit, static_argnames=("axis", "spec"))
def lazy_sum(a: jnp.ndarray, axis: int, spec: str) -> jnp.ndarray:
    """Modular sum over ``axis`` of Montgomery-form elements via lazy columns.

    Valid for reduction sizes up to 2**16 (column bound 2**16 * 2**16 = 2**32
    is exclusive; we require size < 2**16).
    """
    n = a.shape[axis]
    assert n < (1 << LIMB_BITS), "lazy_sum reduction too large"
    cols = jnp.sum(a, axis=axis, dtype=jnp.uint32)
    return reduce_columns(cols, spec)


# ---------------------------------------------------------------------------
# Inversion
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames="spec")
def inv_mont(a: jnp.ndarray, spec: str) -> jnp.ndarray:
    """Fermat inverse of Montgomery-form a (0 -> 0). Mont in -> Mont out."""
    cst = consts(spec)
    acc0 = jnp.broadcast_to(cst.r_mod, a.shape)

    def body(acc, bit):
        acc = mont_sq(acc, spec)
        acc = select(bit.astype(bool), mont_mul(acc, a, spec), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, cst.inv_bits)
    # a = 0: 0^(m-2) = 0 already (acc stays a multiple of the 0 factor only
    # when a bit multiplies in... acc is 1 until first mul; explicit fix:)
    return select(is_zero(a), a, acc)


@functools.partial(jax.jit, static_argnames=("spec", "axis"))
def batch_inv_mont(a: jnp.ndarray, spec: str, axis: int = 0) -> jnp.ndarray:
    """Montgomery's trick over ``axis``: one Fermat inverse + O(n) muls.

    Zero entries invert to zero (mirroring ark_ff::batch_inversion's
    skip-zeros semantics, ``vector-commit/src/lagrange_basis.rs:134``).
    """
    if axis != 0:
        a_moved = jnp.moveaxis(a, axis, 0)
        out = batch_inv_mont(a_moved, spec, axis=0)
        return jnp.moveaxis(out, 0, axis)

    z = is_zero(a)
    one = jnp.broadcast_to(consts(spec).r_mod, a.shape)
    safe = select(z, one, a)

    mul = functools.partial(mont_mul, spec=spec)
    prefix = jax.lax.associative_scan(mul, safe, axis=0)  # inclusive prefixes
    suffix = jax.lax.associative_scan(mul, safe, axis=0, reverse=True)
    total_inv = inv_mont(prefix[-1], spec)

    n = a.shape[0]
    left = jnp.concatenate([one[:1], prefix[: n - 1]], axis=0)  # prod before i
    right = jnp.concatenate([suffix[1:], one[:1]], axis=0)  # prod after i
    inv = mont_mul(mont_mul(left, right, spec), total_inv, spec)
    return select(z, a, inv)


# ---------------------------------------------------------------------------
# Misc protocol helpers
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n", "spec"))
def powers_of_mont(x_mont: jnp.ndarray, n: int, spec: str) -> jnp.ndarray:
    """[1, x, x^2, ..., x^(n-1)] in Montgomery form, shape (n, L).

    Mirrors ``vector-commit/src/utils.rs:44-55`` but as a log-depth
    associative scan.
    """
    reps = jnp.broadcast_to(x_mont, (n,) + x_mont.shape)
    reps = reps.at[0].set(one_mont(spec))
    return jax.lax.associative_scan(functools.partial(mont_mul, spec=spec), reps)
