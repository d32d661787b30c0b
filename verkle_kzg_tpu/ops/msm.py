"""Multi-scalar multiplication (MSM) on TPU: batched Pippenger.

The reference's MSM is a naive serial fold (``vector-commit/src/utils.rs:16-19``
— one full scalar-mul per element). The TPU-native design:

  * **Pippenger bucket method**, all windows processed SIMULTANEOUSLY as a
    leading batch axis (window-parallel), points streamed through a
    ``lax.fori_loop`` so the trace is small and shapes static;
  * **Lane parallelism**: the point stream is folded into the minor (lane)
    axis so each sequential step performs a (windows x lanes)-wide batch of
    complete mixed additions — fully packed VPU work;
  * **Complete formulas** (ops/curve.py): every step is branchless;
  * bucket post-processing = two Hillis-Steele suffix scans in the group
    (sum of suffix sums) — log-depth, constant compile size.

Layout (ops/field.py): affine points (..., 2, L, N), scalars (..., L, N),
N in the minor/lane axis. Results are single points shaped (..., 3, L, 1).
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
from . import pallas_curve as PC
from . import pallas_msm as PM
from ..utils import metrics

L = NLIMBS
TOTAL_BITS = LIMB_BITS * L  # 256

# Pallas dispatch for the bucket-accumulation inner loop: on TPU the fused
# Mosaic mixed-add (one kernel per step instead of ~200 scan-round
# dispatches) is the round-2 perf fix for the memory-bound XLA pipeline
# (BASELINE.md round-1 note). VKZG_PALLAS=0 forces the XLA path; =1 forces
# pallas even off-TPU (interpret mode — slow, test-only). All three knobs
# are resolved once in knobs.py and hashed into AOT keys (knobs.snapshot).
from ..knobs import PALLAS as _PALLAS_ENV
from ..knobs import SIGNED as _SIGNED_ENV
from ..knobs import WINDOW_C as _WINDOW_C


def _pallas_mode() -> str:
    """'off' | 'compiled' | 'interpret' (resolved at trace time)."""
    if _PALLAS_ENV == "0":
        return "off"
    on_tpu = jax.default_backend() == "tpu"
    if _PALLAS_ENV == "1":
        return "compiled" if on_tpu else "interpret"
    return "compiled" if on_tpu else "off"


def _mixed_add(p, q_affine):
    mode = _pallas_mode()
    if mode == "off":
        return C.mixed_add(p, q_affine)
    return PC.mixed_add(p, q_affine, interpret=(mode == "interpret"))


def fold_reduce_lanes(p: jnp.ndarray) -> jnp.ndarray:
    """Tree-reduce points over the LANE axis: (..., 3, L, N) -> (..., 3, L, 1).
    Unrolled halving (compile size ~ log N point-adds; no transposes)."""
    while p.shape[-1] > 1:
        n = p.shape[-1]
        half = n // 2
        folded = C.add(p[..., :half], p[..., half : 2 * half])
        if n % 2:
            folded = jnp.concatenate([folded, p[..., 2 * half :]], axis=-1)
        p = folded
    return p


def tree_reduce_points(p: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Tree-reduce points along a LEADING batch axis (small axes)."""
    p = jnp.moveaxis(p, axis, 0)
    while p.shape[0] > 1:
        n = p.shape[0]
        half = n // 2
        folded = C.add(p[:half], p[half : 2 * half])
        if n % 2:
            folded = jnp.concatenate([folded, p[2 * half :]], axis=0)
        p = folded
    return p[0]


def suffix_scan_points(p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive SUFFIX sums along a leading axis (Hillis-Steele) as a
    fori_loop whose body is ONE batched complete add: log-depth runtime,
    constant compile size."""
    p = jnp.moveaxis(p, axis, 0)
    n = p.shape[0]
    if n > 1:
        log_steps = (n - 1).bit_length()
        idx = jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * (p.ndim - 1), 0)

        def sstep(k, x):
            sh = jnp.int32(1) << k
            shifted = jnp.roll(x, -sh, axis=0)
            valid = idx + sh < n
            return jnp.where(valid, C.add(x, shifted), x)

        p = jax.lax.fori_loop(0, log_steps, sstep, p)
    return jnp.moveaxis(p, 0, axis)


def msm_naive(points_proj: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """Oracle MSM: per-point scalar_mul + lane tree reduction. Semantics of
    ``inner_product`` over points (``utils.rs:16-19``). (3, L, N)x(L, N)."""
    return fold_reduce_lanes(C.scalar_mul(points_proj, scalars))


def _msm_auto_impl(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int | None = None,
    lanes: int = 128,
) -> jnp.ndarray:
    """msm_auto without metrics: safe to close over inside shard_map/jit
    traces (a metrics.record reached there would fire once per compile, not
    per execution — see utils/metrics.py)."""
    n = points_affine.shape[-1]
    if n < 64:
        mode = _pallas_mode()
        if mode != "off":
            prods = PC.scalar_mul_affine(
                points_affine, scalars, interpret=(mode == "interpret")
            )
            return fold_reduce_lanes(prods)
        return fold_reduce_lanes(C.scalar_mul(C.from_affine(points_affine), scalars))
    return msm_pippenger(points_affine, scalars, c=c, lanes=lanes)


from ..utils.aot import aot_jit

#: Persistent-AOT twin of the eager single-MSM entry: a plain-jit Pallas
#: program's Mosaic compile does NOT survive the process (measured 57 s
#: for the first 256-point Pippenger of every fresh process on the
#: tunnel-attached v5e, paid by every commit/verify), while deserialized
#: jax.export artifacts re-link in ~2 s. One artifact per (shape, c,
#: lanes); in-trace callers keep using _msm_auto_impl directly.
_msm_auto_program = aot_jit(
    _msm_auto_impl, "msm_auto", static_argnames=("c", "lanes")
)


def msm_auto(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int | None = None,
    lanes: int = 128,
) -> jnp.ndarray:
    """Size-adaptive MSM: naive double-and-add for small N (the bucket
    machinery costs ~W * 2^c slots regardless of N), Pippenger with
    c ~ log2(N) otherwise. (2, L, N) x (L, N) -> (3, L, 1)."""
    metrics.record("msm.single.calls")
    metrics.record("msm.single.points", points_affine.shape[-1])
    if isinstance(points_affine, jax.core.Tracer) or isinstance(
        scalars, jax.core.Tracer
    ):
        # called under an outer trace (e.g. the host-sequenced IPA round):
        # inline — the outer program owns compilation/AOT
        return _msm_auto_impl(points_affine, scalars, c=c, lanes=lanes)
    return _msm_auto_program(points_affine, scalars, c=c, lanes=lanes)


def window_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(..., L, N) standard scalars -> (W, ..., N) uint32 digits, LSB window
    first, W = ceil(256/c)."""
    w = math.ceil(TOTAL_BITS / c)
    shifts = jnp.arange(LIMB_BITS, dtype=jnp.uint32)[:, None]
    bits = (scalars[..., None, :] >> shifts) & jnp.uint32(1)  # (..., L, 16, N)
    bits = bits.reshape(scalars.shape[:-2] + (TOTAL_BITS,) + scalars.shape[-1:])
    pad = w * c - TOTAL_BITS
    if pad:
        zshape = bits.shape[:-2] + (pad,) + bits.shape[-1:]
        bits = jnp.concatenate([bits, jnp.zeros(zshape, jnp.uint32)], axis=-2)
    bits = bits.reshape(scalars.shape[:-2] + (w, c) + scalars.shape[-1:])
    weights = (jnp.uint32(1) << jnp.arange(c, dtype=jnp.uint32))[:, None]
    digits = jnp.sum(bits * weights, axis=-2, dtype=jnp.uint32)  # (..., w, N)
    return jnp.moveaxis(digits, -2, 0)


def carry_mask_words(w: int) -> int:
    """uint32 words per scalar for the packed carry bitmask: bits 0..W
    must be addressable (the kernel reads bit w+1 as window w's carry-OUT;
    bit W itself is always 0, but the read must stay in bounds)."""
    return w // 32 + 1


def signed_carries(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(..., L, N) standard scalars -> (..., nwords, N) uint32 packed carry
    bitmask for balanced signed-digit recoding: bit w (of word w//32) =
    carry INTO window w, i.e. [scalar mod 2^(cw) > 2^(cw-1)], ties broken
    toward carry iff the low part is nonzero. Bit 0 is always 0; the carry
    out of the top window is 0 for scalars < 2^254 (Fr), so the top word's
    spill bit always reads 0."""
    raw = window_digits(scalars, c)  # (W, ..., N) uint32
    w = raw.shape[0]
    nwords = carry_mask_words(w)
    h = jnp.uint32(1 << (c - 1))
    words = [jnp.zeros(raw.shape[1:], jnp.uint32) for _ in range(nwords)]
    nz = jnp.zeros(raw.shape[1:], jnp.bool_)  # [scalar mod 2^(cw) != 0]
    for i in range(1, w):  # carry out of the top window is 0 (docstring)
        r = raw[i - 1]
        # low_{i} = r*2^(c(i-1)) + low_{i-1} > 2^(ci-1)  <=>
        #   r > 2^(c-1)  or  (r == 2^(c-1) and low_{i-1} > 0)
        carry = (r > h) | ((r == h) & nz)
        words[i >> 5] = words[i >> 5] | jnp.where(
            carry, jnp.uint32(1) << (i & 31), 0
        )
        nz = nz | (r != 0)
    return jnp.stack(words, axis=-2)  # (..., nwords, N)


def window_digits_signed(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """Balanced signed window digits: (..., L, N) -> (W, ..., N) int32 in
    [-2^(c-1), 2^(c-1)], LSB window first, with
    sum_w d_w 2^(cw) == scalar. Halves the live bucket range vs unsigned
    digits (bucket |d| <= 2^(c-1), sign applied to the point).

    Uses a direct LSB-first carry chain (d > 2^(c-1) -> emit d - 2^c,
    carry 1), so it works for ANY window width / count — unlike the packed
    carry mask of signed_carries (in-kernel path, 16 % c == 0). The two
    recodings may differ at exact-tie windows (d == 2^(c-1)) but both are
    valid balanced decompositions of the same scalar; only the group
    element is contract."""
    raw = window_digits(scalars, c).astype(jnp.int32)  # (W, ..., N)
    h = 1 << (c - 1)
    out = []
    carry = jnp.zeros(raw.shape[1:], jnp.int32)
    for i in range(raw.shape[0]):
        d = raw[i] + carry  # in [0, 2^c]
        carry = (d > h).astype(jnp.int32)
        out.append(d - (carry << c))
    # carry out of the top window is 0 for scalars < 2^(cW-1) (Fr < 2^254)
    return jnp.stack(out)


def _gather_buckets(buckets: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """(W, 2^c, 3, L, lanes) x (W, lanes) -> (W, 3, L, lanes)."""
    per_lane = jax.vmap(lambda bk, di: bk[di], in_axes=(-1, -1), out_axes=-1)
    return jax.vmap(per_lane, in_axes=(0, 0), out_axes=0)(buckets, d)


def _scatter_buckets(buckets, d, val) -> jnp.ndarray:
    per_lane = jax.vmap(
        lambda bk, di, v: bk.at[di].set(v), in_axes=(-1, -1, -1), out_axes=-1
    )
    return jax.vmap(per_lane, in_axes=(0, 0, 0), out_axes=0)(buckets, d, val)


def _signed_default() -> bool:
    """Balanced signed digits halve the live bucket range (the per-step
    whole-table gather/scatter is the top cost of the fused kernel at
    c = 8). Default ON; VKZG_SIGNED=0 restores unsigned digits (resolved
    once in knobs.py)."""
    return _SIGNED_ENV


def msm_pippenger(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int | None = None,
    lanes: int = 128,
    signed: bool | None = None,
) -> jnp.ndarray:
    """Single MSM of N (point, scalar) pairs -> one point (3, L, 1).

    ``c``: window bits (2^c buckets/window unsigned with trash bucket 0;
    signed digits shrink that to 2^(c-1)+1 on the XLA path and an exact
    2^(c-1) rows in the pallas kernels; default per dispatch mode — see
    _auto_c); ``lanes``:
    accumulation lanes (VPU width multiplier); ``signed``: balanced
    signed-digit windows (default from VKZG_SIGNED) — the per-step
    bucket-table scan is the fused kernel's dominant cost and signed
    digits shrink the live table."""
    n = points_affine.shape[-1]
    c = _auto_c(n, c)
    if signed is None:
        signed = _signed_default()
    # the fused pallas pipeline wants a power-of-two lane count (lane-fold
    # halvings); round a caller-supplied lane count DOWN to one (a non-pow2
    # value, e.g. via BENCH_LANES, would otherwise only trip the pallas
    # path's trace-time assert on TPU), then cap by the padded stream width.
    # padding fills the tail with zero scalars (bucket 0).
    lanes = 1 << max(0, lanes.bit_length() - 1)
    lanes = min(lanes, 1 << (n - 1).bit_length()) if n > 1 else 1
    nbuckets = 1 << c
    w = math.ceil(TOTAL_BITS / c)

    steps = math.ceil(n / lanes)
    padded = steps * lanes
    if padded != n:
        pp = padded - n
        points_affine = jnp.concatenate(
            [points_affine, jnp.zeros((2, L, pp), jnp.uint32)], axis=-1
        )
        scalars = jnp.concatenate([scalars, jnp.zeros((L, pp), jnp.uint32)], axis=-1)

    pts = points_affine.reshape(2, L, steps, lanes)

    mode = _pallas_mode()
    if mode != "off":
        # Fully fused pipeline (pallas_msm): bucket accumulation with
        # VMEM-resident tables, lane fold, suffix scans + Horner. Returns
        # the same group element as the XLA path (canonical affine), though
        # the projective representative differs (identity-adds are masked
        # in XLA but computed through the complete formulas here).
        # the streams are moveaxis/reshape temporaries -> DONATED (their
        # HBM is reused under the kernel; at 2^22 the point stream alone
        # is 0.5 GB). Donation is a no-op when traced inside an outer jit.
        pts_stream = jnp.moveaxis(pts, 2, 0)
        if signed and 16 % c == 0:
            # digits + signs derived IN-KERNEL from the scalar limbs plus a
            # packed carry bitmask (carry_mask_words words per scalar)
            sc_stream = jnp.moveaxis(scalars.reshape(L, steps, lanes), 1, 0)
            nwords = carry_mask_words(w)
            masks = jnp.moveaxis(
                signed_carries(scalars, c).reshape(nwords, steps, lanes), 1, 0
            )  # (steps, nwords, lanes)
            return PM.msm_single_fused_sc_signed_donated(
                pts_stream, sc_stream, masks, c,
                interpret=(mode == "interpret"),
            )
        if not signed and 16 % c == 0:
            # digits extracted in-kernel from the scalar limbs
            sc_stream = jnp.moveaxis(scalars.reshape(L, steps, lanes), 1, 0)
            return PM.msm_single_fused_sc_donated(
                pts_stream, sc_stream, c, interpret=(mode == "interpret")
            )
        dig = window_digits_signed(scalars, c) if signed else window_digits(scalars, c)
        digits = dig.reshape(w, steps, lanes).astype(jnp.int32)
        return PM.msm_single_fused_donated(
            pts_stream, digits, c, signed=signed,
            interpret=(mode == "interpret"),
        )
    else:
        if signed:
            sdig = window_digits_signed(scalars, c).reshape(w, steps, lanes)
            digits = jnp.abs(sdig)
            signs = sdig < 0  # (W, steps, lanes)
        else:
            digits = window_digits(scalars, c)  # (W, padded)
            digits = digits.reshape(w, steps, lanes).astype(jnp.int32)
            signs = None
        nb_live = (1 << (c - 1)) + 1 if signed else nbuckets
        buckets0 = C.infinity((w, nb_live), lanes)  # (W, nb, 3, L, lanes)
        # negated y per point, (steps, L, lanes) so limbs sit at axis -2
        neg_y = (
            F.neg(jnp.moveaxis(pts[1], 0, 1), "fq") if signed else None
        )

        def step(s, buckets):
            d = digits[:, s, :]  # (W, lanes)
            cur = _gather_buckets(buckets, d)  # (W, 3, L, lanes)
            p = jnp.broadcast_to(pts[:, :, s, :][None], (w, 2, L, lanes))
            if signed:
                y = jnp.where(
                    signs[:, s, None, :], neg_y[s][None], p[:, 1]
                )
                p = jnp.concatenate([p[:, 0:1], y[:, None]], axis=1)
            new = _mixed_add(cur, p)
            # bucket 0 collects zero digits + padding; it is excluded below
            return _scatter_buckets(buckets, d, new)

        buckets = jax.lax.fori_loop(0, steps, step, buckets0)

    # Merge lanes, drop bucket 0, then weighted sum sum_b b*B_b as the sum
    # of suffix sums = element 1 of a double suffix scan.
    merged = fold_reduce_lanes(buckets)  # (W, nb, 3, L, 1)
    body = merged[:, 1:]
    s1 = suffix_scan_points(body, axis=1)
    window_sums = suffix_scan_points(s1, axis=1)[:, 0]  # (W, 3, L, 1)

    # Horner over windows, top window first: acc = 2^c * acc + S_w.
    def horner(i, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, a: C.double(a), acc)
        return C.add(acc, window_sums[w - 1 - i])

    return jax.lax.fori_loop(0, w, horner, C.infinity((), 1))


def _msm_lanewise(
    pts_stream, digits, nbuckets: int, c: int, signed: bool = False
) -> jnp.ndarray:
    """Core batched Pippenger with the MSM-batch in the LANE axis.

    pts_stream: (N, 2, L, B) — point s for every lane b (broadcast for a
    fixed base); digits: (W, N, B), balanced signed digits (bucket |d|,
    y negated for d < 0) when ``signed``. Each lane owns a private bucket
    array, so there is no lane merge — a lane IS an independent MSM.
    Returns (3, L, B)."""
    w, n, b = digits.shape
    mode = _pallas_mode()
    if mode != "off":
        # both streams are locally-created temporaries (moveaxis/broadcast
        # in the callers), so their buffers are DONATED to the kernel —
        # at verkle node-commit scale the point stream + digit tensor are
        # hundreds of MB of transient HBM (SURVEY §5 aliasing row).
        buckets = PM.bucket_accumulate_donated(
            pts_stream, digits.astype(jnp.int32), c,
            interpret=(mode == "interpret"), signed=signed,
        )
        if c <= (7 if signed else 6):
            # batched tail (per-lane weighted sums + Horner) in pallas too:
            # the XLA suffix scans over (W, rows, 3, L, B) arrays dominate
            # verkle commit passes otherwise. Larger c would blow the tail
            # kernel's VMEM budget (rows x 3 x L x 128 working copies) —
            # those configs fall through to the XLA tail below.
            return PM.batched_bucket_tail_donated(
                buckets, c, interpret=(mode == "interpret"),
                nbuckets=PM.signed_table_size(c) if signed else None,
                shifted=signed,
            )
        # signed pallas tables store bucket d at row d-1 (no trash row):
        # every row is live with weight row+1, so no drop-slice
        body = buckets if signed else buckets[:, 1:nbuckets]
    else:
        live = (1 << (c - 1)) + 1 if signed else nbuckets
        buckets0 = C.infinity((w, live), b)  # (W, live, 3, L, B)
        if signed:
            signs = digits < 0  # (W, N, B)
            digits = jnp.abs(digits)
            neg_y = F.neg(pts_stream[:, 1], "fq")  # (N, L, B)

        def step(s, buckets):
            d = digits[:, s, :].astype(jnp.int32)  # (W, B)
            cur = _gather_buckets(buckets, d)  # (W, 3, L, B)
            p = jnp.broadcast_to(pts_stream[s][None], (w, 2, L, b))
            if signed:
                y = jnp.where(signs[:, s, None, :], neg_y[s][None], p[:, 1])
                p = jnp.concatenate([p[:, 0:1], y[:, None]], axis=1)
            new = _mixed_add(cur, p)
            return _scatter_buckets(buckets, d, new)

        buckets = jax.lax.fori_loop(0, n, step, buckets0)
        body = buckets[:, 1:live]  # drop the zero-digit trash row

    s1 = suffix_scan_points(body, axis=1)
    window_sums = suffix_scan_points(s1, axis=1)[:, 0]  # (W, 3, L, B)

    def horner(i, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, a: C.double(a), acc)
        return C.add(acc, window_sums[w - 1 - i])

    return jax.lax.fori_loop(0, w, horner, C.infinity((), b))


def _batched_naive(points_proj: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, L, N) x (B, L, N) -> (3, L, B): per-point scalar-mul + fold.
    Right below ~64 points/MSM, where bucket machinery is pure overhead."""
    prods = C.scalar_mul(points_proj, scalars)  # (B, 3, L, N)
    summed = fold_reduce_lanes(prods)  # (B, 3, L, 1)
    return jnp.moveaxis(summed[..., 0], 0, -1)  # (3, L, B)


def _batched_naive_affine(
    points_affine: jnp.ndarray, scalars: jnp.ndarray
) -> jnp.ndarray:
    """(B, 2, L, N) affine x (B, L, N) -> (3, L, B): mode-aware small-N
    batched MSM. On TPU the B*N independent double-and-add chains run as
    ONE fused Mosaic kernel (pallas_curve.scalar_mul_affine) instead of the
    XLA scan's ~512 dispatched point ops; same group elements per lane."""
    mode = _pallas_mode()
    if mode == "off":
        return _batched_naive(C.from_affine(points_affine), scalars)
    b, _, _, n = points_affine.shape
    flat_p = jnp.moveaxis(points_affine, 0, 2).reshape(2, L, b * n)
    flat_s = jnp.moveaxis(scalars, 0, 1).reshape(L, b * n)
    prods = PC.scalar_mul_affine(flat_p, flat_s, interpret=(mode == "interpret"))
    prods = jnp.moveaxis(prods.reshape(3, L, b, n), 2, 0)  # (B, 3, L, N)
    summed = fold_reduce_lanes(prods)  # (B, 3, L, 1)
    return jnp.moveaxis(summed[..., 0], 0, -1)  # (3, L, B)


def _auto_c(n: int, c: int | None) -> int:
    """Window width for SINGLE MSMs. c=8 measured fastest on both paths:

      * XLA path: buckets are gathered/scattered by index (O(1) in table
        size), so cost ~ W mixed-adds per point — maximize c (=8).
      * Pallas path: the per-step whole-table masked scan costs
        alpha*rows + beta per window, but beta (the fused mixed-add's
        serial CIOS chains) dominates even 128-row tables, so minimizing
        W wins: measured at 2^20 on v5e, signed c=8 = 794k points/s vs
        564k at signed c=4 (round-3's c=4 default was a mis-tune;
        benchmarks/tune_msm.py is the sweep harness).

    VKZG_WINDOW_C overrides (validated in knobs.py; part of the AOT store
    key via knobs.snapshot)."""
    if c is None:
        c = _WINDOW_C
    if c is not None:
        if not 1 <= c <= 16:
            raise ValueError(f"MSM window width c must be in [1, 16], got {c}")
        return c
    if _pallas_mode() != "off":
        return 8  # 16 % c == 0 keeps in-kernel digit extraction
    return min(8, max(4, n.bit_length() - 1))


def _auto_c_batched(n: int, c: int | None, signed: bool = False) -> int:
    """Window width for the lane-batched path: the bucket suffix scans cost
    W * live point-adds PER MSM (they don't amortize over a big N like the
    single-MSM path), so the optimum is near sqrt: c ~ log2(N)/2 + 1.
    Signed digits halve the live table at the same c (a straight win for
    the per-step table scan), so the formula is kept unchanged."""
    return c if c is not None else min(6, max(2, (n.bit_length() - 1) // 2 + 1))


def _msm_batched_impl(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int | None = None,
) -> jnp.ndarray:
    """msm_batched without metrics (shard_map/jit-trace safe)."""
    bsz, _, _, n = points_affine.shape
    if n < 64:
        return _batched_naive_affine(points_affine, scalars)
    signed = _signed_default()
    c = _auto_c_batched(n, c, signed)
    dig = window_digits_signed(scalars, c) if signed else window_digits(scalars, c)
    digits = jnp.moveaxis(dig, -1, 1).astype(jnp.int32)  # (W, N, B)
    pts_stream = jnp.moveaxis(points_affine, (0, 3), (3, 0))  # (N, 2, L, B)
    return _msm_lanewise(pts_stream, digits, 1 << c, c, signed=signed)


def msm_batched(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int | None = None,
) -> jnp.ndarray:
    """Batch of B independent MSMs: (B, 2, L, N) x (B, L, N) -> (3, L, B).

    The verkle-tree hot path (SURVEY.md §3.5): thousands of width-256 node
    commitments fused into one device call, with the node batch riding the
    VPU lane axis. Small N falls back to batched double-and-add."""
    bsz, _, _, n = points_affine.shape
    metrics.record("msm.batched.calls")
    metrics.record("msm.batched.points", bsz * n)
    return _msm_batched_impl(points_affine, scalars, c=c)


def _msm_fixed_base_impl(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int | None = None,
) -> jnp.ndarray:
    """msm_fixed_base without metrics (shard_map/jit-trace safe)."""
    b = scalars.shape[0]
    n = points_affine.shape[-1]
    if n < 64:
        if _pallas_mode() != "off":
            pts = jnp.broadcast_to(points_affine[None], (b, 2, L, n))
            return _batched_naive_affine(pts, scalars)
        pts = jnp.broadcast_to(
            C.from_affine(points_affine)[None], (b, 3, L, n)
        )
        return _batched_naive(pts, scalars)
    signed = _signed_default()
    c = _auto_c_batched(n, c, signed)
    pts_stream = jnp.broadcast_to(
        jnp.moveaxis(points_affine, -1, 0)[..., None], (n, 2, L, b)
    )
    dig = window_digits_signed(scalars, c) if signed else window_digits(scalars, c)
    digits = jnp.moveaxis(dig, -1, 1).astype(jnp.int32)  # (W, N, B)
    return _msm_lanewise(pts_stream, digits, 1 << c, c, signed=signed)


def msm_fixed_base(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int | None = None,
) -> jnp.ndarray:
    """Fixed-CRS MSM for a STACK of scalar vectors: (2, L, N) x (B, L, N)
    -> (3, L, B). The shared base is broadcast across lanes (no point
    stream transpose). Seam for a precomputed-table fixed-base kernel."""
    b = scalars.shape[0]
    n = points_affine.shape[-1]
    metrics.record("msm.fixed_base.calls")
    metrics.record("msm.fixed_base.points", b * n)
    return _msm_fixed_base_impl(points_affine, scalars, c=c)
