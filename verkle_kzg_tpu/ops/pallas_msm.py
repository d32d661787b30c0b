"""Fully-fused Pippenger bucket accumulation as ONE Pallas kernel.

Round-1's MSM ran the bucket loop as ~8k XLA dispatches (gather + scan-round
kernels + scatter per 128-point step); profiling showed ~70% of the time in
XLA's per-lane gather/scatter lowering and most of the rest in per-launch
overhead. The TPU-native fix is structural, not incremental:

  * The bucket table (2^c buckets x 3 coords x L limbs x B lanes) for one
    window IS the kernel's output block. Pallas keeps an output block
    resident in VMEM while its block index is unchanged, so across all
    point-chunks of a window the table never touches HBM.
  * The per-lane bucket gather/scatter (each lane owns a private bucket
    column, indexed by that lane's window digit) is one vectorized masked
    sum / one whole-table select in VMEM — no XLA gather/scatter ops.
  * Field arithmetic runs in the lazy [0, 2m) domain between steps
    (pallas_curve.k_point_mixed_add_lazy), canonicalized once per window.
  * Points and digits stream through as pipelined input blocks (double-
    buffered DMA under the compute).
  * The complete mixed addition runs fused (pallas_field/pallas_curve
    building blocks), so the whole MSM is ONE kernel launch; HBM traffic
    collapses to the point stream (re-read once per window).

Replaces the hot primitive of the reference (the serial fold MSM at
``vector-commit/src/utils.rs:16-19``) — same (W, 2^c, 3, L, B) bucket
output contract as the XLA loop in ops/msm.py, bit-for-bit.

Grid = (W windows, S/CH point chunks); scratch-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import NLIMBS
from .pallas_curve import (
    k_point_add_lazy,
    k_point_double_lazy,
    k_point_mixed_add_lazy,
    k_point_reduce,
)
from .pallas_field import _rows_const, _kconst_ints, k_sub

L = NLIMBS

# Steps (of B lanes each) per grid cell: amortizes loop overhead while
# keeping the streamed point block (CH, 2, L, B) comfortably in VMEM.
DEFAULT_CHUNK = 64


def _one_mont_rows(spec: str):
    """R mod m as an (L, 1) kernel constant (Montgomery one)."""
    from ..params import FQ, FR

    fs = {"fq": FQ, "fr": FR}[spec]
    return _rows_const(fs.r_mod_limbs)



def _gather_scatter_step(tbl_ref, lead_idx, d, p, nbuckets: int, bsz: int):
    """One accumulation step against the bucket table held in ``tbl_ref``
    (indexed at ``lead_idx`` if not None): per-lane gather as a blocked
    masked sum, fused lazy mixed-add, blocked select-scatter. Bucket blocks
    of <=64 keep the working temporaries ~1.5 MB each so the whole kernel
    stays inside the 16 MB VMEM budget."""
    bblk = min(64, nbuckets)
    nblk = nbuckets // bblk

    def rd(b0):
        if lead_idx is None:
            return tbl_ref[pl.ds(b0, bblk)]
        return tbl_ref[lead_idx, pl.ds(b0, bblk)]

    def wr(b0, val):
        if lead_idx is None:
            tbl_ref[pl.ds(b0, bblk)] = val
        else:
            tbl_ref[lead_idx, pl.ds(b0, bblk)] = val

    base = jax.lax.broadcasted_iota(jnp.int32, (bblk, 1, 1, bsz), 0)

    def gather_blk(k, acc):
        b0 = k * bblk
        oh = d[None, None, None, :] == (base + b0)
        t = jax.lax.bitcast_convert_type(rd(b0), jnp.int32)
        return acc + jnp.sum(jnp.where(oh, t, 0), axis=0)

    cur_i = jax.lax.fori_loop(
        0, nblk, gather_blk, jnp.zeros((3, L, bsz), jnp.int32)
    )
    cur = jax.lax.bitcast_convert_type(cur_i, jnp.uint32)
    new = k_point_mixed_add_lazy(cur, p)

    def scatter_blk(k, _):
        b0 = k * bblk
        oh = d[None, None, None, :] == (base + b0)
        wr(b0, jnp.where(oh, new[None], rd(b0)))
        return 0

    jax.lax.fori_loop(0, nblk, scatter_blk, 0)

def _negate_y_sel(p, sign):
    """(2, L, B) canonical affine batch with y negated where ``sign``
    ((B,) bool). (0, 0) infinity stays fixed (k_sub(0, 0) = 0)."""
    neg = k_sub(jnp.zeros_like(p[1]), p[1], "fq")
    y = jnp.where(sign[None, :], neg, p[1])
    return jnp.concatenate([p[0:1], y[None]], axis=0)


def _accum_kernel(
    digits_ref, pts_ref, out_ref, *, nbuckets: int, chunk: int, signed: bool
):
    """digits_ref: (1, CH, BB) int32 (signed mode: balanced digits, bucket
    |d| with y negated for d < 0); pts_ref: (CH, 2, L, BB) uint32;
    out_ref: (1, nbuckets, 3, L, BB) uint32 (VMEM-resident across the
    point-chunk grid dim, which iterates innermost)."""
    s_chunk = pl.program_id(2)
    bsz = out_ref.shape[-1]

    @pl.when(s_chunk == 0)
    def _init():
        zero = jnp.zeros((L, bsz), jnp.uint32)
        one = jnp.broadcast_to(_one_mont_rows("fq"), (L, bsz))
        inf = jnp.stack([zero, one, zero], axis=0)  # (3, L, B) = (0 : 1 : 0)
        out_ref[0] = jnp.broadcast_to(inf[None], (nbuckets, 3, L, bsz))

    def step(i, _):
        d = digits_ref[0, i]  # (B,) int32: per-lane bucket index
        p = pts_ref[i]  # (2, L, B) affine point batch
        if signed:
            p = _negate_y_sel(p, d < 0)
            # bucket |d| lives at row |d| - 1; digit 0 maps to -1, which
            # matches no row (the lane's add is computed but discarded)
            d = jnp.abs(d) - 1
        _gather_scatter_step(out_ref, 0, d, p, nbuckets, bsz)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    # Table values accumulate in the lazy [0, 2m) domain; canonicalize once
    # when this window's last chunk retires so the output contract (fully
    # reduced coordinates, bit-identical to the XLA loop) is preserved.
    # Done in bucket blocks: a whole-table reduce would materialize several
    # table-sized temporaries and blow the VMEM budget.
    @pl.when(s_chunk == pl.num_programs(2) - 1)
    def _normalize():
        blk = min(16, nbuckets)
        for b in range(0, nbuckets, blk):
            out_ref[0, b : b + blk] = k_point_reduce(out_ref[0, b : b + blk])


def _accum_kernel_pair(
    digits_ref, pts_ref, out_ref, *, nbuckets: int, chunk: int, signed: bool
):
    """Window-PAIRED variant of _accum_kernel: grid cell wp owns windows
    2wp and 2wp+1 (digits_ref: (2, CH, BB); out_ref: (1, 2, nbuckets, 3,
    L, BB)). The two windows' accumulation chains are independent and
    emitted interleaved (see _gather_scatter_step_pair) — the unpaired
    kernel is latency-bound on a single mixed-add's serial CIOS chains."""
    s_chunk = pl.program_id(2)
    bsz = out_ref.shape[-1]

    @pl.when(s_chunk == 0)
    def _init():
        zero = jnp.zeros((L, bsz), jnp.uint32)
        one = jnp.broadcast_to(_one_mont_rows("fq"), (L, bsz))
        inf = jnp.stack([zero, one, zero], axis=0)
        out_ref[0] = jnp.broadcast_to(inf[None, None], (2, nbuckets, 3, L, bsz))

    def step(i, _):
        d0 = digits_ref[0, i]
        d1 = digits_ref[1, i]
        p = pts_ref[i]
        if signed:
            p0 = _negate_y_sel(p, d0 < 0)
            p1 = _negate_y_sel(p, d1 < 0)
            d0 = jnp.abs(d0) - 1  # row |d| - 1, digit 0 masked off
            d1 = jnp.abs(d1) - 1
        else:
            p0 = p1 = p
        _gather_scatter_step_pair(out_ref, d0, d1, p0, p1, nbuckets, bsz)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    @pl.when(s_chunk == pl.num_programs(2) - 1)
    def _normalize():
        blk = min(16, nbuckets)
        for j in range(2):
            for b in range(0, nbuckets, blk):
                out_ref[0, j, b : b + blk] = k_point_reduce(
                    out_ref[0, j, b : b + blk]
                )


def _accum_kernel_sc(sc_ref, pts_ref, out_ref, *, c: int, nbuckets: int, chunk: int):
    """Like _accum_kernel but digits are extracted IN-KERNEL from the
    streamed standard-form scalar limbs (sc_ref: (CH, L, BB) uint32):
    window w's digit is c bits at offset w*c of the 256-bit scalar. Only
    for c dividing 16 (the digit then lives inside one 16-bit limb), which
    covers the tuned configs; skips the (W, S, B) digit tensor entirely
    (134 MB of HBM traffic + an XLA pass at 2^20)."""
    w_id = pl.program_id(0)
    s_chunk = pl.program_id(2)
    bsz = out_ref.shape[-1]
    limb = (w_id * c) // 16
    shift = (w_id * c) % 16
    dmask = jnp.uint32((1 << c) - 1)

    @pl.when(s_chunk == 0)
    def _init():
        zero = jnp.zeros((L, bsz), jnp.uint32)
        one = jnp.broadcast_to(_one_mont_rows("fq"), (L, bsz))
        inf = jnp.stack([zero, one, zero], axis=0)
        out_ref[0] = jnp.broadcast_to(inf[None], (nbuckets, 3, L, bsz))

    def step(i, _):
        row = sc_ref[i, limb]  # (BB,) scalar limb holding this window
        d = ((row >> shift) & dmask).astype(jnp.int32)
        p = pts_ref[i]
        _gather_scatter_step(out_ref, 0, d, p, nbuckets, bsz)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    @pl.when(s_chunk == pl.num_programs(2) - 1)
    def _normalize():
        blk = min(16, nbuckets)
        for b in range(0, nbuckets, blk):
            out_ref[0, b : b + blk] = k_point_reduce(out_ref[0, b : b + blk])


def _accum_kernel_sc_signed(
    sc_ref, masks_ref, pts_ref, out_ref, *, c: int, nbuckets: int, chunk: int
):
    """Signed-digit variant of _accum_kernel_sc: the balanced digit is
    derived in-kernel from the raw window digit plus a streamed packed
    carry bitmask (masks_ref: (CH, NWORDS, BB) uint32, bit w of word w//32
    = carry INTO window w, see ops/msm.py::signed_carries; word count
    covers bit W so the top window's carry-out read stays in bounds and
    reads 0). Bucket |d| is stored at row |d| - 1 (``nbuckets`` = 2^(c-1)
    exact rows, digit 0 masked off); the point's y is negated where
    d < 0."""
    w_id = pl.program_id(0)
    s_chunk = pl.program_id(2)
    bsz = out_ref.shape[-1]
    limb = (w_id * c) // 16
    shift = (w_id * c) % 16
    dmask = jnp.uint32((1 << c) - 1)

    @pl.when(s_chunk == 0)
    def _init():
        zero = jnp.zeros((L, bsz), jnp.uint32)
        one = jnp.broadcast_to(_one_mont_rows("fq"), (L, bsz))
        inf = jnp.stack([zero, one, zero], axis=0)
        out_ref[0] = jnp.broadcast_to(inf[None], (nbuckets, 3, L, bsz))

    # shifts must stay UNSIGNED: mixing a uint32 mask with the int32
    # program id promotes to int32 and turns >> into an ARITHMETIC shift,
    # smearing bit 31 (a word's top carry) across all carry bits
    b_in = (w_id % 32).astype(jnp.uint32)  # carry-IN bit within its word
    wd_in = w_id // 32
    b_out = ((w_id + 1) % 32).astype(jnp.uint32)
    wd_out = (w_id + 1) // 32

    def step(i, _):
        row = sc_ref[i, limb]
        raw = ((row >> shift) & dmask).astype(jnp.int32)
        ci = ((masks_ref[i, wd_in] >> b_in) & 1).astype(jnp.int32)
        co = ((masks_ref[i, wd_out] >> b_out) & 1).astype(jnp.int32)
        d = raw + ci - (co << c)  # top window's carry-out bit is never set
        p = _negate_y_sel(pts_ref[i], d < 0)
        # row |d| - 1 (digit 0 -> -1 matches no row; see signed_table_size)
        _gather_scatter_step(out_ref, 0, jnp.abs(d) - 1, p, nbuckets, bsz)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    @pl.when(s_chunk == pl.num_programs(2) - 1)
    def _normalize():
        blk = min(16, nbuckets)
        for b in range(0, nbuckets, blk):
            out_ref[0, b : b + blk] = k_point_reduce(out_ref[0, b : b + blk])


def _bucket_accumulate_from_scalars_impl(
    pts_stream: jnp.ndarray,
    sc_stream: jnp.ndarray,
    c: int,
    chunk: int = DEFAULT_CHUNK // 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """(S, 2, L, B) points x (S, L, B) STANDARD-form scalars ->
    (W, 2^c, 3, L, B) buckets, digits extracted in-kernel (c | 16).
    Default chunk is halved vs the digit-tensor variant: the extra
    double-buffered scalar block must fit the same VMEM budget."""
    assert 16 % c == 0, "in-kernel digits need c dividing the limb width"
    s, _, _, b = pts_stream.shape
    nbuckets = 1 << c
    w = 256 // c
    chunk = min(chunk, s)
    nchunks = -(-s // chunk)
    pad = nchunks * chunk - s
    if pad:
        pts_stream = jnp.concatenate(
            [pts_stream, jnp.zeros((pad, 2, L, b), jnp.uint32)], axis=0
        )
        sc_stream = jnp.concatenate(
            [sc_stream, jnp.zeros((pad, L, b), jnp.uint32)], axis=0
        )
    bb = min(128, b)
    nbb = -(-b // bb)
    bpad = nbb * bb - b
    if bpad:
        pts_stream = jnp.concatenate(
            [pts_stream, jnp.zeros(pts_stream.shape[:-1] + (bpad,), jnp.uint32)],
            axis=-1,
        )
        sc_stream = jnp.concatenate(
            [sc_stream, jnp.zeros(sc_stream.shape[:-1] + (bpad,), jnp.uint32)],
            axis=-1,
        )

    kern = functools.partial(_accum_kernel_sc, c=c, nbuckets=nbuckets, chunk=chunk)
    out = pl.pallas_call(
        kern,
        grid=(w, nbb, nchunks),
        in_specs=[
            pl.BlockSpec(
                (chunk, L, bb), lambda i, k, j: (j, 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 2, L, bb),
                lambda i, k, j: (j, 0, 0, k),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nbuckets, 3, L, bb),
            lambda i, k, j: (i, 0, 0, 0, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (w, nbuckets, 3, L, nbb * bb), jnp.uint32
        ),
        interpret=interpret,
    )(sc_stream, pts_stream)
    return out[..., :b]


_STATICS = ("c", "chunk", "interpret")

#: Donated twins (SURVEY §5 sanitizer/aliasing row): the big input streams'
#: HBM buffers are released to XLA for reuse during the kernel. ONLY for
#: callers passing locally-created arrays (reshaped/broadcast temporaries) —
#: donating a caller-held array invalidates it on TPU. CPU ignores donation,
#: so the CPU test suite exercises the code path without the aliasing.
bucket_accumulate_from_scalars = jax.jit(
    _bucket_accumulate_from_scalars_impl, static_argnames=_STATICS
)
bucket_accumulate_from_scalars_donated = jax.jit(
    _bucket_accumulate_from_scalars_impl,
    static_argnames=_STATICS,
    donate_argnums=(0, 1),
)


def signed_table_size(c: int) -> int:
    """Bucket-table rows for signed digits: the kernels store bucket |d| at
    row |d| - 1 (digit 0 contributes nothing and is masked off in the
    gather/scatter: its shifted index -1 matches no row), so the table is
    EXACTLY 2^(c-1) rows — no zero-digit trash row, no block padding. At
    c=8 that is 128 rows vs 256 unsigned (the per-step whole-table masked
    scan is the kernel's top cost, so rows are throughput). Row i holds the
    bucket of digit i+1; the tails consume this with ``shifted=True``."""
    return 1 << (c - 1)


def _gather_scatter_step_pair(tbl_ref, d0, d1, p0, p1, nbuckets: int, bsz: int):
    """Two windows' accumulation steps fused into one table pass. The
    paired chains are fully independent (separate table slices tbl_ref[0,j],
    separate digits/points), and emitting them interleaved in ONE loop body
    lets the Mosaic scheduler overlap their dependency chains — the unpaired
    kernel is latency-bound on the serial CIOS chains of a single mixed-add
    (only ~2 vregs wide), not VPU-throughput-bound."""
    bblk = min(64, nbuckets)
    nblk = nbuckets // bblk
    base = jax.lax.broadcasted_iota(jnp.int32, (bblk, 1, 1, bsz), 0)

    def gather_blk(k, accs):
        a0, a1 = accs
        b0 = k * bblk
        oh0 = d0[None, None, None, :] == (base + b0)
        oh1 = d1[None, None, None, :] == (base + b0)
        t0 = jax.lax.bitcast_convert_type(tbl_ref[0, 0, pl.ds(b0, bblk)], jnp.int32)
        t1 = jax.lax.bitcast_convert_type(tbl_ref[0, 1, pl.ds(b0, bblk)], jnp.int32)
        return (
            a0 + jnp.sum(jnp.where(oh0, t0, 0), axis=0),
            a1 + jnp.sum(jnp.where(oh1, t1, 0), axis=0),
        )

    zero = jnp.zeros((3, L, bsz), jnp.int32)
    cur0_i, cur1_i = jax.lax.fori_loop(0, nblk, gather_blk, (zero, zero))
    new0 = k_point_mixed_add_lazy(
        jax.lax.bitcast_convert_type(cur0_i, jnp.uint32), p0
    )
    new1 = k_point_mixed_add_lazy(
        jax.lax.bitcast_convert_type(cur1_i, jnp.uint32), p1
    )

    def scatter_blk(k, _):
        b0 = k * bblk
        oh0 = d0[None, None, None, :] == (base + b0)
        oh1 = d1[None, None, None, :] == (base + b0)
        tbl_ref[0, 0, pl.ds(b0, bblk)] = jnp.where(
            oh0, new0[None], tbl_ref[0, 0, pl.ds(b0, bblk)]
        )
        tbl_ref[0, 1, pl.ds(b0, bblk)] = jnp.where(
            oh1, new1[None], tbl_ref[0, 1, pl.ds(b0, bblk)]
        )
        return 0

    jax.lax.fori_loop(0, nblk, scatter_blk, 0)


def _accum_kernel_group(
    digits_ref,
    pts_ref,
    out_ref,
    *,
    nbuckets: int,
    chunk: int,
    signed: bool,
    group: int,
    fused: bool,
):
    """G-way window-interleaved accumulation with an optional FUSED table
    pass. Grid cell wg owns windows wg*G .. wg*G+G-1 (digits_ref:
    (G, CH, BB); out_ref: (1, G, nbuckets, 3, L, BB)).

    Generalizes _accum_kernel_pair two ways:

      * ``group``: G independent windows' chains are emitted interleaved in
        one loop body — the single-chain kernel is latency-bound on the
        serial CIOS dependency chains of one mixed-add (~2 vregs wide), so
        more chains fill the VPU pipeline (VMEM-capped: G tables resident).
      * ``fused``: step i's scatter and step i+1's gather merge into ONE
        table pass — per block, write the merged rows then accumulate the
        next step's masked sum FROM the merged value (correct when the two
        steps hit the same bucket). Saves one whole-table read per step
        per window; the running accumulator rides the fori_loop carry.
    """
    s_chunk = pl.program_id(2)
    bsz = out_ref.shape[-1]
    G = group

    @pl.when(s_chunk == 0)
    def _init():
        zero = jnp.zeros((L, bsz), jnp.uint32)
        one = jnp.broadcast_to(_one_mont_rows("fq"), (L, bsz))
        inf = jnp.stack([zero, one, zero], axis=0)
        out_ref[0] = jnp.broadcast_to(inf[None, None], (G, nbuckets, 3, L, bsz))

    def decode_d(i, j):
        """Bucket row for step i, chain j (signed: row |d| - 1, digit 0
        maps to -1 = no row)."""
        d = digits_ref[j, i]
        return jnp.abs(d) - 1 if signed else d

    def decode_p(i, j):
        p = pts_ref[i]
        if signed:
            return _negate_y_sel(p, digits_ref[j, i] < 0)
        return p

    bblk = min(64, nbuckets)
    nblk = nbuckets // bblk
    base = jax.lax.broadcasted_iota(jnp.int32, (bblk, 1, 1, bsz), 0)

    def gather_j(j, d):
        def blk(k, acc):
            b0 = k * bblk
            oh = d[None, None, None, :] == (base + b0)
            t = jax.lax.bitcast_convert_type(
                out_ref[0, j, pl.ds(b0, bblk)], jnp.int32
            )
            return acc + jnp.sum(jnp.where(oh, t, 0), axis=0)

        acc = jax.lax.fori_loop(0, nblk, blk, jnp.zeros((3, L, bsz), jnp.int32))
        return jax.lax.bitcast_convert_type(acc, jnp.uint32)

    if not fused:

        def step(i, _):
            # classic two-pass gather/mixed-add/scatter, G chains interleaved
            curs = tuple(gather_j(j, decode_d(i, j)) for j in range(G))
            news = tuple(
                k_point_mixed_add_lazy(curs[j], decode_p(i, j)) for j in range(G)
            )

            def scatter_j(j, d, new):
                def blk(k, _):
                    b0 = k * bblk
                    oh = d[None, None, None, :] == (base + b0)
                    out_ref[0, j, pl.ds(b0, bblk)] = jnp.where(
                        oh, new[None], out_ref[0, j, pl.ds(b0, bblk)]
                    )
                    return 0

                jax.lax.fori_loop(0, nblk, blk, 0)

            for j in range(G):
                scatter_j(j, decode_d(i, j), news[j])
            return 0

        jax.lax.fori_loop(0, chunk, step, 0)
    else:

        def scatter_gather_j(j, d_w, new, d_n):
            """ONE pass: write ``new`` at rows == d_w, return the merged
            table's rows == d_n (the next step's gather)."""

            def blk(k, acc):
                b0 = k * bblk
                oh_w = d_w[None, None, None, :] == (base + b0)
                merged = jnp.where(oh_w, new[None], out_ref[0, j, pl.ds(b0, bblk)])
                out_ref[0, j, pl.ds(b0, bblk)] = merged
                oh_n = d_n[None, None, None, :] == (base + b0)
                t = jax.lax.bitcast_convert_type(merged, jnp.int32)
                return acc + jnp.sum(jnp.where(oh_n, t, 0), axis=0)

            acc = jax.lax.fori_loop(
                0, nblk, blk, jnp.zeros((3, L, bsz), jnp.int32)
            )
            return jax.lax.bitcast_convert_type(acc, jnp.uint32)

        def step(i, curs):
            # the carried cur_j is table row d_j(i) as of step i-1's write
            i_next = jnp.minimum(i + 1, chunk - 1)  # last step: self (dropped)
            news = tuple(
                k_point_mixed_add_lazy(curs[j], decode_p(i, j)) for j in range(G)
            )
            return tuple(
                scatter_gather_j(j, decode_d(i, j), news[j], decode_d(i_next, j))
                for j in range(G)
            )

        curs0 = tuple(gather_j(j, decode_d(0, j)) for j in range(G))
        jax.lax.fori_loop(0, chunk, step, curs0)

    @pl.when(s_chunk == pl.num_programs(2) - 1)
    def _normalize():
        blk = min(16, nbuckets)
        for j in range(G):
            for b in range(0, nbuckets, blk):
                out_ref[0, j, b : b + blk] = k_point_reduce(
                    out_ref[0, j, b : b + blk]
                )


def _accum_kernel_sc_signed_pair(
    sc_ref, masks_ref, pts_ref, out_ref, *, c: int, nbuckets: int, chunk: int
):
    """Window-PAIRED variant of _accum_kernel_sc_signed: grid cell wp owns
    windows 2wp and 2wp+1 (out_ref: (1, 2, nbuckets, 3, L, BB)). Needs
    2c | 16 so the pair shares one scalar limb (shifts s and s+c). Same
    row layout as the unpaired kernel (row = |d| - 1, digit 0 masked)."""
    wp = pl.program_id(0)
    s_chunk = pl.program_id(2)
    bsz = out_ref.shape[-1]
    w0 = 2 * wp
    limb = (w0 * c) // 16
    shift0 = ((w0 * c) % 16).astype(jnp.uint32)
    shift1 = shift0 + c
    dmask = jnp.uint32((1 << c) - 1)

    @pl.when(s_chunk == 0)
    def _init():
        zero = jnp.zeros((L, bsz), jnp.uint32)
        one = jnp.broadcast_to(_one_mont_rows("fq"), (L, bsz))
        inf = jnp.stack([zero, one, zero], axis=0)
        out_ref[0] = jnp.broadcast_to(inf[None, None], (2, nbuckets, 3, L, bsz))

    # carry bits for windows w0, w0+1 (see _accum_kernel_sc_signed; shifts
    # kept unsigned so >> stays logical)
    def carry_bits(w_id):
        b_in = (w_id % 32).astype(jnp.uint32)
        wd_in = w_id // 32
        b_out = ((w_id + 1) % 32).astype(jnp.uint32)
        wd_out = (w_id + 1) // 32
        return b_in, wd_in, b_out, wd_out

    bi0, wi0, bo0, wo0 = carry_bits(w0)
    bi1, wi1, bo1, wo1 = carry_bits(w0 + 1)

    def step(i, _):
        row = sc_ref[i, limb]
        p = pts_ref[i]

        def digit(shift, bi, wi, bo, wo):
            raw = ((row >> shift) & dmask).astype(jnp.int32)
            ci = ((masks_ref[i, wi] >> bi) & 1).astype(jnp.int32)
            co = ((masks_ref[i, wo] >> bo) & 1).astype(jnp.int32)
            return raw + ci - (co << c)

        d0 = digit(shift0, bi0, wi0, bo0, wo0)
        d1 = digit(shift1, bi1, wi1, bo1, wo1)
        p0 = _negate_y_sel(p, d0 < 0)
        p1 = _negate_y_sel(p, d1 < 0)
        _gather_scatter_step_pair(
            out_ref, jnp.abs(d0) - 1, jnp.abs(d1) - 1, p0, p1, nbuckets, bsz
        )
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    @pl.when(s_chunk == pl.num_programs(2) - 1)
    def _normalize():
        blk = min(16, nbuckets)
        for j in range(2):
            for b in range(0, nbuckets, blk):
                out_ref[0, j, b : b + blk] = k_point_reduce(
                    out_ref[0, j, b : b + blk]
                )


def _bucket_accumulate_from_scalars_signed_impl(
    pts_stream: jnp.ndarray,
    sc_stream: jnp.ndarray,
    masks: jnp.ndarray,
    c: int,
    chunk: int = DEFAULT_CHUNK // 2,
    interpret: bool = False,
    wpair: bool = True,
) -> jnp.ndarray:
    """(S, 2, L, B) points x (S, L, B) STANDARD scalars x (S, NWORDS, B)
    packed carry bitmasks -> (W, signed_table_size(c), 3, L, B) buckets
    holding the SIGNED-digit accumulation: row i = bucket of digit i + 1
    (y negated for d < 0, digit 0 discarded — consume with
    ``shifted=True`` tails). ``wpair``: two windows per grid cell (ILP —
    see _gather_scatter_step_pair; needs 2c | 16 and even W)."""
    assert 16 % c == 0, "in-kernel digits need c dividing the limb width"
    s, _, _, b = pts_stream.shape
    nwords = masks.shape[1]
    nbuckets = signed_table_size(c)
    w = 256 // c
    chunk = min(chunk, s)
    nchunks = -(-s // chunk)
    pad = nchunks * chunk - s
    if pad:
        pts_stream = jnp.concatenate(
            [pts_stream, jnp.zeros((pad, 2, L, b), jnp.uint32)], axis=0
        )
        sc_stream = jnp.concatenate(
            [sc_stream, jnp.zeros((pad, L, b), jnp.uint32)], axis=0
        )
        masks = jnp.concatenate(
            [masks, jnp.zeros((pad, nwords, b), jnp.uint32)], axis=0
        )
    bb = min(128, b)
    nbb = -(-b // bb)
    bpad = nbb * bb - b
    if bpad:
        pts_stream = jnp.concatenate(
            [pts_stream, jnp.zeros(pts_stream.shape[:-1] + (bpad,), jnp.uint32)],
            axis=-1,
        )
        sc_stream = jnp.concatenate(
            [sc_stream, jnp.zeros(sc_stream.shape[:-1] + (bpad,), jnp.uint32)],
            axis=-1,
        )
        masks = jnp.concatenate(
            [masks, jnp.zeros(masks.shape[:-1] + (bpad,), jnp.uint32)], axis=-1
        )

    in_specs = [
        pl.BlockSpec(
            (chunk, L, bb), lambda i, k, j: (j, 0, k), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (chunk, nwords, bb),
            lambda i, k, j: (j, 0, k),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (chunk, 2, L, bb),
            lambda i, k, j: (j, 0, 0, k),
            memory_space=pltpu.VMEM,
        ),
    ]
    if wpair and 16 % (2 * c) == 0 and w % 2 == 0:
        kern = functools.partial(
            _accum_kernel_sc_signed_pair, c=c, nbuckets=nbuckets, chunk=chunk
        )
        out = pl.pallas_call(
            kern,
            grid=(w // 2, nbb, nchunks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 2, nbuckets, 3, L, bb),
                lambda i, k, j: (i, 0, 0, 0, 0, k),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (w // 2, 2, nbuckets, 3, L, nbb * bb), jnp.uint32
            ),
            interpret=interpret,
        )(sc_stream, masks, pts_stream)
        out = out.reshape(w, nbuckets, 3, L, nbb * bb)
        return out[..., :b]
    kern = functools.partial(
        _accum_kernel_sc_signed, c=c, nbuckets=nbuckets, chunk=chunk
    )
    out = pl.pallas_call(
        kern,
        grid=(w, nbb, nchunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, nbuckets, 3, L, bb),
            lambda i, k, j: (i, 0, 0, 0, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (w, nbuckets, 3, L, nbb * bb), jnp.uint32
        ),
        interpret=interpret,
    )(sc_stream, masks, pts_stream)
    return out[..., :b]


def _bucket_accumulate_impl(
    pts_stream: jnp.ndarray,
    digits: jnp.ndarray,
    c: int,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
    signed: bool = False,
    wpair: bool = True,
    wgroup: int | None = None,
    fused: bool = False,
) -> jnp.ndarray:
    """(S, 2, L, B) points x (W, S, B) int32 digits -> (W, 2^c, 3, L, B)
    buckets (bucket 0 collects zero digits; excluded by the caller).

    Each lane b is an independent accumulation stream (its own digit row and
    point column) — the same contract as ops/msm.py's XLA bucket loop, so
    the two paths are interchangeable bit-for-bit.

    Wide lane batches (the verkle node-commit fleets run B up to 2048) are
    split into lane blocks of <= 128 as a middle grid dimension, keeping
    every VMEM-resident table block at c-bits x 3 x L x 128 words; the
    point-chunk dim iterates innermost so each (window, lane-block) table
    stays resident across its whole point stream.
    """
    w, s, b = digits.shape
    nbuckets = signed_table_size(c) if signed else 1 << c
    chunk = min(chunk, s)
    nchunks = -(-s // chunk)
    pad = nchunks * chunk - s
    if pad:
        pts_stream = jnp.concatenate(
            [pts_stream, jnp.zeros((pad, 2, L, b), jnp.uint32)], axis=0
        )
        digits = jnp.concatenate(
            [digits, jnp.zeros((w, pad, b), jnp.int32)], axis=1
        )

    bb = min(128, b)
    nbb = -(-b // bb)
    bpad = nbb * bb - b
    if bpad:
        pts_stream = jnp.concatenate(
            [pts_stream, jnp.zeros(pts_stream.shape[:-1] + (bpad,), jnp.uint32)],
            axis=-1,
        )
        digits = jnp.concatenate(
            [digits, jnp.zeros(digits.shape[:-1] + (bpad,), jnp.int32)], axis=-1
        )

    if wgroup is not None:
        # explicit G-way interleave (optionally with the fused table pass):
        # pad W up to a multiple of G with inert all-zero windows (digit 0
        # is the trash bucket unsigned / masked off signed)
        G = wgroup
        wg = -(-w // G)
        if wg * G != w:
            digits = jnp.concatenate(
                [
                    digits,
                    jnp.zeros((wg * G - w,) + digits.shape[1:], digits.dtype),
                ],
                axis=0,
            )
        kern = functools.partial(
            _accum_kernel_group,
            nbuckets=nbuckets,
            chunk=chunk,
            signed=signed,
            group=G,
            fused=fused,
        )
        out = pl.pallas_call(
            kern,
            grid=(wg, nbb, nchunks),
            in_specs=[
                pl.BlockSpec(
                    (G, chunk, bb),
                    lambda i, k, j: (i, j, k),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (chunk, 2, L, bb),
                    lambda i, k, j: (j, 0, 0, k),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, G, nbuckets, 3, L, bb),
                lambda i, k, j: (i, 0, 0, 0, 0, k),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (wg, G, nbuckets, 3, L, nbb * bb), jnp.uint32
            ),
            interpret=interpret,
        )(digits.astype(jnp.int32), pts_stream)
        out = out.reshape(wg * G, nbuckets, 3, L, nbb * bb)[:w]
        return out[..., :b]

    # pairing doubles the VMEM-resident table: cap it so the pair of
    # tables + gather temporaries stays inside the ~16 MB budget (the
    # unsigned c=8 digit-tensor path would need 12.6 MB of tables alone)
    wpair = wpair and nbuckets * 3 * L * bb * 4 * 2 <= 8 * 2**20
    if wpair:
        # pair windows per grid cell (ILP; see _gather_scatter_step_pair).
        # Odd W (e.g. c=6 -> 43) pads one all-zero window: digit 0 is the
        # trash bucket unsigned and masked off signed, so it is inert; the
        # padded table row block is sliced off below.
        wp = -(-w // 2)
        if 2 * wp != w:
            digits = jnp.concatenate(
                [digits, jnp.zeros((1,) + digits.shape[1:], digits.dtype)],
                axis=0,
            )
        kern = functools.partial(
            _accum_kernel_pair, nbuckets=nbuckets, chunk=chunk, signed=signed
        )
        out = pl.pallas_call(
            kern,
            grid=(wp, nbb, nchunks),
            in_specs=[
                pl.BlockSpec(
                    (2, chunk, bb),
                    lambda i, k, j: (i, j, k),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (chunk, 2, L, bb),
                    lambda i, k, j: (j, 0, 0, k),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 2, nbuckets, 3, L, bb),
                lambda i, k, j: (i, 0, 0, 0, 0, k),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (wp, 2, nbuckets, 3, L, nbb * bb), jnp.uint32
            ),
            interpret=interpret,
        )(digits.astype(jnp.int32), pts_stream)
        out = out.reshape(2 * wp, nbuckets, 3, L, nbb * bb)[:w]
        return out[..., :b]
    kern = functools.partial(
        _accum_kernel, nbuckets=nbuckets, chunk=chunk, signed=signed
    )
    out = pl.pallas_call(
        kern,
        grid=(w, nbb, nchunks),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, bb), lambda i, k, j: (i, j, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 2, L, bb),
                lambda i, k, j: (j, 0, 0, k),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nbuckets, 3, L, bb),
            lambda i, k, j: (i, 0, 0, 0, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (w, nbuckets, 3, L, nbb * bb), jnp.uint32
        ),
        interpret=interpret,
    )(digits.astype(jnp.int32), pts_stream)
    return out[..., :b]


bucket_accumulate = jax.jit(
    _bucket_accumulate_impl,
    static_argnames=_STATICS + ("signed", "wpair", "wgroup", "fused"),
)
bucket_accumulate_donated = jax.jit(
    _bucket_accumulate_impl,
    static_argnames=_STATICS + ("signed", "wpair", "wgroup", "fused"),
    donate_argnums=(0, 1),
)
bucket_accumulate_from_scalars_signed = jax.jit(
    _bucket_accumulate_from_scalars_signed_impl,
    static_argnames=_STATICS + ("wpair",),
)
bucket_accumulate_from_scalars_signed_donated = jax.jit(
    _bucket_accumulate_from_scalars_signed_impl,
    static_argnames=_STATICS + ("wpair",),
    donate_argnums=(0, 1, 2),
)


# ---------------------------------------------------------------------------
# Single-MSM fast path: accumulate + lane-fold in one kernel, then the
# bucket suffix scans + Horner in a second (the XLA post-processing was
# ~60% of total MSM time at 2^18 after the accumulation fusion).
# ---------------------------------------------------------------------------


def _window_sum(x, nbuckets: int, lanes_total: int, shifted: bool):
    """Weighted bucket sum of a (3, L, lanes_total) bucket row (bucket
    index in the LANE axis, padded to >= 128 lanes) as the head of a double
    inclusive suffix scan — log-depth dynamic lane rotates.

    ``shifted=False``: row b holds bucket b (row 0 = zero-digit trash),
    computes sum_b b*B_b over rows 1..nbuckets-1.
    ``shifted=True``: row i holds bucket i+1 over ``nbuckets`` live rows
    (the signed-table layout), computes sum_i (i+1)*B_i."""
    zero = jnp.zeros((L, lanes_total), jnp.uint32)
    one = jnp.broadcast_to(_one_mont_rows("fq"), (L, lanes_total))
    inf = jnp.stack([zero, one, zero], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes_total), 2)
    live = nbuckets if shifted else nbuckets - 1  # live rows entering scan

    def shift_left(v, sh):
        # valid AFTER the shift: row i holds old row i+sh, live iff
        # i + sh < live (rows entering the scan are exactly 0..live-1)
        rolled = pltpu.roll(v, jnp.int32(lanes_total) - sh, axis=2)
        return jnp.where(lane < live - sh, rolled, inf)

    if shifted:
        x = jnp.where(lane < live, x, inf)  # lane padding -> identity
    else:
        # drop trash row 0: pre-shift live count is live + 1 (buckets
        # 0..nbuckets-1), so row live-1 (the TOP bucket) must survive —
        # mask lane < live, NOT the scan-step mask lane < live - sh
        rolled = pltpu.roll(x, jnp.int32(lanes_total) - 1, axis=2)
        x = jnp.where(lane < live, rolled, inf)
    log_steps = max(live - 1, 1).bit_length()

    def scan_step(k, v):
        return k_point_add_lazy(v, shift_left(v, jnp.int32(1) << k))

    x = jax.lax.fori_loop(0, log_steps, scan_step, x)
    x = jax.lax.fori_loop(0, log_steps, scan_step, x)
    return x[..., 0:1]  # (3, L, 1)


def _suffix_horner_kernel(
    ws_ref, out_ref, *, c: int, nbuckets: int, w_total: int,
    lanes_total: int, shifted: bool
):
    """ws_ref: (1, 3, L, lanes_total) — window W-1-i's folded buckets with
    the BUCKET index in the LANE axis (padded up to >= 128 lanes: Mosaic's
    dynamic rotate needs full lane tiles). Computes the weighted bucket sum
    as the head of a double inclusive suffix scan (log-depth lane shifts;
    ``shifted`` selects the signed row-(d-1) layout), then folds the
    running Horner accumulator held in out_ref across the sequential grid:
    acc <- 2^c * acc + S_w, top window first."""
    i = pl.program_id(0)
    s_w = _window_sum(ws_ref[0], nbuckets, lanes_total, shifted)

    @pl.when(i == 0)
    def _first():
        out_ref[...] = s_w

    @pl.when(i > 0)
    def _next():
        acc = out_ref[...]
        acc = jax.lax.fori_loop(0, c, lambda _, a: k_point_double_lazy(a), acc)
        out_ref[...] = k_point_add_lazy(acc, s_w)

    @pl.when(i == w_total - 1)
    def _canonical():
        out_ref[...] = k_point_reduce(out_ref[...])


def _single_tail(
    buckets, c: int, w: int, interpret: bool, nbuckets=None,
    shifted: bool = False,
):
    """Lane fold + suffix-scan/Horner tail of the single-MSM pipeline.
    ``nbuckets``: LIVE bucket rows (default 2^c with a trash row 0; signed
    tables pass 2^(c-1) with ``shifted=True`` — row i = bucket i+1)."""
    from . import pallas_curve as PC

    if nbuckets is None:
        nbuckets = 1 << c
    buckets = buckets[:, :nbuckets]
    # (W, nb, 3, L, B) -> (W, B, 3, L, nb): bucket index into lanes
    t = jnp.transpose(buckets, (0, 4, 2, 3, 1))
    while t.shape[1] > 1:
        half = t.shape[1] // 2
        t = PC.add(t[:, :half], t[:, half:], interpret=interpret)
    ws = t[:, 0]  # (W, 3, L, nb)

    # pad the bucket-lane axis to full 128-lane tiles (Mosaic's dynamic
    # rotate requires them; also covers small windows, e.g. c=6 from
    # halved IPA rounds and small signed tables)
    lanes_total = max(-(-nbuckets // 128) * 128, 128)
    if lanes_total != nbuckets:
        ws = jnp.concatenate(
            [ws, jnp.zeros(ws.shape[:-1] + (lanes_total - nbuckets,), jnp.uint32)],
            axis=-1,
        )

    hkern = functools.partial(
        _suffix_horner_kernel,
        c=c,
        nbuckets=nbuckets,
        w_total=w,
        lanes_total=lanes_total,
        shifted=shifted,
    )
    return pl.pallas_call(
        hkern,
        grid=(w,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, L, lanes_total),
                lambda i, w_=w: (w_ - 1 - i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (3, L, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, L, 1), jnp.uint32),
        interpret=interpret,
    )(ws)


# ---------------------------------------------------------------------------
# Batched tail: per-lane weighted bucket sums + Horner. Each lane of the
# (W, 2^c, 3, L, B) bucket array is an INDEPENDENT MSM (the verkle node-commit
# / fixed-base contract of ops/msm.py::_msm_lanewise), so unlike _single_tail
# there is no lane fold: the suffix scans run over the LEADING bucket axis
# (static shifts, leading-axis concat — Mosaic-safe), lanes stay untouched.
# ---------------------------------------------------------------------------


def _batched_tail_kernel(
    bk_ref, out_ref, *, c: int, nbuckets: int, w_total: int, shifted: bool
):
    """bk_ref: (1, nbuckets, 3, L, BB) — window W-1-i's buckets for one lane
    block (canonical domain; row 0 = zero-digit collector unless
    ``shifted``, where row i = bucket i+1 — the signed-table layout).
    out_ref: (3, L, BB), VMEM-resident across the window grid dim
    (innermost), holds the running Horner accumulator per lane."""
    i = pl.program_id(1)
    bb = out_ref.shape[-1]

    zero = jnp.zeros((L, bb), jnp.uint32)
    one = jnp.broadcast_to(_one_mont_rows("fq"), (L, bb))
    inf = jnp.stack([zero, one, zero], axis=0)  # (3, L, BB) identity

    def shift_up(v, sh):
        # v_j <- v_{j+sh}, identity shifted in at the top (leading axis)
        fill = jnp.broadcast_to(inf[None], (sh, 3, L, bb))
        return jnp.concatenate([v[sh:], fill], axis=0)

    # weighted bucket sum = head of a double inclusive suffix scan (sum of
    # suffix sums); log-depth, static shifts
    x = bk_ref[0] if shifted else shift_up(bk_ref[0], 1)
    live = nbuckets if shifted else nbuckets - 1
    log_steps = max(live - 1, 1).bit_length()
    for _ in range(2):
        v = x
        for k in range(log_steps):
            v = k_point_add_lazy(v, shift_up(v, 1 << k))
        x = v
    s_w = x[0]  # (3, L, BB) weighted window sum (lazy domain)

    @pl.when(i == 0)
    def _first():
        out_ref[...] = s_w

    @pl.when(i > 0)
    def _next():
        acc = out_ref[...]
        acc = jax.lax.fori_loop(0, c, lambda _, a: k_point_double_lazy(a), acc)
        out_ref[...] = k_point_add_lazy(acc, s_w)

    @pl.when(i == w_total - 1)
    def _canonical():
        out_ref[...] = k_point_reduce(out_ref[...])


def _batched_bucket_tail_impl(
    buckets: jnp.ndarray, c: int, interpret: bool = False,
    nbuckets: int | None = None, shifted: bool = False,
) -> jnp.ndarray:
    """(W, rows, 3, L, B) buckets -> (3, L, B): per-lane double-suffix-scan
    weighted sums + Horner over windows, entirely in VMEM. Same GROUP
    element per lane as the XLA tail in ops/msm.py::_msm_lanewise (the
    projective representative may differ: XLA masks identity-adds, this
    kernel runs them through the complete formulas).

    ``nbuckets``: LIVE bucket rows (default 2^c with a trash row 0; signed
    tables pass 2^(c-1) with ``shifted=True`` — row i = bucket i+1).

    Lane blocks of <=128 ride a leading grid dim; the window grid dim is
    innermost so each lane block's Horner accumulator (the output block)
    stays VMEM-resident across all W windows. VMEM peak ~ a few copies of
    the (2^c, 3, L, 128) block — fits the 16 MB budget for c <= 6 unsigned
    / c <= 7 signed (the _auto_c_batched caps; larger c must use the XLA
    tail)."""
    w, rows, _, _, b = buckets.shape
    if nbuckets is None:
        nbuckets = 1 << c
    assert rows >= nbuckets
    buckets = buckets[:, :nbuckets]
    bb = min(128, b)
    nbb = -(-b // bb)
    bpad = nbb * bb - b
    if bpad:
        buckets = jnp.concatenate(
            [buckets, jnp.zeros(buckets.shape[:-1] + (bpad,), jnp.uint32)],
            axis=-1,
        )

    kern = functools.partial(
        _batched_tail_kernel, c=c, nbuckets=nbuckets, w_total=w,
        shifted=shifted,
    )
    out = pl.pallas_call(
        kern,
        grid=(nbb, w),
        in_specs=[
            pl.BlockSpec(
                (1, nbuckets, 3, L, bb),
                lambda k, i, w_=w: (w_ - 1 - i, 0, 0, 0, k),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (3, L, bb), lambda k, i: (0, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, L, nbb * bb), jnp.uint32),
        interpret=interpret,
    )(buckets)
    return out[..., :b]


batched_bucket_tail = jax.jit(
    _batched_bucket_tail_impl,
    static_argnames=("c", "interpret", "nbuckets", "shifted"),
)
#: Donates the bucket tensor — the largest transient of the whole batched
#: MSM pipeline (W x 2^c x 3 x L x B words); it is dead after the tail.
batched_bucket_tail_donated = jax.jit(
    _batched_bucket_tail_impl,
    static_argnames=("c", "interpret", "nbuckets", "shifted"),
    donate_argnums=(0,),
)


def _msm_single_fused_impl(
    pts_stream: jnp.ndarray,
    digits: jnp.ndarray,
    c: int,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
    signed: bool = False,
    wgroup: int | None = None,
    fused: bool = False,
) -> jnp.ndarray:
    """Complete single-MSM pipeline: (S, 2, L, B) points x (W, S, B) digits
    (balanced signed digits when ``signed``)
    -> one point (3, L, 1), same group element as msm_pippenger's XLA path
    (identical canonical affine; the projective representative differs
    because identity-adds are masked in XLA but computed through the
    complete formulas here). ``wgroup``/``fused`` select the G-way
    interleaved / fused-table-pass accumulation kernel."""
    w, s, b = digits.shape
    assert b & (b - 1) == 0, "lane count must be a power of two"
    buckets = _bucket_accumulate_impl(
        pts_stream, digits, c, chunk, interpret, signed=signed,
        wgroup=wgroup, fused=fused,
    )
    live = (1 << (c - 1)) if signed else None
    return _single_tail(buckets, c, w, interpret, nbuckets=live, shifted=signed)


def _msm_single_fused_sc_impl(
    pts_stream: jnp.ndarray,
    sc_stream: jnp.ndarray,
    c: int,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
) -> jnp.ndarray:
    """msm_single_fused with IN-KERNEL digit extraction from standard-form
    scalar limbs ((S, L, B) stream; c must divide 16): skips the digit
    tensor's XLA pass and HBM round trip entirely."""
    b = pts_stream.shape[-1]
    assert b & (b - 1) == 0, "lane count must be a power of two"
    w = 256 // c
    buckets = _bucket_accumulate_from_scalars_impl(
        pts_stream, sc_stream, c, min(chunk, DEFAULT_CHUNK // 2), interpret
    )
    return _single_tail(buckets, c, w, interpret)


def _msm_single_fused_sc_signed_impl(
    pts_stream: jnp.ndarray,
    sc_stream: jnp.ndarray,
    masks: jnp.ndarray,
    c: int,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
    wpair: bool = True,
) -> jnp.ndarray:
    """Signed-digit single-MSM pipeline with in-kernel digit derivation
    from scalar limbs + carry bitmasks (ops/msm.py::signed_carries)."""
    b = pts_stream.shape[-1]
    assert b & (b - 1) == 0, "lane count must be a power of two"
    w = 256 // c
    buckets = _bucket_accumulate_from_scalars_signed_impl(
        pts_stream, sc_stream, masks, c, min(chunk, DEFAULT_CHUNK // 2),
        interpret, wpair=wpair,
    )
    return _single_tail(
        buckets, c, w, interpret, nbuckets=1 << (c - 1), shifted=True
    )


msm_single_fused = jax.jit(
    _msm_single_fused_impl,
    static_argnames=_STATICS + ("signed", "wgroup", "fused"),
)
msm_single_fused_donated = jax.jit(
    _msm_single_fused_impl,
    static_argnames=_STATICS + ("signed", "wgroup", "fused"),
    donate_argnums=(0, 1),
)
msm_single_fused_sc_signed = jax.jit(
    _msm_single_fused_sc_signed_impl, static_argnames=_STATICS + ("wpair",)
)
msm_single_fused_sc_signed_donated = jax.jit(
    _msm_single_fused_sc_signed_impl,
    static_argnames=_STATICS + ("wpair",),
    donate_argnums=(0, 1, 2),
)
msm_single_fused_sc = jax.jit(
    _msm_single_fused_sc_impl, static_argnames=_STATICS
)
msm_single_fused_sc_donated = jax.jit(
    _msm_single_fused_sc_impl, static_argnames=_STATICS, donate_argnums=(0, 1)
)
