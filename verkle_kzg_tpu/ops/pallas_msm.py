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
from .pallas_curve import k_point_mixed_add_lazy, k_point_reduce
from .pallas_field import _rows_const, _kconst_ints

L = NLIMBS

# Steps (of B lanes each) per grid cell: amortizes loop overhead while
# keeping the streamed point block (CH, 2, L, B) comfortably in VMEM.
DEFAULT_CHUNK = 64


def _one_mont_rows(spec: str):
    """R mod m as an (L, 1) kernel constant (Montgomery one)."""
    from ..params import FQ, FR

    fs = {"fq": FQ, "fr": FR}[spec]
    return _rows_const(fs.r_mod_limbs)


def _accum_kernel(digits_ref, pts_ref, out_ref, *, nbuckets: int, chunk: int):
    """digits_ref: (1, CH, B) int32; pts_ref: (CH, 2, L, B) uint32;
    out_ref: (1, nbuckets, 3, L, B) uint32 (VMEM-resident across chunks)."""
    s_chunk = pl.program_id(1)
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
        tbl = out_ref[0]  # (2^c, 3, L, B): whole window table, VMEM-resident
        bidx = jax.lax.broadcasted_iota(jnp.int32, (nbuckets, 1, 1, bsz), 0)
        onehot = d[None, None, None, :] == bidx  # (2^c, 1, 1, B)
        # Per-lane gather as ONE vectorized masked sum over the bucket axis
        # (exactly one row selected per lane; int32 view because Mosaic has
        # no unsigned reductions). Per-row ref indexing here is ~25x slower.
        tbl_i = jax.lax.bitcast_convert_type(tbl, jnp.int32)
        cur = jax.lax.bitcast_convert_type(
            jnp.sum(jnp.where(onehot, tbl_i, 0), axis=0), jnp.uint32
        )
        new = k_point_mixed_add_lazy(cur, p)
        # Scatter back as ONE whole-table select.
        out_ref[0] = jnp.where(onehot, new[None], tbl)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    # Table values accumulate in the lazy [0, 2m) domain; canonicalize once
    # when this window's last chunk retires so the output contract (fully
    # reduced coordinates, bit-identical to the XLA loop) is preserved.
    # Done in bucket blocks: a whole-table reduce would materialize several
    # table-sized temporaries and blow the VMEM budget.
    @pl.when(s_chunk == pl.num_programs(1) - 1)
    def _normalize():
        blk = min(16, nbuckets)
        for b in range(0, nbuckets, blk):
            out_ref[0, b : b + blk] = k_point_reduce(out_ref[0, b : b + blk])


@functools.partial(
    jax.jit, static_argnames=("c", "chunk", "interpret")
)
def bucket_accumulate(
    pts_stream: jnp.ndarray,
    digits: jnp.ndarray,
    c: int,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
) -> jnp.ndarray:
    """(S, 2, L, B) points x (W, S, B) int32 digits -> (W, 2^c, 3, L, B)
    buckets (bucket 0 collects zero digits; excluded by the caller).

    Each lane b is an independent accumulation stream (its own digit row and
    point column) — the same contract as ops/msm.py's XLA bucket loop, so
    the two paths are interchangeable bit-for-bit.
    """
    w, s, b = digits.shape
    nbuckets = 1 << c
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

    kern = functools.partial(_accum_kernel, nbuckets=nbuckets, chunk=chunk)
    return pl.pallas_call(
        kern,
        grid=(w, nchunks),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, b), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 2, L, b),
                lambda i, j: (j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nbuckets, 3, L, b),
            lambda i, j: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((w, nbuckets, 3, L, b), jnp.uint32),
        interpret=interpret,
    )(digits.astype(jnp.int32), pts_stream)
