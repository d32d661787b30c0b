"""Radix-2 NTT/INTT over Fr, and over G1 points, on device.

TPU-native substitute for ark_poly's EvaluationDomain::{fft, ifft}
(SURVEY.md §2.3 item 4; used by the reference at ``kzg/mod.rs:121`` for the
G1 Lagrange SRS and at ``kzg/mod.rs:215-224`` + ``lagrange_basis.rs:146-148``
for the Feist-Khovratovich amortized prover).

Design: decimation-in-time with a bit-reversal gather, then log2(N) butterfly
stages. Every stage is flattened to the SAME (N/2)-shaped gather/compute/
scatter program — u/v position indices and per-pair twiddles are data, not
shapes — so one compiled kernel serves all stages of all transforms of a
given size (no per-stage recompilation). Field butterflies are fused
Montgomery ops; G1 butterflies are complete-formula point ops with a
vectorized 256-bit scalar-mul for the twiddle factor.

Conventions match ark_poly: fft maps natural-order coefficients to
natural-order evaluations [p(w^i)]; ifft is its inverse (with the 1/N
scaling folded in).

Layout: elements ride the minor lane axis — Fr vectors are (L, N),
G1 point vectors are (3, L, N); butterfly gathers/scatters index lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..hostmath.field import fr_inv
from ..params import R, NLIMBS, fr_root_of_unity
from . import curve as dc
from . import field as df
from .limbs import ints_to_limbs

L = NLIMBS


@functools.lru_cache(maxsize=None)
class _Plan:
    """Precomputed bit-reversal + per-stage (u_idx, v_idx, twiddle) tables
    for a size-N transform. ``inverse`` selects w^-1 twiddles."""

    def __init__(self, n: int, inverse: bool):
        assert n & (n - 1) == 0 and n > 1
        self.n = n
        logn = n.bit_length() - 1
        omega = fr_root_of_unity(n)
        if inverse:
            omega = fr_inv(omega)

        # bit reversal permutation
        rev = np.zeros(n, dtype=np.int32)
        for i in range(n):
            r = 0
            for b in range(logn):
                r = (r << 1) | ((i >> b) & 1)
            rev[i] = r
        self.bitrev = rev

        pow_cache = [1] * n
        for i in range(1, n):
            pow_cache[i] = pow_cache[i - 1] * omega % R

        self.stages = []
        for s in range(logn):
            m = 1 << (s + 1)  # block size
            half = m >> 1
            u_idx = np.empty(n // 2, dtype=np.int32)
            v_idx = np.empty(n // 2, dtype=np.int32)
            tw = [0] * (n // 2)
            k = 0
            for blk in range(0, n, m):
                for j in range(half):
                    u_idx[k] = blk + j
                    v_idx[k] = blk + j + half
                    tw[k] = pow_cache[(n // m) * j]
                    k += 1
            tw_arr = np.asarray(ints_to_limbs(tw), dtype=np.uint32).T  # (L, N/2)
            self.stages.append((u_idx, v_idx, tw_arr))

        self.n_inv = fr_inv(n) if inverse else None


@jax.jit
def _fr_stage(x, u_idx, v_idx, tw_mont):
    """One butterfly stage over Fr: (u, v) -> (u + w*v, u - w*v).
    x: (L, N); u_idx/v_idx: (N/2,) lane indices; tw_mont: (L, N/2)."""
    u = x[:, u_idx]
    v = df.mont_mul(x[:, v_idx], tw_mont, "fr")
    x = x.at[:, u_idx].set(df.add(u, v, "fr"))
    x = x.at[:, v_idx].set(df.sub(u, v, "fr"))
    return x


@jax.jit
def _g1_stage(x, u_idx, v_idx, tw_std):
    """One butterfly stage over G1: scalar-mul by the twiddle, then +-.
    x: (3, L, N); tw_std: (L, N/2) standard-form scalars."""
    u = x[..., u_idx]
    v = dc.scalar_mul(x[..., v_idx], tw_std)
    x = x.at[..., u_idx].set(dc.add(u, v))
    x = x.at[..., v_idx].set(dc.add(u, dc.neg(v)))
    return x


def _run(x, plan: _Plan, stage_fn, tw_transform):
    x = x[..., jnp.asarray(plan.bitrev)]
    for u_idx, v_idx, tw in plan.stages:
        x = stage_fn(x, jnp.asarray(u_idx), jnp.asarray(v_idx), tw_transform(tw))
    return x


# ---------------------------------------------------------------------------
# Fr transforms: (L, N) Montgomery-form arrays
# ---------------------------------------------------------------------------


def ntt_fr(x_mont: jnp.ndarray) -> jnp.ndarray:
    """coefficients -> evaluations [p(w^i)] (ark fft semantics)."""
    plan = _Plan(x_mont.shape[-1], False)
    return _run(x_mont, plan, _fr_stage, lambda tw: df.to_mont(jnp.asarray(tw), "fr"))


def intt_fr(x_mont: jnp.ndarray) -> jnp.ndarray:
    """evaluations -> coefficients (ark ifft semantics, 1/N folded in)."""
    n = x_mont.shape[-1]
    plan = _Plan(n, True)
    out = _run(x_mont, plan, _fr_stage, lambda tw: df.to_mont(jnp.asarray(tw), "fr"))
    n_inv = df.to_mont(jnp.asarray(ints_to_limbs([plan.n_inv]).T), "fr")  # (L,1)
    return df.mont_mul(out, jnp.broadcast_to(n_inv, out.shape), "fr")


# ---------------------------------------------------------------------------
# G1 transforms: (3, L, N) projective Montgomery point arrays
# ---------------------------------------------------------------------------


def ntt_g1(pts_proj: jnp.ndarray) -> jnp.ndarray:
    plan = _Plan(pts_proj.shape[-1], False)
    return _run(pts_proj, plan, _g1_stage, lambda tw: jnp.asarray(tw))


def intt_g1(pts_proj: jnp.ndarray) -> jnp.ndarray:
    n = pts_proj.shape[-1]
    plan = _Plan(n, True)
    out = _run(pts_proj, plan, _g1_stage, lambda tw: jnp.asarray(tw))
    n_inv = jnp.asarray(ints_to_limbs([plan.n_inv]).T)  # (L, 1)
    return dc.scalar_mul(out, jnp.broadcast_to(n_inv, (L, n)))
