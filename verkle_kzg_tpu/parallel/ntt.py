"""Distributed NTT over a device mesh: the four-step (Bailey) algorithm.

This is the "multi-host butterfly exchange" component of SURVEY.md §5 —
entirely greenfield vs the single-process reference. Rather than exchanging
individual butterfly partners across chips, the transform is factored as
N = N1 * N2 and laid out as an (N1, N2) matrix with the N2 axis sharded:

  1. N2 independent size-N1 NTTs along the UNSHARDED axis (local);
  2. an elementwise twiddle multiply by w^(k1*j2) (local);
  3. a transpose + resharding constraint — THE one cross-chip exchange;
     GSPMD lowers it to an all-to-all over ICI;
  4. N1 independent size-N2 NTTs, again along the unsharded axis (local).

The output lands in natural order: X[k2*N1 + k1] = element [k2, k1] of the
final matrix. Everything is plain sharded jnp code — XLA inserts the
collectives — so the same function runs single-chip (no-op resharding) or
on any mesh.

Index derivation (j = j1*N2 + j2, k = k2*N1 + k1, w = the size-N root):
  X[k2*N1+k1] = sum_j2 w^(j2*k1) * w_{N2}^(j2*k2)
                * (sum_j1 x[j1*N2+j2] * w_{N1}^(j1*k1))
with w_{N1} = w^N2 and w_{N2} = w^N1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..hostmath.field import fr_inv
from ..params import R, NLIMBS, fr_root_of_unity
from ..ops import field as df
from ..ops import ntt as dntt
from ..ops.limbs import ints_to_limbs

L = NLIMBS


def _ntt_lead_axis(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Size-T NTT along axis 0 of (T, L, B), batched over the (sharded)
    minor lane axis B. Gathers/scatters index only axis 0, so with B sharded
    every stage is embarrassingly parallel; limbs stay at axis -2 as the
    field kernels require."""
    t = x.shape[0]
    plan = dntt._Plan(t, inverse)
    x = x[jnp.asarray(plan.bitrev)]
    for u_idx, v_idx, tw in plan.stages:
        # tw is (L, T/2); reshape to (T/2, L, 1) to broadcast over lanes
        tw_mont = df.to_mont(jnp.asarray(tw), "fr")
        tw_mont = jnp.moveaxis(tw_mont, -1, 0)[..., None]  # (T/2, L, 1)
        u = x[jnp.asarray(u_idx)]
        v = df.mont_mul(x[jnp.asarray(v_idx)], tw_mont, "fr")
        x = x.at[jnp.asarray(u_idx)].set(df.add(u, v, "fr"))
        x = x.at[jnp.asarray(v_idx)].set(df.sub(u, v, "fr"))
    if inverse:
        n_inv = df.to_mont(jnp.asarray(ints_to_limbs([plan.n_inv]).T), "fr")
        x = df.mont_mul(x, jnp.broadcast_to(n_inv[None], x.shape), "fr")
    return x


@functools.lru_cache(maxsize=None)
def _twiddle_matrix(n1: int, n2: int, inverse: bool) -> np.ndarray:
    """(n1, L, n2) Montgomery w^(k1*j2), matching step 1's output layout."""
    n = n1 * n2
    w = fr_root_of_unity(n)
    if inverse:
        w = fr_inv(w)
    vals = [pow(w, k1 * j2, R) for k1 in range(n1) for j2 in range(n2)]
    enc = [(v << 256) % R for v in vals]
    arr = ints_to_limbs(enc).reshape(n1, n2, L)  # (n1, n2, L)
    return np.moveaxis(arr, -1, 1).copy()  # (n1, L, n2)


def _four_step(a, n1: int, n2: int, inverse: bool, minor_sharding):
    # a: (n1, L, n2) with the lane axis (j2) sharded
    a = _ntt_lead_axis(a, inverse)  # -> index [k1, :, j2]
    a = df.mont_mul(a, jnp.asarray(_twiddle_matrix(n1, n2, inverse)), "fr")
    a = jnp.swapaxes(a, 0, 2)  # (j2, L, k1): sharding followed the move...
    if minor_sharding is not None:
        # ...force it back onto the MINOR axis: the all-to-all exchange
        a = jax.lax.with_sharding_constraint(a, minor_sharding)
    a = _ntt_lead_axis(a, inverse)  # -> index [k2, :, k1]
    # element [k2, :, k1] is X[k2*N1 + k1]: natural order after flattening
    return jnp.moveaxis(a, 1, 0).reshape(L, n1 * n2)
    # (each sub-NTT folds its own 1/n factor, so inverse scaling is 1/N.)


def _run_sharded(x_mont, mesh, n1, inverse):
    n = x_mont.shape[-1]
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    assert n1 * n2 == n and n1 > 1 and n2 > 1

    if mesh is None:
        sh = None
        a = jnp.moveaxis(x_mont.reshape(L, n1, n2), 0, 1)  # (n1, L, n2)
    else:
        axis = mesh.axis_names[0]
        d = mesh.shape[axis]
        assert n2 % d == 0 and n1 % d == 0, "both factors must divide the mesh"
        sh = NamedSharding(mesh, P(None, None, axis))
        a = jax.device_put(jnp.moveaxis(x_mont.reshape(L, n1, n2), 0, 1), sh)

    fn = jax.jit(
        functools.partial(
            _four_step, n1=n1, n2=n2, inverse=inverse, minor_sharding=sh
        )
    )
    return fn(a)


def ntt_fr_sharded(x_mont, mesh=None, n1: int | None = None):
    """Distributed forward NTT of a (L, N) Montgomery vector over ``mesh``
    (None = single device, useful for testing the factored algorithm)."""
    return _run_sharded(x_mont, mesh, n1, inverse=False)


def intt_fr_sharded(x_mont, mesh=None, n1: int | None = None):
    return _run_sharded(x_mont, mesh, n1, inverse=True)


# ---------------------------------------------------------------------------
# G1 four-step: the same factorization over POINT butterflies (the missing
# half of the round-1 distributed NTT; unlocks the distributed FK prover,
# reference transforms at ``kzg/mod.rs:200-235``).
# ---------------------------------------------------------------------------

from ..ops import curve as dc  # noqa: E402


def _g1_ntt_lead_axis(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Size-T G1 NTT along axis 0 of (T, 3, L, B): butterflies are
    (u, v) -> (u + tw*v, u - tw*v) with a vectorized 256-bit scalar-mul
    for the twiddle; the (sharded) lane axis B never moves."""
    t = x.shape[0]
    plan = dntt._Plan(t, inverse)
    x = x[jnp.asarray(plan.bitrev)]
    for u_idx, v_idx, tw in plan.stages:
        tw_std = jnp.moveaxis(jnp.asarray(tw), -1, 0)[..., None]  # (T/2, L, 1)
        u = x[jnp.asarray(u_idx)]
        b = x.shape[-1]
        v = dc.scalar_mul(
            x[jnp.asarray(v_idx)], jnp.broadcast_to(tw_std, (t // 2, L, b))
        )
        x = x.at[jnp.asarray(u_idx)].set(dc.add(u, v))
        x = x.at[jnp.asarray(v_idx)].set(dc.add(u, dc.neg(v)))
    if inverse:
        n_inv = jnp.asarray(ints_to_limbs([plan.n_inv]).T)  # (L, 1)
        x = dc.scalar_mul(x, jnp.broadcast_to(n_inv, x.shape[:1] + (L, x.shape[-1])))
    return x


@functools.lru_cache(maxsize=None)
def _twiddle_matrix_std(n1: int, n2: int, inverse: bool) -> np.ndarray:
    """(n1, L, n2) STANDARD-form w^(k1*j2) (G1 scalar-mul wants standard)."""
    n = n1 * n2
    w = fr_root_of_unity(n)
    if inverse:
        w = fr_inv(w)
    vals = [pow(w, k1 * j2, R) for k1 in range(n1) for j2 in range(n2)]
    arr = ints_to_limbs(vals).reshape(n1, n2, L)
    return np.moveaxis(arr, -1, 1).copy()


def _g1_four_step(a, n1: int, n2: int, inverse: bool, minor_sharding):
    # a: (n1, 3, L, n2) with the lane axis (j2) sharded
    a = _g1_ntt_lead_axis(a, inverse)
    a = dc.scalar_mul(a, jnp.asarray(_twiddle_matrix_std(n1, n2, inverse)))
    a = jnp.swapaxes(a, 0, 3)  # (j2, 3, L, k1)
    if minor_sharding is not None:
        a = jax.lax.with_sharding_constraint(a, minor_sharding)
    a = _g1_ntt_lead_axis(a, inverse)  # index [k2, 3, L, k1]
    return jnp.moveaxis(a, 0, -2).reshape(3, L, n1 * n2)


def _run_g1_sharded(pts_proj, mesh, n1, inverse):
    n = pts_proj.shape[-1]
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    assert n1 * n2 == n and n1 > 1 and n2 > 1

    a = jnp.moveaxis(pts_proj.reshape(3, L, n1, n2), 2, 0)  # (n1, 3, L, n2)
    if mesh is None:
        sh = None
    else:
        axis = mesh.axis_names[0]
        d = mesh.shape[axis]
        assert n2 % d == 0 and n1 % d == 0, "both factors must divide the mesh"
        sh = NamedSharding(mesh, P(None, None, None, axis))
        a = jax.device_put(a, sh)

    fn = jax.jit(
        functools.partial(
            _g1_four_step, n1=n1, n2=n2, inverse=inverse, minor_sharding=sh
        )
    )
    return fn(a)


def ntt_g1_sharded(pts_proj, mesh=None, n1: int | None = None):
    """Distributed forward G1 NTT of a (3, L, N) projective point vector."""
    return _run_g1_sharded(pts_proj, mesh, n1, inverse=False)


def intt_g1_sharded(pts_proj, mesh=None, n1: int | None = None):
    return _run_g1_sharded(pts_proj, mesh, n1, inverse=True)
