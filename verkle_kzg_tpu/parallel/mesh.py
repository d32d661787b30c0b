"""Device-mesh sharded MSM.

The north-star workload (BASELINE.md config 5): a 2^16..2^22-point MSM with
points/scalars sharded across chips. Design:

  * the (N, ...) point/scalar arrays are sharded on axis 0 over the "shard"
    mesh axis (`shard_map`);
  * each device runs the full local Pippenger (ops/msm.py) on its N/D slice
    — embarrassingly parallel, zero communication;
  * the per-device partial results (ONE projective point each) are combined
    with a single `all_gather` over ICI followed by a log-depth local group
    reduction. An MSM is a sum in G1, so the only cross-chip traffic is
    D*96 bytes — communication is negligible by construction, which is what
    makes >80% multi-chip scaling efficiency attainable.
  * batched MSMs (verkle node fleets, multiproof query stacks) shard the
    BATCH axis instead — pure data parallelism.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import curve as dc
from ..ops import msm as dmsm
from ..utils import metrics


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _place(mesh: Mesh, *pairs):
    """device_put each (array, spec) pair onto ``mesh``. Upstream producers
    (notably the persistent-AOT programs, utils/aot.py) return arrays
    COMMITTED to a single device; feeding those straight into a shard_map
    over a wider mesh is an error — re-placing here also does the intended
    initial distribution in one transfer."""
    return tuple(
        jax.device_put(a, NamedSharding(mesh, spec)) for a, spec in pairs
    )


def msm_sharded(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    mesh: Mesh,
    c: int = 8,
    lanes: int = 128,
) -> jnp.ndarray:
    """One big MSM sharded over the mesh -> replicated (3, L) result."""
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    n = points_affine.shape[-1]
    # counters fire here (eager side): inside the shard_map'd body they
    # would run once per trace, not per execution
    metrics.record("msm.sharded.calls")
    metrics.record("msm.sharded.points", n)

    # pad so every shard gets an equal static slice (infinity sentinels)
    per = math.ceil(n / d)
    padded = per * d
    if padded != n:
        points_affine = jnp.concatenate(
            [points_affine, jnp.zeros((2, 16, padded - n), jnp.uint32)], axis=-1
        )
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((16, padded - n), jnp.uint32)], axis=-1
        )

    def local(pts, scs):
        # size-adaptive local MSM: tiny shards take the naive path (cheap
        # compiles in protocol-layer tests), big shards run Pippenger.
        # unmetered variant: this body is shard_map-traced.
        part = dmsm._msm_auto_impl(pts, scs, c=c, lanes=lanes)  # (3, L, 1)
        parts = jax.lax.all_gather(part, axis)  # (D, 3, L, 1)
        return dmsm.tree_reduce_points(parts, axis=0)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis)),
        out_specs=P(),  # replicated
        # the limb kernels build scan carries from jnp.zeros (unvarying);
        # skip the varying-manual-axes check — every op is shard-local by
        # construction and the only cross-shard op is the all_gather above
        check_vma=False,
    )
    points_affine, scalars = _place(
        mesh, (points_affine, P(None, None, axis)), (scalars, P(None, axis))
    )
    return fn(points_affine, scalars)


def msm_batched_sharded(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    mesh: Mesh,
    c: int = 8,
) -> jnp.ndarray:
    """(B, 2, L, N) x (B, L, N) -> (3, L, B), batch axis sharded (DP).
    The result batch rides the lane (minor) axis, matching msm_batched."""
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    b = points_affine.shape[0]
    metrics.record("msm.batched_sharded.calls")
    metrics.record("msm.batched_sharded.points", b * points_affine.shape[-1])
    per = math.ceil(b / d)
    padded = per * d
    if padded != b:
        pad = padded - b
        points_affine = jnp.concatenate(
            [points_affine, jnp.zeros((pad,) + points_affine.shape[1:], jnp.uint32)],
            axis=0,
        )
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad,) + scalars.shape[1:], jnp.uint32)], axis=0
        )

    fn = shard_map(
        functools.partial(dmsm._msm_batched_impl, c=c),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(None, None, axis),  # result batch rides the lane axis
        check_vma=False,
    )
    points_affine, scalars = _place(
        mesh, (points_affine, P(axis)), (scalars, P(axis))
    )
    return fn(points_affine, scalars)[..., :b]


def msm_fixed_base_sharded(
    points_affine: jnp.ndarray,
    scalars: jnp.ndarray,
    mesh: Mesh,
    c: int | None = None,
) -> jnp.ndarray:
    """Fixed-CRS MSM stack, batch-sharded: (2, L, N) x (B, L, N) -> (3, L, B).

    The shared basis is REPLICATED (every device already holds the CRS);
    only the scalar-vector batch is sharded — this is the verkle tree's
    production commit path on a mesh (thousands of width-256 node vectors,
    the analog of the reference's per-node rayon-less serial loop,
    ``node.rs:212-277``). Zero cross-device communication: each device
    commits its own slice of nodes."""
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    b = scalars.shape[0]
    metrics.record("msm.fixed_base_sharded.calls")
    metrics.record("msm.fixed_base_sharded.points", b * points_affine.shape[-1])
    per = math.ceil(b / d)
    padded = per * d
    if padded != b:
        pad = padded - b
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad,) + scalars.shape[1:], jnp.uint32)], axis=0
        )

    fn = shard_map(
        functools.partial(dmsm._msm_fixed_base_impl, c=c),
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(None, None, axis),
        check_vma=False,
    )
    points_affine, scalars = _place(
        mesh, (points_affine, P()), (scalars, P(axis))
    )
    return fn(points_affine, scalars)[..., :b]
