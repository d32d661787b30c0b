"""Headline benchmark: Pippenger MSM throughput on the available device.

Prints ONE JSON line:
  {"metric": "msm_points_per_sec", "value": N, "unit": "points/s",
   "vs_baseline": R}

vs_baseline compares against the reference's MSM primitive: a naive SERIAL
fold of one full scalar-mul per point (``vector-commit/src/utils.rs:16-19``,
the hot loop of every commit/prove/verify — SURVEY.md §3.2). The reference
publishes no numbers (BASELINE.md), so the baseline is an arkworks-CPU
estimate: ~250us per serial G1 scalar-mul => ~4,000 points/s. That estimate
is deliberately generous to the reference (measured arkworks mul is
200-300us on typical server cores).

Environment knobs: BENCH_LOG2N (default 16), BENCH_WINDOW_C (default 8),
BENCH_LANES (default 256), BENCH_REPS (default 3).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_SERIAL_POINTS_PER_SEC = 4_000.0


def main():
    from verkle_kzg_tpu.hostmath import curve as hc
    from verkle_kzg_tpu.ops import curve as dc
    from verkle_kzg_tpu.ops import msm as dmsm
    from verkle_kzg_tpu.ops.limbs import ints_to_limbs
    from verkle_kzg_tpu.params import R

    log2n = int(os.environ.get("BENCH_LOG2N", "16"))
    c = int(os.environ.get("BENCH_WINDOW_C", "8"))
    lanes = int(os.environ.get("BENCH_LANES", "256"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    n = 1 << log2n

    # Build N distinct points cheaply: one batched device scalar-mul sweep
    # from the generator, then random scalars.
    rng = np.random.default_rng(0xBEEF)
    g = hc.g1_generator()
    base_scalars = [(int(x) % (R - 1)) + 1 for x in rng.integers(1, 1 << 62, n)]
    g_dev = dc.from_affine(dc.host_points_to_affine([g]))
    pts_proj = jax.jit(dc.scalar_mul)(
        jnp.broadcast_to(g_dev, (n, 3, 16)), jnp.asarray(ints_to_limbs(base_scalars))
    )
    pts = dc.to_affine(pts_proj)
    pts.block_until_ready()

    msm_scalars = jnp.asarray(
        ints_to_limbs([int(x) % R for x in rng.integers(0, 1 << 63, n)])
    )

    fn = jax.jit(lambda p, s: dmsm.msm_pippenger(p, s, c=c, lanes=lanes))
    out = fn(pts, msm_scalars)
    out.block_until_ready()  # compile + warm

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(pts, msm_scalars)
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    pps = n / dt
    print(
        json.dumps(
            {
                "metric": "msm_points_per_sec",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / REFERENCE_SERIAL_POINTS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
