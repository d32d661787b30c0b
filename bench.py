"""Headline benchmark: Pippenger MSM throughput on the available device.

Prints ONE JSON line:
  {"metric": "msm_points_per_sec", "value": N, "unit": "points/s",
   "vs_baseline": R}

vs_baseline compares against the reference's MSM primitive: a naive SERIAL
fold of one full scalar-mul per point (``vector-commit/src/utils.rs:16-19``,
the hot loop of every commit/prove/verify — SURVEY.md §3.2). The reference
publishes no numbers (BASELINE.md), so the baseline is MEASURED on this
host: the native C++ twin's serial fold (vkzg_g1_msm_naive — u64x4
Montgomery + Jacobian double-and-add, the same algorithm arkworks runs)
does 1,826 points/s (8192 points / 4.49 s, single core). Round 1 used a
deliberately generous 4,000 points/s estimate; the measured line replaces
it per the round-1 verdict.

Timing honesty: this TPU is reached through a tunnel whose dispatch+transfer
overhead is ~50-100 ms and whose block_until_ready can return early, so we
time K chained MSMs against 1 MSM (distinct inputs per link so XLA cannot
CSE) and report the difference — pure device compute, no fixed overhead.

Environment knobs: BENCH_LOG2N (default 20), BENCH_WINDOW_C (default: mode-aware),
BENCH_LANES (default 128), BENCH_CHAIN (default 4), BENCH_CHECK=1 to
bit-verify the result against the native C++ oracle first.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import pathlib

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_SERIAL_POINTS_PER_SEC = 1_826.0  # measured, see docstring


def main():
    from verkle_kzg_tpu.hostmath import curve as hc
    from verkle_kzg_tpu.ops import curve as dc
    from verkle_kzg_tpu.ops import msm as dmsm
    from verkle_kzg_tpu.ops.limbs import ints_to_limbs
    from verkle_kzg_tpu.params import R

    log2n = int(os.environ.get("BENCH_LOG2N", "20"))
    c_env = os.environ.get("BENCH_WINDOW_C", "")
    c = int(c_env) if c_env else None  # None -> mode-aware default (ops/msm._auto_c)
    lanes = int(os.environ.get("BENCH_LANES", "128"))
    chain = int(os.environ.get("BENCH_CHAIN", "4"))
    n = 1 << log2n

    # N distinct points via batched scalar-mul sweeps from the generator,
    # chunked: one giant dispatch can trip the TPU tunnel's RPC deadline.
    rng = np.random.default_rng(0xBEEF)
    g = hc.g1_generator()
    base_scalars = [(int(x) % (R - 1)) + 1 for x in rng.integers(1, 1 << 62, n)]
    step = min(n, 1 << 17)
    g_dev = jnp.broadcast_to(dc.host_point_to_projective(g), (3, 16, step))
    gen = jax.jit(dc.scalar_mul)
    chunks = []
    for s in range(0, n, step):
        part = dc.to_affine(gen(g_dev, jnp.asarray(ints_to_limbs(base_scalars[s : s + step]).T)))
        chunks.append(np.asarray(part))
    pts = jnp.asarray(np.concatenate(chunks, axis=-1))

    msm_scalars = jnp.asarray(
        ints_to_limbs([int(x) % R for x in rng.integers(0, 1 << 63, n)]).T
    )

    def chained(k):
        def fn(p, s):
            acc = dc.infinity((), 1)
            for i in range(k):
                # distinct input per link (lane roll) so links cannot be CSEd
                si = jnp.roll(s, i, axis=-1)
                acc = dc.add(acc, dmsm.msm_pippenger(p, si, c=c, lanes=lanes))
            return acc

        return jax.jit(fn)

    f1, fk = chained(1), chained(chain)

    if os.environ.get("BENCH_CHECK", "0") == "1":
        from verkle_kzg_tpu import native
        from verkle_kzg_tpu.ops.limbs import limbs_to_ints

        got = dc.projective_to_host_points(f1(pts, msm_scalars))[0]
        pts_host = dc.affine_to_host_points(pts)
        scalars_int = limbs_to_ints(np.asarray(msm_scalars).T)
        expect = native.g1_msm(pts_host, scalars_int)
        assert got == expect, "device MSM != native C++ oracle"
        print('{"check": "bit-exact vs native oracle", "ok": true}')

    # warm both programs (compile)
    np.asarray(f1(pts, msm_scalars))
    np.asarray(fk(pts, msm_scalars))

    def timed(fn, reps=3):
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(pts, msm_scalars))
        return (time.perf_counter() - t0) / reps

    t1 = timed(f1)
    tk = timed(fk)
    per_msm = max(tk - t1, 1e-9) / (chain - 1)
    pps = n / per_msm
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
