"""Single-MSM window/sign tuning sweep on the real device.

Generates ONE set of 2^BENCH_LOG2N points, then times msm_pippenger under a
grid of (c, signed, lanes) configs with the chained-difference method of
bench.py (tunnel-safe). Prints one JSON line per config.

Usage: python benchmarks/tune_msm.py
Knobs: BENCH_LOG2N (default 20), BENCH_CHAIN (default 4),
       TUNE_CONFIGS ("c,signed,lanes;c,signed,lanes;...").
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    from verkle_kzg_tpu.hostmath import curve as hc
    from verkle_kzg_tpu.ops import curve as dc
    from verkle_kzg_tpu.ops import msm as dmsm
    from verkle_kzg_tpu.ops.limbs import ints_to_limbs
    from verkle_kzg_tpu.params import R

    log2n = int(os.environ.get("BENCH_LOG2N", "20"))
    chain = int(os.environ.get("BENCH_CHAIN", "4"))
    n = 1 << log2n

    cfg_env = os.environ.get(
        "TUNE_CONFIGS",
        "8,1,128;8,0,128;4,1,128;4,0,128;8,1,256;8,0,256",
    )
    configs = []
    for part in cfg_env.split(";"):
        c, signed, lanes = (int(x) for x in part.split(","))
        configs.append((c, bool(signed), lanes))

    rng = np.random.default_rng(0xBEEF)
    g = hc.g1_generator()
    base_scalars = [(int(x) % (R - 1)) + 1 for x in rng.integers(1, 1 << 62, n)]
    step = min(n, 1 << 17)
    g_dev = jnp.broadcast_to(dc.host_point_to_projective(g), (3, 16, step))
    gen = jax.jit(dc.scalar_mul)
    chunks = []
    for s in range(0, n, step):
        part = dc.to_affine(
            gen(g_dev, jnp.asarray(ints_to_limbs(base_scalars[s : s + step]).T))
        )
        chunks.append(np.asarray(part))
    pts = jnp.asarray(np.concatenate(chunks, axis=-1))
    msm_scalars = jnp.asarray(
        ints_to_limbs([int(x) % R for x in rng.integers(0, 1 << 63, n)]).T
    )
    print(json.dumps({"event": "points_ready", "n": n}), flush=True)

    expect = None
    if os.environ.get("BENCH_CHECK", "1") == "1":
        from verkle_kzg_tpu import native
        from verkle_kzg_tpu.ops.limbs import limbs_to_ints

        pts_host = dc.affine_to_host_points(pts)
        scalars_int = limbs_to_ints(np.asarray(msm_scalars).T)
        expect = native.g1_msm(pts_host, scalars_int)
        print(json.dumps({"event": "oracle_ready"}), flush=True)

    for c, signed, lanes in configs:
        def chained(k):
            def fn(p, s):
                acc = dc.infinity((), 1)
                for i in range(k):
                    si = jnp.roll(s, i, axis=-1)
                    acc = dc.add(
                        acc,
                        dmsm.msm_pippenger(p, si, c=c, lanes=lanes, signed=signed),
                    )
                return acc

            return jax.jit(fn)

        f1, fk = chained(1), chained(chain)
        t_c0 = time.perf_counter()
        r1 = f1(pts, msm_scalars)
        if expect is not None:
            got = dc.projective_to_host_points(r1)[0]
            assert got == expect, f"MISMATCH c={c} signed={signed}"
        else:
            np.asarray(r1)
        np.asarray(fk(pts, msm_scalars))
        compile_s = time.perf_counter() - t_c0

        def timed(fn, reps=3):
            t0 = time.perf_counter()
            for _ in range(reps):
                np.asarray(fn(pts, msm_scalars))
            return (time.perf_counter() - t0) / reps

        t1 = timed(f1)
        tk = timed(fk)
        per_msm = max(tk - t1, 1e-9) / (chain - 1)
        print(
            json.dumps(
                {
                    "c": c,
                    "signed": signed,
                    "lanes": lanes,
                    "points_per_sec": round(n / per_msm, 1),
                    "msm_s": round(per_msm, 4),
                    "warm_s": round(compile_s, 1),
                    "bit_exact": expect is not None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
