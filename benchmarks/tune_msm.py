"""MSM parameter tuning harness (lanes x window sweep, cached points).

Chained-difference timing (see bench.py): reports pure device compute.
Env: TUNE_LOG2N, TUNE_CONFIGS="c,lanes;c,lanes;...", TUNE_CHAIN.
Points are cached in /root/repo/.bench_points_<log2n>.npz.
"""

import os, sys, time, json
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def load_points(log2n: int):
    from verkle_kzg_tpu.hostmath import curve as hc
    from verkle_kzg_tpu.ops import curve as dc
    from verkle_kzg_tpu.ops.limbs import ints_to_limbs
    from verkle_kzg_tpu.params import R

    n = 1 << log2n
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(root, f".bench_points_{log2n}.npz")
    rng = np.random.default_rng(0xBEEF)
    base_scalars = [(int(x) % (R - 1)) + 1 for x in rng.integers(1, 1 << 62, n)]
    msm_scalars = jnp.asarray(ints_to_limbs([int(x) % R for x in rng.integers(0, 1 << 63, n)]).T)
    if os.path.exists(cache):
        pts = jnp.asarray(np.load(cache)["pts"])
    else:
        g = hc.g1_generator()
        step = min(n, 1 << 17)
        g_dev = jnp.broadcast_to(dc.host_point_to_projective(g), (3, 16, step))
        gen = jax.jit(dc.scalar_mul)
        chunks = []
        for s in range(0, n, step):
            part = dc.to_affine(gen(g_dev, jnp.asarray(ints_to_limbs(base_scalars[s : s + step]).T)))
            chunks.append(np.asarray(part))
        arr = np.concatenate(chunks, axis=-1)
        np.savez(cache, pts=arr)
        pts = jnp.asarray(arr)
    return pts, msm_scalars


def time_config(pts, scal, n, c, lanes, signed=None, chain=3, reps=2):
    from verkle_kzg_tpu.ops import curve as dc
    from verkle_kzg_tpu.ops import msm as dmsm

    def chained(k):
        def fn(p, s):
            acc = dc.infinity((), 1)
            for i in range(k):
                si = jnp.roll(s, i, axis=-1)
                acc = dc.add(acc, dmsm.msm_pippenger(p, si, c=c, lanes=lanes, signed=signed))
            return acc
        return jax.jit(fn)

    f1, fk = chained(1), chained(chain)
    np.asarray(f1(pts, scal)); np.asarray(fk(pts, scal))

    def timed(fn):
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(pts, scal))
        return (time.perf_counter() - t0) / reps

    t1, tk = timed(f1), timed(fk)
    per = max(tk - t1, 1e-9) / (chain - 1)
    return n / per


def main():
    log2n = int(os.environ.get("TUNE_LOG2N", "18"))
    configs = os.environ.get("TUNE_CONFIGS", "8,128")
    chain = int(os.environ.get("TUNE_CHAIN", "3"))
    n = 1 << log2n
    pts, scal = load_points(log2n)
    for cfg in configs.split(";"):
        parts = cfg.split(",")
        c, lanes = int(parts[0]), int(parts[1])
        # optional third field: s / u forces signed / unsigned digits
        signed = {"s": True, "u": False}.get(parts[2]) if len(parts) > 2 else None
        pps = time_config(pts, scal, n, c, lanes, signed=signed, chain=chain)
        print(json.dumps({"log2n": log2n, "c": c, "lanes": lanes,
                          "signed": signed, "points_per_sec": round(pps, 1)}), flush=True)


if __name__ == "__main__":
    main()
