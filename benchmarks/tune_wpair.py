"""A/B the window-paired signed accumulation kernel on the real device.

Times the full single-MSM pipeline at 2^BENCH_LOG2N with the remapped
signed tables, wpair on vs off, plus the unsigned path as a sanity line.
Bit-checks every variant against the native C++ oracle.
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
    from verkle_kzg_tpu.ops import pallas_msm as PM
    from verkle_kzg_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
    from verkle_kzg_tpu.params import R, NLIMBS

    L = NLIMBS
    log2n = int(os.environ.get("BENCH_LOG2N", "20"))
    chain = int(os.environ.get("BENCH_CHAIN", "4"))
    c = int(os.environ.get("BENCH_WINDOW_C", "8"))
    lanes = 128
    n = 1 << log2n

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
    from verkle_kzg_tpu import native

    expect = native.g1_msm(
        dc.affine_to_host_points(pts), limbs_to_ints(np.asarray(msm_scalars).T)
    )
    print(json.dumps({"event": "ready", "n": n}), flush=True)

    import math

    w = math.ceil(256 / c)
    steps = math.ceil(n / lanes)

    def build(kind, k):
        def fn(p, s):
            acc = dc.infinity((), 1)
            for i in range(k):
                si = jnp.roll(s, i, axis=-1)
                if kind == "unsigned":
                    acc = dc.add(
                        acc,
                        dmsm.msm_pippenger(p, si, c=c, lanes=lanes, signed=False),
                    )
                else:
                    ptsr = jnp.moveaxis(p.reshape(2, L, steps, lanes), 2, 0)
                    scr = jnp.moveaxis(si.reshape(L, steps, lanes), 1, 0)
                    nwords = dmsm.carry_mask_words(w)
                    masks = jnp.moveaxis(
                        dmsm.signed_carries(si, c).reshape(nwords, steps, lanes),
                        1,
                        0,
                    )
                    acc = dc.add(
                        acc,
                        PM._msm_single_fused_sc_signed_impl(
                            ptsr, scr, masks, c, wpair=(kind == "pair")
                        ),
                    )
            return acc

        return jax.jit(fn)

    for kind in ("pair", "nopair", "unsigned"):
        f1, fk = build(kind, 1), build(kind, chain)
        t0 = time.perf_counter()
        r1 = f1(pts, msm_scalars)
        got = dc.projective_to_host_points(r1)[0]
        assert got == expect, f"MISMATCH {kind}"
        np.asarray(fk(pts, msm_scalars))
        warm = time.perf_counter() - t0

        def timed(fn, reps=3):
            t0 = time.perf_counter()
            for _ in range(reps):
                np.asarray(fn(pts, msm_scalars))
            return (time.perf_counter() - t0) / reps

        t1, tk = timed(f1), timed(fk)
        per = max(tk - t1, 1e-9) / (chain - 1)
        print(
            json.dumps(
                {
                    "kind": kind,
                    "c": c,
                    "points_per_sec": round(n / per, 1),
                    "msm_s": round(per, 4),
                    "warm_s": round(warm, 1),
                    "bit_exact": True,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
