"""Sweep the G-way interleaved / fused-table-pass accumulation kernel on the
real device: (c, wgroup, fused) grid over the signed digit-tensor single-MSM
pipeline, against the production in-kernel-digit pair path as baseline.
Every variant is bit-checked against the native C++ oracle.

Env: BENCH_LOG2N (default 20), BENCH_CHAIN (default 4),
BENCH_GRID "c,G,fused;..." (default "6,2,0;6,2,1;6,4,1;8,2,0;8,2,1;8,4,1").
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
    grid = os.environ.get("BENCH_GRID", "6,2,0;6,2,1;6,4,1;8,2,0;8,2,1;8,4,1")
    lanes = 128
    n = 1 << log2n

    rng = np.random.default_rng(0xBEEF)
    cache = pathlib.Path(f"/tmp/msm_tune_pts_{log2n}.npz")
    if cache.exists():
        z = np.load(cache)
        pts, msm_scalars = jnp.asarray(z["pts"]), jnp.asarray(z["scal"])
    else:
        g = hc.g1_generator()
        base_scalars = [
            (int(x) % (R - 1)) + 1 for x in rng.integers(1, 1 << 62, n)
        ]
        step = min(n, 1 << 17)
        g_dev = jnp.broadcast_to(dc.host_point_to_projective(g), (3, 16, step))
        gen = jax.jit(dc.scalar_mul)
        chunks = []
        for s in range(0, n, step):
            part = dc.to_affine(
                gen(g_dev, jnp.asarray(ints_to_limbs(base_scalars[s : s + step]).T))
            )
            chunks.append(np.asarray(part))
        pts_np = np.concatenate(chunks, axis=-1)
        scal_np = np.asarray(
            ints_to_limbs(
                [int(x) % R for x in rng.integers(0, 1 << 63, n)]
            ).T
        )
        np.savez(cache, pts=pts_np, scal=scal_np)
        pts, msm_scalars = jnp.asarray(pts_np), jnp.asarray(scal_np)
    from verkle_kzg_tpu import native

    expect = native.g1_msm(
        dc.affine_to_host_points(pts), limbs_to_ints(np.asarray(msm_scalars).T)
    )
    print(json.dumps({"event": "ready", "n": n}), flush=True)

    import math

    steps = math.ceil(n / lanes)

    def build_prod(k, chunk=None):
        """Production path: in-kernel digits, signed, window-paired, c=8."""
        c = 8
        w = 256 // c

        def fn(p, s):
            acc = dc.infinity((), 1)
            for i in range(k):
                si = jnp.roll(s, i, axis=-1)
                ptsr = jnp.moveaxis(p.reshape(2, L, steps, lanes), 2, 0)
                scr = jnp.moveaxis(si.reshape(L, steps, lanes), 1, 0)
                nwords = dmsm.carry_mask_words(w)
                masks = jnp.moveaxis(
                    dmsm.signed_carries(si, c).reshape(nwords, steps, lanes), 1, 0
                )
                if chunk is None:
                    r = PM._msm_single_fused_sc_signed_impl(ptsr, scr, masks, c)
                else:
                    # bypass the impl's DEFAULT_CHUNK//2 clamp
                    bk = PM._bucket_accumulate_from_scalars_signed_impl(
                        ptsr, scr, masks, c, chunk=chunk
                    )
                    r = PM._single_tail(
                        bk, c, w, False, nbuckets=1 << (c - 1), shifted=True
                    )
                acc = dc.add(acc, r)
            return acc

        return jax.jit(fn)

    def build_group(c, G, fused, k):
        """Digit-tensor signed path through the group kernel."""

        def fn(p, s):
            acc = dc.infinity((), 1)
            w = math.ceil(256 / c)
            for i in range(k):
                si = jnp.roll(s, i, axis=-1)
                ptsr = jnp.moveaxis(p.reshape(2, L, steps, lanes), 2, 0)
                dig = dmsm.window_digits_signed(si, c).reshape(w, steps, lanes)
                acc = dc.add(
                    acc,
                    PM._msm_single_fused_impl(
                        ptsr,
                        dig.astype(jnp.int32),
                        c,
                        chunk=int(os.environ.get("BENCH_CHUNK", "32")),
                        signed=True,
                        wgroup=G,
                        fused=fused,
                    ),
                )
            return acc

        return jax.jit(fn)

    def run(tag, mk):
        f1, fk = mk(1), mk(chain)
        t0 = time.perf_counter()
        r1 = f1(pts, msm_scalars)
        got = dc.projective_to_host_points(r1)[0]
        ok = got == expect
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
                    "kind": tag,
                    "points_per_sec": round(n / per, 1),
                    "msm_s": round(per, 4),
                    "warm_s": round(warm, 1),
                    "bit_exact": bool(ok),
                }
            ),
            flush=True,
        )
        assert ok, f"MISMATCH {tag}"

    prod_chunks = os.environ.get("BENCH_PROD_CHUNKS", "")
    if prod_chunks:
        for ch in (int(x) for x in prod_chunks.split(",")):
            run(
                f"prod_sc_pair_c8_ch{ch}",
                lambda k, ch=ch: build_prod(k, chunk=ch),
            )
        return
    run("prod_sc_pair_c8", build_prod)
    for spec in grid.split(";"):
        c, G, fused = (int(x) for x in spec.split(","))
        run(f"group_c{c}_g{G}_f{fused}", lambda k, c=c, G=G, fused=fused: build_group(c, G, bool(fused), k))


if __name__ == "__main__":
    main()
