"""Measured numbers for the five BASELINE.md configs. Prints one JSON line
per measurement. Run on the target device (TPU by default; force CPU via
jax_platforms). Sizes tunable via env to keep smoke runs cheap.

Timing method: the TPU tunnel has ~50-100 ms dispatch overhead and an
unreliable block_until_ready, so device-dominated metrics are timed as
(time of K chained calls - time of 1 call) / (K - 1) with a forced host
transfer at the end of each timed program (see bench.py).
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
import random
import time

import numpy as np

import jax
import jax.numpy as jnp

import pathlib

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

rng = random.Random(0xBE7C)


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 3), "unit": unit, **extra}), flush=True)


def t_wall(fn, reps=3):
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def bench_kzg():
    """Config 1: KZG commit+open+verify, domain 256."""
    from verkle_kzg_tpu.poly import FrVector
    from verkle_kzg_tpu.schemes import KZG, kzg_setup

    n = int(os.environ.get("BENCH_KZG_N", "256"))
    crs = kzg_setup(n)
    data = FrVector.from_ints([rng.randrange(1, 2**63) for _ in range(n)], crs.domain)
    c = KZG.commit(crs, data)  # warm/compile
    emit("kzg_commit_sec", t_wall(lambda: KZG.commit(crs, data)), "s", n=n)
    p = KZG.prove(crs, c, 3, data)
    emit("kzg_prove_sec", t_wall(lambda: KZG.prove(crs, c, 3, data)), "s", n=n)
    KZG.verify(crs, c, 3, p)  # warm (compile) before timing
    emit("kzg_verify_sec", t_wall(lambda: KZG.verify(crs, c, 3, p), reps=1), "s", n=n)
    return crs


def bench_kzg_setup():
    """Config 1b: CRS/SRS generation throughput at the reference's bench
    sizes (``benches/kzg.rs:45-59`` measures setup at {32,2048,4096,16384})."""
    from verkle_kzg_tpu.schemes import kzg_setup

    sizes = [int(x) for x in os.environ.get(
        "BENCH_SETUP_SIZES", "32,2048,4096,16384").split(",")]
    for n in sizes:
        kzg_setup(n)  # warm/compile the scalar-mul program for this shape
        dt = t_wall(lambda: kzg_setup(n), reps=1)
        emit("kzg_crs_setup_sec", dt, "s", n=n,
             elements_per_sec=round(n / dt, 1))


def bench_ipa():
    """Config 2: IPA commit+prove+verify, domain 256, in-domain point 3
    AND the out-of-domain point (``benches/ipa.rs:94-97``:
    ipa_prove_single_out_domain proves at z = domain size)."""
    from verkle_kzg_tpu.poly import FrVector
    from verkle_kzg_tpu.schemes import IPA, ipa_setup

    n = int(os.environ.get("BENCH_IPA_N", "256"))
    crs = ipa_setup(n)
    data = FrVector.from_ints([rng.randrange(1, 2**63) for _ in range(n)], crs.domain)
    c = IPA.commit(crs, data)
    emit("ipa_commit_sec", t_wall(lambda: IPA.commit(crs, data)), "s", n=n)
    pr = IPA.prove(crs, c, 3, data)
    emit("ipa_prove_sec", t_wall(lambda: IPA.prove(crs, c, 3, data)), "s", n=n)
    pro = IPA.prove(crs, c, n, data)  # out-of-domain (barycentric b vector)
    emit("ipa_prove_out_domain_sec", t_wall(lambda: IPA.prove(crs, c, n, data)),
         "s", n=n, z=n)
    IPA.verify(crs, c, 3, pr)  # warm (compile) before timing
    emit("ipa_verify_sec", t_wall(lambda: IPA.verify(crs, c, 3, pr)), "s", n=n)
    emit("ipa_verify_out_domain_sec",
         t_wall(lambda: IPA.verify(crs, c, n, pro)), "s", n=n, z=n)
    return crs, data, c


def bench_multiproof(ipa_state):
    """Config 3: M-query multiproof (default 1024) over domain 256."""
    from verkle_kzg_tpu.poly import FrVector
    from verkle_kzg_tpu.schemes import IPA, ProverQuery, prove_multiproof, verify_multiproof

    crs, data, c = ipa_state
    n = crs.domain.size
    vals = data.to_ints()
    # the reference harness measures M in {4096, 16384, 32768}
    # (``benches/ipa.rs:19,111-159``); default covers that plus round-1's 1024
    for m in (int(x) for x in os.environ.get("BENCH_MP_M", "1024,4096,16384,32768").split(",")):
        queries = []
        for i in range(m):
            z = rng.randrange(n)
            queries.append(ProverQuery(data=data, commit=c, z=z, y=vals[z]))
        proof = prove_multiproof(IPA, crs, queries)  # warm
        dt = t_wall(lambda: prove_multiproof(IPA, crs, queries), reps=1)
        emit("multiproof_prove_sec", dt, "s", m=m, queries_per_sec=round(m / dt, 1))
        vq = [q.to_verifier_query() for q in queries]
        dt = t_wall(lambda: verify_multiproof(IPA, crs, vq, proof), reps=1)
        emit("multiproof_verify_sec", dt, "s", m=m)


def bench_verkle():
    """Config 4: verkle build + prove (default 10k leaves, width-256).
    BENCH_VERKLE_KEYLEN=32 selects the Ethereum geometry (32-unit keys,
    ext_width 256): extensions then sit under depth-2 internal nodes with
    full 32-unit stems bound in slot 1."""
    from verkle_kzg_tpu.schemes import KZG, kzg_setup
    from verkle_kzg_tpu.verkle import VerkleTree

    leaves = int(os.environ.get("BENCH_VERKLE_LEAVES", "10000"))
    key_len = int(os.environ.get("BENCH_VERKLE_KEYLEN", "3"))
    crs = kzg_setup(256)
    t = VerkleTree(KZG, crs, key_len=key_len, ext_width=256)
    # Distinct (unit0, unit1) pairs: the reference's trie layout is only
    # self-consistent when sibling stems diverge one level below their
    # parent (SURVEY.md §5 / tree.py docstring), so enumerate a grid.
    assert leaves <= 256 * 256
    tail = tuple((11 * j) % 256 for j in range(key_len - 3))
    keys = [(i // 256, i % 256, (i * 7) % 256) + tail for i in range(leaves)]
    t0 = time.perf_counter()
    for k in keys:
        t.insert_single(k, rng.randrange(1 << 256))
    insert_dt = time.perf_counter() - t0
    emit("verkle_insert_sec", insert_dt, "s", leaves=leaves, key_len=key_len)

    t0 = time.perf_counter()
    t.commitment()
    dt = time.perf_counter() - t0
    emit("verkle_commit_sec", dt, "s", leaves=leaves, key_len=key_len, leaves_per_sec=round(leaves / dt, 1))

    sample = keys[:: max(1, len(keys) // 16)][:16]
    t0 = time.perf_counter()
    proof = t.prove_keys(sample)
    emit("verkle_prove16_sec", time.perf_counter() - t0, "s", keys=len(sample), key_len=key_len)


def bench_msm_sweep():
    """Config 5: MSM sweep (default 2^16..2^20), single device."""
    from verkle_kzg_tpu.hostmath import curve as hc
    from verkle_kzg_tpu.ops import curve as dc
    from verkle_kzg_tpu.ops import msm as dmsm
    from verkle_kzg_tpu.ops.limbs import ints_to_limbs
    from verkle_kzg_tpu.params import R

    lo = int(os.environ.get("BENCH_MSM_LO", "16"))
    hi = int(os.environ.get("BENCH_MSM_HI", "22"))
    lanes = int(os.environ.get("BENCH_LANES", "128"))
    c_env = os.environ.get("BENCH_WINDOW_C", "")
    c = int(c_env) if c_env else None  # None -> mode-aware default (ops/msm._auto_c)
    nrng = np.random.default_rng(7)

    gen_chunk = 1 << int(os.environ.get("BENCH_GEN_CHUNK_LOG2", "17"))
    for logn in range(lo, hi + 1):
        n = 1 << logn
        base = [(int(x) % (R - 1)) + 1 for x in nrng.integers(1, 1 << 62, n)]
        # generate points in chunks: one giant scalar-mul dispatch can trip
        # the TPU tunnel's RPC deadline and crash the worker
        step = min(n, gen_chunk)
        g_dev = jnp.broadcast_to(
            dc.host_point_to_projective(hc.g1_generator()), (3, 16, step)
        )
        gen = jax.jit(dc.scalar_mul)
        chunks = []
        for s in range(0, n, step):
            part = dc.to_affine(gen(g_dev, jnp.asarray(ints_to_limbs(base[s : s + step]).T)))
            chunks.append(np.asarray(part))
        pts = jnp.asarray(np.concatenate(chunks, axis=-1))
        scal = jnp.asarray(
            ints_to_limbs([int(x) % R for x in nrng.integers(0, 1 << 63, n)]).T
        )

        def chained(k):
            def fn(p, s):
                acc = dc.infinity((), 1)
                for i in range(k):
                    acc = dc.add(acc, dmsm.msm_pippenger(p, jnp.roll(s, i, -1), c=c, lanes=lanes))
                return acc
            return jax.jit(fn)

        f1, f3 = chained(1), chained(3)
        np.asarray(f1(pts, scal)); np.asarray(f3(pts, scal))
        t1 = t_wall(lambda: np.asarray(f1(pts, scal)), reps=2)
        t3 = t_wall(lambda: np.asarray(f3(pts, scal)), reps=2)
        per = max(t3 - t1, 1e-9) / 2
        # emit the RESOLVED window width (c=None means "mode-aware default";
        # recording the concrete value keeps cross-mode runs comparable)
        emit(
            "msm_points_per_sec", n / per, "points/s",
            log2n=logn, c=dmsm._auto_c(n, c), lanes=lanes,
        )


if __name__ == "__main__":
    which = os.environ.get("BENCH_ONLY", "kzg,setup,ipa,multiproof,verkle,msm").split(",")
    ipa_state = None
    if "kzg" in which:
        bench_kzg()
    if "setup" in which:
        bench_kzg_setup()
    if "ipa" in which or "multiproof" in which:
        ipa_state = bench_ipa()
    if "multiproof" in which:
        bench_multiproof(ipa_state)
    if "verkle" in which:
        bench_verkle()
    if "msm" in which:
        bench_msm_sweep()
