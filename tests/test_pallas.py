"""Pallas kernel correctness: the exact Mosaic kernel logic runs in
interpret mode on CPU and must be bit-identical to the XLA-traced paths
(ops/field.py, ops/curve.py, ops/msm.py's bucket loop).

On TPU these kernels are the production MSM fast path (ops/pallas_msm.py);
bench.py additionally verifies the compiled kernels against the native C++
oracle at scale.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from verkle_kzg_tpu.hostmath import curve as hc
from verkle_kzg_tpu.ops import curve as C
from verkle_kzg_tpu.ops import field as F
from verkle_kzg_tpu.ops import msm
from verkle_kzg_tpu.ops import pallas_curve as PC
from verkle_kzg_tpu.ops import pallas_field as PF
from verkle_kzg_tpu.ops import pallas_msm as PM
from verkle_kzg_tpu.ops.limbs import ints_to_limbs
from verkle_kzg_tpu.params import FQ, FR, R

pytestmark = pytest.mark.slow  # see conftest: default run skips these


L = 16


def _field_batch(fs, n, seed):
    rng = random.Random(seed)
    xs = [rng.getrandbits(256) % fs.modulus for _ in range(n)]
    # adversarial carry values on the first lanes
    xs[:4] = [0, 1, fs.modulus - 1, int("ffff" * 15, 16) % fs.modulus]
    return xs, jnp.asarray(ints_to_limbs(xs).T)


@pytest.mark.parametrize("spec,fs", [("fq", FQ), ("fr", FR)])
def test_pallas_field_matches_xla(spec, fs):
    _, a = _field_batch(fs, 40, 101)
    _, b = _field_batch(fs, 40, 202)
    assert jnp.all(PF.mont_mul(a, b, spec, interpret=True) == F.mont_mul(a, b, spec))
    assert jnp.all(PF.add(a, b, spec, interpret=True) == F.add(a, b, spec))
    assert jnp.all(PF.sub(a, b, spec, interpret=True) == F.sub(a, b, spec))
    assert jnp.all(PF.sub(b, a, spec, interpret=True) == F.sub(b, a, spec))


def _point_batch(n, seed, with_inf=True):
    rng = random.Random(seed)
    pts = [hc.g1_mul(hc.g1_generator(), rng.getrandbits(160)) for _ in range(n)]
    if with_inf:
        pts[1] = None
        pts[-1] = None
    return pts, C.host_points_to_affine(pts)


def test_pallas_curve_matches_xla():
    _, aff1 = _point_batch(24, 7)
    _, aff2 = _point_batch(24, 8)
    p1, p2 = C.from_affine(aff1), C.from_affine(aff2)
    assert jnp.all(PC.add(p1, p2, interpret=True) == C.add(p1, p2))
    assert jnp.all(PC.double(p1, interpret=True) == C.double(p1))
    assert jnp.all(PC.mixed_add(p1, aff2, interpret=True) == C.mixed_add(p1, aff2))
    # doubling through add (p + p) and identity cases ride the same kernel
    assert jnp.all(PC.add(p1, p1, interpret=True) == C.add(p1, p1))
    # leading batch dims
    pw = jnp.stack([p1, p2], axis=0)
    aw = jnp.stack([aff2, aff1], axis=0)
    assert jnp.all(PC.mixed_add(pw, aw, interpret=True) == C.mixed_add(pw, aw))


def test_bucket_accumulate_matches_xla_loop():
    rng = random.Random(33)
    n, lanes, c = 48, 8, 4
    w = -(-256 // c)
    pts_host, aff = _point_batch(n, 9)
    scal_ints = [rng.getrandbits(254) % R for _ in range(n)]
    scal_ints[0] = 0
    scal = jnp.asarray(ints_to_limbs(scal_ints).T)

    steps = n // lanes
    digits = msm.window_digits(scal, c).reshape(w, steps, lanes).astype(jnp.int32)
    pts = aff.reshape(2, L, steps, lanes)

    buckets0 = C.infinity((w, 1 << c), lanes)

    def step(s, buckets):
        d = digits[:, s, :]
        cur = msm._gather_buckets(buckets, d)
        p = jnp.broadcast_to(pts[:, :, s, :][None], (w, 2, L, lanes))
        new = C.mixed_add(cur, p)
        return msm._scatter_buckets(buckets, d, new)

    want = jax.lax.fori_loop(0, steps, step, buckets0)
    got = PM.bucket_accumulate(
        jnp.moveaxis(pts, 2, 0), digits, c, chunk=4, interpret=True
    )
    assert jnp.all(got == want)


@pytest.mark.parametrize("signed,group,fused", [
    (False, 2, True),
    (True, 2, False),
    (True, 2, True),
    (True, 4, True),
    (True, 3, True),  # odd G exercises the inert zero-window padding
])
def test_msm_group_kernel_matches_oracle(signed, group, fused):
    """The G-way interleaved / fused-table-pass accumulation kernel
    (wgroup/fused variants of ops/pallas_msm.py) must produce the same
    group element as the host oracle through the full single-MSM pipeline
    in interpret mode."""
    rng = random.Random(77)
    n, lanes, c = 48, 8, 4
    w = -(-256 // c)
    pts_host, aff = _point_batch(n, 21)
    scal_ints = [rng.getrandbits(254) % R for _ in range(n)]
    scal_ints[0] = 0  # zero scalar: trash bucket unsigned / masked signed
    scal = jnp.asarray(ints_to_limbs(scal_ints).T)
    want = hc.g1_msm_naive(pts_host, scal_ints)

    steps = n // lanes
    dig = (
        msm.window_digits_signed(scal, c)
        if signed
        else msm.window_digits(scal, c)
    )
    digits = dig.reshape(w, steps, lanes).astype(jnp.int32)
    pts_stream = jnp.moveaxis(aff.reshape(2, L, steps, lanes), 2, 0)
    got = PM.msm_single_fused(
        pts_stream, digits, c, chunk=4, interpret=True,
        signed=signed, wgroup=group, fused=fused,
    )
    assert C.projective_to_host_points(got)[0] == want


@pytest.mark.parametrize("signed", [False, True])
def test_msm_batched_pallas_branch(monkeypatch, signed):
    """Drives msm_batched + msm_fixed_base through the FULL pallas branch
    (bucket_accumulate + batched_bucket_tail) in interpret mode — the
    production verkle node-commit path on TPU — against the XLA path and
    the host oracle, with balanced signed digits both off and on.
    Compares canonical affine (the projective representative legitimately
    differs: XLA masks identity-adds, pallas runs complete formulas)."""
    rng = random.Random(55)
    n, b = 64, 4
    monkeypatch.setattr(msm, "_signed_default", lambda: signed)
    affs, scals, hosts, ints_b = [], [], [], []
    for i in range(b):
        host, aff = _point_batch(n, 100 + i)
        affs.append(aff)
        hosts.append(host)
        ints = [rng.getrandbits(254) % R for _ in range(n)]
        ints[i] = 0  # a zero scalar per lane exercises bucket 0
        ints_b.append(ints)
        scals.append(jnp.asarray(ints_to_limbs(ints).T))
    pts = jnp.stack(affs)  # (B, 2, L, N)
    scs = jnp.stack(scals)  # (B, L, N)
    oracle = [hc.g1_msm_naive(h, k) for h, k in zip(hosts, ints_b)]

    monkeypatch.setattr(msm, "_pallas_mode", lambda: "off")
    want_b = C.projective_to_host_points(msm.msm_batched(pts, scs, c=4))
    want_f = C.projective_to_host_points(msm.msm_fixed_base(pts[0], scs, c=4))
    assert want_b == oracle

    monkeypatch.setattr(msm, "_pallas_mode", lambda: "interpret")
    got_b = C.projective_to_host_points(msm.msm_batched(pts, scs, c=4))
    got_f = C.projective_to_host_points(msm.msm_fixed_base(pts[0], scs, c=4))
    assert got_b == want_b
    assert got_f == want_f


def test_msm_pippenger_pallas_vs_host_oracle(monkeypatch):
    monkeypatch.setattr(msm, "_pallas_mode", lambda: "interpret")
    rng = random.Random(44)
    n = 48
    pts_host, aff = _point_batch(n, 10)
    scal_ints = [rng.getrandbits(254) % R for _ in range(n)]
    scal = jnp.asarray(ints_to_limbs(scal_ints).T)

    out = msm.msm_pippenger(aff, scal, c=4, lanes=8)
    got = C.projective_to_host_points(out)[0]

    want = None
    for pt, s in zip(pts_host, scal_ints):
        if pt is None:
            continue
        t = hc.g1_mul(pt, s)
        want = t if want is None else hc.g1_add(want, t)
    assert got == want


def test_msm_pippenger_signed_pallas(monkeypatch):
    """Signed-digit pallas pipelines (in-kernel digit+carry derivation AND
    the digit-tensor variant) vs the host oracle."""
    monkeypatch.setattr(msm, "_pallas_mode", lambda: "interpret")
    rng2 = random.Random(0x516)
    pts = [hc.g1_mul(hc.g1_generator(), rng2.getrandbits(160)) for _ in range(16)]
    pts[3] = None
    ks = [rng2.randrange(R) for _ in range(16)]
    ks[5] = 0
    pa = C.host_points_to_affine(pts)
    s = jnp.asarray(ints_to_limbs(ks).T)
    want = hc.g1_msm_naive(pts, ks)
    # c=8 divides 16 -> in-kernel scalar+mask variant (W=32: 2 carry words)
    got_sc = msm.msm_pippenger(pa, s, c=8, lanes=4, signed=True)
    assert C.projective_to_host_points(got_sc)[0] == want
    # c=4 -> W=64: 3 packed carry words, exercises the word-boundary
    # carry-out read (bit 32 of word 1 for window 31)
    got_c4 = msm.msm_pippenger(pa, s, c=4, lanes=4, signed=True)
    assert C.projective_to_host_points(got_c4)[0] == want
    # c=7 -> digit-tensor signed variant
    got_dg = msm.msm_pippenger(pa, s, c=7, lanes=4, signed=True)
    assert C.projective_to_host_points(got_dg)[0] == want


def test_scalar_mul_affine_kernel():
    """Fused double-and-add kernel vs the XLA scan: BIT-IDENTICAL
    projective representatives (same formula sequence), host cross-check.
    This is the verkle sparse-commit fleet's device path
    (tree.py::_sparse_commit_device_impl)."""
    rng2 = random.Random(0x5CA1)
    pts_host = [
        hc.g1_mul(hc.g1_generator(), rng2.getrandbits(120) + 1) for _ in range(5)
    ]
    pa = C.host_points_to_affine(pts_host)
    ks = [0, 1, R - 1, rng2.randrange(R), rng2.randrange(R)]
    s = jnp.asarray(ints_to_limbs(ks).T)
    ref = C.scalar_mul(C.from_affine(pa), s)
    got = PC.scalar_mul_affine(pa, s, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    assert C.projective_to_host_points(got) == [
        hc.g1_mul(p, k) for p, k in zip(pts_host, ks)
    ]


def test_scalar_mul_affine_infinity_and_batched(monkeypatch):
    """Infinity-sentinel lanes mask to the identity product, and the
    mode-aware small-N batched path (ops/msm.py::_batched_naive_affine)
    matches the XLA path's group elements."""
    monkeypatch.setattr(msm, "_pallas_mode", lambda: "interpret")
    rng2 = random.Random(0xF00)
    pts_host = [hc.g1_mul(hc.g1_generator(), rng2.getrandbits(90) + 1) for _ in range(4)]
    pts_host[2] = None  # infinity sentinel lane
    pa = C.host_points_to_affine(pts_host)
    ks = [rng2.randrange(R) for _ in range(4)]
    got = PC.scalar_mul_affine(pa, jnp.asarray(ints_to_limbs(ks).T), interpret=True)
    want = [None if p is None else hc.g1_mul(p, k) for p, k in zip(pts_host, ks)]
    assert C.projective_to_host_points(got) == want

    # batched (B=2, N=4) small-MSM path vs the XLA reference
    pb = jnp.stack([pa, pa[..., ::-1]])  # (2, 2, L, 4)
    sb = jnp.stack(
        [jnp.asarray(ints_to_limbs(ks).T), jnp.asarray(ints_to_limbs(ks[::-1]).T)]
    )
    got_b = msm._batched_naive_affine(pb, sb)
    ref_b = msm._batched_naive(C.from_affine(pb), sb)
    assert C.projective_to_host_points(got_b) == C.projective_to_host_points(ref_b)
