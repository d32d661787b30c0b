"""Native C++ host runtime vs the python hostmath oracle."""

import random

import pytest

from verkle_kzg_tpu import native
from verkle_kzg_tpu.hostmath import curve as hc
from verkle_kzg_tpu.hostmath.hashing import eth_try_and_increment
from verkle_kzg_tpu.params import R

rng = random.Random(0xAB1E)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_native_msm_matches_hostmath():
    g = hc.g1_generator()
    pts = [hc.g1_mul(g, rng.randrange(1, R)) for _ in range(20)]
    pts[3] = None
    ks = [rng.randrange(R) for _ in range(20)]
    ks[5] = 0
    assert native.g1_msm(pts, ks) == hc.g1_msm_naive(pts, ks)


def test_native_scalar_mul_batch():
    g = hc.g1_generator()
    pts = [g, hc.g1_mul(g, 7), None]
    ks = [rng.randrange(R), 0, 5]
    assert native.g1_scalar_mul_batch(pts, ks) == [
        hc.g1_mul(p, k) for p, k in zip(pts, ks)
    ]


def test_native_ipa_crs_bit_exact():
    seed = b"eth_verkle_oct_2021"
    assert native.ipa_crs(seed, 6) == eth_try_and_increment(seed, 6)


def test_native_kzg_srs():
    g = hc.g1_generator()
    out = native.kzg_monomial_srs(g, 100, 5)
    expect = [hc.g1_mul(g, pow(100, i, R)) for i in range(5)]
    assert out == expect
