"""Pippenger MSM vs the naive oracle and hostmath (limb-major layout)."""

import random

import jax
import jax.numpy as jnp
import pytest

from verkle_kzg_tpu.hostmath import curve as hc
from verkle_kzg_tpu.ops import curve as dc
from verkle_kzg_tpu.ops import msm as dmsm
from verkle_kzg_tpu.ops.limbs import ints_to_limbs
from verkle_kzg_tpu.params import R

rng = random.Random(0x4D534D)


def setup_case(n, include_edge=True):
    g = hc.g1_generator()
    pts = [hc.g1_mul(g, rng.randrange(1, R)) for _ in range(n)]
    ks = [rng.randrange(R) for _ in range(n)]
    if include_edge and n >= 4:
        pts[1] = None  # infinity point in the input
        ks[2] = 0  # zero scalar
        ks[3] = R - 1  # max scalar
    expect = hc.g1_msm_naive(pts, ks)
    return pts, ks, expect


def test_msm_naive_oracle():
    pts, ks, expect = setup_case(6)
    p = dc.from_affine(dc.host_points_to_affine(pts))
    s = jnp.asarray(ints_to_limbs(ks).T)
    out = dmsm.msm_naive(p, s)
    assert dc.projective_to_host_points(out)[0] == expect


@pytest.mark.parametrize("n,c,lanes", [(7, 8, 2), (33, 5, 8)])
def test_msm_pippenger(n, c, lanes):
    pts, ks, expect = setup_case(n)
    pa = dc.host_points_to_affine(pts)
    s = jnp.asarray(ints_to_limbs(ks).T)
    fn = jax.jit(lambda p, k: dmsm.msm_pippenger(p, k, c=c, lanes=lanes))
    out = fn(pa, s)
    assert dc.projective_to_host_points(out)[0] == expect


def test_msm_batched():
    cases = [setup_case(8, include_edge=(i % 2 == 0)) for i in range(3)]
    pa = jnp.stack([dc.host_points_to_affine(c[0]) for c in cases])
    s = jnp.stack([jnp.asarray(ints_to_limbs(c[1]).T) for c in cases])
    out = jax.jit(lambda p, k: dmsm.msm_batched(p, k, c=8))(pa, s)
    assert out.shape == (3, 16, 3)
    got = dc.projective_to_host_points(out)
    assert got == [c[2] for c in cases]


def test_msm_fixed_base():
    pts, _, _ = setup_case(8, include_edge=False)
    pa = dc.host_points_to_affine(pts)
    kss = [[rng.randrange(R) for _ in range(8)] for _ in range(2)]
    s = jnp.stack([jnp.asarray(ints_to_limbs(ks).T) for ks in kss])
    out = jax.jit(lambda p, k: dmsm.msm_fixed_base(p, k))(pa, s)
    got = dc.projective_to_host_points(out)
    assert got == [hc.g1_msm_naive(pts, ks) for ks in kss]
