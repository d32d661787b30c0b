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


@pytest.mark.slow
def test_msm_donated_twins_match():
    """The donate_argnums twins (pallas_msm.bucket_accumulate_donated /
    batched_bucket_tail_donated — SURVEY §5 aliasing row) must return the
    same buckets/points as the plain entry points. Donation only releases
    the INPUT buffers (no-op on CPU, buffer reuse on TPU); each call below
    gets fresh stream arrays, as the production callers guarantee."""
    from verkle_kzg_tpu.ops import pallas_msm as PM

    n, b, c = 8, 4, 4
    cases = [setup_case(n, include_edge=(i == 0)) for i in range(b)]
    pts = jnp.stack([dc.host_points_to_affine(cs[0]) for cs in cases])
    scs = jnp.stack([jnp.asarray(ints_to_limbs(cs[1]).T) for cs in cases])

    def streams():
        ps = jnp.moveaxis(pts, (0, 3), (3, 0))  # (N, 2, L, B)
        dg = jnp.moveaxis(dmsm.window_digits(scs, c), -1, 1).astype(jnp.int32)
        return jnp.array(ps), jnp.array(dg)  # fresh buffers per call

    ps, dg = streams()
    want = PM.bucket_accumulate(ps, dg, c, interpret=True)
    ps, dg = streams()
    got = PM.bucket_accumulate_donated(ps, dg, c, interpret=True)
    assert jnp.all(want == got)

    tail_want = PM.batched_bucket_tail(want, c, interpret=True)
    tail_got = PM.batched_bucket_tail_donated(jnp.array(got), c, interpret=True)
    assert jnp.all(tail_want == tail_got)
    assert dc.projective_to_host_points(tail_got) == [cs[2] for cs in cases]


def test_msm_pippenger_signed_matches_unsigned():
    """Balanced signed-digit windows (bucket |d|, negated y for d < 0) must
    give the same group element as unsigned digits and the naive oracle."""
    pts, ks, expect = setup_case(40)
    pa = dc.host_points_to_affine(pts)
    s = jnp.asarray(ints_to_limbs(ks).T)
    uns = jax.jit(
        lambda p, k: dmsm.msm_pippenger(p, k, c=8, lanes=8, signed=False)
    )(pa, s)
    sgn = jax.jit(
        lambda p, k: dmsm.msm_pippenger(p, k, c=8, lanes=8, signed=True)
    )(pa, s)
    assert dc.projective_to_host_points(uns)[0] == expect
    assert dc.projective_to_host_points(sgn)[0] == expect
