"""Device G1 kernels vs the hostmath oracle, including all the complete-
formula edge cases (identity, doubling via add, inverse pairs)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from verkle_kzg_tpu.hostmath import curve as hc
from verkle_kzg_tpu.ops import curve as dc
from verkle_kzg_tpu.ops import field as df
from verkle_kzg_tpu.ops.limbs import ints_to_limbs
from verkle_kzg_tpu.params import R

rng = random.Random(0xC0FFEE)


def rand_points(n):
    g = hc.g1_generator()
    return [hc.g1_mul(g, rng.randrange(1, R)) for _ in range(n)]


def test_affine_projective_roundtrip():
    pts = rand_points(5) + [None, hc.g1_generator()]
    a = dc.host_points_to_affine(pts)
    p = dc.from_affine(a)
    back = dc.projective_to_host_points(p)
    assert back == pts


def test_add_double_edge_cases():
    g = hc.g1_generator()
    p1 = rand_points(4)
    p2 = rand_points(4)
    cases = list(zip(p1, p2))
    cases += [
        (None, None),
        (None, g),
        (g, None),
        (g, g),  # doubling through add
        (g, hc.g1_neg(g)),  # P + (-P) = infinity
        (p1[0], p1[0]),
        (p1[0], hc.g1_neg(p1[0])),
    ]
    lhs = dc.from_affine(dc.host_points_to_affine([c[0] for c in cases]))
    rhs = dc.from_affine(dc.host_points_to_affine([c[1] for c in cases]))

    out = dc.projective_to_host_points(dc.add(lhs, rhs))
    expect = [hc.g1_add(a, b) for a, b in cases]
    assert out == expect

    out2 = dc.projective_to_host_points(dc.double(lhs))
    expect2 = [hc.g1_add(a, a) for a, _ in cases]
    assert out2 == expect2


def test_mixed_add():
    g = hc.g1_generator()
    ps = rand_points(3) + [None, g, g]
    qs = rand_points(3) + [g, None, hc.g1_neg(g)]
    p = dc.from_affine(dc.host_points_to_affine(ps))
    q = dc.host_points_to_affine(qs)
    out = dc.projective_to_host_points(dc.mixed_add(p, q))
    assert out == [hc.g1_add(a, b) for a, b in zip(ps, qs)]


def test_scalar_mul():
    g = hc.g1_generator()
    pts = [g, rand_points(1)[0], None, g]
    ks = [rng.randrange(R), rng.randrange(R), 12345, 0]
    p = dc.from_affine(dc.host_points_to_affine(pts))
    scalars = jnp.asarray(ints_to_limbs(ks).T)
    out = dc.projective_to_host_points(dc.scalar_mul(p, scalars))
    assert out == [hc.g1_mul(pt, k) for pt, k in zip(pts, ks)]


def test_eq_and_neg():
    pts = rand_points(3) + [None]
    p = dc.from_affine(dc.host_points_to_affine(pts))
    assert bool(jnp.all(dc.eq(p, p)))
    negp = dc.neg(p)
    expect = [hc.g1_neg(x) for x in pts]
    assert dc.projective_to_host_points(negp) == expect
    # -infinity == infinity, -P != P for real points
    same = dc.eq(p, negp)
    assert list(np.asarray(same)) == [False, False, False, True]


def test_layout_shapes():
    pts = rand_points(5)
    a = dc.host_points_to_affine(pts)
    assert a.shape == (2, 16, 5)
    p = dc.from_affine(a)
    assert p.shape == (3, 16, 5)
