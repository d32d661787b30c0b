"""Bit-exactness of the device limb-plane field kernels vs the hostmath
oracle (which mirrors ark_ff semantics). Layout: (L, N), elements in lanes."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from verkle_kzg_tpu.ops import field as df
from verkle_kzg_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
from verkle_kzg_tpu.params import Q, R

rng = random.Random(0xF1E1D)

MODS = {"fq": Q, "fr": R}


def rand_elems(n, m):
    return [rng.randrange(m) for _ in range(n)]


def to_dev(xs):
    return jnp.asarray(ints_to_limbs(xs).T)  # (L, N)


def to_ints(a):
    return limbs_to_ints(np.asarray(a).T)


@pytest.mark.parametrize("spec", ["fq", "fr"])
def test_add_sub_neg(spec):
    m = MODS[spec]
    a_i = rand_elems(64, m) + [0, m - 1]
    b_i = rand_elems(64, m) + [0, m - 1]
    a, b = to_dev(a_i), to_dev(b_i)

    assert to_ints(df.add(a, b, spec)) == [(x + y) % m for x, y in zip(a_i, b_i)]
    assert to_ints(df.sub(a, b, spec)) == [(x - y) % m for x, y in zip(a_i, b_i)]
    assert to_ints(df.neg(a, spec)) == [(-x) % m for x in a_i]


@pytest.mark.parametrize("spec", ["fq", "fr"])
def test_mont_mul_roundtrip(spec):
    m = MODS[spec]
    a_i = rand_elems(32, m) + [0, 1, m - 1]
    b_i = rand_elems(32, m) + [m - 1, 1, 0]
    a = df.to_mont(to_dev(a_i), spec)
    b = df.to_mont(to_dev(b_i), spec)

    prod = df.from_mont(df.mont_mul(a, b, spec), spec)
    assert to_ints(prod) == [x * y % m for x, y in zip(a_i, b_i)]
    assert to_ints(df.from_mont(a, spec)) == a_i


@pytest.mark.parametrize("spec", ["fq", "fr"])
def test_inv(spec):
    m = MODS[spec]
    a_i = rand_elems(9, m) + [0, 1, m - 1]
    a = df.to_mont(to_dev(a_i), spec)
    inv = df.from_mont(df.inv_mont(a, spec), spec)
    assert to_ints(inv) == [pow(x, m - 2, m) if x else 0 for x in a_i]


@pytest.mark.parametrize("spec", ["fq", "fr"])
def test_batch_inv_lanes(spec):
    m = MODS[spec]
    # > 128 elements exercises the lane-chunked path, zeros mid-array
    a_i = rand_elems(140, m)
    a_i[3] = 0
    a_i[130] = 0
    a = df.to_mont(to_dev(a_i), spec)
    inv = df.from_mont(df.batch_inv_mont(a, spec, axis=-1), spec)
    assert to_ints(inv) == [pow(x, m - 2, m) if x else 0 for x in a_i]


def test_batch_inv_lead_axis():
    m = R
    a_i = rand_elems(12, m)
    a = df.to_mont(to_dev(a_i), "fr")  # (L, 12)
    stacked = jnp.moveaxis(a, -1, 0)[:, :, None]  # (12, L, 1)
    inv = df.from_mont(df.batch_inv_mont(stacked, "fr", axis=0), "fr")
    got = [limbs_to_ints(np.asarray(inv[i]).T)[0] for i in range(12)]
    assert got == [pow(x, m - 2, m) for x in a_i]


def test_lazy_sums():
    m = R
    n = 1000
    a_i = rand_elems(n, m)
    a = df.to_mont(to_dev(a_i), "fr")
    s = df.from_mont(df.lazy_sum_lanes(a, "fr"), "fr")
    assert to_ints(s) == [sum(a_i) % m]

    stacked = jnp.moveaxis(a, -1, 0)[:, :, None]  # (n, L, 1)
    s2 = df.from_mont(df.lazy_sum(stacked, 0, "fr"), "fr")
    assert to_ints(s2) == [sum(a_i) % m]


def test_powers_of():
    m = R
    x = rng.randrange(m)
    x_mont = df.to_mont(to_dev([x]), "fr")[:, 0]
    xs = df.powers_of_mont(x_mont, 17, "fr")  # (L, 17)
    assert to_ints(df.from_mont(xs, "fr")) == [pow(x, i, m) for i in range(17)]


def test_jit_and_vmap_compose():
    m = Q
    a_i = rand_elems(8, m)
    b_i = rand_elems(8, m)
    a = df.to_mont(to_dev(a_i), "fq")[None]  # (1, L, 8)
    b = df.to_mont(to_dev(b_i), "fq")[None]
    f = jax.jit(lambda x, y: df.mont_mul(x, y, "fq"))
    out = jax.vmap(f)(a, b)
    assert to_ints(df.from_mont(out[0], "fq")) == [
        x * y % m for x, y in zip(a_i, b_i)
    ]
