"""Bit-exactness of the device limb-plane field kernels vs the hostmath
oracle (which mirrors ark_ff semantics)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from verkle_kzg_tpu.hostmath import field as hf
from verkle_kzg_tpu.ops import field as df
from verkle_kzg_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
from verkle_kzg_tpu.params import Q, R

rng = random.Random(0xF1E1D)

MODS = {"fq": Q, "fr": R}


def rand_elems(n, m):
    return [rng.randrange(m) for _ in range(n)]


@pytest.mark.parametrize("spec", ["fq", "fr"])
def test_add_sub_neg(spec):
    m = MODS[spec]
    a_i = rand_elems(64, m) + [0, m - 1]
    b_i = rand_elems(64, m) + [0, m - 1]
    a = jnp.asarray(ints_to_limbs(a_i))
    b = jnp.asarray(ints_to_limbs(b_i))

    assert limbs_to_ints(df.add(a, b, spec)) == [(x + y) % m for x, y in zip(a_i, b_i)]
    assert limbs_to_ints(df.sub(a, b, spec)) == [(x - y) % m for x, y in zip(a_i, b_i)]
    assert limbs_to_ints(df.neg(a, spec)) == [(-x) % m for x in a_i]


@pytest.mark.parametrize("spec", ["fq", "fr"])
def test_mont_mul_roundtrip(spec):
    m = MODS[spec]
    a_i = rand_elems(32, m) + [0, 1, m - 1]
    b_i = rand_elems(32, m) + [m - 1, 1, 0]
    a = df.to_mont(jnp.asarray(ints_to_limbs(a_i)), spec)
    b = df.to_mont(jnp.asarray(ints_to_limbs(b_i)), spec)

    prod = df.from_mont(df.mont_mul(a, b, spec), spec)
    assert limbs_to_ints(prod) == [x * y % m for x, y in zip(a_i, b_i)]

    # to_mont/from_mont roundtrip
    assert limbs_to_ints(df.from_mont(a, spec)) == a_i


@pytest.mark.parametrize("spec", ["fq", "fr"])
def test_inv(spec):
    m = MODS[spec]
    a_i = rand_elems(9, m) + [0, 1, m - 1]
    a = df.to_mont(jnp.asarray(ints_to_limbs(a_i)), spec)
    inv = df.from_mont(df.inv_mont(a, spec), spec)
    expect = [pow(x, m - 2, m) if x else 0 for x in a_i]
    assert limbs_to_ints(inv) == expect


@pytest.mark.parametrize("spec", ["fq", "fr"])
def test_batch_inv(spec):
    m = MODS[spec]
    a_i = rand_elems(30, m) + [0, 1, 0, m - 1]  # include zeros mid-array
    a = df.to_mont(jnp.asarray(ints_to_limbs(a_i)), spec)
    inv = df.from_mont(df.batch_inv_mont(a, spec), spec)
    expect = [pow(x, m - 2, m) if x else 0 for x in a_i]
    assert limbs_to_ints(inv) == expect


def test_lazy_sum_and_reduce_columns():
    m = R
    n = 1000
    a_i = rand_elems(n, m)
    a = df.to_mont(jnp.asarray(ints_to_limbs(a_i)), "fr")
    s = df.from_mont(df.lazy_sum(a, 0, "fr"), "fr")
    assert limbs_to_ints(s.reshape(1, -1)) == [sum(a_i) % m]


def test_powers_of():
    m = R
    x = rng.randrange(m)
    xs = df.powers_of_mont(df.to_mont(jnp.asarray(ints_to_limbs([x])[0]), "fr"), 17, "fr")
    assert limbs_to_ints(df.from_mont(xs, "fr")) == [pow(x, i, m) for i in range(17)]


def test_jit_and_vmap_compose():
    m = Q
    a_i = rand_elems(8, m)
    b_i = rand_elems(8, m)
    a = df.to_mont(jnp.asarray(ints_to_limbs(a_i)), "fq")
    b = df.to_mont(jnp.asarray(ints_to_limbs(b_i)), "fq")
    f = jax.jit(lambda x, y: df.mont_mul(x, y, "fq"))
    out = jax.vmap(f)(a, b)
    assert limbs_to_ints(df.from_mont(out, "fq")) == [
        x * y % m for x, y in zip(a_i, b_i)
    ]
