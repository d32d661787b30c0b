"""NTT/INTT over Fr and G1 vs naive host DFT oracles."""

import random

import jax.numpy as jnp
import pytest

from verkle_kzg_tpu.hostmath import curve as hc
from verkle_kzg_tpu.ops import curve as dc
from verkle_kzg_tpu.ops import field as df
from verkle_kzg_tpu.ops import ntt as dntt
from verkle_kzg_tpu.ops.limbs import ints_to_limbs
from verkle_kzg_tpu.params import R, fr_root_of_unity

rng = random.Random(0x17A0)

N = 8


def naive_dft(coeffs, n):
    w = fr_root_of_unity(n)
    return [
        sum(c * pow(w, i * j, R) for j, c in enumerate(coeffs)) % R for i in range(n)
    ]


def test_ntt_fr_roundtrip():
    from verkle_kzg_tpu.ops.limbs import limbs_to_ints
    import numpy as np

    coeffs = [rng.randrange(R) for _ in range(N)]
    x = df.to_mont(jnp.asarray(ints_to_limbs(coeffs).T), "fr")  # (L, N)

    evals = dntt.ntt_fr(x)
    got = limbs_to_ints(np.asarray(df.from_mont(evals, "fr")).T)
    assert got == naive_dft(coeffs, N)

    back = dntt.intt_fr(evals)
    assert limbs_to_ints(np.asarray(df.from_mont(back, "fr")).T) == coeffs


def test_ntt_g1_matches_field_dft():
    """G1 NTT of [c_i * G] must equal [DFT(c)_i * G]."""
    g = hc.g1_generator()
    coeffs = [rng.randrange(R) for _ in range(N)]
    pts = [hc.g1_mul(g, c) for c in coeffs]
    x = dc.from_affine(dc.host_points_to_affine(pts))

    evals = dntt.ntt_g1(x)
    got = dc.projective_to_host_points(evals)
    expect = [hc.g1_mul(g, e) for e in naive_dft(coeffs, N)]
    assert got == expect

    back = dntt.intt_g1(evals)
    assert dc.projective_to_host_points(back) == pts
