"""CRS point generators.

* ``ipa_generate_points``: the nothing-up-my-sleeve hash-to-curve CRS of the
  reference (``vector-commit/src/ipa/ipa_point_generator.rs:36-83``) —
  SHA-256 try-and-increment with default seed "eth_verkle_oct_2021".
* ``kzg_generate_monomial_srs``: the *insecure test-only* trusted setup of
  the reference (``vector-commit/src/kzg/kzg_point_generator.rs:10-51``,
  default secret s = 100): [G, sG, s^2 G, ...]. The secret is exposed so G2
  and the Lagrange SRS can be derived, exactly as the reference's
  ``secret()`` feeds ``kzg/mod.rs:122``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..hostmath.curve import g1_generator, g2_generator, g2_mul
from ..hostmath.hashing import eth_try_and_increment
from ..ops import curve as dc
from ..ops.limbs import ints_to_limbs
from ..params import R

DEFAULT_IPA_SEED = b"eth_verkle_oct_2021"
DEFAULT_KZG_SECRET = 100


def ipa_generate_points(num: int, seed: bytes = DEFAULT_IPA_SEED) -> list:
    """num hash-to-curve points (host affine), bit-compatible with
    IPAPointGenerator::gen."""
    return eth_try_and_increment(seed, num)


def kzg_generate_monomial_srs(num: int, secret: int = DEFAULT_KZG_SECRET) -> list:
    """[s^i * G] computed as one batched device scalar-mul sweep (the
    reference's serial running-multiple loop, ``kzg_point_generator.rs:32-43``,
    re-shaped as a data-parallel kernel; on TPU the whole sweep is a fused
    Mosaic kernel, ops/pallas_curve.py::scalar_mul_affine)."""
    from ..ops.msm import _pallas_mode

    g = g1_generator()
    powers = [1] * num
    for i in range(1, num):
        powers[i] = powers[i - 1] * secret % R
    g_aff = dc.host_points_to_affine([g] * num)
    scalars = jnp.asarray(ints_to_limbs(powers).T)
    mode = _pallas_mode()
    if mode != "off":
        from ..ops import pallas_curve as PC

        pts = PC.scalar_mul_affine(g_aff, scalars, interpret=(mode == "interpret"))
    else:
        pts = jax.jit(dc.scalar_mul)(dc.from_affine(g_aff), scalars)
    return dc.projective_to_host_points(pts)


def kzg_g2(secret: int = DEFAULT_KZG_SECRET):
    return g2_mul(g2_generator(), secret)
