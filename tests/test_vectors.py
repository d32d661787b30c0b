"""Externally published known-answer vectors.

Round-1 verdict: every bit-exactness claim rested on two same-author
implementations agreeing (hostmath <-> native/vkzg.cpp). These vectors come
from INDEPENDENT published sources, so a shared misunderstanding in either
twin now fails loudly:

  * RFC 9380 Appendix K.1: expand_message_xmd(SHA-256) test vectors —
    anchors ``hostmath/hashing.py::expand_message_xmd`` (the primitive
    under every Fiat-Shamir challenge, ``vector-commit/src/transcript.rs:55``).
  * NIST FIPS 180-4 SHA-256 vectors — anchor the from-scratch SHA-256 in
    ``native/vkzg.cpp`` (via the CRS generator) and hashlib usage parity.
  * alt_bn128 (BN254) small scalar multiples of the generator, as published
    in the EIP-196 ecosystem (py_ecc / go-ethereum precompile tests) —
    anchor ``hostmath/curve.py`` group law and the device curve kernels.
  * BN254 G2 generator coordinates (EIP-197 / py_ecc) — anchor the Fq2
    tower + G2 arithmetic under ``hostmath/pairing.py``.
"""

import numpy as np
import pytest

from verkle_kzg_tpu.hostmath import curve as hc
from verkle_kzg_tpu.hostmath.hashing import expand_message_xmd
from verkle_kzg_tpu.params import Q, R

# ---------------------------------------------------------------------------
# RFC 9380 K.1 — expand_message_xmd(SHA-256)
# DST = "QUUX-V01-CS02-with-expander-SHA256-128"
# ---------------------------------------------------------------------------

_DST = b"QUUX-V01-CS02-with-expander-SHA256-128"

_XMD_VECTORS_32 = [
    (b"", "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"),
    (b"abc", "d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b97902f53a8a0d605615"),
    (
        b"abcdef0123456789",
        "eff31487c770a893cfb36f912fbfcbff40d5661771ca4b2cb4eafe524333f5c1",
    ),
    (
        b"q128_" + b"q" * 128,
        "b23a1d2b4d97b2ef7785562a7e8bac7eed54ed6e97e29aa51bfe3f12ddad1ff9",
    ),
    (
        b"a512_" + b"a" * 512,
        "4623227bcc01293b8c130bf771da8c298dede7383243dc0993d2d94823958c4c",
    ),
]


@pytest.mark.parametrize("msg,expect", _XMD_VECTORS_32)
def test_rfc9380_xmd_sha256_len32(msg, expect):
    got = expand_message_xmd(msg, _DST, 0x20)
    assert got.hex() == expect


def test_rfc9380_xmd_sha256_len128_empty():
    expect = (
        "af84c27ccfd45d41914fdff5df25293e221afc53d8ad2ac06d5e3e29485dadbe"
        "e0d121587713a3e0dd4d5e69e93eb7cd4f5df4cd103e188cf60cb02edc3edf18"
        "eda8576c412b18ffb658e3dd6ec849469b979d444cf7b26911a08e63cf31f9dc"
        "c541708d3491184472c2c29bb749d4286b004ceb5ee6b9a7fa5b646c993f0ced"
    )
    assert expand_message_xmd(b"", _DST, 0x80).hex() == expect


# ---------------------------------------------------------------------------
# NIST FIPS 180-4 SHA-256 known answers (exercised through hashlib here and
# through the from-scratch C++ SHA-256 in test_native.py's CRS cross-check)
# ---------------------------------------------------------------------------


def test_sha256_nist_vectors():
    import hashlib

    assert (
        hashlib.sha256(b"").hexdigest()
        == "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
    assert (
        hashlib.sha256(b"abc").hexdigest()
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert (
        hashlib.sha256(
            b"abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq"
        ).hexdigest()
        == "248d6a61d20638b8e5c026930c3e6039a33ce45964ff2167f6ecedd419db06c1"
    )


# ---------------------------------------------------------------------------
# alt_bn128 G1: published small multiples of the generator (EIP-196 / py_ecc)
# ---------------------------------------------------------------------------

_G = (1, 2)
_2G = (
    1368015179489954701390400359078579693043519447331113978918064868415326638035,
    9918110051302171585080402603319702774565515993150576347155970296011118125764,
)
_3G = (
    3353031288059533942658390886683067124040920775575537747144343083137631628272,
    19321533766552368860946552437480515441416830039777911637913418824951667761761,
)


def test_bn254_g1_small_multiples():
    g = hc.g1_generator()
    assert g == _G
    assert hc.g1_add(g, g) == _2G
    assert hc.g1_add(hc.g1_add(g, g), g) == _3G
    assert hc.g1_mul(g, 2) == _2G
    assert hc.g1_mul(g, 3) == _3G
    # order: r * G = infinity, (r - 1) * G = -G
    assert hc.g1_mul(g, R) is None
    assert hc.g1_mul(g, R - 1) == (1, Q - 2)


def test_bn254_g1_device_small_multiples():
    """Device curve kernels reproduce the published 2G/3G coordinates."""
    from verkle_kzg_tpu.ops import curve as dc
    from verkle_kzg_tpu.ops.limbs import ints_to_limbs

    import jax.numpy as jnp

    g = dc.host_point_to_projective(_G)
    two_g = dc.projective_to_host_points(dc.double(g))[0]
    assert two_g == _2G
    three_g = dc.projective_to_host_points(
        dc.add(dc.double(g), g)
    )[0]
    assert three_g == _3G
    scal = jnp.asarray(ints_to_limbs([3]).T)
    assert dc.projective_to_host_points(dc.scalar_mul(g, scal))[0] == _3G


# ---------------------------------------------------------------------------
# BN254 G2 generator (EIP-197 / py_ecc): x = x0 + x1*u, y = y0 + y1*u
# ---------------------------------------------------------------------------

_G2_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
_G2_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)


def test_bn254_g2_generator_matches_published():
    gx, gy = hc.g2_generator()
    assert (gx.c0, gx.c1) == _G2_X
    assert (gy.c0, gy.c1) == _G2_Y


def test_pairing_bilinearity_on_published_points():
    """e(2G, G2) == e(G, G2)^2 == e(G, 2*G2): binds the pairing to the
    published generator and 2G coordinates."""
    from verkle_kzg_tpu.hostmath import pairing

    g2 = hc.g2_generator()
    e_g = pairing.pairing(_G, g2)
    e_2g = pairing.pairing(_2G, g2)
    assert e_2g == e_g * e_g
    assert pairing.pairing(_G, hc.g2_add(g2, g2)) == e_2g
