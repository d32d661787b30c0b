"""Oracle-layer tests: group laws, pairing bilinearity, serialization
round-trips, RFC-9380 known-answer vectors, hash-to-curve determinism."""

import hashlib
import random

import pytest

from verkle_kzg_tpu.hostmath import curve, field, hashing, pairing, serialize
from verkle_kzg_tpu.params import B, Q, R, fr_root_of_unity

rng = random.Random(0xBEEF)


def test_g1_group_laws():
    g = curve.g1_generator()
    assert curve.g1_is_on_curve(g)
    a, b = rng.randrange(R), rng.randrange(R)
    pa, pb = curve.g1_mul(g, a), curve.g1_mul(g, b)
    assert curve.g1_is_on_curve(pa)
    # commutativity + distributivity
    assert curve.g1_add(pa, pb) == curve.g1_add(pb, pa)
    assert curve.g1_add(pa, pb) == curve.g1_mul(g, (a + b) % R)
    # identity & inverse
    assert curve.g1_add(pa, None) == pa
    assert curve.g1_add(pa, curve.g1_neg(pa)) is None
    # order
    assert curve.g1_mul(g, R) is None


def test_g2_group_laws():
    h = curve.g2_generator()
    assert curve.g2_is_on_curve(h)
    a = rng.randrange(R)
    ha = curve.g2_mul(h, a)
    assert curve.g2_is_on_curve(ha)
    assert curve.g2_mul(h, R) is None
    assert curve.g2_add(ha, curve.g2_neg(ha)) is None


def test_fq12_tower():
    x = field.Fq12(
        field.Fq6(field.Fq2(3, 5), field.Fq2(7, 11), field.Fq2(13, 17)),
        field.Fq6(field.Fq2(19, 23), field.Fq2(29, 31), field.Fq2(37, 41)),
    )
    assert x * x.inv() == field.Fq12.one()
    assert x.pow(Q**12 - 1) == field.Fq12.one()  # multiplicative group order


def test_pairing_bilinearity():
    g = curve.g1_generator()
    h = curve.g2_generator()
    e_gh = pairing.pairing(g, h)
    assert e_gh != field.Fq12.one()  # non-degenerate
    assert e_gh.pow(R) == field.Fq12.one()  # lands in mu_r

    a, b = 5, 7
    lhs = pairing.pairing(curve.g1_mul(g, a), curve.g2_mul(h, b))
    assert lhs == e_gh.pow(a * b)
    # linearity in G1 slot
    assert pairing.pairing(curve.g1_mul(g, a), h) == e_gh.pow(a)
    # infinity slots
    assert pairing.pairing(None, h) == field.Fq12.one()


def test_pairing_product_check():
    # e(aG, H) * e(-G, aH) == 1  (the KZG-style product identity)
    g, h = curve.g1_generator(), curve.g2_generator()
    a = 123456789
    out = pairing.multi_pairing(
        [(curve.g1_mul(g, a), h), (curve.g1_neg(g), curve.g2_mul(h, a))]
    )
    assert out == field.Fq12.one()


def test_g1_serialize_roundtrip():
    g = curve.g1_generator()
    for k in [1, 2, 3, rng.randrange(R)]:
        p = curve.g1_mul(g, k)
        b = serialize.g1_to_compressed_bytes(p)
        assert len(b) == 32
        assert serialize.g1_from_compressed_bytes(b) == p
    # infinity
    b = serialize.g1_to_compressed_bytes(None)
    assert b[31] == 0x40 and all(x == 0 for x in b[:31])
    assert serialize.g1_from_compressed_bytes(b) is None


def test_g1_generator_known_encoding():
    # arkworks encodes G1 generator (1, 2): y=2 < -2, so positive flag (0x00)
    b = serialize.g1_to_compressed_bytes(curve.g1_generator())
    assert b == (1).to_bytes(32, "little")


def test_expand_message_xmd_rfc9380_vectors():
    # RFC 9380 appendix K.1 (SHA-256, DST "QUUX-V01-CS02-with-expander-SHA256-128")
    dst = b"QUUX-V01-CS02-with-expander-SHA256-128"
    out = hashing.expand_message_xmd(b"", dst, 0x20)
    assert out.hex() == (
        "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"
    )
    out = hashing.expand_message_xmd(b"abc", dst, 0x20)
    assert out.hex() == (
        "d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b97902f53a8a0d605615"
    )
    out = hashing.expand_message_xmd(b"abc", dst, 0x80)
    assert out.hex() == (
        "abba86a6129e366fc877aab32fc4ffc70120d8996c88aee2fe4b32d6c7b6437a"
        "647e6c3163d40b76a73cf6a5674ef1d890f95b664ee0afa5359a5c4e07985635"
        "bbecbac65d747d3d2da7ec2b8221b17b0ca9dc8a1ac1c07ea6a1e60583e2cb00"
        "058e77b7b72a298425cd1b941ad4ec65e8afc50303a22c0f99b0509b4c895f40"
    )


def test_hash_to_fr_in_range_and_deterministic():
    xs = hashing.hash_to_fr(b"hello", b"ipa", 3)
    assert xs == hashing.hash_to_fr(b"hello", b"ipa", 3)
    assert all(0 <= x < R for x in xs)
    assert len(set(xs)) == 3


def test_eth_hash_to_curve_points_valid_and_deterministic():
    seed = b"eth_verkle_oct_2021"
    pts = hashing.eth_try_and_increment(seed, 9)
    assert pts == hashing.eth_try_and_increment(seed, 9)
    for p in pts:
        assert p is not None and curve.g1_is_on_curve(p)
    # distinct points
    assert len({p for p in pts}) == 9


def test_eth_hash_to_curve_matches_manual_sha():
    # reproduce one accepted candidate by hand
    seed = b"eth_verkle_oct_2021"
    i = 0
    while True:
        digest = hashlib.sha256(seed + i.to_bytes(8, "little")).digest()
        pt = serialize.g1_from_random_bytes(digest)
        if pt is not serialize.PARSE_FAILURE:
            break
        i += 1
    assert hashing.eth_try_and_increment(seed, 1)[0] == pt


def test_from_random_bytes_flag_semantics():
    # craft bytes with known x on curve and each flag combo
    x = 1  # generator x; y in {2, q-2}
    base = bytearray(x.to_bytes(32, "little"))
    # no flags -> greatest y
    p = serialize.g1_from_random_bytes(bytes(base))
    assert p == (1, Q - 2)
    # negative flag -> smaller y
    base[31] |= 0x80
    p = serialize.g1_from_random_bytes(bytes(base))
    assert p == (1, 2)
    # both flags -> failure
    base[31] |= 0x40
    assert serialize.g1_from_random_bytes(bytes(base)) is serialize.PARSE_FAILURE
    # infinity flag + x=0 -> infinity
    assert serialize.g1_from_random_bytes(bytes(31) + b"\x40") is None


def test_root_of_unity():
    for size in (2, 32, 256):
        w = fr_root_of_unity(size)
        assert pow(w, size, R) == 1
        assert pow(w, size // 2, R) != 1


def test_batch_inverse_skips_zeros():
    xs = [5, 0, 7, R - 3, 0, 1]
    out = field.fr_batch_inverse(xs)
    assert out[1] == 0 and out[4] == 0
    for x, y in zip(xs, out):
        if x:
            assert x * y % R == 1


def test_fq_sqrt():
    for v in (4, 9, 2):
        s = field.fq_sqrt(v)
        if s is not None:
            assert s * s % Q == v % Q
    # x^3+B for generator x=1 must have a root
    assert field.fq_sqrt(1 + B) is not None
