"""The SHIPPED geometry, off-TPU: domain-256 scheme round-trips and the
Ethereum-shape verkle tree (key_len 32, ext_width 256, internal width 256 —
the reference's actual verkle geometry, ``node.rs:263-264``).

Round-1 verdict: protocol tests ran at toy sizes only (domain 8 / width 16)
and width 256 was exercised solely in TPU benches. These compile once into
the persistent cache; later CI runs are compile-free.
"""

import random

import pytest

from verkle_kzg_tpu.poly import FrVector
from verkle_kzg_tpu.schemes import IPA, KZG, ipa_setup, kzg_setup
from verkle_kzg_tpu.verkle import VerkleTree
from verkle_kzg_tpu.verkle.tree import VerkleVerifier

pytestmark = pytest.mark.slow  # see conftest: default run skips these


rng = random.Random(0x256)


@pytest.fixture(scope="module")
def crs256():
    return ipa_setup(256)


def test_kzg_roundtrip_domain256():
    crs = kzg_setup(256)
    vals = [rng.randrange(1 << 64) for _ in range(256)]
    data = FrVector.from_ints(vals, crs.domain)
    c = KZG.commit(crs, data)
    idx = rng.randrange(256)
    proof = KZG.prove(crs, c, idx, data)
    assert proof.y == vals[idx]
    assert KZG.verify(crs, c, idx, proof)
    assert not KZG.verify(crs, c, (idx + 1) % 256, proof)


def test_ipa_roundtrip_domain256(crs256):
    vals = [rng.randrange(1 << 64) for _ in range(256)]
    data = FrVector.from_ints(vals, crs256.domain)
    c = IPA.commit(crs256, data)
    idx = rng.randrange(256)
    proof = IPA.prove(crs256, c, idx, data)
    assert proof.y == vals[idx]
    assert IPA.verify(crs256, c, idx, proof)
    assert not IPA.verify(crs256, c, (idx + 1) % 256, proof)


def test_verkle_ethereum_shape(crs256):
    """key_len-32 stems, width-256 extension and internal vectors: insert,
    commit, prove and verify STATELESSLY at the Ethereum geometry."""
    t = VerkleTree(IPA, crs256, key_len=32, ext_width=256)
    k1 = tuple(rng.randrange(256) for _ in range(32))
    k2 = (k1[0],) + tuple(rng.randrange(256) for _ in range(31))
    k3 = tuple(rng.randrange(256) for _ in range(32))
    v1, v2, v3 = (rng.getrandbits(256) for _ in range(3))
    t.insert_single(k1, v1)
    t.insert_single(k2, v2)
    t.insert_single(k3, v3)
    root = t.commitment()
    assert t.get_single(k1) == v1

    proof = t.prove_keys([k1])
    verifier = VerkleVerifier(scheme=IPA, params=crs256, key_len=32, ext_width=256)
    del t
    assert verifier.verify(root, [k1], {k1: v1}, proof)
    assert not verifier.verify(root, [k1], {k1: v1 ^ 1}, proof)
