"""End-to-end protocol tests for IPA, KZG, and the multiproof — mirroring
the reference's test suites (``ipa/mod.rs:362-422``, ``kzg/mod.rs:237-309``,
``multiproof.rs:236-358``) but with fixed seeds."""

import random

import pytest

from verkle_kzg_tpu.hostmath.curve import g1_add, g1_generator
from verkle_kzg_tpu.poly import Domain, FrVector
from verkle_kzg_tpu.schemes import (
    IPA,
    KZG,
    ProverQuery,
    ipa_setup,
    kzg_setup,
    prove_multiproof,
    verify_multiproof,
)

rng = random.Random(0x5EED)

SIZE = 8


@pytest.fixture(scope="module")
def ipa_crs():
    return ipa_setup(SIZE)


@pytest.fixture(scope="module")
def kzg_crs():
    return kzg_setup(SIZE)


def test_ipa_eval_proof(ipa_crs):
    data = FrVector.from_ints(list(range(SIZE)), ipa_crs.domain)
    commit = IPA.commit(ipa_crs, data)

    index = rng.randrange(SIZE)
    proof = IPA.prove(ipa_crs, commit, index, data)
    assert proof.y == index
    assert IPA.verify(ipa_crs, commit, index, proof)

    index_outside = SIZE * 2
    proof_outside = IPA.prove(ipa_crs, commit, index_outside, data)
    assert IPA.verify(ipa_crs, commit, index_outside, proof_outside)
    # cross-proof must fail (``ipa/mod.rs:420``)
    assert not IPA.verify(ipa_crs, commit, index, proof_outside)


def test_ipa_fused_prove_matches_hostloop(ipa_crs):
    """The fused single-dispatch device loop (schemes/ipa.py::_fused_ipa_loop,
    Fiat-Shamir on device via ops/sha256.py) must produce BIT-IDENTICAL
    proofs to the host-sequenced reference loop — same L/R points, tip, y,
    and the same final transcript state."""
    from verkle_kzg_tpu.fiatshamir.transcript import Transcript
    from verkle_kzg_tpu.ops import field as df
    from verkle_kzg_tpu.ops.limbs import ints_to_limbs
    from verkle_kzg_tpu.schemes.ipa import _low_level_ipa, _low_level_ipa_hostloop
    import jax.numpy as jnp

    data = FrVector.from_ints([rng.randrange(1, 2**64) for _ in range(SIZE)],
                              ipa_crs.domain)
    commit = IPA.commit(ipa_crs, data)
    point = 3
    b = ipa_crs.domain.barycentric_coefficients(point)
    b_mont = df.to_mont(jnp.asarray(ints_to_limbs(b).T), "fr")

    t1, t2 = Transcript("ipa"), Transcript("ipa")
    fused = _low_level_ipa(ipa_crs, data.vals, b_mont, commit, point, t1)
    ref = _low_level_ipa_hostloop(ipa_crs, data.vals, b_mont, commit, point, t2)
    assert fused.l == ref.l and fused.r == ref.r
    assert fused.tip == ref.tip and fused.y == ref.y
    assert bytes(t1._state) == bytes(t2._state)


def test_ipa_commitment_proof(ipa_crs):
    data = FrVector.from_ints(list(range(SIZE)), ipa_crs.domain)
    commit = IPA.commit(ipa_crs, data)
    proof = IPA.prove_commitment(ipa_crs, commit, data)
    assert IPA.verify_commitment_proof(ipa_crs, commit, proof)

    bad_commit = g1_add(commit, g1_generator())
    assert not IPA.verify_commitment_proof(ipa_crs, bad_commit, proof)


def test_kzg_single_proof():
    data_size, max_crs = 4, SIZE
    crs = kzg_setup(max_crs)
    data = FrVector.from_ints(
        [rng.randrange(1, 2**64) for _ in range(data_size)], crs.domain
    )
    commit = KZG.commit(crs, data)

    proofs = [KZG.prove(crs, commit, i, data) for i in range(max_crs)]
    # pairings are ~2s each on the host path: verify a sample, check the
    # zero-padded region proves y == 0 for all (``kzg/mod.rs:288-292``)
    for i in (0, data_size - 1, data_size):
        assert KZG.verify(crs, commit, i, proofs[i])
    for i in range(data_size, max_crs):
        assert proofs[i].y == 0

    outside = max_crs + 1
    proof = KZG.prove(crs, commit, outside, data)
    assert KZG.verify(crs, commit, outside, proof)


@pytest.mark.parametrize("which", ["ipa", "kzg"])
def test_multiproof(which, ipa_crs, kzg_crs):
    scheme, crs = (IPA, ipa_crs) if which == "ipa" else (KZG, kzg_crs)
    num = 5

    queries = []
    for _ in range(num):
        base = rng.randrange(1, 2**61)
        data = FrVector.from_ints([base + i for i in range(SIZE)], crs.domain)
        commit = scheme.commit(crs, data)
        z = rng.randrange(SIZE)
        queries.append(ProverQuery(data=data, commit=commit, z=z, y=base + z))

    proof = prove_multiproof(scheme, crs, queries)
    vqueries = [q.to_verifier_query() for q in queries]
    assert verify_multiproof(scheme, crs, vqueries, proof)

    # tamper with D (``multiproof.rs:299-300``)
    bad = type(proof)(proof.proof, g1_add(proof.d, g1_generator()))
    assert not verify_multiproof(scheme, crs, vqueries, bad)

    # tamper with a query's claimed y (``multiproof.rs:302-303``)
    vqueries[0].y = (vqueries[0].y + 1) % (1 << 61)
    assert not verify_multiproof(scheme, crs, vqueries, proof)


@pytest.mark.slow
def test_multiproof_large_m(ipa_crs):
    """M = 2^17 queries — above the former 2^16 lazy scatter-sum cap (the
    reference's unbounded query loop, ``multiproof.rs:119-148``; its bench
    harness stops at 2^15, ``benches/ipa.rs:19``). The chunked scatter in
    _scale_and_group and the chunked lazy_sum must agree with a small-M
    proof-and-verify round trip."""
    m = 1 << 17
    datas, commits = [], []
    for j in range(4):
        vals = [rng.randrange(1, 2**61) for _ in range(SIZE)]
        data = FrVector.from_ints(vals, ipa_crs.domain)
        datas.append((data, vals))
        commits.append(IPA.commit(ipa_crs, data))
    queries = []
    for i in range(m):
        j = i % 4
        z = i % SIZE
        data, vals = datas[j]
        queries.append(ProverQuery(data=data, commit=commits[j], z=z, y=vals[z]))

    proof = prove_multiproof(IPA, ipa_crs, queries)
    vqueries = [q.to_verifier_query() for q in queries]
    assert verify_multiproof(IPA, ipa_crs, vqueries, proof)
    vqueries[7].y += 1
    assert not verify_multiproof(IPA, ipa_crs, vqueries, proof)


def test_prove_commitment_non_pow2_watermark(ipa_crs):
    """Non-power-of-two watermark: zero-padded to the next power of two
    (COMPAT.md quirk 10; the reference's iterator-zip fold drops data,
    ``utils.rs:31-38``)."""
    from verkle_kzg_tpu.poly import FrVector

    data = FrVector.from_ints([7, 3, 9, 2, 5], ipa_crs.domain)  # max = 5
    c = IPA.commit(ipa_crs, data)
    proof = IPA.prove_commitment(ipa_crs, c, data)
    assert len(proof.l) == 3  # padded to 8 -> 3 halving rounds
    assert IPA.verify_commitment_proof(ipa_crs, c, proof)
    from verkle_kzg_tpu.hostmath.curve import g1_add, g1_generator

    assert not IPA.verify_commitment_proof(
        ipa_crs, g1_add(c, g1_generator()), proof
    )
