"""Feist-Khovratovich all-points prover: every proof must verify exactly as
a per-point KZG proof would (the fixed version of ``kzg/mod.rs:200-235``;
see schemes/fk.py for the documented divergence)."""

import random

import pytest

from verkle_kzg_tpu.poly import FrVector
from verkle_kzg_tpu.schemes import KZG, kzg_setup

rng = random.Random(0xFE15)

SIZE = 8
DATA = 5  # shorter than the domain: exercises the zero-padded tail


@pytest.fixture(scope="module")
def crs():
    return kzg_setup(SIZE)


def test_fk_matches_single_proofs(crs):
    data = FrVector.from_ints(
        [rng.randrange(1, 2**63) for _ in range(DATA)], crs.domain
    )
    commit = KZG.commit(crs, data)
    proofs = KZG.prove_all_points(crs, data)
    assert len(proofs) == SIZE

    singles = [KZG.prove(crs, commit, i, data) for i in range(SIZE)]
    for i in range(SIZE):
        assert proofs[i].y == singles[i].y
        assert proofs[i].proof == singles[i].proof, f"pi mismatch at {i}"

    # spot-check two pairings (each ~seconds on the host path)
    assert KZG.verify(crs, commit, 0, proofs[0])
    assert KZG.verify(crs, commit, DATA + 1, proofs[DATA + 1])
