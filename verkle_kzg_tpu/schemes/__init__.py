"""Commitment schemes (layer 3): IPA, KZG, and the shared multiproof
protocol — the TPU-native re-design of ``vector-commit/src/{ipa,kzg,
multiproof}.rs``. Host python drives the Fiat-Shamir sequencing (which is
inherently serial SHA-256); every vector-sized computation (MSMs, folds,
quotients, batch query scaling) runs as batched device kernels."""

from .ipa import IPAParams, IPAProof, IPACommitProof, ipa_setup, IPA
from .kzg import KZGParams, KZGProof, kzg_setup, KZG
from .multiproof import (
    Multiproof,
    ProverQuery,
    VerifierQuery,
    prove_multiproof,
    verify_multiproof,
)

__all__ = [
    "IPA",
    "IPAParams",
    "IPAProof",
    "IPACommitProof",
    "ipa_setup",
    "KZG",
    "KZGParams",
    "KZGProof",
    "kzg_setup",
    "Multiproof",
    "ProverQuery",
    "VerifierQuery",
    "prove_multiproof",
    "verify_multiproof",
]
