"""verkle_kzg_tpu: a TPU-native vector-commitment + verkle-tree framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the Rust
reference SleepingShell/verkle-kzg (see SURVEY.md): IPA and KZG polynomial
commitments in evaluation (Lagrange) form, the shared multiproof protocol,
a bit-exact Fiat-Shamir transcript, and an Ethereum-style verkle tree whose
node commitments are batched into fused MSMs on TPU.
"""

__version__ = "0.1.0"
