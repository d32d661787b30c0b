"""verkle_kzg_tpu: a TPU-native vector-commitment + verkle-tree framework.

Brand-new JAX/XLA implementation with the capabilities of the Rust
reference SleepingShell/verkle-kzg (see SURVEY.md): IPA and KZG polynomial
commitments in evaluation (Lagrange) form, the shared multiproof protocol,
a bit-exact Fiat-Shamir transcript, and an Ethereum-style verkle tree whose
node commitments are batched into fused MSMs on TPU.

Layer map (SURVEY.md §7):
  params      BN254 constants + limb layout
  hostmath    exact python-bigint oracle (fields, curves, pairing, hashing)
  ops         device kernels: limb-plane field/curve arithmetic, Pippenger
              MSM, radix-2 NTT over Fr and G1
  poly        evaluation-form polynomial layer (Domain, FrVector)
  fiatshamir  byte-exact transcript
  schemes     IPA, KZG, Feist-Khovratovich, multiproof
  verkle      the trie with fused batched node commitments
  parallel    device-mesh sharding (shard_map + collectives)
"""

__version__ = "0.1.0"

__all__ = [
    "fiatshamir",
    "hostmath",
    "ops",
    "params",
    "parallel",
    "poly",
    "schemes",
    "verkle",
]
