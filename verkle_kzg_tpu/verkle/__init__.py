"""Verkle trie (layer 4): host-side structure, device-batched commitments."""

from .tree import VerkleTree

__all__ = ["VerkleTree"]
