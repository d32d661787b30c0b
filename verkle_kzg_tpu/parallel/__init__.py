"""Distributed execution over a JAX device mesh — entirely greenfield vs the
reference (which is single-process; SURVEY.md §2.4). Point/scalar vectors are
sharded across chips with shard_map; bucket partials ride ICI collectives."""

from .mesh import make_mesh, msm_sharded, msm_batched_sharded
from .ntt import intt_fr_sharded, ntt_fr_sharded

__all__ = [
    "make_mesh",
    "msm_sharded",
    "msm_batched_sharded",
    "ntt_fr_sharded",
    "intt_fr_sharded",
]
