"""Mesh/sharding layer: dp (batch) × tp (contraction) scaling over ICI."""

from .mesh import (
    batch_spec,
    batch_vec_spec,
    make_mesh,
    replicate,
    replicated_spec,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_spec",
    "batch_vec_spec",
    "replicated_spec",
    "shard_batch",
    "replicate",
]
