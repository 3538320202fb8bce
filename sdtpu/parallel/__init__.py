"""Mesh/sharding layer (pjit/GSPMD over ICI) — see ``mesh.py``."""

from sdtpu.parallel.mesh import (
    batch_spec,
    make_mesh,
    replicate,
    shard_batch,
    shard_params_tp,
    tp_spec_for,
)
from sdtpu.parallel.distributed import global_mesh, health_check, initialize
from sdtpu.parallel.ring_attention import ring_attention, ring_context

__all__ = [
    "batch_spec",
    "global_mesh",
    "health_check",
    "initialize",
    "make_mesh",
    "replicate",
    "ring_attention",
    "ring_context",
    "shard_batch",
    "shard_params_tp",
    "tp_spec_for",
]
