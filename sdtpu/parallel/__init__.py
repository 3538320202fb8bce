"""Mesh/sharding layer (pjit/GSPMD over ICI) — see ``mesh.py``."""

from sdtpu.parallel.mesh import (
    batch_spec,
    make_mesh,
    replicate,
    shard_batch,
    shard_params_tp,
    tp_spec_for,
)

__all__ = [
    "batch_spec",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_params_tp",
    "tp_spec_for",
]
