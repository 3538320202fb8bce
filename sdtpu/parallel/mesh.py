"""Device mesh + sharding utilities (new capability; the reference has no
distributed anything — SURVEY.md §2.1: single process, zero comm libraries).

Scale-out is expressed the idiomatic TPU way: a ``jax.sharding.Mesh`` with
``dp`` (data/batch) and ``tp`` (tensor) axes, NamedSharding annotations on
inputs and parameters, and XLA/GSPMD inserting the ICI collectives.  Nothing
here issues an explicit collective; the sharding annotations ARE the
parallelism program:

* **dp**: batch axis of latents/token-ids sharded over ``dp`` — large-batch
  few-step serving (BASELINE config 5).
* **tp**: Megatron-style tensor parallelism via parameter shardings —
  attention/MLP in-projections column-sharded ``P(None, "tp")``, out-
  projections row-sharded ``P("tp", None)`` — GSPMD propagates the head
  sharding through the attention einsums and inserts one psum per block.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = 1,
    tp: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A (dp, tp) mesh.  tp should map to the fastest ICI dimension, so it is
    the minor (contiguous) axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(x, mesh: Mesh):
    """Shard the leading (batch) axis over dp, replicate the rest."""
    spec = P("dp", *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def batch_spec(x) -> P:
    return P("dp", *([None] * (np.ndim(x) - 1)))


# ---------------------------------------------------------------------------
# Tensor-parallel parameter shardings
# ---------------------------------------------------------------------------

# Path-suffix rules, applied to the '/'-joined pytree path.  Column-parallel
# (output-dim sharded) in-projections; row-parallel (input-dim sharded)
# out-projections; everything else replicated.
_COL_KERNEL = re.compile(
    r"(attn1?|attn2|attn)/(q|k|v)/kernel$|mlp/fc1/kernel$|ff/proj/kernel$"
)
_COL_BIAS = re.compile(
    r"(attn1?|attn2|attn)/(q|k|v)/bias$|mlp/fc1/bias$|ff/proj/bias$"
)
_ROW_KERNEL = re.compile(
    r"(attn1?|attn2|attn)/out/kernel$|mlp/fc2/kernel$|ff/out/kernel$"
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tp_spec_for(path, leaf) -> P:
    """PartitionSpec for one parameter under tp sharding."""
    s = _path_str(path)
    ndim = np.ndim(leaf)
    if _COL_KERNEL.search(s) and ndim >= 2:
        # stacked CLIP layers have a leading layer axis: (L, in, out)
        return P(*([None] * (ndim - 1)), "tp")
    if _COL_BIAS.search(s) and ndim >= 1:
        return P(*([None] * (ndim - 1)), "tp")
    if _ROW_KERNEL.search(s) and ndim >= 2:
        return P(*([None] * (ndim - 2)), "tp", None)
    return P()


def shard_params_tp(params, mesh: Mesh):
    """Place parameters with Megatron-style tp shardings (attention heads and
    MLP hidden split over tp; GSPMD inserts the psums)."""

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, tp_spec_for(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)
