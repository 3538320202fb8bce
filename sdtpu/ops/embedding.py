"""Token embedding and sinusoidal timestep embedding.

Reference: ``Embedding`` (``helpers/utils.mojo:2014-2049``) and
``get_time_embedding`` (``helpers/utils.mojo:353-370``).  The reference's
timestep embedding inverts the exponent (``(-i/160) ** 10000`` instead of
``10000 ** (-i/160)``, SURVEY.md §5.1 item 3); we implement the diffusers
semantics: freqs = exp(-ln(10000) * i / half_dim), concat order controlled by
``flip_sin_to_cos`` (SD UNets use cos‖sin).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sdtpu.utils import hostrng


def embedding_lookup(token_ids: jax.Array, params: dict) -> jax.Array:
    """Gather rows: (B, L) int ids -> (B, L, D).  The reference's tangled
    index arithmetic (``utils.mojo:2032-2046``) intended exactly
    ``weight[ids]``."""
    return jnp.take(params["weight"], token_ids, axis=0)


def init_embedding(
    key: jax.Array, num_embeddings: int, features: int, *, dtype=jnp.float32
) -> dict:
    return {
        "weight": hostrng.normal(key, (num_embeddings, features), dtype) * 0.02
    }


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
    dtype=jnp.float32,
) -> jax.Array:
    """(B,) timesteps -> (B, dim) sinusoidal embedding (diffusers Timesteps)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    return emb.astype(dtype)
