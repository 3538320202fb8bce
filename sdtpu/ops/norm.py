"""GroupNorm / LayerNorm (reference: ``utils.mojo:1813-1885, 2052-2061``).

The reference's GroupNorm has scalar affine with beta never applied and adds
eps to sigma instead of sigma^2 (SURVEY.md §5.1 item 7); we implement the
standard semantics: per-channel gamma/beta, eps inside the rsqrt.  Statistics
accumulate in float32 regardless of the compute dtype (bf16-safe), then the
normalized result is cast back — XLA fuses the whole thing into one or two
VPU passes over the NHWC tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    params: dict,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """x: (N, H, W, C) or (N, L, C); normalizes over (spatial, C/G) per group."""
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    spatial = x.shape[1:-1]
    xf = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, *spatial, c)
    out = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(x: jax.Array, params: dict, *, eps: float = 1e-5) -> jax.Array:
    """Last-axis LayerNorm with per-feature affine.

    The reference fakes this as GroupNorm(1, n) through a transpose sandwich
    with no per-feature affine (``utils.mojo:2052-2061``, ``clip.mojo:39-41``);
    here it is a native last-axis reduction (features stay on the lane dim).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def init_group_norm(num_channels: int, *, dtype=jnp.float32) -> dict:
    return {
        "scale": jnp.ones((num_channels,), dtype),
        "bias": jnp.zeros((num_channels,), dtype),
    }


def init_layer_norm(num_features: int, *, dtype=jnp.float32) -> dict:
    return {
        "scale": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
