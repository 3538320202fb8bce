"""Activations (reference: ``SiLU`` ``utils.mojo:1888-1902``, ``Gelu``
``utils.mojo:1904-1919``, QuickGELU inline at ``clip.mojo:49-50``, GeGLU gate
inside ``Unet_Attention_Block`` ``diffusion.mojo:96-97,137-140``).

Pure elementwise VPU work; XLA fuses each into its producer matmul/conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


_GELU_C = 0.7978845608028654  # sqrt(2/pi)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """tanh-approximated GELU, matching the reference (``utils.mojo:1904``)
    and diffusers' GEGLU gate.  Written out explicitly (not
    ``jax.nn.gelu(approximate=True)``, whose internal reformulation drifts
    ~3e-5 from the canonical formula torch uses).
    """
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + jnp.tanh(_GELU_C * (xf + 0.044715 * xf * xf * xf)))
    return out.astype(x.dtype)


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU — what torch ``F.gelu`` defaults to, and what
    both diffusers' GEGLU gate and HF CLIP's "gelu" activation actually use.
    The tanh approximation differs by up to ~1e-3, which matters for the
    PSNR >= 40 dB fidelity target.  f32 island under bf16 compute."""
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + jax.lax.erf(xf / jnp.sqrt(2.0).astype(jnp.float32)))).astype(x.dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — CLIP's activation (``clip.mojo:49-50``)."""
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(x: jax.Array) -> jax.Array:
    """GeGLU: project-to-8x output split into (value, gate); value * GELU(gate)
    (``diffusion.mojo:137-140``: Linear(ch, 8ch) -> chunk(2) -> x * gelu(gate)).
    The gate GELU is ERF-exact, matching diffusers' ``GEGLU`` (the reference's
    Mojo ``Gelu`` is the tanh approximation — a quirk not replicated, since
    real checkpoints were trained under the exact form)."""
    value, gate = jnp.split(x, 2, axis=-1)
    return value * gelu_erf(gate)
