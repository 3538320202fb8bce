"""Fused GroupNorm + SiLU Pallas kernel.

Every UNet/VAE resblock runs GroupNorm -> SiLU (``diffusion.mojo:54-61``,
``vae.mojo:44-49``).  XLA computes the group statistics in one HBM pass and
normalizes in a second; this kernel does both in VMEM with a single HBM
read + write per feature map.

Trick for the group reduction: with channels on the lane axis, reducing
*within* a group (C/G contiguous lanes) is awkward for the VPU — instead the
per-channel moments (1, C) are multiplied by a constant block-diagonal
averaging matrix A (A[i,j] = 1/(C/G) iff same group), turning the group
reduce + broadcast-back into one tiny MXU matmul:

    group_mean_per_channel = mean_c @ A          # (1, C)
    group_var_per_channel  = mean_c2 @ A - gm^2

Applies to feature maps that fit VMEM ((H*W, C) f32 <= ~12 MB) — true for
every GroupNorm site of the 512x512 UNet; larger maps (VAE at full
resolution) fall back to the XLA path in ops/norm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-map f32 VMEM budget for the fused path
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _kernel(x_ref, a_ref, scale_ref, bias_ref, o_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    n = x.shape[0]
    m1 = jnp.sum(x, axis=0, keepdims=True) / n          # (1, C)
    m2 = jnp.sum(x * x, axis=0, keepdims=True) / n      # (1, C)
    a = a_ref[...]
    gm = jnp.dot(m1, a, preferred_element_type=jnp.float32)   # (1, C)
    gv = jnp.dot(m2, a, preferred_element_type=jnp.float32) - gm * gm
    inv = jax.lax.rsqrt(gv + eps)
    y = (x - gm) * inv * scale_ref[...] + bias_ref[...]
    y = y * jax.nn.sigmoid(y)  # SiLU
    o_ref[0] = y.astype(o_ref.dtype)


def _group_average_matrix(c: int, groups: int) -> np.ndarray:
    cg = c // groups
    a = np.zeros((c, c), np.float32)
    for g in range(groups):
        a[g * cg : (g + 1) * cg, g * cg : (g + 1) * cg] = 1.0 / cg
    return a


@functools.lru_cache(maxsize=32)
def _avg_matrix_cached(c: int, groups: int) -> np.ndarray:
    # cache the NUMPY table: caching a jnp array would capture a tracer when
    # first touched inside a jit trace (UnexpectedTracerError on reuse)
    return _group_average_matrix(c, groups)


def fits_fused(shape, dtype=jnp.float32) -> bool:
    """Whether (B, H, W, C) or (B, L, C) fits the fused kernel's VMEM use."""
    c = shape[-1]
    hw = int(np.prod(shape[1:-1]))
    # x in f32 + output + small moments: dominate by 2 f32 copies.
    # c needs no 128 alignment: the block spans the full channel dim, which
    # Mosaic allows at any size (it pads lanes internally).
    return hw * c * 4 * 2 <= _VMEM_BUDGET_BYTES and hw % 8 == 0


def group_norm_silu(
    x: jax.Array,
    params: dict,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """Fused GN+SiLU over (B, H, W, C) (or (B, L, C)); falls back to the
    unfused ops for shapes outside the VMEM budget."""
    if not interpret and (
        not fits_fused(x.shape) or jax.default_backend() == "cpu"
    ):
        from sdtpu.ops.norm import group_norm
        from sdtpu.ops.activations import silu

        return silu(group_norm(x, params, num_groups=num_groups, eps=eps))

    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    hw = int(np.prod(x.shape[1:-1]))
    x2 = x.reshape(b, hw, c)
    a = jnp.asarray(_avg_matrix_cached(c, num_groups))
    scale = params["scale"].astype(jnp.float32).reshape(1, c)
    bias = params["bias"].astype(jnp.float32).reshape(1, c)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, a, scale, bias)
    return out.reshape(orig_shape)
