"""2-D convolution (reference: ``Conv2D``, ``helpers/utils.mojo:1693-1811``).

The reference does a direct per-output-channel spatial loop with ``tile_2d``
tiling on CPU SIMD lanes.  On TPU the conv IS a matmul: XLA lowers
``lax.conv_general_dilated`` in NHWC/HWIO layout to MXU-tiled contractions,
so there is nothing to hand-schedule.  We keep activations NHWC (channels on
the 128-wide lane dimension) and kernels HWIO.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from sdtpu.utils import hostrng

Padding = Union[int, Tuple[Tuple[int, int], Tuple[int, int]]]


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Padding = 0,
    impl: str = "xla",
) -> jax.Array:
    """NHWC conv.  ``kernel`` is HWIO; ``padding`` is symmetric int or
    explicit ``((top, bottom), (left, right))`` — the explicit form covers the
    VAE encoder's asymmetric (0,1),(0,1) stride-2 pad (``vae.mojo:115-116``).

    ``impl="gemm"`` routes eligible 3x3 stride-1 same-padding convs through
    the Pallas implicit-GEMM kernel (1.1-2.3x over XLA's conv lowering on the
    hot SD shapes, BENCHLOG.md); everything else stays on XLA.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if (
        impl == "gemm"
        and stride == (1, 1)
        and kernel.shape[:2] == (3, 3)
        and padding == ((1, 1), (1, 1))
    ):
        from sdtpu.kernels.conv2d import (
            conv3x3_gemm,
            conv3x3_gemm_slab,
            plan_co_tile,
            plan_slab,
        )

        co_tile = plan_co_tile(x.shape, kernel.shape)
        if co_tile is not None:
            return conv3x3_gemm(x, kernel, bias, co_tile=co_tile)
        slab = plan_slab(x.shape, kernel.shape, itemsize=x.dtype.itemsize)
        if slab is not None:
            return conv3x3_gemm_slab(
                x, kernel, bias, h_tile=slab[0], co_tile=slab[1]
            )
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=dn,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def nearest_up_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    impl: str = "xla",
    emit_stats: bool = False,
):
    """Nearest-2x upsample + 3x3 same-pad conv (the UNet/VAE ``Upsample``
    block, ``diffusion.mojo:181-189`` / ``vae.mojo:183-213`` semantics).

    With ``impl="gemm"`` and a slab plan, the upsample fuses INTO the conv
    kernel: the small map is the only HBM read and the 4x upsampled map is
    never materialized (XLA's broadcast+reshape lowering of
    ``nearest_upsample`` cost ~7% of VAE-decode time — BENCHLOG round 3).
    Falls back to ``nearest_upsample`` + ``conv2d`` otherwise.

    ``emit_stats=True`` returns ``(out, moments)`` — per-channel output
    moments for the consumer GN's stats chain (None off the slab path or
    with the chain disabled, see kernels/conv2d.py)."""
    if impl == "gemm" and kernel.shape[:2] == (3, 3):
        from sdtpu.kernels.conv2d import (
            CONV_STATS_CHAIN,
            conv3x3_gemm_slab,
            plan_slab,
        )

        b, h, w, ci = x.shape
        st = plan_slab(
            (b, 2 * h, 2 * w, ci), kernel.shape, itemsize=x.dtype.itemsize
        )
        if st is not None and st[0] % 2 == 0:
            out = conv3x3_gemm_slab(
                x, kernel, bias, h_tile=st[0], co_tile=st[1], upsample=True,
                emit_stats=emit_stats and CONV_STATS_CHAIN,
            )
            if emit_stats:
                return out if CONV_STATS_CHAIN else (out, None)
            return out
    from sdtpu.ops.resize import nearest_upsample

    out = conv2d(nearest_upsample(x, 2), kernel, bias, padding=1, impl=impl)
    return (out, None) if emit_stats else out


def conv1x1_tokens(x: jax.Array, params: dict) -> jax.Array:
    """A 1x1 conv expressed as a token matmul: (B, H, W, Ci) -> (B, H, W, Co).

    XLA's conv lowering ran the UNet's twelve per-step 1x1 shortcut convs
    (``diffusion.mojo:70-72``) at ~19% MXU (round-2 XProf trace); as a plain
    (B, HW, Ci) @ (Ci, Co) dot they ride the matmul path."""
    b, h, w, ci = x.shape
    kernel = params["kernel"][0, 0]  # (1, 1, Ci, Co) -> (Ci, Co)
    out = x.reshape(b, h * w, ci) @ kernel.astype(x.dtype)
    out = out + params["bias"].astype(out.dtype)
    return out.reshape(b, h, w, kernel.shape[-1])


def init_conv2d(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size: Union[int, Tuple[int, int]] = 3,
    *,
    dtype=jnp.float32,
) -> dict:
    """Kaiming-uniform fan-in init, the intended semantics of the reference's
    U(-1/sqrt(k), 1/sqrt(k)) with k = in*kh*kw (``utils.mojo:1719-1726``).
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    kh, kw = kernel_size
    fan_in = in_channels * kh * kw
    bound = fan_in**-0.5
    k_key, b_key = hostrng.split(key)
    kernel = hostrng.uniform(
        k_key, (kh, kw, in_channels, out_channels), dtype, -bound, bound
    )
    bias = hostrng.uniform(b_key, (out_channels,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}
