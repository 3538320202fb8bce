"""VAE encoder/decoder — AutoencoderKL (reference: ``vae.mojo``).

The reference builds a near-SD VAE with quirks the build must not replicate
(16-group norms ``vae.mojo:42-43``; its attention folds heads oddly,
``vae.mojo:5-27``); per SURVEY.md §5.1 we implement the standard SD
AutoencoderKL semantics so real checkpoints load:

* Encoder (``vae.mojo:70-159``): conv_in -> [2x ResBlock, asymmetric-pad
  stride-2 downsample (``vae.mojo:115-116``)] x3 widening 128->256->512 ->
  mid (ResBlock, single-head attention (``vae.mojo:5-27``), ResBlock) ->
  GN/SiLU/conv -> 8 channels (mean‖logvar) -> 1x1 quant conv;
  ``encode`` then samples x = mean + eps*std, clamps logvar to (-30, 20), and
  scales by 0.18215 (``vae.mojo:118-129``).
* Decoder (``vae.mojo:162-250``): /0.18215 (``vae.mojo:222``) -> 1x1
  post-quant conv -> conv_in -> mid -> [3x ResBlock + nearest-2x upsample +
  conv] narrowing 512->512->256->128 -> GN/SiLU/conv -> 3 channels.

VAE ResBlocks (``vae.mojo:30-67``) are the UNet resnet without the time
branch.  All NHWC; GroupNorm stats in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdtpu.config import VAEConfig
from sdtpu.utils import hostrng
from sdtpu.ops import (
    attention,
    conv2d,
    group_norm,
    init_attention,
    init_conv2d,
    init_group_norm,
    silu,
)


def _shortcut(x: jax.Array, params: dict) -> jax.Array:
    """1x1 skip projection as a token matmul
    (see :func:`sdtpu.ops.conv.conv1x1_tokens`)."""
    if "conv_shortcut" not in params:
        return x
    from sdtpu.ops.conv import conv1x1_tokens

    return conv1x1_tokens(x, params["conv_shortcut"])


def vae_resnet(
    x: jax.Array, params: dict, *, num_groups: int = 32,
    conv_impl: str = "xla", stats=None, emit_stats: bool = False,
):
    """Res_Block (``vae.mojo:30-67``) with standard 32-group norms.

    On TPU (``conv_impl="gemm"``) both convs route through the row-slab
    GN+SiLU+conv kernel: the decoder's full-resolution maps (up to
    512x512x128) never round-trip HBM between normalize and conv.  Conv
    dicts quantized by :func:`sdtpu.utils.quant.quantize_vae_decoder_int8`
    (presence of ``kernel_q``) run the slab contraction int8 x int8 ->
    int32 on the MXU's 2x path; off-TPU they dequantize on the fly.

    ``stats``: optional (B, 2, C) per-channel moments of ``x`` from the
    producing slab conv — norm1's statistics derive from them instead of
    re-reading the map (dropped if the channel count doesn't line up).
    ``emit_stats=True`` returns ``(out, moments)`` where moments are the
    POST-residual output moments (conv2's slab epilogue includes the skip
    add), i.e. valid ``stats`` for the next consumer — or None off the
    slab path / with the chain disabled."""
    from sdtpu.utils.quant import (
        conv_bias_deq,
        float_conv_kernel,
        slab_conv_kernel,
        slab_quant_kwargs,
    )

    if stats is not None and stats.shape[-1] != x.shape[-1]:
        stats = None
    if conv_impl == "gemm":
        from sdtpu.kernels.conv2d import gn_silu_conv3x3_slab, plan_slab

        k1 = slab_conv_kernel(params["conv1"])
        k2 = slab_conv_kernel(params["conv2"])
        mid_shape = x.shape[:-1] + (k1.shape[-1],)
        st1 = plan_slab(
            x.shape, k1.shape, has_prologue=True,
            itemsize=x.dtype.itemsize,
        )
        st2 = plan_slab(
            mid_shape, k2.shape,
            has_prologue=True, has_residual=True,
            itemsize=x.dtype.itemsize,
        )
        if (
            st1 is not None
            and st2 is not None
            and x.shape[-1] % num_groups == 0
            and mid_shape[-1] % num_groups == 0
        ):
            # conv1 emits per-channel output moments -> norm2's statistics
            # derive without re-reading the mid map from HBM (see
            # kernels/conv2d.py emit_stats)
            import sdtpu.kernels.conv2d as _conv2d_mod

            chain = _conv2d_mod.CONV_STATS_CHAIN  # trace-time A/B toggle
            h = gn_silu_conv3x3_slab(
                x, params["norm1"], k1,
                conv_bias_deq(params["conv1"]), num_groups=num_groups,
                eps=1e-6, h_tile=st1[0], co_tile=st1[1],
                stats=stats if chain else None, emit_stats=chain,
                **slab_quant_kwargs(params["conv1"]),
            )
            h, hstats = h if chain else (h, None)
            out = gn_silu_conv3x3_slab(
                h, params["norm2"], k2,
                conv_bias_deq(params["conv2"]), num_groups=num_groups,
                eps=1e-6, residual=_shortcut(x, params), stats=hstats,
                h_tile=st2[0], co_tile=st2[1],
                emit_stats=chain and emit_stats,
                **slab_quant_kwargs(params["conv2"]),
            )
            if emit_stats:
                return out if chain else (out, None)
            return out
    h = group_norm(x, params["norm1"], num_groups=num_groups, eps=1e-6,
                   stats=stats)
    h = silu(h)
    h = conv2d(h, float_conv_kernel(params["conv1"], x.dtype),
               params["conv1"]["bias"], padding=1, impl=conv_impl)
    h = group_norm(h, params["norm2"], num_groups=num_groups, eps=1e-6)
    h = silu(h)
    h = conv2d(h, float_conv_kernel(params["conv2"], x.dtype),
               params["conv2"]["bias"], padding=1, impl=conv_impl)
    out = _shortcut(x, params) + h
    return (out, None) if emit_stats else out


def vae_attention(
    x: jax.Array, params: dict, *, num_groups: int = 32,
    implementation: str = "xla", stats=None,
) -> jax.Array:
    """Attention_Block (``vae.mojo:5-27``): GN -> single-head self-attention
    over spatial tokens -> residual.  ``stats``: producer moments of ``x``
    for the GN (see :func:`sdtpu.ops.norm.group_norm`)."""
    b, h, w, c = x.shape
    out = group_norm(x, params["norm"], num_groups=num_groups, eps=1e-6,
                     stats=stats)
    out = out.reshape(b, h * w, c)
    out = attention(out, params["attn"], num_heads=1,
                    implementation=implementation,
                    residual=x.reshape(b, h * w, c))
    return out.reshape(b, h, w, c)


def _mid(
    x: jax.Array, params: dict, *, num_groups: int,
    implementation: str = "xla", conv_impl: str = "xla",
) -> jax.Array:
    x, st = vae_resnet(x, params["resnets"][0], num_groups=num_groups,
                       conv_impl=conv_impl, emit_stats=True)
    x = vae_attention(
        x, params["attention"], num_groups=num_groups,
        implementation=implementation, stats=st,
    )
    return vae_resnet(x, params["resnets"][1], num_groups=num_groups,
                      conv_impl=conv_impl)


def vae_encoder(
    x: jax.Array, params: dict, config: VAEConfig, *,
    attention_impl: str = "xla",
    conv_impl: str = "xla",
) -> jax.Array:
    """(B, H, W, 3) image in [-1, 1] -> (B, H/8, W/8, 2*latent) moments."""
    ng = config.norm_num_groups
    h = conv2d(x, params["conv_in"]["kernel"], params["conv_in"]["bias"], padding=1)
    for level, block in enumerate(params["down_blocks"]):
        st = None  # XLA convs below break the chain (XLA fuses its own)
        for res in block["resnets"]:
            h, st = vae_resnet(h, res, num_groups=ng, conv_impl=conv_impl,
                               stats=st, emit_stats=True)
        if "downsample" in block:
            # Asymmetric (0,1),(0,1) pad + stride-2 conv (vae.mojo:115-116).
            h = conv2d(
                h,
                block["downsample"]["kernel"],
                block["downsample"]["bias"],
                stride=2,
                padding=((0, 1), (0, 1)),
            )
    h = _mid(h, params["mid_block"], num_groups=ng, implementation=attention_impl, conv_impl=conv_impl)
    h = group_norm(h, params["norm_out"], num_groups=ng, eps=1e-6)
    h = silu(h)
    h = conv2d(h, params["conv_out"]["kernel"], params["conv_out"]["bias"], padding=1)
    return conv2d(
        h, params["quant_conv"]["kernel"], params["quant_conv"]["bias"], padding=0
    )


def vae_encode(
    image: jax.Array,
    noise: jax.Array,
    params: dict,
    config: VAEConfig,
    *,
    attention_impl: str = "xla",
    conv_impl: str = "xla",
    apply_scaling: bool = True,
) -> jax.Array:
    """Full img2img encode path (``vae.mojo:118-129,157``): moments ->
    clamp(logvar) -> reparameterize with the given N(0,1) noise -> scale.

    ``noise=None`` takes the posterior MODE (the mean, no sampling);
    ``apply_scaling=False`` skips the 0.18215 multiply — InstructPix2Pix's
    image-conditioning latents use mode() UNscaled (the diffusers quirk the
    model was trained with)."""
    moments = vae_encoder(image, params, config, attention_impl=attention_impl, conv_impl=conv_impl)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if noise is None:
        latents = mean
    else:
        logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        std = jnp.exp(0.5 * logvar).astype(mean.dtype)
        latents = mean + noise.astype(mean.dtype) * std
    return latents * config.scaling_factor if apply_scaling else latents


def vae_decode(
    latents: jax.Array, params: dict, config: VAEConfig, *,
    attention_impl: str = "xla",
    conv_impl: str = "xla",
) -> jax.Array:
    """(B, H/8, W/8, latent) -> (B, H, W, 3) image in [-1, 1]
    (``vae.mojo:221-250``)."""
    ng = config.norm_num_groups
    h = latents / config.scaling_factor
    h = conv2d(
        h,
        params["post_quant_conv"]["kernel"],
        params["post_quant_conv"]["bias"],
        padding=0,
    )
    h = conv2d(h, params["conv_in"]["kernel"], params["conv_in"]["bias"], padding=1)
    h = _mid(h, params["mid_block"], num_groups=ng, implementation=attention_impl, conv_impl=conv_impl)
    # Stats chain end-to-end through the up blocks: resnet -> resnet,
    # resnet -> upsample-slab -> next level's norm1, last resnet ->
    # norm_out — every GN stat pass over the big decoder maps derives from
    # the producing slab conv's emitted moments instead of re-reading HBM.
    st = None
    for block in params["up_blocks"]:
        for res in block["resnets"]:
            h, st = vae_resnet(h, res, num_groups=ng, conv_impl=conv_impl,
                               stats=st, emit_stats=True)
        if "upsample" in block:
            from sdtpu.ops.conv import nearest_up_conv2d

            h, st = nearest_up_conv2d(
                h,
                block["upsample"]["kernel"],
                block["upsample"]["bias"],
                impl=conv_impl,
                emit_stats=True,
            )
    h = group_norm(h, params["norm_out"], num_groups=ng, eps=1e-6, stats=st)
    h = silu(h)
    return conv2d(
        h, params["conv_out"]["kernel"], params["conv_out"]["bias"], padding=1
    )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_vae_resnet(key, in_ch, out_ch, *, dtype):
    k1, k2, k3 = hostrng.split(key, 3)
    params = {
        "norm1": init_group_norm(in_ch, dtype=dtype),
        "conv1": init_conv2d(k1, in_ch, out_ch, 3, dtype=dtype),
        "norm2": init_group_norm(out_ch, dtype=dtype),
        "conv2": init_conv2d(k2, out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        params["conv_shortcut"] = init_conv2d(k3, in_ch, out_ch, 1, dtype=dtype)
    return params


def _init_mid(key, ch, *, dtype):
    k1, k2, k3 = hostrng.split(key, 3)
    return {
        "resnets": [
            _init_vae_resnet(k1, ch, ch, dtype=dtype),
            _init_vae_resnet(k2, ch, ch, dtype=dtype),
        ],
        "attention": {
            "norm": init_group_norm(ch, dtype=dtype),
            "attn": init_attention(k3, ch, qkv_bias=True, dtype=dtype),
        },
    }


def init_vae_encoder(key: jax.Array, config: VAEConfig, *, dtype=jnp.float32) -> dict:
    host = isinstance(key, (int, hostrng.HostKey))
    key = hostrng.ensure_key(key)
    keys = iter(hostrng.split(key, 64))
    nk = lambda: next(keys)  # noqa: E731
    chs = config.block_out_channels
    params = {
        "conv_in": init_conv2d(nk(), config.in_channels, chs[0], 3, dtype=dtype)
    }
    down_blocks = []
    in_ch = chs[0]
    for level, ch in enumerate(chs):
        block = {
            "resnets": [
                _init_vae_resnet(
                    nk(), in_ch if i == 0 else ch, ch, dtype=dtype
                )
                for i in range(config.layers_per_block)
            ]
        }
        in_ch = ch
        if level < len(chs) - 1:
            block["downsample"] = init_conv2d(nk(), ch, ch, 3, dtype=dtype)
        down_blocks.append(block)
    params["down_blocks"] = down_blocks
    params["mid_block"] = _init_mid(nk(), chs[-1], dtype=dtype)
    params["norm_out"] = init_group_norm(chs[-1], dtype=dtype)
    params["conv_out"] = init_conv2d(
        nk(), chs[-1], 2 * config.latent_channels, 3, dtype=dtype
    )
    params["quant_conv"] = init_conv2d(
        nk(), 2 * config.latent_channels, 2 * config.latent_channels, 1, dtype=dtype
    )
    return jax.tree.map(jnp.asarray, params) if host else params


def init_vae_decoder(key: jax.Array, config: VAEConfig, *, dtype=jnp.float32) -> dict:
    host = isinstance(key, (int, hostrng.HostKey))
    key = hostrng.ensure_key(key)
    keys = iter(hostrng.split(key, 64))
    nk = lambda: next(keys)  # noqa: E731
    chs = config.block_out_channels
    params = {
        "post_quant_conv": init_conv2d(
            nk(), config.latent_channels, config.latent_channels, 1, dtype=dtype
        ),
        "conv_in": init_conv2d(nk(), config.latent_channels, chs[-1], 3, dtype=dtype),
        "mid_block": _init_mid(nk(), chs[-1], dtype=dtype),
    }
    up_blocks = []
    in_ch = chs[-1]
    # decoder narrows through reversed widths, 3 resnets per level
    # (vae.mojo:183-213), upsample after every level except the last.
    for rev, ch in enumerate(reversed(chs)):
        block = {
            "resnets": [
                _init_vae_resnet(nk(), in_ch if i == 0 else ch, ch, dtype=dtype)
                for i in range(config.layers_per_block + 1)
            ]
        }
        in_ch = ch
        if rev < len(chs) - 1:
            block["upsample"] = init_conv2d(nk(), ch, ch, 3, dtype=dtype)
        up_blocks.append(block)
    params["up_blocks"] = up_blocks
    params["norm_out"] = init_group_norm(chs[0], dtype=dtype)
    params["conv_out"] = init_conv2d(
        nk(), chs[0], config.out_channels, 3, dtype=dtype
    )
    return jax.tree.map(jnp.asarray, params) if host else params
