"""ControlNet (Zhang et al. 2023) — spatially-conditioned denoising.

Beyond-reference capability (the reference has no conditioning beyond the
text prompt, ``pipeline.mojo:13-22``).  A ControlNet is a trained copy of
the base UNet's encoder + mid block that consumes the same latents /
timestep / text context PLUS a control image (canny edges, depth, pose,
...), and emits one residual per encoder skip and one for the mid block;
the frozen base UNet adds them to its saved skips
(``unet_forward(control=...)``, the diffusers composition).

Layout mirrors the diffusers ``ControlNetModel`` state_dict:

* ``time_embedding`` / ``down_blocks`` / ``mid_block`` — the encoder copy,
  identical structure to the base UNet (same ``UNetConfig`` drives both);
* ``cond_embedding`` — ``controlnet_cond_embedding``: a small conv stack
  that maps the (B, H, W, 3) control image in [0, 1] down 8x to the latent
  grid at ``block_out_channels[0]`` channels;
* ``zero_convs`` / ``zero_conv_mid`` — ``controlnet_down_blocks.N`` /
  ``controlnet_mid_block``: the 1x1 "zero convs", zero-initialized so a
  fresh ControlNet is an exact no-op on the base model.

TPU notes: everything reuses the UNet's blocks (slab conv kernels, flash
attention, scan-hoisted time projections and cross-attention K/V all apply
— the pipeline hoists them for the ControlNet exactly as for the UNet);
the control-image embedding is constant across the denoise scan and is
computed ONCE outside it (:func:`controlnet_cond_embed`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sdtpu.config import UNetConfig
from sdtpu.ops import conv2d, init_conv2d, silu
from sdtpu.utils import hostrng
from sdtpu.models.unet import (
    _heads_for_level,
    attention_block,
    compute_time_embedding,
    downsample,
    resnet_block,
)

# diffusers ControlNetConditioningEmbedding default channel ladder
COND_EMBED_CHANNELS: Tuple[int, ...] = (16, 32, 96, 256)


def controlnet_cond_embed(cond_image: jax.Array, params: dict) -> jax.Array:
    """Control image (B, H, W, 3) in [0, 1] -> (B, H/8, W/8, ch0).

    The diffusers ``ControlNetConditioningEmbedding``: 3x3 conv in, three
    [3x3, 3x3 stride-2] pairs walking the channel ladder, zero-initialized
    3x3 conv out.  Constant across the denoise scan — call once per
    generation, outside the scan."""
    x = conv2d(cond_image, params["conv_in"]["kernel"],
               params["conv_in"]["bias"], padding=1)
    x = silu(x)
    # stride is structural: even-indexed blocks keep resolution, odd-indexed
    # halve it (three pairs -> the 8x latent downscale; see init below)
    for i, blk in enumerate(params["blocks"]):
        x = conv2d(x, blk["kernel"], blk["bias"], padding=1,
                   stride=2 if i % 2 == 1 else 1)
        x = silu(x)
    return conv2d(x, params["conv_out"]["kernel"],
                  params["conv_out"]["bias"], padding=1)


def controlnet_forward(
    latents: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
    cond_embedding: jax.Array,
    params: dict,
    config: UNetConfig,
    *,
    conditioning_scale=1.0,
    added_cond: Optional[dict] = None,
    timestep_cond: Optional[jax.Array] = None,
    attention_impl: str = "xla",
    conv_impl: str = "xla",
    cross_kv: Optional[dict] = None,
    time_cache: Optional[dict] = None,
) -> dict:
    """Run the ControlNet encoder copy; returns ``{"down": [...], "mid":
    array-or-None}`` for ``unet_forward(control=...)``.

    ``cond_embedding`` is :func:`controlnet_cond_embed`'s output, already
    broadcast to the latents batch (2B under CFG).  ``conditioning_scale``
    multiplies every residual (traced scalar: changing it never
    recompiles).  ``cross_kv`` / ``time_cache`` are the scan-hoisted caches
    from ``precompute_cross_kv`` / ``precompute_time_projections`` run over
    THIS tree's params (they skip the absent up blocks)."""
    if time_cache is not None:
        temb = time_cache["temb"]
        tp = time_cache
    else:
        tp = None
        temb = compute_time_embedding(
            timesteps, params, config,
            batch=latents.shape[0], dtype=latents.dtype,
            timestep_cond=timestep_cond, added_cond=added_cond,
        )

    ng = config.norm_num_groups
    context = context.astype(latents.dtype)

    if cond_embedding.shape[1:3] != latents.shape[1:3]:
        raise ValueError(
            f"cond_embedding grid {cond_embedding.shape[1:3]} != latent grid "
            f"{latents.shape[1:3]} — the cond-embedding ladder has "
            "len(cond_channels)-1 stride-2 convs; it must match the VAE "
            "downscale factor (SD: 8x -> 4-channel ladder)"
        )
    x = conv2d(
        latents, params["conv_in"]["kernel"], params["conv_in"]["bias"],
        padding=1,
    )
    # the control signal enters here — the only difference from the base
    # encoder's data path
    x = x + cond_embedding.astype(x.dtype)

    scale = jnp.asarray(conditioning_scale, jnp.float32).astype(x.dtype)

    from sdtpu.ops.conv import conv1x1_tokens

    zero_convs = iter(params["zero_convs"])
    down = [conv1x1_tokens(x, next(zero_convs)) * scale]
    for level, block in enumerate(params["down_blocks"]):
        ch = config.block_out_channels[level]
        heads = _heads_for_level(config, ch)
        for i, res in enumerate(block["resnets"]):
            has_attn = config.attention_levels[level]
            x = resnet_block(x, temb, res, num_groups=ng, conv_impl=conv_impl,
                             t_pre=None if tp is None else tp["down"][level][i],
                             emit_stats=has_attn)
            if has_attn:
                x, rstats = x
                x = attention_block(
                    x,
                    context,
                    block["attentions"][i],
                    num_heads=heads,
                    num_groups=ng,
                    implementation=attention_impl,
                    cross_kv=(
                        None if cross_kv is None
                        else cross_kv["down"][level][i]
                    ),
                    stats=rstats,
                )
            down.append(conv1x1_tokens(x, next(zero_convs)) * scale)
        if "downsample" in block:
            x = downsample(x, block["downsample"])
            down.append(conv1x1_tokens(x, next(zero_convs)) * scale)

    mid_res = None
    if config.mid_block:
        mid = params["mid_block"]
        heads = _heads_for_level(config, config.block_out_channels[-1])
        x, rstats = resnet_block(
            x, temb, mid["resnets"][0], num_groups=ng, conv_impl=conv_impl,
            t_pre=None if tp is None else tp["mid"][0], emit_stats=True)
        x = attention_block(
            x,
            context,
            mid["attentions"][0],
            num_heads=heads,
            num_groups=ng,
            implementation=attention_impl,
            cross_kv=None if cross_kv is None else cross_kv["mid"][0],
            stats=rstats,
        )
        x = resnet_block(x, temb, mid["resnets"][1], num_groups=ng,
                         conv_impl=conv_impl,
                         t_pre=None if tp is None else tp["mid"][1])
        mid_res = conv1x1_tokens(x, params["zero_conv_mid"]) * scale

    return {"down": down, "mid": mid_res}


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _zero_conv1x1(ch: int, *, dtype) -> dict:
    """Zero-initialized 1x1 conv as a token-matmul param dict (the diffusers
    ``zero_module`` convs): a fresh ControlNet is an exact no-op."""
    return {
        "kernel": jnp.zeros((1, 1, ch, ch), dtype=dtype),
        "bias": jnp.zeros((ch,), dtype=dtype),
    }


def init_controlnet(
    key: jax.Array,
    config: UNetConfig,
    *,
    dtype=jnp.float32,
    cond_channels: Tuple[int, ...] = COND_EMBED_CHANNELS,
    conditioning_channels: int = 3,
) -> dict:
    """Random-init ControlNet tree mirroring the diffusers layout: the
    encoder copy is the base UNet init's encoder half; the zero convs and
    the cond-embedding output conv start at exactly zero."""
    from sdtpu.models.unet import init_unet

    host = isinstance(key, (int, hostrng.HostKey))
    key = hostrng.ensure_key(key)
    k_unet, k_cond = hostrng.split(key)
    base = init_unet(k_unet, config, dtype=dtype)
    params = {
        "conv_in": base["conv_in"],
        "time_embedding": base["time_embedding"],
        "down_blocks": base["down_blocks"],
    }
    if "add_embedding" in base:
        params["add_embedding"] = base["add_embedding"]
    if config.mid_block:
        params["mid_block"] = base["mid_block"]
        params["zero_conv_mid"] = _zero_conv1x1(
            config.block_out_channels[-1], dtype=dtype
        )

    # one zero conv per saved skip: conv_in + every resnet(+attn) unit +
    # every downsample — mirrors unet_forward's skip bookkeeping exactly
    zero_convs = [_zero_conv1x1(config.block_out_channels[0], dtype=dtype)]
    for level, ch in enumerate(config.block_out_channels):
        zero_convs.extend(
            _zero_conv1x1(ch, dtype=dtype)
            for _ in range(config.layers_per_block)
        )
        if level < config.num_levels - 1:
            zero_convs.append(_zero_conv1x1(ch, dtype=dtype))
    params["zero_convs"] = zero_convs

    keys = iter(hostrng.split(k_cond, 2 * len(cond_channels)))
    blocks = []
    for i in range(len(cond_channels) - 1):
        blocks.append(init_conv2d(
            next(keys), cond_channels[i], cond_channels[i], 3, dtype=dtype
        ))
        blocks.append(init_conv2d(
            next(keys), cond_channels[i], cond_channels[i + 1], 3, dtype=dtype
        ))
    params["cond_embedding"] = {
        "conv_in": init_conv2d(
            next(keys), conditioning_channels, cond_channels[0], 3, dtype=dtype
        ),
        "blocks": blocks,
        "conv_out": {  # zero_module'd in diffusers
            "kernel": jnp.zeros(
                (3, 3, cond_channels[-1], config.block_out_channels[0]),
                dtype=dtype,
            ),
            "bias": jnp.zeros((config.block_out_channels[0],), dtype=dtype),
        },
    }
    return jax.tree.map(jnp.asarray, params) if host else params
