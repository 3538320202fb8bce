"""Conditional UNet denoiser (reference: ``diffusion.mojo``).

One parameterized implementation covers the Tiny-SD layout the reference
hand-wires as 23 numbered struct fields (``diffusion.mojo:150-273``) as well
as SD 1.5 and SDXL, driven by :class:`sdtpu.config.UNetConfig`:

* ``Time_Embedding`` (``diffusion.mojo:5-21``): sinusoidal timestep embedding
  -> Linear -> SiLU -> Linear, computed once per step outside the blocks;
* ``Unet_Residual_Block`` (``diffusion.mojo:24-72``): GN -> SiLU -> conv3x3,
  add SiLU->Linear(time) broadcast over space, GN -> SiLU -> conv3x3, skip
  (1x1 conv iff channels change, ``diffusion.mojo:70-72``);
* ``Unet_Attention_Block`` (``diffusion.mojo:75-147``): GN(eps=1e-6) ->
  projection -> flatten spatial tokens -> [self-attn, cross-attn(context),
  GeGLU FF] -> projection back + long residual — here the spatial "flatten"
  is a free NHWC reshape (the reference materializes three transposes,
  ``diffusion.mojo:118-124``);
* encoder/decoder wiring with channel-concat skips (``diffusion.mojo:236-272``)
  — concat lands on the NHWC channel (lane) axis, popping the six saved
  activations LIFO (conv_in, per-level block outputs, downsample outputs).

Note: the reference's decoder declares ``RB(1280,640)``/``RB(640,320)`` after
its upsamples (``diffusion.mojo:195,199``), which contradicts its own concat
arithmetic (x=1280 + 640-channel skip = 1920) and only "works" because its
``Upsample`` is dead code (SURVEY.md §5.1 item 2).  We follow the consistent
LIFO skip wiring — (2560,1280),(1920,1280),(1920,640),(960,640),(960,320),
(640,320) — which is exactly the real segmind/tiny-sd (BK-SDM-tiny)
checkpoint layout, so pretrained weights load.

Everything is NHWC / bf16-friendly; GroupNorm stats and attention softmax run
in fp32 islands (see ops/).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sdtpu.config import UNetConfig
from sdtpu.ops import (
    conv2d,
    group_norm,
    init_conv2d,
    init_group_norm,
    init_linear,
    init_transformer_block,
    linear,
    silu,
    timestep_embedding,
    transformer_block,
)
from sdtpu.ops.attention import precompute_transformer_cross_kv

from sdtpu.utils import hostrng


def precompute_time_projections(
    timesteps: jax.Array,
    params: dict,
    config: UNetConfig,
    *,
    batch: int,
    timestep_cond: Optional[jax.Array] = None,
    added_cond: Optional[dict] = None,
    dtype=jnp.bfloat16,
) -> dict:
    """Every time-dependent projection in the UNet, for EVERY scan step.

    The denoise scan's timestep sequence is known before the scan runs, so
    the sinusoidal embedding -> time-MLP chain (``diffusion.mojo:5-21``) and
    the per-resblock ``time_emb_proj`` matmuls (``diffusion.mojo:61-65``) —
    one per resblock per step — can all be computed in ONE batched matmul
    sweep here instead of ~15 small in-scan matmuls per step (XLA cannot
    hoist them: they depend on the scan-carried timestep).  The SDXL
    add-embedding and LCM guidance embedding are constant across steps and
    fold in here too.

    timesteps: (T,) schedule timesteps; batch: the effective UNet batch
    (2B under CFG).  Returns a cache pytree; index step ``i`` via
    ``jax.tree.map(lambda a: a[i], cache)`` and pass as
    ``unet_forward(time_cache=...)``:

      {"temb": (T, batch, time_embed_dim)   # final, SiLU'd
       "down": [[(T, batch, out_ch) per resnet] per level],
       "mid":  [(T, batch, ch)] * 2,
       "up":   [[(T, batch, out_ch) per resnet] per level]}
    """
    T = timesteps.shape[0]
    temb = timestep_embedding(
        timesteps.astype(jnp.float32),
        config.block_out_channels[0],
        flip_sin_to_cos=config.flip_sin_to_cos,
        freq_shift=config.freq_shift,
        dtype=dtype,
    )  # (T, ch0)
    temb = jnp.broadcast_to(temb[:, None, :], (T, batch, temb.shape[-1]))
    # cond_proj presence is per-tree: a ControlNet paired with an LCM UNet
    # has no guidance projection of its own (diffusers semantics)
    if config.time_cond_proj_dim is not None and (
        "cond_proj" in params["time_embedding"]
    ):
        assert timestep_cond is not None, "LCM config requires timestep_cond"
        temb = temb + linear(
            timestep_cond.astype(temb.dtype),
            params["time_embedding"]["cond_proj"],
        )[None]
    temb = linear(temb, params["time_embedding"]["linear_1"])
    temb = silu(temb)
    temb = linear(temb, params["time_embedding"]["linear_2"])

    if config.addition_embed_dim is not None:
        assert added_cond is not None, "SDXL config requires added_cond"
        time_ids = added_cond["time_ids"].reshape(-1)
        tid_emb = timestep_embedding(
            time_ids,
            config.addition_time_embed_dim,
            flip_sin_to_cos=config.flip_sin_to_cos,
            freq_shift=config.freq_shift,
            dtype=dtype,
        ).reshape(batch, -1)
        add_emb = jnp.concatenate(
            [added_cond["text_embeds"].astype(dtype), tid_emb], axis=-1
        )
        aemb = linear(add_emb, params["add_embedding"]["linear_1"])
        aemb = silu(aemb)
        aemb = linear(aemb, params["add_embedding"]["linear_2"])
        temb = temb + aemb[None]

    temb = silu(temb)  # the hoisted per-resblock SiLU (diffusion.mojo:61)

    proj = lambda p: linear(temb, p["time_emb_proj"])  # noqa: E731
    cache = {"temb": temb, "down": [], "mid": [], "up": []}
    for block in params["down_blocks"]:
        cache["down"].append([proj(r) for r in block["resnets"]])
    if config.mid_block:
        cache["mid"] = [proj(r) for r in params["mid_block"]["resnets"]]
    # encoder-only trees (ControlNet) have no up blocks
    for block in params.get("up_blocks", []):
        cache["up"].append([proj(r) for r in block["resnets"]])
    return cache


def precompute_cross_kv(context: jax.Array, params: dict, config: UNetConfig):
    """Cross-attention K/V for EVERY transformer block in the UNet, computed
    once per generation: the text context is constant across the denoise
    scan, and XLA does not hoist the per-step projections (or the Mosaic
    relayout copies they feed) out of the loop itself — measured at
    ~1.4 ms/step in the round-2 XProf trace.

    Returns {"down": [[kv...] per attn block] per level, "mid": [...],
    "up": [...]} mirroring ``unet_forward``'s traversal exactly; pass it as
    ``unet_forward(cross_kv=...)``.  ``context`` should already be in the
    compute dtype (as passed to ``unet_forward``)."""

    def block_kv(attn_params):
        return [
            precompute_transformer_cross_kv(context, b)
            for b in attn_params["blocks"]
        ]

    cache = {"down": [], "mid": [], "up": []}
    for block in params["down_blocks"]:
        cache["down"].append(
            [block_kv(a) for a in block.get("attentions", [])]
        )
    if config.mid_block:
        cache["mid"] = [block_kv(a) for a in params["mid_block"]["attentions"]]
    # encoder-only trees (ControlNet) have no up blocks
    for block in params.get("up_blocks", []):
        cache["up"].append([block_kv(a) for a in block.get("attentions", [])])
    return cache


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _gn_silu(x, params, *, num_groups):
    """GroupNorm -> SiLU.  (On the TPU conv path this pair instead folds
    into the slab conv kernel's affine prologue — see ``resnet_block``.)"""
    return silu(group_norm(x, params, num_groups=num_groups))


def _shortcut(x: jax.Array, params: dict) -> jax.Array:
    """The resblock's 1x1 skip projection (``diffusion.mojo:70-72``) as a
    token matmul (see :func:`sdtpu.ops.conv.conv1x1_tokens`)."""
    if "conv_shortcut" not in params:
        return x
    from sdtpu.ops.conv import conv1x1_tokens

    return conv1x1_tokens(x, params["conv_shortcut"])


def resnet_block(
    x: jax.Array,
    temb: jax.Array,
    params: dict,
    *,
    num_groups: int = 32,
    conv_impl: str = "xla",
    t_pre: Optional[jax.Array] = None,
    emit_stats: bool = False,
):
    """Unet_Residual_Block (``diffusion.mojo:54-72``).

    x: (B, H, W, C_in); temb: (B, time_embed_dim) already SiLU'd once per
    step — the reference re-applies SiLU to the same time vector inside every
    block (``diffusion.mojo:61``); hoisting it is numerically identical.
    ``t_pre``: the scan-hoisted projected time vector (B, C_out) from
    ``precompute_time_projections`` — skips the in-scan ``time_emb_proj``.
    ``emit_stats=True`` returns ``(out, moments)`` — per-channel output
    moments (post skip-add) for the following attention block's GroupNorm
    (None off the slab path / chain disabled; see kernels/conv2d.py).
    """
    t = linear(temb, params["time_emb_proj"]) if t_pre is None else t_pre

    # The quantized path engages at every map size: the int8 slab kernel
    # measures at-or-faster than bf16 at all SD shapes up to 128x128
    # (tools/probe_int8_slab.py; a brief runtime map-size cap here was
    # chasing a measurement artifact — BENCHLOG round-3 post-mortem).
    from sdtpu.utils.quant import (
        conv_bias_deq as qbias,
        float_conv_kernel,
        slab_conv_kernel as conv_kernel,
        slab_quant_kwargs as qkw,
    )

    def _float_kernel(p):
        return float_conv_kernel(p, x.dtype)

    slab = None
    if conv_impl == "gemm":
        from sdtpu.kernels.conv2d import gn_silu_conv3x3_slab, plan_slab

        k1, k2 = conv_kernel(params["conv1"]), conv_kernel(params["conv2"])
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
            slab = (st1, st2)
    if slab is not None:
        # One HBM round trip per conv: the GroupNorm(+t)+SiLU prologue is a
        # per-channel affine inside the kernel (stats run as a tiny XLA
        # reduction fused into the map's producer — measured faster than
        # recomputing stats in-kernel per co-tile at >=640 ch), and the
        # second conv's epilogue consumes the skip add — XLA can't fuse
        # elementwise work around a custom call, so the unfused version
        # paid an extra full-map HBM pass for the residual (BENCHLOG.md).
        # conv1 additionally emits per-channel output moments so norm2's
        # stats derive without re-reading the mid map from HBM (the one
        # stat pass XLA can't fuse — its producer is the Pallas call).
        import sdtpu.kernels.conv2d as _conv2d_mod

        chain = _conv2d_mod.CONV_STATS_CHAIN  # trace-time A/B toggle
        h = gn_silu_conv3x3_slab(
            x, params["norm1"], k1,
            qbias(params["conv1"]), num_groups=num_groups,
            h_tile=slab[0][0], co_tile=slab[0][1], emit_stats=chain,
            **qkw(params["conv1"]),
        )
        h, hstats = h if chain else (h, None)
        out = gn_silu_conv3x3_slab(
            h, params["norm2"], k2,
            qbias(params["conv2"]), num_groups=num_groups, temb=t,
            residual=_shortcut(x, params), stats=hstats, h_tile=slab[1][0],
            co_tile=slab[1][1], emit_stats=chain and emit_stats,
            **qkw(params["conv2"]),
        )
        if emit_stats:
            return out if chain else (out, None)
        return out

    h = _gn_silu(x, params["norm1"], num_groups=num_groups)
    h = conv2d(h, _float_kernel(params["conv1"]), params["conv1"]["bias"],
               padding=1, impl=conv_impl)
    h = h + t.astype(h.dtype)[:, None, None, :]
    h = _gn_silu(h, params["norm2"], num_groups=num_groups)
    h = conv2d(h, _float_kernel(params["conv2"]), params["conv2"]["bias"],
               padding=1, impl=conv_impl)
    out = _shortcut(x, params) + h
    return (out, None) if emit_stats else out


def attention_block(
    x: jax.Array,
    context: jax.Array,
    params: dict,
    *,
    num_heads: int,
    num_groups: int = 32,
    implementation: str = "xla",
    cross_kv: Optional[list] = None,
    pag_tail: int = 0,
    stats=None,
) -> jax.Array:
    """Unet_Attention_Block / diffusers Transformer2D (``diffusion.mojo:112-147``).

    Projections are stored as linear kernels; SD 1.x's 1x1-conv proj_in/out
    collapse to the same matmul on flattened (B, H*W, C) tokens.
    ``cross_kv``: per-transformer-block precomputed cross K/V (scan-hoisted).
    ``pag_tail``: Perturbed-Attention Guidance rows (see
    :func:`sdtpu.ops.attention.transformer_block`).
    ``stats``: producer moments of ``x`` (the preceding resnet's slab
    epilogue) for the GN — skips its full-map stat read.
    """
    b, h, w, c = x.shape
    residual = x
    out = group_norm(x, params["norm"], num_groups=num_groups, eps=1e-6,
                     stats=stats)
    out = out.reshape(b, h * w, c)
    out = linear(out, params["proj_in"])
    for i, block in enumerate(params["blocks"]):
        out = transformer_block(
            out,
            block,
            num_heads=num_heads,
            context=context,
            implementation=implementation,
            cross_kv=None if cross_kv is None else cross_kv[i],
            pag_tail=pag_tail,
        )
    out = linear(out, params["proj_out"])
    return out.reshape(b, h, w, c) + residual


def downsample(x: jax.Array, params: dict) -> jax.Array:
    """Stride-2 3x3 conv (``diffusion.mojo:181,184`` — Conv2D stride (2,2))."""
    return conv2d(x, params["kernel"], params["bias"], stride=2, padding=1)


def upsample(x: jax.Array, params: dict, *, conv_impl: str = "xla") -> jax.Array:
    """Nearest 2x + 3x3 conv — the intended semantics of the reference's dead
    ``Upsample`` (``utils.mojo:1979-2010``, SURVEY.md §5.1 item 2).  On the
    gemm path the upsample fuses into the conv's slab kernel
    (:func:`sdtpu.ops.conv.nearest_up_conv2d`)."""
    from sdtpu.ops.conv import nearest_up_conv2d

    return nearest_up_conv2d(
        x, params["kernel"], params["bias"], impl=conv_impl
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def compute_time_embedding(
    timesteps: jax.Array,
    params: dict,
    config: UNetConfig,
    *,
    batch: int,
    dtype,
    timestep_cond: Optional[jax.Array] = None,
    added_cond: Optional[dict] = None,
) -> jax.Array:
    """One step's full time-MLP chain (``diffusion.mojo:5-21``): sinusoidal
    embedding -> [LCM cond_proj] -> Linear/SiLU/Linear -> [SDXL
    add-embedding] -> the hoisted per-resblock SiLU (``diffusion.mojo:61``).
    Shared by :func:`unet_forward`'s non-cached path and
    :func:`sdtpu.models.controlnet.controlnet_forward` (which owns a trained
    copy of these weights)."""
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (batch,))

    temb = timestep_embedding(
        timesteps,
        config.block_out_channels[0],
        flip_sin_to_cos=config.flip_sin_to_cos,
        freq_shift=config.freq_shift,
        dtype=dtype,
    )
    if config.time_cond_proj_dim is not None and (
        "cond_proj" in params["time_embedding"]
    ):
        assert timestep_cond is not None, "LCM config requires timestep_cond"
        temb = temb + linear(
            timestep_cond.astype(temb.dtype),
            params["time_embedding"]["cond_proj"],
        )
    temb = linear(temb, params["time_embedding"]["linear_1"])
    temb = silu(temb)
    temb = linear(temb, params["time_embedding"]["linear_2"])

    if config.addition_embed_dim is not None:
        assert added_cond is not None, "SDXL config requires added_cond"
        time_ids = added_cond["time_ids"].reshape(-1)
        tid_emb = timestep_embedding(
            time_ids,
            config.addition_time_embed_dim,
            flip_sin_to_cos=config.flip_sin_to_cos,
            freq_shift=config.freq_shift,
            dtype=dtype,
        ).reshape(batch, -1)
        add_emb = jnp.concatenate(
            [added_cond["text_embeds"].astype(dtype), tid_emb],
            axis=-1,
        )
        aemb = linear(add_emb, params["add_embedding"]["linear_1"])
        aemb = silu(aemb)
        aemb = linear(aemb, params["add_embedding"]["linear_2"])
        temb = temb + aemb

    return silu(temb)


def fourier_filter(x: jax.Array, scale: float, threshold: int = 1) -> jax.Array:
    """Low-frequency rescale of an NHWC feature map (FreeU, Si et al. 2023;
    diffusers ``fourier_filter`` semantics): FFT over H/W, scale the
    ``2*threshold``-square center (the lowest frequencies, after fftshift)
    by ``scale``, inverse-FFT.  f32 compute; static-shape mask (a host
    numpy constant XLA folds)."""
    import numpy as np  # host mask: shapes are static under jit

    h, w = x.shape[1], x.shape[2]
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    mask = np.ones((1, h, w, 1), np.float32)
    cr, cc = h // 2, w // 2
    mask[:, cr - threshold:cr + threshold, cc - threshold:cc + threshold] = scale
    xf = xf * mask
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    return jnp.fft.ifftn(xf, axes=(1, 2)).real.astype(x.dtype)


def apply_freeu(rev: int, x: jax.Array, skip: jax.Array, freeu):
    """FreeU's per-concat transform for up block ``rev`` (0 = lowest
    resolution): amplify the backbone's first-half channels by b, low-pass
    the skip features by s.  Blocks past the first two pass through
    (diffusers ``apply_freeu``)."""
    if rev > 1:
        return x, skip
    b1, b2, s1, s2 = freeu
    b, s = (b1, s1) if rev == 0 else (b2, s2)
    half = x.shape[-1] // 2
    x = jnp.concatenate(
        [x[..., :half] * jnp.asarray(b, x.dtype), x[..., half:]], axis=-1
    )
    return x, fourier_filter(skip, s)


def _heads_for_level(config: UNetConfig, channels: int) -> int:
    """SD 1.x fixes 8 heads per level (``diffusion.mojo:239,243,247``);
    SDXL fixes head_dim=64 instead (num_attention_heads == 0 sentinel)."""
    if config.num_attention_heads > 0:
        return config.num_attention_heads
    return channels // 64


def unet_forward(
    latents: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
    params: dict,
    config: UNetConfig,
    *,
    added_cond: Optional[dict] = None,
    timestep_cond: Optional[jax.Array] = None,
    attention_impl: str = "xla",
    conv_impl: str = "xla",
    cross_kv: Optional[dict] = None,
    time_cache: Optional[dict] = None,
    control: Optional[dict] = None,
    freeu=None,
    pag_tail: int = 0,
) -> jax.Array:
    """Predict noise.  latents: (B, H, W, C_in); timesteps: (B,) or scalar;
    context: (B, L, cross_attention_dim).  Returns (B, H, W, C_out).

    ``control``: ControlNet residuals ``{"down": [one per saved skip],
    "mid": array or None}`` from
    :func:`sdtpu.models.controlnet.controlnet_forward` — each ``down``
    entry is added to the corresponding saved skip activation (the decoder
    concat inputs) and ``mid`` to the mid-block output, the diffusers
    composition.

    ``added_cond`` carries SDXL micro-conditioning: ``{"text_embeds": (B, P),
    "time_ids": (B, 6)}``.  ``timestep_cond`` is the LCM guidance-scale
    embedding (B, time_cond_proj_dim), added to the sinusoidal timestep
    embedding through a bias-free projection before the time MLP.
    ``time_cache`` is ONE STEP's slice of ``precompute_time_projections``
    (scan-hoisted time MLP + per-resblock projections); when given,
    ``timesteps``/``timestep_cond``/the SDXL add-embedding inputs are ignored
    — they are already folded in.
    """
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

    x, skips = unet_encode(
        latents, temb, context, params, config,
        attention_impl=attention_impl, conv_impl=conv_impl,
        cross_kv=cross_kv, time_proj=tp, control=control,
        pag_tail=pag_tail,
    )
    return unet_decode(
        x, skips, temb, context, params, config,
        attention_impl=attention_impl, conv_impl=conv_impl,
        cross_kv=cross_kv, time_proj=tp, freeu=freeu,
    )


def unet_encode(
    latents: jax.Array,
    temb: jax.Array,
    context: jax.Array,
    params: dict,
    config: UNetConfig,
    *,
    attention_impl: str = "xla",
    conv_impl: str = "xla",
    cross_kv: Optional[dict] = None,
    time_proj: Optional[dict] = None,
    control: Optional[dict] = None,
    pag_tail: int = 0,
) -> tuple:
    """The UNet's encoder + mid half: returns ``(x, skips)`` — the mid
    output and the saved skip activations (a tuple, decoder-concat order).

    ``pag_tail``: Perturbed-Attention Guidance — the last ``pag_tail``
    batch rows run with identity self-attention at the PAG site: the mid
    block's attention (diffusers' default ``pag_applied_layers=["mid"]``)
    when the model has one, else every attention block at the DEEPEST
    attention level of the encoder (the closest analogue for mid-less
    models like Tiny-SD).

    Split out of :func:`unet_forward` so the pipeline's encoder-feature
    cache (the Faster-Diffusion/DeepCache family: encoder features change
    slowly across adjacent denoising steps) can reuse one key step's
    ``(x, skips)`` for several decoder-only steps.  ``temb`` is the final
    (SiLU'd) time embedding; ``time_proj`` one step's hoisted per-resblock
    projections (``precompute_time_projections``)."""
    tp = time_proj
    ng = config.norm_num_groups
    context = context.astype(latents.dtype)
    # PAG site when there is no mid block: the deepest attention level.
    pag_level = -1
    if pag_tail and not config.mid_block:
        pag_level = max(
            lvl for lvl, has in enumerate(config.attention_levels) if has
        )

    # --- encoder (diffusion.mojo:236-250) ---
    # ControlNet residuals perturb the SAVED skips (the decoder's concat
    # inputs), never the running activation — matching diffusers' wiring.
    ctrl_down = iter(control["down"]) if control is not None else None
    save = (
        (lambda a: a) if ctrl_down is None
        else (lambda a: a + next(ctrl_down).astype(a.dtype))
    )
    x = conv2d(
        latents, params["conv_in"]["kernel"], params["conv_in"]["bias"], padding=1
    )
    skips = [save(x)]
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
                    pag_tail=pag_tail if level == pag_level else 0,
                    stats=rstats,
                )
            skips.append(save(x))
        if "downsample" in block:
            x = downsample(x, block["downsample"])
            skips.append(save(x))

    # --- mid (absent in Tiny-SD; present in SD1.5/SDXL) ---
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
            pag_tail=pag_tail,
            stats=rstats,
        )
        x = resnet_block(x, temb, mid["resnets"][1], num_groups=ng, conv_impl=conv_impl,
                         t_pre=None if tp is None else tp["mid"][1])
        if control is not None and control.get("mid") is not None:
            x = x + control["mid"].astype(x.dtype)
    return x, tuple(skips)


def unet_decode(
    x: jax.Array,
    skips,
    temb: jax.Array,
    context: jax.Array,
    params: dict,
    config: UNetConfig,
    *,
    attention_impl: str = "xla",
    conv_impl: str = "xla",
    cross_kv: Optional[dict] = None,
    time_proj: Optional[dict] = None,
    freeu=None,
) -> jax.Array:
    """The UNet's decoder + output head: consumes :func:`unet_encode`'s
    ``(x, skips)`` (possibly a CACHED earlier step's — the encoder-reuse
    approximation) with the CURRENT step's time embedding/projections.

    ``freeu``: optional (b1, b2, s1, s2) FreeU factors (Si et al. 2023)
    applied at the first two up blocks' skip concats — see
    :func:`apply_freeu`."""
    tp = time_proj
    ng = config.norm_num_groups
    context = context.astype(x.dtype)
    skips = list(skips)

    # --- decoder (diffusion.mojo:252-272): concat skip on channel axis ---
    for rev, block in enumerate(params["up_blocks"]):
        level = config.num_levels - 1 - rev
        ch = config.block_out_channels[level]
        heads = _heads_for_level(config, ch)
        for i, res in enumerate(block["resnets"]):
            skip = skips.pop()
            if freeu is not None:
                x, skip = apply_freeu(rev, x, skip, freeu)
            x = jnp.concatenate([x, skip], axis=-1)
            has_attn = config.attention_levels[level]
            x = resnet_block(x, temb, res, num_groups=ng, conv_impl=conv_impl,
                             t_pre=None if tp is None else tp["up"][rev][i],
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
                        else cross_kv["up"][rev][i]
                    ),
                    stats=rstats,
                )
        if "upsample" in block:
            x = upsample(x, block["upsample"], conv_impl=conv_impl)

    # --- output head (diffusion.mojo:275-291; 32 groups per SD standard,
    # not the reference's 320-group quirk, SURVEY.md §5.1 item 7) ---
    x = _gn_silu(x, params["norm_out"], num_groups=ng)
    return conv2d(
        x, params["conv_out"]["kernel"], params["conv_out"]["bias"], padding=1
    )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_resnet(key, in_ch, out_ch, time_dim, *, dtype):
    k1, k2, k3, k4 = hostrng.split(key, 4)
    params = {
        "norm1": init_group_norm(in_ch, dtype=dtype),
        "conv1": init_conv2d(k1, in_ch, out_ch, 3, dtype=dtype),
        "time_emb_proj": init_linear(k2, time_dim, out_ch, dtype=dtype),
        "norm2": init_group_norm(out_ch, dtype=dtype),
        "conv2": init_conv2d(k3, out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        params["conv_shortcut"] = init_conv2d(k4, in_ch, out_ch, 1, dtype=dtype)
    return params


def _init_attn_block(key, ch, depth, context_dim, *, dtype):
    keys = hostrng.split(key, depth + 2)
    return {
        "norm": init_group_norm(ch, dtype=dtype),
        "proj_in": init_linear(keys[0], ch, ch, dtype=dtype),
        "blocks": [
            init_transformer_block(keys[1 + i], ch, context_dim=context_dim, dtype=dtype)
            for i in range(depth)
        ],
        "proj_out": init_linear(keys[-1], ch, ch, dtype=dtype),
    }


def init_unet(key: jax.Array, config: UNetConfig, *, dtype=jnp.float32) -> dict:
    """Random-init parameter pytree mirroring the diffusers UNet layout."""
    host = isinstance(key, (int, hostrng.HostKey))
    key = hostrng.ensure_key(key)
    keys = iter(hostrng.split(key, 256))
    nk = lambda: next(keys)  # noqa: E731
    time_dim = config.time_embed_dim
    ch0 = config.block_out_channels[0]

    params = {
        "conv_in": init_conv2d(nk(), config.in_channels, ch0, 3, dtype=dtype),
        "time_embedding": {
            "linear_1": init_linear(nk(), ch0, time_dim, dtype=dtype),
            "linear_2": init_linear(nk(), time_dim, time_dim, dtype=dtype),
        },
    }
    if config.time_cond_proj_dim is not None:
        params["time_embedding"]["cond_proj"] = init_linear(
            nk(), config.time_cond_proj_dim, ch0, use_bias=False, dtype=dtype
        )
    if config.addition_embed_dim is not None:
        params["add_embedding"] = {
            "linear_1": init_linear(
                nk(), config.addition_embed_dim, time_dim, dtype=dtype
            ),
            "linear_2": init_linear(nk(), time_dim, time_dim, dtype=dtype),
        }

    # encoder
    down_blocks = []
    out_ch = ch0
    for level, ch in enumerate(config.block_out_channels):
        block = {"resnets": [], "attentions": []}
        for _ in range(config.layers_per_block):
            block["resnets"].append(
                _init_resnet(nk(), out_ch, ch, time_dim, dtype=dtype)
            )
            out_ch = ch
            if config.attention_levels[level]:
                block["attentions"].append(
                    _init_attn_block(
                        nk(),
                        ch,
                        config.transformer_layers_per_block[level],
                        config.cross_attention_dim,
                        dtype=dtype,
                    )
                )
        if level < config.num_levels - 1:
            block["downsample"] = init_conv2d(nk(), ch, ch, 3, dtype=dtype)
        if not block["attentions"]:
            del block["attentions"]
        down_blocks.append(block)
    params["down_blocks"] = down_blocks

    if config.mid_block:
        ch = config.block_out_channels[-1]
        params["mid_block"] = {
            "resnets": [
                _init_resnet(nk(), ch, ch, time_dim, dtype=dtype),
                _init_resnet(nk(), ch, ch, time_dim, dtype=dtype),
            ],
            "attentions": [
                _init_attn_block(
                    nk(),
                    ch,
                    config.transformer_layers_per_block[-1],
                    config.cross_attention_dim,
                    dtype=dtype,
                )
            ],
        }

    # decoder: mirrors the encoder's skip channel bookkeeping
    skip_chs = [ch0]
    for level, ch in enumerate(config.block_out_channels):
        skip_chs.extend([ch] * config.layers_per_block)
        if level < config.num_levels - 1:
            skip_chs.append(ch)

    up_blocks = []
    prev_ch = config.block_out_channels[-1]
    for rev in range(config.num_levels):
        level = config.num_levels - 1 - rev
        ch = config.block_out_channels[level]
        block = {"resnets": [], "attentions": []}
        for _ in range(config.layers_per_block + 1):
            skip_ch = skip_chs.pop()
            block["resnets"].append(
                _init_resnet(nk(), prev_ch + skip_ch, ch, time_dim, dtype=dtype)
            )
            prev_ch = ch
            if config.attention_levels[level]:
                block["attentions"].append(
                    _init_attn_block(
                        nk(),
                        ch,
                        config.transformer_layers_per_block[level],
                        config.cross_attention_dim,
                        dtype=dtype,
                    )
                )
        if level > 0:
            block["upsample"] = init_conv2d(nk(), ch, ch, 3, dtype=dtype)
        if not block["attentions"]:
            del block["attentions"]
        up_blocks.append(block)
    params["up_blocks"] = up_blocks

    params["norm_out"] = init_group_norm(
        config.block_out_channels[0], dtype=dtype
    )
    params["conv_out"] = init_conv2d(
        nk(), config.block_out_channels[0], config.out_channels, 3, dtype=dtype
    )
    return jax.tree.map(jnp.asarray, params) if host else params
