"""int8 activation calibration for matmuls whose input range is NOT
norm-pinned (attention out-projections, the GeGLU down-projection).

The analytic int8 scheme (``sdtpu/utils/quant.py``) derives activation
ranges from the GroupNorm/LayerNorm affines — zero calibration data — but
that only covers matmuls that consume a normalized activation.  The three
big un-normalized matmuls per transformer block are served by RUNTIME
per-row scales (``linear_q8_dyn``, ``transformer="full"``), which pays a
per-call VPU abs-max reduction and a per-row rescale.

This module replaces those runtime scales with STATIC per-feature scales
measured on calibration data (the standard PTQ recipe, VERDICT.md round-2
item 2 "calibration from the frozen fixture prompts"):

1. :func:`collect_unet_samples` runs a short REAL denoising trajectory
   (eager DDPM loop) so activations are measured on-distribution;
2. :func:`calibrate_unet_act_ranges` replays samples through the eager
   UNet forward under :func:`sdtpu.ops.linear.activation_capture`,
   max-accumulating per-feature ``|x|`` at every dynamic site;
3. ``quantize_unet_int8(..., transformer="full", act_ranges=ranges)``
   quantizes those sites with symmetric per-feature static scales
   (``s = margin * amax / 127``, zero zero-point) — the same ``linear_q8``
   MXU path as the post-LN matmuls, no runtime range work.

Calibration needs REAL weights to be meaningful; on random weights the
machinery still round-trips exactly (tests/test_calibrate.py).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import UNetConfig


def iter_dynamic_sites(unet_params: dict):
    """Yield ``(path, linear_dict)`` for every un-normalized-input matmul
    that ``transformer="full"`` targets: attn1/attn2 out-projections and
    the GeGLU down-projection of every transformer block.  The path
    convention is shared by the calibrator and the quantizer."""

    def from_attn(prefix: str, attn: dict):
        for bi, b in enumerate(attn["blocks"]):
            yield f"{prefix}.blocks.{bi}.attn1.out", b["attn1"]["out"]
            yield f"{prefix}.blocks.{bi}.attn2.out", b["attn2"]["out"]
            yield f"{prefix}.blocks.{bi}.ff.out", b["ff"]["out"]

    for li, blk in enumerate(unet_params["down_blocks"]):
        for ai, a in enumerate(blk.get("attentions", [])):
            yield from from_attn(f"down_blocks.{li}.attentions.{ai}", a)
    if "mid_block" in unet_params:
        for ai, a in enumerate(unet_params["mid_block"]["attentions"]):
            yield from from_attn(f"mid_block.attentions.{ai}", a)
    for li, blk in enumerate(unet_params["up_blocks"]):
        for ai, a in enumerate(blk.get("attentions", [])):
            yield from from_attn(f"up_blocks.{li}.attentions.{ai}", a)


def collect_unet_samples(
    params: dict,
    config: UNetConfig,
    scheduler_config,
    *,
    context: jax.Array,
    latent_size: int,
    num_steps: int = 6,
    seed: int = 0,
    added_cond: Optional[dict] = None,
) -> Iterable[Tuple[jax.Array, jax.Array, jax.Array]]:
    """A short real denoising trajectory (eager DDPM) yielding
    ``(latents_in, t, context)`` per step — calibration samples measured
    on-distribution rather than at random noise levels.

    ``context`` is the (B, L, D) text conditioning to calibrate against
    (real prompts through the real CLIP for real checkpoints).  Eager by
    design: the activation-capture hook needs concrete values."""
    from sdtpu.models.unet import unet_forward
    from sdtpu.samplers import get_sampler

    sdef = get_sampler("ddpm")
    schedule = sdef.make_schedule(scheduler_config, num_steps, 1.0)
    key = jax.random.key(seed)
    key, k_init = jax.random.split(key)
    batch = context.shape[0]
    lat = jax.random.normal(
        k_init, (batch, latent_size, latent_size, config.in_channels),
        jnp.float32,
    )
    for i in range(num_steps):
        t = jnp.broadcast_to(
            schedule.timesteps[i].astype(jnp.float32), (batch,)
        )
        yield lat, t, context
        eps = unet_forward(
            lat, t, context, params, config, added_cond=added_cond,
        ).astype(jnp.float32)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, lat.shape, jnp.float32)
        lat = sdef.step(schedule, i, lat, eps, noise)


def calibrate_unet_act_ranges(
    params: dict,
    config: UNetConfig,
    samples: Iterable[Tuple[jax.Array, jax.Array, jax.Array]],
    *,
    added_cond: Optional[dict] = None,
) -> Dict[str, np.ndarray]:
    """Replay ``(latents, t, context)`` samples through the EAGER UNet
    forward, capturing per-feature input abs-max at every dynamic site.
    Returns ``{site_path: (features,) float32 amax}`` for
    ``quantize_unet_int8(act_ranges=...)``."""
    from sdtpu.models.unet import unet_forward
    from sdtpu.ops.linear import activation_capture

    site_by_id = {
        id(lin["kernel"]): path
        for path, lin in iter_dynamic_sites(params)
        if "kernel" in lin
    }
    store: Dict[str, np.ndarray] = {}
    with activation_capture(store, site_by_id):
        for lat, t, ctx in samples:
            unet_forward(lat, t, ctx, params, config, added_cond=added_cond)
    return store


def calibrate_pipeline_act_ranges(
    pipe,
    token_ids: np.ndarray,
    *,
    image_size: Optional[int] = None,
    num_steps: int = 6,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """One-call calibration for a pipeline: encode ``token_ids`` (a (B, L)
    batch of calibration prompts — e.g. the frozen fixture prompts) through
    the text encoder(s), run a short eager denoising trajectory, and return
    the captured ranges for ``pipe.quantize_int8(transformer="full",
    act_ranges=...)``.

    Runs EAGERLY — prefer the CPU backend (a relay round trip per op makes
    eager TPU calibration slow; ranges are backend-independent)."""
    from sdtpu.models.clip import clip_encode_windows

    config = pipe.config
    ids = jnp.asarray(np.asarray(token_ids, np.int64))
    parts = []
    pooled2 = None
    if config.clip is not None:
        h, _ = clip_encode_windows(ids, pipe.params["clip"], config.clip)
        parts.append(h.astype(jnp.float32))
    if config.clip_2 is not None:
        h2, pooled2 = clip_encode_windows(
            ids, pipe.params["clip_2"], config.clip_2
        )
        parts.append(h2.astype(jnp.float32))
    context = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]

    added = None
    if config.unet.addition_embed_dim is not None:
        size = image_size or config.default_image_size
        n_ids = 5 if config.requires_aesthetics_score else 6
        base = [size, size, 0, 0, size, size][:n_ids]
        if config.requires_aesthetics_score:
            base[-1] = config.default_aesthetic_score
        added = {
            "text_embeds": pooled2.astype(jnp.float32),
            "time_ids": jnp.tile(
                jnp.asarray(base, jnp.float32)[None], (ids.shape[0], 1)
            ),
        }

    size = image_size or config.default_image_size
    samples = collect_unet_samples(
        pipe.params["unet"], config.unet, config.scheduler,
        context=context,
        latent_size=size // config.vae.downscale_factor,
        num_steps=num_steps, seed=seed, added_cond=added,
    )
    return calibrate_unet_act_ranges(
        pipe.params["unet"], config.unet, samples, added_cond=added
    )
