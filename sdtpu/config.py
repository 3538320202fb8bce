"""Model / scheduler / pipeline configuration.

The reference hardcodes every architectural constant inline at construction
sites (``diffusion.mojo:150-273``, ``clip.mojo:56-86``, ``vae.mojo:70-250``)
and exposes runtime knobs as compile-time aliases (``pipeline.mojo:8``) or
keyword arguments of ``generate`` (``pipeline.mojo:13-22``).  Here every
architecture is a frozen dataclass so one parameterized implementation covers
Tiny-SD, SD 1.5, and SDXL, and the runtime knobs live in ``PipelineConfig``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """CLIP text-encoder architecture (reference: ``clip.mojo:56-109``)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    # "quick_gelu" (x * sigmoid(1.702 x), reference clip.mojo:49-50) or "gelu".
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    # SDXL's second encoder (OpenCLIP bigG) reads the penultimate hidden state
    # and adds a text projection; SD 1.x reads the final LayerNorm output.
    use_final_layer_norm_output: bool = True
    projection_dim: Optional[int] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Conditional UNet architecture.

    The default values express the Tiny-SD (BK-SDM-tiny) layout that the
    reference hand-wires in ``diffusion.mojo:150-273``: three resolution
    levels (320/640/1280), one ResBlock+AttnBlock per encoder level
    (``diffusion.mojo:236-250``), two per decoder level
    (``diffusion.mojo:252-272``), 8 attention heads everywhere
    (``diffusion.mojo:239,243,247``), no mid block.  SD 1.5 and SDXL are the
    same code with different constants.
    """

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    # Number of ResBlock(+AttnBlock) units per encoder level; decoder levels
    # get layers_per_block + 1 (matching diffusers' up-block convention and
    # the reference's two-per-level decoder, diffusion.mojo:252-272).
    layers_per_block: int = 1
    # Whether each level carries cross/self attention (False = plain
    # DownBlock2D/UpBlock2D, used by SDXL's outermost level).
    attention_levels: Tuple[bool, ...] = (True, True, True)
    # Transformer depth per level (SDXL uses (1, 2, 10)).
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1)
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    mid_block: bool = False
    norm_num_groups: int = 32
    time_embed_dim_mult: int = 4  # time_embed_dim = block_out[0] * mult
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True
    # SDXL micro-conditioning: projection of pooled text embeds + time ids.
    addition_embed_dim: Optional[int] = None  # 2816 for SDXL base
    addition_time_embed_dim: Optional[int] = None  # 256 for SDXL base
    # LCM-distilled models: guidance scale enters as an embedding through a
    # bias-free cond_proj instead of CFG batching (256 for LCM checkpoints).
    time_cond_proj_dim: Optional[int] = None

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * self.time_embed_dim_mult

    @property
    def num_levels(self) -> int:
        return len(self.block_out_channels)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL architecture (reference: ``vae.mojo:70-250``).

    The reference's VAE deviates from SD semantics (16-group norms,
    ``vae.mojo:42-43``); per SURVEY.md §5.1 we build the intended standard
    SD VAE: 32 groups, mid attention block, (128, 256, 512, 512) widths.
    """

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    # x = mean + eps * std, then * scaling_factor (vae.mojo:118-129, :222).
    scaling_factor: float = 0.18215

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """DDPM scheduler constants (reference: ``sampler.mojo:5-33``).

    The reference defaults to 10 training timesteps for demo speed
    (``sampler.mojo:19``); the SD standard (and our default) is 1000 with the
    same scaled-linear beta schedule.
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # or "linear"
    prediction_type: str = "epsilon"  # or "v_prediction"
    # DDIM / Euler share the betas; selected at the pipeline level.
    steps_offset: int = 0
    # Inference-grid spacing (diffusers semantics): "leading" (SD default),
    # "trailing" (recommended by Lin et al. 2023 — the grid ends at the
    # terminal training timestep), or "linspace".
    timestep_spacing: str = "leading"
    # Zero terminal SNR (Lin et al. 2023): rescale the betas so the last
    # training step carries NO signal.  Only meaningful for v_prediction
    # checkpoints fine-tuned with it; pair with timestep_spacing="trailing"
    # and generate(guidance_rescale=~0.7).
    rescale_betas_zero_snr: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end pipeline preset: architectures + runtime policy."""

    name: str
    # First text encoder; None for bigG-only models (the SDXL refiner).
    clip: Optional[CLIPConfig]
    unet: UNetConfig
    vae: VAEConfig
    scheduler: SchedulerConfig
    # Second text encoder for SDXL (None for SD 1.x / Tiny-SD).
    clip_2: Optional[CLIPConfig] = None
    # SDXL-refiner micro-conditioning: time_ids carry (h, w, crop_top,
    # crop_left, aesthetic_score) — 5 ids, with the aesthetic score split
    # cond/uncond — instead of the base model's 6 size/crop ids
    # (diffusers ``requires_aesthetics_score``).
    requires_aesthetics_score: bool = False
    default_aesthetic_score: float = 6.0
    default_negative_aesthetic_score: float = 2.5
    default_image_size: int = 512
    # Preset-level runtime defaults (``generate`` args left unset fall back
    # here): distilled few-step presets (LCM, SDXL-Turbo) ship with their
    # native sampler/step-count/guidance so ``generate(prompt)`` just works.
    default_steps: int = 25
    default_sampler: str = "ddpm"
    default_cfg: bool = True
    default_cfg_scale: float = 7.5
    # bf16 keeps matmuls/convs on the MXU fast path; fp32 islands are applied
    # inside ops where stats need them (GroupNorm/softmax accumulate in f32).
    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    # "flash" routes UNet/VAE latent attention through the Pallas blockwise
    # kernel (sdtpu/kernels/flash_attention.py); "xla" uses dense attention;
    # "auto" picks flash on TPU backends and xla elsewhere (CPU tests);
    # "ring" runs sequence-parallel ring attention over the mesh axis of an
    # active sdtpu.parallel.ring_context (falls back to dense where the
    # token count doesn't shard — e.g. the 77-token text context).
    attention_impl: str = "auto"
    # "gemm" routes 3x3 stride-1 convs through the Pallas implicit-GEMM
    # kernel (sdtpu/kernels/conv2d.py) with the GN+SiLU(+time) prologue and
    # the bias+residual epilogue fused in-kernel.  Round 1's version was e2e
    # neutral-to-negative (the custom call broke XLA's surrounding fusions);
    # folding the resblock skip into the epilogue made it e2e-positive
    # (BENCHLOG.md round-2 A/B: 13.39 -> 12.99 ms/step vs XLA convs).
    # "auto" picks gemm on TPU backends and xla elsewhere (CPU tests).
    conv_impl: str = "auto"

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)

    @property
    def text_config(self) -> CLIPConfig:
        """The tokenizer-facing text encoder config (clip, or clip_2 for
        bigG-only models like the SDXL refiner)."""
        return self.clip if self.clip is not None else self.clip_2


# ---------------------------------------------------------------------------
# Presets covering the BASELINE configs.
# ---------------------------------------------------------------------------

TINY_SD = PipelineConfig(
    name="segmind/tiny-sd",
    clip=CLIPConfig(),
    unet=UNetConfig(),  # defaults ARE the Tiny-SD layout
    vae=VAEConfig(),
    scheduler=SchedulerConfig(),
)

SD15 = PipelineConfig(
    name="runwayml/stable-diffusion-v1-5",
    clip=CLIPConfig(),
    unet=UNetConfig(
        block_out_channels=(320, 640, 1280, 1280),
        layers_per_block=2,
        attention_levels=(True, True, True, False),
        transformer_layers_per_block=(1, 1, 1, 1),
        num_attention_heads=8,
        cross_attention_dim=768,
        mid_block=True,
    ),
    vae=VAEConfig(),
    scheduler=SchedulerConfig(),
)

# Dedicated inpainting checkpoint (runwayml/stable-diffusion-inpainting):
# SD 1.5 trained with a 9-channel UNet input — noisy latents ++ latent-grid
# mask ++ masked-image latents.  `generate(init_image=..., mask_image=...)`
# routes to the concat wiring automatically (in_channels == 2*latent+1);
# pass strength=1.0 for the standard full-repaint behavior.
SD15_INPAINT = PipelineConfig(
    name="runwayml/stable-diffusion-inpainting",
    clip=CLIPConfig(),
    unet=dataclasses.replace(SD15.unet, in_channels=9),
    vae=VAEConfig(),
    scheduler=SchedulerConfig(),
)

# Instruction-following image editing (timbrooks/instruct-pix2pix): SD 1.5
# trained with an 8-channel UNet input — noisy latents ++ the conditioning
# image's UNSCALED posterior-mode latents — and a third guidance branch
# (image guidance).  `generate("make it a winter scene", init_image=photo,
# image_guidance_scale=1.5)`; routed automatically (in_channels == 2*latent).
IP2P = PipelineConfig(
    name="timbrooks/instruct-pix2pix",
    clip=CLIPConfig(),
    unet=dataclasses.replace(SD15.unet, in_channels=8),
    vae=VAEConfig(),
    scheduler=SchedulerConfig(),
)

SD21 = PipelineConfig(
    name="stabilityai/stable-diffusion-2-1",
    # OpenCLIP ViT-H text encoder: 1024 wide, 23 layers, GELU, penultimate
    # hidden state (diffusers uses num_hidden_layers=23 of the 24-layer tower
    # and reads its final output).
    clip=CLIPConfig(
        hidden_size=1024,
        intermediate_size=4096,
        num_layers=23,
        num_heads=16,
        hidden_act="gelu",
    ),
    unet=UNetConfig(
        block_out_channels=(320, 640, 1280, 1280),
        layers_per_block=2,
        attention_levels=(True, True, True, False),
        transformer_layers_per_block=(1, 1, 1, 1),
        num_attention_heads=0,  # head_dim = 64 at every level
        cross_attention_dim=1024,
        mid_block=True,
    ),
    vae=VAEConfig(),
    scheduler=SchedulerConfig(prediction_type="v_prediction"),
    default_image_size=768,
)

SDXL_BASE = PipelineConfig(
    name="stabilityai/stable-diffusion-xl-base-1.0",
    # SDXL reads the PENULTIMATE hidden state of both encoders
    clip=CLIPConfig(use_final_layer_norm_output=False),
    clip_2=CLIPConfig(
        hidden_size=1280,
        intermediate_size=5120,
        num_layers=32,
        num_heads=20,
        hidden_act="gelu",
        use_final_layer_norm_output=False,
        projection_dim=1280,
    ),
    unet=UNetConfig(
        block_out_channels=(320, 640, 1280),
        layers_per_block=2,
        attention_levels=(False, True, True),
        transformer_layers_per_block=(1, 2, 10),
        num_attention_heads=0,  # SDXL fixes head_dim=64; see models/unet.py
        cross_attention_dim=2048,
        mid_block=True,
        addition_embed_dim=2816,
        addition_time_embed_dim=256,
    ),
    vae=VAEConfig(scaling_factor=0.13025),
    scheduler=SchedulerConfig(),
    default_image_size=1024,
)

# SDXL refiner (stabilityai/stable-diffusion-xl-refiner-1.0): bigG-only
# text encoder (context 1280), 4-level UNet with plain outer levels and
# depth-4 transformers, aesthetic-score micro-conditioning (5 time ids).
# Runs the LOW-noise tail of the schedule on the base model's latents:
#   base.generate(..., denoising_end=0.8, output="latents")
#   refiner.generate(..., latents=lat, denoising_start=0.8)
SDXL_REFINER = PipelineConfig(
    name="stabilityai/stable-diffusion-xl-refiner-1.0",
    clip=None,
    clip_2=SDXL_BASE.clip_2,
    unet=UNetConfig(
        block_out_channels=(384, 768, 1536, 1536),
        layers_per_block=2,
        attention_levels=(False, True, True, False),
        transformer_layers_per_block=(1, 4, 4, 4),
        num_attention_heads=0,  # head_dim = 64 at every level
        cross_attention_dim=1280,
        mid_block=True,
        addition_embed_dim=2560,  # pooled 1280 + 5 time ids x 256
        addition_time_embed_dim=256,
    ),
    vae=VAEConfig(scaling_factor=0.13025),
    scheduler=SchedulerConfig(),
    default_image_size=1024,
    requires_aesthetics_score=True,
)

# SDXL inpainting (diffusers/stable-diffusion-xl-1.0-inpainting-0.1): the
# SDXL base architecture with the 9-channel inpaint input; routed by
# in_channels exactly like sd15-inpaint.
SDXL_INPAINT = PipelineConfig(
    name="diffusers/stable-diffusion-xl-1.0-inpainting-0.1",
    clip=SDXL_BASE.clip,
    clip_2=SDXL_BASE.clip_2,
    unet=dataclasses.replace(SDXL_BASE.unet, in_channels=9),
    vae=SDXL_BASE.vae,
    scheduler=SchedulerConfig(),
    default_image_size=1024,
)

# LCM-distilled SD 1.5 (e.g. SimianLuo/LCM_Dreamshaper_v7): the SD 1.5
# architecture plus the guidance-embedding input (time_cond_proj_dim=256) —
# guidance enters as an embedding (w = cfg_scale - 1), NOT as a CFG batch,
# so the UNet runs batch B (not 2B) at 4-8 steps: BASELINE config 5's
# "few-step distilled" serving shape.
LCM_SD15 = PipelineConfig(
    name="SimianLuo/LCM_Dreamshaper_v7",
    clip=CLIPConfig(),
    unet=dataclasses.replace(SD15.unet, time_cond_proj_dim=256),
    vae=VAEConfig(),
    scheduler=SchedulerConfig(),
    default_steps=4,
    default_sampler="lcm",
    default_cfg=False,       # guidance comes through the embedding
    default_cfg_scale=8.0,   # w = cfg_scale - 1 per the diffusers convention
)

# SDXL-Turbo (stabilityai/sdxl-turbo): adversarially distilled SDXL served
# at 512px, 1-4 Euler steps, guidance off.
SDXL_TURBO = PipelineConfig(
    name="stabilityai/sdxl-turbo",
    clip=SDXL_BASE.clip,
    clip_2=SDXL_BASE.clip_2,
    unet=SDXL_BASE.unet,
    vae=SDXL_BASE.vae,
    scheduler=SchedulerConfig(),
    default_image_size=512,
    default_steps=4,
    default_sampler="euler",
    default_cfg=False,
    default_cfg_scale=1.0,
)

PRESETS = {
    "segmind/tiny-sd": TINY_SD,
    "tiny-sd": TINY_SD,
    "runwayml/stable-diffusion-v1-5": SD15,
    "sd15": SD15,
    "runwayml/stable-diffusion-inpainting": SD15_INPAINT,
    "sd15-inpaint": SD15_INPAINT,
    "timbrooks/instruct-pix2pix": IP2P,
    "instruct-pix2pix": IP2P,
    "ip2p": IP2P,
    "stabilityai/stable-diffusion-2-1": SD21,
    "sd21": SD21,
    "stabilityai/stable-diffusion-xl-base-1.0": SDXL_BASE,
    "sdxl": SDXL_BASE,
    "stabilityai/stable-diffusion-xl-refiner-1.0": SDXL_REFINER,
    "sdxl-refiner": SDXL_REFINER,
    "diffusers/stable-diffusion-xl-1.0-inpainting-0.1": SDXL_INPAINT,
    "sdxl-inpaint": SDXL_INPAINT,
    "SimianLuo/LCM_Dreamshaper_v7": LCM_SD15,
    "lcm-sd15": LCM_SD15,
    "stabilityai/sdxl-turbo": SDXL_TURBO,
    "sdxl-turbo": SDXL_TURBO,
}


def get_preset(name: str) -> PipelineConfig:
    try:
        return PRESETS[name]
    except KeyError:
        raise ValueError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        ) from None


# ---------------------------------------------------------------------------
# Config inference from a diffusers checkpoint directory (its JSON configs).
# ---------------------------------------------------------------------------


def _read_json(path):
    import json

    with open(path) as f:
        return json.load(f)


def _clip_from_json(cfg: dict, *, penultimate: bool) -> CLIPConfig:
    """HF CLIPText(Model|ModelWithProjection) config.json -> CLIPConfig."""
    with_proj = "CLIPTextModelWithProjection" in tuple(
        cfg.get("architectures") or ()
    )
    return CLIPConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        max_length=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        use_final_layer_norm_output=not penultimate,
        projection_dim=cfg.get("projection_dim") if with_proj else None,
    )


def _unet_from_json(cfg: dict) -> UNetConfig:
    """diffusers UNet2DConditionModel config.json -> UNetConfig."""
    bocs = tuple(cfg["block_out_channels"])
    n = len(bocs)
    down = cfg.get(
        "down_block_types", ["CrossAttnDownBlock2D"] * n
    )
    attention_levels = tuple("CrossAttn" in t for t in down)

    # diffusers' `attention_head_dim` is historically the HEAD COUNT for
    # SD 1.x (a plain int, 8) and a per-level list of head counts giving
    # head_dim == 64 for SD 2.x / SDXL (our num_attention_heads == 0
    # sentinel).  `num_attention_heads`, when present, wins.
    heads = cfg.get("num_attention_heads") or cfg.get("attention_head_dim", 8)
    if isinstance(heads, (list, tuple)):
        dims = {
            bocs[i] // heads[i]
            for i in range(n) if attention_levels[i]
        }
        if dims == {64}:
            num_heads = 0  # fixed head_dim=64 sentinel
        elif len({heads[i] for i in range(n) if attention_levels[i]}) == 1:
            num_heads = next(
                heads[i] for i in range(n) if attention_levels[i]
            )
        else:
            raise ValueError(
                f"unsupported per-level attention heads {heads!r} "
                f"(neither head_dim=64 nor a constant head count)"
            )
    else:
        num_heads = int(heads)

    tl = cfg.get("transformer_layers_per_block", 1)
    if not isinstance(tl, (list, tuple)):
        tl = [tl] * n

    lpb = cfg.get("layers_per_block", 2)
    if isinstance(lpb, (list, tuple)):
        if len(set(lpb)) != 1:
            raise ValueError(f"unsupported per-level layers_per_block {lpb!r}")
        lpb = lpb[0]

    addition_embed_dim = None
    if cfg.get("addition_embed_type") == "text_time":
        addition_embed_dim = cfg["projection_class_embeddings_input_dim"]

    return UNetConfig(
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=bocs,
        layers_per_block=lpb,
        attention_levels=attention_levels,
        transformer_layers_per_block=tuple(tl),
        num_attention_heads=num_heads,
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        mid_block=cfg.get("mid_block_type", "UNetMidBlock2DCrossAttn")
        is not None,
        norm_num_groups=cfg.get("norm_num_groups", 32),
        freq_shift=cfg.get("freq_shift", 0),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        addition_embed_dim=addition_embed_dim,
        addition_time_embed_dim=(
            cfg.get("addition_time_embed_dim")
            if addition_embed_dim is not None else None
        ),
        time_cond_proj_dim=cfg.get("time_cond_proj_dim"),
    )


def _vae_from_json(cfg: dict) -> VAEConfig:
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def _scheduler_from_json(cfg: dict) -> SchedulerConfig:
    return SchedulerConfig(
        num_train_timesteps=cfg.get("num_train_timesteps", 1000),
        beta_start=cfg.get("beta_start", 0.00085),
        beta_end=cfg.get("beta_end", 0.012),
        beta_schedule=cfg.get("beta_schedule", "scaled_linear"),
        prediction_type=cfg.get("prediction_type", "epsilon"),
        steps_offset=cfg.get("steps_offset", 0),
        timestep_spacing=cfg.get("timestep_spacing", "leading"),
        rescale_betas_zero_snr=cfg.get("rescale_betas_zero_snr", False),
    )


def config_from_checkpoint(model_dir: str) -> PipelineConfig:
    """Derive a :class:`PipelineConfig` from a diffusers-layout checkpoint
    directory's OWN JSON configs (``unet/config.json``, ``vae/config.json``,
    ``text_encoder[_2]/config.json``, ``scheduler/scheduler_config.json``) —
    so any diffusers SD-family checkpoint loads without a matching preset
    (the preset table only covers the well-known model ids).

    The SDXL refiner's aesthetic-score conditioning is detected from the
    UNet's addition-embedding width: ``proj_class_dim == pooled + 5 * 256``
    (5 time ids) vs the base's 6.
    """
    import os

    unet_path = os.path.join(model_dir, "unet", "config.json")
    if not os.path.isfile(unet_path):
        raise ValueError(
            f"{model_dir!r} is not a diffusers checkpoint directory "
            "(missing unet/config.json)"
        )
    unet = _unet_from_json(_read_json(unet_path))
    vae = _vae_from_json(_read_json(os.path.join(model_dir, "vae", "config.json")))

    te2_path = os.path.join(model_dir, "text_encoder_2", "config.json")
    clip_2 = (
        _clip_from_json(_read_json(te2_path), penultimate=True)
        if os.path.isfile(te2_path) else None
    )
    te_path = os.path.join(model_dir, "text_encoder", "config.json")
    # SDXL-family pipelines read the PENULTIMATE hidden state of the first
    # encoder too (signalled by the presence of a second encoder).
    clip = (
        _clip_from_json(_read_json(te_path), penultimate=clip_2 is not None)
        if os.path.isfile(te_path) else None
    )
    if clip is None and clip_2 is None:
        raise ValueError(f"{model_dir!r} has no text_encoder config")

    sched_path = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    scheduler = (
        _scheduler_from_json(_read_json(sched_path))
        if os.path.isfile(sched_path) else SchedulerConfig()
    )

    requires_aesthetics = False
    if unet.addition_embed_dim is not None and clip_2 is not None:
        pooled = clip_2.projection_dim or clip_2.hidden_size
        n_ids = (unet.addition_embed_dim - pooled) // (
            unet.addition_time_embed_dim or 256
        )
        requires_aesthetics = n_ids == 5

    sample = _read_json(unet_path).get("sample_size", 64)
    downscale = 2 ** (len(vae.block_out_channels) - 1)
    return PipelineConfig(
        name=os.path.basename(model_dir.rstrip("/")) or model_dir,
        clip=clip,
        unet=unet,
        vae=vae,
        scheduler=scheduler,
        clip_2=clip_2,
        requires_aesthetics_score=requires_aesthetics,
        default_image_size=sample * downscale,
        default_cfg=unet.time_cond_proj_dim is None,
        default_sampler=(
            "lcm" if unet.time_cond_proj_dim is not None else "ddpm"
        ),
        default_steps=4 if unet.time_cond_proj_dim is not None else 25,
    )
