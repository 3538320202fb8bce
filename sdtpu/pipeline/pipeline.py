"""End-to-end generation pipeline (reference: ``pipeline.mojo``).

Preserves ``generate``'s surface (``pipeline.mojo:13-22``): prompt, negative
("backup") prompt, strength, cfg on/off + scale, inference step count, seed,
optional init image, image size — but compiles the device side into TWO jit
programs with zero host round-trips in between:

1. ``encode+denoise+decode``: CLIP encode (cond and uncond batched), latent
   init, ``lax.scan`` over all timesteps with a CFG-batched UNet (batch 2B —
   replacing the reference's two sequential identical forwards,
   ``pipeline.mojo:96-110``, SURVEY.md §5.1 item 6) and the in-scan DDPM
   step, then VAE decode.  The reference instead runs a host loop per step
   (``pipeline.mojo:87-122``).
2. an img2img variant that first runs the VAE encoder + forward noising
   (``pipeline.mojo:66-79``).

Compiled programs are cached per static shape bucket (image size, step
count, batch, cfg, img2img); timesteps/coefficients are traced arrays, so a
new seed or cfg_scale never recompiles.

All noise comes from ``jax.random`` (N(0,1)) keyed by the user seed — the
reference draws uniform [1, 1e7] "Gaussians" (``utils.mojo:563-575``,
SURVEY.md §5.1 item 4).  Draw order: latent init first, then one draw per
DDPM step.
"""

from __future__ import annotations

import os
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import PipelineConfig, get_preset
from sdtpu.models.clip import clip_encode_windows
from sdtpu.models.unet import unet_forward
from sdtpu.models.vae import vae_decode, vae_encode
from sdtpu.samplers import SamplerDef, get_sampler
from sdtpu.utils.image import from_uint8

# Process-wide compiled-program cache, shared by every pipeline instance
# with an equal (frozen, hashable) PipelineConfig.  Safe because _build's
# closures capture ONLY the config and the program key's static knobs —
# all per-instance state (params, ControlNets, LoRA fusions, int8 trees)
# travels as jit ARGUMENTS, and jax.jit itself retraces when an argument's
# tree structure / shapes / dtypes change.  Two pipelines loaded with
# different weights of the same architecture therefore share executables
# (one compile per program bucket per process — loading a second SDXL
# checkpoint costs zero compiles).
_PROGRAM_CACHE: dict = {}


def clear_program_cache() -> None:
    """Drop every process-wide compiled pipeline program (frees the XLA
    executables once existing pipelines' instance caches are also gone)."""
    _PROGRAM_CACHE.clear()


def _trace_env_fingerprint() -> tuple:
    """SDTPU_* environment knobs are read at TRACE time inside ops/kernels
    (conv-stats chaining, flash block sizes, packed projections, ...).  Two
    same-config pipelines built under different knob settings must not share
    programs — the knobs are part of the global cache key.

    A/B tools also mutate MODULE-LEVEL toggles directly without touching
    os.environ (the documented SDTPU_PACKED_OUT_PROJ pattern), so the live
    module attributes are fingerprinted too — a pipeline built after such a
    mutation must not silently reuse a program traced under the old setting
    (ADVICE r4)."""
    from sdtpu.kernels import conv2d as _conv2d
    from sdtpu.kernels import flash_attention as _flash

    module_toggles = (
        ("conv2d.CONV_STATS_CHAIN", bool(_conv2d.CONV_STATS_CHAIN)),
        ("flash._BLOCK_Q", int(_flash._BLOCK_Q)),
        ("flash._BLOCK_K", int(_flash._BLOCK_K)),
        ("flash._NQ", int(_flash._NQ)),
    )
    return tuple(sorted(
        (k, v) for k, v in os.environ.items() if k.startswith("SDTPU_")
    )) + module_toggles


def rescale_noise_cfg(eps_cfg, eps_text, rescale):
    """CFG-rescale ("Common Diffusion Noise Schedules and Sample Steps are
    Flawed", Lin et al. 2023, eq. 16; diffusers ``guidance_rescale``): shrink
    the CFG-combined noise back toward the text branch's per-sample std to
    fix the overexposure that high guidance scales cause, then blend with
    the unrescaled prediction by ``rescale``.

    Stats are per-sample (all axes but batch), f32.  ``rescale == 0`` is an
    identity, but callers skip the call entirely at 0 so the default
    program is bitwise-untouched."""
    axes = tuple(range(1, eps_cfg.ndim))
    std_text = jnp.std(eps_text.astype(jnp.float32), axis=axes, keepdims=True)
    std_cfg = jnp.std(eps_cfg, axis=axes, keepdims=True)
    factor = jnp.where(std_cfg > 0.0, std_text / std_cfg, 1.0)
    return rescale * (eps_cfg * factor) + (1.0 - rescale) * eps_cfg


class PendingImages:
    """An in-flight :meth:`StableDiffusionPipeline.generate_async` result.

    Holds the un-fetched device array; the program may still be executing.
    ``result()`` blocks on the device->host fetch.  Dispatching generation
    N+1 before fetching N hides the host dispatch/relay/fetch overhead
    (~2 relay RTTs, measured at ~18% of single-shot latency on the tunnel)
    behind device compute — the same trick the ServingEngine worker uses
    (serving.py:_dispatch), exposed to single-shot callers."""

    __slots__ = ("device_images",)

    def __init__(self, device_images):
        self.device_images = device_images

    def result(self) -> np.ndarray:
        return np.asarray(self.device_images)


class StableDiffusionPipeline:
    """Tokenize on host -> run the compiled program -> uint8 images."""

    def __init__(self, config: PipelineConfig, params: dict, tokenizer=None):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.controlnet = None
        self._compiled = {}

    # -- construction -------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        *,
        preset: Optional[str] = None,
        dtype=None,
    ) -> "StableDiffusionPipeline":
        """Load a local diffusers-layout checkpoint directory.

        Config resolution: an explicit ``preset=`` wins; otherwise the
        directory basename is looked up in the preset table (well-known
        model ids keep their tuned runtime defaults); any other diffusers
        checkpoint derives its architecture from its own JSON configs
        (:func:`sdtpu.config.config_from_checkpoint`)."""
        import os

        from sdtpu.config import PRESETS, config_from_checkpoint
        from sdtpu.tokenizer.bpe import CLIPTokenizer
        from sdtpu.utils.weights import load_pipeline_params

        if preset is not None:
            config = get_preset(preset)
        else:
            base = os.path.basename(model_dir.rstrip("/"))
            config = (
                get_preset(base) if base in PRESETS
                else config_from_checkpoint(model_dir)
            )
        if dtype is not None:
            config = config.replace(param_dtype=dtype, compute_dtype=dtype)
        params = load_pipeline_params(model_dir, config)
        tok_dir = os.path.join(model_dir, "tokenizer")
        if not os.path.isdir(tok_dir):
            # bigG-only checkpoints (SDXL refiner) ship only tokenizer_2
            tok_dir = os.path.join(model_dir, "tokenizer_2")
        if os.path.isdir(tok_dir):
            tokenizer = CLIPTokenizer.from_pretrained(tok_dir)
        else:  # fall back to repo assets (tools/prepare_tokenizer.py)
            tokenizer = CLIPTokenizer.from_default_assets()
        return cls(config, params, tokenizer)

    @classmethod
    def from_random(
        cls, preset: Union[str, PipelineConfig], *, seed: int = 0,
        tokenizer="auto",
    ) -> "StableDiffusionPipeline":
        """Random-init weights (benchmarks, tests; perf is weight-value
        independent — the reference only ever runs this way,
        ``utils.mojo:1719-1726``).  ``tokenizer="auto"`` picks up repo
        assets (``assets/tokenizer``, written by tools/prepare_tokenizer.py)
        when present — but only for real-vocab-sized configs, since a tiny
        test CLIP can't embed 49408 ids."""
        from sdtpu.utils.weights import init_pipeline_params

        config = preset if isinstance(preset, PipelineConfig) else get_preset(preset)
        if tokenizer == "auto":
            from sdtpu.tokenizer.bpe import CLIPTokenizer

            tokenizer = CLIPTokenizer.from_default_assets()
            if tokenizer is not None and (
                len(tokenizer.vocab) > config.text_config.vocab_size
            ):
                tokenizer = None
        params = init_pipeline_params(seed, config)
        return cls(config, params, tokenizer)

    def quantize_int8(self, *, vae: Optional[bool] = None,
                      **kw) -> "StableDiffusionPipeline":
        """Quantize the UNet resblock convs to int8 (W8A8) in place.

        On TPU the slab conv kernel then runs its contractions on the MXU's
        2x int8 path (v5e: 394 int8 TOPS vs 197 bf16); off-TPU the convs
        dequantize on the fly (correctness fallback).  CLIP stays float.
        ``transformer=True`` extends to the post-LN transformer
        matmuls (measured perf-neutral on tiny-sd/SD2.1, costs ~1 dB of
        per-op fidelity — measure per preset).  ``vae=True`` extends to the
        VAE decoder's resnet convs (decode runs once per image and gates on
        a direct, non-chaotic PSNR — tests/test_quant.py).  Fidelity:
        per-op + chaos-relative gates on random weights
        (tools/check_int8.py), absolute >= 40 dB PSNR on real weights
        (tools/acceptance.py).  See sdtpu/utils/quant.py.  Attention stays
        bf16 by design: per-tile dynamically-quantized int8 QK/PV flash
        modes measured SLOWER than bf16 at every SD shape on v5e (the
        kernel co-bottlenecks on VPU softmax work at d_pad=128, so the 2x
        int8 MXU path buys nothing while quantize/dequantize adds VPU cost
        — tools/probe_flash_int8.py, BENCHLOG round 3).

        ``vae=None`` (the default) auto-pairs the VAE path on few-step
        presets (``default_steps <= 8``: LCM, SDXL-Turbo): with only a
        handful of denoise steps the int8-UNet-only program sits in a
        measured 1.8x async-copy stall (95.5 ms wall vs 52.9 ms device-busy
        — BENCHLOG round-4 "LCM int8 stall") while int8+vae does not, so
        the pairing is on unless the caller explicitly passes
        ``vae=False``.  Many-step presets default to ``vae=False`` as
        before (decode is amortized over 25+ steps).

        Clears the compiled-program cache.  Returns self."""
        import logging

        from sdtpu.utils.quant import quantize_pipeline_int8

        if vae is None:
            vae = self.config.default_steps <= 8
            if vae:
                logging.getLogger("sdtpu.pipeline").info(
                    "quantize_int8: few-step preset %s — auto-enabling the "
                    "int8 VAE decoder path (avoids the int8-UNet-only "
                    "async-copy stall; pass vae=False to override)",
                    self.config.name,
                )
        self.params = quantize_pipeline_int8(self.params, vae=vae, **kw)
        self._compiled = {}
        return self

    def load_lora(self, lora, *, scale: float = 1.0) -> dict:
        """Fuse a LoRA adapter into the pipeline weights (kohya/sd-scripts
        or diffusers-peft safetensors layout; ``sdtpu/utils/lora.py``).

        Fusion keeps the compiled program byte-identical — same shapes,
        zero per-call adapter cost — so cached executables are reused and
        stacking multiple adapters is just repeated calls.  Apply BEFORE
        :meth:`quantize_int8` (fusing into int8 weights raises).  ``lora``
        is a safetensors path or an already-loaded ``{key: array}``
        mapping; ``scale`` is the usual LoRA strength multiplier.  Returns
        a report dict (``applied`` count, ``skipped``/``unrecognized``
        keys) for caller logging."""
        from sdtpu.utils.lora import apply_lora
        from sdtpu.utils.weights import load_safetensors

        sd = load_safetensors(lora) if isinstance(lora, str) else lora
        self.params, report = apply_lora(self.params, sd, scale=scale)
        # keep the pre-fuse kernels (first-write-wins per module) so
        # unload_loras can restore EXACTLY — the adapter-swap primitive
        if not hasattr(self, "_lora_originals"):
            self._lora_originals = {}
        for key, orig in report.pop("originals").items():
            self._lora_originals.setdefault(key, orig)
        # commit to device: host-numpy leaves re-transfer through the relay
        # on every call (the round-3 int8 "pathology" — BENCHLOG)
        self.params = jax.tree.map(jnp.asarray, self.params)
        return report

    def unload_loras(self) -> int:
        """Remove every fused LoRA adapter, restoring the pre-fuse kernels
        bit-exactly (snapshotted per touched module at :meth:`load_lora`
        time — only the adapted linears/convs are kept, not a full tree
        copy).  Swap adapters between requests with
        ``pipe.unload_loras(); pipe.load_lora(other)`` — the compiled
        programs are shape-identical throughout, so no recompile.  Returns
        the number of modules restored."""
        originals = getattr(self, "_lora_originals", {})
        if not originals:
            return 0
        from sdtpu.utils.lora import restore_weights

        self.params = restore_weights(self.params, originals)
        self.params = jax.tree.map(jnp.asarray, self.params)
        self._lora_originals = {}
        return len(originals)

    def load_controlnet(self, controlnet) -> "StableDiffusionPipeline":
        """Attach a ControlNet (``sdtpu/models/controlnet.py``) for
        spatially-conditioned generation: pass ``control_image=`` to
        :meth:`generate` / ``control_images=`` to :meth:`generate_batch`.

        ``controlnet`` is a diffusers ``ControlNetModel`` safetensors path /
        model directory (e.g. ``lllyasviel/sd-controlnet-canny``, loaded via
        ``sdtpu.utils.weights.load_controlnet_params`` against THIS
        pipeline's UNet config) or an already-built parameter pytree
        (``init_controlnet`` in tests) — or a LIST of either for
        multi-ControlNet (diffusers ``MultiControlNetModel`` semantics: one
        control image per net, residuals summed; per-net scales via a
        ``controlnet_scale`` list).  The ControlNet rides every UNet
        optimization — slab conv kernels, flash attention, scan-hoisted time
        projections and cross-attention K/V.  Programs without a control
        image are unaffected (the tree travels as a separate jit argument
        only when a control image is given).  Returns self."""
        def load_one(cn):
            if isinstance(cn, str):
                from sdtpu.utils.weights import load_controlnet_params

                cn = load_controlnet_params(
                    cn, self.config.unet, dtype=self.config.param_dtype
                )
            return jax.tree.map(jnp.asarray, cn)

        if isinstance(controlnet, (list, tuple)):
            self.controlnet = [load_one(c) for c in controlnet]
        else:
            self.controlnet = load_one(controlnet)
        return self

    def _controlnets(self) -> list:
        """The loaded ControlNet(s) as a list (single nets stay a dict on
        ``self.controlnet`` so callers/tests can poke the tree directly)."""
        return (
            list(self.controlnet)
            if isinstance(self.controlnet, (list, tuple))
            else [self.controlnet]
        )

    @staticmethod
    def _control_args(nets, control_image, controlnet_scale):
        """Normalize (control_image, controlnet_scale) against the loaded
        net count: returns (list of maps, list of float scales)."""
        imgs = (
            list(control_image)
            if isinstance(control_image, (list, tuple))
            else [control_image]
        )
        if len(imgs) != len(nets):
            raise ValueError(
                f"{len(nets)} ControlNet(s) loaded but {len(imgs)} control "
                "image(s) given — multi-ControlNet needs one map per net"
            )
        scales = (
            list(controlnet_scale)
            if isinstance(controlnet_scale, (list, tuple))
            else [controlnet_scale] * len(nets)
        )
        if len(scales) != len(nets):
            raise ValueError(
                "controlnet_scale list must match the number of ControlNets"
            )
        return imgs, [float(s) for s in scales]

    def load_textual_inversion(self, embeds, *, token=None) -> dict:
        """Load textual-inversion concept embeddings
        (``sdtpu/utils/textual_inversion.py``): appends the learned
        vectors to the CLIP token-embedding table(s) and registers the
        placeholder with the tokenizer, so prompts can use it directly
        (multi-vector concepts expand to one id per vector).  ``embeds``
        is a safetensors path or a loaded mapping; ``token`` names the
        placeholder for layouts that don't carry it (``emb_params`` /
        dual-encoder SDXL files).  Returns ``{placeholder: [token ids]}``
        — ``token_ids``-level callers splice those in themselves."""
        from sdtpu.utils.textual_inversion import apply_textual_inversion
        from sdtpu.utils.weights import load_safetensors

        sd = load_safetensors(embeds) if isinstance(embeds, str) else embeds
        self.params, registered = apply_textual_inversion(
            self.params, sd, token=token)
        self.params = jax.tree.map(jnp.asarray, self.params)
        if self.tokenizer is not None:
            for placeholder, ids in registered.items():
                self.tokenizer.add_placeholder(placeholder, ids)
        return registered

    # -- public API (pipeline.mojo:13-22 surface) ----------------------------

    def generate(
        self,
        prompt: str,
        negative_prompt: str = "",
        *,
        strength: float = 0.9,
        cfg: Optional[bool] = None,
        cfg_scale: Optional[float] = None,
        num_inference_steps: Optional[int] = None,
        seed: int = 0,
        init_image: Optional[np.ndarray] = None,
        mask_image: Optional[np.ndarray] = None,
        image_size: Optional[int] = None,
        token_ids: Optional[np.ndarray] = None,
        sampler: Optional[str] = None,
        num_images: int = 1,
        latents: Optional[np.ndarray] = None,
        rng: str = "jax",
        output: str = "uint8",
        clip_skip: int = 0,
        prompt_weighting: bool = False,
        token_weights: Optional[np.ndarray] = None,
        control_image: Optional[np.ndarray] = None,
        controlnet_scale: float = 1.0,
        denoising_end: Optional[float] = None,
        denoising_start: Optional[float] = None,
        image_guidance_scale: float = 1.5,
        guidance_rescale: float = 0.0,
        pag_scale: float = 0.0,
        freeu=None,
        encoder_cache_interval: int = 1,
        verbose: bool = False,
    ):
        """Text->image (or image->image when ``init_image`` is given).

        ``pag_scale``: Perturbed-Attention Guidance (Ahn et al. 2024,
        "Self-Rectifying Diffusion Sampling with PAG"; diffusers
        ``pag_scale``) — adds a third guidance branch whose mid-block
        self-attention is replaced by identity attention, and steers away
        from it: eps = uncond + cfg_scale*(cond - uncond) +
        pag_scale*(cond - perturbed).  Works with cfg=False too
        (eps = cond + pag_scale*(cond - perturbed)).  Static knob like
        ``guidance_rescale`` (changing it recompiles).  Typical values
        2.0-5.0; incompatible with InstructPix2Pix editing checkpoints
        (their 3-branch guidance already owns the extra rows).

        ``control_image`` (requires :meth:`load_controlnet`): an (H, W, 3)
        uint8 / [0,1] float control map (canny edges, depth, pose, ...) —
        the ControlNet's residuals steer every denoising step.
        ``controlnet_scale`` multiplies them (a traced scalar: changing it
        never recompiles).  Composes with img2img / inpainting / CFG.
        Multi-ControlNet: load a list of nets, pass one map per net
        (``control_image=[edges, depth]``) and optionally one scale per net
        — residuals sum (diffusers ``MultiControlNetModel`` semantics).

        ``denoising_end`` / ``denoising_start``: the SDXL base->refiner
        handoff (diffusers semantics — the schedule splits at the training
        -timestep cutoff ``round(N - frac*N)``).  The base runs the
        high-noise head and returns its carry
        (``denoising_end=0.8, output="latents"``); the refiner pipeline
        consumes it (``latents=..., denoising_start=0.8``) and runs the
        low-noise tail — no re-noising, same sampler family on both sides.
        With one model and a deterministic sampler, a split run is
        bit-exact with the unsplit run (tests/test_refiner.py).

        ``guidance_rescale``: CFG-rescale factor in [0, 1] (Lin et al.
        2023; diffusers semantics — ``rescale_noise_cfg``).  0 (default)
        leaves the program untouched; nonzero values compile a new program
        (it is a static quality knob, fixed per deployment).

        ``freeu``: (b1, b2, s1, s2) FreeU factors (Si et al. 2023;
        diffusers ``enable_freeu``) — amplify the UNet backbone's first-half
        channels and low-pass the skip features in the two lowest-resolution
        up blocks.  Recommended: (1.5, 1.6, 0.9, 0.2) for SD 1.x,
        (1.3, 1.4, 0.9, 0.2) for SDXL.  Static knob like guidance_rescale.

        ``encoder_cache_interval``: encoder-feature reuse (the Faster
        Diffusion / DeepCache approximation — encoder+mid features change
        slowly across adjacent steps).  ``k > 1`` runs the UNet encoder
        once per group of k steps and decoder-only (with the current
        step's time projections) in between — ~(k-1)/k of the encoder+mid
        cost saved at a QUALITY cost that must be validated on real
        weights; any ``steps % k`` remainder runs full at the end.
        Default 1 (off).  Incompatible with ControlNet (its residuals
        enter the cached encoder).

        ``image_guidance_scale``: InstructPix2Pix editing checkpoints
        (``in_channels == 2*latent``, e.g. timbrooks/instruct-pix2pix)
        treat ``init_image`` as the image to EDIT per the prompt: three
        guidance branches [text+image, image-only, unconditional] combined
        with (cfg_scale, image_guidance_scale) — both traced scalars, so
        changing either never recompiles.  ``strength`` is ignored there
        (the edit model denoises from pure noise).

        ``mask_image`` (with ``init_image``) switches to INPAINTING: only
        the masked region (mask > 0 — white pixels / 1.0 floats) is
        regenerated from the prompt; the rest of the init image is
        preserved.  Blend semantics: after each step the preserved region
        is overwritten with the init latents forward-noised to the step
        the carry is at (one fused elementwise op per step), and the final
        step blends with the CLEAN init latents — i.e. the modern
        non-inpaint-checkpoint diffusers blend with exact preservation,
        not the legacy pipeline's same-t blend.

        ``token_ids`` bypasses the tokenizer (pre-tokenized prompts; also the
        benchmarking path when no vocab asset is installed).  ``sampler``:
        "ddpm" (reference semantics), "ddim", "euler", "lcm", "dpm++", or
        the Karras-sigma variants "euler-karras" / "dpm++-karras".
        ``clip_skip``: condition on the hidden state N layers before the
        text encoder's usual output (diffusers semantics; ``clip_skip=1``
        = the community "CLIP skip 2"; the tail layers still run for the
        pooled output, see ``models/clip.py``).
        ``prompt_weighting``: parse ``(word:1.3)`` / ``[word]`` emphasis
        syntax (``utils/prompt_weighting.py``) and scale each token's
        encoded hidden state by its weight (renormalized to the unweighted
        per-row mean magnitude); needs the tokenizer.  ``token_weights``: the pre-tokenized
        equivalent — one float per token id row, paired with
        ``token_ids``.  ``output``:
        "uint8" (default), "float" ([-1,1] array), "latents", or "device"
        (un-fetched uint8-packed device array — see ``generate_async``).
        ``verbose`` logs structured stage timings (compile vs execute) —
        the build's replacement for the reference's bare progress prints
        (``pipeline.mojo:55,68,84,122,126``).

        ``latents``: pre-drawn initial noise (B, H/8, W/8, C), bypassing the
        in-jit draw — the numerical-parity affordance for A/B against
        diffusers under torch RNG (SURVEY.md §7 "hard parts": JAX RNG != torch
        RNG, so exact-fidelity comparisons feed the same noise fixture to
        both).  txt2img only.

        ``rng="torch"``: draw the initial latents EXACTLY as diffusers does —
        ``torch.randn((B, C, h, w), generator=manual_seed(seed))`` NCHW, then
        transposed — so with real weights and a deterministic sampler the
        same seed reproduces the same image as the diffusers pipeline.
        txt2img + deterministic samplers (per-step variance noise still comes
        from jax.random for stochastic samplers)."""
        import logging
        import time as _time

        log = logging.getLogger("sdtpu.pipeline")
        t_start = _time.perf_counter()
        # unset runtime knobs fall back to the preset's native defaults
        # (distilled presets ship few-step samplers with guidance embedding)
        cfg = self.config.default_cfg if cfg is None else cfg
        cfg_scale = (
            self.config.default_cfg_scale if cfg_scale is None else cfg_scale
        )
        num_inference_steps = (
            self.config.default_steps
            if num_inference_steps is None
            else num_inference_steps
        )
        sampler = sampler or self.config.default_sampler
        if not 0.0 < strength <= 1.0:
            raise ValueError("strength must be in (0, 1]")  # pipeline.mojo:23-29
        if num_inference_steps < 1:
            raise ValueError("num_inference_steps must be >= 1")
        size = image_size or self.config.default_image_size
        if size <= 0 or size % (self.config.vae.downscale_factor) != 0:
            raise ValueError(
                f"image_size must be a positive multiple of "
                f"{self.config.vae.downscale_factor}"
            )  # pipeline.mojo:8

        if denoising_start is not None:
            if latents is None:
                raise ValueError(
                    "denoising_start consumes a base model's latents — pass "
                    "latents= (base run: denoising_end=..., output='latents')"
                )
            if not 0.0 < denoising_start < 1.0:
                raise ValueError("denoising_start must be in (0, 1)")
        if denoising_end is not None and not 0.0 < denoising_end < 1.0:
            raise ValueError("denoising_end must be in (0, 1)")
        if num_images > 1 and (
            denoising_end is not None or denoising_start is not None
        ):
            raise ValueError(
                "denoising_end/denoising_start are single-image (the "
                "base->refiner handoff carries explicit latents)"
            )

        if num_images > 1:
            if init_image is not None:
                init_images = [init_image] * num_images
            else:
                init_images = None
            return self.generate_batch(
                [prompt] * num_images,
                negative_prompt,
                cfg=cfg,
                cfg_scale=cfg_scale,
                num_inference_steps=num_inference_steps,
                seeds=[seed + i for i in range(num_images)],
                image_size=image_size,
                token_ids=(
                    np.tile(np.asarray(token_ids)[:1], (num_images, 1))
                    if token_ids is not None else None
                ),
                sampler=sampler,
                init_images=init_images,
                mask_images=(
                    [mask_image] * num_images
                    if mask_image is not None else None
                ),
                strength=strength,
                output=output,
                clip_skip=clip_skip,
                prompt_weighting=prompt_weighting,
                token_weights=(
                    np.tile(
                        np.asarray(token_weights, np.float32).reshape(1, -1),
                        (num_images, 1),
                    )
                    if token_weights is not None else None
                ),
                control_images=(
                    [control_image] * num_images
                    if control_image is not None else None
                ),
                controlnet_scale=controlnet_scale,
                image_guidance_scale=image_guidance_scale,
                guidance_rescale=guidance_rescale,
                pag_scale=pag_scale,
                freeu=freeu,
                encoder_cache_interval=encoder_cache_interval,
            )

        ids = self._tokenize(prompt, negative_prompt, cfg, token_ids,
                             weighted=prompt_weighting)
        weights = None
        if prompt_weighting:
            ids, weights = ids
        elif token_weights is not None:
            if token_ids is None:
                raise ValueError("token_weights requires token_ids")
            tw = np.asarray(token_weights, np.float32)
            if tw.ndim == 1:
                tw = tw[None]
            weights = np.ones(ids.shape, np.float32)
            weights[: tw.shape[0]] = tw
        is_img2img = init_image is not None
        if mask_image is not None and not is_img2img:
            raise ValueError("mask_image requires init_image (inpainting)")
        is_edit = is_img2img and (
            self.config.unet.in_channels
            == 2 * self.config.vae.latent_channels
        )
        if is_edit and mask_image is not None:
            raise ValueError(
                "editing checkpoints (InstructPix2Pix) take no mask"
            )
        if rng == "torch":
            if is_img2img or latents is not None:
                raise ValueError("rng='torch' is txt2img-only")
            import torch as _torch

            g = _torch.Generator().manual_seed(seed)
            lat_hw = size // self.config.vae.downscale_factor
            latents = (
                _torch.randn(
                    (1, self.config.vae.latent_channels, lat_hw, lat_hw),
                    generator=g,
                )
                .numpy()
                .transpose(0, 2, 3, 1)
            )
        elif rng != "jax":
            raise ValueError(f"unknown rng {rng!r} (expected 'jax' or 'torch')")
        if latents is not None and is_img2img:
            raise ValueError("latents injection is txt2img-only")
        has_control = control_image is not None
        if has_control and self.controlnet is None:
            raise ValueError(
                "control_image requires a ControlNet — call "
                "pipe.load_controlnet(...) first"
            )
        if encoder_cache_interval < 1:
            raise ValueError("encoder_cache_interval must be >= 1")
        if encoder_cache_interval > 1 and has_control:
            raise ValueError(
                "encoder_cache_interval is incompatible with ControlNet "
                "(the control residuals enter the cached encoder half)"
            )
        self._check_guidance_rescale(guidance_rescale, cfg, is_edit)
        self._check_pag(pag_scale, is_edit)
        freeu = self._check_freeu(freeu)
        # edit models denoise from pure noise: strength never truncates
        strength_key = (
            1.0 if (is_edit or not is_img2img) else round(strength, 6)
        )
        fn = self._get_compiled(
            size, num_inference_steps, cfg, is_img2img, strength_key,
            ids.shape[0], sampler, has_latents=latents is not None,
            want_latents=output == "latents",
            want_uint8=output in ("uint8", "device"),
            has_mask=mask_image is not None,
            clip_skip=clip_skip,
            has_weights=weights is not None,
            has_control=has_control,
            denoising_end=denoising_end,
            denoising_start=denoising_start,
            encoder_cache=encoder_cache_interval,
            guidance_rescale=guidance_rescale,
            pag_scale=pag_scale,
            freeu=freeu,
        )
        ids_arg = ids if weights is None else (ids, weights)

        # seed and cfg_scale travel as HOST scalars into the jit call (the
        # key is built in-jit): eager jax.random.key / jnp.float32 each cost
        # a device round trip through the relay before the real dispatch
        seed_arr = np.uint32(seed)
        cfg_scale_arr = (
            (np.float32(cfg_scale), np.float32(image_guidance_scale))
            if is_edit and cfg else np.float32(cfg_scale)
        )
        pos = []
        if is_img2img:
            pos.append(self._prep_image(init_image, size))
            if mask_image is not None:
                pos.append(self._prep_mask(mask_image, size))
        elif latents is not None:
            lat0 = np.asarray(latents, np.float32)
            if lat0.ndim == 3:
                lat0 = lat0[None]
            pos.append(lat0)
        if has_control:
            nets = self._controlnets()
            imgs_c, scales_c = self._control_args(
                nets, control_image, controlnet_scale
            )
            images = fn(
                {**self.params, "controlnet": nets}, ids_arg, *pos,
                [self._prep_control(im, size) for im in imgs_c],
                cfg_scale_arr,
                [np.float32(s) for s in scales_c], seed_arr,
            )
        else:
            images = fn(self.params, ids_arg, *pos, cfg_scale_arr, seed_arr)

        if output == "device":
            # raw uint8-packed device array, NOT fetched — the caller can
            # dispatch the next program before blocking on this one (see
            # generate_async / PendingImages)
            return images
        if output == "float":
            result = np.asarray(images, dtype=np.float32)
        else:  # "latents" or device-packed "uint8"
            result = np.asarray(images)
        if verbose:
            log.info(
                "generate: %dx%d %s steps=%d cfg=%s sampler=%s seed=%d "
                "wall=%.3fs",
                size, size, "img2img" if is_img2img else "txt2img",
                num_inference_steps, cfg, sampler, seed,
                _time.perf_counter() - t_start,
            )
        return result

    def generate_async(
        self, prompt: str, negative_prompt: str = "", **kwargs
    ) -> PendingImages:
        """Dispatch a generation WITHOUT blocking on the device->host fetch.

        Returns a :class:`PendingImages`; call ``.result()`` for the uint8
        images.  Sequential callers overlap host overhead with device
        compute by dispatching request N+1 before fetching N::

            pending = pipe.generate_async(prompt, seed=0)
            for seed in range(1, n):
                nxt = pipe.generate_async(prompt, seed=seed)
                image = pending.result()   # N computes while N+1 is queued
                pending = nxt
            last = pending.result()

        The single-shot host slice (~2 relay RTTs + dispatch, ~18% of e2e
        latency on the tunnel) hides behind the next program's compute —
        the ServingEngine's pipelined-dispatch trick for plain ``generate``
        callers (VERDICT.md round-2 item 4)."""
        if kwargs.get("output", "device") != "device":
            raise ValueError("generate_async implies output='device'")
        kwargs["output"] = "device"
        return PendingImages(self.generate(prompt, negative_prompt, **kwargs))

    def generate_hires(
        self,
        prompt: str,
        negative_prompt: str = "",
        *,
        image_size: Optional[int] = None,
        base_size: Optional[int] = None,
        hires_strength: float = 0.7,
        **kwargs,
    ):
        """Two-pass high-resolution fix (the A1111 "hires fix" workflow):
        txt2img at ``base_size`` (the resolution the checkpoint composes
        well at), bilinear-upscale in float pixel space, then img2img
        refinement at ``image_size`` with ``hires_strength``.  SD 1.x
        checkpoints were trained at 512px — direct txt2img at 1024px
        duplicates subjects; this is the standard recipe around that.

        ``base_size`` defaults to half the target (rounded to a multiple of
        8).  All other ``generate`` kwargs apply to BOTH passes (samplers,
        PAG, FreeU, ControlNet maps are size-agnostic ``generate`` inputs);
        ``output`` applies to the final pass only.  ``num_images > 1`` runs
        pass 2 once per row through ONE compiled batch-1 img2img program
        (a shared context can't batch against N init rows in one trace)."""
        from sdtpu.utils.image import bilinear_resize

        size = image_size or self.config.default_image_size
        if base_size is None:
            base_size = max(64, (size // 2) // 8 * 8)
        if base_size % 8 or size % 8:
            raise ValueError("image_size/base_size must be multiples of 8")
        if base_size >= size:
            raise ValueError("base_size must be smaller than image_size")
        for bad in ("init_image", "mask_image", "latents"):
            if kwargs.pop(bad, None) is not None:
                raise ValueError(f"generate_hires owns {bad}")
        kwargs.pop("strength", None)  # pass 2 uses hires_strength
        output = kwargs.pop("output", "uint8")
        num_images = int(kwargs.pop("num_images", 1) or 1)
        if num_images > 1 and output == "device":
            raise ValueError(
                "generate_hires(num_images>1) fetches per-row results; use "
                "output='uint8' or 'float'"
            )
        base = self.generate(
            prompt, negative_prompt, image_size=base_size, output="float",
            num_images=num_images, **kwargs,
        )
        # host-side upscale: an eager device resize would cost a relay
        # dispatch per generation on the tunnel backend
        up = bilinear_resize(np.asarray(base), size, size)
        if num_images == 1:
            return self.generate(
                prompt, negative_prompt, image_size=size,
                init_image=up, strength=hires_strength,
                output=output, **kwargs,
            )
        seed = kwargs.pop("seed", 0)
        outs = [
            self.generate(
                prompt, negative_prompt, image_size=size,
                init_image=up[i:i + 1], strength=hires_strength,
                output=output, seed=seed + i, **kwargs,
            )
            for i in range(num_images)
        ]
        return np.concatenate([np.asarray(o) for o in outs], axis=0)

    def generate_batch(
        self,
        prompts,
        negative_prompt="",  # str for the whole batch, or one str per prompt
        *,
        cfg: Optional[bool] = None,
        cfg_scale: Optional[float] = None,
        num_inference_steps: Optional[int] = None,
        seed: int = 0,
        seeds=None,
        image_size: Optional[int] = None,
        token_ids: Optional[np.ndarray] = None,
        sampler: Optional[str] = None,
        init_images: Optional[np.ndarray] = None,
        mask_images=None,
        strength: float = 0.9,
        mesh=None,
        output: str = "uint8",
        clip_skip: int = 0,
        prompt_weighting: bool = False,
        token_weights: Optional[np.ndarray] = None,
        control_images=None,
        controlnet_scale: float = 1.0,
        image_guidance_scale: float = 1.5,
        guidance_rescale: float = 0.0,
        pag_scale: float = 0.0,
        freeu=None,
        encoder_cache_interval: int = 1,
    ):
        """Batched txt2img serving: B prompts -> (B, H, W, 3) in ONE compiled
        CFG-batched (2B) program — the large-batch few-step serving path
        (BASELINE config 5).  The reference is hardwired to batch 1
        (``pipeline.mojo:12``).

        ``prompt_weighting`` parses ``(word:1.3)`` emphasis syntax in every
        prompt (and negative prompt); ``token_weights`` is the pre-tokenized
        per-row equivalent, (B, L) floats aligned with ``token_ids`` (the
        CFG uncond rows weigh 1.0).  See :meth:`generate`.

        ``mesh``: a ``jax.sharding.Mesh`` with a "dp" axis — inputs are
        sharded over dp (params replicated, or tp-sharded if the caller
        pre-placed them with ``sdtpu.parallel.shard_params_tp``) and GSPMD
        partitions the whole program across chips.  B must divide the dp size.

        ``seeds`` (one per prompt) switches to per-request RNG: each row's
        image depends only on its own seed, independent of how requests were
        batched — required for the micro-batching server
        (:mod:`sdtpu.pipeline.serving`).  ``seed`` is the batch-level
        fallback."""
        cfg = self.config.default_cfg if cfg is None else cfg
        cfg_scale = (
            self.config.default_cfg_scale if cfg_scale is None else cfg_scale
        )
        num_inference_steps = (
            self.config.default_steps
            if num_inference_steps is None
            else num_inference_steps
        )
        sampler = sampler or self.config.default_sampler
        size = image_size or self.config.default_image_size
        if num_inference_steps < 1:
            raise ValueError("num_inference_steps must be >= 1")
        if size <= 0 or size % self.config.vae.downscale_factor != 0:
            raise ValueError(
                f"image_size must be a positive multiple of "
                f"{self.config.vae.downscale_factor}"
            )
        max_len = self.config.text_config.max_length
        # negative_prompt: one string for the whole batch, or one per
        # prompt (the micro-batching server coalesces requests with
        # DIFFERENT negative prompts — each row gets its own uncond).
        # Resolved up front: cond and uncond rows tokenize TOGETHER so long
        # prompts chunk to one shared window count (_encode_rows).
        negs = None
        if cfg:
            negs = (
                list(negative_prompt)
                if isinstance(negative_prompt, (list, tuple))
                else [negative_prompt] * len(prompts)
            )
        cond_w = uncond = uncond_w = None
        n_prompts = len(prompts)
        if prompt_weighting:
            if token_ids is not None:
                raise ValueError(
                    "prompt_weighting parses the prompt strings — with "
                    "token_ids pass token_weights instead"
                )
            if self.tokenizer is None:
                raise ValueError(
                    "prompt_weighting needs a tokenizer — provide assets "
                    "via tools/prepare_tokenizer.py"
                )
            ids_all, w_all = self._encode_rows(
                prompts + (negs or []), max_len, weighted=True
            )
            cond, cond_w = ids_all[:n_prompts], w_all[:n_prompts]
            if negs is not None:
                uncond, uncond_w = ids_all[n_prompts:], w_all[n_prompts:]
        elif token_ids is not None:
            cond = np.asarray(token_ids)
            if token_weights is not None:
                cond_w = np.asarray(token_weights, np.float32)
                if cond_w.ndim == 1:
                    cond_w = cond_w[None]
                if cond_w.shape != cond.shape:
                    raise ValueError(
                        f"token_weights {cond_w.shape} must match "
                        f"token_ids {cond.shape}"
                    )
        else:
            if token_weights is not None:
                raise ValueError("token_weights requires token_ids")
            if self.tokenizer is None:
                raise ValueError("no tokenizer installed — pass token_ids")
            ids_all = self._encode_rows(prompts + (negs or []), max_len)
            cond = ids_all[:n_prompts]
            if negs is not None:
                uncond = ids_all[n_prompts:]
        if cfg:
            if len(negs) != cond.shape[0]:
                raise ValueError(
                    "negative_prompt list must match the number of prompts"
                )
            if uncond is None:  # pre-tokenized cond: match its window count
                n_win = cond.shape[1] // max_len
                if self.tokenizer is not None:
                    uncond = np.asarray([
                        self.tokenizer.encode_long(
                            t, window=max_len, num_windows=n_win
                        )
                        for t in negs
                    ])
                else:
                    if any(n for n in negs):
                        raise ValueError(
                            "no tokenizer installed — non-empty negative "
                            "prompts require a tokenizer (or pre-tokenize "
                            "2B token_ids)"
                        )
                    uncond = np.tile(
                        np.tile(self._uncond_row(), n_win)[None],
                        (cond.shape[0], 1),
                    )
            ids = np.concatenate([cond, uncond])  # [cond..., uncond...]
            if cond_w is not None:
                if uncond_w is None:
                    uncond_w = np.ones(uncond.shape, np.float32)
                weights = np.concatenate([cond_w, uncond_w])
            else:
                weights = None
        else:
            ids = cond
            weights = cond_w
        ids = np.asarray(ids, dtype=np.int32)
        is_img2img = init_images is not None
        if is_img2img and not 0.0 < strength <= 1.0:
            raise ValueError("strength must be in (0, 1]")
        if mask_images is not None and not is_img2img:
            raise ValueError("mask_images requires init_images (inpainting)")
        is_edit = is_img2img and (
            self.config.unet.in_channels
            == 2 * self.config.vae.latent_channels
        )
        if is_edit and mask_images is not None:
            raise ValueError(
                "editing checkpoints (InstructPix2Pix) take no mask"
            )
        has_control = control_images is not None
        if encoder_cache_interval < 1:
            raise ValueError("encoder_cache_interval must be >= 1")
        if encoder_cache_interval > 1 and has_control:
            raise ValueError(
                "encoder_cache_interval is incompatible with ControlNet "
                "(the control residuals enter the cached encoder half)"
            )
        if has_control:
            if self.controlnet is None:
                raise ValueError(
                    "control_images requires a ControlNet — call "
                    "pipe.load_controlnet(...) first"
                )
            if len(control_images) != cond.shape[0]:
                raise ValueError(
                    "control_images must match the number of prompts"
                )
        self._check_guidance_rescale(guidance_rescale, cfg, is_edit)
        self._check_pag(pag_scale, is_edit)
        freeu = self._check_freeu(freeu)
        fn = self._get_compiled(
            size, num_inference_steps, cfg, is_img2img,
            round(strength, 6) if is_img2img and not is_edit else 1.0,
            ids.shape[0], sampler,
            want_uint8=output in ("uint8", "device"),
            has_mask=mask_images is not None,
            clip_skip=clip_skip,
            has_weights=weights is not None,
            has_control=has_control,
            encoder_cache=encoder_cache_interval,
            guidance_rescale=guidance_rescale,
            pag_scale=pag_scale,
            freeu=freeu,
        )
        if seeds is not None:
            if len(seeds) != cond.shape[0]:
                raise ValueError("seeds must match the number of prompts")
            key = np.asarray(seeds, np.uint32)  # (B,) -> per-request keys in-jit
        else:
            key = np.uint32(seed)

        params = (
            {**self.params, "controlnet": self._controlnets()}
            if has_control else self.params
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp_ids = NamedSharding(mesh, P("dp", None))
            ids = jax.device_put(ids, dp_ids)
            if weights is not None:
                weights = jax.device_put(weights, dp_ids)
            if seeds is not None:
                key = jax.device_put(key, NamedSharding(mesh, P("dp")))
            # params: respect pre-placed shardings; replicate plain arrays
            leaf = jax.tree.leaves(params)[0]
            if not hasattr(leaf, "sharding") or leaf.sharding.is_fully_replicated:
                params = jax.device_put(params, NamedSharding(mesh, P()))

        ids_arg = ids if weights is None else (ids, weights)
        cfg_arg = (
            (jnp.float32(cfg_scale), jnp.float32(image_guidance_scale))
            if is_edit and cfg else jnp.float32(cfg_scale)
        )
        pos = []
        if is_img2img:
            imgs_in = jnp.concatenate(
                [self._prep_image(im, size) for im in init_images]
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                imgs_in = jax.device_put(
                    imgs_in, NamedSharding(mesh, P("dp", None, None, None))
                )
            pos.append(imgs_in)
            if mask_images is not None:
                if len(mask_images) != len(init_images):
                    raise ValueError(
                        "mask_images must match init_images in length"
                    )
                masks = np.concatenate(
                    [self._prep_mask(m, size) for m in mask_images]
                )
                if mesh is not None:
                    masks = jax.device_put(
                        masks, NamedSharding(mesh, P("dp", None, None, None))
                    )
                pos.append(masks)
        if has_control:
            nets = self._controlnets()
            # each request entry: one map (single net) or one map per net
            rows = [
                self._control_args(nets, entry, controlnet_scale)
                for entry in control_images
            ]
            scales_c = rows[0][1]
            ctrl_in = []
            for k in range(len(nets)):
                stack = jnp.concatenate(
                    [self._prep_control(r[0][k], size) for r in rows]
                )
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    stack = jax.device_put(
                        stack, NamedSharding(mesh, P("dp", None, None, None))
                    )
                ctrl_in.append(stack)
            images = fn(params, ids_arg, *pos, ctrl_in,
                        cfg_arg,
                        [np.float32(s) for s in scales_c], key)
        else:
            images = fn(params, ids_arg, *pos, cfg_arg, key)
        if output == "device":
            # raw device array (uint8-packed), NOT fetched: the serving
            # engine dispatches the next batch before blocking on this one
            return images
        if output == "float":
            return np.asarray(images, dtype=np.float32)
        return np.asarray(images)  # device-packed uint8

    def warmup(
        self,
        *,
        image_sizes=(512,),
        step_counts=(25,),
        batch_sizes=(1,),
        cfg: bool = True,
        sampler: str = "ddpm",
        img2img: bool = False,
        inpaint: bool = False,
        strength: float = 0.9,
        pag_scale: float = 0.0,
    ) -> int:
        """Precompile the program buckets a serving deployment will hit, so
        no request pays compile latency.  Returns the number of programs run.
        (Combined with the persistent compilation cache —
        ``sdtpu.utils.runtime.enable_compilation_cache`` — warmup after a
        restart is a cache read, not a compile.)"""
        n = 0
        max_len = self.config.text_config.max_length
        for size in image_sizes:
            for steps in step_counts:
                for batch in batch_sizes:
                    ids = np.ones((batch, max_len), dtype=np.int64)
                    if img2img or inpaint:
                        inits = [
                            np.zeros((size, size, 3), dtype=np.uint8)
                        ] * batch
                        masks = (
                            [np.full((size, size), 255, dtype=np.uint8)]
                            * batch
                            if inpaint else None
                        )
                        self.generate_batch(
                            ["warmup"] * batch, token_ids=ids, cfg=cfg,
                            num_inference_steps=steps, image_size=size,
                            sampler=sampler, init_images=inits,
                            mask_images=masks, strength=strength,
                            seeds=list(range(batch)), pag_scale=pag_scale,
                        )
                    else:
                        self.generate_batch(
                            ["warmup"] * batch, token_ids=ids, cfg=cfg,
                            num_inference_steps=steps, image_size=size,
                            sampler=sampler, seeds=list(range(batch)),
                            pag_scale=pag_scale,
                        )
                    n += 1
        return n

    # -- internals -----------------------------------------------------------

    def _encode_rows(self, texts, max_len, *, weighted=False):
        """Tokenize a batch of texts to the SAME number of CLIP windows
        (the max any row needs — long prompts chunk per the community
        scheme, ``bpe.py:encode_long``; short batches stay one window, so
        existing shapes/programs are untouched).  Returns (B, n*max_len)
        int32 ids (and (B, n*max_len) float32 weights when ``weighted``)."""
        tok = self.tokenizer
        if weighted:
            enc = [tok.encode_weighted_long(t, window=max_len) for t in texts]
            n = max(len(e[0]) // max_len for e in enc)
            enc = [
                e if len(e[0]) == n * max_len
                else tok.encode_weighted_long(t, window=max_len, num_windows=n)
                for e, t in zip(enc, texts)
            ]
            return (
                np.asarray([e[0] for e in enc], np.int32),
                np.asarray([e[1] for e in enc], np.float32),
            )
        enc = [tok.encode_long(t, window=max_len) for t in texts]
        n = max(len(e) // max_len for e in enc)
        enc = [
            e if len(e) == n * max_len
            else tok.encode_long(t, window=max_len, num_windows=n)
            for e, t in zip(enc, texts)
        ]
        return np.asarray(enc, np.int32)

    def _uncond_row(self) -> np.ndarray:
        """Empty-prompt token row for CFG's unconditional branch: BOS then
        EOS-padding (CLIP convention: 49406, 49407, 49407, ...).  Used when
        the caller pre-tokenized only the cond row — duplicating the cond row
        would make guidance a mathematical no-op while still paying the 2x
        CFG batch."""
        vocab = self.config.text_config.vocab_size
        bos, eos = vocab - 2, vocab - 1
        row = np.full((self.config.text_config.max_length,), eos, dtype=np.int64)
        row[0] = bos
        return row

    def _tokenize(self, prompt, negative_prompt, cfg, token_ids,
                  weighted: bool = False):
        max_len = self.config.text_config.max_length
        if weighted:
            # (word:1.3) emphasis syntax: weighted-parse BOTH prompts
            # (utils/prompt_weighting.py); returns (ids, weights)
            if token_ids is not None:
                raise ValueError(
                    "prompt_weighting parses the prompt string — with "
                    "token_ids pass token_weights instead"
                )
            if self.tokenizer is None:
                raise ValueError(
                    "prompt_weighting needs a tokenizer — provide assets "
                    "via tools/prepare_tokenizer.py (or pass token_ids + "
                    "token_weights)"
                )
            texts = [prompt] + ([negative_prompt] if cfg else [])
            return self._encode_rows(texts, max_len, weighted=True)
        if token_ids is not None:
            ids = np.asarray(token_ids)
            if ids.ndim == 1:
                ids = ids[None]
        else:
            if self.tokenizer is None:
                raise ValueError(
                    "no tokenizer installed — pass token_ids or provide "
                    "assets via tools/prepare_tokenizer.py"
                )
            texts = [prompt] + ([negative_prompt] if cfg else [])
            ids = self._encode_rows(texts, max_len)
        if cfg and ids.shape[0] == 1:
            # caller pre-tokenized only the cond row: synthesize the uncond
            # at the SAME window count
            n = ids.shape[1] // max_len
            if self.tokenizer is not None:
                neg = self.tokenizer.encode_long(
                    negative_prompt, window=max_len, num_windows=n
                )
                ids = np.concatenate([ids, np.asarray(neg)[None]], axis=0)
            else:
                ids = np.concatenate(
                    [ids, np.tile(self._uncond_row(), n)[None]], axis=0
                )
        return np.asarray(ids, dtype=np.int32)  # host array; jit transfers once

    def _prep_image(self, init_image, size) -> jnp.ndarray:
        from sdtpu.ops.resize import resize_image

        arr = np.asarray(init_image)
        if arr.dtype == np.uint8:
            arr = from_uint8(arr)  # pipeline.mojo:70 rescale to (-1, 1)
        if arr.ndim == 3:
            arr = arr[None]
        img = jnp.asarray(arr, dtype=jnp.float32)
        if img.shape[1] != size or img.shape[2] != size:
            img = resize_image(img, size, size)  # pipeline.mojo:69
        return img

    @staticmethod
    def _nearest_resize(arr, size):
        """Host-side nearest-neighbor resize to (size, size) over the two
        leading spatial axes (shared by the control-map and mask prep —
        eager device resizes cost a relay round trip each)."""
        import numpy as np

        if arr.shape[:2] == (size, size):
            return arr
        ri = (np.arange(size) * arr.shape[0] // size).clip(0, arr.shape[0] - 1)
        ci = (np.arange(size) * arr.shape[1] // size).clip(0, arr.shape[1] - 1)
        return arr[ri[:, None], ci[None, :]]

    def _prep_control(self, control_image, size) -> np.ndarray:
        """ControlNet conditioning image -> (1, size, size, 3) float32 in
        [0, 1] (diffusers' range for control maps — NOT the VAE's [-1, 1]).
        Accepts (H, W) or (H, W, C) uint8/float; grayscale maps broadcast
        to 3 channels; nearest-resized on host (pure numpy — eager device
        ops cost a relay round trip each)."""
        arr = np.asarray(control_image)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        arr = arr.astype(np.float32)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        if arr.shape[-1] != 3:
            raise ValueError(f"control image must be (H, W[, 1|3]); got {arr.shape}")
        arr = self._nearest_resize(arr, size)
        return np.clip(arr, 0.0, 1.0)[None].astype(np.float32)

    def _prep_mask(self, mask_image, size) -> np.ndarray:
        """Inpainting mask -> (1, lat, lat, 1) float32 in [0, 1]
        (1 = repaint, 0 = preserve the init image).  Accepts (H, W),
        (H, W, 1) or (H, W, 3) uint8 (255 = repaint) or float arrays;
        nearest-resized to the image grid, then area-averaged to the latent
        grid.  Pure numpy: eager device ops before the jit call each cost a
        relay round trip (~28 ms) on the TPU backend."""
        arr = np.asarray(mask_image)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        arr = arr.astype(np.float32)
        if arr.ndim == 3:
            arr = arr.mean(axis=-1)
        if arr.ndim != 2:
            raise ValueError(f"mask must be (H, W[, C]); got {arr.shape}")
        arr = self._nearest_resize(arr, size)
        ch = self.config.unet.in_channels
        if ch == 2 * self.config.vae.latent_channels + 1:
            # dedicated inpaint checkpoints consume the PIXEL-grid mask
            # (masked-image computation + in-program latent downsample)
            return np.clip(arr, 0.0, 1.0)[None, :, :, None].astype(np.float32)
        f = self.config.vae.downscale_factor
        lat = size // f
        m = arr.reshape(lat, f, lat, f).mean(axis=(1, 3))
        return np.clip(m, 0.0, 1.0)[None, :, :, None].astype(np.float32)

    @staticmethod
    def _check_freeu(freeu):
        """Normalize/validate FreeU factors: None, or (b1, b2, s1, s2) ->
        a hashable tuple of floats (compile-cache key material)."""
        if freeu is None:
            return None
        try:
            b1, b2, s1, s2 = (float(v) for v in freeu)
        except (TypeError, ValueError):
            raise ValueError(
                "freeu must be (b1, b2, s1, s2) — e.g. (1.5, 1.6, 0.9, 0.2) "
                "for SD 1.x, (1.3, 1.4, 0.9, 0.2) for SDXL"
            ) from None
        return (round(b1, 6), round(b2, 6), round(s1, 6), round(s2, 6))

    @staticmethod
    def _check_guidance_rescale(guidance_rescale, cfg, is_edit):
        if guidance_rescale == 0.0:
            return
        if not 0.0 < guidance_rescale <= 1.0:
            raise ValueError("guidance_rescale must be in [0, 1]")
        if not cfg:
            raise ValueError(
                "guidance_rescale rescales the CFG combine — it needs cfg=True"
            )
        if is_edit:
            raise ValueError(
                "guidance_rescale is not defined for editing checkpoints "
                "(InstructPix2Pix uses 3-branch guidance)"
            )

    @staticmethod
    def _check_pag(pag_scale, is_edit):
        if pag_scale == 0.0:
            return
        if pag_scale < 0.0:
            raise ValueError("pag_scale must be >= 0")
        if is_edit:
            raise ValueError(
                "pag_scale is incompatible with editing checkpoints "
                "(InstructPix2Pix's 3-branch guidance owns the extra rows)"
            )

    def _get_compiled(
        self, size, steps, cfg, is_img2img, strength, n_ids, sampler="ddpm",
        has_latents=False, want_latents=False, want_uint8=False,
        has_mask=False, clip_skip=0, has_weights=False, has_control=False,
        denoising_end=None, denoising_start=None, encoder_cache=1,
        guidance_rescale=0.0, pag_scale=0.0, freeu=None,
    ):
        # The ring-attention context is read at TRACE time (the shard_map is
        # baked into the compiled program), so it must be part of the cache
        # key: a program traced inside a ring_context must not be silently
        # reused outside it, or vice versa (VERDICT.md round-2 weak item 5).
        # jax.sharding.Mesh hashes by devices + axis names.
        from sdtpu.parallel.ring_attention import get_ring_context

        cache_key = (size, steps, cfg, is_img2img, strength, n_ids, sampler,
                     has_latents, want_latents, want_uint8, has_mask,
                     clip_skip, has_weights, has_control,
                     denoising_end, denoising_start, encoder_cache,
                     round(guidance_rescale, 6), round(pag_scale, 6), freeu,
                     get_ring_context())
        fn = self._compiled.get(cache_key)
        if fn is not None:
            return fn
        # instance miss: consult the process-wide cache before building —
        # pipelines with equal configs share executables (module docstring
        # at _PROGRAM_CACHE)
        global_key = (self.config, cache_key, _trace_env_fingerprint())
        fn = _PROGRAM_CACHE.get(global_key)
        if fn is None:
            sdef = get_sampler(sampler)
            schedule = sdef.make_schedule(
                self.config.scheduler, steps, strength if is_img2img else 1.0
            )
            if denoising_end is not None or denoising_start is not None:
                from sdtpu.samplers import slice_schedule

                n_train = self.config.scheduler.num_train_timesteps
                if denoising_start is not None:
                    schedule = slice_schedule(
                        schedule, num_train_timesteps=n_train,
                        denoising_start=denoising_start,
                    )
                if denoising_end is not None:
                    schedule = slice_schedule(
                        schedule, num_train_timesteps=n_train,
                        denoising_end=denoising_end,
                    )
            fn = self._build(sdef, schedule, cfg, is_img2img, size,
                             has_latents=has_latents,
                             want_latents=want_latents,
                             want_uint8=want_uint8,
                             has_mask=has_mask,
                             clip_skip=clip_skip,
                             has_weights=has_weights,
                             has_control=has_control,
                             continuation=denoising_start is not None,
                             full_strength=strength >= 1.0,
                             encoder_cache=encoder_cache,
                             guidance_rescale=guidance_rescale,
                             pag_scale=pag_scale,
                             freeu=freeu)
            _PROGRAM_CACHE[global_key] = fn
        self._compiled[cache_key] = fn
        return fn

    def _build(
        self, sdef: SamplerDef, schedule, cfg: bool, is_img2img: bool,
        size: int, has_latents: bool = False, want_latents: bool = False,
        want_uint8: bool = False, has_mask: bool = False, clip_skip: int = 0,
        has_weights: bool = False, has_control: bool = False,
        continuation: bool = False, full_strength: bool = False,
        encoder_cache: int = 1, guidance_rescale: float = 0.0,
        pag_scale: float = 0.0, freeu=None,
    ):
        config = self.config
        latent_ch = config.vae.latent_channels
        lat_size = size // config.vae.downscale_factor
        # dedicated inpainting checkpoints (runwayml/sd-inpainting style):
        # the UNet consumes latents ++ mask ++ masked-image latents
        inpaint_unet = config.unet.in_channels == 2 * latent_ch + 1
        # InstructPix2Pix-style editing checkpoints: latents ++ image latents
        edit_unet = config.unet.in_channels == 2 * latent_ch
        compute_dtype = config.compute_dtype
        attn_impl = config.attention_impl
        if attn_impl == "auto":
            # flash (Pallas) on TPU-class backends; dense XLA on CPU tests
            attn_impl = "xla" if jax.default_backend() == "cpu" else "flash"
        elif attn_impl == "flash" and jax.default_backend() == "cpu":
            # the Mosaic kernel doesn't compile on CPU; explicit flash
            # configs degrade to dense XLA there so CPU tests/dryruns of
            # TPU-tuned configs still run
            attn_impl = "xla"
        conv_impl = config.conv_impl
        if conv_impl == "auto":
            conv_impl = "xla" if jax.default_backend() == "cpu" else "gemm"

        def apply_token_weights(hidden, tw):
            """Scale each token's encoded state by its prompt weight, then
            renormalize so the per-row mean MAGNITUDE mean(|h|) is
            preserved (emphasis changes direction-of-conditioning, not its
            overall strength — utils/prompt_weighting.py).

            Deliberate deviation from A1111/lpw, which preserve the SIGNED
            mean: mean(h) over a CLIP hidden row is a near-total
            cancellation (the encoder ends in LayerNorm, so per-token means
            are ~mean(beta)), leaving a near-zero denominator that turns
            low-bit reduction noise into an O(1)-random scale (measured:
            two batch shapes of the same row gave ratios 0.56 vs 0.91).
            mean(|h|) is O(1) and well-conditioned.

            The weighted stat is computed incrementally as
            prev + mean(|h|*(|w|-1)) rather than as an independent
            mean(|h*w|) reduction, so w == 1 gives a bitwise-exact ratio of
            1 (|h|*(|w|-1) is exactly zero regardless of how XLA tiles the
            two reduces) and unit weights reproduce the unweighted
            program's output exactly."""
            h32 = hidden.astype(jnp.float32)
            w = tw[..., None]
            habs = jnp.abs(h32)
            prev = jnp.mean(habs, axis=(-2, -1), keepdims=True)
            new_mean = prev + jnp.mean(
                habs * (jnp.abs(w) - 1.0), axis=(-2, -1), keepdims=True
            )
            ratio = jnp.where(new_mean == 0.0, 1.0, prev / new_mean)
            ratio = jnp.where(prev == new_mean, 1.0, ratio)
            return (h32 * w * ratio).astype(hidden.dtype)

        def encode_windows(ids, clip_params, clip_cfg):
            return clip_encode_windows(ids, clip_params, clip_cfg,
                                       clip_skip=clip_skip)

        def encode_context(params, ids):
            """SD 1.x: one encoder's hidden states.  SDXL: concat of CLIP-L
            and bigG penultimate states (768+1280=2048) plus the bigG
            projected pooled embedding and size/crop time ids for the
            add-embedding micro-conditioning.  SDXL refiner: bigG alone
            (context 1280) with 5 time ids — size/crop plus an aesthetic
            score that differs cond (6.0) vs uncond (2.5), the
            ``requires_aesthetics_score`` convention."""
            tw = None
            if has_weights:
                ids, tw = ids
                tw = tw.astype(jnp.float32)
            parts = []
            if config.clip is not None:
                hidden, _ = encode_windows(ids, params["clip"], config.clip)
                if tw is not None:
                    hidden = apply_token_weights(hidden, tw)
                parts.append(hidden.astype(compute_dtype))
            if config.clip_2 is None:
                return parts[0], None
            hidden2, pooled2 = encode_windows(ids, params["clip_2"],
                                              config.clip_2)
            if tw is not None:
                hidden2 = apply_token_weights(hidden2, tw)
            parts.append(hidden2.astype(compute_dtype))
            context = (
                jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
            )
            rows = ids.shape[0]
            if config.requires_aesthetics_score:
                base = jnp.tile(
                    jnp.asarray([size, size, 0, 0], dtype=jnp.float32)[None],
                    (rows, 1),
                )
                a = config.default_aesthetic_score
                na = config.default_negative_aesthetic_score
                if cfg:  # rows ordered [cond..., uncond...]
                    half = rows // 2
                    score = jnp.concatenate([
                        jnp.full((half, 1), a, jnp.float32),
                        jnp.full((rows - half, 1), na, jnp.float32),
                    ])
                else:
                    score = jnp.full((rows, 1), a, jnp.float32)
                time_ids = jnp.concatenate([base, score], axis=-1)
            else:
                time_ids = jnp.tile(
                    jnp.asarray(
                        [size, size, 0, 0, size, size], dtype=jnp.float32
                    )[None],
                    (rows, 1),
                )
            added = {
                "text_embeds": pooled2.astype(compute_dtype),
                "time_ids": time_ids,
            }
            return context, added

        def denoise(params, context, added_cond, latents, cfg_scale, key,
                    inpaint=None, control=None, extra_channels=None,
                    cache_interval=1):
            # context: cfg ? (2B, L, D) ordered [cond..., uncond...] : (B, L, D)
            batch = latents.shape[0]

            # InstructPix2Pix (in_channels = 2*latent) guidance runs THREE
            # branches per image — [text+image, image-only, unconditional]
            # — steered by two scales (text + image guidance); the image
            # rows ride extra_channels (caller-tiled [img, img, zeros]).
            image_gs = None
            pag = pag_scale > 0.0
            if edit_unet and cfg:
                cfg_scale, image_gs = cfg_scale
                context = jnp.concatenate(
                    [context[:batch], context[batch:], context[batch:]]
                )
            elif pag:
                # PAG's perturbed branch rides the TAIL rows, conditioned on
                # the COND text (identity self-attention applied in-model
                # via pag_tail) — rows [cond, (uncond,) perturbed]
                context = jnp.concatenate([context, context[:batch]])
                if added_cond is not None:
                    added_cond = jax.tree.map(
                        lambda a: jnp.concatenate([a, a[:batch]]), added_cond
                    )
            n_rep = (
                3 if ((edit_unet or pag) and cfg)
                else (2 if (cfg or pag) else 1)
            )
            pag_tail = batch if pag else 0
            model_batch = n_rep * batch

            # cross-attention K/V depend only on the (constant) context:
            # compute them ONCE here instead of every scan step — XLA does
            # not hoist them itself (round-2 XProf: ~1.4 ms/step of
            # projections + relayout copies inside the loop)
            from sdtpu.models.unet import (
                precompute_cross_kv,
                precompute_time_projections,
            )

            cross_kv = precompute_cross_kv(
                context.astype(compute_dtype), params["unet"], config.unet
            )

            # LCM-distilled UNets consume the guidance scale as an embedding
            # (w = cfg_scale - 1, diffusers convention) instead of CFG.
            timestep_cond = None
            if config.unet.time_cond_proj_dim is not None:
                from sdtpu.ops import timestep_embedding

                w = jnp.broadcast_to(
                    (cfg_scale - 1.0) * 1000.0, (model_batch,)
                )
                timestep_cond = timestep_embedding(
                    w, config.unet.time_cond_proj_dim,
                    flip_sin_to_cos=False, freq_shift=1.0,
                    dtype=compute_dtype,
                )

            # Every time-dependent projection (time MLP, per-resblock
            # time_emb_proj, SDXL add-embedding, LCM guidance embedding) is
            # a function of the KNOWN timestep sequence — one batched sweep
            # here replaces ~15 small matmuls per scan step (XLA cannot
            # hoist them past the scan-carried timestep).
            time_cache = precompute_time_projections(
                schedule.timesteps,
                params["unet"],
                config.unet,
                batch=model_batch,
                timestep_cond=timestep_cond,
                added_cond=added_cond,
                dtype=compute_dtype,
            )

            # ControlNet(s): the control-image embeddings are constant across
            # the scan (computed ONCE here), and each encoder copy gets the
            # same scan-hoisted cross-K/V + time-projection treatment as the
            # UNet.  Multi-ControlNet residuals sum (diffusers semantics).
            cn_caches = ctrl_scales = None
            if control is not None:
                from sdtpu.models.controlnet import controlnet_cond_embed

                control_imgs, ctrl_scales = control
                cn_caches = []
                for cn, img in zip(params["controlnet"], control_imgs):
                    emb = controlnet_cond_embed(
                        img.astype(compute_dtype), cn["cond_embedding"]
                    )
                    if n_rep > 1:  # every guidance branch (diffusers default)
                        emb = jnp.concatenate([emb] * n_rep)
                    kv = precompute_cross_kv(
                        context.astype(compute_dtype), cn, config.unet
                    )
                    tc = precompute_time_projections(
                        schedule.timesteps, cn, config.unet,
                        batch=model_batch,
                        timestep_cond=timestep_cond, added_cond=added_cond,
                        dtype=compute_dtype,
                    )
                    cn_caches.append((cn, emb, kv, tc))

            # Dedicated inpainting checkpoints (in_channels = 2*latent+1):
            # mask + masked-image latents are CONSTANT across the scan —
            # CFG-tile and cast once here, concat per step after
            # scale_model_input (the scheduler scaling applies only to the
            # noisy latent part, the diffusers convention).
            # extra_channels arrives already tiled to the MODEL batch (the
            # rows differ per guidance branch for InstructPix2Pix)
            extra = None
            if extra_channels is not None:
                extra = extra_channels.astype(compute_dtype)

            def body(carry, step):
                lat, key, state = carry
                i, t = step
                lat_in = (
                    jnp.concatenate([lat] * n_rep) if n_rep > 1 else lat
                )
                if sdef.scale_model_input is not None:
                    lat_in = sdef.scale_model_input(schedule, i, lat_in)
                t_in = jnp.broadcast_to(
                    t.astype(jnp.float32), (lat_in.shape[0],)
                )
                ctrl = None
                if control is not None:
                    from sdtpu.models.controlnet import controlnet_forward

                    # ControlNets are trained on BASE models: they consume
                    # the 4-channel noisy latents even when the UNet takes
                    # the 9-channel inpaint input (diffusers wiring)
                    for (cn, emb, kv, tc), sc in zip(cn_caches, ctrl_scales):
                        r = controlnet_forward(
                            lat_in.astype(compute_dtype), t_in, context,
                            emb, cn, config.unet,
                            conditioning_scale=sc,
                            added_cond=added_cond,
                            timestep_cond=timestep_cond,
                            attention_impl=attn_impl, conv_impl=conv_impl,
                            cross_kv=kv,
                            time_cache=jax.tree.map(lambda a: a[i], tc),
                        )
                        ctrl = r if ctrl is None else {
                            "down": [
                                a + b for a, b in zip(ctrl["down"], r["down"])
                            ],
                            "mid": (
                                None if r["mid"] is None
                                else ctrl["mid"] + r["mid"]
                            ),
                        }
                if extra is not None:
                    lat_in = jnp.concatenate(
                        [lat_in.astype(compute_dtype), extra], axis=-1
                    )
                eps = unet_forward(
                    lat_in.astype(compute_dtype), t_in, context, params["unet"],
                    config.unet, added_cond=added_cond,
                    timestep_cond=timestep_cond,
                    attention_impl=attn_impl,
                    conv_impl=conv_impl, cross_kv=cross_kv,
                    time_cache=jax.tree.map(lambda a: a[i], time_cache),
                    control=ctrl, freeu=freeu, pag_tail=pag_tail,
                ).astype(jnp.float32)
                return finish_step(lat, key, state, eps, i), None

            def finish_step(lat, key, state, eps, i):
                """Guidance combine -> variance noise -> sampler step ->
                inpaint blend: shared by the plain scan body and the
                encoder-cached grouped body."""
                if edit_unet and cfg:
                    # eps_u + s_text (eps_text - eps_img) + s_img (eps_img - eps_u)
                    e_t = eps[:batch]
                    e_i = eps[batch:2 * batch]
                    e_u = eps[2 * batch:]
                    eps = (e_u + cfg_scale * (e_t - e_i)
                           + image_gs * (e_i - e_u))
                elif cfg and pag:
                    cond = eps[:batch]
                    uncond = eps[batch:2 * batch]
                    pert = eps[2 * batch:]
                    eps = (uncond + cfg_scale * (cond - uncond)
                           + pag_scale * (cond - pert))
                    if guidance_rescale > 0.0:
                        eps = rescale_noise_cfg(eps, cond, guidance_rescale)
                elif cfg:
                    cond, uncond = eps[:batch], eps[batch:]
                    eps = uncond + cfg_scale * (cond - uncond)  # pipeline.mojo:111-119
                    if guidance_rescale > 0.0:
                        eps = rescale_noise_cfg(eps, cond, guidance_rescale)
                elif pag:
                    cond, pert = eps[:batch], eps[batch:]
                    eps = cond + pag_scale * (cond - pert)
                if sdef.stochastic:
                    if key.ndim == 1:  # per-request keys: fold by step index
                        # Salt space: 0 = latent-init/encoder noise, 1 =
                        # img2img forward noise, 2+i = per-step variance
                        # noise — disjoint so no two draws share a key.
                        subs = jax.vmap(
                            lambda k: jax.random.fold_in(k, i + 2)
                        )(key)
                        noise = jax.vmap(
                            lambda k: jax.random.normal(
                                k, lat.shape[1:], jnp.float32
                            )
                        )(subs)
                    else:
                        key, sub = jax.random.split(key)
                        noise = jax.random.normal(sub, lat.shape, jnp.float32)
                else:
                    noise = jnp.zeros_like(lat)
                if sdef.multistep:
                    lat, state = sdef.step(schedule, i, lat, eps, noise, state)
                else:
                    lat = sdef.step(schedule, i, lat, eps, noise)
                if inpaint is not None:
                    # Inpainting blend: after each step the preserved region
                    # is overwritten with the init latents forward-noised to
                    # the step the carry is now at (the SAME noise draw every
                    # step), so only the masked region is actually generated;
                    # the final step blends with the CLEAN init latents
                    # (exact preservation — the modern diffusers blend, not
                    # the legacy pipeline's same-t variant).
                    mask_l, ref0, ref_noise = inpaint
                    j = jnp.minimum(i + 1, schedule.num_steps - 1)
                    ref = jnp.where(
                        i == schedule.num_steps - 1,
                        ref0,
                        sdef.add_noise(schedule, ref0, ref_noise, j),
                    )
                    lat = mask_l * lat + (1.0 - mask_l) * ref
                return (lat, key, state)

            state0 = (
                sdef.state_init(latents) if sdef.multistep else jnp.zeros((), jnp.float32)
            )
            S = schedule.num_steps
            idx = jnp.arange(S, dtype=jnp.int32)
            if cache_interval > 1:
                # Encoder-feature reuse (Faster Diffusion / DeepCache
                # family): encoder+mid features change slowly across
                # adjacent denoising steps — each group of ``k`` steps runs
                # the encoder ONCE (first step) and decoder-only for the
                # rest, reusing the cached (mid, skips) with the CURRENT
                # step's time projections.  Cached steps never see the
                # noisy latents — that is the approximation.  Any
                # ``S % k`` remainder runs FULL at the end (the low-noise
                # detail steps).
                if control is not None:  # defense in depth: the grouped
                    # body never runs the ControlNet (callers validate too)
                    raise ValueError(
                        "encoder_cache_interval is incompatible with "
                        "ControlNet"
                    )
                from sdtpu.models.unet import unet_decode, unet_encode

                k_int = cache_interval
                G = S // k_int

                def one_step(lat, key, state, i, t, cache):
                    lat_in = (
                        jnp.concatenate([lat] * n_rep) if n_rep > 1 else lat
                    )
                    if sdef.scale_model_input is not None:
                        lat_in = sdef.scale_model_input(schedule, i, lat_in)
                    tc_i = jax.tree.map(lambda a: a[i], time_cache)
                    if cache is None:
                        if extra is not None:
                            lat_in = jnp.concatenate(
                                [lat_in.astype(compute_dtype), extra], axis=-1
                            )
                        cache = unet_encode(
                            lat_in.astype(compute_dtype), tc_i["temb"],
                            context, params["unet"], config.unet,
                            attention_impl=attn_impl, conv_impl=conv_impl,
                            cross_kv=cross_kv, time_proj=tc_i,
                            pag_tail=pag_tail,
                        )
                    x, sk = cache
                    eps = unet_decode(
                        x, sk, tc_i["temb"], context, params["unet"],
                        config.unet,
                        attention_impl=attn_impl, conv_impl=conv_impl,
                        cross_kv=cross_kv, time_proj=tc_i, freeu=freeu,
                    ).astype(jnp.float32)
                    lat, key, state = finish_step(lat, key, state, eps, i)
                    return lat, key, state, cache

                def gbody(carry, step):
                    lat, key, state = carry
                    i_vec, t_vec = step
                    cache = None
                    for j in range(k_int):  # static unroll within the group
                        lat, key, state, cache = one_step(
                            lat, key, state, i_vec[j], t_vec[j], cache
                        )
                    return (lat, key, state), None

                carry = (latents, key, state0)
                if G > 0:
                    groups = (
                        idx[: G * k_int].reshape(G, k_int),
                        schedule.timesteps[: G * k_int].reshape(G, k_int),
                    )
                    carry, _ = jax.lax.scan(gbody, carry, groups)
                if S % k_int:
                    tail = (idx[G * k_int:], schedule.timesteps[G * k_int:])
                    carry, _ = jax.lax.scan(body, carry, tail)
                latents = carry[0]
                return latents

            (latents, _, _), _ = jax.lax.scan(
                body, (latents, key, state0), (idx, schedule.timesteps)
            )
            return latents

        def decode(params, latents):
            if want_latents:
                return latents.astype(jnp.float32)
            img = vae_decode(
                latents.astype(compute_dtype), params["vae_decoder"], config.vae,
                attention_impl=attn_impl, conv_impl=conv_impl,
            ).astype(jnp.float32)
            if want_uint8:
                # uint8 packing ON DEVICE (pipeline.mojo:127's rescale+clamp):
                # the host fetches 1 byte/px instead of 4 — the device->host
                # relay is a measurable slice of end-to-end latency
                img = jnp.clip(
                    jnp.round((img + 1.0) * 127.5), 0.0, 255.0
                ).astype(jnp.uint8)
            return img

        def make_key(seeds):
            """Raw uint32 seed(s) -> typed PRNG key(s), inside the jit (the
            caller passes host scalars; building keys eagerly costs a relay
            round trip per call).  () -> scalar key; (B,) -> per-request."""
            seeds = jnp.asarray(seeds, jnp.uint32)
            if seeds.ndim == 0:
                return jax.random.key(seeds)
            return jax.vmap(jax.random.key)(seeds)

        if is_img2img:

            def run(params, ids, image, cfg_scale, key, mask=None,
                    control=None):
                key = make_key(key)
                context, added = encode_context(params, ids)
                batch = image.shape[0]
                lat_shape = (lat_size, lat_size, latent_ch)
                if key.ndim == 1:  # per-request keys (batched serving)
                    def row_noise(k, salt):
                        return jax.random.normal(
                            jax.random.fold_in(k, salt), lat_shape, jnp.float32
                        )

                    enc_noise = jax.vmap(lambda k: row_noise(k, 0))(key)
                    fwd_noise = jax.vmap(lambda k: row_noise(k, 1))(key)
                else:
                    key, k_enc, k_fwd = jax.random.split(key, 3)
                    enc_noise = jax.random.normal(
                        k_enc, (batch, *lat_shape), jnp.float32
                    )
                    fwd_noise = jax.random.normal(
                        k_fwd, (batch, *lat_shape), jnp.float32
                    )
                if edit_unet:
                    # InstructPix2Pix: the conditioning image rides extra
                    # channels as the posterior MODE, UNSCALED (the
                    # diffusers quirk the model was trained with); rows are
                    # [image, image, zeros] across the three guidance
                    # branches; the denoised latents start as pure noise.
                    img_lat = vae_encode(
                        image.astype(compute_dtype), None,
                        params["vae_encoder"], config.vae,
                        attention_impl=attn_impl, conv_impl=conv_impl,
                        apply_scaling=False,
                    ).astype(jnp.float32)
                    if cfg:
                        extra = jnp.concatenate(
                            [img_lat, img_lat, jnp.zeros_like(img_lat)]
                        )
                    else:
                        extra = img_lat
                    latents = fwd_noise * getattr(schedule, "init_sigma", 1.0)
                    latents = denoise(params, context, added, latents,
                                      cfg_scale, key, control=control,
                                      extra_channels=extra,
                                      cache_interval=encoder_cache)
                    return decode(params, latents)
                lat0 = vae_encode(
                    image.astype(compute_dtype), enc_noise,
                    params["vae_encoder"], config.vae,
                    attention_impl=attn_impl, conv_impl=conv_impl,
                ).astype(jnp.float32)  # pipeline.mojo:66-75
                inpaint = extra = None
                if mask is not None and inpaint_unet:
                    # dedicated inpaint checkpoint: mask arrives at PIXEL
                    # grid; the UNet consumes [latents, mask, masked-image
                    # latents] and learned the blend — no per-step paste
                    mask_pix = mask.astype(jnp.float32)
                    keep = (mask_pix < 0.5).astype(image.dtype)
                    masked = image * keep
                    if key.ndim == 1:
                        m_noise = jax.vmap(lambda k: row_noise(k, 3))(key)
                    else:
                        key, k_m = jax.random.split(key)
                        m_noise = jax.random.normal(
                            k_m, (batch, *lat_shape), jnp.float32
                        )
                    masked_lat = vae_encode(
                        masked.astype(compute_dtype), m_noise,
                        params["vae_encoder"], config.vae,
                        attention_impl=attn_impl, conv_impl=conv_impl,
                    ).astype(jnp.float32)
                    f = config.vae.downscale_factor
                    # nearest-downsample to the latent grid (diffusers'
                    # F.interpolate(mode="nearest") index mapping)
                    mask_lat = mask_pix[:, ::f, ::f, :]
                    extra = jnp.concatenate(
                        [
                            jnp.broadcast_to(
                                mask_lat, (batch, lat_size, lat_size, 1)
                            ),
                            masked_lat,
                        ],
                        axis=-1,
                    )
                    # every guidance branch (incl. PAG's perturbed one)
                    # sees the same extras
                    reps = (2 if cfg else 1) + (1 if pag_scale > 0.0 else 0)
                    if reps > 1:
                        extra = jnp.concatenate([extra] * reps)
                    if full_strength:
                        # pure-noise init (diffusers is_strength_max)
                        latents = fwd_noise * getattr(
                            schedule, "init_sigma", 1.0
                        )
                    else:
                        latents = sdef.add_noise(schedule, lat0, fwd_noise, 0)
                else:
                    latents = sdef.add_noise(schedule, lat0, fwd_noise, 0)  # pipeline.mojo:79
                    if mask is not None:
                        inpaint = (mask.astype(jnp.float32), lat0, fwd_noise)
                latents = denoise(params, context, added, latents, cfg_scale,
                                  key, inpaint=inpaint, control=control,
                                  extra_channels=extra,
                                  cache_interval=encoder_cache)
                return decode(params, latents)

            if has_mask:
                inner = run

                def run(params, ids, image, mask, cfg_scale, key,  # noqa: F811
                        control=None):
                    return inner(params, ids, image, cfg_scale, key, mask=mask,
                                 control=control)

        elif has_latents:

            def run(params, ids, lat0, cfg_scale, key, control=None):
                key = make_key(key)
                context, added = encode_context(params, ids)
                if continuation:
                    # denoising_start handoff: the base model's carry is
                    # already at this schedule position — no init scaling
                    latents = lat0
                else:
                    # user-supplied N(0,1) fixture; sigma-space samplers scale
                    latents = lat0 * getattr(schedule, "init_sigma", 1.0)
                latents = denoise(params, context, added, latents, cfg_scale,
                                  key, control=control,
                                  cache_interval=encoder_cache)
                return decode(params, latents)

        else:

            def run(params, ids, cfg_scale, key, control=None):
                key = make_key(key)
                context, added = encode_context(params, ids)
                n_rows = (ids[0] if has_weights else ids).shape[0]
                batch = n_rows // 2 if cfg else n_rows
                if key.ndim == 1:
                    # per-request keys (serving): row i's image depends only
                    # on its own key, independent of batch composition
                    init_keys = jax.vmap(
                        lambda k: jax.random.fold_in(k, 0)
                    )(key)
                    latents = jax.vmap(
                        lambda k: jax.random.normal(
                            k, (lat_size, lat_size, latent_ch), jnp.float32
                        )
                    )(init_keys)
                else:
                    key, k_init = jax.random.split(key)
                    latents = jax.random.normal(
                        k_init, (batch, lat_size, lat_size, latent_ch),
                        jnp.float32,
                    )  # pipeline.mojo:81
                # sigma-space samplers start at noise * sigma_max
                latents = latents * getattr(schedule, "init_sigma", 1.0)
                latents = denoise(params, context, added, latents, cfg_scale,
                                  key, control=control,
                                  cache_interval=encoder_cache)
                return decode(params, latents)

        if has_control:
            # positional-arg adapter: control args slot in before the key as
            # (..., control_img, cfg_scale, ctrl_scale, key)
            inner_run = run

            def run(params, ids, *args):  # noqa: F811
                *pos, control_img, cfg_scale, ctrl_scale, key = args
                return inner_run(params, ids, *pos, cfg_scale, key,
                                 control=(control_img, ctrl_scale))

        return jax.jit(run)
