"""sdtpu — a TPU-native Stable Diffusion inference framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Mojo
reference (lrmantovani10/Stable-Diffusion.mojo): CLIP text encoding, a
Tiny-SD-family UNet denoiser, DDPM sampling with classifier-free guidance and
img2img, and a VAE encoder/decoder — designed TPU-first rather than ported:

* NHWC layouts and bf16 compute so convs/matmuls tile onto the MXU,
* the full denoise loop compiled into one ``jax.lax.scan`` (zero host
  round-trips between steps; the reference runs a per-step host loop,
  ``pipeline.mojo:87-122``),
* CFG as a batch-2 UNet call instead of two sequential forwards
  (``pipeline.mojo:107-110``),
* Pallas kernels for the hot fusions (flash attention over latent tokens,
  implicit-GEMM convs with folded GroupNorm+SiLU prologues),
* real weights loaded from HuggingFace safetensors (the reference never
  loads weights — ``utils.mojo:1719-1726``),
* scale-out via ``jax.sharding.Mesh`` + NamedSharding over ICI.

Public API::

    from sdtpu import StableDiffusionPipeline, PipelineConfig
    pipe = StableDiffusionPipeline.from_pretrained("segmind/tiny-sd")
    image = pipe.generate("a cat flying a spaceship", seed=40)
"""

from sdtpu.config import (
    CLIPConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
    PipelineConfig,
    TINY_SD,
    SD15,
    SDXL_BASE,
)
__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: the pipeline pulls in models/samplers/tokenizer; keep bare
    # `import sdtpu` light for op-level use.
    if name in ("StableDiffusionPipeline", "PendingImages"):
        from sdtpu.pipeline import pipeline as _p

        return getattr(_p, name)
    raise AttributeError(f"module 'sdtpu' has no attribute {name!r}")

__all__ = [
    "CLIPConfig",
    "SchedulerConfig",
    "UNetConfig",
    "VAEConfig",
    "PipelineConfig",
    "TINY_SD",
    "SD15",
    "SDXL_BASE",
    "StableDiffusionPipeline",
    "PendingImages",
    "__version__",
]
