"""Model-level pure functions (the TPU-native analogue of the reference's L2:
``clip.mojo``, ``diffusion.mojo``, ``vae.mojo``)."""

from sdtpu.models.clip import clip_encode, clip_encode_windows, init_clip
from sdtpu.models.controlnet import (
    controlnet_cond_embed,
    controlnet_forward,
    init_controlnet,
)
from sdtpu.models.unet import init_unet, unet_forward
from sdtpu.models.vae import (
    init_vae_decoder,
    init_vae_encoder,
    vae_decode,
    vae_encode,
    vae_encoder,
)

__all__ = [
    "clip_encode",
    "clip_encode_windows",
    "controlnet_cond_embed",
    "controlnet_forward",
    "init_clip",
    "init_controlnet",
    "init_unet",
    "init_vae_decoder",
    "init_vae_encoder",
    "unet_forward",
    "vae_decode",
    "vae_encode",
    "vae_encoder",
]
