"""from_pretrained end-to-end via config inference: a synthetic diffusers
checkpoint whose directory name matches NO preset must load purely from its
own JSON configs and generate (the config_from_checkpoint fallback)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.pipeline.pipeline import StableDiffusionPipeline

from test_from_pretrained import TINY_CKPT, _write_clip, _write_unet, _write_vae
from test_tokenizer import build_assets


def _dump(path, cfg):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(cfg, f)


def build_inferred_ckpt(root):
    """Write the test_from_pretrained synthetic checkpoint + the JSON
    configs a real diffusers export would carry under ``root``.  Shared
    with tests/test_acceptance_rehearsal.py (the runbook drill)."""
    _write_clip(root / "text_encoder", TINY_CKPT.clip)
    _write_unet(root / "unet", TINY_CKPT.unet)
    _write_vae(root / "vae", TINY_CKPT.vae)
    build_assets(root / "tokenizer")

    u = TINY_CKPT.unet
    _dump(root / "unet" / "config.json", {
        "_class_name": "UNet2DConditionModel",
        "in_channels": u.in_channels, "out_channels": u.out_channels,
        "sample_size": 32 // TINY_CKPT.vae.downscale_factor,
        "block_out_channels": list(u.block_out_channels),
        "layers_per_block": u.layers_per_block,
        "attention_head_dim": u.num_attention_heads,
        "cross_attention_dim": u.cross_attention_dim,
        "down_block_types": ["CrossAttnDownBlock2D"] * u.num_levels,
        "mid_block_type": None,
        "norm_num_groups": u.norm_num_groups,
        "flip_sin_to_cos": True, "freq_shift": 0,
    })
    c = TINY_CKPT.clip
    _dump(root / "text_encoder" / "config.json", {
        "architectures": ["CLIPTextModel"],
        "vocab_size": c.vocab_size, "hidden_size": c.hidden_size,
        "intermediate_size": c.intermediate_size,
        "num_hidden_layers": c.num_layers,
        "num_attention_heads": c.num_heads,
        "max_position_embeddings": c.max_length,
        "hidden_act": c.hidden_act, "layer_norm_eps": c.layer_norm_eps,
    })
    v = TINY_CKPT.vae
    _dump(root / "vae" / "config.json", {
        "_class_name": "AutoencoderKL",
        "in_channels": v.in_channels, "out_channels": v.out_channels,
        "latent_channels": v.latent_channels,
        "block_out_channels": list(v.block_out_channels),
        "layers_per_block": v.layers_per_block,
        "norm_num_groups": v.norm_num_groups,
        "scaling_factor": v.scaling_factor,
    })
    _dump(root / "scheduler" / "scheduler_config.json", {
        "_class_name": "DDPMScheduler",
        "num_train_timesteps": 1000, "beta_start": 0.00085,
        "beta_end": 0.012, "beta_schedule": "scaled_linear",
        "prediction_type": "epsilon", "steps_offset": 0,
    })
    return root


@pytest.fixture(scope="module")
def inferred_ckpt_dir(tmp_path_factory):
    """A synthetic diffusers checkpoint under an unknown directory name."""
    root = tmp_path_factory.mktemp("ckpt") / "someones-finetune-v3"
    return build_inferred_ckpt(root)


class TestInferredFromPretrained:
    def test_unknown_dir_loads_and_generates(self, inferred_ckpt_dir):
        pipe = StableDiffusionPipeline.from_pretrained(
            str(inferred_ckpt_dir), dtype=jnp.float32
        )
        # architecture came from the JSON configs, not the preset table
        assert pipe.config.unet == TINY_CKPT.unet
        assert pipe.config.clip == TINY_CKPT.clip
        assert pipe.config.vae == TINY_CKPT.vae
        assert pipe.config.default_image_size == 32
        assert pipe.tokenizer is not None
        img = pipe.generate("hello world", num_inference_steps=2, seed=1)
        assert img.shape == (1, 32, 32, 3)
        assert img.dtype == np.uint8

    def test_explicit_preset_still_wins(self, inferred_ckpt_dir, monkeypatch):
        import sdtpu.config as C

        monkeypatch.setitem(C.PRESETS, "tiny-ckpt-override", TINY_CKPT)
        pipe = StableDiffusionPipeline.from_pretrained(
            str(inferred_ckpt_dir), preset="tiny-ckpt-override"
        )
        assert pipe.config is TINY_CKPT
