"""config_from_checkpoint: derive PipelineConfig from a diffusers
checkpoint's own JSON configs — so ANY diffusers SD-family directory loads
without a preset-table match (sdtpu/config.py).  Fixtures below are the
actual config.json contents of the well-known checkpoints (trimmed to the
fields that matter); the derived architectures must equal the presets."""

import json
import os

import pytest

from sdtpu.config import config_from_checkpoint, get_preset

SD15_UNET = {
    "_class_name": "UNet2DConditionModel",
    "in_channels": 4, "out_channels": 4, "sample_size": 64,
    "block_out_channels": [320, 640, 1280, 1280],
    "layers_per_block": 2,
    "attention_head_dim": 8,
    "cross_attention_dim": 768,
    "down_block_types": ["CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                         "CrossAttnDownBlock2D", "DownBlock2D"],
    "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D",
                       "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"],
    "norm_num_groups": 32, "flip_sin_to_cos": True, "freq_shift": 0,
}
SD15_TE = {
    "architectures": ["CLIPTextModel"],
    "vocab_size": 49408, "hidden_size": 768, "intermediate_size": 3072,
    "num_hidden_layers": 12, "num_attention_heads": 12,
    "max_position_embeddings": 77, "hidden_act": "quick_gelu",
    "layer_norm_eps": 1e-05,
}
SD_VAE = {
    "_class_name": "AutoencoderKL",
    "in_channels": 3, "out_channels": 3, "latent_channels": 4,
    "block_out_channels": [128, 256, 512, 512], "layers_per_block": 2,
    "norm_num_groups": 32, "scaling_factor": 0.18215,
}
SD15_SCHED = {
    "_class_name": "PNDMScheduler",
    "num_train_timesteps": 1000, "beta_start": 0.00085, "beta_end": 0.012,
    "beta_schedule": "scaled_linear", "steps_offset": 1,
    "prediction_type": "epsilon", "timestep_spacing": "leading",
}

SD21_UNET = dict(
    SD15_UNET,
    sample_size=96,
    attention_head_dim=[5, 10, 20, 20],
    cross_attention_dim=1024,
)
SD21_TE = dict(
    SD15_TE, hidden_size=1024, intermediate_size=4096,
    num_hidden_layers=23, num_attention_heads=16, hidden_act="gelu",
)
SD21_SCHED = dict(SD15_SCHED, prediction_type="v_prediction",
                  _class_name="DDIMScheduler")

SDXL_UNET = {
    "_class_name": "UNet2DConditionModel",
    "in_channels": 4, "out_channels": 4, "sample_size": 128,
    "block_out_channels": [320, 640, 1280],
    "layers_per_block": 2,
    "attention_head_dim": [5, 10, 20],
    "transformer_layers_per_block": [1, 2, 10],
    "cross_attention_dim": 2048,
    "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                         "CrossAttnDownBlock2D"],
    "addition_embed_type": "text_time",
    "addition_time_embed_dim": 256,
    "projection_class_embeddings_input_dim": 2816,
    "norm_num_groups": 32, "flip_sin_to_cos": True, "freq_shift": 0,
}
SDXL_TE2 = {
    "architectures": ["CLIPTextModelWithProjection"],
    "vocab_size": 49408, "hidden_size": 1280, "intermediate_size": 5120,
    "num_hidden_layers": 32, "num_attention_heads": 20,
    "max_position_embeddings": 77, "hidden_act": "gelu",
    "layer_norm_eps": 1e-05, "projection_dim": 1280,
}
SDXL_VAE = dict(SD_VAE, scaling_factor=0.13025)
SDXL_SCHED = dict(SD15_SCHED, _class_name="EulerDiscreteScheduler")


def _write_ckpt(root, *, unet, vae, sched, te=None, te2=None):
    for sub, cfg in [
        ("unet", unet), ("vae", vae),
        ("text_encoder", te), ("text_encoder_2", te2),
    ]:
        if cfg is None:
            continue
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        with open(os.path.join(root, sub, "config.json"), "w") as f:
            json.dump(cfg, f)
    os.makedirs(os.path.join(root, "scheduler"), exist_ok=True)
    with open(os.path.join(root, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(sched, f)
    return root


class TestKnownModels:
    def test_sd15_matches_preset(self, tmp_path):
        d = _write_ckpt(str(tmp_path / "my-finetune"), unet=SD15_UNET,
                        vae=SD_VAE, sched=SD15_SCHED, te=SD15_TE)
        got = config_from_checkpoint(d)
        ref = get_preset("sd15")
        assert got.unet == ref.unet
        assert got.clip == ref.clip and got.clip_2 is None
        assert got.vae == ref.vae
        assert got.default_image_size == 512
        # the real checkpoint's scheduler fields are carried verbatim
        assert got.scheduler.steps_offset == 1
        assert got.scheduler.beta_schedule == "scaled_linear"

    def test_sd21_matches_preset(self, tmp_path):
        d = _write_ckpt(str(tmp_path / "sd21-like"), unet=SD21_UNET,
                        vae=SD_VAE, sched=SD21_SCHED, te=SD21_TE)
        got = config_from_checkpoint(d)
        ref = get_preset("sd21")
        assert got.unet == ref.unet  # incl. head_dim=64 sentinel
        assert got.clip == ref.clip
        assert got.scheduler.prediction_type == "v_prediction"
        assert got.default_image_size == 768

    def test_sdxl_matches_preset(self, tmp_path):
        d = _write_ckpt(str(tmp_path / "sdxl-like"), unet=SDXL_UNET,
                        vae=SDXL_VAE, sched=SDXL_SCHED,
                        te=SD15_TE, te2=SDXL_TE2)
        got = config_from_checkpoint(d)
        ref = get_preset("sdxl")
        assert got.unet == ref.unet
        assert got.clip == ref.clip  # penultimate read: final-LN off
        assert got.clip_2 == ref.clip_2
        assert got.vae == ref.vae
        assert got.requires_aesthetics_score is False
        assert got.default_image_size == 1024

    def test_refiner_aesthetics_detected(self, tmp_path):
        unet = dict(
            SDXL_UNET,
            block_out_channels=[384, 768, 1536, 1536],
            attention_head_dim=[6, 12, 24, 24],
            transformer_layers_per_block=[1, 4, 4, 4],
            cross_attention_dim=1280,
            down_block_types=["DownBlock2D", "CrossAttnDownBlock2D",
                              "CrossAttnDownBlock2D", "DownBlock2D"],
            projection_class_embeddings_input_dim=2560,  # 1280 + 5*256
        )
        d = _write_ckpt(str(tmp_path / "refiner-like"), unet=unet,
                        vae=SDXL_VAE, sched=SDXL_SCHED, te2=SDXL_TE2)
        got = config_from_checkpoint(d)
        ref = get_preset("sdxl-refiner")
        assert got.unet == ref.unet
        assert got.clip is None and got.clip_2 == ref.clip_2
        assert got.requires_aesthetics_score is True

    def test_lcm_defaults(self, tmp_path):
        unet = dict(SD15_UNET, time_cond_proj_dim=256)
        d = _write_ckpt(str(tmp_path / "lcm-like"), unet=unet,
                        vae=SD_VAE, sched=SD15_SCHED, te=SD15_TE)
        got = config_from_checkpoint(d)
        assert got.unet == get_preset("lcm-sd15").unet
        assert got.default_cfg is False
        assert got.default_sampler == "lcm"
        assert got.default_steps == 4

    def test_inpaint_in_channels(self, tmp_path):
        unet = dict(SD15_UNET, in_channels=9)
        d = _write_ckpt(str(tmp_path / "inpaint-like"), unet=unet,
                        vae=SD_VAE, sched=SD15_SCHED, te=SD15_TE)
        assert config_from_checkpoint(d).unet == get_preset("sd15-inpaint").unet


class TestErrors:
    def test_not_a_checkpoint(self, tmp_path):
        with pytest.raises(ValueError, match="unet/config.json"):
            config_from_checkpoint(str(tmp_path))

    def test_no_text_encoder(self, tmp_path):
        d = _write_ckpt(str(tmp_path / "no-te"), unet=SD15_UNET,
                        vae=SD_VAE, sched=SD15_SCHED)
        with pytest.raises(ValueError, match="text_encoder"):
            config_from_checkpoint(d)

    def test_unsupported_head_layout(self, tmp_path):
        unet = dict(SD15_UNET, attention_head_dim=[3, 7, 11, 13])
        d = _write_ckpt(str(tmp_path / "weird"), unet=unet,
                        vae=SD_VAE, sched=SD15_SCHED, te=SD15_TE)
        with pytest.raises(ValueError, match="attention heads"):
            config_from_checkpoint(d)
