"""SDXL-refiner machinery: schedule splitting (denoising_end/start), the
bigG-only (clip=None) text path, aesthetic-score micro-conditioning, and the
base->refiner latent handoff.

Beyond-reference capability; semantics follow the diffusers SDXL refiner
(``requires_aesthetics_score``, training-timestep cutoff split).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from sdtpu.config import (
    CLIPConfig,
    PipelineConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from sdtpu.samplers import get_sampler, slice_schedule

from test_pipeline import TINY, TOKENS

REFINER_CLIP2 = CLIPConfig(
    vocab_size=1024, hidden_size=48, intermediate_size=96,
    num_layers=2, num_heads=2, max_length=16,
    use_final_layer_norm_output=False, projection_dim=48,
)

TINY_REFINER = PipelineConfig(
    name="test/tiny-refiner",
    clip=None,  # bigG-only, like the real refiner
    clip_2=REFINER_CLIP2,
    unet=UNetConfig(
        block_out_channels=(16, 24, 32),
        layers_per_block=1,
        attention_levels=(False, True, True),
        num_attention_heads=2,
        cross_attention_dim=48,
        norm_num_groups=8,
        mid_block=True,
        addition_embed_dim=48 + 5 * 8,  # pooled 48 + 5 aesthetic time ids x 8
        addition_time_embed_dim=8,
    ),
    vae=VAEConfig(block_out_channels=(8, 16, 16), layers_per_block=1,
                  norm_num_groups=8),
    scheduler=SchedulerConfig(),
    default_image_size=32,
    requires_aesthetics_score=True,
    compute_dtype=jnp.float32,
    param_dtype=jnp.float32,
)

REFINER_TOKENS = TOKENS  # ids < 1024 fit the clip_2 vocab


class TestSliceSchedule:
    @pytest.mark.parametrize(
        "name", ["ddpm", "ddim", "euler", "dpm++", "euler-karras"]
    )
    def test_end_and_start_partition_the_schedule(self, name):
        cfg = SchedulerConfig()
        sdef = get_sampler(name)
        full = sdef.make_schedule(cfg, 8, 1.0)
        head = slice_schedule(full, num_train_timesteps=1000,
                              denoising_end=0.5)
        tail = slice_schedule(full, num_train_timesteps=1000,
                              denoising_start=0.5)
        ts_full = np.asarray(full.timesteps)
        ts_cat = np.concatenate(
            [np.asarray(head.timesteps), np.asarray(tail.timesteps)]
        )
        np.testing.assert_array_equal(ts_cat, ts_full)
        assert head.num_steps + tail.num_steps == full.num_steps

    def test_euler_sigma_boundary_continuity(self):
        """The head's terminal sigma must equal the tail's starting sigma —
        the latent handoff happens at that noise level."""
        sdef = get_sampler("euler")
        full = sdef.make_schedule(SchedulerConfig(), 8, 1.0)
        head = slice_schedule(full, num_train_timesteps=1000,
                              denoising_end=0.5)
        tail = slice_schedule(full, num_train_timesteps=1000,
                              denoising_start=0.5)
        assert head.sigmas.shape[0] == head.num_steps + 1
        np.testing.assert_allclose(
            np.asarray(head.sigmas)[-1], np.asarray(tail.sigmas)[0]
        )

    def test_dpm_cold_start_is_first_order(self):
        sdef = get_sampler("dpm++")
        full = sdef.make_schedule(SchedulerConfig(), 8, 1.0)
        tail = slice_schedule(full, num_train_timesteps=1000,
                              denoising_start=0.5)
        assert float(tail.inv_2r[0]) == 0.0

    def test_rejects_bad_fractions(self):
        sdef = get_sampler("ddim")
        full = sdef.make_schedule(SchedulerConfig(), 4, 1.0)
        with pytest.raises(ValueError):
            slice_schedule(full, num_train_timesteps=1000)
        with pytest.raises(ValueError):
            slice_schedule(full, num_train_timesteps=1000,
                           denoising_end=1.5)


class TestSplitEqualsUnsplit:
    """With ONE model and a deterministic single-step sampler, running the
    head then resuming from its carry must reproduce the unsplit run —
    the strongest offline pin on the handoff math."""

    @pytest.mark.parametrize("sampler", ["ddim", "euler"])
    def test_split_run_matches_unsplit(self, tiny_pipe, sampler):
        kw = dict(token_ids=TOKENS, num_inference_steps=4, seed=5,
                  sampler=sampler, output="latents")
        full = tiny_pipe.generate("x", **kw)
        head = tiny_pipe.generate("x", denoising_end=0.5, **kw)
        tail = tiny_pipe.generate(
            "x", latents=head, denoising_start=0.5, **kw
        )
        np.testing.assert_allclose(tail, full, atol=1e-5, rtol=1e-5)

    def test_split_point_actually_splits(self, tiny_pipe):
        head = tiny_pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=4, seed=5,
            sampler="ddim", denoising_end=0.5, output="latents",
        )
        full = tiny_pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=4, seed=5,
            sampler="ddim", output="latents",
        )
        assert np.abs(head - full).max() > 1e-3  # head is still noisy

    def test_denoising_start_requires_latents(self, tiny_pipe):
        with pytest.raises(ValueError, match="latents"):
            tiny_pipe.generate(
                "x", token_ids=TOKENS, num_inference_steps=4,
                denoising_start=0.5,
            )


class TestRefinerPipeline:
    @pytest.fixture(scope="class")
    def refiner(self):
        return StableDiffusionPipeline.from_random(TINY_REFINER, seed=3)

    def test_bigg_only_params_and_generation(self, refiner):
        assert "clip" not in refiner.params
        assert "clip_2" in refiner.params
        img = refiner.generate(
            "x", token_ids=REFINER_TOKENS, num_inference_steps=2, seed=1
        )
        assert img.shape == (1, 32, 32, 3)

    def test_aesthetic_score_conditions_cond_vs_uncond(self, refiner):
        """The negative aesthetic score reaches ONLY the uncond rows: with
        CFG off, changing it must not change the image; with CFG on, it
        must."""
        cfg_b = TINY_REFINER.replace(default_negative_aesthetic_score=-50.0)
        other = StableDiffusionPipeline(cfg_b, refiner.params)
        kw = dict(token_ids=REFINER_TOKENS, num_inference_steps=2, seed=1)
        with_cfg_a = refiner.generate("x", **kw)
        with_cfg_b = other.generate("x", **kw)
        assert np.abs(
            with_cfg_a.astype(np.int32) - with_cfg_b.astype(np.int32)
        ).max() > 0
        no_cfg_a = refiner.generate("x", cfg=False,
                                    token_ids=REFINER_TOKENS[:1], **{
                                        k: v for k, v in kw.items()
                                        if k != "token_ids"})
        no_cfg_b = other.generate("x", cfg=False,
                                  token_ids=REFINER_TOKENS[:1], **{
                                      k: v for k, v in kw.items()
                                      if k != "token_ids"})
        np.testing.assert_array_equal(no_cfg_a, no_cfg_b)

    def test_base_to_refiner_handoff(self, refiner, tiny_pipe):
        """The full two-model flow: base runs the head, refiner consumes
        the carry and runs the tail (both tiny random models — this pins
        the plumbing; fidelity needs real weights)."""
        lat = tiny_pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=4, seed=7,
            sampler="euler", denoising_end=0.7, output="latents",
        )
        img = refiner.generate(
            "x", token_ids=REFINER_TOKENS, latents=lat,
            num_inference_steps=4, seed=7, sampler="euler",
            denoising_start=0.7,
        )
        assert img.shape == (1, 32, 32, 3)

    def test_textual_inversion_lands_in_clip2(self, refiner):
        """A bigG-only pipeline appends concept vectors to its single
        (clip_2) table — both single- and dual-encoder file layouts."""
        import numpy as np

        from sdtpu.utils.textual_inversion import apply_textual_inversion

        d = REFINER_CLIP2.hidden_size
        vocab = REFINER_CLIP2.vocab_size
        single = {"<cat>": np.ones((1, d), np.float32)}
        params, reg = apply_textual_inversion(refiner.params, single)
        assert reg["<cat>"] == [vocab]
        assert params["clip_2"]["token_embedding"]["weight"].shape[0] == (
            vocab + 1
        )
        dual = {"clip_l": np.ones((2, 8), np.float32),
                "clip_g": np.ones((2, d), np.float32)}
        params2, reg2 = apply_textual_inversion(
            refiner.params, dual, token="<dog>"
        )
        assert reg2["<dog>"] == [vocab, vocab + 1]

    def test_refiner_img2img(self, refiner):
        """The refiner also runs standalone img2img (strength-based),
        diffusers' other refiner mode."""
        init = np.zeros((32, 32, 3), np.uint8)
        img = refiner.generate(
            "x", token_ids=REFINER_TOKENS, num_inference_steps=3, seed=2,
            init_image=init, strength=0.5,
        )
        assert img.shape == (1, 32, 32, 3)


class TestRefinerCheckpointLayout:
    def test_from_pretrained_without_text_encoder(self, tmp_path,
                                                  monkeypatch):
        """Refiner checkpoints ship text_encoder_2/tokenizer_2 only."""
        import sdtpu.config as C
        from sdtpu.models.clip import init_clip
        from test_from_pretrained import _lin, _norm, _write_unet, _write_vae
        from test_tokenizer import build_assets

        root = tmp_path / "tiny-refiner"
        params2 = init_clip(7, REFINER_CLIP2)
        sd2 = {
            "text_model.embeddings.token_embedding.weight": np.asarray(
                params2["token_embedding"]["weight"], np.float32),
            "text_model.embeddings.position_embedding.weight": np.asarray(
                params2["position_embedding"], np.float32),
        }
        for i in range(REFINER_CLIP2.num_layers):
            layer = jax.tree.map(lambda x: x[i], params2["layers"])
            p = f"text_model.encoder.layers.{i}"
            _norm(sd2, f"{p}.layer_norm1", layer["norm1"])
            for name, key in [("q_proj", "q"), ("k_proj", "k"),
                              ("v_proj", "v"), ("out_proj", "out")]:
                _lin(sd2, f"{p}.self_attn.{name}", layer["attn"][key])
            _norm(sd2, f"{p}.layer_norm2", layer["norm2"])
            _lin(sd2, f"{p}.mlp.fc1", layer["mlp"]["fc1"])
            _lin(sd2, f"{p}.mlp.fc2", layer["mlp"]["fc2"])
        _norm(sd2, "text_model.final_layer_norm", params2["final_norm"])
        _lin(sd2, "text_projection", params2["text_projection"])
        (root / "text_encoder_2").mkdir(parents=True)
        save_file(sd2, str(root / "text_encoder_2" / "model.safetensors"))
        _write_unet(root / "unet", TINY_REFINER.unet)
        _write_vae(root / "vae", TINY_REFINER.vae)
        tok_dir = root / "tokenizer_2"
        tok_dir.mkdir()
        build_assets(tok_dir)

        monkeypatch.setitem(C.PRESETS, "tiny-refiner", TINY_REFINER)
        pipe = StableDiffusionPipeline.from_pretrained(str(root))
        assert "clip" not in pipe.params
        assert pipe.tokenizer is not None  # picked up tokenizer_2/
        img = pipe.generate("hello world", num_inference_steps=2, seed=1)
        assert img.shape == (1, 32, 32, 3)
