"""ControlNet: full-network golden parity vs the independent torch mirror,
zero-init no-op invariants, loader mapping, and pipeline-level generation.

Beyond-reference capability (the reference conditions on text only,
``pipeline.mojo:13-22``); the golden test pins the diffusers ControlNetModel
semantics — encoder-copy residuals added to the UNet's saved skips — through
the real checkpoint key mapping (``controlnet_params_from_state_dict``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sdtpu.models.controlnet import (
    controlnet_cond_embed,
    controlnet_forward,
    init_controlnet,
)
from sdtpu.models.unet import init_unet, unet_forward
from sdtpu.utils.weights import (
    controlnet_params_from_state_dict,
    unet_params_from_state_dict,
)

from conftest import assert_allclose, assert_images_match
from test_pipeline import TINY, TOKENS
from test_unet_full_golden import SD15_TOPO, TINY_TOPO
from torch_ref import RefControlNet, RefUNet, randomize_, state_dict_numpy

COND_CHANNELS = (4, 8, 8, 16)  # shrunk ladder; structure identical (8x)
# TINY's test VAE downscales 4x (3 levels), so its ladder needs one fewer
# stride-2 pair: len(ladder) - 1 pairs, one stride-2 each
COND_CHANNELS_4X = (4, 8, 16)


def _inputs(cfg, *, spatial=8, batch=1, ctx_len=5, seed=0):
    rng = np.random.default_rng(seed)
    lat = rng.standard_normal(
        (batch, spatial, spatial, cfg.in_channels)
    ).astype(np.float32)
    ctx = rng.standard_normal(
        (batch, ctx_len, cfg.cross_attention_dim)
    ).astype(np.float32)
    cond = rng.uniform(0.0, 1.0, (batch, spatial * 8, spatial * 8, 3)).astype(
        np.float32
    )
    ts = np.linspace(900.0, 10.0, batch).astype(np.float32)
    return lat, ctx, cond, ts


class TestZeroInitNoop:
    def test_residuals_are_exactly_zero(self):
        cfg = TINY_TOPO
        cn = init_controlnet(0, cfg, cond_channels=COND_CHANNELS
        )
        lat, ctx, cond, ts = _inputs(cfg)
        embed = controlnet_cond_embed(jnp.asarray(cond), cn["cond_embedding"])
        out = controlnet_forward(
            jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), embed, cn, cfg
        )
        assert out["mid"] is None  # TINY_TOPO has no mid block
        for r in out["down"]:
            assert float(jnp.abs(r).max()) == 0.0

    def test_unet_output_unchanged(self):
        """A fresh (zero-conv) ControlNet composed into the UNet is an exact
        no-op — the design property zero-init buys."""
        cfg = TINY_TOPO
        unet = init_unet(1, cfg)
        cn = init_controlnet(0, cfg, cond_channels=COND_CHANNELS
        )
        lat, ctx, cond, ts = _inputs(cfg)
        embed = controlnet_cond_embed(jnp.asarray(cond), cn["cond_embedding"])
        ctrl = controlnet_forward(
            jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), embed, cn, cfg
        )
        base = unet_forward(
            jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), unet, cfg
        )
        with_ctrl = unet_forward(
            jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), unet, cfg,
            control=ctrl,
        )
        assert_allclose(with_ctrl, base, atol=1e-6, rtol=1e-6)

    def test_scale_is_linear_in_residuals(self):
        """conditioning_scale multiplies every residual (traced scalar)."""
        cfg = TINY_TOPO
        cn = init_controlnet(2, cfg, cond_channels=COND_CHANNELS
        )
        # make the zero convs non-trivial so residuals are non-zero
        key = jax.random.key(3)
        cn["zero_convs"] = [
            {
                "kernel": 0.1 * jax.random.normal(
                    jax.random.fold_in(key, i), zc["kernel"].shape
                ),
                "bias": jnp.zeros_like(zc["bias"]),
            }
            for i, zc in enumerate(cn["zero_convs"])
        ]
        lat, ctx, cond, ts = _inputs(cfg)
        embed = controlnet_cond_embed(jnp.asarray(cond), cn["cond_embedding"])
        args = (jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), embed,
                cn, cfg)
        one = controlnet_forward(*args, conditioning_scale=1.0)
        half = controlnet_forward(*args, conditioning_scale=0.5)
        for a, b in zip(one["down"], half["down"]):
            assert_allclose(0.5 * a, b, atol=1e-6, rtol=1e-5)
        assert float(jnp.abs(one["down"][-1]).max()) > 0.0


class TestFullGolden:
    def _parity(self, cfg, *, spatial, seed, atol=3e-4, rtol=3e-3,
                batch=2, ctx_len=7):
        """Randomized RefControlNet + RefUNet (torch, diffusers spec) vs the
        sdtpu composition, weights through the real state_dict mapping."""
        cn_model = RefControlNet(cfg, cond_channels=COND_CHANNELS).eval()
        unet_model = RefUNet(cfg).eval()
        randomize_(cn_model, seed=seed)
        randomize_(unet_model, seed=seed + 1)
        cn_params = jax.tree.map(
            jnp.asarray,
            controlnet_params_from_state_dict(
                state_dict_numpy(cn_model), cfg
            ),
        )
        unet_params = jax.tree.map(
            jnp.asarray,
            unet_params_from_state_dict(state_dict_numpy(unet_model), cfg),
        )

        lat, ctx, cond, ts = _inputs(
            cfg, spatial=spatial, batch=batch, ctx_len=ctx_len, seed=seed
        )
        scale = 0.8
        with torch.no_grad():
            t_down, t_mid = cn_model(
                torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                torch.from_numpy(ts),
                torch.from_numpy(ctx),
                torch.from_numpy(cond.transpose(0, 3, 1, 2)),
                conditioning_scale=scale,
            )
            want = unet_model(
                torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                torch.from_numpy(ts),
                torch.from_numpy(ctx),
                down_residuals=t_down,
                mid_residual=t_mid,
            ).numpy().transpose(0, 2, 3, 1)

        embed = controlnet_cond_embed(
            jnp.asarray(cond), cn_params["cond_embedding"]
        )
        ctrl = controlnet_forward(
            jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), embed,
            cn_params, cfg, conditioning_scale=scale,
        )
        # residual-level parity first (sharper attribution on failure)
        for got_r, want_r in zip(ctrl["down"], t_down):
            assert_allclose(
                got_r, want_r.numpy().transpose(0, 2, 3, 1),
                atol=atol, rtol=rtol,
            )
        got = np.asarray(
            unet_forward(
                jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx),
                unet_params, cfg, control=ctrl,
            )
        )
        assert got.shape == want.shape
        assert_allclose(got, want, atol=atol, rtol=rtol)

    def test_tiny_topology(self):
        self._parity(TINY_TOPO, spatial=8, seed=5)

    def test_sd15_topology_with_mid_block(self):
        """SD1.5 shape: mid block present -> controlnet_mid_block residual
        + plain innermost level."""
        self._parity(SD15_TOPO, spatial=16, seed=9)

    def test_sdxl_topology_with_micro_conditioning(self):
        """SDXL-style ControlNet: the encoder copy carries the add_embedding
        (pooled text embeds + time-id sinusoids) — parity through the name
        mapping incl. that path and a no-attention outer level."""
        from test_unet_full_golden import SDXL_TOPO

        cfg = SDXL_TOPO
        cn_model = RefControlNet(cfg, cond_channels=COND_CHANNELS).eval()
        randomize_(cn_model, seed=17)
        cn_params = jax.tree.map(
            jnp.asarray,
            controlnet_params_from_state_dict(
                state_dict_numpy(cn_model), cfg
            ),
        )
        lat, ctx, cond, ts = _inputs(cfg, spatial=8, batch=2, ctx_len=7,
                                     seed=17)
        rng = np.random.default_rng(18)
        pooled = rng.standard_normal((2, 16)).astype(np.float32)
        time_ids = np.array(
            [[512, 512, 0, 0, 512, 512], [768, 768, 10, 20, 512, 512]],
            np.float32,
        )
        with torch.no_grad():
            t_down, t_mid = cn_model(
                torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                torch.from_numpy(ts),
                torch.from_numpy(ctx),
                torch.from_numpy(cond.transpose(0, 3, 1, 2)),
                conditioning_scale=0.9,
                text_embeds=torch.from_numpy(pooled),
                time_ids=torch.from_numpy(time_ids),
            )
        embed = controlnet_cond_embed(
            jnp.asarray(cond), cn_params["cond_embedding"]
        )
        ctrl = controlnet_forward(
            jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), embed,
            cn_params, cfg, conditioning_scale=0.9,
            added_cond={
                "text_embeds": jnp.asarray(pooled),
                "time_ids": jnp.asarray(time_ids),
            },
        )
        for got_r, want_r in zip(ctrl["down"], t_down):
            assert_allclose(
                got_r, want_r.numpy().transpose(0, 2, 3, 1),
                atol=3e-4, rtol=3e-3,
            )
        assert_allclose(
            ctrl["mid"], t_mid.numpy().transpose(0, 2, 3, 1),
            atol=3e-4, rtol=3e-3,
        )

    def test_mapping_conserves_elements(self):
        model = RefControlNet(TINY_TOPO, cond_channels=COND_CHANNELS)
        sd = state_dict_numpy(model)
        params = controlnet_params_from_state_dict(sd, TINY_TOPO)
        n_sd = sum(int(np.prod(v.shape)) for v in sd.values())
        n_tree = sum(
            int(np.prod(np.shape(x))) for x in jax.tree.leaves(params)
        )
        assert n_sd == n_tree

    def test_loader_matches_init_structure(self):
        """The loader's tree and the random init's tree must be
        interchangeable (same structure + shapes) — the pipeline accepts
        either."""
        model = RefControlNet(TINY_TOPO, cond_channels=COND_CHANNELS)
        loaded = controlnet_params_from_state_dict(
            state_dict_numpy(model), TINY_TOPO
        )
        inited = init_controlnet(0, TINY_TOPO, cond_channels=COND_CHANNELS
        )
        ls = jax.tree.structure(loaded)
        rs = jax.tree.structure(inited)
        assert ls == rs
        for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(inited)):
            assert np.shape(a) == np.shape(b)


class TestPipelineControl:
    def _pipe(self):
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        cn = init_controlnet(7, TINY.unet, cond_channels=COND_CHANNELS_4X,
            dtype=TINY.param_dtype,
        )
        pipe.load_controlnet(cn)
        return pipe

    def test_zero_init_matches_baseline(self):
        """Pipeline program with a fresh ControlNet == program without one
        (the control path adds exactly-zero residuals)."""
        pipe = self._pipe()
        control = np.zeros((32, 32, 3), np.uint8)
        base = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3
        )
        with_ctrl = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3,
            control_image=control,
        )
        assert_images_match(base, with_ctrl)

    def test_trained_controlnet_changes_output(self):
        """Non-zero zero-convs (a 'trained' ControlNet) must steer the
        image, and controlnet_scale=0.0 must recover the baseline."""
        pipe = self._pipe()
        key = jax.random.key(11)
        pipe.controlnet["zero_convs"] = [
            {
                "kernel": 0.5 * jax.random.normal(
                    jax.random.fold_in(key, i), zc["kernel"].shape,
                    dtype=zc["kernel"].dtype,
                ),
                "bias": zc["bias"],
            }
            for i, zc in enumerate(pipe.controlnet["zero_convs"])
        ]
        control = (
            np.random.default_rng(0)
            .uniform(0, 255, (32, 32, 3))
            .astype(np.uint8)
        )
        base = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3
        )
        steered = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3,
            control_image=control,
        )
        assert np.abs(
            steered.astype(np.int32) - base.astype(np.int32)
        ).max() > 0
        off = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3,
            control_image=control, controlnet_scale=0.0,
        )
        assert_images_match(base, off)

    def test_batch_and_img2img_compose(self):
        pipe = self._pipe()
        control = np.full((32, 32, 3), 128, np.uint8)
        imgs = pipe.generate_batch(
            ["a", "b"], token_ids=np.tile(TOKENS[:1], (2, 1)),
            num_inference_steps=2, seeds=[1, 2],
            control_images=[control, control],
        )
        assert imgs.shape == (2, 32, 32, 3)
        init = np.zeros((32, 32, 3), np.uint8)
        img = pipe.generate(
            "a", token_ids=TOKENS[:1], num_inference_steps=2, seed=1,
            init_image=init, control_image=control, strength=0.5,
        )
        assert img.shape == (1, 32, 32, 3)

    def test_multi_controlnet(self):
        """Two nets: a zero-init net contributes nothing, so [zero, trained]
        must equal the trained net alone (exact); per-net scales list; a
        map-count mismatch raises."""
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        import pytest

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        zero_cn = init_controlnet(20, TINY.unet, cond_channels=COND_CHANNELS_4X
        )
        trained = init_controlnet(21, TINY.unet, cond_channels=COND_CHANNELS_4X
        )
        key = jax.random.key(22)
        trained["zero_convs"] = [
            {
                "kernel": 0.5 * jax.random.normal(
                    jax.random.fold_in(key, i), zc["kernel"].shape,
                    dtype=zc["kernel"].dtype,
                ),
                "bias": zc["bias"],
            }
            for i, zc in enumerate(trained["zero_convs"])
        ]
        rng = np.random.default_rng(1)
        map_a = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        map_b = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)

        pipe.load_controlnet(trained)
        single = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3,
            control_image=map_b, controlnet_scale=0.6,
        )
        pipe.load_controlnet([zero_cn, trained])
        both = pipe.generate(
            "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3,
            control_image=[map_a, map_b], controlnet_scale=[1.0, 0.6],
        )
        assert_images_match(both, single)
        with pytest.raises(ValueError, match="one map per net"):
            pipe.generate(
                "x", token_ids=TOKENS[:1], num_inference_steps=2, seed=3,
                control_image=map_a,
            )
        # batch path: per-request [map, map] entries
        imgs = pipe.generate_batch(
            ["a", "b"], token_ids=np.tile(TOKENS[:1], (2, 1)),
            num_inference_steps=2, seeds=[1, 2],
            control_images=[[map_a, map_b], [map_b, map_a]],
            controlnet_scale=[1.0, 0.6],
        )
        assert imgs.shape == (2, 32, 32, 3)

    def test_serving_engine_matches_direct(self):
        """ControlNet requests serve through the micro-batching engine:
        same image as the direct batch call, and control vs no-control
        requests never share a program bucket."""
        from sdtpu.pipeline.serving import ServingEngine

        pipe = self._pipe()
        key = jax.random.key(13)
        pipe.controlnet["zero_convs"] = [
            {
                "kernel": 0.5 * jax.random.normal(
                    jax.random.fold_in(key, i), zc["kernel"].shape,
                    dtype=zc["kernel"].dtype,
                ),
                "bias": zc["bias"],
            }
            for i, zc in enumerate(pipe.controlnet["zero_convs"])
        ]
        rng = np.random.default_rng(5)
        ctrl_a = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ctrl_b = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ids = TOKENS[0]
        direct = pipe.generate_batch(
            ["p"], token_ids=ids[None], num_inference_steps=3, seeds=[5],
            control_images=[ctrl_a], controlnet_scale=0.7,
        )
        engine = ServingEngine(pipe, max_batch_size=2, max_wait_ms=50)
        try:
            fa = engine.submit("p", token_ids=ids, seed=5,
                               num_inference_steps=3, image_size=32,
                               control_image=ctrl_a, controlnet_scale=0.7)
            fb = engine.submit("p", token_ids=ids, seed=6,
                               num_inference_steps=3, image_size=32,
                               control_image=ctrl_b, controlnet_scale=0.7)
            a, b = fa.result(300), fb.result(300)
            # control and no-control must NOT coalesce
            fc = engine.submit("p", token_ids=ids, seed=5,
                               num_inference_steps=3, image_size=32)
            fc.result(300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert_images_match(a, direct[0])
        assert (a != b).any()  # distinct control maps -> distinct images
        assert stats["batches"] >= 2

    def test_submit_without_controlnet_rejected(self):
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline
        from sdtpu.pipeline.serving import ServingEngine

        import pytest

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        engine = ServingEngine(pipe, max_batch_size=2)
        try:
            with pytest.raises(ValueError, match="load_controlnet"):
                engine.submit(
                    "p", token_ids=TOKENS[0], image_size=32,
                    num_inference_steps=1,
                    control_image=np.zeros((32, 32, 3), np.uint8),
                )
        finally:
            engine.shutdown()

    def test_requires_loaded_controlnet(self):
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        import pytest

        pipe = StableDiffusionPipeline.from_random(TINY, seed=0)
        with pytest.raises(ValueError, match="load_controlnet"):
            pipe.generate(
                "x", token_ids=TOKENS[:1], num_inference_steps=1,
                control_image=np.zeros((32, 32, 3), np.uint8),
            )
