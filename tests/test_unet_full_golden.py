"""FULL-NETWORK UNet golden parity vs the independent torch mirror
(tests/torch_ref.py, built from the diffusers spec — not from sdtpu code).

Every weight travels the real checkpoint path: torch ``state_dict()`` (exact
diffusers keys) -> ``unet_params_from_state_dict`` -> ``unet_forward`` — so a
wrong key mapping, transposed kernel, mis-wired skip LIFO, or mis-placed
attention block fails here.  This is the offline stand-in for loading real
Tiny-SD weights (reference: ``diffusion.mojo:150-273`` wiring; the reference
itself never loads weights, ``helpers/utils.mojo:1719-1726``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sdtpu.config import UNetConfig
from sdtpu.models.unet import unet_forward
from sdtpu.utils.weights import unet_params_from_state_dict

from conftest import assert_allclose
from torch_ref import RefUNet, randomize_, state_dict_numpy

# Tiny-SD topology (3 levels, attention everywhere, no mid block) at shrunk
# widths — the reference's exact wiring shape (diffusion.mojo:236-272).
TINY_TOPO = UNetConfig(
    block_out_channels=(32, 48, 64),
    layers_per_block=1,
    attention_levels=(True, True, True),
    transformer_layers_per_block=(1, 1, 1),
    num_attention_heads=2,
    cross_attention_dim=40,
    norm_num_groups=8,
)

# SD 1.5 topology: 4 levels, 2 layers/block, mid block, plain (no-attention)
# innermost level — covers DownBlock2D/UpBlock2D + mid-block mapping.
SD15_TOPO = UNetConfig(
    block_out_channels=(32, 32, 48, 48),
    layers_per_block=2,
    attention_levels=(True, True, True, False),
    transformer_layers_per_block=(1, 1, 1, 1),
    num_attention_heads=2,
    cross_attention_dim=40,
    norm_num_groups=8,
    mid_block=True,
)

# SDXL topology: plain outermost level, transformer depth > 1, mid block,
# and the add_embedding micro-conditioning (pooled 16 + 6 ids x 8 = 64).
SDXL_TOPO = UNetConfig(
    block_out_channels=(32, 48, 64),
    layers_per_block=2,
    attention_levels=(False, True, True),
    transformer_layers_per_block=(1, 2, 2),
    num_attention_heads=2,
    cross_attention_dim=40,
    norm_num_groups=8,
    mid_block=True,
    addition_embed_dim=64,
    addition_time_embed_dim=8,
)


def _run_parity(cfg, *, spatial, batch=2, ctx_len=9, seed=1,
                atol=2e-4, rtol=2e-3):
    model = RefUNet(cfg).eval()
    randomize_(model, seed=seed)
    params = jax.tree.map(
        jnp.asarray, unet_params_from_state_dict(state_dict_numpy(model), cfg)
    )

    rng = np.random.default_rng(seed)
    lat = rng.standard_normal(
        (batch, spatial, spatial, cfg.in_channels)
    ).astype(np.float32)
    ctx = rng.standard_normal(
        (batch, ctx_len, cfg.cross_attention_dim)
    ).astype(np.float32)
    ts = np.linspace(981.0, 1.0, batch).astype(np.float32)

    with torch.no_grad():
        want = model(
            torch.from_numpy(lat.transpose(0, 3, 1, 2)),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
        ).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(
        unet_forward(jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx),
                     params, cfg)
    )
    assert got.shape == want.shape
    assert_allclose(got, want, atol=atol, rtol=rtol)
    return got


class TestFullUNetGolden:
    def test_tiny_sd_topology(self):
        _run_parity(TINY_TOPO, spatial=16)

    def test_tiny_sd_topology_other_seed_and_odd_context(self):
        _run_parity(TINY_TOPO, spatial=8, ctx_len=5, seed=7)

    def test_sd15_topology_with_mid_block(self):
        _run_parity(SD15_TOPO, spatial=16)

    @pytest.mark.nobudget  # isolated heavy guard: real-width torch mirror +
    # eager forward is ~65 s CPU and irreducible without losing the
    # anti-vacuity coverage (the topology tests above stay under budget)
    def test_real_dims_tiny_sd(self):
        """The REAL Tiny-SD channel dims (320/640/1280, ctx 768, 8 heads) at
        small spatial size: exercises every real tensor shape the Tiny-SD
        checkpoint ships, end to end through the name mapping."""
        _run_parity(
            UNetConfig(), spatial=8, batch=1, ctx_len=77,
            # deeper/wider accumulation drifts more in f32
            atol=6e-4, rtol=5e-3,
        )

    def test_sdxl_topology_with_micro_conditioning(self):
        """SDXL shape: no-attention outer level, depth-2 transformers, mid
        block, AND the add_embedding path (pooled text embeds + time-id
        sinusoids), end to end through the name mapping."""
        cfg = SDXL_TOPO
        model = RefUNet(cfg).eval()
        randomize_(model, seed=11)
        params = jax.tree.map(
            jnp.asarray,
            unet_params_from_state_dict(state_dict_numpy(model), cfg),
        )
        rng = np.random.default_rng(11)
        batch = 2
        lat = rng.standard_normal((batch, 16, 16, 4)).astype(np.float32)
        ctx = rng.standard_normal((batch, 9, 40)).astype(np.float32)
        ts = np.array([981.0, 1.0], np.float32)
        pooled = rng.standard_normal((batch, 16)).astype(np.float32)
        time_ids = np.array(
            [[512, 512, 0, 0, 512, 512], [768, 768, 10, 20, 512, 512]],
            np.float32,
        )
        with torch.no_grad():
            want = model(
                torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                torch.from_numpy(ts),
                torch.from_numpy(ctx),
                text_embeds=torch.from_numpy(pooled),
                time_ids=torch.from_numpy(time_ids),
            ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(
            unet_forward(
                jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), params,
                cfg,
                added_cond={
                    "text_embeds": jnp.asarray(pooled),
                    "time_ids": jnp.asarray(time_ids),
                },
            )
        )
        assert_allclose(got, want, atol=2e-4, rtol=2e-3)

    def test_refiner_topology_with_aesthetic_time_ids(self):
        """SDXL-REFINER shape: plain outer AND inner levels, depth-2
        transformers, mid block, and 5 (aesthetic-score) time ids through
        the add-embedding — pooled P + 5 x time_embed_dim must land
        exactly (a wrong id count would shape-error or mis-add)."""
        cfg = UNetConfig(
            block_out_channels=(32, 48, 64),
            layers_per_block=2,
            attention_levels=(False, True, False),
            transformer_layers_per_block=(1, 2, 1),
            num_attention_heads=2,
            cross_attention_dim=40,
            norm_num_groups=8,
            mid_block=True,
            addition_embed_dim=16 + 5 * 8,  # pooled 16 + 5 ids x 8
            addition_time_embed_dim=8,
        )
        model = RefUNet(cfg).eval()
        randomize_(model, seed=21)
        params = jax.tree.map(
            jnp.asarray,
            unet_params_from_state_dict(state_dict_numpy(model), cfg),
        )
        rng = np.random.default_rng(21)
        batch = 2
        lat = rng.standard_normal((batch, 16, 16, 4)).astype(np.float32)
        ctx = rng.standard_normal((batch, 9, 40)).astype(np.float32)
        ts = np.array([981.0, 1.0], np.float32)
        pooled = rng.standard_normal((batch, 16)).astype(np.float32)
        time_ids = np.array(
            [[512, 512, 0, 0, 6.0], [768, 768, 10, 20, 2.5]], np.float32
        )
        with torch.no_grad():
            want = model(
                torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                torch.from_numpy(ts),
                torch.from_numpy(ctx),
                text_embeds=torch.from_numpy(pooled),
                time_ids=torch.from_numpy(time_ids),
            ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(
            unet_forward(
                jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), params,
                cfg,
                added_cond={
                    "text_embeds": jnp.asarray(pooled),
                    "time_ids": jnp.asarray(time_ids),
                },
            )
        )
        assert_allclose(got, want, atol=2e-4, rtol=2e-3)

    def test_lcm_guidance_embedding_full_net(self):
        """LCM cond_proj: the guidance embedding enters the time MLP through
        a bias-free projection — parity incl. that weight."""
        cfg = dataclasses.replace(TINY_TOPO, time_cond_proj_dim=8)
        model = RefUNet(cfg).eval()
        randomize_(model, seed=13)
        params = jax.tree.map(
            jnp.asarray,
            unet_params_from_state_dict(state_dict_numpy(model), cfg),
        )
        rng = np.random.default_rng(13)
        lat = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        ctx = rng.standard_normal((1, 5, 40)).astype(np.float32)
        ts = np.array([400.0], np.float32)
        w_emb = rng.standard_normal((1, 8)).astype(np.float32)
        with torch.no_grad():
            want = model(
                torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                torch.from_numpy(ts),
                torch.from_numpy(ctx),
                timestep_cond=torch.from_numpy(w_emb),
            ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(
            unet_forward(
                jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx), params,
                cfg, timestep_cond=jnp.asarray(w_emb),
            )
        )
        assert_allclose(got, want, atol=2e-4, rtol=2e-3)

    def test_mapping_rejects_nothing_silently(self):
        """Every torch parameter must land somewhere in the pytree: compare
        total element counts (a silently dropped tensor would pass forward
        parity only by luck)."""
        model = RefUNet(TINY_TOPO)
        sd = state_dict_numpy(model)
        params = unet_params_from_state_dict(sd, TINY_TOPO)
        n_sd = sum(int(np.prod(v.shape)) for v in sd.values())
        n_tree = sum(
            int(np.prod(np.shape(x))) for x in jax.tree.leaves(params)
        )
        assert n_sd == n_tree

    def test_perturbed_weight_changes_output(self):
        """Anti-false-positive guard: parity must be sensitive to a single
        deep weight — perturb one decoder resnet kernel and require a
        different output."""
        cfg = TINY_TOPO
        model = RefUNet(cfg).eval()
        randomize_(model, seed=3)
        sd = state_dict_numpy(model)
        params = jax.tree.map(
            jnp.asarray, unet_params_from_state_dict(sd, cfg)
        )
        sd2 = dict(sd)
        key = "up_blocks.1.resnets.0.conv1.weight"
        sd2[key] = sd2[key] + 0.05
        params2 = jax.tree.map(
            jnp.asarray, unet_params_from_state_dict(sd2, cfg)
        )
        rng = np.random.default_rng(0)
        lat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, 5, 40)), jnp.float32)
        ts = jnp.asarray([500.0])
        a = unet_forward(lat, ts, ctx, params, cfg)
        b = unet_forward(lat, ts, ctx, params2, cfg)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


class TestLCMCondProj:
    def test_cond_proj_key_mapping(self):
        """LCM checkpoints carry time_embedding.cond_proj (bias-free); the
        mapping must pick it up when present."""
        cfg = dataclasses.replace(TINY_TOPO, time_cond_proj_dim=8)
        model = RefUNet(TINY_TOPO)
        sd = state_dict_numpy(model)
        sd["time_embedding.cond_proj.weight"] = (
            np.random.default_rng(0)
            .standard_normal((TINY_TOPO.block_out_channels[0], 8))
            .astype(np.float32)
        )
        params = unet_params_from_state_dict(sd, cfg)
        assert "cond_proj" in params["time_embedding"]
        assert params["time_embedding"]["cond_proj"]["kernel"].shape == (8, 32)
