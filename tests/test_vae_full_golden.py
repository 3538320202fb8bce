"""FULL-NETWORK VAE (AutoencoderKL) golden parity vs the independent torch
mirror (tests/torch_ref.py, diffusers spec — not sdtpu code).

Covers the complete encode path (conv_in -> asymmetric-pad downsamples ->
mid attention -> moments -> quant_conv; reference ``vae.mojo:70-159``) and
decode path (post_quant -> mid -> upsample chain; ``vae.mojo:162-250``),
with all weights travelling state_dict() -> *_params_from_state_dict.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sdtpu.config import VAEConfig
from sdtpu.models.vae import vae_decode, vae_encode, vae_encoder
from sdtpu.utils.weights import (
    vae_decoder_params_from_state_dict,
    vae_encoder_params_from_state_dict,
)

from conftest import assert_allclose
from torch_ref import RefAutoencoderKL, randomize_, state_dict_numpy

SMALL = VAEConfig(block_out_channels=(16, 24, 32), layers_per_block=1,
                  norm_num_groups=8)
# real SD VAE topology at shrunk widths: 4 levels, 2 layers/block
SD_TOPO = VAEConfig(block_out_channels=(16, 16, 24, 24), layers_per_block=2,
                    norm_num_groups=8)


def _models(cfg, seed=1):
    model = RefAutoencoderKL(cfg).eval()
    randomize_(model, seed=seed)
    sd = state_dict_numpy(model)
    enc = jax.tree.map(jnp.asarray, vae_encoder_params_from_state_dict(sd, cfg))
    dec = jax.tree.map(jnp.asarray, vae_decoder_params_from_state_dict(sd, cfg))
    return model, enc, dec


class TestVAEEncoderGolden:
    def _run(self, cfg, size, seed=1, atol=2e-4, rtol=2e-3):
        model, enc, _ = _models(cfg, seed)
        rng = np.random.default_rng(seed)
        img = rng.standard_normal((2, size, size, cfg.in_channels)).astype(
            np.float32
        )
        with torch.no_grad():
            want = model.encode_moments(
                torch.from_numpy(img.transpose(0, 3, 1, 2))
            ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(vae_encoder(jnp.asarray(img), enc, cfg))
        assert got.shape == want.shape
        assert_allclose(got, want, atol=atol, rtol=rtol)

    def test_small(self):
        self._run(SMALL, 32)

    def test_sd_topology(self):
        self._run(SD_TOPO, 32)

    def test_full_encode_reparameterization(self):
        """vae_encode = moments -> clamp -> mean + noise*std -> *scaling,
        torch side computed explicitly from the same moments."""
        cfg = SMALL
        model, enc, _ = _models(cfg)
        rng = np.random.default_rng(0)
        img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        g = 32 // cfg.downscale_factor
        noise = rng.standard_normal((1, g, g, cfg.latent_channels)).astype(
            np.float32
        )
        with torch.no_grad():
            m = model.encode_moments(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        mean, logvar = torch.chunk(m, 2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        want = (
            (mean + torch.from_numpy(noise.transpose(0, 3, 1, 2))
             * torch.exp(0.5 * logvar))
            * cfg.scaling_factor
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(
            vae_encode(jnp.asarray(img), jnp.asarray(noise), enc, cfg)
        )
        assert_allclose(got, want, atol=2e-4, rtol=2e-3)


class TestVAEDecoderGolden:
    def _run(self, cfg, lat_size, seed=1, atol=2e-4, rtol=2e-3):
        model, _, dec = _models(cfg, seed)
        rng = np.random.default_rng(seed)
        lat = rng.standard_normal(
            (2, lat_size, lat_size, cfg.latent_channels)
        ).astype(np.float32)
        with torch.no_grad():
            want = model.decode(
                torch.from_numpy(lat.transpose(0, 3, 1, 2)), cfg.scaling_factor
            ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(vae_decode(jnp.asarray(lat), dec, cfg))
        assert got.shape == want.shape
        assert_allclose(got, want, atol=atol, rtol=rtol)

    def test_small(self):
        self._run(SMALL, 4)

    def test_sd_topology(self):
        self._run(SD_TOPO, 4)

    def test_real_dims_sd_vae(self):
        """Real SD VAE dims (128/256/512/512, z=4) at a tiny latent grid —
        every real checkpoint tensor shape through the mapping."""
        self._run(VAEConfig(), 2, atol=6e-4, rtol=5e-3)


class TestRoundTripConsistency:
    def test_encode_decode_round_trip_parity(self):
        """Full encode->decode through both frameworks lands on the same
        image (composition of the two parity paths)."""
        cfg = SMALL
        model, enc, dec = _models(cfg, seed=5)
        rng = np.random.default_rng(5)
        img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        g = 32 // cfg.downscale_factor
        zero = np.zeros((1, g, g, cfg.latent_channels), np.float32)
        with torch.no_grad():
            m = model.encode_moments(torch.from_numpy(img.transpose(0, 3, 1, 2)))
            mean = torch.chunk(m, 2, dim=1)[0] * cfg.scaling_factor
            want = model.decode(mean, cfg.scaling_factor).numpy().transpose(
                0, 2, 3, 1
            )
        lat = vae_encode(jnp.asarray(img), jnp.asarray(zero), enc, cfg)
        got = np.asarray(vae_decode(lat, dec, cfg))
        assert_allclose(got, want, atol=5e-4, rtol=5e-3)
