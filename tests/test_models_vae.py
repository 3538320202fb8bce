"""VAE tests: component golden vs torch + encode/decode structure.

Covers the img2img encode path (vae.mojo:118-129: clamp, reparameterize,
scale) and the decode path (vae.mojo:221-250) with standard SD semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sdtpu.config import VAEConfig
from sdtpu.models.vae import (
    init_vae_decoder,
    init_vae_encoder,
    vae_decode,
    vae_encode,
    vae_encoder,
    vae_resnet,
)

from conftest import assert_allclose

SMALL = VAEConfig(
    block_out_channels=(16, 24, 32),
    layers_per_block=1,
    norm_num_groups=8,
)


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


class TestVaeResnet:
    def test_matches_torch(self, rng):
        from sdtpu.models.vae import _init_vae_resnet

        params = _init_vae_resnet(jax.random.key(0), 16, 24, dtype=jnp.float32)
        x = rng.standard_normal((1, 8, 8, 16), dtype=np.float32)

        ours = vae_resnet(jnp.array(x), params, num_groups=8)

        def gn(inp, p):
            return F.group_norm(inp.permute(0, 3, 1, 2), 8,
                                t(np.asarray(p["scale"])), t(np.asarray(p["bias"])),
                                eps=1e-6).permute(0, 2, 3, 1)

        def conv(inp, p, padding=1):
            w = t(np.asarray(p["kernel"])).permute(3, 2, 0, 1)
            return F.conv2d(inp.permute(0, 3, 1, 2), w, t(np.asarray(p["bias"])),
                            padding=padding).permute(0, 2, 3, 1)

        h = conv(F.silu(gn(t(x), params["norm1"])), params["conv1"])
        h = conv(F.silu(gn(h, params["norm2"])), params["conv2"])
        expected = conv(t(x), params["conv_shortcut"], padding=0) + h
        assert_allclose(ours, expected.numpy(), atol=1e-4, rtol=1e-3)


class TestEncoder:
    def test_moments_shape(self):
        params = init_vae_encoder(0, SMALL)
        img = jnp.zeros((1, 32, 32, 3))
        moments = vae_encoder(img, params, SMALL)
        # 3 levels -> downscale 4; 2*latent channels
        assert moments.shape == (1, 8, 8, 8)

    def test_encode_reparameterization(self):
        """x = mean + noise * std, scaled (vae.mojo:118-129)."""
        params = init_vae_encoder(0, SMALL)
        img = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
        moments = vae_encoder(img, params, SMALL)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30, 20)

        noise = jax.random.normal(jax.random.key(2), mean.shape)
        lat = vae_encode(img, noise, params, SMALL)
        expected = (mean + noise * jnp.exp(0.5 * logvar)) * SMALL.scaling_factor
        assert_allclose(lat, expected, atol=1e-4, rtol=1e-3)

    def test_encode_zero_noise_is_scaled_mean(self):
        params = init_vae_encoder(0, SMALL)
        img = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
        lat = vae_encode(img, jnp.zeros((1, 8, 8, 4)), params, SMALL)
        mean = jnp.split(vae_encoder(img, params, SMALL), 2, axis=-1)[0]
        assert_allclose(lat, mean * SMALL.scaling_factor, atol=1e-5)


class TestDecoder:
    def test_decode_shape(self):
        params = init_vae_decoder(0, SMALL)
        lat = jnp.zeros((2, 8, 8, 4))
        img = vae_decode(lat, params, SMALL)
        assert img.shape == (2, 32, 32, 3)

    def test_jit(self):
        params = init_vae_decoder(0, SMALL)
        fn = jax.jit(lambda p, z: vae_decode(z, p, SMALL))
        out = fn(params, jnp.ones((1, 8, 8, 4)) * 0.1)
        assert np.isfinite(np.asarray(out)).all()

    def test_roundtrip_finite(self):
        """Random weights won't reconstruct, but the pipe must be finite."""
        enc = init_vae_encoder(0, SMALL)
        dec = init_vae_decoder(1, SMALL)
        img = jax.random.normal(jax.random.key(2), (1, 32, 32, 3)) * 0.5
        lat = vae_encode(img, jnp.zeros((1, 8, 8, 4)), enc, SMALL)
        out = vae_decode(lat, dec, SMALL)
        assert out.shape == img.shape
        assert np.isfinite(np.asarray(out)).all()
