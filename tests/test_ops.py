"""Golden-value op tests against torch CPU fp32 (SURVEY.md §4 test plan).

The reference has no tests at all; these pin each op of
``helpers/utils.mojo``'s L1 layer (conv, norms, linear, activations,
embeddings, upsample) to the standard semantics via torch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sdtpu import ops

from conftest import assert_allclose


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


class TestConv2d:
    @pytest.mark.parametrize("stride,padding", [(1, 1), (2, 1), (1, 0), (2, 0)])
    def test_matches_torch(self, rng, stride, padding):
        x = rng.standard_normal((2, 16, 16, 8), dtype=np.float32)
        k = rng.standard_normal((3, 3, 8, 12), dtype=np.float32) * 0.1
        b = rng.standard_normal(12, dtype=np.float32)
        ours = ops.conv2d(jnp.array(x), jnp.array(k), jnp.array(b),
                          stride=stride, padding=padding)
        theirs = F.conv2d(
            t(x).permute(0, 3, 1, 2), t(k).permute(3, 2, 0, 1), t(b),
            stride=stride, padding=padding,
        ).permute(0, 2, 3, 1)
        assert_allclose(ours, theirs.numpy(), atol=1e-4, rtol=1e-4)

    def test_asymmetric_padding(self, rng):
        """The VAE encoder's (0,1),(0,1) stride-2 pad (vae.mojo:115-116)."""
        x = rng.standard_normal((1, 16, 16, 4), dtype=np.float32)
        k = rng.standard_normal((3, 3, 4, 8), dtype=np.float32) * 0.1
        ours = ops.conv2d(jnp.array(x), jnp.array(k),
                          stride=2, padding=((0, 1), (0, 1)))
        xp = F.pad(t(x).permute(0, 3, 1, 2), (0, 1, 0, 1))
        theirs = F.conv2d(xp, t(k).permute(3, 2, 0, 1), stride=2)
        assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(),
                        atol=1e-4, rtol=1e-4)

    def test_1x1(self, rng):
        x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        k = rng.standard_normal((1, 1, 4, 4), dtype=np.float32)
        ours = ops.conv2d(jnp.array(x), jnp.array(k), padding=0)
        theirs = F.conv2d(t(x).permute(0, 3, 1, 2), t(k).permute(3, 2, 0, 1))
        assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(),
                        atol=1e-4, rtol=1e-4)


class TestNorms:
    @pytest.mark.parametrize("groups", [1, 4, 32])
    def test_group_norm(self, rng, groups):
        x = rng.standard_normal((2, 8, 8, 64), dtype=np.float32)
        scale = rng.standard_normal(64, dtype=np.float32)
        bias = rng.standard_normal(64, dtype=np.float32)
        params = {"scale": jnp.array(scale), "bias": jnp.array(bias)}
        ours = ops.group_norm(jnp.array(x), params, num_groups=groups)
        theirs = F.group_norm(
            t(x).permute(0, 3, 1, 2), groups, t(scale), t(bias), eps=1e-5
        ).permute(0, 2, 3, 1)
        assert_allclose(ours, theirs.numpy(), atol=1e-5, rtol=1e-4)

    def test_group_norm_eps_1e6(self, rng):
        """UNet attention blocks use eps=1e-6 (diffusion.mojo:88 analogue)."""
        x = rng.standard_normal((1, 4, 4, 32), dtype=np.float32)
        params = ops.init_group_norm(32)
        ours = ops.group_norm(jnp.array(x), params, num_groups=32, eps=1e-6)
        theirs = F.group_norm(t(x).permute(0, 3, 1, 2), 32, eps=1e-6)
        assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(),
                        atol=1e-5, rtol=1e-4)

    def test_layer_norm(self, rng):
        x = rng.standard_normal((2, 7, 32), dtype=np.float32)
        scale = rng.standard_normal(32, dtype=np.float32)
        bias = rng.standard_normal(32, dtype=np.float32)
        params = {"scale": jnp.array(scale), "bias": jnp.array(bias)}
        ours = ops.layer_norm(jnp.array(x), params)
        theirs = F.layer_norm(t(x), (32,), t(scale), t(bias), eps=1e-5)
        assert_allclose(ours, theirs.numpy(), atol=1e-5, rtol=1e-4)

    def test_layer_norm_matmul_stats_matches_torch(self, rng):
        """The TPU path computes E[x]/E[x^2] as ones-matmuls (lane-axis
        reduce off the VPU); numerics must stay within the torch gate.
        Bitwise solo-vs-coalesced invariance of this form is a TPU-only
        guarantee checked on-chip (tools/check_batch_invariance.py)."""
        import torch.nn.functional as F

        x = rng.standard_normal((2, 7, 32), dtype=np.float32) * 3 + 1.5
        scale = rng.standard_normal(32, dtype=np.float32)
        bias = rng.standard_normal(32, dtype=np.float32)
        params = {"scale": jnp.array(scale), "bias": jnp.array(bias)}
        ours = ops.layer_norm(jnp.array(x), params, stats="matmul")
        theirs = F.layer_norm(t(x), (32,), t(scale), t(bias), eps=1e-5)
        assert_allclose(ours, theirs.numpy(), atol=1e-4, rtol=1e-3)


class TestLinear:
    def test_matches_torch(self, rng):
        x = rng.standard_normal((3, 5, 16), dtype=np.float32)
        w = rng.standard_normal((16, 24), dtype=np.float32)
        b = rng.standard_normal(24, dtype=np.float32)
        ours = ops.linear(jnp.array(x), {"kernel": jnp.array(w), "bias": jnp.array(b)})
        theirs = F.linear(t(x), t(w).T, t(b))
        assert_allclose(ours, theirs.numpy(), atol=1e-4, rtol=1e-4)

    def test_no_bias(self, rng):
        x = rng.standard_normal((2, 16), dtype=np.float32)
        w = rng.standard_normal((16, 8), dtype=np.float32)
        ours = ops.linear(jnp.array(x), {"kernel": jnp.array(w)})
        assert_allclose(ours, (t(x) @ t(w)).numpy(), atol=1e-4, rtol=1e-4)


class TestActivations:
    def test_silu(self, rng):
        x = rng.standard_normal(128, dtype=np.float32) * 3
        assert_allclose(ops.silu(jnp.array(x)), F.silu(t(x)).numpy(), atol=1e-6)

    def test_gelu_tanh(self, rng):
        x = rng.standard_normal(128, dtype=np.float32) * 3
        assert_allclose(
            ops.gelu_tanh(jnp.array(x)),
            F.gelu(t(x), approximate="tanh").numpy(),
            atol=1e-6,
        )

    def test_quick_gelu(self, rng):
        x = rng.standard_normal(128, dtype=np.float32) * 3
        expected = t(x) * torch.sigmoid(1.702 * t(x))
        assert_allclose(ops.quick_gelu(jnp.array(x)), expected.numpy(), atol=1e-6)

    def test_gelu_erf(self, rng):
        x = rng.standard_normal(128, dtype=np.float32) * 3
        from sdtpu.ops.activations import gelu_erf

        assert_allclose(gelu_erf(jnp.array(x)), F.gelu(t(x)).numpy(), atol=1e-6)

    def test_geglu(self, rng):
        # diffusers GEGLU gates with EXACT (erf) gelu, torch's F.gelu default
        x = rng.standard_normal((4, 64), dtype=np.float32)
        value, gate = torch.chunk(t(x), 2, dim=-1)
        expected = value * F.gelu(gate)
        assert_allclose(ops.geglu(jnp.array(x)), expected.numpy(), atol=1e-6)


class TestEmbedding:
    def test_lookup(self, rng):
        weight = rng.standard_normal((100, 16), dtype=np.float32)
        ids = np.array([[3, 7, 99], [0, 1, 2]])
        out = ops.embedding_lookup(jnp.array(ids), {"weight": jnp.array(weight)})
        assert_allclose(out, weight[ids])

    def test_timestep_embedding_matches_diffusers_formula(self):
        """Pin to the diffusers get_timestep_embedding semantics: freqs =
        exp(-ln(1e4)*i/half), cos||sin order for SD (flip_sin_to_cos=True).
        The reference's version inverts the exponent (utils.mojo:361) —
        SURVEY.md §5.1 item 3 says do NOT replicate."""
        timesteps = np.array([0.0, 1.0, 500.0, 999.0], dtype=np.float32)
        dim = 320
        half = dim // 2
        exponent = -np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        freqs = torch.exp(exponent)
        args = torch.from_numpy(timesteps)[:, None] * freqs[None, :]
        expected = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
        out = ops.timestep_embedding(jnp.array(timesteps), dim)
        # float32 sin/cos of args up to ~1000 rad: allow a few arg-rounding ulps
        assert_allclose(out, expected, atol=1e-4)

    def test_timestep_embedding_no_flip(self):
        out = ops.timestep_embedding(jnp.array([7.0]), 64, flip_sin_to_cos=False)
        half = 32
        freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
        expected = np.concatenate(
            [np.sin(7.0 * freqs), np.cos(7.0 * freqs)], axis=-1
        )[None]
        assert_allclose(out, expected, atol=1e-5)


class TestResize:
    def test_nearest_upsample(self, rng):
        x = rng.standard_normal((1, 4, 4, 3), dtype=np.float32)
        ours = ops.nearest_upsample(jnp.array(x), 2)
        theirs = F.interpolate(t(x).permute(0, 3, 1, 2), scale_factor=2,
                               mode="nearest").permute(0, 2, 3, 1)
        assert_allclose(ours, theirs.numpy())

    def test_resize_image_identity(self, rng):
        x = rng.standard_normal((8, 8, 3), dtype=np.float32)
        assert_allclose(ops.resize_image(jnp.array(x), 8, 8), x)

    def test_resize_image_down(self, rng):
        x = rng.standard_normal((8, 8, 3), dtype=np.float32)
        out = ops.resize_image(jnp.array(x), 4, 4)
        assert out.shape == (4, 4, 3)
        assert_allclose(out, x[::2, ::2])
