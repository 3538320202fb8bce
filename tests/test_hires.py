"""Two-pass hires fix (`generate_hires`): txt2img at a base size the
checkpoint composes well at, bilinear float-space upscale, img2img
refinement at the target size — the standard workaround for SD 1.x subject
duplication above the training resolution (beyond-reference surface)."""

import numpy as np
import pytest

from test_pipeline import TOKENS


class TestGenerateHires:
    def test_shape_and_determinism(self, tiny_pipe):
        a = tiny_pipe.generate_hires(
            "x", token_ids=TOKENS, num_inference_steps=2, seed=9,
            image_size=64, base_size=32, hires_strength=0.6,
        )
        assert a.shape == (1, 64, 64, 3)
        assert a.dtype == np.uint8
        b = tiny_pipe.generate_hires(
            "x", token_ids=TOKENS, num_inference_steps=2, seed=9,
            image_size=64, base_size=32, hires_strength=0.6,
        )
        np.testing.assert_array_equal(a, b)

    def test_differs_from_direct_txt2img(self, tiny_pipe):
        direct = tiny_pipe.generate(
            "x", token_ids=TOKENS, num_inference_steps=2, seed=9,
            image_size=64,
        )
        hires = tiny_pipe.generate_hires(
            "x", token_ids=TOKENS, num_inference_steps=2, seed=9,
            image_size=64, base_size=32,
        )
        assert hires.shape == direct.shape
        assert not np.array_equal(hires, direct)

    def test_base_must_be_smaller(self, tiny_pipe):
        with pytest.raises(ValueError, match="base_size"):
            tiny_pipe.generate_hires(
                "x", token_ids=TOKENS, num_inference_steps=2,
                image_size=32, base_size=32,
            )

    def test_owns_init_image(self, tiny_pipe):
        with pytest.raises(ValueError, match="init_image"):
            tiny_pipe.generate_hires(
                "x", token_ids=TOKENS, num_inference_steps=2,
                image_size=64, base_size=32,
                init_image=np.zeros((32, 32, 3), np.uint8),
            )

    def test_composes_with_pag(self, tiny_pipe):
        img = tiny_pipe.generate_hires(
            "x", token_ids=TOKENS, num_inference_steps=2, seed=9,
            image_size=64, base_size=32, pag_scale=2.0,
        )
        assert img.shape == (1, 64, 64, 3)

    def test_num_images_refines_each_row(self, tiny_pipe):
        """num_images>1: pass 2 refines every pass-1 row (this crashed at
        trace time once — the shared 2-row context can't batch against N
        init rows in one program)."""
        imgs = tiny_pipe.generate_hires(
            "x", token_ids=TOKENS, num_inference_steps=2, seed=9,
            image_size=64, base_size=32, num_images=2,
        )
        assert imgs.shape == (2, 64, 64, 3)
        assert imgs.dtype == np.uint8
        assert not np.array_equal(imgs[0], imgs[1])  # per-row seeds

    def test_num_images_device_output_rejected(self, tiny_pipe):
        with pytest.raises(ValueError, match="num_images"):
            tiny_pipe.generate_hires(
                "x", token_ids=TOKENS, num_inference_steps=2,
                image_size=64, base_size=32, num_images=2, output="device",
            )

    def test_host_bilinear_matches_jax_resize(self):
        """The inter-pass upscale runs host-side (no eager device dispatch
        on the relay backend) — it must match jax.image.resize bilinear."""
        import jax
        import jax.numpy as jnp

        from sdtpu.utils.image import bilinear_resize

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 12, 20, 3)).astype(np.float32)
        got = bilinear_resize(x, 30, 24)
        want = np.asarray(
            jax.image.resize(jnp.asarray(x), (2, 30, 24, 3), "bilinear")
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # upscale to the hires-fix shape (exact 2x) as well
        got2 = bilinear_resize(x, 24, 40)
        want2 = np.asarray(
            jax.image.resize(jnp.asarray(x), (2, 24, 40, 3), "bilinear")
        )
        np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)
