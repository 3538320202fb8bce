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
