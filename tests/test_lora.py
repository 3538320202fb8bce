"""LoRA adapter fusion (sdtpu/utils/lora.py).

Synthetic adapters in both checkpoint layouts (kohya/sd-scripts underscored
names, diffusers-peft dotted names) fused into the tiny pipeline tree, with
the fused kernels checked against the hand-computed
``W + scale*(alpha/r)*up@down`` in this repo's kernel conventions
((I, O) linears, (kh, kw, I, O) convs, stacked CLIP layers)."""

import numpy as np
import pytest

from conftest import assert_allclose
from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from sdtpu.utils.lora import apply_lora

from test_pipeline import TINY, TOKENS

RANK = 4


@pytest.fixture(scope="module")
def pipe():
    # private instance — these tests mutate the weights
    return StableDiffusionPipeline.from_random(TINY, seed=3)


def _pair(rng, out_dim, in_dim, rank=RANK):
    down = rng.standard_normal((rank, in_dim)).astype(np.float32)
    up = rng.standard_normal((out_dim, rank)).astype(np.float32)
    return down, up


class TestKohyaFormat:
    def test_linear_conv_and_te_fuse(self, pipe, rng):
        p = pipe.params
        atq = np.asarray(
            p["unet"]["down_blocks"][0]["attentions"][0]["blocks"][0][
                "attn1"]["q"]["kernel"])
        conv = np.asarray(
            p["unet"]["down_blocks"][0]["resnets"][0]["conv1"]["kernel"])
        teq = np.asarray(p["clip"]["layers"]["attn"]["q"]["kernel"])  # (L,I,O)

        d1, u1 = _pair(rng, atq.shape[1], atq.shape[0])
        kh, kw, ci, co = conv.shape
        d2 = rng.standard_normal((RANK, ci, kh, kw)).astype(np.float32)
        u2 = rng.standard_normal((co, RANK, 1, 1)).astype(np.float32)
        d3, u3 = _pair(rng, teq.shape[2], teq.shape[1])

        alpha, scale = 2.0, 0.7
        sd = {
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
            "_attn1_to_q.lora_down.weight": d1,
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
            "_attn1_to_q.lora_up.weight": u1,
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
            "_attn1_to_q.alpha": np.float32(alpha),
            "lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight": d2,
            "lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight": u2,
            "lora_unet_down_blocks_0_resnets_0_conv1.alpha": np.float32(alpha),
            "lora_te_text_model_encoder_layers_1_self_attn_q_proj"
            ".lora_down.weight": d3,
            "lora_te_text_model_encoder_layers_1_self_attn_q_proj"
            ".lora_up.weight": u3,
        }
        new, report = apply_lora(p, sd, scale=scale)
        assert report["applied"] == 3
        assert report["skipped"] == [] and report["unrecognized"] == []

        s = scale * alpha / RANK
        got = np.asarray(
            new["unet"]["down_blocks"][0]["attentions"][0]["blocks"][0][
                "attn1"]["q"]["kernel"])
        assert_allclose(got, atq + s * (u1 @ d1).T, rtol=1e-5, atol=1e-5)

        got = np.asarray(
            new["unet"]["down_blocks"][0]["resnets"][0]["conv1"]["kernel"])
        want = conv + s * np.einsum(
            "or,rikl->oikl", u2[:, :, 0, 0], d2).transpose(2, 3, 1, 0)
        assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        # te adapter without .alpha: alpha defaults to rank -> factor=scale
        got = np.asarray(new["clip"]["layers"]["attn"]["q"]["kernel"])
        want = teq.copy()
        want[1] = want[1] + scale * (u3 @ d3).T
        assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # the untouched layer row is bitwise-identical
        assert np.array_equal(got[0], teq[0])

        # input tree untouched
        assert np.array_equal(
            np.asarray(p["unet"]["down_blocks"][0]["resnets"][0]["conv1"][
                "kernel"]), conv)


class TestPeftFormat:
    def test_dotted_names_and_default_alpha(self, pipe, rng):
        p = pipe.params
        ff = np.asarray(
            p["unet"]["up_blocks"][1]["attentions"][0]["blocks"][0]["ff"][
                "out"]["kernel"])
        d, u = _pair(rng, ff.shape[1], ff.shape[0])
        sd = {
            "unet.up_blocks.1.attentions.0.transformer_blocks.0"
            ".ff.net.2.lora_A.weight": d,
            "unet.up_blocks.1.attentions.0.transformer_blocks.0"
            ".ff.net.2.lora_B.weight": u,
        }
        new, report = apply_lora(p, sd, scale=0.5)
        assert report["applied"] == 1 and not report["unrecognized"]
        got = np.asarray(
            new["unet"]["up_blocks"][1]["attentions"][0]["blocks"][0]["ff"][
                "out"]["kernel"])
        assert_allclose(got, ff + 0.5 * (u @ d).T, rtol=1e-5, atol=1e-5)


class TestRobustness:
    def test_unknown_and_unmatched_keys_reported(self, pipe, rng):
        d, u = _pair(rng, 8, 8)
        sd = {
            "some_other_format.weight": d,
            # valid layout, module absent in this architecture
            "lora_unet_down_blocks_9_resnets_0_conv1.lora_down.weight": d,
            "lora_unet_down_blocks_9_resnets_0_conv1.lora_up.weight": u,
        }
        new, report = apply_lora(pipe.params, sd)
        assert report["applied"] == 0
        assert report["unrecognized"] == ["some_other_format.weight"]
        assert any("down_blocks_9" in s for s in report["skipped"])

    def test_quantized_leaf_raises(self, pipe, rng):
        from sdtpu.utils.quant import quantize_pipeline_int8

        qp = quantize_pipeline_int8(pipe.params, min_ch=8)
        conv = pipe.params["unet"]["down_blocks"][0]["resnets"][0]["conv1"]
        kh, kw, ci, co = np.asarray(conv["kernel"]).shape
        d = np.zeros((RANK, ci, kh, kw), np.float32)
        u = np.zeros((co, RANK, 1, 1), np.float32)
        sd = {
            "lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight": d,
            "lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight": u,
        }
        with pytest.raises(ValueError, match="before"):
            apply_lora(qp, sd)


class TestPipelineApi:
    def test_load_lora_changes_output_and_zero_adapter_is_identity(
            self, pipe, rng):
        base = pipe.generate("x", token_ids=TOKENS[:1],
                             num_inference_steps=2, seed=11)
        atq = np.asarray(
            pipe.params["unet"]["down_blocks"][0]["attentions"][0]["blocks"][
                0]["attn1"]["q"]["kernel"])
        d, u = _pair(rng, atq.shape[1], atq.shape[0])
        key = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0" \
              "_attn1_to_q"

        # scale 0 fuse = exact identity (and exercises load_lora end-to-end)
        report = pipe.load_lora(
            {f"{key}.lora_down.weight": d, f"{key}.lora_up.weight": u},
            scale=0.0)
        assert report["applied"] == 1
        same = pipe.generate("x", token_ids=TOKENS[:1],
                             num_inference_steps=2, seed=11)
        assert np.array_equal(same, base)

        report = pipe.load_lora(
            {f"{key}.lora_down.weight": d, f"{key}.lora_up.weight": u},
            scale=0.35)
        assert report["applied"] == 1
        changed = pipe.generate("x", token_ids=TOKENS[:1],
                                num_inference_steps=2, seed=11)
        assert not np.array_equal(changed, base)

        # exact unfuse: the snapshotted kernels restore the base output
        # bit-for-bit (adapter-swap primitive)
        assert pipe.unload_loras() == 1
        restored = pipe.generate("x", token_ids=TOKENS[:1],
                                 num_inference_steps=2, seed=11)
        assert np.array_equal(restored, base)
        assert pipe.unload_loras() == 0  # idempotent

    def test_unload_restores_stacked_te_rows(self, pipe, rng):
        teq = np.array(np.asarray(pipe.params["clip"]["layers"]["attn"]["q"][
            "kernel"]))
        d, u = _pair(rng, teq.shape[2], teq.shape[1])
        key = "lora_te_text_model_encoder_layers_0_self_attn_q_proj"
        pipe.load_lora({f"{key}.lora_down.weight": d,
                        f"{key}.lora_up.weight": u}, scale=0.5)
        assert pipe.unload_loras() == 1
        got = np.asarray(pipe.params["clip"]["layers"]["attn"]["q"]["kernel"])
        assert np.array_equal(got, teq)
