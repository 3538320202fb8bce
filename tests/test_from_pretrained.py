"""from_pretrained integration: a synthetic diffusers-layout checkpoint
directory (text_encoder/unet/vae safetensors + tokenizer assets) loads into a
working pipeline — the full path the reference never implemented (SURVEY.md
§5 checkpoint row).
"""

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

from test_tokenizer import build_assets

TINY_CKPT = PipelineConfig(
    name="test/ckpt-tiny",
    clip=CLIPConfig(vocab_size=1024, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=2, max_length=16),
    unet=UNetConfig(
        block_out_channels=(16, 24, 32), layers_per_block=1,
        attention_levels=(True, True, True), num_attention_heads=2,
        cross_attention_dim=32, norm_num_groups=8,
    ),
    vae=VAEConfig(block_out_channels=(8, 16, 16), layers_per_block=1,
                  norm_num_groups=8),
    scheduler=SchedulerConfig(),
    default_image_size=32,
    compute_dtype=jnp.float32,
    param_dtype=jnp.float32,
)


def _norm(sd, p, params):
    sd[f"{p}.weight"] = np.asarray(params["scale"], np.float32)
    sd[f"{p}.bias"] = np.asarray(params["bias"], np.float32)


def _conv(sd, p, params):
    sd[f"{p}.weight"] = np.ascontiguousarray(
        np.asarray(params["kernel"], np.float32).transpose(3, 2, 0, 1)
    )
    sd[f"{p}.bias"] = np.asarray(params["bias"], np.float32)


def _lin(sd, p, params):
    sd[f"{p}.weight"] = np.ascontiguousarray(np.asarray(params["kernel"], np.float32).T)
    if "bias" in params:
        sd[f"{p}.bias"] = np.asarray(params["bias"], np.float32)


def _write_clip(dirpath, config):
    from sdtpu.models.clip import init_clip

    params = init_clip(0, config)
    sd = {}
    sd["text_model.embeddings.token_embedding.weight"] = np.asarray(
        params["token_embedding"]["weight"], np.float32)
    sd["text_model.embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"], np.float32)
    for i in range(config.num_layers):
        layer = jax.tree.map(lambda x: x[i], params["layers"])
        p = f"text_model.encoder.layers.{i}"
        _norm(sd, f"{p}.layer_norm1", layer["norm1"])
        for name, key in [("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                          ("out_proj", "out")]:
            _lin(sd, f"{p}.self_attn.{name}", layer["attn"][key])
        _norm(sd, f"{p}.layer_norm2", layer["norm2"])
        _lin(sd, f"{p}.mlp.fc1", layer["mlp"]["fc1"])
        _lin(sd, f"{p}.mlp.fc2", layer["mlp"]["fc2"])
    _norm(sd, "text_model.final_layer_norm", params["final_norm"])
    dirpath.mkdir(parents=True)
    save_file(sd, str(dirpath / "model.safetensors"))


def _write_unet(dirpath, config):
    from sdtpu.models.unet import init_unet

    params = init_unet(1, config)
    sd = {}
    _conv(sd, "conv_in", params["conv_in"])
    _lin(sd, "time_embedding.linear_1", params["time_embedding"]["linear_1"])
    _lin(sd, "time_embedding.linear_2", params["time_embedding"]["linear_2"])
    if "cond_proj" in params["time_embedding"]:
        _lin(sd, "time_embedding.cond_proj", params["time_embedding"]["cond_proj"])
    if "add_embedding" in params:
        _lin(sd, "add_embedding.linear_1", params["add_embedding"]["linear_1"])
        _lin(sd, "add_embedding.linear_2", params["add_embedding"]["linear_2"])

    def resnet(p, r):
        _norm(sd, f"{p}.norm1", r["norm1"])
        _conv(sd, f"{p}.conv1", r["conv1"])
        _lin(sd, f"{p}.time_emb_proj", r["time_emb_proj"])
        _norm(sd, f"{p}.norm2", r["norm2"])
        _conv(sd, f"{p}.conv2", r["conv2"])
        if "conv_shortcut" in r:
            _conv(sd, f"{p}.conv_shortcut", r["conv_shortcut"])

    def attnblock(p, a):
        _norm(sd, f"{p}.norm", a["norm"])
        _lin(sd, f"{p}.proj_in", a["proj_in"])
        for i, blk in enumerate(a["blocks"]):
            bp = f"{p}.transformer_blocks.{i}"
            _norm(sd, f"{bp}.norm1", blk["norm1"])
            for name, ap in [("attn1", blk["attn1"]), ("attn2", blk["attn2"])]:
                _lin(sd, f"{bp}.{name}.to_q", ap["q"])
                _lin(sd, f"{bp}.{name}.to_k", ap["k"])
                _lin(sd, f"{bp}.{name}.to_v", ap["v"])
                _lin(sd, f"{bp}.{name}.to_out.0", ap["out"])
            _norm(sd, f"{bp}.norm2", blk["norm2"])
            _norm(sd, f"{bp}.norm3", blk["norm3"])
            _lin(sd, f"{bp}.ff.net.0.proj", blk["ff"]["proj"])
            _lin(sd, f"{bp}.ff.net.2", blk["ff"]["out"])
        _lin(sd, f"{p}.proj_out", a["proj_out"])

    for i, block in enumerate(params["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            resnet(f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block.get("attentions", [])):
            attnblock(f"down_blocks.{i}.attentions.{j}", a)
        if "downsample" in block:
            _conv(sd, f"down_blocks.{i}.downsamplers.0.conv", block["downsample"])
    if "mid_block" in params:
        for j, r in enumerate(params["mid_block"]["resnets"]):
            resnet(f"mid_block.resnets.{j}", r)
        for j, a in enumerate(params["mid_block"]["attentions"]):
            attnblock(f"mid_block.attentions.{j}", a)
    for i, block in enumerate(params["up_blocks"]):
        for j, r in enumerate(block["resnets"]):
            resnet(f"up_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block.get("attentions", [])):
            attnblock(f"up_blocks.{i}.attentions.{j}", a)
        if "upsample" in block:
            _conv(sd, f"up_blocks.{i}.upsamplers.0.conv", block["upsample"])
    _norm(sd, "conv_norm_out", params["norm_out"])
    _conv(sd, "conv_out", params["conv_out"])
    dirpath.mkdir(parents=True)
    save_file(sd, str(dirpath / "diffusion_pytorch_model.safetensors"))


def _write_vae(dirpath, config):
    from sdtpu.models.vae import init_vae_decoder, init_vae_encoder

    enc = init_vae_encoder(2, config)
    dec = init_vae_decoder(3, config)
    sd = {}

    def resnet(p, r):
        _norm(sd, f"{p}.norm1", r["norm1"])
        _conv(sd, f"{p}.conv1", r["conv1"])
        _norm(sd, f"{p}.norm2", r["norm2"])
        _conv(sd, f"{p}.conv2", r["conv2"])
        if "conv_shortcut" in r:
            _conv(sd, f"{p}.conv_shortcut", r["conv_shortcut"])

    def mid(p, m):
        resnet(f"{p}.resnets.0", m["resnets"][0])
        resnet(f"{p}.resnets.1", m["resnets"][1])
        a = m["attention"]
        _norm(sd, f"{p}.attentions.0.group_norm", a["norm"])
        _lin(sd, f"{p}.attentions.0.to_q", a["attn"]["q"])
        _lin(sd, f"{p}.attentions.0.to_k", a["attn"]["k"])
        _lin(sd, f"{p}.attentions.0.to_v", a["attn"]["v"])
        _lin(sd, f"{p}.attentions.0.to_out.0", a["attn"]["out"])

    _conv(sd, "encoder.conv_in", enc["conv_in"])
    for i, block in enumerate(enc["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsample" in block:
            _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  block["downsample"])
    mid("encoder.mid_block", enc["mid_block"])
    _norm(sd, "encoder.conv_norm_out", enc["norm_out"])
    _conv(sd, "encoder.conv_out", enc["conv_out"])
    _conv(sd, "quant_conv", enc["quant_conv"])

    _conv(sd, "post_quant_conv", dec["post_quant_conv"])
    _conv(sd, "decoder.conv_in", dec["conv_in"])
    mid("decoder.mid_block", dec["mid_block"])
    for i, block in enumerate(dec["up_blocks"]):
        for j, r in enumerate(block["resnets"]):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsample" in block:
            _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                  block["upsample"])
    _norm(sd, "decoder.conv_norm_out", dec["norm_out"])
    _conv(sd, "decoder.conv_out", dec["conv_out"])
    dirpath.mkdir(parents=True)
    save_file(sd, str(dirpath / "diffusion_pytorch_model.safetensors"))


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt") / "test-ckpt-tiny"
    _write_clip(root / "text_encoder", TINY_CKPT.clip)
    _write_unet(root / "unet", TINY_CKPT.unet)
    _write_vae(root / "vae", TINY_CKPT.vae)
    tok_dir = root / "tokenizer"
    tok_dir.mkdir()
    vocab_file, merges_file = build_assets(tok_dir)
    return root


class TestFromPretrained:
    def test_loads_and_generates(self, ckpt_dir, monkeypatch):
        import sdtpu.config as C

        monkeypatch.setitem(C.PRESETS, "test-ckpt-tiny", TINY_CKPT)
        pipe = StableDiffusionPipeline.from_pretrained(str(ckpt_dir))
        assert pipe.tokenizer is not None  # picked up tokenizer/ assets
        img = pipe.generate("hello world", num_inference_steps=2, seed=1)
        assert img.shape == (1, 32, 32, 3)
        assert img.dtype == np.uint8

    def test_loaded_weights_match_source_init(self, ckpt_dir, monkeypatch):
        """The loaded pipeline must reproduce the source-init pipeline's
        output exactly (weights round-tripped through safetensors)."""
        import dataclasses

        import sdtpu.config as C
        from sdtpu.models.clip import init_clip
        from sdtpu.models.unet import init_unet
        from sdtpu.models.vae import init_vae_decoder, init_vae_encoder

        monkeypatch.setitem(C.PRESETS, "test-ckpt-tiny", TINY_CKPT)
        loaded = StableDiffusionPipeline.from_pretrained(
            str(ckpt_dir), dtype=jnp.float32
        )
        source = StableDiffusionPipeline(
            TINY_CKPT,
            {
                "clip": init_clip(0, TINY_CKPT.clip),
                "unet": init_unet(1, TINY_CKPT.unet),
                "vae_encoder": init_vae_encoder(2, TINY_CKPT.vae),
                "vae_decoder": init_vae_decoder(3, TINY_CKPT.vae),
            },
            tokenizer=loaded.tokenizer,
        )
        ids = np.array([[1, 7, 3] + [0] * 13, [1, 2] + [0] * 14])
        a = loaded.generate("x", token_ids=ids, num_inference_steps=2, seed=9,
                            output="float")
        b = source.generate("x", token_ids=ids, num_inference_steps=2, seed=9,
                            output="float")
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestFromPretrainedSDXL:
    def test_dual_encoder_checkpoint(self, tmp_path, monkeypatch):
        """text_encoder_2 (with text_projection) loads through the same path."""
        import dataclasses

        import sdtpu.config as C

        clip2 = CLIPConfig(
            vocab_size=1024, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=2, max_length=16,
            use_final_layer_norm_output=False, projection_dim=48,
        )
        cfg = dataclasses.replace(
            TINY_CKPT,
            name="test/ckpt-xl",
            clip=dataclasses.replace(TINY_CKPT.clip,
                                     use_final_layer_norm_output=False),
            clip_2=clip2,
            unet=dataclasses.replace(
                TINY_CKPT.unet,
                cross_attention_dim=32 + 48,
                addition_embed_dim=48 + 6 * 8,
                addition_time_embed_dim=8,
            ),
        )
        root = tmp_path / "ckpt-xl"
        _write_clip(root / "text_encoder", cfg.clip)

        # second encoder with projection
        from sdtpu.models.clip import init_clip

        params2 = init_clip(7, clip2)
        sd2 = {}
        sd2["text_model.embeddings.token_embedding.weight"] = np.asarray(
            params2["token_embedding"]["weight"], np.float32)
        sd2["text_model.embeddings.position_embedding.weight"] = np.asarray(
            params2["position_embedding"], np.float32)
        for i in range(clip2.num_layers):
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

        _write_unet(root / "unet", cfg.unet)
        _write_vae(root / "vae", cfg.vae)

        monkeypatch.setitem(C.PRESETS, "ckpt-xl", cfg)
        pipe = StableDiffusionPipeline.from_pretrained(str(root), preset="ckpt-xl")
        assert "clip_2" in pipe.params
        assert "text_projection" in pipe.params["clip_2"]
        ids = np.array([[1, 7, 3] + [0] * 13, [1, 2] + [0] * 14])
        img = pipe.generate("x", token_ids=ids, num_inference_steps=1, seed=0)
        assert img.shape == (1, 32, 32, 3)
