"""Weight subsystem tests: layout transforms, safetensors round-trip,
state-dict mapping completeness, orbax param cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sdtpu.config import CLIPConfig, UNetConfig, VAEConfig
from sdtpu.utils import weights as W

from conftest import assert_allclose


class TestTransforms:
    def test_conv_kernel_oihw_to_hwio(self, rng):
        t = torch.from_numpy(rng.standard_normal((8, 4, 3, 3), dtype=np.float32))
        k = W.conv_kernel(t)
        assert k.shape == (3, 3, 4, 8)
        assert_allclose(k[1, 2, 3, 7], t[7, 3, 1, 2].numpy())

    def test_linear_kernel_transpose(self, rng):
        t = torch.from_numpy(rng.standard_normal((8, 4), dtype=np.float32))
        assert W.linear_kernel(t).shape == (4, 8)

    def test_proj_kernel_handles_1x1_conv_and_linear(self, rng):
        conv = torch.from_numpy(rng.standard_normal((8, 4, 1, 1), dtype=np.float32))
        lin = torch.from_numpy(rng.standard_normal((8, 4), dtype=np.float32))
        assert W.proj_kernel(conv).shape == (4, 8)
        assert W.proj_kernel(lin).shape == (4, 8)
        assert_allclose(W.proj_kernel(conv), conv[:, :, 0, 0].numpy().T)
        assert_allclose(W.proj_kernel(lin), lin.numpy().T)


class TestUNetMapping:
    def test_roundtrip_through_torch_style_state_dict(self):
        """init_unet -> synthesize a diffusers-named state dict -> map back ->
        identical forward output.  Exercises every key path of the mapping."""
        cfg = UNetConfig(
            block_out_channels=(16, 24, 32),
            layers_per_block=1,
            attention_levels=(True, True, True),
            num_attention_heads=2,
            cross_attention_dim=16,
            norm_num_groups=8,
        )
        from sdtpu.models.unet import init_unet, unet_forward

        params = init_unet(0, cfg)

        sd = {}

        def put_norm(prefix, p):
            sd[f"{prefix}.weight"] = np.asarray(p["scale"])
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

        def put_conv(prefix, p):
            sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

        def put_lin(prefix, p):
            sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
            if "bias" in p:
                sd[f"{prefix}.bias"] = np.asarray(p["bias"])

        def put_resnet(prefix, p):
            put_norm(f"{prefix}.norm1", p["norm1"])
            put_conv(f"{prefix}.conv1", p["conv1"])
            put_lin(f"{prefix}.time_emb_proj", p["time_emb_proj"])
            put_norm(f"{prefix}.norm2", p["norm2"])
            put_conv(f"{prefix}.conv2", p["conv2"])
            if "conv_shortcut" in p:
                put_conv(f"{prefix}.conv_shortcut", p["conv_shortcut"])

        def put_attnblock(prefix, p):
            put_norm(f"{prefix}.norm", p["norm"])
            put_lin(f"{prefix}.proj_in", p["proj_in"])
            for i, blk in enumerate(p["blocks"]):
                bp = f"{prefix}.transformer_blocks.{i}"
                put_norm(f"{bp}.norm1", blk["norm1"])
                for name, ap in [("attn1", blk["attn1"]), ("attn2", blk["attn2"])]:
                    put_lin(f"{bp}.{name}.to_q", ap["q"])
                    put_lin(f"{bp}.{name}.to_k", ap["k"])
                    put_lin(f"{bp}.{name}.to_v", ap["v"])
                    put_lin(f"{bp}.{name}.to_out.0", ap["out"])
                put_norm(f"{bp}.norm2", blk["norm2"])
                put_norm(f"{bp}.norm3", blk["norm3"])
                put_lin(f"{bp}.ff.net.0.proj", blk["ff"]["proj"])
                put_lin(f"{bp}.ff.net.2", blk["ff"]["out"])
            put_lin(f"{prefix}.proj_out", p["proj_out"])

        put_conv("conv_in", params["conv_in"])
        put_lin("time_embedding.linear_1", params["time_embedding"]["linear_1"])
        put_lin("time_embedding.linear_2", params["time_embedding"]["linear_2"])
        for i, block in enumerate(params["down_blocks"]):
            for j, res in enumerate(block["resnets"]):
                put_resnet(f"down_blocks.{i}.resnets.{j}", res)
            for j, ab in enumerate(block.get("attentions", [])):
                put_attnblock(f"down_blocks.{i}.attentions.{j}", ab)
            if "downsample" in block:
                put_conv(f"down_blocks.{i}.downsamplers.0.conv", block["downsample"])
        for i, block in enumerate(params["up_blocks"]):
            for j, res in enumerate(block["resnets"]):
                put_resnet(f"up_blocks.{i}.resnets.{j}", res)
            for j, ab in enumerate(block.get("attentions", [])):
                put_attnblock(f"up_blocks.{i}.attentions.{j}", ab)
            if "upsample" in block:
                put_conv(f"up_blocks.{i}.upsamplers.0.conv", block["upsample"])
        put_norm("conv_norm_out", params["norm_out"])
        put_conv("conv_out", params["conv_out"])

        mapped = W.unet_params_from_state_dict(sd, cfg)

        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(2), (1, 7, 16))
        ts = jnp.array([100.0])
        a = unet_forward(x, ts, ctx, params, cfg)
        b = unet_forward(x, ts, ctx, jax.tree.map(jnp.asarray, mapped), cfg)
        assert_allclose(a, b, atol=1e-6)


class TestSafetensors:
    def test_file_roundtrip(self, tmp_path, rng):
        from safetensors.numpy import save_file

        data = {
            "a.weight": rng.standard_normal((4, 4), dtype=np.float32),
            "b.bias": rng.standard_normal(4, dtype=np.float32),
        }
        path = str(tmp_path / "m.safetensors")
        save_file(data, path)
        loaded = W.load_safetensors(path)
        assert set(loaded) == set(data)
        assert_allclose(loaded["a.weight"], data["a.weight"])


class TestOrbaxCache:
    def test_save_load_converted(self, tmp_path):
        params = {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3),
                            "bias": jnp.zeros(3)}}
        path = str(tmp_path / "cache")
        W.save_converted(params, path)
        restored = W.load_converted(path)
        assert_allclose(restored["layer"]["kernel"], params["layer"]["kernel"])


class TestCast:
    def test_cast_pytree_floats_only(self):
        tree = {"w": jnp.ones((2, 2), jnp.float32), "ids": jnp.ones((2,), jnp.int32)}
        out = W.cast_pytree(tree, jnp.bfloat16)
        assert out["w"].dtype == jnp.bfloat16
        assert out["ids"].dtype == jnp.int32


class TestNativeSafetensors:
    def test_matches_safetensors_lib(self, tmp_path, rng):
        """C++ mmap reader vs the reference library, all dtypes."""
        import ml_dtypes
        from safetensors.numpy import save_file

        from sdtpu.utils import native_safetensors as nst

        if not nst.available():
            pytest.skip("native library unavailable")
        data = {
            "conv.weight": rng.standard_normal((8, 4, 3, 3)).astype(np.float32),
            "emb": rng.standard_normal((10, 16)).astype(np.float16),
            "ids": np.arange(7, dtype=np.int64),
            "bf": rng.standard_normal((4, 128)).astype(ml_dtypes.bfloat16),
            "scalarish": np.ones((1,), np.float32),
        }
        path = str(tmp_path / "m.safetensors")
        save_file(data, path, metadata={"format": "pt"})
        loaded = nst.load(path)
        assert set(loaded) == set(data)
        for k in data:
            assert loaded[k].shape == data[k].shape
            np.testing.assert_array_equal(
                np.asarray(loaded[k], np.float32),
                np.asarray(data[k], np.float32),
            )

    def test_zero_copy_view(self, tmp_path, rng):
        from safetensors.numpy import save_file

        from sdtpu.utils import native_safetensors as nst

        if not nst.available():
            pytest.skip("native library unavailable")
        data = {"w": rng.standard_normal((16, 16)).astype(np.float32)}
        path = str(tmp_path / "z.safetensors")
        save_file(data, path)
        with nst.NativeSafetensors(path) as f:
            view = f.tensor("w")
            np.testing.assert_array_equal(view, data["w"])

    def test_missing_tensor_raises(self, tmp_path, rng):
        from safetensors.numpy import save_file

        from sdtpu.utils import native_safetensors as nst

        if not nst.available():
            pytest.skip("native library unavailable")
        path = str(tmp_path / "x.safetensors")
        save_file({"a": np.zeros((2,), np.float32)}, path)
        with nst.NativeSafetensors(path) as f:
            with pytest.raises(KeyError):
                f.tensor("nope")

    def test_bad_file_raises(self, tmp_path):
        from sdtpu.utils import native_safetensors as nst

        if not nst.available():
            pytest.skip("native library unavailable")
        bad = tmp_path / "bad.safetensors"
        bad.write_bytes(b"\x00" * 4)
        with pytest.raises(IOError):
            nst.NativeSafetensors(str(bad))
