"""Checkpoint loading: HuggingFace/diffusers safetensors -> sdtpu pytrees.

This is the build's replacement for the reference's only "checkpoint" code,
the ``FileBuf``/``read_file`` binary cursor (``helpers/utils.mojo:63-141``)
that the README designates as the template for future weight loading
(``README.md:44,55``) — the reference itself never loads weights and runs on
random init (``utils.mojo:1719-1726``).

Layout transforms (torch -> TPU-native):
* conv ``(O, I, kh, kw)`` -> HWIO ``(kh, kw, I, O)``;
* linear ``(O, I)`` -> ``(I, O)`` so forward is ``x @ W``;
* 1x1 convs used as projections (Transformer2D proj_in/out, VAE mid attention
  in older checkpoints) -> plain ``(I, O)`` linear kernels.

Weights can come from a local diffusers-layout directory (``unet/
diffusion_pytorch_model.safetensors`` etc.) or any in-memory
``dict[str, np.ndarray]`` (torch ``state_dict`` in tests).
"""

from __future__ import annotations

import os

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from sdtpu.config import CLIPConfig, PipelineConfig, UNetConfig, VAEConfig

from sdtpu.utils import hostrng


# ---------------------------------------------------------------------------
# Tensor-level transforms
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(t) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return _np(t).transpose(2, 3, 1, 0)


def linear_kernel(t) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return _np(t).T


def proj_kernel(t) -> np.ndarray:
    """1x1 conv (O, I, 1, 1) or linear (O, I) -> linear (I, O)."""
    a = _np(t)
    if a.ndim == 4:
        a = a[:, :, 0, 0]
    return a.T


def _norm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _lin(sd: Mapping, prefix: str) -> dict:
    p = {"kernel": linear_kernel(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["bias"] = _np(sd[prefix + ".bias"])
    return p


def _conv(sd: Mapping, prefix: str) -> dict:
    return {
        "kernel": conv_kernel(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _proj(sd: Mapping, prefix: str) -> dict:
    p = {"kernel": proj_kernel(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["bias"] = _np(sd[prefix + ".bias"])
    return p


# ---------------------------------------------------------------------------
# CLIP text encoder (HF transformers CLIPTextModel state_dict)
# ---------------------------------------------------------------------------


def clip_params_from_state_dict(sd: Mapping, config: CLIPConfig) -> dict:
    """Map ``text_model.*`` keys to the :func:`sdtpu.models.clip` pytree.
    Accepts state dicts with or without the ``text_model.`` prefix."""
    if not any(k.startswith("text_model.") for k in sd):
        sd = {f"text_model.{k}": v for k, v in sd.items() if k != "text_projection.weight"} | {
            k: v for k, v in sd.items() if k == "text_projection.weight"
        }

    def layer(i: int) -> dict:
        p = f"text_model.encoder.layers.{i}"
        return {
            "norm1": _norm(sd, f"{p}.layer_norm1"),
            "attn": {
                "q": _lin(sd, f"{p}.self_attn.q_proj"),
                "k": _lin(sd, f"{p}.self_attn.k_proj"),
                "v": _lin(sd, f"{p}.self_attn.v_proj"),
                "out": _lin(sd, f"{p}.self_attn.out_proj"),
            },
            "norm2": _norm(sd, f"{p}.layer_norm2"),
            "mlp": {
                "fc1": _lin(sd, f"{p}.mlp.fc1"),
                "fc2": _lin(sd, f"{p}.mlp.fc2"),
            },
        }

    import jax

    layers = [layer(i) for i in range(config.num_layers)]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    params = {
        "token_embedding": {
            "weight": _np(sd["text_model.embeddings.token_embedding.weight"])
        },
        "position_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "layers": stacked,
        "final_norm": _norm(sd, "text_model.final_layer_norm"),
    }
    if config.projection_dim is not None:
        params["text_projection"] = {
            "kernel": linear_kernel(sd["text_projection.weight"])
        }
    return params


# ---------------------------------------------------------------------------
# UNet (diffusers UNet2DConditionModel state_dict)
# ---------------------------------------------------------------------------


def _resnet_from_sd(sd: Mapping, p: str) -> dict:
    params = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "time_emb_proj": _lin(sd, f"{p}.time_emb_proj"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        params["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return params


def _vae_resnet_from_sd(sd: Mapping, p: str) -> dict:
    params = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        params["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return params


def _transformer_block_from_sd(sd: Mapping, p: str) -> dict:
    def attn(ap: str) -> dict:
        return {
            "q": _lin(sd, f"{ap}.to_q"),
            "k": _lin(sd, f"{ap}.to_k"),
            "v": _lin(sd, f"{ap}.to_v"),
            "out": _lin(sd, f"{ap}.to_out.0"),
        }

    return {
        "norm1": _norm(sd, f"{p}.norm1"),
        "attn1": attn(f"{p}.attn1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "attn2": attn(f"{p}.attn2"),
        "norm3": _norm(sd, f"{p}.norm3"),
        "ff": {
            "proj": _lin(sd, f"{p}.ff.net.0.proj"),
            "out": _lin(sd, f"{p}.ff.net.2"),
        },
    }


def _attn_block_from_sd(sd: Mapping, p: str) -> dict:
    blocks = []
    i = 0
    while f"{p}.transformer_blocks.{i}.norm1.weight" in sd:
        blocks.append(_transformer_block_from_sd(sd, f"{p}.transformer_blocks.{i}"))
        i += 1
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": _proj(sd, f"{p}.proj_in"),
        "blocks": blocks,
        "proj_out": _proj(sd, f"{p}.proj_out"),
    }


def _unet_encoder_from_sd(sd: Mapping, config: UNetConfig) -> dict:
    """The encoder half shared by the UNet and its ControlNet copy:
    conv_in, time/add embeddings, down blocks, mid block."""
    params = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
    }
    if "time_embedding.cond_proj.weight" in sd:
        params["time_embedding"]["cond_proj"] = _lin(sd, "time_embedding.cond_proj")
    if config.addition_embed_dim is not None and "add_embedding.linear_1.weight" in sd:
        params["add_embedding"] = {
            "linear_1": _lin(sd, "add_embedding.linear_1"),
            "linear_2": _lin(sd, "add_embedding.linear_2"),
        }

    down_blocks = []
    for level in range(config.num_levels):
        p = f"down_blocks.{level}"
        block = {
            "resnets": [
                _resnet_from_sd(sd, f"{p}.resnets.{j}")
                for j in range(config.layers_per_block)
            ]
        }
        if config.attention_levels[level]:
            block["attentions"] = [
                _attn_block_from_sd(sd, f"{p}.attentions.{j}")
                for j in range(config.layers_per_block)
            ]
        if f"{p}.downsamplers.0.conv.weight" in sd:
            block["downsample"] = _conv(sd, f"{p}.downsamplers.0.conv")
        down_blocks.append(block)
    params["down_blocks"] = down_blocks

    if config.mid_block:
        params["mid_block"] = {
            "resnets": [
                _resnet_from_sd(sd, "mid_block.resnets.0"),
                _resnet_from_sd(sd, "mid_block.resnets.1"),
            ],
            "attentions": [_attn_block_from_sd(sd, "mid_block.attentions.0")],
        }
    return params


def unet_params_from_state_dict(sd: Mapping, config: UNetConfig) -> dict:
    params = _unet_encoder_from_sd(sd, config)

    up_blocks = []
    for rev in range(config.num_levels):
        level = config.num_levels - 1 - rev
        p = f"up_blocks.{rev}"
        block = {
            "resnets": [
                _resnet_from_sd(sd, f"{p}.resnets.{j}")
                for j in range(config.layers_per_block + 1)
            ]
        }
        if config.attention_levels[level]:
            block["attentions"] = [
                _attn_block_from_sd(sd, f"{p}.attentions.{j}")
                for j in range(config.layers_per_block + 1)
            ]
        if f"{p}.upsamplers.0.conv.weight" in sd:
            block["upsample"] = _conv(sd, f"{p}.upsamplers.0.conv")
        up_blocks.append(block)
    params["up_blocks"] = up_blocks

    params["norm_out"] = _norm(sd, "conv_norm_out")
    params["conv_out"] = _conv(sd, "conv_out")
    return params


# ---------------------------------------------------------------------------
# ControlNet (diffusers ControlNetModel state_dict)
# ---------------------------------------------------------------------------


def controlnet_params_from_state_dict(sd: Mapping, config: UNetConfig) -> dict:
    """Map a diffusers ``ControlNetModel`` state_dict to the
    :func:`sdtpu.models.controlnet.controlnet_forward` pytree.  ``config`` is
    the BASE model's UNetConfig — the ControlNet encoder copy shares it.

    Diffusers-specific keys: ``controlnet_cond_embedding.{conv_in,blocks.N,
    conv_out}`` (the control-image embedder), ``controlnet_down_blocks.N``
    (one zero conv per saved skip), ``controlnet_mid_block``."""
    params = _unet_encoder_from_sd(sd, config)

    zero_convs = []
    i = 0
    while f"controlnet_down_blocks.{i}.weight" in sd:
        zero_convs.append(_conv(sd, f"controlnet_down_blocks.{i}"))
        i += 1
    if not zero_convs:
        raise KeyError(
            "no controlnet_down_blocks.* keys — not a ControlNetModel state_dict"
        )
    params["zero_convs"] = zero_convs
    if config.mid_block:
        params["zero_conv_mid"] = _conv(sd, "controlnet_mid_block")

    blocks = []
    i = 0
    while f"controlnet_cond_embedding.blocks.{i}.weight" in sd:
        blocks.append(_conv(sd, f"controlnet_cond_embedding.blocks.{i}"))
        i += 1
    params["cond_embedding"] = {
        "conv_in": _conv(sd, "controlnet_cond_embedding.conv_in"),
        "blocks": blocks,
        "conv_out": _conv(sd, "controlnet_cond_embedding.conv_out"),
    }
    return params


def load_controlnet_params(
    path: str,
    config: UNetConfig,
    *,
    dtype=None,
) -> dict:
    """Load a diffusers ControlNet from a safetensors file or a model
    directory containing one (e.g. ``lllyasviel/sd-controlnet-canny``'s
    ``diffusion_pytorch_model.safetensors``)."""
    if os.path.isdir(path):
        path = _find_weight_file(path)
    sd = load_safetensors(path)
    params = controlnet_params_from_state_dict(sd, config)
    return cast_pytree(params, dtype) if dtype is not None else params


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL state_dict)
# ---------------------------------------------------------------------------


def _vae_mid_from_sd(sd: Mapping, p: str) -> dict:
    # Newer diffusers: attentions.0.{to_q,to_k,to_v,to_out.0,group_norm};
    # legacy: {query,key,value,proj_attn,norm} — support both.
    ap = f"{p}.attentions.0"
    if f"{ap}.to_q.weight" in sd:
        attn = {
            "q": _proj(sd, f"{ap}.to_q"),
            "k": _proj(sd, f"{ap}.to_k"),
            "v": _proj(sd, f"{ap}.to_v"),
            "out": _proj(sd, f"{ap}.to_out.0"),
        }
        norm = _norm(sd, f"{ap}.group_norm")
    else:
        attn = {
            "q": _proj(sd, f"{ap}.query"),
            "k": _proj(sd, f"{ap}.key"),
            "v": _proj(sd, f"{ap}.value"),
            "out": _proj(sd, f"{ap}.proj_attn"),
        }
        norm = _norm(sd, f"{ap}.norm")
    return {
        "resnets": [
            _vae_resnet_from_sd(sd, f"{p}.resnets.0"),
            _vae_resnet_from_sd(sd, f"{p}.resnets.1"),
        ],
        "attention": {"norm": norm, "attn": attn},
    }


def vae_encoder_params_from_state_dict(sd: Mapping, config: VAEConfig) -> dict:
    params = {"conv_in": _conv(sd, "encoder.conv_in")}
    down_blocks = []
    for level in range(len(config.block_out_channels)):
        p = f"encoder.down_blocks.{level}"
        block = {
            "resnets": [
                _vae_resnet_from_sd(sd, f"{p}.resnets.{j}")
                for j in range(config.layers_per_block)
            ]
        }
        if f"{p}.downsamplers.0.conv.weight" in sd:
            block["downsample"] = _conv(sd, f"{p}.downsamplers.0.conv")
        down_blocks.append(block)
    params["down_blocks"] = down_blocks
    params["mid_block"] = _vae_mid_from_sd(sd, "encoder.mid_block")
    params["norm_out"] = _norm(sd, "encoder.conv_norm_out")
    params["conv_out"] = _conv(sd, "encoder.conv_out")
    params["quant_conv"] = _conv(sd, "quant_conv")
    return params


def vae_decoder_params_from_state_dict(sd: Mapping, config: VAEConfig) -> dict:
    params = {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_block": _vae_mid_from_sd(sd, "decoder.mid_block"),
    }
    up_blocks = []
    for rev in range(len(config.block_out_channels)):
        p = f"decoder.up_blocks.{rev}"
        block = {
            "resnets": [
                _vae_resnet_from_sd(sd, f"{p}.resnets.{j}")
                for j in range(config.layers_per_block + 1)
            ]
        }
        if f"{p}.upsamplers.0.conv.weight" in sd:
            block["upsample"] = _conv(sd, f"{p}.upsamplers.0.conv")
        up_blocks.append(block)
    params["up_blocks"] = up_blocks
    params["norm_out"] = _norm(sd, "decoder.conv_norm_out")
    params["conv_out"] = _conv(sd, "decoder.conv_out")
    return params


# ---------------------------------------------------------------------------
# Safetensors / directory loading
# ---------------------------------------------------------------------------


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Native mmap reader when available; safetensors lib otherwise."""
    try:
        from sdtpu.utils import native_safetensors

        if native_safetensors.available():
            return native_safetensors.load(path)
    except Exception:
        pass
    from safetensors.numpy import load_file

    return load_file(path)


def _find_weight_file(dirpath: str) -> str:
    names = [
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
    ]
    for n in names:
        p = os.path.join(dirpath, n)
        if os.path.exists(p):
            return p
    cands = [f for f in os.listdir(dirpath) if f.endswith(".safetensors")]
    if len(cands) == 1:
        return os.path.join(dirpath, cands[0])
    raise FileNotFoundError(f"no safetensors weight file found in {dirpath}")


def cast_pytree(tree, dtype):
    import jax

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree.map(cast, tree)


def load_pipeline_params(
    model_dir: str,
    config: PipelineConfig,
    *,
    dtype=None,
) -> dict:
    """Load a diffusers-layout local directory:

    ``model_dir/{text_encoder,unet,vae}/...safetensors`` (plus
    ``text_encoder_2`` for SDXL).  Returns ``{"clip", "unet",
    "vae_encoder", "vae_decoder"[, "clip_2"]}`` pytrees cast to
    ``dtype or config.param_dtype``.
    """
    dtype = dtype or config.param_dtype
    unet_sd = load_safetensors(_find_weight_file(os.path.join(model_dir, "unet")))
    vae_sd = load_safetensors(_find_weight_file(os.path.join(model_dir, "vae")))
    params = {
        "unet": unet_params_from_state_dict(unet_sd, config.unet),
        "vae_encoder": vae_encoder_params_from_state_dict(vae_sd, config.vae),
        "vae_decoder": vae_decoder_params_from_state_dict(vae_sd, config.vae),
    }
    if config.clip is not None:  # bigG-only models (SDXL refiner) skip it
        clip_sd = load_safetensors(
            _find_weight_file(os.path.join(model_dir, "text_encoder"))
        )
        params["clip"] = clip_params_from_state_dict(clip_sd, config.clip)
    if config.clip_2 is not None:
        clip2_sd = load_safetensors(
            _find_weight_file(os.path.join(model_dir, "text_encoder_2"))
        )
        params["clip_2"] = clip_params_from_state_dict(clip2_sd, config.clip_2)
    return cast_pytree(params, dtype)


def save_converted(params: dict, path: str) -> None:
    """Cache a converted parameter pytree with orbax so subsequent loads skip
    the safetensors -> pytree mapping (SURVEY.md §5 checkpoint row)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_converted(path: str) -> dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def init_pipeline_params(key, config: PipelineConfig, *, dtype=None) -> dict:
    """Random-init full-pipeline params (benchmarks / tests without real
    checkpoints — perf is weight-value independent).

    ``key`` may be an int seed or a ``hostrng.HostKey`` (the default, fast
    path: the whole tree is drawn on the host with ZERO XLA compiles — the
    old eager ``jax.random`` init cost one compile per parameter, ~15 s CPU
    even for the tiny test config) or a jax PRNG key (legacy path, exact
    old values).  Leaves are always returned as committed jax arrays: a
    host-numpy leaf tree re-transfers through the TPU relay on EVERY jit
    call (CLAUDE.md round-3 lesson)."""
    import jax
    import jax.numpy as jnp

    from sdtpu.models.clip import init_clip
    from sdtpu.models.unet import init_unet
    from sdtpu.models.vae import init_vae_decoder, init_vae_encoder

    if isinstance(key, int):
        key = hostrng.key(key)
    dtype = dtype or config.param_dtype
    k1, k2, k3, k4, k5 = hostrng.split(key, 5)
    params = {
        "unet": init_unet(k2, config.unet, dtype=dtype),
        "vae_encoder": init_vae_encoder(k3, config.vae, dtype=dtype),
        "vae_decoder": init_vae_decoder(k4, config.vae, dtype=dtype),
    }
    if config.clip is not None:  # bigG-only models (SDXL refiner) skip it
        params["clip"] = init_clip(k1, config.clip, dtype=dtype)
    if config.clip_2 is not None:
        params["clip_2"] = init_clip(k5, config.clip_2, dtype=dtype)
    return jax.tree.map(jnp.asarray, params)
