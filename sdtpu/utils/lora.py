"""LoRA adapter loading and fusion into the pipeline parameter tree.

Beyond-reference capability (the reference loads monolithic checkpoints
only, ``helpers/utils.mojo:63-141``): community Stable Diffusion
deployments are dominated by low-rank adapters, so a serving framework
needs them.  TPU-first design: adapters are FUSED into the base weights
host-side (``W += scale * (alpha/r) * up @ down``) instead of adding
per-call adapter matmuls — the compiled program is byte-identical to the
base pipeline's (same shapes, same HLO, zero runtime cost), and swapping
adapters is a parameter-tree update that reuses the cached executable, no
recompile.  The fuse runs in f32 on host numpy and casts back to the
param dtype.

Supported checkpoint layouts (auto-detected per key):

* **kohya / sd-scripts** — ``lora_unet_<name>.lora_down.weight`` /
  ``.lora_up.weight`` / ``.alpha`` with ``_``-separated module names;
  text encoders as ``lora_te_`` (SD1.x) / ``lora_te1_`` / ``lora_te2_``
  (SDXL).  Conv LoRA (LoCon 3x3) included.
* **diffusers / peft** — ``unet.<dotted>.lora_A.weight`` /
  ``.lora_B.weight`` (A=down, B=up; alpha defaults to the rank), prefixes
  ``text_encoder.`` / ``text_encoder_2.``.

Matching is table-driven, not string-surgery: the pipeline's own parameter
tree is enumerated into (diffusers module path -> leaf) tables mirroring
``sdtpu/utils/weights.py``'s state-dict mapping, so the ambiguous
underscored kohya names resolve by exact lookup.  CLIP layers are stacked
for ``lax.scan`` (leading layer axis); per-layer adapter deltas index into
the stacked leaf.

Apply LoRA BEFORE :func:`sdtpu.utils.quant.quantize_pipeline_int8` —
fusing into an int8-quantized leaf would silently skip requantization, so
it raises instead.
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# parameter-tree module tables
# ---------------------------------------------------------------------------


def _index_unet(unet: dict) -> dict:
    """``underscored diffusers module name -> (leaf dict, None)`` for every
    LoRA-targetable UNet module (mirrors
    ``weights.unet_params_from_state_dict``)."""
    idx: dict = {}

    def add(name: str, leaf: dict) -> None:
        idx[name.replace(".", "_")] = (leaf, None)

    def resnet(r: dict, p: str) -> None:
        add(f"{p}.conv1", r["conv1"])
        add(f"{p}.conv2", r["conv2"])
        if "time_emb_proj" in r:
            add(f"{p}.time_emb_proj", r["time_emb_proj"])
        if "conv_shortcut" in r:
            add(f"{p}.conv_shortcut", r["conv_shortcut"])

    def attn_block(a: dict, p: str) -> None:
        add(f"{p}.proj_in", a["proj_in"])
        add(f"{p}.proj_out", a["proj_out"])
        for k, blk in enumerate(a["blocks"]):
            bp = f"{p}.transformer_blocks.{k}"
            for an in ("attn1", "attn2"):
                at = blk[an]
                add(f"{bp}.{an}.to_q", at["q"])
                add(f"{bp}.{an}.to_k", at["k"])
                add(f"{bp}.{an}.to_v", at["v"])
                add(f"{bp}.{an}.to_out.0", at["out"])
            add(f"{bp}.ff.net.0.proj", blk["ff"]["proj"])
            add(f"{bp}.ff.net.2", blk["ff"]["out"])

    add("conv_in", unet["conv_in"])
    te = unet["time_embedding"]
    add("time_embedding.linear_1", te["linear_1"])
    add("time_embedding.linear_2", te["linear_2"])
    if "cond_proj" in te:
        add("time_embedding.cond_proj", te["cond_proj"])
    if "add_embedding" in unet:
        add("add_embedding.linear_1", unet["add_embedding"]["linear_1"])
        add("add_embedding.linear_2", unet["add_embedding"]["linear_2"])
    for i, b in enumerate(unet["down_blocks"]):
        for j, r in enumerate(b["resnets"]):
            resnet(r, f"down_blocks.{i}.resnets.{j}")
        for j, a in enumerate(b.get("attentions", ())):
            attn_block(a, f"down_blocks.{i}.attentions.{j}")
        if "downsample" in b:
            add(f"down_blocks.{i}.downsamplers.0.conv", b["downsample"])
    if "mid_block" in unet:
        for j, r in enumerate(unet["mid_block"]["resnets"]):
            resnet(r, f"mid_block.resnets.{j}")
        for j, a in enumerate(unet["mid_block"].get("attentions", ())):
            attn_block(a, f"mid_block.attentions.{j}")
    for i, b in enumerate(unet["up_blocks"]):
        for j, r in enumerate(b["resnets"]):
            resnet(r, f"up_blocks.{i}.resnets.{j}")
        for j, a in enumerate(b.get("attentions", ())):
            attn_block(a, f"up_blocks.{i}.attentions.{j}")
        if "upsample" in b:
            add(f"up_blocks.{i}.upsamplers.0.conv", b["upsample"])
    add("conv_out", unet["conv_out"])
    return idx


def _index_clip(clip: dict) -> dict:
    """``underscored HF module name -> (stacked leaf dict, layer index)``.
    CLIP layer params are stacked with a leading layer axis (scan form,
    ``weights.clip_params_from_state_dict``); the layer index selects the
    row the delta lands in."""
    idx: dict = {}
    layers = clip["layers"]
    num_layers = int(np.asarray(layers["norm1"]["scale"]).shape[0])
    for i in range(num_layers):
        p = f"text_model.encoder.layers.{i}"
        for hf, leaf in (
            (f"{p}.self_attn.q_proj", layers["attn"]["q"]),
            (f"{p}.self_attn.k_proj", layers["attn"]["k"]),
            (f"{p}.self_attn.v_proj", layers["attn"]["v"]),
            (f"{p}.self_attn.out_proj", layers["attn"]["out"]),
            (f"{p}.mlp.fc1", layers["mlp"]["fc1"]),
            (f"{p}.mlp.fc2", layers["mlp"]["fc2"]),
        ):
            idx[hf.replace(".", "_")] = (leaf, i)
    return idx


def _copy_containers(tree):
    """Copy every dict/list/tuple node, share the array leaves — the merge
    then mutates leaf-dict entries without touching the caller's tree."""
    if isinstance(tree, dict):
        return {k: _copy_containers(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_copy_containers(v) for v in tree)
    return tree


# ---------------------------------------------------------------------------
# checkpoint-key parsing
# ---------------------------------------------------------------------------

_KOHYA_PREFIXES = (
    ("lora_unet_", "unet"),
    ("lora_te1_", "clip"),
    ("lora_te2_", "clip_2"),
    ("lora_te_", "clip"),
)
_PEFT_PREFIXES = (
    ("unet.", "unet"),
    ("text_encoder_2.", "clip_2"),
    ("text_encoder.", "clip"),
)
_PEFT_SUFFIXES = (
    (".lora_A.weight", "down"),
    (".lora_B.weight", "up"),
    (".lora_A.default.weight", "down"),
    (".lora_B.default.weight", "up"),
    (".lora.down.weight", "down"),
    (".lora.up.weight", "up"),
    (".alpha", "alpha"),
)
_KOHYA_SUFFIXES = (
    (".lora_down.weight", "down"),
    (".lora_up.weight", "up"),
    (".alpha", "alpha"),
)


def _parse_lora_sd(sd: Mapping) -> Tuple[dict, list]:
    """Group raw checkpoint keys into
    ``(model_tag, underscored_name) -> {down, up, alpha}``."""
    groups: dict = {}
    unrecognized: list = []
    for key, val in sd.items():
        tag = name = part = None
        for prefix, t in _KOHYA_PREFIXES:
            if key.startswith(prefix):
                rest = key[len(prefix):]
                for suffix, p in _KOHYA_SUFFIXES:
                    if rest.endswith(suffix):
                        tag, part = t, p
                        name = rest[: -len(suffix)]
                        break
                break
        if tag is None:
            for prefix, t in _PEFT_PREFIXES:
                if key.startswith(prefix):
                    rest = key[len(prefix):]
                    for suffix, p in _PEFT_SUFFIXES:
                        if rest.endswith(suffix):
                            tag, part = t, p
                            name = rest[: -len(suffix)].replace(".", "_")
                            break
                    break
        if tag is None:
            unrecognized.append(key)
            continue
        groups.setdefault((tag, name), {})[part] = val
    return groups, unrecognized


# ---------------------------------------------------------------------------
# fusion
# ---------------------------------------------------------------------------


def _delta_for_leaf(kernel: np.ndarray, down: np.ndarray, up: np.ndarray,
                    name: str) -> np.ndarray:
    """The fused delta in THIS tree's kernel convention: (I, O) linears
    ((kh, kw, I, O) convs) vs torch's (O, I) / (O, I, kh, kw) LoRA pair."""
    down = np.asarray(down, np.float32)
    up = np.asarray(up, np.float32)
    if kernel.ndim in (2, 3):  # linear (or stacked linear)
        # 1x1-conv-shaped factors (proj_in/proj_out LoCon) squeeze to 2-D
        if down.ndim == 4:
            down = down[:, :, 0, 0]
        if up.ndim == 4:
            up = up[:, :, 0, 0]
        return (up @ down).T  # (I, O)
    if kernel.ndim == 4:  # conv (kh, kw, I, O)
        kh, kw, ci, _ = kernel.shape
        if down.ndim == 2:  # flattened LoCon down: (r, I*kh*kw)
            down = down.reshape(down.shape[0], ci, kh, kw)
        if up.ndim == 4:
            up = up[:, :, 0, 0]
        delta = np.einsum("or,rikl->oikl", up, down)
        return delta.transpose(2, 3, 1, 0)
    raise ValueError(f"unsupported kernel rank {kernel.ndim} for {name}")


def apply_lora(
    params: dict,
    lora_sd: Mapping,
    *,
    scale: float = 1.0,
) -> Tuple[dict, dict]:
    """Fuse a LoRA state dict into a pipeline parameter tree.

    Returns ``(new_params, report)`` — the input tree is not modified;
    array leaves are shared except the fused kernels.  ``report`` counts
    ``applied`` modules and lists ``skipped`` (parsed but matching no
    module in this architecture — e.g. an SDXL adapter on SD1.5) and
    ``unrecognized`` raw keys (unknown layout)."""
    new = _copy_containers(params)
    tables = {"unet": _index_unet(new["unet"])}
    if "clip" in new:
        tables["clip"] = _index_clip(new["clip"])
    if "clip_2" in new:
        tables["clip_2"] = _index_clip(new["clip_2"])

    groups, unrecognized = _parse_lora_sd(lora_sd)
    applied = 0
    skipped: list = []
    originals: dict = {}
    for (tag, name), g in sorted(groups.items()):
        table = tables.get(tag)
        hit = table.get(name) if table is not None else None
        if hit is None:
            skipped.append(f"{tag}:{name}")
            continue
        if "down" not in g or "up" not in g:
            skipped.append(f"{tag}:{name} (incomplete pair)")
            continue
        leaf, layer_idx = hit
        if "kernel" not in leaf:
            raise ValueError(
                f"{tag}:{name} is int8-quantized — apply LoRA before "
                "quantize_int8() (fusing into quantized weights would "
                "skip requantization)"
            )
        kernel = np.asarray(leaf["kernel"])
        target = kernel[layer_idx] if layer_idx is not None else kernel
        originals.setdefault((tag, name), np.array(target))
        rank = int(np.asarray(g["down"]).shape[0])
        alpha = float(np.asarray(g["alpha"])) if "alpha" in g else float(rank)
        delta = _delta_for_leaf(target, g["down"], g["up"], name)
        delta = delta * (scale * alpha / rank)
        if delta.shape != target.shape:
            skipped.append(
                f"{tag}:{name} (shape {delta.shape} vs {target.shape})"
            )
            continue
        fused = target.astype(np.float32) + delta
        if layer_idx is not None:
            out = kernel.astype(np.float32).copy()
            out[layer_idx] = fused
            leaf["kernel"] = out.astype(kernel.dtype)
        else:
            leaf["kernel"] = fused.astype(kernel.dtype)
        applied += 1
    return new, {
        "applied": applied,
        "skipped": skipped,
        "unrecognized": unrecognized,
        # pre-fuse kernels of every touched module (per-layer rows for the
        # stacked CLIP leaves) — what restore_weights needs for an EXACT
        # unfuse (re-subtracting the delta would leave a one-ulp bf16
        # rounding residue per stacked adapter)
        "originals": originals,
    }


def restore_weights(params: dict, originals: Mapping) -> dict:
    """Undo LoRA fusion exactly: put back the pre-fuse kernels captured in
    ``apply_lora``'s report (``originals``: ``(tag, name) -> array``).
    Returns a new tree; the adapter-swap primitive for serving
    (:meth:`StableDiffusionPipeline.unload_loras`)."""
    new = _copy_containers(params)
    tables = {"unet": _index_unet(new["unet"])}
    if "clip" in new:
        tables["clip"] = _index_clip(new["clip"])
    if "clip_2" in new:
        tables["clip_2"] = _index_clip(new["clip_2"])
    for (tag, name), orig in originals.items():
        leaf, layer_idx = tables[tag][name]
        if layer_idx is None:
            leaf["kernel"] = orig
        else:
            k = np.array(np.asarray(leaf["kernel"]))
            k[layer_idx] = orig
            leaf["kernel"] = k
    return new
