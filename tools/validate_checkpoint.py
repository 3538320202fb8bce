#!/usr/bin/env python3
"""Validate a REAL checkpoint end-to-end against the independent torch
mirror (tests/torch_ref.py) — the full-fidelity protocol for when a local
diffusers-layout checkpoint exists (this build environment has none; the
same mapping is validated with randomized weights in
tests/test_unet_full_golden.py / test_vae_full_golden.py).

Loads the SAME safetensors into (a) sdtpu pytrees and (b) the torch mirror,
runs full-network forwards on shared inputs, and reports per-network max
abs/rel error plus a decoded-image PSNR.  All offline — no diffusers needed.

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/validate_checkpoint.py \
        /path/to/model_dir [--preset tiny-sd] [--latent 32]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--preset", default=None,
                    help="preset override; default: infer from the "
                         "checkpoint's own JSON configs "
                         "(config_from_checkpoint), falling back to the "
                         "preset table by directory basename")
    ap.add_argument("--latent", type=int, default=32,
                    help="latent grid for the UNet check")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from sdtpu.config import get_preset
    from sdtpu.models.unet import unet_forward
    from sdtpu.models.vae import vae_decode
    from sdtpu.utils.image import psnr
    from sdtpu.utils.weights import (
        _find_weight_file,
        load_safetensors,
        unet_params_from_state_dict,
        vae_decoder_params_from_state_dict,
    )
    from torch_ref import RefAutoencoderKL, RefUNet

    if args.preset is not None:
        config = get_preset(args.preset)
    else:
        from sdtpu.config import PRESETS, config_from_checkpoint

        base = os.path.basename(args.model_dir.rstrip("/"))
        try:
            config = config_from_checkpoint(args.model_dir)
            print(f"config: inferred from {args.model_dir}/…/config.json")
        except (ValueError, FileNotFoundError):
            config = get_preset(base if base in PRESETS else "tiny-sd")
            print(f"config: preset {config.name}")
    rng = np.random.default_rng(0)

    def rel(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return float(np.abs(a - b).max()), float(
            np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
        )

    # ---- UNet ----
    unet_sd = load_safetensors(
        _find_weight_file(os.path.join(args.model_dir, "unet"))
    )
    params = jax.tree.map(
        jnp.asarray, unet_params_from_state_dict(unet_sd, config.unet)
    )
    ref = RefUNet(config.unet).eval()

    def as_mirror(k, v):
        # newer-diffusers checkpoints (and SDXL) store Transformer2D
        # proj_in/out as LINEAR (O, I); the mirror models them as 1x1
        # convs — mathematically identical, reshape to (O, I, 1, 1)
        v = np.asarray(v)
        if (k.endswith(("proj_in.weight", "proj_out.weight"))
                and v.ndim == 2):
            v = v[:, :, None, None]
        return torch.from_numpy(v)

    missing, unexpected = ref.load_state_dict(
        {k: as_mirror(k, v) for k, v in unet_sd.items()},
        strict=False,
    )
    if missing or unexpected:
        print(f"torch mirror key mismatch: missing={missing[:5]} "
              f"unexpected={unexpected[:5]}")
    lat = rng.standard_normal(
        (1, args.latent, args.latent, config.unet.in_channels)
    ).astype(np.float32)
    ctx = rng.standard_normal(
        (1, config.text_config.max_length, config.unet.cross_attention_dim)
    ).astype(np.float32)
    ts = np.array([500.0], np.float32)
    # SDXL/refiner micro-conditioning: synthesize pooled embeds + time ids
    # (5 ids when the preset requires an aesthetic score, else 6)
    added_t = {}
    added_j = None
    if config.unet.addition_embed_dim is not None:
        n_ids = 5 if config.requires_aesthetics_score else 6
        pooled_dim = (
            config.unet.addition_embed_dim
            - n_ids * config.unet.addition_time_embed_dim
        )
        pooled = rng.standard_normal((1, pooled_dim)).astype(np.float32)
        tid = np.array(
            [[512, 512, 0, 0, 6.0, 512][:n_ids]], np.float32
        )
        added_t = {
            "text_embeds": torch.from_numpy(pooled),
            "time_ids": torch.from_numpy(tid),
        }
        added_j = {
            "text_embeds": jnp.asarray(pooled),
            "time_ids": jnp.asarray(tid),
        }
    with torch.no_grad():
        want = ref(
            torch.from_numpy(lat.transpose(0, 3, 1, 2)),
            torch.from_numpy(ts), torch.from_numpy(ctx), **added_t,
        ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        unet_forward(jnp.asarray(lat), jnp.asarray(ts), jnp.asarray(ctx),
                     params, config.unet, added_cond=added_j)
    )
    mx, r = rel(got, want)
    print(f"UNet  forward: max abs err {mx:.2e}, rel {r:.2e} "
          f"({'OK' if r < 1e-3 else 'INVESTIGATE'})")

    # ---- VAE decode ----
    vae_sd = load_safetensors(
        _find_weight_file(os.path.join(args.model_dir, "vae"))
    )
    dec = jax.tree.map(
        jnp.asarray, vae_decoder_params_from_state_dict(vae_sd, config.vae)
    )
    vref = RefAutoencoderKL(config.vae).eval()
    vref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in vae_sd.items()},
        strict=False,
    )
    z = rng.standard_normal(
        (1, args.latent, args.latent, config.vae.latent_channels)
    ).astype(np.float32)
    with torch.no_grad():
        want_img = vref.decode(
            torch.from_numpy(z.transpose(0, 3, 1, 2)), config.vae.scaling_factor
        ).numpy().transpose(0, 2, 3, 1)
    got_img = np.asarray(vae_decode(jnp.asarray(z), dec, config.vae))
    mx, r = rel(got_img, want_img)
    score = psnr(got_img, want_img)
    print(f"VAE   decode : max abs err {mx:.2e}, rel {r:.2e}, "
          f"PSNR {score:.1f} dB ({'OK' if score > 40 else 'INVESTIGATE'})")


if __name__ == "__main__":
    main()
