#!/usr/bin/env python3
"""Convert a local diffusers-layout checkpoint directory into an orbax cache
of sdtpu pytrees (one-time cost; later loads skip the safetensors -> pytree
mapping).  Offline tool — no network.

Usage:
    python tools/convert_checkpoint.py /path/to/segmind-tiny-sd \
        --preset tiny-sd --out /path/to/cache [--dtype bf16]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--preset", default="tiny-sd")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from sdtpu.config import get_preset
    from sdtpu.utils.weights import load_pipeline_params, save_converted

    config = get_preset(args.preset)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = load_pipeline_params(args.model_dir, config, dtype=dtype)
    save_converted(params, args.out)
    print(f"converted {args.model_dir} ({args.preset}, {args.dtype}) -> {args.out}")


if __name__ == "__main__":
    main()
