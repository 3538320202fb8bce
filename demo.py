#!/usr/bin/env python3
"""CLI demo (reference: ``demo.mojo`` — prompt "a cat flying a spaceship",
strength .9, seed 40; the reference never saves its output, we write a PNG).

Without a checkpoint directory this runs random weights, which is exactly
what the reference always does (it never loads weights, SURVEY.md §5 row
"Checkpoint / resume").  Point --model-dir at a local diffusers-layout
segmind/tiny-sd directory for real generations.
"""

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--prompt", default="a cat flying a spaceship")
    ap.add_argument("--negative-prompt", default="")
    ap.add_argument("--model-dir", default=None,
                    help="local diffusers-layout checkpoint dir")
    ap.add_argument("--preset", default="tiny-sd")
    ap.add_argument("--image-size", type=int, default=None,
                    help="default: the preset's native size")
    ap.add_argument("--steps", type=int, default=None,
                    help="default: the preset's native step count")
    ap.add_argument("--seed", type=int, default=40)
    ap.add_argument("--sampler", default=None,
                    help="ddpm/ddim/euler/euler-a/lcm/dpm++ or the "
                         "-karras variants (sdtpu.samplers.SAMPLERS); "
                         "default: the preset's native sampler")
    ap.add_argument("--cfg-scale", type=float, default=None)
    ap.add_argument("--no-cfg", action="store_true")
    ap.add_argument("--init-image", default=None, help="img2img input path")
    ap.add_argument("--mask-image", default=None,
                    help="inpainting mask path (white = repaint); "
                         "requires --init-image")
    ap.add_argument("--strength", type=float, default=0.9)
    ap.add_argument("--image-guidance-scale", type=float, default=1.5,
                    help="InstructPix2Pix editing checkpoints (--preset "
                         "ip2p): the image-guidance branch's scale")
    ap.add_argument("--freeu", default=None, metavar="B1,B2,S1,S2",
                    help="FreeU factors (Si et al. 2023), e.g. "
                         "'1.5,1.6,0.9,0.2' for SD 1.x or "
                         "'1.3,1.4,0.9,0.2' for SDXL")
    ap.add_argument("--guidance-rescale", type=float, default=0.0,
                    help="CFG-rescale factor (Lin et al. 2023; diffusers "
                         "guidance_rescale) — fixes overexposure at high "
                         "cfg scales, recommended ~0.7 for v-prediction "
                         "models trained with zero terminal SNR")
    ap.add_argument("--pag-scale", type=float, default=0.0,
                    help="Perturbed-Attention Guidance scale (Ahn et al. "
                         "2024; diffusers pag_scale) — a third guidance "
                         "branch with identity self-attention at the "
                         "mid block; typical 2.0-5.0")
    ap.add_argument("--hires-base", type=int, default=None, metavar="PX",
                    help="two-pass hires fix: txt2img at this base size, "
                         "bilinear upscale, img2img refine at --image-size")
    ap.add_argument("--hires-strength", type=float, default=0.7,
                    help="refinement strength for the hires second pass")
    ap.add_argument("--controlnet", action="append", default=[],
                    metavar="PATH",
                    help="diffusers ControlNetModel safetensors file or "
                         "model dir (e.g. lllyasviel/sd-controlnet-canny); "
                         "requires --control-image; repeat for "
                         "multi-ControlNet (one --control-image per net)")
    ap.add_argument("--control-image", action="append", default=[],
                    help="control map path (canny edges, depth, pose, ...)")
    ap.add_argument("--controlnet-scale", type=float, action="append",
                    default=[], help="one per net; default 1.0")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8-quantize the UNet (2x int8 MXU path; "
                         "fidelity notes in sdtpu/utils/quant.py)")
    ap.add_argument("--int8-transformer", nargs="?", const=True,
                    default=False, choices=["full"],
                    help="with --int8: quantize the post-LN transformer "
                         "matmuls too; 'full' adds the out-projections + "
                         "GeGLU down (runtime per-row scales)")
    ap.add_argument("--int8-vae", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="with --int8: quantize the VAE decoder resnets "
                         "(default: auto — ON for few-step presets, where "
                         "int8-UNet-only hits a 1.8x async-copy stall; "
                         "--no-int8-vae forces off)")
    ap.add_argument("--lora", action="append", default=[],
                    metavar="PATH[:SCALE]",
                    help="fuse a LoRA adapter safetensors (kohya or "
                         "diffusers-peft layout) into the weights before "
                         "generation; repeatable to stack adapters")
    ap.add_argument("--textual-inversion", action="append", default=[],
                    metavar="PATH[:TOKEN]",
                    help="load a textual-inversion embedding safetensors; "
                         "TOKEN names the placeholder for emb_params/"
                         "dual-encoder layouts; repeatable")
    ap.add_argument("--prompt-weighting", action="store_true",
                    help="parse (word:1.3) / [word] emphasis syntax in the "
                         "prompts and weight each token's conditioning "
                         "(needs tokenizer assets)")
    ap.add_argument("--encoder-cache", type=int, default=1, metavar="K",
                    help="encoder-feature reuse interval (Faster Diffusion "
                         "/ DeepCache approximation): run the UNet encoder "
                         "once per K steps, decoder-only in between — "
                         "faster at a quality cost; validate on real "
                         "weights")
    ap.add_argument("--clip-skip", type=int, default=0,
                    help="condition on the text-encoder hidden state N "
                         "layers before the usual output (diffusers "
                         "semantics; 1 = community 'CLIP skip 2')")
    ap.add_argument("--refiner", default=None, metavar="DIR_OR_PRESET",
                    help="SDXL refiner checkpoint dir (diffusers layout) or "
                         "preset name (sdxl-refiner): the base model runs "
                         "the high-noise head (denoising_end), the refiner "
                         "finishes from its latents (denoising_start)")
    ap.add_argument("--denoising-split", type=float, default=0.8,
                    help="base/refiner handoff fraction (default 0.8)")
    ap.add_argument("--out", default="out.png")
    args = ap.parse_args()

    from sdtpu import StableDiffusionPipeline
    from sdtpu.utils.image import load_image, save_png
    from sdtpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    if args.model_dir:
        pipe = StableDiffusionPipeline.from_pretrained(
            args.model_dir, preset=args.preset
        )
    else:
        print("no --model-dir: running random weights (reference behavior)")
        pipe = StableDiffusionPipeline.from_random(args.preset)
    for spec in args.lora:
        path, _, s = spec.rpartition(":")
        try:
            path, scale = (path, float(s)) if path else (spec, 1.0)
        except ValueError:
            path, scale = spec, 1.0
        report = pipe.load_lora(path, scale=scale)
        print(f"lora {path} (scale {scale}): {report['applied']} modules"
              + (f", skipped {len(report['skipped'])}"
                 if report["skipped"] else ""))
    for spec in args.textual_inversion:
        path, _, tok = spec.rpartition(":")
        path, tok = (path, tok) if path else (spec, None)
        reg = pipe.load_textual_inversion(path, token=tok)
        print(f"textual inversion {path}: "
              + ", ".join(f"{t} -> {ids}" for t, ids in reg.items()))
    if args.int8:
        pipe.quantize_int8(transformer=args.int8_transformer,
                           vae=args.int8_vae)
    cn_scales = args.controlnet_scale or [1.0] * len(args.controlnet)
    if args.controlnet:
        if len(args.control_image) != len(args.controlnet):
            ap.error("need exactly one --control-image per --controlnet")
        if len(cn_scales) != len(args.controlnet):
            ap.error("need one --controlnet-scale per --controlnet (or none)")
        pipe.load_controlnet(
            args.controlnet[0] if len(args.controlnet) == 1
            else args.controlnet
        )
        for p, s in zip(args.controlnet, cn_scales):
            print(f"controlnet {p} (scale {s})")
    elif args.control_image:
        ap.error("--control-image requires --controlnet")

    token_ids = None
    if pipe.tokenizer is None:
        import numpy as np

        # real assets (assets/tokenizer, via tools/prepare_tokenizer.py) are
        # auto-discovered by the pipeline; this fallback only exists for the
        # offline no-asset environment
        if args.prompt_weighting:
            ap.error("--prompt-weighting needs tokenizer assets "
                     "(tools/prepare_tokenizer.py)")
        print("no tokenizer assets: hashing prompt to fixed token ids")
        # stable hash: str.__hash__ is salted per process, which would make
        # repeated demo invocations non-reproducible
        import zlib

        rng = np.random.default_rng(zlib.crc32(args.prompt.encode()))
        row = rng.integers(0, pipe.config.text_config.vocab_size,
                           pipe.config.text_config.max_length)
        token_ids = np.stack([row, np.zeros_like(row)])

    refiner = None
    if args.refiner:
        import os

        if os.path.isdir(args.refiner):
            refiner = StableDiffusionPipeline.from_pretrained(args.refiner)
        else:
            print(f"refiner preset {args.refiner}: random weights")
            refiner = StableDiffusionPipeline.from_random(args.refiner)
        if args.init_image or args.mask_image:
            ap.error("--refiner composes with txt2img only")

    t0 = time.perf_counter()
    gen = pipe.generate
    extra = {}
    if args.hires_base:
        if args.init_image or args.mask_image or refiner:
            ap.error("--hires-base composes with plain txt2img only")
        gen = pipe.generate_hires
        extra = dict(base_size=args.hires_base,
                     hires_strength=args.hires_strength)
    image = gen(
        args.prompt,
        args.negative_prompt,
        **extra,
        strength=args.strength,
        cfg=False if args.no_cfg else None,  # None -> preset default
        cfg_scale=args.cfg_scale,
        num_inference_steps=args.steps,
        seed=args.seed,
        init_image=load_image(args.init_image) if args.init_image else None,
        mask_image=load_image(args.mask_image) if args.mask_image else None,
        image_size=args.image_size,
        token_ids=token_ids,
        sampler=args.sampler,
        clip_skip=args.clip_skip,
        prompt_weighting=args.prompt_weighting,
        image_guidance_scale=args.image_guidance_scale,
        guidance_rescale=args.guidance_rescale,
        pag_scale=args.pag_scale,
        freeu=(tuple(float(v) for v in args.freeu.split(","))
               if args.freeu else None),
        encoder_cache_interval=args.encoder_cache,
        control_image=(
            [load_image(p) for p in args.control_image]
            if len(args.control_image) > 1
            else load_image(args.control_image[0])
            if args.control_image else None
        ),
        controlnet_scale=(
            cn_scales if len(cn_scales) > 1
            else cn_scales[0] if cn_scales else 1.0
        ),
        denoising_end=args.denoising_split if refiner else None,
        output="latents" if refiner else "uint8",
    )
    if refiner:
        ref_token_ids = None
        if refiner.tokenizer is None:
            import numpy as np

            import zlib

            rng = np.random.default_rng(zlib.crc32(args.prompt.encode()))
            row = rng.integers(0, refiner.config.text_config.vocab_size,
                               refiner.config.text_config.max_length)
            ref_token_ids = np.stack([row, np.zeros_like(row)])
        image = refiner.generate(
            args.prompt,
            args.negative_prompt,
            cfg=False if args.no_cfg else None,
            cfg_scale=args.cfg_scale,
            num_inference_steps=args.steps,
            seed=args.seed,
            # the latent grid is the BASE model's (refiner presets may
            # default to a different native size)
            image_size=args.image_size or pipe.config.default_image_size,
            token_ids=ref_token_ids,
            sampler=args.sampler,
            latents=image,
            denoising_start=args.denoising_split,
        )
    dt = time.perf_counter() - t0
    save_png(image, args.out)
    print(f"wrote {args.out} ({image.shape[1]}x{image.shape[2]}) in {dt:.2f}s "
          f"(includes compile)")


if __name__ == "__main__":
    main()
