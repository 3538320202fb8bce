#!/usr/bin/env python3
"""First-network-access acceptance runbook (VERDICT.md round-2 item 5).

Everything in this repo that CAN be validated offline has been (independent
torch mirror goldens, frozen fixtures, HF-parity tokenizer tests that
auto-skip without assets).  The remaining fidelity evidence — the north-star
**PSNR >= 40 dB vs fp32 diffusers** (`BASELINE.md`) and the real 49408-token
vocab path — needs artifacts this build environment cannot produce (zero
egress).  The moment network (or a copied-in checkpoint) exists, THIS is the
one command to run:

    python tools/acceptance.py [--model-dir /path/to/tiny-sd] \
                               [--hf-model segmind/tiny-sd] [--steps 25]

Steps (each emits PASS/FAIL/SKIP; one final JSON line):
  1. tokenizer-assets  — fetch vocab.json/merges.txt via
     tools/prepare_tokenizer.py if missing (network), else reuse
     assets/tokenizer/.
  2. real-vocab-tests  — the auto-activating HF-parity suite
     (tests/test_tokenizer_real_vocab.py — the only tests that skip
     offline) must go green.
  3. checkpoint        — locate a diffusers-layout Tiny-SD dir
     (--model-dir, $SDTPU_MODEL_DIR, or huggingface_hub download of
     --hf-model).
  4. component-parity  — full-network UNet + VAE forwards of the REAL
     weights vs the independent torch mirror
     (tools/validate_checkpoint.py protocol): rel err < 1e-3, VAE PSNR > 40.
  5. clip-parity       — our CLIP vs transformers' CLIPTextModel loaded
     from the same checkpoint dir: max abs err < 1e-3.
  6. e2e-psnr          — seed-matched full generate vs fp32 diffusers
     (rng="torch", DDIM): **PSNR >= 40 dB** = the north star.  If
     diffusers is not installed this downgrades to SKIP with the exact
     pip command to finish the job.
  7. int8-fidelity     — W8A8 pipeline vs bf16 on real weights (>= 40 dB),
     plus the calibrated-full-transformer variant.
  8. encoder-cache-quality / guidance-features — round-3 quality features
     (encoder-feature cache k=2/3 PSNR vs k=1; PAG / FreeU / CFG-rescale
     sanity) on real weights — see step_feature_quality.
  9. lora-ti           — real LoRA fuse/unfuse round-trip and textual
     inversion (needs --lora / --ti adapter files).

Offline (no assets, no network) every step SKIPs cleanly and the tool exits
0 with {"status": "blocked-offline"} — running it costs nothing and proves
the harness itself works.

Reference promise being matched: the reference ships + consumes
tokenizer_clip.bin (`/root/reference/pipeline.mojo:32-37`) and documents
binary weight loading as the intended pattern
(`/root/reference/README.md:44,55`).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

RESULTS = []


def record(name, status, detail=""):
    RESULTS.append({"step": name, "status": status, "detail": detail})
    print(f"[{status:>4}] {name}: {detail}")
    return status == "PASS"


def step_tokenizer_assets(args):
    asset_dir = os.path.join(REPO, "assets", "tokenizer")
    have = os.path.isfile(os.path.join(asset_dir, "vocab.json")) and (
        os.path.isfile(os.path.join(asset_dir, "merges.txt"))
    )
    if not have:
        try:
            subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "prepare_tokenizer.py"),
                 "--out", asset_dir],
                check=True, capture_output=True, text=True, timeout=600,
            )
            have = True
        except Exception as exc:
            return record("tokenizer-assets", "SKIP",
                          f"no assets and fetch failed ({exc}); "
                          "run tools/prepare_tokenizer.py with network")
    from sdtpu.tokenizer.bpe import CLIPTokenizer

    tok = CLIPTokenizer.from_default_assets()
    if tok is None or len(tok.vocab) != 49408:
        return record("tokenizer-assets", "FAIL",
                      f"assets present but vocab loads wrong "
                      f"({None if tok is None else len(tok.vocab)} tokens)")
    return record("tokenizer-assets", "PASS", "49408-token vocab installed")


def step_real_vocab_tests(args):
    if not any(r["step"] == "tokenizer-assets" and r["status"] == "PASS"
               for r in RESULTS):
        return record("real-vocab-tests", "SKIP", "no tokenizer assets")
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(REPO, "tests", "test_tokenizer_real_vocab.py"), "-q"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    if proc.returncode != 0:
        return record("real-vocab-tests", "FAIL", tail)
    if "skipped" in tail and "passed" not in tail:
        return record("real-vocab-tests", "FAIL", f"still skipping: {tail}")
    return record("real-vocab-tests", "PASS", tail)


def step_checkpoint(args):
    cand = args.model_dir or os.environ.get("SDTPU_MODEL_DIR")
    if cand and os.path.isdir(cand):
        args.resolved_model_dir = cand
        return record("checkpoint", "PASS", cand)
    try:
        from huggingface_hub import snapshot_download

        path = snapshot_download(args.hf_model)
        args.resolved_model_dir = path
        return record("checkpoint", "PASS", f"downloaded {args.hf_model} -> {path}")
    except Exception as exc:
        args.resolved_model_dir = None
        return record("checkpoint", "SKIP",
                      f"no local dir and download failed ({type(exc).__name__}); "
                      "pass --model-dir or set $SDTPU_MODEL_DIR")


def step_component_parity(args):
    if not args.resolved_model_dir:
        return record("component-parity", "SKIP", "no checkpoint")
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    cmd = [sys.executable,
           os.path.join(REPO, "tools", "validate_checkpoint.py"),
           args.resolved_model_dir]
    if args.preset:  # else validate_checkpoint infers from the JSON configs
        cmd += ["--preset", args.preset]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    out = proc.stdout.strip()
    ok = proc.returncode == 0 and "INVESTIGATE" not in out and "OK" in out
    return record("component-parity", "PASS" if ok else "FAIL",
                  out.replace("\n", " | ") or proc.stderr[-300:])


def step_clip_parity(args):
    if not args.resolved_model_dir:
        return record("clip-parity", "SKIP", "no checkpoint")
    te_dir = os.path.join(args.resolved_model_dir, "text_encoder")
    if not os.path.isdir(te_dir):
        return record("clip-parity", "SKIP", "checkpoint has no text_encoder/")
    try:
        import numpy as np
        import torch
        from transformers import CLIPTextModel

        import jax.numpy as jnp
        from sdtpu.config import get_preset
        from sdtpu.models.clip import clip_encode
        from sdtpu.utils.weights import (
            _find_weight_file, clip_params_from_state_dict, load_safetensors,
        )

        if args.preset:
            config = get_preset(args.preset)
        else:
            from sdtpu.config import config_from_checkpoint

            config = config_from_checkpoint(args.resolved_model_dir)
        sd = load_safetensors(_find_weight_file(te_dir))
        params = clip_params_from_state_dict(sd, config.clip)
        ref = CLIPTextModel.from_pretrained(te_dir).eval()
        # ids sized to the checkpoint's own window and vocab (a synthetic
        # drill checkpoint has max_length 16 / vocab 1024; hardcoding the
        # SD 77/49408 shape here broke exactly that — rehearsal round 5)
        n, v = config.clip.max_length, config.clip.vocab_size
        bos, eos = v - 2, v - 1
        body = [t % v for t in (320, 2368, 4919, 320)][: max(0, n - 2)]
        row = [bos] + body + [eos] * (n - 1 - len(body))
        ids = np.array([row], np.int32)
        with torch.no_grad():
            want = ref(torch.from_numpy(ids.astype(np.int64)))[0].numpy()
        got, _ = clip_encode(jnp.asarray(ids), params, config.clip)
        err = float(np.abs(np.asarray(got, np.float32) - want).max())
        ok = err < 1e-3
        return record("clip-parity", "PASS" if ok else "FAIL",
                      f"max abs err {err:.2e} vs transformers")
    except Exception as exc:
        return record("clip-parity", "FAIL", f"{type(exc).__name__}: {exc}")


def step_e2e_psnr(args):
    if not args.resolved_model_dir:
        return record("e2e-psnr", "SKIP", "no checkpoint")
    try:
        import diffusers  # noqa: F401
    except ImportError:
        return record(
            "e2e-psnr", "SKIP",
            "diffusers not installed — `pip install diffusers` then re-run; "
            "component-parity + clip-parity above bound the same error "
            "network-by-network in the meantime",
        )
    try:
        import numpy as np
        import torch
        from diffusers import DDIMScheduler, StableDiffusionPipeline

        from sdtpu.pipeline.pipeline import StableDiffusionPipeline as SDTPU
        from sdtpu.utils.image import psnr

        ref_pipe = StableDiffusionPipeline.from_pretrained(
            args.resolved_model_dir, torch_dtype=torch.float32,
            safety_checker=None, requires_safety_checker=False,
        )
        ref_pipe.scheduler = DDIMScheduler.from_config(
            ref_pipe.scheduler.config
        )
        prompt = "a cat flying a spaceship"  # the reference demo prompt
        g = torch.Generator().manual_seed(args.seed)
        want = ref_pipe(
            prompt, num_inference_steps=args.steps, guidance_scale=7.5,
            generator=g, output_type="np",
        ).images[0]

        ours = SDTPU.from_pretrained(
            args.resolved_model_dir, preset=args.preset, dtype=np.float32
        )
        got = ours.generate(
            prompt, num_inference_steps=args.steps, cfg=True, cfg_scale=7.5,
            seed=args.seed, rng="torch", sampler="ddim", output="float",
        )[0]
        # both in [-1, 1] float space (psnr's default data_range=2.0)
        score = psnr(
            np.asarray(got, np.float32),
            want.astype(np.float32) * 2.0 - 1.0,
        )
        ok = score >= 40.0
        return record("e2e-psnr", "PASS" if ok else "FAIL",
                      f"PSNR {score:.1f} dB vs fp32 diffusers "
                      f"(north star >= 40)")
    except Exception as exc:
        return record("e2e-psnr", "FAIL", f"{type(exc).__name__}: {exc}")


def step_int8_fidelity(args):
    """int8 (W8A8) conv quantization vs the bf16 pipeline ON REAL WEIGHTS —
    the absolute >= 40 dB gate that the offline environment cannot run
    honestly (random weights are chaotic: the bf16-vs-f32 control itself
    scores ~30 dB there; see tools/check_int8.py and BENCHLOG round 3)."""
    if not args.resolved_model_dir:
        return record("int8-fidelity", "SKIP", "no checkpoint")
    try:
        import numpy as np

        from sdtpu.pipeline.pipeline import StableDiffusionPipeline
        from sdtpu.utils.image import psnr
        from sdtpu.utils.quant import quantize_pipeline_int8

        pipe = StableDiffusionPipeline.from_pretrained(
            args.resolved_model_dir, preset=args.preset
        )
        kw = dict(num_inference_steps=args.steps, seed=args.seed,
                  sampler="ddim", output="float")
        want = pipe.generate("a cat flying a spaceship", **kw)
        qpipe = StableDiffusionPipeline(
            pipe.config, quantize_pipeline_int8(pipe.params),
            tokenizer=pipe.tokenizer,
        )
        got = qpipe.generate("a cat flying a spaceship", **kw)
        score = psnr(np.asarray(want, np.float32), np.asarray(got, np.float32))
        ok = score >= 40.0

        # calibrated "full" transformer variant (static scales for the
        # out-projections/GeGLU-down from a short real trajectory —
        # sdtpu/utils/calibrate.py); informational, gated on the same bar
        from sdtpu.utils.calibrate import calibrate_pipeline_act_ranges

        ids = np.asarray(
            [pipe.tokenizer.encode(
                "a cat flying a spaceship",
                max_length=pipe.config.text_config.max_length,
            )]
        )
        ranges = calibrate_pipeline_act_ranges(
            pipe, ids, num_steps=4, seed=args.seed
        )
        cpipe = StableDiffusionPipeline(
            pipe.config,
            quantize_pipeline_int8(pipe.params, transformer="full",
                                   act_ranges=ranges),
            tokenizer=pipe.tokenizer,
        )
        got_c = cpipe.generate("a cat flying a spaceship", **kw)
        score_c = psnr(np.asarray(want, np.float32),
                       np.asarray(got_c, np.float32))
        return record("int8-fidelity", "PASS" if ok else "FAIL",
                      f"int8 vs bf16 PSNR {score:.1f} dB on real weights "
                      f"(gate >= 40); calibrated-full variant "
                      f"{score_c:.1f} dB")
    except Exception as exc:
        return record("int8-fidelity", "FAIL",
                      f"{type(exc).__name__}: {exc}")


def step_feature_quality(args):
    """Round-3 quality features on REAL weights (VERDICT r3 item 8).

    Offline, these features are only testable for SEMANTICS (exact manual
    composition with random weights); their QUALITY is chaos-dominated
    there (the bf16-vs-f32 control itself reads ~30 dB — BENCHLOG round 3).
    With a checkpoint present this emits one verdict per feature:

      encoder-cache-quality — generate(encoder_cache_interval=k) for
        k=2,3 vs the exact k=1 image, same seed.  Gate: k=2 >= 20 dB and
        k=3 >= 16 dB PSNR (DeepCache-style reuse is a mild approximation;
        falling under these means the cached decode path is wrong, not
        merely lossy).
      guidance-features — PAG, FreeU, CFG-rescale each produce a finite,
        non-degenerate image that actually DIFFERS from baseline (the
        knob engaged) with pixel std in a sane band (not collapsed/blown).
    """
    if not args.resolved_model_dir:
        record("encoder-cache-quality", "SKIP", "no checkpoint")
        record("guidance-features", "SKIP", "no checkpoint")
        return
    import numpy as np

    from sdtpu.pipeline.pipeline import StableDiffusionPipeline
    from sdtpu.utils.image import psnr

    pipe = StableDiffusionPipeline.from_pretrained(
        args.resolved_model_dir, preset=args.preset
    )
    prompt = "a cat flying a spaceship"
    kw = dict(num_inference_steps=args.steps, seed=args.seed,
              sampler="ddim", output="float")
    base = np.asarray(pipe.generate(prompt, **kw), np.float32)

    try:
        scores = {
            k: psnr(base, np.asarray(
                pipe.generate(prompt, encoder_cache_interval=k, **kw),
                np.float32))
            for k in (2, 3)
        }
        ok = scores[2] >= 20.0 and scores[3] >= 16.0
        record("encoder-cache-quality", "PASS" if ok else "FAIL",
               f"PSNR vs k=1: k=2 {scores[2]:.1f} dB (gate >= 20), "
               f"k=3 {scores[3]:.1f} dB (gate >= 16)")
    except Exception as exc:
        record("encoder-cache-quality", "FAIL",
               f"{type(exc).__name__}: {exc}")

    try:
        feats = {
            "pag": dict(pag_scale=3.0),
            "freeu": dict(freeu=(1.2, 1.4, 0.9, 0.2)),
            "cfg-rescale": dict(guidance_rescale=0.7),
        }
        details, all_ok = [], True
        for name, extra in feats.items():
            img = np.asarray(pipe.generate(prompt, **extra, **kw),
                             np.float32)
            finite = bool(np.isfinite(img).all())
            engaged = float(np.abs(img - base).mean()) > 1e-3
            std = float(img.std())
            sane = 0.05 <= std <= 1.5  # [-1,1] space: not gray, not blown
            ok = finite and engaged and sane
            all_ok &= ok
            details.append(f"{name}: finite={finite} engaged={engaged} "
                           f"std={std:.3f}")
        record("guidance-features", "PASS" if all_ok else "FAIL",
               "; ".join(details))
    except Exception as exc:
        record("guidance-features", "FAIL", f"{type(exc).__name__}: {exc}")


def step_lora_ti(args):
    """LoRA fuse/unfuse and textual inversion on REAL adapter files
    (--lora / --ti): load reports >0 applied modules, the adapted image
    differs from baseline, and unload_loras restores the baseline image
    exactly (the snapshot-swap contract in pipeline.load_lora)."""
    if not args.resolved_model_dir:
        return record("lora-ti", "SKIP", "no checkpoint")
    if not args.lora and not args.ti:
        return record(
            "lora-ti", "SKIP",
            "no adapter files; pass --lora adapter.safetensors and/or "
            "--ti embedding.safetensors (any SD1.x kohya/diffusers LoRA "
            "or TI concept trained for this base model)",
        )
    import numpy as np

    from sdtpu.pipeline.pipeline import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained(
        args.resolved_model_dir, preset=args.preset
    )
    prompt = "a cat flying a spaceship"
    kw = dict(num_inference_steps=max(4, args.steps // 5), seed=args.seed,
              sampler="ddim", output="float")
    details, all_ok = [], True
    base = np.asarray(pipe.generate(prompt, **kw), np.float32)
    if args.lora:
        report = pipe.load_lora(args.lora, scale=0.8)
        adapted = np.asarray(pipe.generate(prompt, **kw), np.float32)
        restored_n = pipe.unload_loras()
        restored = np.asarray(pipe.generate(prompt, **kw), np.float32)
        ok = (
            report.get("applied", 0) > 0
            and np.isfinite(adapted).all()
            and float(np.abs(adapted - base).mean()) > 1e-4
            and np.allclose(restored, base, atol=1e-5)
        )
        all_ok &= ok
        details.append(
            f"lora: applied={report.get('applied')} "
            f"skipped={len(report.get('skipped', []))} "
            f"engaged={float(np.abs(adapted - base).mean()):.2e} "
            f"restored={restored_n} exact={np.allclose(restored, base, atol=1e-5)}"
        )
    if args.ti:
        registered = pipe.load_textual_inversion(args.ti)
        if not registered:
            all_ok = False
            details.append("ti: no placeholder registered")
        else:
            placeholder = next(iter(registered))
            img = np.asarray(
                pipe.generate(f"a photo of {placeholder}", **kw), np.float32
            )
            ok = bool(np.isfinite(img).all()) and len(
                registered[placeholder]) >= 1
            all_ok &= ok
            details.append(
                f"ti: {placeholder} -> {len(registered[placeholder])} "
                f"vector(s), finite={bool(np.isfinite(img).all())}"
            )
    return record("lora-ti", "PASS" if all_ok else "FAIL", "; ".join(details))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None,
                    help="local diffusers-layout checkpoint dir")
    ap.add_argument("--hf-model", default="segmind/tiny-sd")
    ap.add_argument("--preset", default=None,
                    help="preset override; default: infer the config from "
                         "the checkpoint's own JSON configs")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--seed", type=int, default=40)  # demo.mojo:10
    ap.add_argument("--lora", default=None,
                    help="real LoRA adapter .safetensors for the lora-ti step")
    ap.add_argument("--ti", default=None,
                    help="real textual-inversion embedding file for lora-ti")
    args = ap.parse_args()
    args.resolved_model_dir = None

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    for step in (step_tokenizer_assets, step_real_vocab_tests,
                 step_checkpoint, step_component_parity, step_clip_parity,
                 step_e2e_psnr, step_int8_fidelity, step_feature_quality,
                 step_lora_ti):
        try:
            step(args)
        except Exception as exc:  # a crashed step is a FAIL, not an abort
            record(step.__name__.replace("step_", "").replace("_", "-"),
                   "FAIL", f"harness error {type(exc).__name__}: {exc}")

    statuses = [r["status"] for r in RESULTS]
    if "FAIL" in statuses:
        overall = "FAIL"
    elif all(s == "SKIP" for s in statuses):
        overall = "blocked-offline"
    elif "SKIP" in statuses:
        overall = "partial"
    else:
        overall = "PASS"
    print(json.dumps({"status": overall, "steps": RESULTS}))
    sys.exit(1 if overall == "FAIL" else 0)


if __name__ == "__main__":
    main()
