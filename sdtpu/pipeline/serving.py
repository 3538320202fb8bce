"""Micro-batching serving engine (large-batch few-step serving, BASELINE
config 5).

The reference is a one-shot CLI hardwired to batch 1 (``pipeline.mojo:12``);
production TPU serving wants requests coalesced into device-efficient
batches.  :class:`ServingEngine` runs a background collator thread: requests
sharing a compilation bucket (image size, steps, sampler, cfg[, img2img
strength]) are batched up to ``max_batch_size`` or until one GLOBAL
``max_wait_ms`` window passes, executed as ONE CFG-batched program, and
resolved to per-request futures.  Per-request RNG keys and per-row negative
prompts make each row's output independent of batch composition (a request
returns the same image whether it shared a batch or not).  Precise scope of
that guarantee: the MATH is row-independent (pinned bitwise by the CPU
suite, tests/test_serving.py); on TPU at real dims, XLA picks
batch-size-dependent matmul/conv tilings whose accumulation order drifts
the uint8 output by at most +-1 level on a few percent of pixels —
measured, form-independent, and quantified by
``tools/check_batch_invariance.py`` (BENCHLOG round 3).  Weighted-prompt
rows (``token_weights``/``prompt_weighting``) carry the same +-1-level
scope on every backend: the renormalization ratio's reduction is compiled
per batch shape, so its low bits are batch-dependent.

The worker keeps TWO batches in flight: batch N+1 is collected and
dispatched (un-fetched device output) while batch N computes, hiding host
batching/relay latency behind device time.  Transient system errors retry a
batch once; deterministic request errors fail fast.
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional

import numpy as np

_FAILED = object()  # dispatch sentinel: batch already resolved with an error

# Default rows per device program (see ServingEngine.device_batch_size);
# importers (bench.py warmup) must stay in sync with the engine default.
DEFAULT_DEVICE_BATCH = 4


@dataclasses.dataclass
class _Request:
    prompt: str
    negative_prompt: str
    seed: int
    token_ids: Optional[np.ndarray]
    future: Future
    # compilation bucket
    image_size: int
    steps: int
    sampler: str
    cfg: bool
    cfg_scale: float
    # img2img: init image (any HxWx3; resized host-side) + strength;
    # inpainting adds a mask (white/1.0 = repaint)
    init_image: Optional[np.ndarray] = None
    mask_image: Optional[np.ndarray] = None
    strength: float = 0.9
    # InstructPix2Pix editing models: the third guidance branch's scale
    # (traced, but ONE value per batch -> it buckets)
    image_guidance_scale: float = 1.5
    # CFG-rescale (Lin et al. 2023) — compiled into the program, so buckets
    guidance_rescale: float = 0.0
    # Perturbed-Attention Guidance — adds a third guidance branch, so it
    # compiles a different program and buckets
    pag_scale: float = 0.0
    # FreeU (b1, b2, s1, s2) — compiled into the program, so buckets
    freeu: Optional[tuple] = None
    clip_skip: int = 0
    # prompt emphasis: parse (word:1.3) syntax per row, or pre-tokenized
    # per-token weights aligned with token_ids
    prompt_weighting: bool = False
    token_weights: Optional[np.ndarray] = None
    # ControlNet: per-row control map (requires pipeline.load_controlnet);
    # the scale is ONE traced scalar per batch, so it buckets
    control_image: Optional[np.ndarray] = None
    controlnet_scale: float = 1.0
    # encoder-feature reuse interval (compiles a different program)
    encoder_cache_interval: int = 1
    # long prompts chunk into n CLIP windows (bpe.py:encode_long); rows with
    # different window counts must not coalesce — the padded empty windows
    # would otherwise make a row's context depend on batch composition
    n_windows: int = 1
    t_submit: float = 0.0  # monotonic enqueue time (latency percentiles)

    @property
    def bucket(self):
        # negative_prompt is deliberately NOT here: rows with different
        # negative prompts coalesce safely because generate_batch takes a
        # per-row uncond list (one CLIP row per request).  Init-image and
        # mask CONTENT aren't either (host-resized, per-row inputs); the
        # has-mask FLAG and strength are — they pick the compiled program.
        img2img = self.init_image is not None
        # weighted rows compile a different program (the per-token scale is
        # traced in), and prompt_weighting vs token_weights feed
        # generate_batch differently — three mutually-exclusive modes
        weighting = (
            "pw" if self.prompt_weighting
            else "tw" if self.token_weights is not None
            else None
        )
        return (self.image_size, self.steps, self.sampler, self.cfg,
                round(self.cfg_scale, 6), img2img,
                self.mask_image is not None,
                round(self.strength, 6) if img2img else None,
                round(self.image_guidance_scale, 6) if img2img else None,
                round(self.guidance_rescale, 6),
                round(self.pag_scale, 6),
                (tuple(round(float(v), 6) for v in self.freeu)
                 if self.freeu is not None else None),
                self.clip_skip, weighting,
                # control CONTENT is per-row; the scale(s) are batch-level
                # (traced scalars feed the whole program); multi-ControlNet
                # requests carry one scale per net
                (tuple(
                    round(s, 6)
                    for s in (
                        self.controlnet_scale
                        if isinstance(self.controlnet_scale, (list, tuple))
                        else [self.controlnet_scale]
                    )
                ) if self.control_image is not None else None),
                self.n_windows, self.encoder_cache_interval)


class ServingEngine:
    """Threaded micro-batcher over a :class:`StableDiffusionPipeline`."""

    def __init__(
        self,
        pipeline,
        *,
        max_batch_size: int = 8,
        max_wait_ms: float = 20.0,
        max_retries: int = 1,
        device_batch_size: Optional[int] = DEFAULT_DEVICE_BATCH,
        mesh=None,
    ):
        self.pipeline = pipeline
        self.max_batch_size = max_batch_size
        # Scale-out: a ``jax.sharding.Mesh`` with a "dp" axis shards every
        # device chunk's batch over data-parallel devices (the chunk size
        # must divide by the dp axis — callers pick device_batch_size as a
        # multiple of dp).  Per-request RNG keys keep each row's image
        # independent of batch composition, so a dp-sharded engine returns
        # the same images as a single-device one (tests/test_parallel.py).
        self.mesh = mesh
        # Rows per DEVICE program.  Coalescing (max_batch_size) bounds
        # queueing/multiplexing; the device batch bounds the compiled
        # program's shape.  The chip saturates at tiny batches for
        # full-quality work (BENCHLOG batch-scaling), so a collected batch
        # of 8 can run as e.g. 2 pipelined 4-row programs with LOWER
        # per-request latency at equal-or-better throughput.  None = one
        # program per collected batch (the round-3 behavior).  Default 4
        # from the round-4 same-process A/B (BENCHLOG): best few-step
        # throughput (LCM engine 17.2 vs 16.0 img/s whole-batch-8), within
        # 1% of best on 25-step tiny-sd, and 16-23% lower p50 request
        # latency — and >= the single-shot stream on both workloads.
        if device_batch_size is not None and device_batch_size < 1:
            raise ValueError("device_batch_size must be >= 1")
        self.device_batch_size = device_batch_size
        self.max_wait_ms = max_wait_ms
        # transient-failure recovery: system errors (device resets, tunnel
        # hiccups) retry the whole batch; request errors (ValueError /
        # TypeError) never retry — they are deterministic
        self.max_retries = max_retries
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._pending: "collections.deque[_Request]" = collections.deque()
        self._shutdown = threading.Event()
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0,
            "batches": 0,
            "failures": 0,
            "retries": 0,
            "batch_seconds": 0.0,
        }
        # rolling per-request submit->resolve latencies (p50/p95 in stats())
        self._latencies: "collections.deque[float]" = collections.deque(
            maxlen=1024
        )
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def stats(self) -> dict:
        """Serving counters (SURVEY.md §5 metrics row): requests served,
        batches executed, mean batch occupancy/latency, failures."""
        with self._lock:  # one acquisition: a consistent snapshot
            s = dict(self._stats)
            lat = sorted(self._latencies)
        s["mean_batch_size"] = s["requests"] / s["batches"] if s["batches"] else 0.0
        s["mean_batch_latency_s"] = (
            s["batch_seconds"] / s["batches"] if s["batches"] else 0.0
        )
        if lat:
            s["request_latency_p50_s"] = lat[len(lat) // 2]
            s["request_latency_p95_s"] = lat[min(len(lat) - 1,
                                                 int(len(lat) * 0.95))]
        return s

    # -- client API ----------------------------------------------------------

    def submit(
        self,
        prompt: str,
        *,
        negative_prompt: str = "",
        seed: int = 0,
        token_ids: Optional[np.ndarray] = None,
        image_size: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        sampler: Optional[str] = None,
        cfg: Optional[bool] = None,
        cfg_scale: Optional[float] = None,
        init_image: Optional[np.ndarray] = None,
        mask_image: Optional[np.ndarray] = None,
        strength: float = 0.9,
        clip_skip: int = 0,
        prompt_weighting: bool = False,
        token_weights: Optional[np.ndarray] = None,
        control_image: Optional[np.ndarray] = None,
        controlnet_scale: float = 1.0,
        image_guidance_scale: float = 1.5,
        guidance_rescale: float = 0.0,
        pag_scale: float = 0.0,
        freeu: Optional[tuple] = None,
        encoder_cache_interval: int = 1,
    ) -> Future:
        """Enqueue one txt2img (or img2img when ``init_image`` is given, or
        inpainting when ``mask_image`` too) request; resolves to an
        (H, W, 3) uint8 image.  Unset knobs resolve to the pipeline preset's
        defaults HERE so the compilation bucket is well-defined."""
        if self._shutdown.is_set():
            raise RuntimeError("engine is shut down")
        if mask_image is not None and init_image is None:
            raise ValueError("mask_image requires init_image (inpainting)")
        if control_image is not None and (
            getattr(self.pipeline, "controlnet", None) is None
        ):
            raise ValueError(
                "control_image requires a ControlNet — call "
                "pipeline.load_controlnet(...) first"
            )
        config = self.pipeline.config
        # long-prompt window count (the compilation-bucket dimension): a
        # request's rows chunk to max(prompt, negative prompt) windows
        tok = getattr(self.pipeline, "tokenizer", None)
        w = config.text_config.max_length
        use_cfg = config.default_cfg if cfg is None else cfg
        if token_ids is not None:
            n_windows = max(1, np.asarray(token_ids).shape[-1] // w)
        elif tok is None:
            n_windows = 1
        elif prompt_weighting:
            texts = [prompt] + ([negative_prompt] if use_cfg else [])
            n_windows = max(
                len(tok.encode_weighted_long(t, window=w)[0]) // w
                for t in texts
            )
        else:
            texts = [prompt] + ([negative_prompt] if use_cfg else [])
            n_windows = max(tok.num_windows(t, window=w) for t in texts)
        req = _Request(
            prompt=prompt,
            negative_prompt=negative_prompt,
            seed=seed,
            token_ids=token_ids,
            future=Future(),
            image_size=image_size or config.default_image_size,
            steps=(
                config.default_steps
                if num_inference_steps is None
                else num_inference_steps
            ),
            sampler=sampler or config.default_sampler,
            cfg=config.default_cfg if cfg is None else cfg,
            cfg_scale=(
                config.default_cfg_scale if cfg_scale is None else cfg_scale
            ),
            init_image=init_image,
            mask_image=mask_image,
            strength=strength,
            image_guidance_scale=image_guidance_scale,
            guidance_rescale=guidance_rescale,
            pag_scale=pag_scale,
            freeu=freeu,
            clip_skip=clip_skip,
            prompt_weighting=prompt_weighting,
            token_weights=token_weights,
            control_image=control_image,
            controlnet_scale=controlnet_scale,
            encoder_cache_interval=encoder_cache_interval,
            n_windows=n_windows,
            t_submit=time.monotonic(),
        )
        self._queue.put(req)
        return req.future

    def generate(self, prompt: str, **kw) -> np.ndarray:
        return self.submit(prompt, **kw).result()

    def shutdown(self, wait: bool = True) -> None:
        self._shutdown.set()
        if wait:
            self._worker.join(timeout=60)

    # -- worker ---------------------------------------------------------------

    def _collect_batch(self, initial_timeout: float = 0.1) -> List[_Request]:
        # _pending holds requests already dequeued but not yet served
        # (different bucket than an earlier batch) — they keep their arrival
        # order and are always considered before new queue items.
        if self._pending:
            first = self._pending.popleft()
        else:
            try:
                if initial_timeout <= 0:
                    first = self._queue.get_nowait()
                else:
                    first = self._queue.get(timeout=initial_timeout)
            except queue.Empty:
                return []
        batch = [first]
        # sweep already-waiting same-bucket requests (in arrival order)
        remaining = collections.deque()
        for req in self._pending:
            if len(batch) < self.max_batch_size and req.bucket == first.bucket:
                batch.append(req)
            else:
                remaining.append(req)
        self._pending = remaining
        # one GLOBAL deadline for the whole batch window (not re-armed per
        # item — worst-case extra queueing is max_wait_ms, period)
        deadline = time.monotonic() + self.max_wait_ms / 1000.0
        while len(batch) < self.max_batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                req = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if req.bucket == first.bucket:
                batch.append(req)
            else:
                # different bucket: park it (keeps its position for the next
                # batch) and keep waiting for this bucket until the deadline
                self._pending.append(req)
        return batch

    def _gen_kwargs(self, batch: List[_Request]) -> tuple:
        first = batch[0]
        if any(r.token_ids is None for r in batch):
            token_ids = None
        else:
            token_ids = np.stack([np.asarray(r.token_ids) for r in batch])
        kw = dict(
            encoder_cache_interval=first.encoder_cache_interval,
            negative_prompt=[r.negative_prompt for r in batch],
            cfg=first.cfg,
            cfg_scale=first.cfg_scale,
            num_inference_steps=first.steps,
            seeds=[r.seed for r in batch],
            image_size=first.image_size,
            token_ids=token_ids,
            sampler=first.sampler,
            clip_skip=first.clip_skip,
            guidance_rescale=first.guidance_rescale,
            pag_scale=first.pag_scale,
            freeu=first.freeu,
        )
        if self.mesh is not None:
            kw["mesh"] = self.mesh
        if first.prompt_weighting:
            kw["prompt_weighting"] = True
        elif first.token_weights is not None:
            # same bucket -> every row carries weights (and token_ids)
            kw["token_weights"] = np.stack(
                [np.asarray(r.token_weights, np.float32) for r in batch]
            )
        if first.init_image is not None:
            kw["init_images"] = [r.init_image for r in batch]
            kw["strength"] = first.strength
            kw["image_guidance_scale"] = first.image_guidance_scale
            if first.mask_image is not None:
                kw["mask_images"] = [r.mask_image for r in batch]
        if first.control_image is not None:
            kw["control_images"] = [r.control_image for r in batch]
            kw["controlnet_scale"] = first.controlnet_scale
        return [r.prompt for r in batch], kw

    def _dispatch(self, batch: List[_Request]):
        """Launch a batch WITHOUT blocking on the result (output='device'):
        the device computes while the worker collects/serves the next batch.
        Returns the in-flight device array; None defers to a synchronous
        retry at resolve time (transient errors); deterministic request
        errors fail the batch's futures immediately (returns _FAILED)."""
        try:
            prompts, kw = self._gen_kwargs(batch)
            return self.pipeline.generate_batch(prompts, output="device", **kw)
        except (ValueError, TypeError) as exc:  # deterministic: no retry
            with self._lock:
                self._stats["failures"] += len(batch)
            for req in batch:
                if not req.future.done():
                    req.future.set_exception(exc)
            return _FAILED
        except Exception:
            with self._lock:  # transient dispatch failure -> sync retry
                self._stats["retries"] += 1
            return None

    def _resolve(self, batch: List[_Request], dev, t0) -> None:
        if dev is not None:
            try:
                images = np.asarray(dev)
                now = time.monotonic()
                for i, req in enumerate(batch):
                    if not req.future.done():  # client may have cancelled
                        req.future.set_result(images[i])
                with self._lock:
                    self._latencies.extend(now - r.t_submit for r in batch)
                    self._stats["requests"] += len(batch)
                    self._stats["batches"] += 1
                    self._stats["batch_seconds"] += time.perf_counter() - t0
                return
            except Exception:
                with self._lock:
                    self._stats["retries"] += 1
        self._execute_sync(batch, t0)

    def _execute_sync(self, batch: List[_Request], t0) -> None:
        """Synchronous execution with the retry policy: transient system
        errors retry the whole batch; deterministic request errors
        (ValueError/TypeError) fail fast."""
        prompts, kw = self._gen_kwargs(batch)
        for attempt in range(self.max_retries + 1):
            try:
                images = self.pipeline.generate_batch(prompts, **kw)
                now = time.monotonic()
                for i, req in enumerate(batch):
                    if not req.future.done():  # client may have cancelled
                        req.future.set_result(images[i])
                with self._lock:
                    self._latencies.extend(now - r.t_submit for r in batch)
                    self._stats["requests"] += len(batch)
                    self._stats["batches"] += 1
                    self._stats["batch_seconds"] += time.perf_counter() - t0
                return
            except Exception as exc:  # resolve, don't kill the worker
                deterministic = isinstance(exc, (ValueError, TypeError))
                if not deterministic and attempt < self.max_retries:
                    with self._lock:
                        self._stats["retries"] += 1
                    continue  # transient system error: retry the batch
                with self._lock:
                    self._stats["failures"] += len(batch)
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(exc)
                return

    def _run(self) -> None:
        # Up to two device programs in flight: while one computes, the
        # worker collects and DISPATCHES the next, then blocks fetching the
        # oldest — host-side batching/fetch overhead hides behind device
        # compute.  A collected batch larger than device_batch_size is
        # dispatched as several back-to-back device programs (chunks keep
        # arrival order; per-request RNG makes rows chunking-independent).
        inflight = collections.deque()  # (chunk, device_images_or_None, t0)
        while True:
            drained = (
                self._shutdown.is_set()
                and self._queue.empty()
                and not self._pending
            )
            if drained and not inflight:
                break
            batch = (
                []
                if drained
                else self._collect_batch(
                    initial_timeout=0.0 if inflight else 0.1
                )
            )
            db = self.device_batch_size or self.max_batch_size
            if not batch:
                if inflight:
                    self._resolve(*inflight.popleft())
                continue
            for i in range(0, len(batch), db):
                t0 = time.perf_counter()
                chunk = batch[i:i + db]
                dev = self._dispatch(chunk)
                if dev is not _FAILED:
                    inflight.append((chunk, dev, t0))
                while len(inflight) > 2:
                    self._resolve(*inflight.popleft())
            while len(inflight) > 1:
                self._resolve(*inflight.popleft())
