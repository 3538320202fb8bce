"""Micro-batching serving engine (large-batch few-step serving, BASELINE
config 5).

The reference is a one-shot CLI hardwired to batch 1 (``pipeline.mojo:12``);
production TPU serving wants requests coalesced into device-efficient
batches.  :class:`ServingEngine` runs a background collator thread: requests
sharing a compilation bucket (image size, steps, sampler, cfg) are batched up
to ``max_batch_size`` or until ``max_wait_ms`` passes, executed as ONE
CFG-batched program, and resolved to per-request futures.  Per-request RNG
keys make each row's output independent of batch composition (a request
returns the same image whether it shared a batch or not).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import List, Optional

import numpy as np


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

    @property
    def bucket(self):
        return (self.image_size, self.steps, self.sampler, self.cfg,
                round(self.cfg_scale, 6))


class ServingEngine:
    """Threaded micro-batcher over a :class:`StableDiffusionPipeline`."""

    def __init__(
        self,
        pipeline,
        *,
        max_batch_size: int = 8,
        max_wait_ms: float = 20.0,
    ):
        self.pipeline = pipeline
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._shutdown = threading.Event()
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0,
            "batches": 0,
            "failures": 0,
            "batch_seconds": 0.0,
        }
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def stats(self) -> dict:
        """Serving counters (SURVEY.md §5 metrics row): requests served,
        batches executed, mean batch occupancy/latency, failures."""
        with self._lock:
            s = dict(self._stats)
        s["mean_batch_size"] = s["requests"] / s["batches"] if s["batches"] else 0.0
        s["mean_batch_latency_s"] = (
            s["batch_seconds"] / s["batches"] if s["batches"] else 0.0
        )
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
        num_inference_steps: int = 25,
        sampler: str = "ddpm",
        cfg: bool = True,
        cfg_scale: float = 7.5,
    ) -> Future:
        """Enqueue one txt2img request; resolves to an (H, W, 3) uint8 image."""
        if self._shutdown.is_set():
            raise RuntimeError("engine is shut down")
        req = _Request(
            prompt=prompt,
            negative_prompt=negative_prompt,
            seed=seed,
            token_ids=token_ids,
            future=Future(),
            image_size=image_size or self.pipeline.config.default_image_size,
            steps=num_inference_steps,
            sampler=sampler,
            cfg=cfg,
            cfg_scale=cfg_scale,
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

    def _collect_batch(self) -> List[_Request]:
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = threading.Event()
        # gather same-bucket requests until full or the wait window closes
        timeout = self.max_wait_ms / 1000.0
        while len(batch) < self.max_batch_size:
            try:
                req = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if req.bucket == first.bucket:
                batch.append(req)
            else:
                # different bucket: push back and flush the current batch
                self._queue.put(req)
                break
        del deadline
        return batch

    def _run(self) -> None:
        while not (self._shutdown.is_set() and self._queue.empty()):
            batch = self._collect_batch()
            if not batch:
                continue
            first = batch[0]
            import time as _time

            t0 = _time.perf_counter()
            try:
                if any(r.token_ids is None for r in batch):
                    prompts = [r.prompt for r in batch]
                    token_ids = None
                else:
                    prompts = [r.prompt for r in batch]
                    token_ids = np.stack([np.asarray(r.token_ids) for r in batch])
                images = self.pipeline.generate_batch(
                    prompts,
                    negative_prompt=first.negative_prompt,
                    cfg=first.cfg,
                    cfg_scale=first.cfg_scale,
                    num_inference_steps=first.steps,
                    seeds=[r.seed for r in batch],
                    image_size=first.image_size,
                    token_ids=token_ids,
                    sampler=first.sampler,
                )
                for i, req in enumerate(batch):
                    req.future.set_result(images[i])
                with self._lock:
                    self._stats["requests"] += len(batch)
                    self._stats["batches"] += 1
                    self._stats["batch_seconds"] += _time.perf_counter() - t0
            except Exception as exc:  # resolve, don't kill the worker
                with self._lock:
                    self._stats["failures"] += len(batch)
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(exc)
