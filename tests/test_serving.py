"""Micro-batching serving engine tests (tiny config, CPU)."""

import numpy as np
import pytest

from sdtpu.pipeline.pipeline import StableDiffusionPipeline
from sdtpu.pipeline.serving import ServingEngine

from test_pipeline import TINY

from conftest import assert_images_match

IDS = np.array([1, 5, 9, 2] + [0] * 12)


def assert_batch_invariant(a, b):
    """Batch-composition invariance, to the repo's documented scope: batch
    size changes XLA reduction tiling, so last-ulp float drift can move a
    pixel by one uint8 level (serving.py docstring; the thresholded
    tools/check_batch_invariance.py gate).  Bitwise where possible, but
    gate at <=1 level on <=3% of pixels rather than flake on rounding."""
    a = np.asarray(a, np.int16)
    b = np.asarray(b, np.int16)
    diff = np.abs(a - b)
    frac = float((diff != 0).mean())
    assert diff.max() <= 1 and frac <= 0.03, (
        f"max level {diff.max()}, {frac:.2%} pixels differ"
    )


@pytest.fixture(scope="module")
def pipe(tiny_pipe):
    return tiny_pipe


class TestPerRequestSeeds:
    def test_batch_composition_independence(self, pipe):
        """A request's image must not depend on its batch neighbours."""
        ids2 = np.stack([IDS, IDS])
        ids3 = np.stack([IDS, IDS, IDS])
        a = pipe.generate_batch(["x", "y"], token_ids=ids2,
                                num_inference_steps=2, seeds=[7, 8])
        b = pipe.generate_batch(["x", "y", "z"], token_ids=ids3,
                                num_inference_steps=2, seeds=[7, 9, 8])
        assert_images_match(a[0], b[0])  # seed 7 row identical
        assert_images_match(a[1], b[2])  # seed 8 row identical

    def test_seed_count_mismatch_raises(self, pipe):
        with pytest.raises(ValueError, match="seeds"):
            pipe.generate_batch(["x"], token_ids=IDS[None],
                                num_inference_steps=1, seeds=[1, 2])


class TestServingEngine:
    def test_batched_execution_and_results(self, pipe):
        engine = ServingEngine(pipe, max_batch_size=4, max_wait_ms=50)
        try:
            futures = [
                engine.submit("p", token_ids=IDS, seed=i,
                              num_inference_steps=2, image_size=32)
                for i in range(5)
            ]
            images = [f.result(timeout=300) for f in futures]
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert all(img.shape == (32, 32, 3) for img in images)
        # distinct seeds -> distinct images
        assert (images[0] != images[1]).any()
        # per-request latency percentiles (SURVEY.md §5 metrics row)
        assert 0 < stats["request_latency_p50_s"] <= stats["request_latency_p95_s"]

    def test_device_batch_size_chunks_match_full_batch(self, pipe):
        """device_batch_size splits a coalesced batch into several pipelined
        device programs; per-request RNG makes every row identical to the
        one-program run (bitwise on CPU at test dims)."""
        seeds = [7, 8, 9, 10]

        def run(**kw):
            engine = ServingEngine(pipe, max_batch_size=4, max_wait_ms=50,
                                   **kw)
            try:
                futs = [
                    engine.submit("p", token_ids=IDS, seed=s,
                                  num_inference_steps=2, image_size=32)
                    for s in seeds
                ]
                out = [f.result(300) for f in futs]
                stats = engine.stats()
            finally:
                engine.shutdown()
            return out, stats

        full, full_stats = run()
        chunked, chunk_stats = run(device_batch_size=2)
        for a, b in zip(full, chunked):
            assert_images_match(a, b)
        # the chunked run executed more (smaller) device programs
        assert chunk_stats["batches"] > full_stats["batches"]
        assert chunk_stats["requests"] == full_stats["requests"] == 4

    def test_device_batch_size_validates(self, pipe):
        with pytest.raises(ValueError, match="device_batch_size"):
            ServingEngine(pipe, device_batch_size=0)

    def test_same_seed_same_image_regardless_of_batching(self, pipe):
        engine = ServingEngine(pipe, max_batch_size=3, max_wait_ms=10)
        try:
            solo = engine.submit("p", token_ids=IDS, seed=42,
                                 num_inference_steps=2, image_size=32).result(300)
            futs = [
                engine.submit("p", token_ids=IDS, seed=s,
                              num_inference_steps=2, image_size=32)
                for s in (1, 42, 3)
            ]
            batched = [f.result(300) for f in futs]
        finally:
            engine.shutdown()
        assert_images_match(solo, batched[1])

    def test_error_resolves_future(self, pipe):
        engine = ServingEngine(pipe, max_batch_size=2, max_wait_ms=10)
        try:
            f = engine.submit("p", token_ids=IDS, seed=0,
                              num_inference_steps=1, image_size=30)  # invalid
            with pytest.raises(ValueError):
                f.result(timeout=300)
        finally:
            engine.shutdown()

    def test_transient_failure_retries_batch(self, pipe):
        """System errors (device reset, tunnel hiccup) retry the whole batch
        once; the request still succeeds (SURVEY.md §5 failure-recovery)."""

        class FlakyOnce:
            def __init__(self, inner):
                self.inner = inner
                self.config = inner.config
                self.calls = 0

            def generate_batch(self, *a, **kw):
                self.calls += 1
                if self.calls == 1:
                    raise RuntimeError("simulated transient device failure")
                return self.inner.generate_batch(*a, **kw)

        flaky = FlakyOnce(pipe)
        engine = ServingEngine(flaky, max_batch_size=2, max_wait_ms=10)
        try:
            img = engine.submit("p", token_ids=IDS, seed=5,
                                num_inference_steps=2,
                                image_size=32).result(300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert img.shape == (32, 32, 3)
        assert flaky.calls == 2
        assert stats["retries"] == 1
        assert stats["failures"] == 0

    def test_request_error_does_not_retry(self, pipe):
        """ValueError is deterministic: fail fast, no retry."""

        class Counting:
            def __init__(self, inner):
                self.inner = inner
                self.config = inner.config
                self.calls = 0

            def generate_batch(self, *a, **kw):
                self.calls += 1
                return self.inner.generate_batch(*a, **kw)

        counting = Counting(pipe)
        engine = ServingEngine(counting, max_batch_size=2, max_wait_ms=10)
        try:
            f = engine.submit("p", token_ids=IDS, seed=0,
                              num_inference_steps=1, image_size=30)
            with pytest.raises(ValueError):
                f.result(timeout=300)
        finally:
            engine.shutdown()
        assert counting.calls == 1

    def test_shutdown_rejects_new_requests(self, pipe):
        engine = ServingEngine(pipe, max_batch_size=2, max_wait_ms=10)
        engine.shutdown()
        with pytest.raises(RuntimeError):
            engine.submit("p", token_ids=IDS)


class TestNegativePrompts:
    """Requests with DIFFERENT negative prompts may coalesce into one batch
    and must each reproduce their solo-run image exactly (VERDICT round 1:
    the engine previously applied the first request's negative prompt to the
    whole batch)."""

    @pytest.fixture(scope="class")
    def tok_pipe(self, tmp_path_factory):
        import dataclasses

        from sdtpu.tokenizer.bpe import CLIPTokenizer
        from test_tokenizer import build_assets

        vocab_file, merges_file = build_assets(tmp_path_factory.mktemp("stok"))
        tok = CLIPTokenizer.from_files(vocab_file, merges_file)
        cfg = TINY.replace(
            clip=dataclasses.replace(TINY.clip, vocab_size=1024, max_length=16)
        )
        return StableDiffusionPipeline.from_random(cfg, seed=0, tokenizer=tok)

    def test_per_row_negative_prompts_in_generate_batch(self, tok_pipe):
        solo_a = tok_pipe.generate_batch(
            ["hello world"], negative_prompt="cat", seeds=[7],
            num_inference_steps=2)
        solo_b = tok_pipe.generate_batch(
            ["hello world"], negative_prompt="dog", seeds=[8],
            num_inference_steps=2)
        both = tok_pipe.generate_batch(
            ["hello world", "hello world"], negative_prompt=["cat", "dog"],
            seeds=[7, 8], num_inference_steps=2)
        assert_batch_invariant(both[0], solo_a[0])
        assert_batch_invariant(both[1], solo_b[0])
        # and different negatives actually change the image
        assert (both[0] != both[1]).any() or True  # seeds differ anyway
        same_seed = tok_pipe.generate_batch(
            ["hello world", "hello world"], negative_prompt=["cat", "dog"],
            seeds=[7, 7], num_inference_steps=2)
        assert (same_seed[0] != same_seed[1]).any()

    def test_engine_coalesces_distinct_negative_prompts(self, tok_pipe):
        engine = ServingEngine(tok_pipe, max_batch_size=2, max_wait_ms=100)
        try:
            solo_a = engine.submit("hello world", negative_prompt="cat",
                                   seed=7, num_inference_steps=2).result(300)
            solo_b = engine.submit("hello world", negative_prompt="dog",
                                   seed=8, num_inference_steps=2).result(300)
            fa = engine.submit("hello world", negative_prompt="cat",
                               seed=7, num_inference_steps=2)
            fb = engine.submit("hello world", negative_prompt="dog",
                               seed=8, num_inference_steps=2)
            a, b = fa.result(300), fb.result(300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert_batch_invariant(a, solo_a)
        assert_batch_invariant(b, solo_b)
        # the burst pair coalesced (not two singleton batches)
        assert stats["batches"] <= 3

    def test_negative_list_length_mismatch_raises(self, tok_pipe):
        with pytest.raises(ValueError, match="negative_prompt"):
            tok_pipe.generate_batch(
                ["a", "b"], negative_prompt=["x"], seeds=[1, 2],
                num_inference_steps=1)


class TestBatchingPolicy:
    def test_pushed_back_request_is_served(self, pipe):
        """A request parked for a different bucket must still be served (and
        not lose its queue position to later arrivals)."""
        engine = ServingEngine(pipe, max_batch_size=4, max_wait_ms=30)
        try:
            f1 = engine.submit("p", token_ids=IDS, seed=1,
                               num_inference_steps=2, image_size=32)
            f2 = engine.submit("p", token_ids=IDS, seed=2,
                               num_inference_steps=1, image_size=32)  # other bucket
            f3 = engine.submit("p", token_ids=IDS, seed=3,
                               num_inference_steps=2, image_size=32)
            imgs = [f.result(300) for f in (f1, f2, f3)]
        finally:
            engine.shutdown()
        assert all(img.shape == (32, 32, 3) for img in imgs)

    def test_clip_skip_requests_bucket_separately(self, pipe):
        """Per-request clip_skip picks a different compiled program, so it
        must split the batch; same seed+ids with and without skip differ."""
        engine = ServingEngine(pipe, max_batch_size=4, max_wait_ms=30)
        try:
            f1 = engine.submit("p", token_ids=IDS, seed=1,
                               num_inference_steps=2, image_size=32)
            f2 = engine.submit("p", token_ids=IDS, seed=1,
                               num_inference_steps=2, image_size=32,
                               clip_skip=1)
            a, b = f1.result(300), f2.result(300)
        finally:
            engine.shutdown()
        assert a.shape == b.shape == (32, 32, 3)
        assert not np.array_equal(a, b)

    def test_pag_requests_bucket_separately(self, pipe):
        """pag_scale compiles a third guidance branch into the program, so
        it must split the batch AND actually reach the images."""
        engine = ServingEngine(pipe, max_batch_size=4, max_wait_ms=30)
        try:
            f1 = engine.submit("p", token_ids=IDS, seed=1,
                               num_inference_steps=2, image_size=32)
            f2 = engine.submit("p", token_ids=IDS, seed=1,
                               num_inference_steps=2, image_size=32,
                               pag_scale=3.0)
            a, b = f1.result(300), f2.result(300)
        finally:
            engine.shutdown()
        assert a.shape == b.shape == (32, 32, 3)
        assert not np.array_equal(a, b)


class TestEngineImg2Img:
    def test_img2img_through_engine_matches_direct(self, pipe):
        rng = np.random.default_rng(3)
        init_a = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        init_b = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        direct = pipe.generate_batch(
            ["p"], token_ids=IDS[None], num_inference_steps=4, seeds=[5],
            init_images=[init_a], strength=0.5)
        engine = ServingEngine(pipe, max_batch_size=2, max_wait_ms=50)
        try:
            fa = engine.submit("p", token_ids=IDS, seed=5,
                               num_inference_steps=4, image_size=32,
                               init_image=init_a, strength=0.5)
            fb = engine.submit("p", token_ids=IDS, seed=6,
                               num_inference_steps=4, image_size=32,
                               init_image=init_b, strength=0.5)
            a, b = fa.result(300), fb.result(300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert_images_match(a, direct[0])
        assert (a != b).any()  # distinct inits -> distinct images
        assert stats["batches"] <= 2  # same bucket -> coalesced

    def test_inpaint_through_engine_matches_direct(self, pipe):
        rng = np.random.default_rng(7)
        init = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        mask = np.zeros((32, 32), dtype=np.uint8)
        mask[:, 16:] = 255
        direct = pipe.generate_batch(
            ["p"], token_ids=IDS[None], num_inference_steps=3, seeds=[5],
            init_images=[init], mask_images=[mask], strength=1.0)
        engine = ServingEngine(pipe, max_batch_size=2, max_wait_ms=50)
        try:
            fa = engine.submit("p", token_ids=IDS, seed=5,
                               num_inference_steps=3, image_size=32,
                               init_image=init, mask_image=mask,
                               strength=1.0)
            # masked and unmasked img2img must NOT share a program bucket
            fb = engine.submit("p", token_ids=IDS, seed=5,
                               num_inference_steps=3, image_size=32,
                               init_image=init, strength=1.0)
            a, b = fa.result(300), fb.result(300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert_images_match(a, direct[0])
        assert stats["batches"] == 2  # different buckets

    def test_cancelled_future_does_not_poison_batch(self, pipe):
        """A client-cancelled request must not fail or re-run its batch:
        other rows still get their images, no retries/failures counted."""
        engine = ServingEngine(pipe, max_batch_size=2, max_wait_ms=2000)
        try:
            fa = engine.submit("p", token_ids=IDS, seed=1,
                               num_inference_steps=2, image_size=32)
            assert fa.cancel()  # worker is still waiting for a batch mate
            fb = engine.submit("p", token_ids=IDS, seed=2,
                               num_inference_steps=2, image_size=32)
            img = fb.result(timeout=300)
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert img.shape == (32, 32, 3)
        assert stats["failures"] == 0
        assert stats["retries"] == 0

    def test_mask_without_init_rejected_at_submit(self, pipe):
        engine = ServingEngine(pipe, max_batch_size=1, max_wait_ms=10)
        try:
            with pytest.raises(ValueError, match="init_image"):
                engine.submit("p", token_ids=IDS,
                              mask_image=np.zeros((32, 32), dtype=np.uint8))
        finally:
            engine.shutdown()

    def test_img2img_and_txt2img_do_not_coalesce(self, pipe):
        """Different program shapes must land in different buckets."""
        rng = np.random.default_rng(4)
        init = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        engine = ServingEngine(pipe, max_batch_size=4, max_wait_ms=30)
        try:
            f1 = engine.submit("p", token_ids=IDS, seed=1,
                               num_inference_steps=4, image_size=32,
                               init_image=init, strength=0.5)
            f2 = engine.submit("p", token_ids=IDS, seed=2,
                               num_inference_steps=4, image_size=32)
            imgs = [f.result(300) for f in (f1, f2)]
            stats = engine.stats()
        finally:
            engine.shutdown()
        assert all(i.shape == (32, 32, 3) for i in imgs)
        assert stats["batches"] == 2


class TestBatchedImg2Img:
    def test_generate_batch_img2img(self, pipe):
        rng = np.random.default_rng(0)
        inits = [rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                 for _ in range(2)]
        ids2 = np.stack([IDS, IDS])
        imgs = pipe.generate_batch(
            ["x", "y"], token_ids=ids2, num_inference_steps=4,
            seeds=[1, 2], init_images=inits, strength=0.5,
        )
        assert imgs.shape == (2, 32, 32, 3)

    def test_img2img_per_request_independence(self, pipe):
        rng = np.random.default_rng(0)
        init = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ids2 = np.stack([IDS, IDS])
        ids3 = np.stack([IDS, IDS, IDS])
        a = pipe.generate_batch(["x", "y"], token_ids=ids2,
                                num_inference_steps=4, seeds=[5, 6],
                                init_images=[init, init], strength=0.5)
        b = pipe.generate_batch(["x", "y", "z"], token_ids=ids3,
                                num_inference_steps=4, seeds=[9, 5, 6],
                                init_images=[init, init, init], strength=0.5)
        assert_images_match(a[0], b[1])
        assert_images_match(a[1], b[2])

    def test_invalid_strength_raises(self, pipe):
        with pytest.raises(ValueError, match="strength"):
            pipe.generate_batch(
                ["x"], token_ids=IDS[None], init_images=[np.zeros((32, 32, 3))],
                strength=2.0,
            )


class TestWarmup:
    def test_warmup_precompiles_buckets(self, pipe):
        n_before = len(pipe._compiled)
        n = pipe.warmup(image_sizes=(32,), step_counts=(1, 2), batch_sizes=(2,))
        assert n == 2
        assert len(pipe._compiled) >= n_before  # buckets materialized
        # a subsequent matching request reuses the compiled program
        ids = np.stack([IDS, IDS])
        n_cached = len(pipe._compiled)
        pipe.generate_batch(["a", "b"], token_ids=ids, num_inference_steps=2,
                            image_size=32, seeds=[1, 2])
        assert len(pipe._compiled) == n_cached


class TestStats:
    def test_counters(self, pipe):
        engine = ServingEngine(pipe, max_batch_size=4, max_wait_ms=30)
        try:
            futs = [engine.submit("p", token_ids=IDS, seed=i,
                                  num_inference_steps=2, image_size=32)
                    for i in range(3)]
            [f.result(300) for f in futs]
            s = engine.stats()
        finally:
            engine.shutdown()
        assert s["requests"] == 3
        assert s["batches"] >= 1
        assert s["failures"] == 0
        assert s["mean_batch_size"] > 0
        assert s["mean_batch_latency_s"] > 0
