"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4:
the TPU analogue of testing multi-node without a cluster).

Checks that (a) tp-sharded attention/MLP params produce the same numbers as
the replicated run (GSPMD inserts the psums), (b) dp batch sharding of the
full pipeline matches single-device output, (c) the driver's
``dryrun_multichip`` contract holds.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sdtpu.parallel import make_mesh, replicate, shard_batch, shard_params_tp, tp_spec_for

from conftest import assert_allclose

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(4, 2)
        assert mesh.axis_names == ("dp", "tp")
        assert mesh.devices.shape == (4, 2)

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(16, 2)


class TestTpSpecs:
    def test_column_and_row_rules(self):
        q_kernel = np.zeros((32, 32))
        assert tp_spec_for(
            (jax.tree_util.DictKey("attn"), jax.tree_util.DictKey("q"),
             jax.tree_util.DictKey("kernel")), q_kernel
        ) == P(None, "tp")
        out_kernel = np.zeros((32, 32))
        assert tp_spec_for(
            (jax.tree_util.DictKey("attn"), jax.tree_util.DictKey("out"),
             jax.tree_util.DictKey("kernel")), out_kernel
        ) == P("tp", None)
        conv = np.zeros((3, 3, 8, 8))
        assert tp_spec_for(
            (jax.tree_util.DictKey("conv1"), jax.tree_util.DictKey("kernel")),
            conv,
        ) == P()

    def test_stacked_clip_layers_get_trailing_tp(self):
        stacked = np.zeros((12, 32, 32))
        spec = tp_spec_for(
            (jax.tree_util.DictKey("layers"), jax.tree_util.DictKey("mlp"),
             jax.tree_util.DictKey("fc1"), jax.tree_util.DictKey("kernel")),
            stacked,
        )
        assert spec == P(None, None, "tp")


class TestTpNumerics:
    def test_tp_attention_matches_replicated(self, rng):
        from sdtpu.ops import attention, init_attention

        mesh = make_mesh(1, 4)
        params = init_attention(jax.random.key(0), 64)
        x = jnp.array(rng.standard_normal((2, 16, 64), dtype=np.float32))

        expected = attention(x, params, num_heads=4)

        with mesh:
            sharded = shard_params_tp(params, mesh)
            xs = jax.device_put(x, NamedSharding(mesh, P()))
            got = jax.jit(lambda p, a: attention(a, p, num_heads=4))(sharded, xs)
        assert_allclose(got, expected, atol=1e-5, rtol=1e-5)

    def test_tp_transformer_block_matches_replicated(self, rng):
        from sdtpu.ops import init_transformer_block, transformer_block

        mesh = make_mesh(2, 2)
        params = init_transformer_block(jax.random.key(0), 32, context_dim=24)
        x = jnp.array(rng.standard_normal((4, 16, 32), dtype=np.float32))
        ctx = jnp.array(rng.standard_normal((4, 7, 24), dtype=np.float32))

        expected = transformer_block(x, params, num_heads=2, context=ctx)

        with mesh:
            sharded = shard_params_tp(params, mesh)
            xs = shard_batch(x, mesh)
            ctxs = shard_batch(ctx, mesh)
            got = jax.jit(
                lambda p, a, c: transformer_block(a, p, num_heads=2, context=c)
            )(sharded, xs, ctxs)
        assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


class TestDpPipeline:
    def test_dp_unet_matches_single_device(self, rng):
        from sdtpu.config import UNetConfig
        from sdtpu.models.unet import init_unet, unet_forward

        cfg = UNetConfig(
            block_out_channels=(16, 24, 32),
            layers_per_block=1,
            attention_levels=(True, True, True),
            num_attention_heads=2,
            cross_attention_dim=16,
            norm_num_groups=8,
        )
        params = init_unet(0, cfg)
        x = jnp.array(rng.standard_normal((8, 16, 16, 4), dtype=np.float32))
        ts = jnp.full((8,), 100.0)
        ctx = jnp.array(rng.standard_normal((8, 7, 16), dtype=np.float32))

        expected = unet_forward(x, ts, ctx, params, cfg)

        mesh = make_mesh(8, 1)
        with mesh:
            ps = replicate(params, mesh)
            got = jax.jit(lambda p, a, t, c: unet_forward(a, t, c, p, cfg))(
                ps, shard_batch(x, mesh), shard_batch(ts, mesh),
                shard_batch(ctx, mesh),
            )
        assert_allclose(got, expected, atol=1e-4, rtol=1e-3)


class TestDryrun:
    @pytest.mark.slow
    def test_dryrun_multichip_8(self):
        """The full driver artifact (~90 s on this host) — slow/opt-in: the
        driver runs the same code every round, and the per-family sharded
        parity lives in TestShardedFamilies below."""
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)

    def test_entry_is_jittable_tiny(self):
        """entry() returns (fn, args); compile-check its abstract shape only
        (full Tiny-SD compile is the driver's job on real hardware)."""
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.eval_shape(fn, *args)
        assert out.shape == (2, 64, 64, 4)


class TestRingAttention:
    def test_matches_dense_attention(self, rng):
        """Sequence-sharded ring attention over 8 devices == dense."""
        from sdtpu.ops.attention import _xla_attention
        from sdtpu.parallel.ring_attention import ring_attention

        mesh = make_mesh(8, 1)
        b, l, h, d = 2, 64, 2, 16  # L divides 8
        q = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        k = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        v = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        expected = _xla_attention(q, k, v, causal=False)
        got = ring_attention(q, k, v, mesh, axis_name="dp")
        assert_allclose(got, expected, atol=1e-5, rtol=1e-5)

    def test_extreme_logits_stable(self, rng):
        from sdtpu.parallel.ring_attention import ring_attention

        mesh = make_mesh(8, 1)
        q = jnp.array(rng.standard_normal((1, 32, 1, 8), dtype=np.float32)) * 50
        k = jnp.array(rng.standard_normal((1, 32, 1, 8), dtype=np.float32)) * 50
        v = jnp.array(rng.standard_normal((1, 32, 1, 8), dtype=np.float32))
        out = ring_attention(q, k, v, mesh)
        assert np.isfinite(np.asarray(out)).all()

    def test_flash_body_matches_dense_attention(self, rng):
        """The Pallas-kernel per-shard body (softmax-stat merge across
        rotations — the long-context configuration) is exact vs dense;
        interpret-mode kernel on the virtual CPU mesh."""
        from sdtpu.ops.attention import _xla_attention
        from sdtpu.parallel.ring_attention import ring_attention

        mesh = make_mesh(4, 1)
        b, l, h, d = 1, 64, 2, 16
        q = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        k = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        v = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        expected = _xla_attention(q, k, v, causal=False)
        got = ring_attention(q, k, v, mesh, axis_name="dp", body="flash")
        assert_allclose(got, expected, atol=1e-5, rtol=1e-5)

    def test_flash_body_extreme_logits_stable(self, rng):
        from sdtpu.parallel.ring_attention import ring_attention

        mesh = make_mesh(4, 1)
        q = jnp.array(rng.standard_normal((1, 32, 1, 8), dtype=np.float32)) * 50
        k = jnp.array(rng.standard_normal((1, 32, 1, 8), dtype=np.float32)) * 50
        v = jnp.array(rng.standard_normal((1, 32, 1, 8), dtype=np.float32))
        out = ring_attention(q, k, v, mesh, body="flash")
        assert np.isfinite(np.asarray(out)).all()

    def test_under_jit_with_sharded_inputs(self, rng):
        from sdtpu.ops.attention import _xla_attention
        from sdtpu.parallel.ring_attention import ring_attention

        mesh = make_mesh(8, 1)
        q = jnp.array(rng.standard_normal((1, 64, 2, 16), dtype=np.float32))
        k = jnp.array(rng.standard_normal((1, 64, 2, 16), dtype=np.float32))
        v = jnp.array(rng.standard_normal((1, 64, 2, 16), dtype=np.float32))
        qs = jax.device_put(q, NamedSharding(mesh, P(None, "dp", None, None)))
        ks = jax.device_put(k, NamedSharding(mesh, P(None, "dp", None, None)))
        vs = jax.device_put(v, NamedSharding(mesh, P(None, "dp", None, None)))
        fn = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))
        got = fn(qs, ks, vs)
        expected = _xla_attention(q, k, v, causal=False)
        assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


class TestRingIntegration:
    """attention_impl='ring' reachability (VERDICT round 1, item 4): a
    sequence-sharded UNet forward must match the dense single-device run."""

    def _sp_mesh(self, n=8):
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()[:n]), ("sp",))

    def test_unet_forward_ring_matches_dense(self, rng):
        from sdtpu.config import UNetConfig
        from sdtpu.models.unet import init_unet, unet_forward
        from sdtpu.parallel import ring_context

        cfg = UNetConfig(
            block_out_channels=(16, 24, 32),
            layers_per_block=1,
            attention_levels=(True, True, True),
            num_attention_heads=2,
            cross_attention_dim=16,
            norm_num_groups=8,
        )
        params = init_unet(0, cfg)
        # 32x32 latents: levels see 1024/256/64 tokens — all divide 8
        x = jnp.array(rng.standard_normal((2, 32, 32, 4), dtype=np.float32))
        ts = jnp.full((2,), 500.0)
        ctx = jnp.array(rng.standard_normal((2, 7, 16), dtype=np.float32))

        expected = unet_forward(x, ts, ctx, params, cfg, attention_impl="xla")
        mesh = self._sp_mesh()
        with ring_context(mesh, "sp"):
            got = jax.jit(
                lambda p, a, t, c: unet_forward(
                    a, t, c, p, cfg, attention_impl="ring"
                )
            )(params, x, ts, ctx)
        assert_allclose(got, expected, atol=1e-4, rtol=1e-3)

    def test_ring_without_context_falls_back_to_dense(self, rng):
        from sdtpu.ops import attention, init_attention

        params = init_attention(jax.random.key(0), 32)
        x = jnp.array(rng.standard_normal((1, 16, 32), dtype=np.float32))
        a = attention(x, params, num_heads=2, implementation="ring")
        b = attention(x, params, num_heads=2, implementation="xla")
        assert_allclose(a, b, atol=1e-6, rtol=1e-6)

    def test_ring_cross_attention_falls_back(self, rng):
        """77-token text context never shards; ring must fall back."""
        from sdtpu.ops import attention, init_attention
        from sdtpu.parallel import ring_context

        params = init_attention(jax.random.key(0), 32, context_dim=24)
        x = jnp.array(rng.standard_normal((1, 16, 32), dtype=np.float32))
        ctx = jnp.array(rng.standard_normal((1, 7, 24), dtype=np.float32))
        with ring_context(self._sp_mesh(), "sp"):
            a = attention(x, params, num_heads=2, context=ctx,
                          implementation="ring")
        b = attention(x, params, num_heads=2, context=ctx,
                      implementation="xla")
        assert_allclose(a, b, atol=1e-6, rtol=1e-6)

    def test_pipeline_ring_matches_xla(self):
        """Full generate with attention_impl='ring' under a ring_context ==
        the plain XLA run (image_size 64 -> 256/64/16 latent tokens)."""
        from test_pipeline import TINY
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline
        from sdtpu.parallel import ring_context

        ids = np.array([[1, 5, 9, 2] + [0] * 12])
        base = StableDiffusionPipeline.from_random(TINY, seed=0)
        expected = base.generate(
            "x", token_ids=ids, num_inference_steps=2, seed=4, image_size=64
        )
        ring_pipe = StableDiffusionPipeline(
            TINY.replace(attention_impl="ring"), base.params
        )
        with ring_context(self._sp_mesh(), "sp"):
            got = ring_pipe.generate(
                "x", token_ids=ids, num_inference_steps=2, seed=4,
                image_size=64,
            )
        np.testing.assert_allclose(
            got.astype(np.int32), expected.astype(np.int32), atol=1
        )

    def test_ring_context_in_compile_cache_key(self):
        """A program traced under a ring_context is NOT reused outside it
        (and vice versa): the context is trace-time ambient state, so it is
        part of the compiled-program cache key (VERDICT round-2 item 6).
        Outside any context the ring impl falls back to dense — the outputs
        must match the plain run bit-for-bit."""
        from test_pipeline import TINY
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline
        from sdtpu.parallel import ring_context

        ids = np.array([[1, 5, 9, 2] + [0] * 12])
        pipe = StableDiffusionPipeline.from_random(
            TINY.replace(attention_impl="ring"), seed=0
        )
        kw = dict(token_ids=ids, num_inference_steps=2, seed=4,
                  image_size=64)
        with ring_context(self._sp_mesh(), "sp"):
            ringed = pipe.generate("x", **kw)
        assert len(pipe._compiled) == 1
        plain = pipe.generate("x", **kw)  # outside: distinct program
        assert len(pipe._compiled) == 2, (
            "ring-context program was reused outside the context"
        )
        with ring_context(self._sp_mesh(), "sp"):
            ringed2 = pipe.generate("x", **kw)  # cache hit for the ring one
        assert len(pipe._compiled) == 2
        np.testing.assert_array_equal(ringed, ringed2)
        np.testing.assert_allclose(
            plain.astype(np.int32), ringed.astype(np.int32), atol=1
        )


class TestTpFullUNet:
    def test_tp_sharded_unet_matches_replicated(self, rng):
        """Full UNet (convs replicated, attention/MLP tp-sharded) over a
        (2, 4) mesh must reproduce the single-device numbers — GSPMD inserts
        the psums around the Megatron-sharded projections."""
        from sdtpu.config import UNetConfig
        from sdtpu.models.unet import init_unet, unet_forward

        cfg = UNetConfig(
            block_out_channels=(16, 24, 32),
            layers_per_block=1,
            attention_levels=(True, True, True),
            num_attention_heads=4,  # divisible by tp=4
            cross_attention_dim=16,
            norm_num_groups=8,
        )
        params = init_unet(0, cfg)
        x = jnp.array(rng.standard_normal((2, 16, 16, 4), dtype=np.float32))
        ts = jnp.full((2,), 300.0)
        ctx = jnp.array(rng.standard_normal((2, 7, 16), dtype=np.float32))

        expected = unet_forward(x, ts, ctx, params, cfg)

        mesh = make_mesh(2, 4)
        with mesh:
            ps = shard_params_tp(params, mesh)
            got = jax.jit(lambda p, a, t, c: unet_forward(a, t, c, p, cfg))(
                ps, shard_batch(x, mesh), shard_batch(ts, mesh),
                shard_batch(ctx, mesh),
            )
        assert_allclose(got, expected, atol=1e-4, rtol=1e-3)


class TestMeshPipeline:
    def test_generate_batch_over_mesh_matches_single_device(self, tiny_pipe):
        """Full pipeline sharded over an 8-way dp mesh: same images as the
        unsharded run (per-request keys make rows independent)."""
        pipe = tiny_pipe
        ids = np.tile(np.array([[1, 5, 9, 2] + [0] * 12]), (8, 1))
        seeds = list(range(8))
        expected = pipe.generate_batch(
            ["p"] * 8, token_ids=ids, num_inference_steps=2, seeds=seeds
        )
        mesh = make_mesh(8, 1)
        with mesh:
            got = pipe.generate_batch(
                ["p"] * 8, token_ids=ids, num_inference_steps=2, seeds=seeds,
                mesh=mesh,
            )
        np.testing.assert_allclose(
            got.astype(np.int32), expected.astype(np.int32), atol=1
        )

    def test_serving_engine_over_mesh_matches_single_device(self, tiny_pipe):
        """BASELINE config 5 is the scale-out workload: the ServingEngine
        itself must run dp-sharded (VERDICT r4 item 6).  8 requests through
        a dp=4 mesh engine (device chunks of 4 rows, each sharded over 4
        devices) must reproduce the single-device engine's images exactly —
        per-request RNG keys make rows independent of batch composition AND
        of sharding."""
        from sdtpu.pipeline.serving import ServingEngine

        pipe = tiny_pipe
        ids = np.tile(np.array([[1, 5, 9, 2] + [0] * 12]), (8, 1))

        def run(mesh):
            engine = ServingEngine(
                pipe, max_batch_size=8, max_wait_ms=200.0,
                device_batch_size=4, mesh=mesh,
            )
            try:
                futs = [
                    engine.submit("p", token_ids=ids[i], seed=i,
                                  num_inference_steps=2)
                    for i in range(8)
                ]
                return np.stack([f.result(timeout=300) for f in futs])
            finally:
                engine.shutdown()

        expected = run(None)
        mesh = make_mesh(4, 1)
        with mesh:
            got = run(mesh)
        stats_note = "dp-sharded engine diverged from single-device engine"
        np.testing.assert_allclose(
            got.astype(np.int32), expected.astype(np.int32), atol=1,
            err_msg=stats_note,
        )


@pytest.fixture(scope="module")
def dryrun_config():
    """The tiny pipeline config used by the driver's dryrun — shared by the
    per-family sharded-parity tests below (moved out of the dryrun in round 4
    to keep its wall-time inside the driver budget)."""
    from sdtpu.config import (
        CLIPConfig, PipelineConfig, SchedulerConfig, UNetConfig, VAEConfig,
    )

    return PipelineConfig(
        name="dryrun/tiny",
        clip=CLIPConfig(
            vocab_size=256, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, max_length=16,
        ),
        unet=UNetConfig(
            block_out_channels=(16, 24, 32),
            layers_per_block=1,
            attention_levels=(True, True, True),
            num_attention_heads=2,
            cross_attention_dim=32,
            norm_num_groups=8,
        ),
        vae=VAEConfig(
            block_out_channels=(8, 16, 16), layers_per_block=1,
            norm_num_groups=8,
        ),
        scheduler=SchedulerConfig(),
        default_image_size=32,
        compute_dtype=jnp.float32,
        param_dtype=jnp.float32,
    )


class TestShardedFamilies:
    """dp-sharded full-pipeline parity for the conditioned families the
    dryrun no longer carries (9-ch inpaint checkpoints, 8-ch InstructPix2Pix,
    int8 W8A8) — each must reproduce its own single-device images over the
    mesh."""

    BATCH = 4

    def _ids_keys(self):
        cond = np.tile(np.array([[1, 5, 9, 2] + [0] * 12]), (self.BATCH, 1))
        uncond = np.tile(np.array([[1, 2] + [0] * 14]), (self.BATCH, 1))
        ids = np.concatenate([cond, uncond]).astype(np.int32)
        keys = np.arange(self.BATCH, dtype=np.uint32)
        return ids, keys

    def _shard(self, mesh, x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    @pytest.mark.parametrize("kind,in_ch", [("inpaint9", 9), ("edit8", 8)])
    def test_conditioned_unet_family_sharded(self, dryrun_config, kind, in_ch):
        import dataclasses as dc

        from sdtpu.pipeline.pipeline import StableDiffusionPipeline

        cfg = dryrun_config.replace(
            name=f"dryrun/{kind}",
            unet=dc.replace(dryrun_config.unet, in_channels=in_ch),
        )
        pipe = StableDiffusionPipeline.from_random(cfg, seed=1)
        ids, keys = self._ids_keys()
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(
            rng.standard_normal((self.BATCH, 32, 32, 3)), jnp.float32
        ).clip(-1, 1)
        fn = pipe._get_compiled(
            size=32, steps=2, cfg=True, is_img2img=True, strength=1.0,
            n_ids=ids.shape[0], has_mask=(in_ch == 9),
        )
        cfg_arg = (
            (np.float32(7.5), np.float32(1.5)) if in_ch == 8
            else np.float32(7.5)
        )
        mask = (np.tile(
            (np.arange(32) >= 16).astype(np.float32)[None, None, :, None],
            (self.BATCH, 32, 1, 1),
        ),) if in_ch == 9 else ()
        expected = np.asarray(fn(pipe.params, ids, imgs, *mask, cfg_arg, keys))

        mesh = make_mesh(4, 2)
        with mesh:
            ps = shard_params_tp(pipe.params, mesh)
            ids_sh = self._shard(mesh, ids, P("dp", None))
            keys_sh = self._shard(mesh, keys, P("dp"))
            imgs_sh = self._shard(mesh, imgs, P("dp", None, None, None))
            mask_sh = tuple(
                self._shard(mesh, m, P("dp", None, None, None)) for m in mask
            )
            got = np.asarray(
                fn(ps, ids_sh, imgs_sh, *mask_sh, cfg_arg, keys_sh)
            )
        np.testing.assert_allclose(
            got, expected, atol=2e-4,
            err_msg=f"sharded {kind} diverged from single-device",
        )

    def test_int8_pipeline_sharded(self, dryrun_config):
        from sdtpu.pipeline.pipeline import StableDiffusionPipeline
        from sdtpu.utils.quant import quantize_pipeline_int8

        base = StableDiffusionPipeline.from_random(dryrun_config, seed=0)
        pipe = StableDiffusionPipeline(
            dryrun_config,
            quantize_pipeline_int8(base.params, min_ch=8, transformer=True),
        )
        ids, keys = self._ids_keys()
        fn = pipe._get_compiled(
            size=32, steps=2, cfg=True, is_img2img=False, strength=1.0,
            n_ids=ids.shape[0],
        )
        expected = np.asarray(fn(pipe.params, ids, np.float32(7.5), keys))

        mesh = make_mesh(4, 2)
        with mesh:
            qp = self._shard(mesh, pipe.params, P())
            ids_sh = self._shard(mesh, ids, P("dp", None))
            keys_sh = self._shard(mesh, keys, P("dp"))
            got = np.asarray(fn(qp, ids_sh, np.float32(7.5), keys_sh))
        # looser than the float families: the in-graph round() sits on
        # knife-edge quantization boundaries, so GSPMD's slightly different
        # accumulation order flips occasional q levels (CLAUDE.md gotcha)
        np.testing.assert_allclose(
            got, expected, atol=2e-2,
            err_msg="sharded int8 pipeline diverged from single-device",
        )


class TestHealthCheck:
    def test_all_devices_healthy(self):
        from sdtpu.parallel import health_check

        report = health_check()
        assert report["ok"] is True
        assert report["devices"] == len(jax.devices())
        assert report["device_errors"] == {}
        assert report["collective_ok"] is True

    def test_mesh_scoped(self):
        from sdtpu.parallel import health_check, make_mesh

        report = health_check(make_mesh(2, 2))
        assert report["ok"] is True
        assert report["devices"] == 4


class TestDistributedHelpers:
    def test_initialize_noop_single_process(self):
        from sdtpu.parallel.distributed import initialize

        initialize(num_processes=1)  # must not raise or touch the cluster

    def test_global_mesh_shapes(self):
        from sdtpu.parallel.distributed import global_mesh

        mesh = global_mesh(tp=2)
        assert mesh.axis_names == ("dp", "tp")
        assert mesh.devices.shape == (4, 2)

    def test_global_mesh_validates(self):
        from sdtpu.parallel.distributed import global_mesh

        with pytest.raises(ValueError, match="does not divide"):
            global_mesh(tp=3)
        with pytest.raises(ValueError, match="dp\\*tp"):
            global_mesh(dp=2, tp=2)
