"""Pallas kernel tests — interpreter mode on CPU (SURVEY.md §4:
``pltpu.force_tpu_interpret_mode``/interpret=True for kernel correctness
without hardware).
"""

import functools
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.kernels.flash_attention import flash_attention
from sdtpu.ops.attention import _xla_attention

from conftest import assert_allclose


def rand_qkv(rng, b, lq, lk, h, d, dtype=np.float32):
    q = rng.standard_normal((b, lq, h, d), dtype=np.float32).astype(dtype)
    k = rng.standard_normal((b, lk, h, d), dtype=np.float32).astype(dtype)
    v = rng.standard_normal((b, lk, h, d), dtype=np.float32).astype(dtype)
    return jnp.array(q), jnp.array(k), jnp.array(v)


class TestFlashAttention:
    @pytest.mark.parametrize(
        "b,lq,lk,h,d",
        [
            (1, 256, 256, 2, 40),    # SD head_dim 40, self-attn
            (2, 256, 77, 2, 40),     # cross-attn to 77 text tokens
            (1, 128, 128, 1, 64),
            (1, 300, 300, 2, 80),    # non-multiple seq len
            (1, 256, 256, 1, 160),   # tiny-sd level-2 head dim
            (1, 64, 64, 2, 40),      # mid-block 8x8 map: tile < block_q
            (1, 8, 8, 1, 40),        # minimum tile (two 8-row chains pad)
        ],
    )
    def test_matches_xla_attention(self, rng, b, lq, lk, h, d):
        q, k, v = rand_qkv(rng, b, lq, lk, h, d)
        expected = _xla_attention(q, k, v, causal=False)
        got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_multi_k_blocks_online_softmax(self, rng):
        """kv length spanning several k blocks exercises the running-max
        correction path."""
        q, k, v = rand_qkv(rng, 1, 128, 512, 2, 40)
        expected = _xla_attention(q, k, v, causal=False)
        got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_extreme_logits_stable(self, rng):
        """Large-magnitude q/k must not overflow (online max-subtraction)."""
        q, k, v = rand_qkv(rng, 1, 128, 128, 1, 40)
        got = flash_attention(q * 100, k * 100, v, block_q=128, block_k=128,
                              interpret=True)
        assert np.isfinite(np.asarray(got)).all()

    def test_bf16_io(self, rng):
        q, k, v = rand_qkv(rng, 1, 128, 128, 2, 40, dtype=jnp.bfloat16)
        expected = _xla_attention(q, k, v, causal=False)
        got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        assert got.dtype == jnp.bfloat16
        assert_allclose(
            np.asarray(got, np.float32), np.asarray(expected, np.float32),
            atol=3e-2, rtol=3e-2,
        )

    @pytest.mark.parametrize(
        "b,lq,lk,h,d",
        [
            (1, 256, 256, 2, 40),
            (2, 128, 77, 2, 40),   # cross-attn KV padding/masking
            (1, 300, 300, 2, 80),  # non-multiple seq len
        ],
    )
    def test_packed_matches_xla(self, rng, b, lq, lk, h, d):
        """The zero-copy (B, H, L, Dp) entry: padded lanes in, padded lanes
        out, numbers identical to dense attention."""
        from sdtpu.kernels.flash_attention import flash_attention_packed

        q, k, v = rand_qkv(rng, b, lq, lk, h, d)
        dp = ((d + 127) // 128) * 128

        def pack(x):
            x = jnp.transpose(x, (0, 2, 1, 3))
            return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, dp - d)))

        got = flash_attention_packed(
            pack(q), pack(k), pack(v), d_real=d,
            block_q=128, block_k=128, interpret=True,
        )
        expected = _xla_attention(q, k, v, causal=False)
        assert_allclose(
            jnp.transpose(got[..., :d], (0, 2, 1, 3)), expected,
            atol=2e-5, rtol=2e-5,
        )
        # padded output lanes must be exactly zero (consumed by a zero-row
        # out-projection without masking)
        assert float(jnp.abs(got[..., d:]).max()) == 0.0

    def test_pick_block_minimizes_sequence_padding(self):
        """SD2.1-768's non-power-of-two levels (9216/2304/576 tokens) must
        not pad to the 512/1024 defaults (33-78% wasted QK/PV work)."""
        from sdtpu.kernels.flash_attention import _pick_block

        assert _pick_block(512, 2304, 8) == 384      # 2304 % 384 == 0
        assert _pick_block(1024, 2304, 128) == 768   # was 3x1024 (33% waste)
        assert _pick_block(512, 576, 8) == 576       # was 2x512 (78% waste)
        assert _pick_block(1024, 576, 128) == 640    # single block
        # power-of-two grids keep the tuned defaults
        assert _pick_block(512, 4096, 8) == 512
        assert _pick_block(1024, 4096, 128) == 1024
        assert _pick_block(1024, 256, 128) == 256

    @pytest.mark.parametrize("qkv_bias", [False, True])
    def test_ops_attention_flash_route(self, rng, qkv_bias):
        """ops.attention(implementation='flash') — the fused-projection
        path (head split + lane pad folded into the weights) vs xla route."""
        from sdtpu.ops import attention, init_attention
        import sdtpu.kernels.flash_attention as fa

        params = init_attention(jax.random.key(0), 32, qkv_bias=qkv_bias)
        x = jnp.array(rng.standard_normal((1, 128, 32), dtype=np.float32))
        expected = attention(x, params, num_heads=2, implementation="xla")
        orig = fa.flash_attention_packed
        try:
            fa.flash_attention_packed = functools.partial(orig, interpret=True)
            got = attention(x, params, num_heads=2, implementation="flash")
        finally:
            fa.flash_attention_packed = orig
        assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_ops_cross_attention_flash_routes_to_dense(self, rng):
        """implementation='flash' uses DENSE attention for cross-attention
        (77 text keys are score-cheap; the packed flash K/V layout costs a
        per-step relayout copy — XProf round 2) — results must be identical
        to the xla route, and the Pallas kernel must NOT be invoked."""
        from sdtpu.ops import attention, init_attention
        import sdtpu.kernels.flash_attention as fa

        params = init_attention(jax.random.key(0), 32, context_dim=24,
                                qkv_bias=False)
        x = jnp.array(rng.standard_normal((2, 128, 32), dtype=np.float32))
        ctx = jnp.array(rng.standard_normal((2, 77, 24), dtype=np.float32))
        expected = attention(x, params, num_heads=2, context=ctx,
                             implementation="xla")

        def boom(*a, **kw):
            raise AssertionError("flash kernel must not run for cross-attn")

        orig = fa.flash_attention_packed
        try:
            fa.flash_attention_packed = boom
            got = attention(x, params, num_heads=2, context=ctx,
                            implementation="flash")
        finally:
            fa.flash_attention_packed = orig
        assert_allclose(got, expected, atol=1e-6, rtol=1e-6)


class TestFlashAttentionStats:
    def test_two_block_merge_equals_full(self, rng):
        """(o, m, l) from two KV halves softmax-merge to exactly the full
        attention — the ring-attention partial primitive."""
        from sdtpu.kernels.flash_attention import (
            flash_attention,
            flash_attention_stats,
        )

        b, l, h, d = 1, 128, 2, 16
        q = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        k = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        v = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        full = flash_attention(q, k, v, interpret=True)

        half = l // 2
        num = jnp.zeros((b, l, h, d), jnp.float32)
        m = jnp.full((b, h, l), -jnp.inf, jnp.float32)
        den = jnp.zeros((b, h, l), jnp.float32)
        for sl in (slice(0, half), slice(half, l)):
            o_i, m_i, l_i = flash_attention_stats(
                q, k[:, sl], v[:, sl], interpret=True)
            m_new = jnp.maximum(m, m_i)
            alpha = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_new))
            w_i = jnp.exp(m_i - m_new) * l_i
            tq = lambda s: jnp.transpose(s, (0, 2, 1))[..., None]  # noqa: E731
            num = num * tq(alpha) + o_i * tq(w_i)
            den = den * alpha + w_i
            m = m_new
        merged = num / jnp.transpose(den, (0, 2, 1))[..., None]
        assert_allclose(merged, full, atol=1e-5, rtol=1e-5)

    def test_stats_describe_softmax(self, rng):
        """m is the true row max of scaled logits; l the exp-sum at m."""
        from sdtpu.kernels.flash_attention import flash_attention_stats

        b, l, h, d = 1, 64, 1, 8
        q = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        k = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        v = jnp.array(rng.standard_normal((b, l, h, d), dtype=np.float32))
        _, m, lsum = flash_attention_stats(q, k, v, interpret=True)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
        assert_allclose(m, jnp.max(s, axis=-1), atol=1e-5, rtol=1e-5)
        assert_allclose(
            lsum, jnp.sum(jnp.exp(s - jnp.max(s, -1, keepdims=True)), -1),
            atol=1e-5, rtol=1e-5)


class TestOutProjPacked:
    @pytest.mark.parametrize(
        "b,h,l,dp,c,bias",
        [
            (2, 8, 256, 128, 320, True),   # tiny-sd L0 head layout
            (1, 2, 300, 128, 64, False),   # non-multiple seq len (pads)
            (1, 1, 64, 512, 96, True),     # VAE-style single wide head
        ],
    )
    def test_matches_einsum(self, rng, b, h, l, dp, c, bias):
        """residual + einsum('bhld,hdc') + bias as one Pallas GEMM (the
        row-major-layout-pinning out-projection, flash_attention.py)."""
        from sdtpu.kernels.flash_attention import out_proj_packed

        o = jnp.array(rng.standard_normal((b, h, l, dp), dtype=np.float32))
        w = jnp.array(rng.standard_normal((h, dp, c), dtype=np.float32))
        bv = (jnp.array(rng.standard_normal((c,), dtype=np.float32))
              if bias else None)
        res = jnp.array(rng.standard_normal((b, l, c), dtype=np.float32))
        expected = res + jnp.einsum("bhld,hdc->blc", o, w)
        if bias:
            expected = expected + bv
        got = out_proj_packed(o, w, bv, res, interpret=True)
        assert got.shape == (b, l, c)
        # per-head f32 partial sums vs one fused contraction: tiny
        # accumulation-order drift at ~1e-6 relative
        assert_allclose(got, expected, atol=3e-4, rtol=1e-5)


class TestConv3x3Gemm:
    @pytest.mark.parametrize("b,h,w,ci,co", [
        (1, 8, 8, 16, 32),
        (2, 16, 16, 128, 128),
        (1, 8, 8, 24, 40),   # non-aligned channels
        (1, 8, 8, 16, 300),  # co > co_tile with padding
    ])
    def test_matches_xla_conv(self, rng, b, h, w, ci, co):
        from sdtpu.kernels.conv2d import conv3x3_gemm
        from sdtpu.ops import conv2d

        x = jnp.array(rng.standard_normal((b, h, w, ci), dtype=np.float32))
        k = jnp.array(rng.standard_normal((3, 3, ci, co), dtype=np.float32)) * 0.1
        bias = jnp.array(rng.standard_normal(co, dtype=np.float32))
        expected = conv2d(x, k, bias, padding=1)
        got = conv3x3_gemm(x, k, bias, co_tile=128, interpret=True)
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    def test_bf16(self, rng):
        from sdtpu.kernels.conv2d import conv3x3_gemm
        from sdtpu.ops import conv2d

        x = jnp.array(rng.standard_normal((1, 8, 8, 32)), jnp.bfloat16)
        k = jnp.array(rng.standard_normal((3, 3, 32, 64)) * 0.1, jnp.bfloat16)
        expected = np.asarray(conv2d(x, k, None, padding=1), np.float32)
        got = np.asarray(conv3x3_gemm(x, k, interpret=True), np.float32)
        assert_allclose(got, expected, atol=0.15, rtol=0.1)

    def test_fits_fused_policy(self):
        from sdtpu.kernels.conv2d import fits_fused

        assert fits_fused((2, 64, 64, 320), (3, 3, 320, 320))
        assert fits_fused((2, 64, 64, 960), (3, 3, 960, 320))
        assert not fits_fused((1, 512, 512, 128), (3, 3, 128, 128))
        assert not fits_fused((1, 64, 64, 320), (1, 1, 320, 320))  # not 3x3


class TestSlabGnSiluConv:
    def test_slab_conv_matches_xla_conv(self, rng):
        """Row-slab kernel (spatial blocking past the 64x64 cap) vs XLA."""
        from sdtpu.kernels.conv2d import conv3x3_gemm_slab
        from sdtpu.ops import conv2d

        b, h, w, ci, co = 1, 96, 96, 64, 64
        x = jnp.array(rng.standard_normal((b, h, w, ci), dtype=np.float32))
        k = jnp.array(rng.standard_normal((3, 3, ci, co), dtype=np.float32)) * 0.1
        bias = jnp.array(rng.standard_normal(co, dtype=np.float32))
        expected = conv2d(x, k, bias, padding=1)
        got = conv3x3_gemm_slab(
            x, k, bias, h_tile=32, co_tile=64, interpret=True
        )
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("order", ["input_outer", "weight_outer"])
    def test_slab_grid_orders_match(self, rng, order):
        """Both grid iteration orders (input-resident vs weight-resident —
        a DMA-traffic choice, see conv3x3_gemm_slab docstring) must compute
        the identical conv.  Uses multiple batches, slabs, AND co tiles so
        every grid axis is exercised."""
        from sdtpu.kernels.conv2d import conv3x3_gemm_slab
        from sdtpu.ops import conv2d

        b, h, w, ci, co = 2, 32, 16, 24, 256
        x = jnp.array(rng.standard_normal((b, h, w, ci), dtype=np.float32))
        k = jnp.array(rng.standard_normal((3, 3, ci, co), dtype=np.float32)) * 0.1
        bias = jnp.array(rng.standard_normal(co, dtype=np.float32))
        expected = conv2d(x, k, bias, padding=1)
        got = conv3x3_gemm_slab(
            x, k, bias, h_tile=16, co_tile=128, grid_order=order,
            interpret=True,
        )
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("has_pro", [False, True])
    def test_slab_halo_views_edge_rows(self, rng, has_pro):
        """The view-based halo assembly (clamped single-row blocks around
        the core rows) must compute the identical conv — including the edge
        slabs, whose clamped halo reads duplicate an image-edge row that
        the kernel must mask back to the conv's zero padding."""
        from sdtpu.kernels.conv2d import (
            conv3x3_gemm_slab,
            gn_silu_conv3x3_slab,
        )
        from sdtpu.ops import conv2d, group_norm, silu

        b, h, w, ci, co, g = 2, 32, 16, 24, 64, 8
        x = jnp.array(rng.standard_normal((b, h, w, ci), dtype=np.float32))
        k = jnp.array(rng.standard_normal((3, 3, ci, co), dtype=np.float32)) * 0.1
        bias = jnp.array(rng.standard_normal(co, dtype=np.float32))
        if has_pro:
            norm = {
                "scale": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
                "bias": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
            }
            expected = conv2d(
                silu(group_norm(x, norm, num_groups=g)), k, bias, padding=1
            )
            got = gn_silu_conv3x3_slab(
                x, norm, k, bias, num_groups=g, h_tile=8, co_tile=64,
                interpret=True,
            )
        else:
            expected = conv2d(x, k, bias, padding=1)
            got = conv3x3_gemm_slab(
                x, k, bias, h_tile=8, co_tile=64, interpret=True
            )
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("has_pro", [False, True])
    def test_upsample_fused_matches_unfused(self, rng, has_pro):
        """The fused nearest-2x-upsample slab conv (in-VMEM row/col expand
        of the small map) vs nearest_upsample + conv, across multiple slabs
        so the odd/even halo-row alignment is exercised."""
        from sdtpu.kernels.conv2d import conv3x3_gemm_slab
        from sdtpu.ops import conv2d, group_norm, silu
        from sdtpu.ops.resize import nearest_upsample

        b, hs, ws, ci, co, g = 2, 16, 8, 24, 64, 8
        x = jnp.array(rng.standard_normal((b, hs, ws, ci), dtype=np.float32))
        k = jnp.array(rng.standard_normal((3, 3, ci, co), dtype=np.float32)) * 0.1
        bias = jnp.array(rng.standard_normal(co, dtype=np.float32))
        up = nearest_upsample(x, 2)
        if has_pro:
            norm = {
                "scale": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
                "bias": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
            }
            # per-channel affine commutes with nearest resampling, so the
            # fused form normalizes the SMALL map with the same stats
            expected = conv2d(
                silu(group_norm(up, norm, num_groups=g)), k, bias, padding=1
            )
            # fold the GN affine by hand (nearest duplication leaves
            # mean/var unchanged, so upsampled-map stats == small-map stats)
            xg = up.astype(jnp.float32).reshape(b, 2 * hs * 2 * ws, g, ci // g)
            mean = jnp.mean(xg, axis=(1, 3))
            var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
            inv = jax.lax.rsqrt(var + 1e-5)
            invc = jnp.repeat(inv, ci // g, axis=1)
            muc = jnp.repeat(mean, ci // g, axis=1)
            a = invc * norm["scale"][None]
            pb = -muc * a + norm["bias"][None]
            got = conv3x3_gemm_slab(
                x, k, bias, prologue_scale=a, prologue_bias=pb,
                h_tile=16, co_tile=64, upsample=True, interpret=True,
            )
        else:
            expected = conv2d(up, k, bias, padding=1)
            got = conv3x3_gemm_slab(
                x, k, bias, h_tile=16, co_tile=64, upsample=True,
                interpret=True,
            )
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("has_t", [False, True])
    def test_slab_prologue_residual_matches_unfused(self, rng, has_t):
        """GN(+temb)->SiLU folded to the slab kernel's affine prologue +
        residual epilogue vs the unfused composition.  The prologue must not
        corrupt the conv's zero padding at slab borders (masked in-kernel)."""
        from sdtpu.kernels.conv2d import gn_silu_conv3x3_slab
        from sdtpu.ops import conv2d, group_norm, silu

        b, h, w, ci, co, g = 1, 80, 80, 64, 64, 8
        x = jnp.array(rng.standard_normal((b, h, w, ci), dtype=np.float32))
        res = jnp.array(rng.standard_normal((b, h, w, co), dtype=np.float32))
        norm = {
            "scale": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
            "bias": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
        }
        k = jnp.array(rng.standard_normal((3, 3, ci, co), dtype=np.float32)) * 0.1
        cb = jnp.array(rng.standard_normal(co, dtype=np.float32))
        t = (
            jnp.array(rng.standard_normal((b, ci), dtype=np.float32))
            if has_t else None
        )
        z = x + t[:, None, None, :] if has_t else x
        expected = res + conv2d(
            silu(group_norm(z, norm, num_groups=g)), k, cb, padding=1
        )
        got = gn_silu_conv3x3_slab(
            x, norm, k, cb, num_groups=g, temb=t, residual=res,
            h_tile=16, co_tile=64, interpret=True,
        )
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("has_t", [False, True])
    def test_slab_emit_stats_chain(self, rng, has_t):
        """conv1's emit_stats moments must equal direct per-channel moments
        of its output, and feeding them as ``stats=`` to the next
        gn_silu_conv3x3_slab must reproduce the recompute-from-map result
        (incl. the temb fold: E[(x+t)^2] = E[x^2] + 2tE[x] + t^2)."""
        from sdtpu.kernels.conv2d import gn_silu_conv3x3_slab

        b, h, w, ci, co, g = 2, 16, 16, 64, 64, 8
        x = jnp.array(rng.standard_normal((b, h, w, ci), dtype=np.float32))
        norm1 = {
            "scale": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
            "bias": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
        }
        norm2 = {
            "scale": jnp.array(rng.standard_normal(co, dtype=np.float32)),
            "bias": jnp.array(rng.standard_normal(co, dtype=np.float32)),
        }
        k1 = jnp.array(
            rng.standard_normal((3, 3, ci, co), dtype=np.float32)) * 0.1
        k2 = jnp.array(
            rng.standard_normal((3, 3, co, co), dtype=np.float32)) * 0.1
        cb = jnp.array(rng.standard_normal(co, dtype=np.float32))
        t = (
            jnp.array(rng.standard_normal((b, co), dtype=np.float32))
            if has_t else None
        )
        out, mom = gn_silu_conv3x3_slab(
            x, norm1, k1, cb, num_groups=g, h_tile=8, co_tile=64,
            emit_stats=True, interpret=True,
        )
        ref = np.asarray(out, np.float64)
        assert_allclose(mom[:, 0], ref.mean(axis=(1, 2)),
                        atol=1e-5, rtol=1e-5)
        assert_allclose(mom[:, 1], (ref ** 2).mean(axis=(1, 2)),
                        atol=1e-5, rtol=1e-5)
        want = gn_silu_conv3x3_slab(
            out, norm2, k2, cb, num_groups=g, temb=t, h_tile=8, co_tile=64,
            interpret=True,
        )
        got = gn_silu_conv3x3_slab(
            out, norm2, k2, cb, num_groups=g, temb=t, stats=mom,
            h_tile=8, co_tile=64, interpret=True,
        )
        assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_w8a8_slab_matches_integer_emulation(self, rng):
        """The int8 slab kernel must equal an exact host emulation of its
        quantized math: quantize SiLU(GN(x+t)) per-ci, integer conv, per-co
        rescale, f32 bias+residual (sdtpu/utils/quant.py design)."""
        from sdtpu.kernels.conv2d import gn_silu_conv3x3_slab
        from sdtpu.ops import conv2d
        from sdtpu.utils.quant import act_qparams_from_norm, quantize_conv_w8a8

        b, h, w, ci, co, g = 1, 16, 16, 32, 40, 8
        x = jnp.array(rng.standard_normal((b, h, w, ci), dtype=np.float32))
        norm = {
            "scale": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
            "bias": jnp.array(rng.standard_normal(ci, dtype=np.float32)),
        }
        k = jnp.array(
            rng.standard_normal((3, 3, ci, co), dtype=np.float32)
        ) * 0.1
        cb = jnp.array(rng.standard_normal(co, dtype=np.float32))
        t = jnp.array(rng.standard_normal((b, ci), dtype=np.float32))
        res = jnp.array(rng.standard_normal((b, h, w, co), dtype=np.float32))

        s_act, z_act = act_qparams_from_norm(norm)
        q, w_scale, zp_corr = quantize_conv_w8a8(np.asarray(k), s_act, z_act)

        got = gn_silu_conv3x3_slab(
            x, norm, jnp.asarray(q), cb - jnp.asarray(zp_corr),
            num_groups=g, temb=t, residual=res,
            act_inv_scale=jnp.asarray(1.0 / s_act),
            act_zp=jnp.asarray(z_act),
            w_scale=jnp.asarray(w_scale),
            h_tile=8, co_tile=128, interpret=True,
        )

        # host emulation with the kernel's exact formulas
        xf = np.asarray(x) + np.asarray(t)[:, None, None, :]
        xg = xf.reshape(b, h * w, g, ci // g)
        mean = xg.mean(axis=(1, 3))
        var = (xg**2).mean(axis=(1, 3)) - mean**2
        inv = 1.0 / np.sqrt(var + 1e-5)
        invc = np.repeat(inv, ci // g, axis=1)
        muc = np.repeat(mean, ci // g, axis=1)
        gam, bet = np.asarray(norm["scale"]), np.asarray(norm["bias"])
        y = (xf - muc[:, None, None, :]) * (invc * gam)[:, None, None, :] \
            + bet[None, None, None, :]
        y = y / (1.0 + np.exp(-y))
        qy = np.clip(np.round(y / s_act) + z_act, -128, 127)
        # the conv's zero padding holds the zero-POINT, not integer 0
        qy_pad = np.pad(
            qy, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=0.0
        ) + np.where(
            np.pad(np.ones_like(qy), ((0, 0), (1, 1), (1, 1), (0, 0)))
            == 0, z_act, 0.0
        )
        conv_int = conv2d(jnp.asarray(qy_pad, jnp.float32),
                          jnp.asarray(q, jnp.float32), padding=0)
        expected = np.asarray(conv_int) * w_scale - zp_corr + np.asarray(cb) \
            + np.asarray(res)
        assert_allclose(got, expected, atol=1e-3, rtol=1e-4)

    def test_w8a8_slab_close_to_float_path(self, rng):
        """int8 quantization error vs the float slab path stays ~1% rel on
        unit-scale data — the per-op error the pipeline PSNR gate budgets."""
        from sdtpu.kernels.conv2d import gn_silu_conv3x3_slab
        from sdtpu.utils.quant import quantize_conv_w8a8

        b, h, w, ci, co, g = 1, 16, 16, 64, 64, 8
        x = jnp.array(rng.standard_normal((b, h, w, ci), dtype=np.float32))
        norm = {"scale": jnp.ones(ci, jnp.float32) * 0.8,
                "bias": jnp.zeros(ci, jnp.float32)}
        k = jnp.array(
            rng.standard_normal((3, 3, ci, co), dtype=np.float32)
        ) * 0.1
        cb = jnp.zeros(co, jnp.float32)
        want = gn_silu_conv3x3_slab(
            x, norm, k, cb, num_groups=g, h_tile=8, co_tile=64,
            interpret=True,
        )
        from sdtpu.utils.quant import act_qparams_from_norm

        s_act, z_act = act_qparams_from_norm(norm)
        q, w_scale, zp_corr = quantize_conv_w8a8(np.asarray(k), s_act, z_act)
        got = gn_silu_conv3x3_slab(
            x, norm, jnp.asarray(q), cb - jnp.asarray(zp_corr), num_groups=g,
            act_inv_scale=jnp.asarray(1.0 / s_act),
            act_zp=jnp.asarray(z_act),
            w_scale=jnp.asarray(w_scale),
            h_tile=8, co_tile=64, interpret=True,
        )
        a, bx = np.asarray(got, np.float32), np.asarray(want, np.float32)
        rel = np.linalg.norm(a - bx) / np.linalg.norm(bx)
        # measured ~1.7-1.9% at 3.5-4.5 sigma headroom (the 8-bit budget);
        # the shipping gate is pipeline-level PSNR vs bf16 (test_quant.py)
        assert rel < 0.03, f"int8 conv rel err {rel:.4f}"

    def test_plan_slab_policy(self):
        from sdtpu.kernels.conv2d import plan_co_tile, plan_slab

        # SD2.1-768 level-0 map: whole-map kernel refuses, slab plans
        assert plan_co_tile((2, 96, 96, 320), (3, 3, 320, 320)) is None
        assert plan_slab((2, 96, 96, 320), (3, 3, 320, 320)) == (32, 320)
        # SDXL-1024 level-0
        assert plan_slab((2, 128, 128, 320), (3, 3, 320, 320)) == (32, 320)
        # VAE decoder full-res map
        plan = plan_slab((1, 512, 512, 128), (3, 3, 128, 128))
        assert plan is not None and plan[0] * 512 <= 64 * 64
        # tiny channels stay on XLA
        assert plan_slab((1, 96, 96, 4), (3, 3, 4, 320)) is None

    def test_vae_resnet_slab_path_matches_xla_path(self, rng):
        import sdtpu.kernels.conv2d as ck
        from sdtpu.models.vae import _init_vae_resnet, vae_resnet

        params = _init_vae_resnet(jax.random.key(5), 64, 128,
                                  dtype=jnp.float32)
        x = jnp.array(rng.standard_normal((1, 16, 16, 64), dtype=np.float32))
        expected = vae_resnet(x, params, num_groups=8, conv_impl="xla")
        orig = ck.gn_silu_conv3x3_slab
        try:
            ck.gn_silu_conv3x3_slab = functools.partial(orig, interpret=True)
            got = vae_resnet(x, params, num_groups=8, conv_impl="gemm")
        finally:
            ck.gn_silu_conv3x3_slab = orig
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    def test_resnet_block_slab_path_matches_xla_path(self, rng):
        """resnet_block routes past-cap maps through the slab kernels."""
        import sdtpu.kernels.conv2d as ck
        from sdtpu.models.unet import _init_resnet, resnet_block

        params = _init_resnet(jax.random.key(2), 64, 64, 48, dtype=jnp.float32)
        x = jnp.array(rng.standard_normal((1, 80, 80, 64), dtype=np.float32))
        temb = jnp.array(rng.standard_normal((1, 48), dtype=np.float32))
        expected = resnet_block(x, temb, params, num_groups=8, conv_impl="xla")
        orig = ck.gn_silu_conv3x3_slab
        try:
            ck.gn_silu_conv3x3_slab = functools.partial(orig, interpret=True)
            got = resnet_block(x, temb, params, num_groups=8, conv_impl="gemm")
        finally:
            ck.gn_silu_conv3x3_slab = orig
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    def test_resnet_block_slab_path_with_shortcut(self, rng):
        """Channel-changing resblock (1x1 matmul shortcut) through the slab
        gemm path vs the XLA path."""
        import sdtpu.kernels.conv2d as ck
        from sdtpu.models.unet import _init_resnet, resnet_block

        params = _init_resnet(jax.random.key(1), 128, 256, 48,
                              dtype=jnp.float32)
        x = jnp.array(rng.standard_normal((1, 8, 8, 128), dtype=np.float32))
        temb = jnp.array(rng.standard_normal((1, 48), dtype=np.float32))
        expected = resnet_block(x, temb, params, num_groups=8, conv_impl="xla")
        orig = ck.gn_silu_conv3x3_slab
        try:
            ck.gn_silu_conv3x3_slab = functools.partial(orig, interpret=True)
            got = resnet_block(x, temb, params, num_groups=8, conv_impl="gemm")
        finally:
            ck.gn_silu_conv3x3_slab = orig
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    def test_resnet_block_small_map_slab_path(self, rng):
        """resnet_block(conv_impl='gemm') must equal conv_impl='xla' — run in
        interpret mode by monkeypatching the kernels."""
        import sdtpu.kernels.conv2d as ck
        from sdtpu.models.unet import _init_resnet, resnet_block

        params = _init_resnet(jax.random.key(0), 128, 128, 48, dtype=jnp.float32)
        x = jnp.array(rng.standard_normal((1, 8, 8, 128), dtype=np.float32))
        temb = jnp.array(rng.standard_normal((1, 48), dtype=np.float32))

        expected = resnet_block(x, temb, params, num_groups=8, conv_impl="xla")

        orig = ck.gn_silu_conv3x3_slab
        try:
            ck.gn_silu_conv3x3_slab = functools.partial(orig, interpret=True)
            got = resnet_block(x, temb, params, num_groups=8, conv_impl="gemm")
        finally:
            ck.gn_silu_conv3x3_slab = orig
        assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


class TestStatsChainModels:
    """The conv->GN stats chain (kernels/conv2d.py emit_stats/stats) must be
    a pure perf transform: whole-model outputs with the chain ON must equal
    chain OFF and the XLA reference path, with the slab path ENGAGED (the
    counters guard against the test passing vacuously on a fallback)."""

    def _patch(self, ck):
        counters = {"consumed": 0, "emitted": 0}
        orig_gn, orig_conv = ck.gn_silu_conv3x3_slab, ck.conv3x3_gemm_slab

        def gn_wrap(*a, **kw):
            if kw.get("stats") is not None:
                counters["consumed"] += 1
            kw["interpret"] = True
            return orig_gn(*a, **kw)

        def conv_wrap(*a, **kw):
            if kw.get("emit_stats"):
                counters["emitted"] += 1
            kw["interpret"] = True
            return orig_conv(*a, **kw)

        ck.gn_silu_conv3x3_slab, ck.conv3x3_gemm_slab = gn_wrap, conv_wrap
        return counters, (orig_gn, orig_conv)

    def test_upsample_emit_stats(self, rng):
        """The fused-upsample slab conv's moments must equal direct
        per-channel moments of its (upsampled-size) output."""
        from sdtpu.kernels.conv2d import conv3x3_gemm_slab

        x = jnp.array(rng.standard_normal((1, 8, 8, 64), dtype=np.float32))
        k = jnp.array(
            rng.standard_normal((3, 3, 64, 64), dtype=np.float32)) * 0.1
        b = jnp.array(rng.standard_normal(64, dtype=np.float32))
        out, mom = conv3x3_gemm_slab(
            x, k, b, h_tile=8, co_tile=64, upsample=True, emit_stats=True,
            interpret=True,
        )
        assert out.shape == (1, 16, 16, 64)
        ref = np.asarray(out, np.float64)
        assert_allclose(mom[:, 0], ref.mean(axis=(1, 2)), atol=1e-5, rtol=1e-5)
        assert_allclose(mom[:, 1], (ref ** 2).mean(axis=(1, 2)),
                        atol=1e-5, rtol=1e-5)

    def test_vae_decode_chain_parity(self, rng):
        """Full vae_decode: cross-resnet + upsample + norm_out chain hops."""
        import sdtpu.kernels.conv2d as ck
        from sdtpu.config import VAEConfig
        from sdtpu.models.vae import init_vae_decoder, vae_decode

        cfg = VAEConfig(block_out_channels=(64, 64), layers_per_block=1,
                        norm_num_groups=8)
        params = init_vae_decoder(0, cfg)
        lat = jnp.array(
            rng.standard_normal((1, 8, 8, cfg.latent_channels),
                                dtype=np.float32)) * 0.2
        expected = vae_decode(lat, params, cfg, conv_impl="xla")

        counters, (orig_gn, orig_conv) = self._patch(ck)
        chain_was = ck.CONV_STATS_CHAIN
        try:
            ck.CONV_STATS_CHAIN = True
            got_on = vae_decode(lat, params, cfg, conv_impl="gemm")
            consumed_on = counters["consumed"]
            ck.CONV_STATS_CHAIN = False
            got_off = vae_decode(lat, params, cfg, conv_impl="gemm")
        finally:
            ck.gn_silu_conv3x3_slab, ck.conv3x3_gemm_slab = orig_gn, orig_conv
            ck.CONV_STATS_CHAIN = chain_was
        # 2 up-levels x 2 resnets x (norm1-from-producer + norm2-from-conv1)
        # minus the first resnet's norm1 (no producer), mid resnets, etc.
        assert consumed_on >= 6, f"chain engaged only {consumed_on} times"
        assert_allclose(got_on, got_off, atol=2e-4, rtol=2e-4)
        assert_allclose(got_on, expected, atol=2e-4, rtol=2e-4)

    def test_unet_forward_chain_parity(self, rng):
        """Full unet_forward: resnet -> attention-block GN stats hop."""
        import sdtpu.kernels.conv2d as ck
        from sdtpu.config import UNetConfig
        from sdtpu.models.unet import init_unet, unet_forward

        cfg = UNetConfig(
            block_out_channels=(64, 64),
            layers_per_block=1,
            attention_levels=(True, True),
            num_attention_heads=4,
            cross_attention_dim=24,
            norm_num_groups=8,
        )
        params = init_unet(0, cfg)
        x = jnp.array(
            rng.standard_normal((2, 16, 16, cfg.in_channels),
                                dtype=np.float32))
        ts = jnp.full((2,), 500.0, jnp.float32)
        ctx = jnp.array(
            rng.standard_normal((2, 77, cfg.cross_attention_dim),
                                dtype=np.float32))
        expected = unet_forward(x, ts, ctx, params, cfg, conv_impl="xla")

        counters, (orig_gn, orig_conv) = self._patch(ck)
        chain_was = ck.CONV_STATS_CHAIN
        try:
            ck.CONV_STATS_CHAIN = True
            got_on = unet_forward(x, ts, ctx, params, cfg, conv_impl="gemm")
            consumed_on = counters["consumed"]
            ck.CONV_STATS_CHAIN = False
            got_off = unet_forward(x, ts, ctx, params, cfg, conv_impl="gemm")
        finally:
            ck.gn_silu_conv3x3_slab, ck.conv3x3_gemm_slab = orig_gn, orig_conv
            ck.CONV_STATS_CHAIN = chain_was
        assert consumed_on >= 2, f"chain engaged only {consumed_on} times"
        assert_allclose(got_on, got_off, atol=2e-4, rtol=2e-4)
        assert_allclose(got_on, expected, atol=2e-4, rtol=2e-4)
