"""Attention golden tests vs torch scaled_dot_product_attention.

Pins the fixed semantics (SURVEY.md §5.1 item 5): key-axis stable softmax,
scale before mask — vs the reference's query-axis unstable softmax
(``utils.mojo:435-445``, ``attention.mojo:57-59``).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sdtpu import ops

from conftest import assert_allclose


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def make_params(rng, dim, ctx_dim=None, bias=False):
    ctx = ctx_dim or dim
    def lin(i, o):
        p = {"kernel": jnp.array(rng.standard_normal((i, o), dtype=np.float32) / np.sqrt(i))}
        if bias:
            p["bias"] = jnp.array(rng.standard_normal(o, dtype=np.float32) * 0.1)
        return p
    return {"q": lin(dim, dim), "k": lin(ctx, dim), "v": lin(ctx, dim),
            "out": lin(dim, dim)}


def torch_mha(x, params, num_heads, context=None, causal=False):
    ctx = x if context is None else context
    def lin(inp, p):
        w = t(np.asarray(p["kernel"]))
        out = inp @ w
        if "bias" in p:
            out = out + t(np.asarray(p["bias"]))
        return out
    b, lq, d = x.shape
    hd = d // num_heads
    q = lin(t(x), params["q"]).reshape(b, lq, num_heads, hd).transpose(1, 2)
    k = lin(t(ctx), params["k"]).reshape(b, ctx.shape[1], num_heads, hd).transpose(1, 2)
    v = lin(t(ctx), params["v"]).reshape(b, ctx.shape[1], num_heads, hd).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v, is_causal=causal)
    o = o.transpose(1, 2).reshape(b, lq, d)
    return lin(o, params["out"])


class TestAttention:
    @pytest.mark.parametrize("heads", [1, 4])
    def test_self_attention(self, rng, heads):
        x = rng.standard_normal((2, 16, 32), dtype=np.float32)
        params = make_params(rng, 32)
        ours = ops.attention(jnp.array(x), params, num_heads=heads)
        theirs = torch_mha(x, params, heads)
        assert_allclose(ours, theirs.numpy(), atol=1e-4, rtol=1e-4)

    def test_causal_self_attention(self, rng):
        """CLIP's causal mask (attention.mojo:48-55 intent)."""
        x = rng.standard_normal((1, 8, 16), dtype=np.float32)
        params = make_params(rng, 16, bias=True)
        ours = ops.attention(jnp.array(x), params, num_heads=2, causal=True)
        theirs = torch_mha(x, params, 2, causal=True)
        assert_allclose(ours, theirs.numpy(), atol=1e-4, rtol=1e-4)

    def test_cross_attention(self, rng):
        """Cross-attention with different context width (attention.mojo:68-118)."""
        x = rng.standard_normal((2, 16, 32), dtype=np.float32)
        ctx = rng.standard_normal((2, 7, 24), dtype=np.float32)
        params = make_params(rng, 32, ctx_dim=24)
        ours = ops.attention(jnp.array(x), params, num_heads=4,
                             context=jnp.array(ctx))
        theirs = torch_mha(x, params, 4, context=ctx)
        assert_allclose(ours, theirs.numpy(), atol=1e-4, rtol=1e-4)

    def test_softmax_stability(self, rng):
        """Large logits must not overflow (the reference skips
        max-subtraction, utils.mojo:413)."""
        x = rng.standard_normal((1, 8, 16), dtype=np.float32) * 100
        params = make_params(rng, 16)
        out = ops.attention(jnp.array(x), params, num_heads=2)
        assert np.isfinite(np.asarray(out)).all()


class TestTransformerBlock:
    def test_shapes_and_residual_structure(self, rng):
        import jax
        dim, ctx_dim = 32, 24
        params = ops.init_transformer_block(
            jax.random.key(0), dim, context_dim=ctx_dim
        )
        x = jnp.array(rng.standard_normal((2, 16, dim), dtype=np.float32))
        ctx = jnp.array(rng.standard_normal((2, 7, ctx_dim), dtype=np.float32))
        out = ops.transformer_block(x, params, num_heads=4, context=ctx)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_matches_torch_composition(self, rng):
        """Full block vs a torch mirror of diffusers BasicTransformerBlock."""
        import jax
        dim, ctx_dim, heads = 32, 24, 4
        params = ops.init_transformer_block(
            jax.random.key(1), dim, context_dim=ctx_dim
        )
        x = rng.standard_normal((1, 9, dim), dtype=np.float32)
        ctx = rng.standard_normal((1, 5, ctx_dim), dtype=np.float32)

        def torch_ln(inp, p):
            return F.layer_norm(inp, (inp.shape[-1],),
                                t(np.asarray(p["scale"])), t(np.asarray(p["bias"])))

        xt = t(x)
        h = torch_ln(xt, params["norm1"])
        xt = xt + torch_mha(h.numpy(), params["attn1"], heads)
        h = torch_ln(xt, params["norm2"])
        xt = xt + torch_mha(h.numpy(), params["attn2"], heads, context=ctx)
        h = torch_ln(xt, params["norm3"])
        w = t(np.asarray(params["ff"]["proj"]["kernel"]))
        b = t(np.asarray(params["ff"]["proj"]["bias"]))
        h = h @ w + b
        value, gate = torch.chunk(h, 2, dim=-1)
        h = value * F.gelu(gate, approximate="tanh")
        w2 = t(np.asarray(params["ff"]["out"]["kernel"]))
        b2 = t(np.asarray(params["ff"]["out"]["bias"]))
        expected = xt + (h @ w2 + b2)

        ours = ops.transformer_block(
            jnp.array(x), params, num_heads=heads, context=jnp.array(ctx)
        )
        assert_allclose(ours, expected.numpy(), atol=1e-4, rtol=1e-4)
