"""GroupNorm / LayerNorm (reference: ``utils.mojo:1813-1885, 2052-2061``).

The reference's GroupNorm has scalar affine with beta never applied and adds
eps to sigma instead of sigma^2 (SURVEY.md §5.1 item 7); we implement the
standard semantics: per-channel gamma/beta, eps inside the rsqrt.  Statistics
accumulate in float32 regardless of the compute dtype (bf16-safe), then the
normalized result is cast back — XLA fuses the whole thing into one or two
VPU passes over the NHWC tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    params: dict,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    stats=None,
) -> jax.Array:
    """x: (N, H, W, C) or (N, L, C); normalizes over (spatial, C/G) per group.

    ``stats``: optional (N, 2, C) f32 per-channel [mean, mean-of-squares] of
    ``x`` over the spatial axes — the ``emit_stats`` output of a producing
    Pallas slab conv (kernels/conv2d.py).  When given, the group statistics
    derive from it and the full-map stat read is skipped (a reduction cannot
    fuse into a custom-call producer); the normalize pass still reads the
    map once, as it must.
    """
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    spatial = x.shape[1:-1]
    cpg = c // num_groups
    xf = x.astype(jnp.float32).reshape(n, -1, num_groups, cpg)
    if stats is not None:
        m1 = stats[:, 0].astype(jnp.float32).reshape(n, 1, num_groups, cpg)
        m2 = stats[:, 1].astype(jnp.float32).reshape(n, 1, num_groups, cpg)
        mean = jnp.mean(m1, axis=3, keepdims=True)
        var = jnp.maximum(
            jnp.mean(m2, axis=3, keepdims=True) - jnp.square(mean), 0.0
        )
    else:
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, *spatial, c)
    out = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(
    x: jax.Array, params: dict, *, eps: float = 1e-5, stats: str = "auto"
) -> jax.Array:
    """Last-axis LayerNorm with per-feature affine.

    The reference fakes this as GroupNorm(1, n) through a transpose sandwich
    with no per-feature affine (``utils.mojo:2052-2061``, ``clip.mojo:39-41``).

    ``stats``: how E[x] / E[x^2] are computed.

    * ``"matmul"`` — skinny matmuls against a ones vector.  The feature axis
      is the LANE dim, and XLA's lane-axis ``reduce`` lowering ran the SDXL
      transformer's ~100 LayerNorm stat reductions at ~18 ms/step (round-2
      XProf); the MXU sums across lanes natively, and the reduce form also
      exerts layout pressure that flips whole transformer chains into a
      tokens-on-lanes layout where the 320x320 projections run at ~8% MXU
      (round-3 trace).  E[x^2]-E[x]^2 in f32 is well within every precision
      gate for unit-scale activations.
    * ``"reduce"`` — native last-axis reduction.
    * ``"auto"`` (default) — matmul on TPU-class backends, reduce on CPU.
      The split exists because the serving engine guarantees solo-run ==
      coalesced-run images BITWISE; on CPU the matmul lowering broke that
      (round-2 revert: accumulation order varied with the row count), while
      the MXU's per-row contraction order is row-count-independent —
      verified on-chip by ``tools/check_batch_invariance.py`` (BENCHLOG
      round 3).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if stats == "auto":
        import os

        stats = os.environ.get("SDTPU_LN_STATS") or (
            "reduce" if jax.default_backend() == "cpu" else "matmul"
        )  # env override: perf A/Bs without a code edit (trace-time read)
    if stats == "matmul":
        c = x.shape[-1]
        ones = jnp.ones((c, 1), jnp.float32)
        m1 = (xf @ ones) / c                 # (..., 1)
        m2 = ((xf * xf) @ ones) / c
        var = m2 - m1 * m1
        xf = (xf - m1) * jax.lax.rsqrt(var + eps)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def init_group_norm(num_channels: int, *, dtype=jnp.float32) -> dict:
    return {
        "scale": jnp.ones((num_channels,), dtype),
        "bias": jnp.zeros((num_channels,), dtype),
    }


def init_layer_norm(num_features: int, *, dtype=jnp.float32) -> dict:
    return {
        "scale": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
