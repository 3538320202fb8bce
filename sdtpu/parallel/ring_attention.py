"""Ring attention: sequence-parallel exact attention over an ICI ring.

The reference has no long-context machinery at all (SURVEY.md §5: dense
materialized attention at 77 text / <=4096 latent tokens).  For resolutions
where even flash attention's KV no longer fits one chip (e.g. multi-chip
SDXL variants at 2048px -> 65k latent tokens), the sequence axis is sharded
over a mesh axis and KV blocks rotate around the ring via ``ppermute`` while
each chip accumulates its partial online-softmax state — communication
overlaps compute, and after N-1 rotations every query has seen every key.

Runs inside ``shard_map`` over a Mesh axis; tested against dense attention on
the 8-device virtual CPU mesh (the TPU analogue of multi-node testing).
"""

from __future__ import annotations

import contextlib
import functools
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _block_attention(q, k, v, m_prev, l_prev, acc_prev, *, scale):
    """One online-softmax update of the running (m, l, acc) state with a new
    KV block.  q: (B, Lq, H, D); k/v: (B, Lkv, H, D); state per (B, H, Lq)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    m_curr = jnp.max(s, axis=-1)                      # (B, H, Lq)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[..., None])                # (B, H, Lq, Lk)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1)
    pv = jnp.einsum(
        "bhqk,bkhd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    acc_next = acc_prev * alpha[..., None] + pv
    return m_next, l_next, acc_next


def _ring_attention_local(q, k, v, *, axis_name, scale):
    """Per-shard body: rotate KV around ``axis_name``, accumulate online
    softmax.  q/k/v: (B, L/N, H, D) local shards."""
    n = jax.lax.psum(1, axis_name)
    b, lq, h, d = q.shape

    m = jnp.full((b, h, lq), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, lq), jnp.float32)
    acc = jnp.zeros((b, h, lq, d), jnp.float32)
    # freshly-created constants are "unvarying" under shard_map's manual-axes
    # typing; mark them varying over the ring axis so the loop carry types
    # match the per-shard updates.
    m, l, acc = (jax.lax.pcast(x, (axis_name,), to="varying") for x in (m, l, acc))

    def body(step, carry):
        m, l, acc, k_blk, v_blk = carry
        m, l, acc = _block_attention(q, k_blk, v_blk, m, l, acc, scale=scale)
        # rotate: chip i sends its block to i+1 (point-to-point over ICI)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return m, l, acc, k_blk, v_blk

    m, l, acc, _, _ = jax.lax.fori_loop(0, n, body, (m, l, acc, k, v))
    out = acc / l[..., None]
    return jnp.einsum("bhqd->bqhd", out).astype(q.dtype)


def _ring_flash_local(q, k, v, *, axis_name, interpret):
    """Per-shard body with the Pallas flash kernel: each rotation runs
    blockwise flash attention of the local queries against the visiting KV
    shard (never materializing the (L/N, L/N) score matrix the dense body
    does — at 65k tokens over 8 chips that matrix is 256 MiB/head) and the
    per-shard results merge exactly via their softmax stats:
    ``out = sum_i o_i l_i e^{m_i - M} / sum_i l_i e^{m_i - M}``."""
    from sdtpu.kernels.flash_attention import flash_attention_stats

    n = jax.lax.psum(1, axis_name)
    b, lq, h, d = q.shape

    # (no pcast here: this body runs under check_vma=False — see
    # ring_attention — so there is no varying-axes typing to satisfy)
    m = jnp.full((b, h, lq), -jnp.inf, jnp.float32)
    den = jnp.zeros((b, h, lq), jnp.float32)
    num = jnp.zeros((b, lq, h, d), jnp.float32)

    def body(step, carry):
        m, den, num, k_blk, v_blk = carry
        o_i, m_i, l_i = flash_attention_stats(
            q, k_blk, v_blk, interpret=interpret
        )
        m_new = jnp.maximum(m, m_i)
        # first rotation: m = -inf -> the rescale must be exactly 0, not
        # exp(-inf - m_new) = nan when m_new is -inf too
        alpha = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_new))
        w_i = jnp.exp(m_i - m_new) * l_i
        to_qdim = lambda s: jnp.transpose(s, (0, 2, 1))[..., None]  # noqa: E731
        num = num * to_qdim(alpha) + o_i.astype(jnp.float32) * to_qdim(w_i)
        den = den * alpha + w_i
        m = m_new
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return m, den, num, k_blk, v_blk

    m, den, num, _, _ = jax.lax.fori_loop(0, n, body, (m, den, num, k, v))
    out = num / jnp.transpose(den, (0, 2, 1))[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "dp",
    body: str = "auto",
) -> jax.Array:
    """Exact attention with q/k/v sequence-sharded over ``axis_name``.

    q, k, v: (B, L, H, D) global arrays (or shardings thereof); the sequence
    axis L must divide by the mesh axis size.  Returns (B, L, H, D) with the
    same sharding as q.

    ``body``: the per-shard compute. ``"flash"`` = the Pallas blockwise
    kernel + softmax-stat merging (no (L/N)^2 score materialization — the
    long-context configuration); ``"dense"`` = one XLA score matrix per
    rotation (fine at small shard lengths, and the CPU-test default);
    ``"auto"`` = flash on TPU-class backends, dense on CPU.
    """
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    if body == "auto":
        body = "dense" if jax.default_backend() == "cpu" else "flash"
    spec = P(None, axis_name, None, None)
    if body == "flash":
        local = functools.partial(
            _ring_flash_local, axis_name=axis_name,
            interpret=jax.default_backend() == "cpu",
        )
        # the Pallas call's outputs carry no varying-mesh-axes type, which
        # trips shard_map's vma checker; the body's pcast/psum usage is the
        # same as the (checked) dense body's
        fn = jax.shard_map(
            local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
    elif body == "dense":
        local = functools.partial(
            _ring_attention_local, axis_name=axis_name, scale=scale
        )
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
        )
    else:
        raise ValueError(f"unknown ring body {body!r}")
    return fn(q, k, v)


# ---------------------------------------------------------------------------
# Model integration: ``attention_impl="ring"``
#
# ``sdtpu.ops.attention`` is mesh-agnostic; the mesh + ring axis are supplied
# ambiently by wrapping the traced call (pipeline.generate / unet_forward) in
# ``ring_context``.  The context is read at TRACE time, so the shard_map is
# baked into the compiled program; cached compilations keep the mesh they
# were traced under.
# ---------------------------------------------------------------------------

_ring_ctx = threading.local()


@contextlib.contextmanager
def ring_context(mesh: Mesh, axis_name: str = "sp"):
    """Activate sequence-parallel ring attention for traces entered inside
    this block (used with ``attention_impl='ring'``)."""
    prev = getattr(_ring_ctx, "value", None)
    _ring_ctx.value = (mesh, axis_name)
    try:
        yield
    finally:
        _ring_ctx.value = prev


def get_ring_context() -> Optional[Tuple[Mesh, str]]:
    return getattr(_ring_ctx, "value", None)


def maybe_ring_attention(q, k, v):
    """Ring attention when a context is active AND the sequence axis divides
    the ring; None tells the caller to fall back to dense/flash.  Self-
    attention only (Lq == Lkv): cross-attention's 77-token text context is
    tiny and never sequence-sharded."""
    ctx = get_ring_context()
    if ctx is None:
        return None
    mesh, axis = ctx
    n = mesh.shape[axis]
    if q.shape[1] != k.shape[1] or q.shape[1] % n != 0 or n == 1:
        return None
    return ring_attention(q, k, v, mesh, axis_name=axis)
