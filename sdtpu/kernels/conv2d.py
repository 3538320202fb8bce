"""Pallas implicit-GEMM 3x3 convolution (stride 1, same padding).

The UNet's FLOPs live in its 3x3 convs (reference: direct spatial loops,
``utils.mojo:1763-1809``); XLA's general conv lowering reaches only ~25-50%
MXU on the hot SD shapes (64x64x320..960 etc., measured in BENCHLOG.md).
This kernel reformulates the conv as 9 shifted (H*W, Ci) @ (Ci, co_tile)
matmuls accumulated in f32 — the whole feature map stays in VMEM per grid
cell, so each input tile is read once from HBM and the MXU sees large
aligned GEMMs.

Scope: stride-1 3x3 same-padding NHWC (every resblock conv); 1x1 convs are
already plain matmuls and stride-2 downsamples stay on the XLA path.  The
fused path engages only when the padded feature map fits the VMEM budget.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conv1 -> GN2 stats chaining inside resblocks (emit_stats/stats below):
# default ON; SDTPU_CONV_STATS=0 disables.  Read at TRACE time — same-process
# A/B tools mutate it per jit closure (the SDTPU_PACKED_OUT_PROJ pattern).
CONV_STATS_CHAIN = os.environ.get("SDTPU_CONV_STATS", "1") not in ("0", "false")

_VMEM_BUDGET = 72 * 1024 * 1024  # vs the kernel's 100 MB compiler limit
# (empirical: Mosaic's real stack allocation runs ~25% above this estimate —
#  a 128x128x512 map at co_tile=256 hit 105.9 MiB against a 104.5 MiB limit)


def _vmem_estimate(h, w, ci, co_tile, itemsize=2) -> int:
    """Conservative per-cell VMEM: double-buffered input/weight/output blocks,
    two copies of the f32 accumulator, plus one in-kernel shifted-window
    temporary (the 9 strided reshapes materialize one)."""
    in_b = (h + 2) * (w + 2) * ci * itemsize * 2
    k_b = 9 * ci * co_tile * itemsize * 2
    out_b = h * w * co_tile * itemsize * 2
    acc_b = h * w * co_tile * 4 * 2
    core_b = h * w * ci * itemsize
    return in_b + k_b + out_b + acc_b + core_b


def _co_tile_candidates(co: int):
    """Tile widths in preference order: exact (no padding), then 128-multiple
    divisors of co (no padding), then padding 128-multiples, largest first."""
    exact = [co]
    divisors = [t for t in (640, 512, 384, 256, 128)
                if t < co and t % 128 == 0 and co % t == 0]
    padded = [t for t in (512, 384, 256, 128)
              if t < co and t % 128 == 0 and co % t != 0]
    return exact + divisors + padded


def plan_co_tile(x_shape, kernel_shape):
    """Pick the best co_tile that fits VMEM, or None for the XLA path.

    Prefer co_tile == co (no output padding: tiling 320-out convs to 256
    rounds up to 512 and wastes 1.6x MXU work — seen in the XProf trace);
    fall back to 128-multiples."""
    b, h, w, ci = x_shape
    kh, kw, _, co = kernel_shape
    if (kh, kw) != (3, 3) or h % 8 != 0 or w % 8 != 0:
        return None
    # tiny channel counts (conv_in 4->320, conv_out 320->4) waste MXU lanes
    if ci < 64 or co < 64:
        return None
    # spatial cap: beyond 64x64 tokens Mosaic's register allocator spills
    # tens of MB of stack (measured: 66.9M spill slots at 96x96x960, VMEM
    # OOM at 128x128x512) that no buffer-level estimate predicts — those
    # shapes stay on the XLA conv path
    if h * w > 64 * 64:
        return None
    for co_tile in _co_tile_candidates(co):
        if _vmem_estimate(h, w, ci, co_tile) <= _VMEM_BUDGET:
            return co_tile
    return None


def _kernel(x_ref, k_ref, o_ref, *, h, w):
    x = x_ref[0]  # (H+2, W+2, Ci) — pre-padded on host side of the call
    ci = x.shape[-1]
    co = k_ref.shape[-1]
    acc = jnp.zeros((h * w, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x[dy : dy + h, dx : dx + w, :].reshape(h * w, ci)
            acc = acc + jnp.dot(
                xs, k_ref[dy, dx], preferred_element_type=jnp.float32
            )
    o_ref[0] = acc.reshape(h, w, co).astype(o_ref.dtype)


def fits_fused(x_shape, kernel_shape) -> bool:
    return plan_co_tile(x_shape, kernel_shape) is not None


# ---------------------------------------------------------------------------
# Row-slab variant: spatial blocking past the 64x64 register-pressure cap
# ---------------------------------------------------------------------------
#
# Beyond ~64x64 spatial tokens per grid cell Mosaic's register allocator
# spills tens of MB of stack (66.9M spill slots at 96x96x960 — BENCHLOG.md),
# so the whole-map kernel above refuses those shapes and SD2.1-768 (96x96)
# and SDXL-1024 (128x128) level-0 maps fell back to XLA convs.  Here the H
# axis is blocked into row slabs with a 1-row halo on each side.
#
# Halo mechanics (round-3 rework): Pallas block index maps are
# block-granular and cannot express overlapping windows, so the round-2
# kernel materialized every overlapping slab XLA-side first — a full extra
# padded copy of the input per conv whose dynamic-update-slice fusions
# cost ~10% of VAE-decode time (round-3 trace).  Instead the kernel takes
# the column-padded input THREE times — the core rows plus one-row
# top/bottom halos whose index maps clamp at the image edge
# (`max(s*ht-1, 0)` / `min(s*ht+ht, h-1)`) — and assembles the haloed slab
# in VMEM, cutting HBM traffic from ~3.1x the map (read + slab write +
# slab read) to ~2.06x (pad write + read); the clamped duplicate rows are
# masked back to the pad value in-kernel.  Measured (probe_slab_halo /
# chain-500 follow-up): exactly neutral on the UNet's <=64x64 maps, -2 to
# -6% standalone on the decoder's 128/256/512-px maps, plus the removed
# XLA-side DUS traffic e2e.  The fused-upsample variant uses views of the
# raw SMALL map (~0.53x traffic) and expands nearest-2x in VMEM.
#
# The optional prologue applies a per-(batch, channel) affine + SiLU before
# the conv — the resblock's GroupNorm (+ time-embedding add) folds into that
# affine once XLA has computed the group statistics (a single fused
# reduction pass), so the normalized map is never materialized in HBM.

_SLAB_TOKEN_CAP = 64 * 64  # validated cell size; spills observed above this


def _slab_vmem(ht, w, ci, co_tile, *, has_pro, has_res, itemsize=2) -> int:
    in_b = (ht + 2) * (w + 2) * ci * itemsize * 2  # double-buffered slab
    k_b = 9 * ci * co_tile * itemsize * 2
    out_b = ht * w * co_tile * itemsize * 2
    acc_b = ht * w * co_tile * 4 * 2
    core_b = ht * w * ci * itemsize  # shifted-window temporary
    if has_pro:
        core_b += (ht + 2) * (w + 2) * ci * 4  # f32 normalized slab
    res_b = ht * w * co_tile * itemsize * 2 if has_res else 0
    return in_b + k_b + out_b + acc_b + core_b + res_b


def plan_slab(x_shape, kernel_shape, *, has_prologue=False, has_residual=False,
              itemsize=2):
    """(h_tile, co_tile) for the row-slab kernel, or None for the XLA path.

    ``itemsize``: bytes per element of the compute dtype — pass
    ``x.dtype.itemsize`` so f32 runs don't under-budget VMEM 2x."""
    b, h, w, ci = x_shape
    kh, kw, _, co = kernel_shape
    if (kh, kw) != (3, 3) or h % 8 != 0 or w % 8 != 0:
        return None
    if ci < 64 or co < 64:
        return None
    for ht in (64, 48, 32, 16, 8):
        if h % ht != 0 or ht * w > _SLAB_TOKEN_CAP:
            continue
        for co_tile in _co_tile_candidates(co):
            if (
                _slab_vmem(ht, w, ci, co_tile, has_pro=has_prologue,
                           has_res=has_residual, itemsize=itemsize)
                <= _VMEM_BUDGET
            ):
                return ht, co_tile
    return None


def _slab_kernel(
    t_ref, x_ref, btm_ref, a_ref, b_ref, k_ref, cb_ref, r_ref, s_ref, z_ref,
    ws_ref, o_ref, st_ref=None, *, ht, w, h, has_pro, has_res, quant,
    upsample,
):
    # The slab index is grid dim 1 in BOTH grid orders (conv3x3_gemm_slab).
    si = pl.program_id(1)
    # Assemble the haloed slab IN VMEM from three raw-input views: the
    # single-row top/bottom halo blocks (index-map-clamped at the image
    # edges) around the core rows.  upsample=False: views of the
    # COLUMN-pre-padded input — (1, w+2, ci) halos around a (ht, w+2, ci)
    # core.  upsample=True: views of the raw small map — (1, ws, ci) halos
    # around a (hts, ws, ci) core.
    x = jnp.concatenate([t_ref[0], x_ref[0], btm_ref[0]], axis=0)
    ci = x.shape[-1]
    co = k_ref.shape[-1]
    if has_pro:
        # y = SiLU(x * a + b) with the GN(+temb) fold (applied on the small
        # map in the upsample case — a per-channel affine commutes with
        # nearest resampling).
        y = x.astype(jnp.float32) * a_ref[0] + b_ref[0]
        y = y * jax.nn.sigmoid(y)
    else:
        y = x
    if quant:
        # W8A8 with per-ci ASYMMETRIC affine quantization: the prologue
        # output quantizes in-register (q = round(y/s) + z; padding maps
        # to the zero-POINT z, i.e. real value 0) so the 9 contractions
        # run int8 x int8 -> int32 on the 2x MXU path.  The zero-point's
        # contraction term is a per-co constant pre-folded into the conv
        # bias (sdtpu/utils/quant.py:quantize_conv_w8a8).
        y = jnp.round(y * s_ref[0]) + z_ref[0]
        y = jnp.clip(y, -128.0, 127.0)
    pad_val = z_ref[0] if quant else jnp.zeros((), y.dtype)
    # Global output-space row of slab row r is si*ht - 1 + r; rows outside
    # [0, h) are the conv's zero padding (under ``views`` the clamped halo
    # index maps duplicate an edge row there — masked to the pad value).
    gr = si * ht - 1 + jax.lax.broadcasted_iota(jnp.int32, (ht + 2, 1, 1), 0)
    row_ok = (gr >= 0) & (gr < h)
    if upsample:
        # Nearest-2x expansion in VMEM: slab row r is output-space row
        # u = si*ht - 1 + r, which samples small row u//2.  With ht even
        # the halo rows land exactly on the odd/even boundary samples, so
        # the expansion is [small[0]] + repeat2(core) + [small[hts+1]];
        # columns expand by plain repeat, then gain the conv pad.  The
        # small map is the only HBM read — the 4x upsampled map is never
        # materialized.
        hts = ht // 2
        y = jnp.concatenate(
            [y[0:1], jnp.repeat(y[1 : hts + 1], 2, axis=0),
             y[hts + 1 : hts + 2]],
            axis=0,
        )
        y = jnp.repeat(y, 2, axis=1)
        zcol = jnp.broadcast_to(pad_val, (ht + 2, 1, ci)).astype(y.dtype)
        y = jnp.concatenate([zcol, y, zcol], axis=1)
        y = jnp.where(row_ok, y, pad_val)
    elif has_pro:
        # the zero pad rows/columns pass through the prologue as
        # SiLU(b) != 0 (or quantize off the zero-point) — mask them
        gc = jax.lax.broadcasted_iota(jnp.int32, (1, w + 2, 1), 1)
        y = jnp.where(row_ok & (gc > 0) & (gc < w + 1), y, pad_val)
    else:
        # no prologue: pads are already exact, only the clamped halo rows
        # need masking
        y = jnp.where(row_ok, y, pad_val)
    x = y.astype(jnp.int8 if quant else x.dtype)
    acc_t = jnp.int32 if quant else jnp.float32
    acc = jnp.zeros((ht * w, co), acc_t)
    for dy in range(3):
        for dx in range(3):
            xs = x[dy : dy + ht, dx : dx + w, :].reshape(ht * w, ci)
            acc = acc + jnp.dot(
                xs, k_ref[dy, dx], preferred_element_type=acc_t
            )
    if quant:
        acc = acc.astype(jnp.float32) * ws_ref[...]  # (1, co) per-co scale
    acc = acc + cb_ref[...]
    out = acc.reshape(ht, w, co)
    if has_res:
        out = out + r_ref[0].astype(jnp.float32)
    oc = out.astype(o_ref.dtype)
    o_ref[0] = oc
    if st_ref is not None:
        # Per-channel partial moments of the OUTPUT block, for the NEXT
        # GroupNorm's statistics: the consumer's stat pass is the one HBM
        # read XLA cannot fuse into this custom call (it re-reads the whole
        # map).  Stats are taken on the CAST value so they match what that
        # pass would have read.  Per-channel (not per-group) sums so the
        # consumer can fold its own temb offset before grouping.
        of = oc.astype(jnp.float32).reshape(ht * w, co)
        st_ref[0, 0] = jnp.stack(
            [jnp.sum(of, axis=0), jnp.sum(of * of, axis=0)], axis=0
        )


@functools.partial(
    jax.jit,
    static_argnames=("h_tile", "co_tile", "grid_order", "upsample",
                     "emit_stats", "interpret"),
)
def conv3x3_gemm_slab(
    x: jax.Array,
    kernel: jax.Array,
    conv_bias=None,
    *,
    prologue_scale=None,
    prologue_bias=None,
    residual=None,
    act_inv_scale=None,
    act_zp=None,
    w_scale=None,
    h_tile: int,
    co_tile: int,
    grid_order: str = "auto",
    upsample: bool = False,
    emit_stats: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Row-slab NHWC stride-1 same-pad 3x3 conv (+bias) (+residual), with an
    optional fused per-channel affine + SiLU prologue.

    x: (B, H, W, Ci); kernel HWIO; prologue_scale/bias: (B, Ci) f32 — the
    folded GroupNorm(+temb) affine (see ``gn_silu_conv3x3_slab``);
    residual: optional (B, H, W, Co) added to the conv output in-kernel.

    int8 (W8A8) path: when ``kernel`` is int8, ``act_inv_scale`` (Ci,) and
    ``w_scale`` (Co,) must be given (see :mod:`sdtpu.utils.quant`): the
    prologue output quantizes in-register per channel, the 9 contractions
    run int8 x int8 -> int32 on the MXU's 2x int8 path, and the int32
    accumulator is rescaled per output channel before bias/residual.
    Requires the prologue (the quantization rides its affine).

    ``grid_order`` picks which operand's blocks stay resident across the
    sweep (Mosaic skips the DMA when a block's index repeats between
    consecutive grid steps):

    * ``"input_outer"`` — grid (b, ns, co_tiles): each input slab is fetched
      once, but the WHOLE weight tensor is re-fetched b*ns times.
    * ``"weight_outer"`` — grid (co_tiles, ns, b): weights are fetched once,
      each input slab co_tiles times.
    * ``"auto"`` — minimize estimated DMA bytes:
      W*(b*ns) + I  vs  W + I*co_tiles.  SD's low-resolution resblock convs
      are weight-dominated (e.g. 16x16x2560->1280: 59 MB of weights vs
      1.6 MB of slabs — the round-3 trace showed them weight-DMA-bound at
      ~68% MXU), so weight_outer wins there; huge-map small-channel convs
      (VAE decoder 512x512x128, ns=64) would re-fetch weights 128x under
      input_outer.

    ``upsample=True`` fuses a nearest-2x upsample in front of the conv:
    x is the SMALL (B, H/2, W/2, Ci) map, the output is (B, H, W, Co), and
    the expansion happens in VMEM (the upsampled map is never in HBM —
    XLA's broadcast+reshape lowering of ``nearest_upsample`` cost ~7% of
    VAE-decode time, BENCHLOG round 3).  Requires even ``h_tile``;
    h_tile/co_tile are planned against the UPSAMPLED shape.

    ``emit_stats=True`` returns ``(out, moments)`` where moments is
    (B, 2, Co) f32 = per-channel [mean, mean-of-squares] of the OUTPUT over
    (H, W) — free GroupNorm statistics for the NEXT gn_silu_conv3x3_slab
    (``stats=``), saving that call's full-map HBM stat pass (XLA cannot
    fuse a reduction into this custom call's output).
    """
    b, hx, wx, ci = x.shape
    h, w = (2 * hx, 2 * wx) if upsample else (hx, wx)
    if upsample and h_tile % 2 != 0:
        raise ValueError("upsample=True requires an even h_tile")
    hts = h_tile // 2 if upsample else h_tile  # core block rows (input space)
    co = kernel.shape[-1]
    ns = h // h_tile
    co_pad = ((co + co_tile - 1) // co_tile) * co_tile
    if co_pad != co:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, co_pad - co)))
    if upsample:
        arr, wxb = x, wx  # raw small map; cols expand + pad in VMEM
    else:
        # column pad XLA-side (fuses into the producer's output write);
        # the ROW halos come from clamped single-row block index maps
        arr = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        wxb = wx + 2

    has_pro = prologue_scale is not None
    quant = kernel.dtype == jnp.int8
    if quant and not has_pro:
        raise ValueError("int8 slab conv requires the affine prologue")
    if has_pro:
        a = prologue_scale.astype(jnp.float32).reshape(b, 1, ci)
        bb = prologue_bias.astype(jnp.float32).reshape(b, 1, ci)
    else:
        a = jnp.ones((b, 1, ci), jnp.float32)
        bb = jnp.zeros((b, 1, ci), jnp.float32)
    if quant:
        s = act_inv_scale.astype(jnp.float32).reshape(1, 1, ci)
        z = (
            act_zp.astype(jnp.float32).reshape(1, 1, ci)
            if act_zp is not None
            else jnp.zeros((1, 1, ci), jnp.float32)
        )
        ws = w_scale.astype(jnp.float32).reshape(1, co)
        if co_pad != co:
            ws = jnp.pad(ws, ((0, 0), (0, co_pad - co)))
    else:
        s = jnp.ones((1, 1, ci), jnp.float32)
        z = jnp.zeros((1, 1, ci), jnp.float32)
        ws = jnp.ones((1, co_pad), jnp.float32)
    cb = (
        conv_bias.astype(jnp.float32).reshape(1, co)
        if conv_bias is not None
        else jnp.zeros((1, co), jnp.float32)
    )
    if co_pad != co:
        cb = jnp.pad(cb, ((0, 0), (0, co_pad - co)))
    has_res = residual is not None
    if has_res:
        res = residual
        if co_pad != co:
            res = jnp.pad(res, ((0, 0), (0, 0), (0, 0), (0, co_pad - co)))
        res_ht, res_w = h_tile, w
        res_idx = lambda bi, si, oi: (bi, si, 0, oi)  # noqa: E731
    else:
        res = jnp.zeros((b, 1, 1, co_pad), x.dtype)
        res_ht, res_w = 1, 1
        res_idx = lambda bi, si, oi: (bi, 0, 0, oi)  # noqa: E731

    n_co = co_pad // co_tile
    if grid_order == "auto":
        w_bytes = 9 * ci * co_pad * kernel.dtype.itemsize
        slab_bytes = b * ns * (hts + 2) * (wx + 2) * ci * x.dtype.itemsize
        grid_order = (
            "weight_outer"
            if w_bytes * (b * ns - 1) > slab_bytes * (n_co - 1)
            else "input_outer"
        )
    # index maps are written in (bi, si, oi) terms; ``reorder`` adapts them
    # to the actual grid axis order (the slab/prologue index si stays grid
    # dim 1 in both orders — _slab_kernel reads pl.program_id(1))
    if grid_order == "weight_outer":
        grid = (n_co, ns, b)
        reorder = lambda f: (lambda oi, si, bi: f(bi, si, oi))  # noqa: E731
    else:
        grid = (b, ns, n_co)
        reorder = lambda f: f  # noqa: E731

    # top halo row, core rows, bottom halo row — three views of the same
    # input; the single-row halo index maps clamp at the edges (the
    # duplicated row is masked to the pad value in-kernel)
    top_spec = pl.BlockSpec(
        (1, 1, wxb, ci),
        reorder(lambda bi, si, oi: (
            bi, jnp.maximum(si * hts - 1, 0), 0, 0)),
        memory_space=pltpu.VMEM,
    )
    core_spec = pl.BlockSpec(
        (1, hts, wxb, ci),
        reorder(lambda bi, si, oi: (bi, si, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    bot_spec = pl.BlockSpec(
        (1, 1, wxb, ci),
        reorder(lambda bi, si, oi: (
            bi, jnp.minimum(si * hts + hts, hx - 1), 0, 0)),
        memory_space=pltpu.VMEM,
    )

    out_shape = jax.ShapeDtypeStruct((b, h, w, co_pad), x.dtype)
    out_spec = pl.BlockSpec(
        (1, h_tile, w, co_tile),
        reorder(lambda bi, si, oi: (bi, si, 0, oi)),
        memory_space=pltpu.VMEM,
    )
    if emit_stats:
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((b, ns, 2, co_pad), jnp.float32),
        )
        out_spec = (
            out_spec,
            pl.BlockSpec(
                (1, 1, 2, co_tile),
                reorder(lambda bi, si, oi: (bi, si, 0, oi)),
                memory_space=pltpu.VMEM,
            ),
        )
    out = pl.pallas_call(
        functools.partial(
            _slab_kernel, ht=h_tile, w=w, h=h, has_pro=has_pro,
            has_res=has_res, quant=quant, upsample=upsample,
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            top_spec,
            core_spec,
            bot_spec,
            pl.BlockSpec((1, 1, ci),
                         reorder(lambda bi, si, oi: (bi, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ci),
                         reorder(lambda bi, si, oi: (bi, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, 3, ci, co_tile),
                reorder(lambda bi, si, oi: (0, 0, 0, oi)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, co_tile),
                         reorder(lambda bi, si, oi: (0, oi)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, res_ht, res_w, co_tile), reorder(res_idx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, ci),
                         reorder(lambda bi, si, oi: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ci),
                         reorder(lambda bi, si, oi: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile),
                         reorder(lambda bi, si, oi: (0, oi)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(arr, arr, arr, a, bb, kernel, cb, res, s, z, ws)

    if emit_stats:
        out, st = out
        # tiny (B, ns, 2, co) -> (B, 2, co) reduction; /HW turns the raw
        # sums into [mean, mean-of-squares]
        return out[..., :co], st.sum(axis=1)[..., :co] / float(h * w)
    return out[..., :co]


def gn_silu_conv3x3_slab(
    x: jax.Array,
    norm_params: dict,
    kernel: jax.Array,
    conv_bias=None,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    temb=None,
    residual=None,
    act_inv_scale=None,
    act_zp=None,
    w_scale=None,
    stats=None,
    h_tile: int,
    co_tile: int,
    grid_order: str = "auto",
    emit_stats: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """(x [+ temb]) -> GroupNorm -> SiLU -> 3x3 conv (+bias) (+residual) for
    maps past the whole-map kernel's spatial cap.  When ``kernel`` is int8,
    ``act_inv_scale``/``w_scale`` engage the W8A8 path (sdtpu/utils/quant.py).

    Group statistics run as one fused XLA reduction (fp32); the normalize +
    SiLU collapse to a per-(batch, channel) affine applied inside the slab
    kernel's prologue, so the normalized map never round-trips HBM:
    GN(x + t) = x * (inv * gamma) + ((t - mu) * inv * gamma + beta).

    ``stats``: optional (B, 2, Ci) f32 per-channel [mean, mean-of-squares]
    of ``x`` over (H, W) — the ``emit_stats`` output of the producing slab
    conv.  When given, the GN statistics derive from it with per-channel
    math only (the temb offset folds in exactly: E[(x+t)^2] =
    E[x^2] + 2 t E[x] + t^2), and the full-map stat read is skipped.
    ``emit_stats``: forward to :func:`conv3x3_gemm_slab` — returns
    ``(out, moments)`` for the next consumer.
    """
    b, h, w, ci = x.shape
    cpg = ci // num_groups
    if stats is not None:
        m1 = stats[:, 0].astype(jnp.float32)  # (B, Ci)
        m2 = stats[:, 1].astype(jnp.float32)
        t = None
        if temb is not None:
            t = temb.astype(jnp.float32)
            m2 = m2 + 2.0 * t * m1 + jnp.square(t)
            m1 = m1 + t
        mean = jnp.mean(m1.reshape(b, num_groups, cpg), axis=2)  # (B, G)
        ex2 = jnp.mean(m2.reshape(b, num_groups, cpg), axis=2)
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    else:
        xf = x.astype(jnp.float32)
        t = None
        if temb is not None:
            t = temb.astype(jnp.float32)  # (B, Ci)
            xf = xf + t[:, None, None, :]
        xg = xf.reshape(b, h * w, num_groups, cpg)
        mean = jnp.mean(xg, axis=(1, 3))  # (B, G)
        var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    invc = jnp.repeat(inv, cpg, axis=1)  # (B, Ci)
    muc = jnp.repeat(mean, cpg, axis=1)
    gamma = norm_params["scale"].astype(jnp.float32)[None]
    beta = norm_params["bias"].astype(jnp.float32)[None]
    a = invc * gamma
    off = -muc if t is None else t - muc
    bb = off * a + beta
    return conv3x3_gemm_slab(
        x, kernel, conv_bias,
        prologue_scale=a, prologue_bias=bb, residual=residual,
        act_inv_scale=act_inv_scale, act_zp=act_zp, w_scale=w_scale,
        h_tile=h_tile, co_tile=co_tile, grid_order=grid_order,
        emit_stats=emit_stats, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("co_tile", "interpret"))
def conv3x3_gemm(
    x: jax.Array,
    kernel: jax.Array,
    bias=None,
    *,
    co_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """NHWC stride-1 same-padding 3x3 conv.  x: (B, H, W, Ci); kernel HWIO."""
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    co_tile = min(co_tile, co)
    # pad channels-out to a tile multiple; slice after
    co_pad = ((co + co_tile - 1) // co_tile) * co_tile
    if co_pad != co:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, co_pad - co)))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co_pad), x.dtype),
        grid=(b, co_pad // co_tile),
        in_specs=[
            pl.BlockSpec(
                (1, h + 2, w + 2, ci),
                lambda bi, oi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, ci, co_tile),
                lambda bi, oi: (0, 0, 0, oi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, co_tile),
            lambda bi, oi: (bi, 0, 0, oi),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, kernel)

    out = out[..., :co]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
