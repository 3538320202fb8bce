"""Dense layer (reference: ``Linear``, ``helpers/utils.mojo:1921-1976``).

Weights are stored (in, out) so the forward is a plain ``x @ W`` row-major
contraction on the MXU (the reference stores (out, in) and multiplies by the
transpose through a scalar triple loop, ``utils.mojo:1549-1569``).
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp

from sdtpu.utils import hostrng

_capture = threading.local()


@contextlib.contextmanager
def activation_capture(store: dict, site_by_kernel_id: dict):
    """Record per-feature input abs-max for selected linears (int8
    calibration, ``sdtpu/utils/calibrate.py``).

    ``site_by_kernel_id`` maps ``id(params["kernel"])`` -> site path;
    matched calls max-accumulate ``max |x|`` over all leading axes into
    ``store[path]``.  EAGER-ONLY: under jit the inputs are tracers with no
    values — calibration runs the forward un-jitted."""
    _capture.store = store
    _capture.sites = site_by_kernel_id
    try:
        yield store
    finally:
        _capture.store = None
        _capture.sites = None


def _maybe_capture(x, params):
    sites = getattr(_capture, "sites", None)
    if not sites:
        return
    site = sites.get(id(params.get("kernel")))
    if site is None:
        return
    if isinstance(x, jax.core.Tracer):
        raise RuntimeError(
            "activation_capture needs concrete values — run the forward "
            "eagerly (outside jit) during calibration"
        )
    import numpy as np

    amax = np.asarray(
        jnp.max(jnp.abs(x.astype(jnp.float32)),
                axis=tuple(range(x.ndim - 1)))
    )
    store = _capture.store
    prev = store.get(site)
    store[site] = amax if prev is None else np.maximum(prev, amax)


def linear(x: jax.Array, params: dict) -> jax.Array:
    _maybe_capture(x, params)
    if "kernel_q" in params:
        if "act_scale" in params:
            return linear_q8(x, params)
        return linear_q8_dyn(x, params)
    out = jnp.dot(x, params["kernel"].astype(x.dtype))
    bias = params.get("bias")
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def linear_q8(x: jax.Array, params: dict) -> jax.Array:
    """W8A8 linear: quantize ``x`` with the dict's per-feature affine code
    (the input must be the post-LN activation the scales were derived for —
    sdtpu/utils/quant.py), contract int8 x int8 -> int32 on the MXU's 2x
    path, rescale per output feature, and apply bias minus the exact
    zero-point correction."""
    from sdtpu.utils.quant import quantize_act

    q = quantize_act(x, params)
    acc = jax.lax.dot_general(
        q, params["kernel_q"],
        (((q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * params["w_scale"].astype(jnp.float32)
    out = out - params["zp_corr"].astype(jnp.float32)
    bias = params.get("bias")
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def linear_q8_dyn(x: jax.Array, params: dict) -> jax.Array:
    """W8A8 linear with a RUNTIME per-row activation scale (LLM.int8-style
    symmetric abs-max) for inputs whose range is not norm-pinned (attention
    out-projections, the GeGLU down-projection —
    sdtpu/utils/quant.py:_quantize_linear_dyn).  The row abs-max maps to
    exactly +-127, so no clip is needed; the rescale is one fused
    outer-product multiply after the int8 x int8 -> int32 MXU dot."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.round(xf / scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, params["kernel_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * scale
    out = out * params["w_scale"].astype(jnp.float32)
    bias = params.get("bias")
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def init_linear(
    key: jax.Array,
    in_features: int,
    out_features: int,
    *,
    use_bias: bool = True,
    dtype=jnp.float32,
) -> dict:
    """U(-1/sqrt(in), 1/sqrt(in)) — the intended init of the reference's
    double-sqrt quirk (``utils.mojo:1940-1944``, SURVEY.md §5.1 item 9).
    """
    bound = in_features**-0.5
    k_key, b_key = hostrng.split(key)
    params = {
        "kernel": hostrng.uniform(
            k_key, (in_features, out_features), dtype, -bound, bound
        )
    }
    if use_bias:
        params["bias"] = hostrng.uniform(
            b_key, (out_features,), dtype, -bound, bound
        )
    return params
