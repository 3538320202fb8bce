#!/usr/bin/env python3
"""Probe: does a Pallas int8 x int8 -> int32 dot compile on this Mosaic
toolchain, and does it actually deliver the v5e's 2x int8 MXU throughput at
the slab-conv matmul shapes?  Gate for the W8A8 slab-kernel design
(VERDICT.md round-2 item 2): if this probe shows ~2x, the quantized conv
kernel is worth building; if Mosaic routes int8 through conversion or the
speedup is marginal, stop at the design note.

Usage: python tools/probe_int8_dot.py [chain]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def matmul_kernel(x_ref, w_ref, o_ref, *, acc_t):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    ).astype(o_ref.dtype)


def make(m, k, n, in_dtype, acc_t, out_dtype):
    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            functools.partial(matmul_kernel, acc_t=acc_t),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            in_specs=[
                pl.BlockSpec((m, k), lambda: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, n), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(x, w)

    return f


SHAPES = [(1024, 2560, 512), (4096, 640, 640)]


def main():
    from sdtpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    for m, k, n in SHAPES:
        flops = 2 * m * k * n
        print(f"== ({m},{k})@({k},{n}) ==", flush=True)
        # NOTE: plain-XLA dot variants were tried and are INVALID in this
        # harness: dot is linear, so XLA algebraically splits
        # dot(x + carry, w) and hoists dot(x, w) out of the scan (one run
        # read 390% of peak).  Pallas calls are opaque to the simplifier;
        # XLA int8-dot viability was instead established e2e (the
        # transformer W8A8 path wins through plain jnp dots — BENCHLOG).
        for name, in_dtype, acc_t, out_dtype in [
            ("overhead ", jnp.bfloat16, None, jnp.bfloat16),
            ("bf16->f32", jnp.bfloat16, jnp.float32, jnp.bfloat16),
            ("int8->i32", jnp.int8, jnp.int32, jnp.int32),
        ]:
            try:
                if acc_t is None:  # chain-overhead baseline: no matmul
                    f = lambda x, w: x[:1, :1]
                else:
                    f = make(m, k, n, in_dtype, acc_t, out_dtype)
                x = jnp.ones((m, k), in_dtype)
                w = jnp.ones((k, n), in_dtype)

                @jax.jit
                def chained(x, w):
                    def body(c, _):
                        o = f((x + c).astype(in_dtype), w)
                        # fold output back (defeat hoisting); int path uses
                        # a cheap mod to keep values tiny
                        d = (o[:1, :1] % 3).astype(x.dtype)
                        return c + d * 0 + d, ()

                    c0 = jnp.zeros((1, 1), x.dtype)
                    c, _ = jax.lax.scan(body, c0, None, length=chain)
                    return c

                t0 = time.perf_counter()
                _sync(chained(x, w))
                comp = time.perf_counter() - t0
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    _sync(chained(x, w))
                    ts.append(time.perf_counter() - t0)
                med = float(np.median(ts))
                empty = jax.jit(lambda x: x[:1, :1])
                _sync(empty(x))
                rtts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    _sync(empty(x))
                    rtts.append(time.perf_counter() - t0)
                per = (med - float(np.median(rtts))) / chain
                pk = flops / per / 197e12 * 100
                print(f"  {name}: {per*1e6:8.1f} us/matmul "
                      f"({pk:5.1f}% of bf16 peak; compile {comp:.0f}s)",
                      flush=True)
            except Exception as exc:
                print(f"  {name}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
