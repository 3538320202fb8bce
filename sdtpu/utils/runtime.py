"""Runtime/compilation environment helpers.

This environment reaches its TPU through a relay where XLA compilation is
remote and expensive (tens of seconds to minutes per program); the
persistent compilation cache makes every program a one-time cost.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.jax_cache") -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    TPU-class backends only: CPU executables are AOT-compiled against exact
    host CPU features, and a cache entry produced on a different machine (the
    remote compile service) loads with a SIGILL hazard.
    """
    import jax

    try:
        if jax.default_backend() == "cpu":
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: carry on without the cache


def device_sync(x) -> None:
    """Force completion of a computation.

    ``block_until_ready`` does not truly synchronize through the axon relay;
    a device->host scalar fetch does.  Use this for timing.
    """
    import jax
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
