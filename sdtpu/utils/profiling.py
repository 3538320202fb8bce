"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling" row).

The reference's only observability is bare progress ``print``s
(``pipeline.mojo:55,68,84,122,126``).  Here:

* :func:`stage` — a ``jax.named_scope`` + optional wall-clock context so
  CLIP/UNet/VAE stages are labeled in XProf traces and can be timed;
* :func:`trace` — wraps ``jax.profiler.trace`` for TensorBoard/XProf dumps;
* :class:`StageTimer` — accumulates host-visible stage timings (forces
  device sync; see ``runtime.device_sync`` for why block_until_ready is not
  enough through the axon relay);
* :func:`checked` — wraps a function with ``checkify`` NaN/div checks for
  debugging numerical issues (SURVEY.md §5 "race detection / sanitizers"
  row: the functional analogue is value checking, not thread sanitizers).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

from sdtpu.utils.runtime import device_sync


@contextlib.contextmanager
def stage(name: str):
    """Label a code region for XProf; usable around traced JAX code."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sdtpu_trace"):
    """Capture an XProf trace viewable in TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage accumulator with forced device synchronization."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def time(self, name: str, result_holder: Optional[list] = None):
        t0 = time.perf_counter()
        yield
        if result_holder:
            device_sync(result_holder[0])
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name:24s} {total*1000:9.2f} ms total  "
                         f"{total/n*1000:8.2f} ms/call  x{n}")
        return "\n".join(lines)


def checked(fn):
    """Wrap ``fn`` with checkify NaN/div error tracking:
    ``err, out = checked(f)(...); err.throw()``."""
    from jax.experimental import checkify

    return checkify.checkify(
        fn, errors=checkify.float_checks
    )
