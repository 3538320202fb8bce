"""Host-side parameter-init RNG.

Random weight init (the reference's only weight source, ``utils.mojo:1719-1726``)
does not need device RNG: the eager ``jax.random`` calls it used to make cost
one tiny XLA compile per parameter — ~15 s CPU for even the smallest test
pipeline (hundreds of programs), and on TPU one ~28 ms relay round-trip per
eager op on top (CLAUDE.md).  This module provides a ``jax.random``-shaped
surface (``key``/``split``/``uniform``/``normal``) backed by numpy's Philox
counter-based generator, so ``init_*`` builds the whole tree on the host with
zero compiles.

Semantics mirror ``jax.random``'s functional contract:

- ``split`` is PURE: splitting the same key twice yields the same children
  (we derive child ``SeedSequence``s by extending ``spawn_key`` explicitly
  instead of calling the stateful ``SeedSequence.spawn``).
- draws are PURE: every ``uniform``/``normal`` call builds a fresh
  ``Generator`` from the key, so the same key always yields the same array.
- numpy guarantees Philox / ``SeedSequence`` stream stability across
  platforms and versions, so init values are as reproducible as jax's
  threefry was.

Every function also accepts a real jax PRNG key and falls through to
``jax.random`` — callers that pass jax keys (older tests, external code)
keep their exact previous behavior.
"""

from __future__ import annotations

import numpy as np


class HostKey:
    """A functional PRNG key backed by ``np.random.SeedSequence``."""

    __slots__ = ("ss",)

    def __init__(self, ss: np.random.SeedSequence):
        self.ss = ss

    def __repr__(self):  # pragma: no cover - debug aid
        return f"HostKey(entropy={self.ss.entropy}, spawn_key={self.ss.spawn_key})"


def key(seed: int) -> HostKey:
    return HostKey(np.random.SeedSequence(int(seed)))


def ensure_key(k):
    """Coerce an int seed to a HostKey; pass jax keys / HostKeys through.
    Model-level ``init_*`` entry points call this so ``init_unet(0, cfg)``
    takes the compile-free host path by default."""
    return key(k) if isinstance(k, int) else k


def split(k, num: int = 2):
    if not isinstance(k, HostKey):
        import jax

        return jax.random.split(k, num)
    # Pure analogue of ss.spawn(num): child i = same entropy, spawn_key + (i,)
    return [
        HostKey(
            np.random.SeedSequence(
                entropy=k.ss.entropy, spawn_key=tuple(k.ss.spawn_key) + (i,)
            )
        )
        for i in range(num)
    ]


def _gen(k: HostKey) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=k.ss.generate_state(2, np.uint64)))


def uniform(k, shape=(), dtype=np.float32, minval=0.0, maxval=1.0):
    if not isinstance(k, HostKey):
        import jax

        return jax.random.uniform(k, shape, dtype, minval, maxval)
    u = np.asarray(_gen(k).random(size=shape, dtype=np.float64))
    return (u * (float(maxval) - float(minval)) + float(minval)).astype(dtype)


def normal(k, shape=(), dtype=np.float32):
    if not isinstance(k, HostKey):
        import jax

        return jax.random.normal(k, shape, dtype)
    return np.asarray(
        _gen(k).standard_normal(size=shape, dtype=np.float64)
    ).astype(dtype)
