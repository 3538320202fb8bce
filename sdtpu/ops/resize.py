"""Spatial resizing.

Reference: ``Upsample`` (``helpers/utils.mojo:1979-2010``) — which is dead
code that scales channels and returns an uninitialized buffer (SURVEY.md §5.1
item 2); the intended op is nearest-neighbor 2x spatial upsampling.  Also
``resize_image`` (``utils.mojo:372-402``), the nearest-neighbor pre-resize of
img2img input images (``pipeline.mojo:69``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_upsample(x: jax.Array, scale: int = 2) -> jax.Array:
    """(N, H, W, C) -> (N, H*scale, W*scale, C) by repetition.

    Implemented with broadcast+reshape (not gather) so XLA lowers it to pure
    data movement fused with the following conv.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, scale, w, scale, c)
    )
    return x.reshape(n, h * scale, w * scale, c)


def resize_image(image: jax.Array, height: int, width: int) -> jax.Array:
    """Nearest-neighbor resize of an (H, W, C) or (N, H, W, C) image."""
    batched = image.ndim == 4
    if not batched:
        image = image[None]
    n, h, w, c = image.shape
    rows = jnp.clip((jnp.arange(height) * h) // height, 0, h - 1)
    cols = jnp.clip((jnp.arange(width) * w) // width, 0, w - 1)
    out = image[:, rows][:, :, cols]
    return out if batched else out[0]
