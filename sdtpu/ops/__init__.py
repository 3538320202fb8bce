"""Functional NN ops (the TPU-native analogue of the reference's L0/L1).

The reference implements these as Mojo structs with hand-rolled SIMD loops
over a 3-D ``Matrix`` (``helpers/utils.mojo:1693-2061``,
``helpers/attention.mojo``).  Here each op is a pure function over JAX arrays
in NHWC layout: XLA fuses the elementwise chains and tiles the matmuls/convs
onto the MXU, which replaces the reference's ``vectorize``/``parallelize``/
``tile_2d`` machinery (``utils.mojo:405-409``).  Parameters are plain pytrees
(dicts of arrays) created by each op's ``init_*`` helper.
"""

from sdtpu.ops.activations import silu, gelu_tanh, gelu_erf, quick_gelu, geglu
from sdtpu.ops.attention import (
    attention,
    init_attention,
    init_geglu,
    init_transformer_block,
    transformer_block,
)
from sdtpu.ops.conv import conv2d, init_conv2d
from sdtpu.ops.embedding import (
    embedding_lookup,
    init_embedding,
    timestep_embedding,
)
from sdtpu.ops.linear import init_linear, linear
from sdtpu.ops.norm import group_norm, init_group_norm, init_layer_norm, layer_norm
from sdtpu.ops.resize import nearest_upsample, resize_image

__all__ = [
    "attention",
    "conv2d",
    "embedding_lookup",
    "geglu",
    "gelu_erf",
    "gelu_tanh",
    "group_norm",
    "init_attention",
    "init_conv2d",
    "init_embedding",
    "init_geglu",
    "init_group_norm",
    "init_layer_norm",
    "init_linear",
    "init_transformer_block",
    "layer_norm",
    "linear",
    "nearest_upsample",
    "quick_gelu",
    "resize_image",
    "silu",
    "timestep_embedding",
    "transformer_block",
]
