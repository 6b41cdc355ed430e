"""Quantization codecs (ref: src/ggml-quants.c, src/ggml-common.h)."""
from .types import (  # noqa: F401
    GGMLType,
    TYPE_TRAITS,
    TypeTraits,
    QK_K,
    K_SCALE_SIZE,
    row_size,
)
from .registry import (  # noqa: F401
    bytes_to_blocks,
    dequantize,
    dequantize_bytes,
    quantize,
    quantize_to_bytes,
    supported_quant_types,
)
