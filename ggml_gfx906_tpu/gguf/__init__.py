"""GGUF container format (ref: src/gguf.cpp, include/gguf.h)."""
from .format import (  # noqa: F401
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUF_VERSION,
    GGUFReader,
    GGUFValueType,
    GGUFWriter,
    TensorInfo,
)
