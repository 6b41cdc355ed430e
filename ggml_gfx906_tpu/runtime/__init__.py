"""Runtime: KV cache, sampling, executor, batching (ref: ggml-backend
scheduler + examples' eval loops)."""
from .kv_cache import KVCache  # noqa: F401
from .sampling import greedy, sample_top_k_top_p  # noqa: F401
