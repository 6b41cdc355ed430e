"""KV cache as a donated jax carry.

Replaces the reference's KV-cache-as-graph-views pattern (ggml_cpy into
view_1d/view_3d windows, examples/gpt-2/main-backend.cpp:446 gpt2_graph and
the cell-managed variant main-batched.cpp:88 gpt2_kv_cache). The cache is a
tuple of per-layer (max_seq, n_kv_head, head_dim) arrays carried through jit
with buffer donation and updated in place via dynamic_update_slice.
Two layout rules, both learned from a 51 GB compile-time OOM on the 7B
decode loop: (1) per-layer arrays, not one stacked (L, ...) array — a layer
update must touch only that layer's buffer, or every update materializes a
full-cache temporary; (2) attention-consumption order (n_kv_head, max_seq,
head_dim) — per-step transposes make XLA materialize padded transposed
copies of the whole cache.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: tuple  # per layer: (n_kv_head, max_seq, head_dim)
    v: tuple
    length: jax.Array  # scalar int32: number of valid positions

    def tree_flatten(self):
        return (self.k, self.v, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layer: int, max_seq: int, n_kv_head: int, head_dim: int,
               dtype=jnp.float32) -> "KVCache":
        shape = (n_kv_head, max_seq, head_dim)
        return cls(
            k=tuple(jnp.zeros(shape, dtype) for _ in range(n_layer)),
            v=tuple(jnp.zeros(shape, dtype) for _ in range(n_layer)),
            length=jnp.zeros((), jnp.int32),
        )

    @property
    def n_layer(self) -> int:
        return len(self.k)

    @property
    def max_seq(self) -> int:
        return self.k[0].shape[1]

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "KVCache":
        """Write (S, n_kv_head, hd) at positions [start, start+S) of layer."""
        k_t = jnp.transpose(k_new, (1, 0, 2)).astype(self.k[layer].dtype)
        v_t = jnp.transpose(v_new, (1, 0, 2)).astype(self.v[layer].dtype)
        k_l = jax.lax.dynamic_update_slice(self.k[layer], k_t, (0, start, 0))
        v_l = jax.lax.dynamic_update_slice(self.v[layer], v_t, (0, start, 0))
        k = self.k[:layer] + (k_l,) + self.k[layer + 1:]
        v = self.v[:layer] + (v_l,) + self.v[layer + 1:]
        return KVCache(k, v, self.length)

    def advance(self, n) -> "KVCache":
        return KVCache(self.k, self.v, self.length + n)
