"""KV cache as a donated jax carry.

Replaces the reference's KV-cache-as-graph-views pattern (ggml_cpy into
view_1d/view_3d windows, examples/gpt-2/main-backend.cpp:446 gpt2_graph and
the cell-managed variant main-batched.cpp:88 gpt2_kv_cache). On TPU the
cache is a preallocated (n_layer, 2, max_seq, n_kv_head, head_dim) array
carried through jit with buffer donation, updated in place via
dynamic_update_slice — XLA reuses the buffer, no copies.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: jax.Array  # (n_layer, max_seq, n_kv_head, head_dim)
    v: jax.Array
    length: jax.Array  # scalar int32: number of valid positions

    def tree_flatten(self):
        return (self.k, self.v, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layer: int, max_seq: int, n_kv_head: int, head_dim: int,
               dtype=jnp.float32) -> "KVCache":
        shape = (n_layer, max_seq, n_kv_head, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[1]

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "KVCache":
        """Write (S, n_kv_head, hd) at positions [start, start+S) of layer."""
        k = jax.lax.dynamic_update_slice(
            self.k, k_new[None].astype(self.k.dtype), (layer, start, 0, 0))
        v = jax.lax.dynamic_update_slice(
            self.v, v_new[None].astype(self.v.dtype), (layer, start, 0, 0))
        return KVCache(k, v, self.length)

    def advance(self, n) -> "KVCache":
        return KVCache(self.k, self.v, self.length + n)
