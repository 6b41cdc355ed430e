"""Slot-based batched KV cache for the serving engine.

ref: the reference manages KV cells per sequence id in host code
(gpt2_kv_cache/gpt2_batch, examples/gpt-2/main-batched.cpp:88-139,407-430).
Here each request owns a slot b of a preallocated
(n_layer, B, max_seq, n_kv_head, head_dim) region; per-slot lengths drive
the attention masks, and slot recycling is the continuous-batching part
(runtime/engine.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class BatchedKVCache:
    k: jax.Array  # (n_layer, B, max_seq, n_kv_head, head_dim)
    v: jax.Array
    lengths: jax.Array  # (B,) int32 valid positions per slot

    def tree_flatten(self):
        return (self.k, self.v, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layer: int, max_batch: int, max_seq: int,
               n_kv_head: int, head_dim: int, dtype=jnp.float32):
        shape = (n_layer, max_batch, max_seq, n_kv_head, head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((max_batch,), jnp.int32))

    @property
    def max_batch(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "BatchedKVCache":
        """Write (B, S, n_kv_head, hd) at per-slot positions start (B,)."""

        def write(buf, new):
            # vmap over slots: each writes its S rows at its own offset
            def one(slot_buf, slot_new, s0):
                return jax.lax.dynamic_update_slice(
                    slot_buf, slot_new.astype(slot_buf.dtype), (s0, 0, 0))

            return buf.at[layer].set(
                jax.vmap(one)(buf[layer], new, start))

        return BatchedKVCache(write(self.k, k_new), write(self.v, v_new),
                              self.lengths)

    def set_slot(self, b: int, k_slot: jax.Array, v_slot: jax.Array,
                 length) -> "BatchedKVCache":
        """Install a prefilled single-sequence cache (n_layer, S, H, D) into
        slot b (used when admitting a new request)."""
        s = k_slot.shape[1]
        k = jax.lax.dynamic_update_slice(
            self.k, k_slot[:, None].astype(self.k.dtype), (0, b, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(
            self.v, v_slot[:, None].astype(self.v.dtype), (0, b, 0, 0, 0))
        return BatchedKVCache(k, v, self.lengths.at[b].set(length))
