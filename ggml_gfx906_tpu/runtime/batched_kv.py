"""Slot-based batched KV cache for the serving engine.

ref: the reference manages KV cells per sequence id in host code
(gpt2_kv_cache/gpt2_batch, examples/gpt-2/main-batched.cpp:88-139,407-430).
Here each request owns a slot b of preallocated per-layer
(B, n_kv_head, max_seq, head_dim) buffers; per-slot lengths drive the
attention masks, and slot recycling is the continuous-batching part
(runtime/engine.py). Per-layer arrays for the same in-place-update reason
as KVCache.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class BatchedKVCache:
    k: tuple  # per layer: (B, n_kv_head, max_seq, head_dim)
    v: tuple
    lengths: jax.Array  # (B,) int32 valid positions per slot

    def tree_flatten(self):
        return (self.k, self.v, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layer: int, max_batch: int, max_seq: int,
               n_kv_head: int, head_dim: int, dtype=jnp.float32):
        shape = (max_batch, n_kv_head, max_seq, head_dim)
        # one allocation sliced apart — see runtime/kv_cache.py::create
        buf = jnp.zeros((2 * n_layer,) + shape, dtype)
        return cls(tuple(buf[i] for i in range(n_layer)),
                   tuple(buf[n_layer + i] for i in range(n_layer)),
                   jnp.zeros((max_batch,), jnp.int32))

    @property
    def max_batch(self) -> int:
        return self.k[0].shape[0]

    @property
    def max_seq(self) -> int:
        return self.k[0].shape[2]

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "BatchedKVCache":
        """Write (B, S, n_kv_head, hd) at per-slot positions start (B,)."""

        def write(buf, new):
            def one(slot_buf, slot_new, s0):
                # slot_new (S, H, D) → (H, S, D) at column s0
                t = jnp.transpose(slot_new, (1, 0, 2)).astype(slot_buf.dtype)
                return jax.lax.dynamic_update_slice(slot_buf, t, (0, s0, 0))

            return jax.vmap(one)(buf, new, start)

        k = self.k[:layer] + (write(self.k[layer], k_new),) + self.k[layer + 1:]
        v = self.v[:layer] + (write(self.v[layer], v_new),) + self.v[layer + 1:]
        return BatchedKVCache(k, v, self.lengths)

    def set_slot(self, b, k_slot: tuple, v_slot: tuple,
                 length) -> "BatchedKVCache":
        """Install a prefilled single-sequence cache (per-layer (H, S, D)
        tuples) into slot b (used when admitting a new request)."""

        def ins(buf, new):
            return jax.lax.dynamic_update_slice(
                buf, new[None].astype(buf.dtype), (b, 0, 0, 0))

        k = tuple(ins(kb, kn) for kb, kn in zip(self.k, k_slot))
        v = tuple(ins(vb, vn) for vb, vn in zip(self.v, v_slot))
        return BatchedKVCache(k, v, self.lengths.at[b].set(length))
