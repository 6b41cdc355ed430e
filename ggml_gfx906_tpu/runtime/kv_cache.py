"""KV cache as a donated jax carry, optionally int8-quantized.

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

Quantized mode (`quant=True`) is the analogue of the reference's quantized
KV cache (Q8_0 K/V FlashAttention instances, src/ggml-cuda/fattn.cu:180-270):
rows are stored int8 with one f32 absmax scale per (head, position) vector —
per-row rather than per-32 granularity because the flash kernel folds scales
into score-matrix columns (ops/pallas/flash_attn.py), which needs them
lane-aligned per cache row. 4× less HBM traffic than f32 K/V per token.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def quantize_rows(x: jax.Array):
    """x (..., D) f32/bf16 → (int8 (..., D), f32 scale (...,))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    d = amax / jnp.float32(127)
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1), 0.0)
    # C roundf semantics (matches ops/act_quant.py)
    s = xf * inv[..., None]
    qs = (jnp.sign(s) * jnp.floor(jnp.abs(s) + 0.5)).astype(jnp.int8)
    return qs, d


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: tuple  # per layer: (n_kv_head, max_seq, head_dim)
    v: tuple
    k_d: tuple  # per layer: (n_kv_head, max_seq) f32 scales, or () if dense
    v_d: tuple
    length: jax.Array  # scalar int32: number of valid positions

    def tree_flatten(self):
        return (self.k, self.v, self.k_d, self.v_d, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layer: int, max_seq: int, n_kv_head: int, head_dim: int,
               dtype=jnp.float32, quant: bool = False) -> "KVCache":
        shape = (n_kv_head, max_seq, head_dim)

        def distinct(n, shp, dt):
            # one allocation sliced apart: repeated jnp.zeros of identical
            # shape/dtype can alias one buffer, which trips XLA's donation
            # check ("buffer previously donated in the same Execute")
            buf = jnp.zeros((n,) + shp, dt)
            return tuple(buf[i] for i in range(n))

        if quant:
            qkv = distinct(2 * n_layer, shape, jnp.int8)
            qd = distinct(2 * n_layer, shape[:2], jnp.float32)
            return cls(
                k=qkv[:n_layer], v=qkv[n_layer:],
                k_d=qd[:n_layer], v_d=qd[n_layer:],
                length=jnp.zeros((), jnp.int32),
            )
        kv = distinct(2 * n_layer, shape, dtype)
        return cls(
            k=kv[:n_layer],
            v=kv[n_layer:],
            k_d=(), v_d=(),
            length=jnp.zeros((), jnp.int32),
        )

    @property
    def quantized(self) -> bool:
        return len(self.k_d) > 0

    @property
    def n_layer(self) -> int:
        return len(self.k)

    @property
    def max_seq(self) -> int:
        return self.k[0].shape[1]

    def layer_kv(self, layer: int):
        """(k, v, k_scale, v_scale) for attention; scales None if dense."""
        if self.quantized:
            return (self.k[layer], self.v[layer],
                    self.k_d[layer], self.v_d[layer])
        return self.k[layer], self.v[layer], None, None

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "KVCache":
        """Write (S, n_kv_head, hd) at positions [start, start+S) of layer."""
        k_t = jnp.transpose(k_new, (1, 0, 2))
        v_t = jnp.transpose(v_new, (1, 0, 2))
        kd, vd = self.k_d, self.v_d
        if self.quantized:
            k_t, kd_t = quantize_rows(k_t)
            v_t, vd_t = quantize_rows(v_t)
            kd_l = jax.lax.dynamic_update_slice(kd[layer], kd_t, (0, start))
            vd_l = jax.lax.dynamic_update_slice(vd[layer], vd_t, (0, start))
            kd = kd[:layer] + (kd_l,) + kd[layer + 1:]
            vd = vd[:layer] + (vd_l,) + vd[layer + 1:]
        else:
            k_t = k_t.astype(self.k[layer].dtype)
            v_t = v_t.astype(self.v[layer].dtype)
        k_l = jax.lax.dynamic_update_slice(self.k[layer], k_t, (0, start, 0))
        v_l = jax.lax.dynamic_update_slice(self.v[layer], v_t, (0, start, 0))
        k = self.k[:layer] + (k_l,) + self.k[layer + 1:]
        v = self.v[:layer] + (v_l,) + self.v[layer + 1:]
        return KVCache(k, v, kd, vd, self.length)

    def advance(self, n) -> "KVCache":
        return KVCache(self.k, self.v, self.k_d, self.v_d, self.length + n)
