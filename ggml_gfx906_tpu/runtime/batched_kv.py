"""Slot-based batched KV cache for the serving engine.

ref: the reference manages KV cells per sequence id in host code
(gpt2_kv_cache/gpt2_batch, examples/gpt-2/main-batched.cpp:88-139,407-430).
Here each request owns a slot b of preallocated per-layer
(B, n_kv_head, max_seq, head_dim) buffers; per-slot lengths drive the
attention masks, and slot recycling is the continuous-batching part
(runtime/engine.py). Per-layer arrays for the same in-place-update reason
as KVCache.

Quantized mode (`quant=True`) mirrors KVCache's int8 rows + per-(slot,
head, position) f32 absmax scales — the serving-side analogue of the
reference's quantized-KV FlashAttention instances (src/ggml-cuda/
fattn.cu:180-270). At B=8/max_seq=1024 the dense bf16 cache read rivals
the weight stream itself; int8 halves it.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .kv_cache import quantize_rows


@jax.tree_util.register_pytree_node_class
@dataclass
class WindowDelta:
    """Per-window fresh K/V rows: per-layer (B, n_kv_head, depth, head_dim)
    bf16, written at a UNIFORM column per step (1.1 us vs the 42 us
    per-slot scatter — measured; see BatchedKVCache.absorb_delta)."""
    k: tuple
    v: tuple

    def tree_flatten(self):
        return (self.k, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def write(self, layer: int, k_new: jax.Array, v_new: jax.Array, step):
        """Write (B, S=1, H, D) rows at delta column `step` (scalar)."""
        k_t = jnp.transpose(k_new, (0, 2, 1, 3))        # (B, H, 1, D)
        v_t = jnp.transpose(v_new, (0, 2, 1, 3))
        zero = jnp.int32(0)
        k_l = jax.lax.dynamic_update_slice(
            self.k[layer], k_t.astype(self.k[layer].dtype),
            (zero, zero, jnp.asarray(step, jnp.int32), zero))
        v_l = jax.lax.dynamic_update_slice(
            self.v[layer], v_t.astype(self.v[layer].dtype),
            (zero, zero, jnp.asarray(step, jnp.int32), zero))
        return WindowDelta(self.k[:layer] + (k_l,) + self.k[layer + 1:],
                           self.v[:layer] + (v_l,) + self.v[layer + 1:])


@jax.tree_util.register_pytree_node_class
@dataclass
class BatchedKVCache:
    k: tuple  # per layer: (B, n_kv_head, max_seq, head_dim)
    v: tuple
    k_d: tuple  # per layer: (B, n_kv_head, max_seq) f32 scales, or () dense
    v_d: tuple
    lengths: jax.Array  # (B,) int32 valid positions per slot

    def tree_flatten(self):
        return (self.k, self.v, self.k_d, self.v_d, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layer: int, max_batch: int, max_seq: int,
               n_kv_head: int, head_dim: int, dtype=jnp.float32,
               quant: bool = False):
        shape = (max_batch, n_kv_head, max_seq, head_dim)
        # one allocation sliced apart — see runtime/kv_cache.py::create
        buf = jnp.zeros((2 * n_layer,) + shape, jnp.int8 if quant else dtype)
        k = tuple(buf[i] for i in range(n_layer))
        v = tuple(buf[n_layer + i] for i in range(n_layer))
        if quant:
            dbuf = jnp.zeros((2 * n_layer,) + shape[:3], jnp.float32)
            return cls(k, v, tuple(dbuf[i] for i in range(n_layer)),
                       tuple(dbuf[n_layer + i] for i in range(n_layer)),
                       jnp.zeros((max_batch,), jnp.int32))
        return cls(k, v, (), (), jnp.zeros((max_batch,), jnp.int32))

    @property
    def quantized(self) -> bool:
        return len(self.k_d) > 0

    @property
    def max_batch(self) -> int:
        return self.k[0].shape[0]

    @property
    def max_seq(self) -> int:
        return self.k[0].shape[2]

    def with_lengths(self, lengths) -> "BatchedKVCache":
        return BatchedKVCache(self.k, self.v, self.k_d, self.v_d, lengths)

    def layer_kv(self, layer: int, window: int | None = None):
        """(k, v, k_scale, v_scale) for attention, optionally windowed to
        cache positions [0, window) — scales None when dense."""
        kc, vc = self.k[layer], self.v[layer]
        kd = self.k_d[layer] if self.quantized else None
        vd = self.v_d[layer] if self.quantized else None
        if window is not None:
            kc, vc = kc[:, :, :window], vc[:, :, :window]
            if kd is not None:
                kd, vd = kd[:, :, :window], vd[:, :, :window]
        return kc, vc, kd, vd

    def make_delta(self, depth: int, dtype=jnp.bfloat16) -> "WindowDelta":
        """Fresh per-window delta buffers: (B, H, depth, D) bf16 per layer
        (always dense — the window's rows quantize once at absorb)."""
        L = len(self.k)
        B, H, _, D = self.k[0].shape
        buf = jnp.zeros((2 * L, B, H, depth, D), dtype)
        return WindowDelta(tuple(buf[i] for i in range(L)),
                           tuple(buf[L + i] for i in range(L)))

    def absorb_delta(self, delta: "WindowDelta", len0: jax.Array,
                     active: jax.Array, depth: int) -> "BatchedKVCache":
        """Install a window's delta rows with ONE wide scatter per array
        (a per-slot scatter costs ~42 us regardless of width — measured,
        docs/PERFORMANCE.md — so writing depth columns at once amortizes
        the per-step write tax by depth x). Rows land at positions
        len0[b]..len0[b]+depth-1; lengths advance by depth for active
        slots only (inactive slots' rows sit beyond their length: masked,
        and overwritten by admission's set_slot — the engine's standing
        stale-tail invariant)."""
        start = jnp.minimum(len0, self.max_seq - depth)

        def wide(buf, dbuf):
            def one(sb, d, s0):
                return jax.lax.dynamic_update_slice(
                    sb, d.astype(sb.dtype), (0, s0, 0))
            return jax.vmap(one)(buf, dbuf, start)

        def wide_d(buf, dnew):
            def one(sb, d, s0):
                return jax.lax.dynamic_update_slice(sb, d, (0, s0))
            return jax.vmap(one)(buf, dnew, start)

        ks, vs, kds, vds = [], [], [], []
        for li in range(len(self.k)):
            dk, dv = delta.k[li], delta.v[li]
            if self.quantized:
                kq, kd = quantize_rows(dk)
                vq, vd = quantize_rows(dv)
                ks.append(wide(self.k[li], kq))
                vs.append(wide(self.v[li], vq))
                kds.append(wide_d(self.k_d[li], kd))
                vds.append(wide_d(self.v_d[li], vd))
            else:
                ks.append(wide(self.k[li], dk))
                vs.append(wide(self.v[li], dv))
        new_len = len0 + jnp.int32(depth) * active.astype(jnp.int32)
        return BatchedKVCache(tuple(ks), tuple(vs), tuple(kds), tuple(vds),
                              new_len)

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array) -> "BatchedKVCache":
        """Write (B, S, n_kv_head, hd) at per-slot positions start (B,)."""
        quant = self.quantized

        def write(buf, new):
            def one(slot_buf, slot_new, s0):
                # slot_new (S, H, D) → (H, S, D) at column s0
                t = jnp.transpose(slot_new, (1, 0, 2)).astype(slot_buf.dtype)
                return jax.lax.dynamic_update_slice(slot_buf, t, (0, s0, 0))

            return jax.vmap(one)(buf, new, start)

        def write_scale(dbuf, dnew):
            def one(slot_d, slot_new, s0):
                return jax.lax.dynamic_update_slice(slot_d, slot_new,
                                                    (0, s0))
            return jax.vmap(one)(dbuf, dnew, start)

        kd, vd = self.k_d, self.v_d
        if quant:
            # (B, S, H, D) → per-row int8 + (B, H, S) scales
            kq, kdn = quantize_rows(jnp.transpose(k_new, (0, 2, 1, 3)))
            vq, vdn = quantize_rows(jnp.transpose(v_new, (0, 2, 1, 3)))
            k_new = jnp.transpose(kq, (0, 2, 1, 3))
            v_new = jnp.transpose(vq, (0, 2, 1, 3))
            kd_l = write_scale(kd[layer], kdn)
            vd_l = write_scale(vd[layer], vdn)
            kd = kd[:layer] + (kd_l,) + kd[layer + 1:]
            vd = vd[:layer] + (vd_l,) + vd[layer + 1:]
        k = self.k[:layer] + (write(self.k[layer], k_new),) + self.k[layer + 1:]
        v = self.v[:layer] + (write(self.v[layer], v_new),) + self.v[layer + 1:]
        return BatchedKVCache(k, v, kd, vd, self.lengths)

    def set_slot(self, b, k_slot: tuple, v_slot: tuple, length,
                 k_d: tuple = (), v_d: tuple = ()) -> "BatchedKVCache":
        """Install a prefilled single-sequence cache (per-layer (H, S, D)
        tuples, plus (H, S) scale tuples when quantized) into slot b (used
        when admitting a new request)."""

        def ins(buf, new):
            return jax.lax.dynamic_update_slice(
                buf, new[None].astype(buf.dtype), (b, 0, 0, 0))

        def ins_d(dbuf, dnew):
            return jax.lax.dynamic_update_slice(dbuf, dnew[None], (b, 0, 0))

        k = tuple(ins(kb, kn) for kb, kn in zip(self.k, k_slot))
        v = tuple(ins(vb, vn) for vb, vn in zip(self.v, v_slot))
        kd, vd = self.k_d, self.v_d
        if self.quantized:
            kd = tuple(ins_d(db, dn) for db, dn in zip(kd, k_d))
            vd = tuple(ins_d(db, dn) for db, dn in zip(vd, v_d))
        return BatchedKVCache(k, v, kd, vd, self.lengths.at[b].set(length))
