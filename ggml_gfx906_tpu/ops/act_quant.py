"""On-device activation quantization — the quantize.cu analogue.

ref: src/ggml-cuda/quantize.cu (activations quantized to q8_1 on the fly to
feed the integer mmvq/mmq paths; SURVEY.md §2.8). Here the jax/XLA version
producing the same values as the reference codecs (same absmax scale and
round-half-away-from-zero), ready for the int8-MXU partial-sum kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_half_away(x):
    """C roundf semantics (jnp.round is half-to-even)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def quantize_q8(x: jax.Array, block: int = 32):
    """x (..., K) → (qs int8 (..., K), d f32 (..., K/block)).

    Same scale rule as quantize_row_q8_0/q8_1 (d = absmax/127); storage
    f16 rounding of d is NOT applied (activations never hit the wire)."""
    orig = x.shape
    k = orig[-1]
    assert k % block == 0
    xb = x.astype(jnp.float32).reshape(*orig[:-1], k // block, block)
    amax = jnp.max(jnp.abs(xb), axis=-1)
    d = amax / jnp.float32(127)
    inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1), 0.0)
    qs = _round_half_away(xb * inv[..., None]).astype(jnp.int8)
    return qs.reshape(orig), d


def quantize_q8_with_sums(x: jax.Array, block: int = 32):
    """Also return per-block quant sums (block_q8_1's `s = d*sum(qs)` /
    q8_K's bsums — needed by the affine-quant integer dot paths)."""
    qs, d = quantize_q8(x, block)
    k = x.shape[-1]
    sums = qs.reshape(*x.shape[:-1], k // block, block).astype(jnp.int32).sum(-1)
    return qs, d, d * sums.astype(jnp.float32)


def dequantize_q8(qs: jax.Array, d: jax.Array, block: int = 32) -> jax.Array:
    orig = qs.shape
    k = orig[-1]
    y = qs.astype(jnp.float32).reshape(*orig[:-1], k // block, block) * d[..., None]
    return y.reshape(orig)
