"""Magika file-type classifier.

ref: examples/magika/main.cpp — magika_graph :181-251: one-hot bytes
(257×1536) → dense(128)+gelu → reshape to (384, 512) → layernorm(γ,β) →
dense_1(256)+gelu → dense_2(256)+gelu → global max-pool over sequence →
layernorm_1 → target_label dense → softmax. Input bytes: first/mid/last 512
bytes of the file, padded with 256 (main.cpp input prep).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..gguf import GGUFReader

NORM_EPS = 0.001
PAD_TOKEN = 256
BLOCK = 512


def load(path) -> dict:
    """Tensor names keep the reference's TF-style keys (dense/kernel:0 …)."""
    r = GGUFReader(path)
    t = lambda n: jnp.asarray(r.tensor_float(n))
    return {
        "dense_w": t("dense/kernel:0"), "dense_b": t("dense/bias:0"),
        "ln_g": t("layer_normalization/gamma:0"),
        "ln_b": t("layer_normalization/beta:0"),
        "dense1_w": t("dense_1/kernel:0"), "dense1_b": t("dense_1/bias:0"),
        "dense2_w": t("dense_2/kernel:0"), "dense2_b": t("dense_2/bias:0"),
        "ln1_g": t("layer_normalization_1/gamma:0"),
        "ln1_b": t("layer_normalization_1/beta:0"),
        "label_w": t("target_label/kernel:0"), "label_b": t("target_label/bias:0"),
    }


def prepare_input(data: bytes) -> np.ndarray:
    """File bytes → (1536,) int tokens (exact port of the reference's
    beg/mid/end extraction, main.cpp:272-308): first 512 bytes padded at the
    end, middle 512 centered, last 512 padded at the beginning."""
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    out = np.full(3 * BLOCK, PAD_TOKEN, dtype=np.int32)
    head = arr[:BLOCK]
    out[:len(head)] = head
    mid_offs = max(0, (n - BLOCK) // 2)
    mid = arr[mid_offs:mid_offs + BLOCK]
    off = BLOCK + BLOCK // 2 - len(mid) // 2
    out[off:off + len(mid)] = mid
    end_offs = max(0, n - BLOCK)
    tail = arr[end_offs:end_offs + BLOCK]
    out[3 * BLOCK - len(tail):] = tail
    return out


def forward(params: dict, tokens: jax.Array) -> jax.Array:
    """tokens (B, 1536) int → label probabilities (B, n_labels).

    Mirrors magika_graph exactly. GGUF tensors arrive in numpy C-order
    (ggml ne reversed), so each ggml mul_mat(W, x) is x @ W.T here; the
    mid layernorm runs over the 384 axis (the reference transposes around
    it, main.cpp:213-222)."""
    b = tokens.shape[0]
    onehot = jax.nn.one_hot(tokens, 257, dtype=jnp.float32)  # (B, 1536, 257)
    cur = ops.gelu(onehot @ params["dense_w"].T + params["dense_b"])
    cur = cur.reshape(b, 384, 512)  # 1536*128 regrouped row-major
    cur = jnp.swapaxes(cur, 1, 2)  # (B, 512, 384)
    cur = ops.norm(cur, NORM_EPS) * params["ln_g"] + params["ln_b"]
    cur = jnp.swapaxes(cur, 1, 2)  # (B, 384, 512)
    cur = ops.gelu(cur @ params["dense1_w"].T + params["dense1_b"])
    cur = ops.gelu(cur @ params["dense2_w"].T + params["dense2_b"])
    cur = cur.max(axis=1)  # global max pool over the 384 positions
    cur = ops.norm(cur, NORM_EPS) * params["ln1_g"] + params["ln1_b"]
    logits = cur @ params["label_w"].T + params["label_b"]
    return jax.nn.softmax(logits, axis=-1)


def classify_bytes(params: dict, data: bytes) -> np.ndarray:
    toks = jnp.asarray(prepare_input(data)[None])
    return np.asarray(jax.jit(forward)(params, toks)[0])
