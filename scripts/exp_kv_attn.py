"""Experiment: decode-shaped attention over an int8 KV cache WITHOUT
materializing the dequantized cache.

r03 finding (docs/PERFORMANCE.md): kv_quant=True LOSES throughput because
the current formulation scales K/V by their per-position scales BEFORE the
attention dots (ops/attention.py::_causal_ref) — XLA materializes the
dequantized bf16 cache to HBM, turning the halved read into write+read.

Hypothesis (VERDICT r03 #2): scale the dot OUTPUTS instead —
    s[b,h,q,w] = (q · k8[w]) * kd[w]          (kd applied to scores)
    out[b,h,d] = Σ_w (p[w]·vd[w]) · v8[w,d]   (vd folded into the probs)
— then the int8 cache streams directly into the MXU (the convert is fused
into the dot operand) and the KV read genuinely halves.

Measures per-layer attention cost at the serving shape (B=32, MHA 32 heads,
window 256, D=128) with the model's data-dependence structure: L chained
layers, each with its OWN cache stack (weights stream once per step), slope
over two L values. ref: quantized-KV fattn instances, fattn.cu:180-270.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from ggml_gfx906_tpu.utils.perf import device_sync, measure_hbm_bw

B, H, W, D = 32, 32, 256, 128
SCALE = 1.0 / (D ** 0.5)


def make_kv(seed, L, quant):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)

    @jax.jit
    def gen(k0, k1, k2, k3):
        if quant:
            k8 = jax.random.randint(k0, (L, B, H, W, D), -127, 128, jnp.int8)
            v8 = jax.random.randint(k1, (L, B, H, W, D), -127, 128, jnp.int8)
            kd = jax.random.uniform(k2, (L, B, H, W), jnp.float32) * 0.02
            vd = jax.random.uniform(k3, (L, B, H, W), jnp.float32) * 0.02
            return k8, v8, kd, vd
        k = jax.random.normal(k0, (L, B, H, W, D), jnp.bfloat16)
        v = jax.random.normal(k1, (L, B, H, W, D), jnp.bfloat16)
        return k, v, None, None

    out = gen(*ks)
    return jax.tree.map(lambda a: a, out)


def attn_dense(q, k, v, kd, vd, mask):
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.bfloat16), k,
                   preferred_element_type=jnp.float32) * SCALE
    s = s + mask
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32)


def attn_prescale(q, k8, v8, kd, vd, mask):
    """Current kv_quant formulation: dequantize, then attend."""
    k = (k8.astype(jnp.float32) * kd[..., None]).astype(jnp.bfloat16)
    v = (v8.astype(jnp.float32) * vd[..., None]).astype(jnp.bfloat16)
    return attn_dense(q, k, v, None, None, mask)


def attn_postscale(q, k8, v8, kd, vd, mask):
    """Proposed: int8 streams into the dots, scales on the outputs."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.bfloat16),
                   k8.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    s = s * (kd[:, :, None, :] * SCALE) + mask
    p = jax.nn.softmax(s, axis=-1)
    pv = (p * vd[:, :, None, :]).astype(jnp.bfloat16)
    return jnp.einsum("bhnm,bhmd->bhnd", pv, v8.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


L = 8  # layers per pass (each with its own cache stack)


def chain_fn(attn, T):
    """T full passes over the L-layer chain in ONE program (fori_loop, so
    the compiled body is L attns regardless of T); x feeds back so every
    pass re-streams all L caches with a fresh q operand (identical q would
    let XLA CSE the repeated attention calls)."""
    @jax.jit
    def run(q0, mask, *kv):
        k, v, kd, vd = kv

        def body(t, x):
            for i in range(L):
                o = attn(x, k[i], v[i],
                         None if kd is None else kd[i],
                         None if vd is None else vd[i], mask)
                # chain: next layer's q depends on this layer's output;
                # t folds in so iterations can't collapse
                x = q0 + o.astype(q0.dtype) * (1e-6 * (1 + t))
            return x

        return jax.lax.fori_loop(0, T, body, q0)
    return run


def measure(name, attn, quant):
    """Slope over T (passes per program): Δt / (ΔT * L) isolates the
    per-layer-attention cost from the fixed ~20-36 ms fetch round trip.
    ΔT*L = 64 layer-attentions ≈ 6-12 ms — well above tunnel jitter."""
    print(f"[{name}] building...", file=sys.stderr, flush=True)
    T_lo, T_hi = 2, 10
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.bfloat16)
    mask = jnp.zeros((B, 1, 1, W), jnp.float32)
    def pack(kv):
        if quant:
            return kv
        return (kv[0], kv[1], None, None)

    def mk(seed):
        kv = pack(make_kv(seed, L, quant))
        for x in kv:
            if x is not None:
                device_sync(x)
        return kv

    # distinct pre-materialized stacks per use: warmup buffers must
    # never be reused by timed calls (byte-identical re-dispatch memoizes)
    kv_w, kv_a, kv_b, kv_c = mk(7), mk(1), mk(2), mk(3)

    f_lo = chain_fn(attn, T_lo)
    f_hi = chain_fn(attn, T_hi)

    print(f"[{name}] compiling...", file=sys.stderr, flush=True)
    device_sync(f_lo(q0, mask, *kv_w))
    device_sync(f_hi(q0, mask, *kv_w))
    best_lo = best_hi = float("inf")
    for kv in (kv_a, kv_b, kv_c):
        t0 = time.perf_counter()
        device_sync(f_lo(q0, mask, *kv))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        device_sync(f_hi(q0, mask, *kv))
        best_hi = min(best_hi, time.perf_counter() - t0)
    per_layer = (best_hi - best_lo) / ((T_hi - T_lo) * L)
    kv_bytes = 2 * B * H * W * (D + (4 if quant else 0)) * (1 if quant else 2)
    gbs = kv_bytes / per_layer / 1e9
    print(f"{name:14s} per-layer {per_layer*1e6:8.1f} us   "
          f"kv {kv_bytes/1e6:6.1f} MB   {gbs:6.0f} GB/s")
    return per_layer


def check_parity():
    """postscale must match prescale numerically (same int8 values)."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 4, 1, D)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, (2, 4, W, D)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (2, 4, W, D)), jnp.int8)
    kd = jnp.asarray(rng.random((2, 4, W)), jnp.float32) * 0.02
    vd = jnp.asarray(rng.random((2, 4, W)), jnp.float32) * 0.02
    mask = jnp.zeros((2, 1, 1, W), jnp.float32)
    a = attn_prescale(q, k8, v8, kd, vd, mask)
    b = attn_postscale(q, k8, v8, kd, vd, mask)
    nmse = float(((a - b) ** 2).mean() / (a ** 2).mean())
    print(f"parity prescale vs postscale nmse = {nmse:.2e}")


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    hbm = measure_hbm_bw() / 1e9
    print(f"measured HBM: {hbm:.0f} GB/s")
    check_parity()
    t_dense = measure("dense bf16", attn_dense, quant=False)
    t_pre = measure("int8 prescale", attn_prescale, quant=True)
    t_post = measure("int8 postscale", attn_postscale, quant=True)
    print(f"postscale vs dense: {t_dense/t_post:.2f}x   "
          f"vs prescale: {t_pre/t_post:.2f}x")


if __name__ == "__main__":
    main()
