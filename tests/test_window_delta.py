"""Window-delta decode primitives (runtime/batched_kv.py WindowDelta +
ops.causal_attn_delta): the delta formulation must equal writing the rows
into the cache and attending the combined prefix. Engine-level stream
parity lives in tests/test_engine.py; these pin the op and the absorb."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggml_gfx906_tpu import ops
from ggml_gfx906_tpu.runtime.batched_kv import BatchedKVCache


def _causal_combined_ref(q, kc, vc, len0, dk, dv, step, scale):
    """Reference: materialize the combined per-slot sequence [cache rows
    < len0[b]] + [delta rows <= step] and run masked attention_ref."""
    B, H, _, D = q.shape
    KVH = kc.shape[1]
    rep = H // KVH
    W = kc.shape[2]
    DEPTH = dk.shape[2]
    outs = []
    for b in range(B):
        L = int(len0[b])
        k_all = jnp.concatenate([kc[b, :, :L], dk[b, :, :step + 1]], axis=1)
        v_all = jnp.concatenate([vc[b, :, :L], dv[b, :, :step + 1]], axis=1)
        o = ops.attention_ref(q[b:b + 1],
                              k_all[None], v_all[None], None, scale)
        outs.append(o[0])
    return jnp.stack(outs)


@pytest.mark.parametrize("rep", [1, 4])
def test_causal_attn_delta_matches_combined_ref(rep):
    rng = np.random.default_rng(rep)
    B, KVH, W, DEPTH, D = 3, 2, 40, 8, 16
    H = KVH * rep
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, KVH, W, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, KVH, W, D)), jnp.float32)
    dk = jnp.asarray(rng.standard_normal((B, KVH, DEPTH, D)), jnp.float32)
    dv = jnp.asarray(rng.standard_normal((B, KVH, DEPTH, D)), jnp.float32)
    len0 = np.array([0, 17, 40], np.int32)      # incl. empty + full cache
    step = 3
    got = np.asarray(ops.causal_attn_delta(q, kc, vc, None, None, len0,
                                           dk, dv, step, scale=0.21))
    ref = np.asarray(_causal_combined_ref(q, kc, vc, len0, dk, dv, step,
                                          0.21))
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-10, nmse


def test_causal_attn_delta_quantized_big_segment():
    """int8 big cache + postscale scales: matches dequantize-then-ref."""
    rng = np.random.default_rng(5)
    B, KVH, rep, W, DEPTH, D = 2, 2, 2, 32, 4, 16
    H = KVH * rep
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, (B, KVH, W, D)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (B, KVH, W, D)), jnp.int8)
    kd = jnp.asarray(np.abs(rng.standard_normal((B, KVH, W))) * 0.02,
                     jnp.float32)
    vd = jnp.asarray(np.abs(rng.standard_normal((B, KVH, W))) * 0.02,
                     jnp.float32)
    dk = jnp.asarray(rng.standard_normal((B, KVH, DEPTH, D)), jnp.float32)
    dv = jnp.asarray(rng.standard_normal((B, KVH, DEPTH, D)), jnp.float32)
    len0 = np.array([9, 32], np.int32)
    step = 2
    got = np.asarray(ops.causal_attn_delta(q, k8, v8, kd, vd, len0,
                                           dk, dv, step))
    kc = k8.astype(jnp.float32) * kd[..., None]
    vc = v8.astype(jnp.float32) * vd[..., None]
    ref = np.asarray(_causal_combined_ref(q, kc, vc, len0, dk, dv, step,
                                          1.0 / (D ** 0.5)))
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse


@pytest.mark.parametrize("quant", [False, True])
def test_absorb_delta_places_rows(quant):
    """absorb_delta == per-step update_layer writes at len0..len0+depth-1
    for active slots; inactive slots keep their lengths."""
    rng = np.random.default_rng(7)
    L_layers, B, H, W, D, DEPTH = 2, 3, 2, 32, 8, 4
    kv = BatchedKVCache.create(L_layers, B, W, H, D, dtype=jnp.float32,
                               quant=quant)
    len0 = jnp.asarray([0, 5, 20], jnp.int32)
    kv = kv.with_lengths(len0)
    active = jnp.asarray([True, True, False])
    delta = kv.make_delta(DEPTH, dtype=jnp.float32)
    rows = {}
    for li in range(L_layers):
        for s in range(DEPTH):
            kn = rng.standard_normal((B, 1, H, D)).astype(np.float32)
            vn = rng.standard_normal((B, 1, H, D)).astype(np.float32)
            rows[(li, s)] = (kn, vn)
            delta = delta.write(li, jnp.asarray(kn), jnp.asarray(vn), s)
    out = kv.absorb_delta(delta, len0, active, DEPTH)
    assert np.asarray(out.lengths).tolist() == [4, 9, 20]
    # reference: sequential per-step update_layer on a fresh cache
    ref = BatchedKVCache.create(L_layers, B, W, H, D, dtype=jnp.float32,
                                quant=quant).with_lengths(len0)
    for s in range(DEPTH):
        for li in range(L_layers):
            kn, vn = rows[(li, s)]
            ref = ref.update_layer(li, jnp.asarray(kn), jnp.asarray(vn),
                                   len0 + s)
    for li in range(L_layers):
        for b in range(B):
            lo, hi = int(len0[b]), int(len0[b]) + DEPTH
            np.testing.assert_allclose(
                np.asarray(out.k[li][b, :, lo:hi]),
                np.asarray(ref.k[li][b, :, lo:hi]), rtol=0, atol=1e-2)
            if quant:
                np.testing.assert_allclose(
                    np.asarray(out.k_d[li][b, :, lo:hi]),
                    np.asarray(ref.k_d[li][b, :, lo:hi]), rtol=1e-6)


def test_absorb_delta_clamps_at_capacity():
    """A slot at len0 > max_seq - depth clamps like dynamic_update_slice
    does on the per-step path (writes shift to fit, no OOB)."""
    kv = BatchedKVCache.create(1, 1, 8, 1, 4, dtype=jnp.float32)
    len0 = jnp.asarray([6], jnp.int32)
    delta = kv.make_delta(4, dtype=jnp.float32)
    for s in range(4):
        delta = delta.write(0, jnp.full((1, 1, 1, 4), s + 1.0),
                            jnp.full((1, 1, 1, 4), -(s + 1.0)), s)
    out = kv.absorb_delta(delta, len0, jnp.asarray([True]), 4)
    # start clamped to 8-4=4: rows land at 4..7
    col = np.asarray(out.k[0][0, 0, :, 0])
    assert col[:4].tolist() == [0, 0, 0, 0]
    assert col[4:].tolist() == [1, 2, 3, 4]
