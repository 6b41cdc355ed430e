"""Importance-matrix collection for quantization.

ref: the reference ecosystem's imatrix tool (llama.cpp tools/imatrix):
run the model over calibration text and record, for every matmul weight,
the mean squared activation of each input column — the `quant_weights`
the IQ quantizers consume (ggml_quantize_chunk's imatrix argument,
include/ggml.h:2406-2416; required by IQ2_XXS/XS and IQ1_S/M).

    from ggml_gfx906_tpu.models import imatrix, llama
    im = imatrix.collect_llama(cfg, params, token_chunks)
    imatrix.save(im, "cal.imatrix.npz")
    # python -m ggml_gfx906_tpu.models.quantize_cli in.gguf out.gguf \
    #     iq2_xxs --imatrix cal.imatrix.npz

Keys use the GGUF tensor names (blk.N.attn_q.weight, ...), so the
quantize CLI matches them directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..ops.quantized import qmatmul
from . import llama as llama_mod


def _sq(name, x, acc):
    """Accumulate Σ x² per input column (x (..., K)) and the row count."""
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    s, n = acc.get(name, (0.0, 0))
    acc[name] = (s + jnp.sum(flat * flat, axis=0), n + flat.shape[0])
    return acc


def collect_llama(cfg, params: dict, token_chunks, max_seq: int = 512
                  ) -> dict[str, np.ndarray]:
    """Run calibration chunks through the llama forward, recording the
    mean squared activation feeding every matmul weight. Returns
    {gguf_tensor_name: (K,) float32}."""
    acc: dict = {}
    for chunk in token_chunks:
        toks = jnp.asarray(np.asarray(chunk, np.int32))
        kv = llama_mod.make_cache(cfg, min(max_seq, max(32, len(chunk))))
        x = llama_mod._embed(params["wte"], toks).astype(cfg.compute_dtype)
        S = toks.shape[0]
        HD = cfg.head_dim
        pos = jnp.arange(S, dtype=jnp.int32)
        for li, blk in enumerate(params["blocks"]):
            H = blk["wq"].shape[0] // HD
            KVH = blk["wk"].shape[0] // HD
            h = llama_mod._rms(x, blk["attn_norm"], cfg.rms_eps)
            for nm in ("attn_q", "attn_k", "attn_v"):
                _sq(f"blk.{li}.{nm}.weight", h, acc)
            q = qmatmul(h, blk["wq"]).reshape(S, H, HD)
            k = qmatmul(h, blk["wk"]).reshape(S, KVH, HD)
            v = qmatmul(h, blk["wv"]).reshape(S, KVH, HD)
            q = llama_mod._rope(cfg, q, pos)
            k = llama_mod._rope(cfg, k, pos)
            kv = kv.update_layer(li, k, v, 0)
            kc, vc, _, _ = kv.layer_kv(li)
            att = ops.causal_flash_attn(
                jnp.transpose(q, (1, 0, 2))[None], kc[None], vc[None], 0,
                scale=1.0 / (HD ** 0.5))
            att = jnp.transpose(att[0], (1, 0, 2)).reshape(S, H * HD)
            _sq(f"blk.{li}.attn_output.weight", att, acc)
            x = x + qmatmul(att, blk["wo"])
            h2 = llama_mod._rms(x, blk["ffn_norm"], cfg.rms_eps)
            _sq(f"blk.{li}.ffn_gate.weight", h2, acc)
            _sq(f"blk.{li}.ffn_up.weight", h2, acc)
            gate = ops.silu(qmatmul(h2, blk["w_gate"]))
            up = qmatmul(h2, blk["w_up"])
            gu = gate * up
            _sq(f"blk.{li}.ffn_down.weight", gu, acc)
            x = x + qmatmul(gu, blk["w_down"])
        xf = llama_mod._rms(x, params["out_norm"], cfg.rms_eps)
        _sq("output.weight", xf, acc)
        _sq("token_embd.weight", xf, acc)   # tied-head fallback
    return {name: (np.asarray(s, np.float64) / max(n, 1)).astype(np.float32)
            for name, (s, n) in acc.items()}


def save(im: dict[str, np.ndarray], path: str) -> None:
    np.savez_compressed(path, **im)


def load(path: str) -> dict[str, np.ndarray]:
    return dict(np.load(path))


def main(argv=None):
    """CLI: collect an imatrix from a GGUF model + text file.

    python -m ggml_gfx906_tpu.models.imatrix --model m.gguf --text cal.txt \
        -o cal.imatrix.npz [--chunk 512]
    """
    import argparse

    from ..gguf.format import GGUFReader
    from . import tokenizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", required=True)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args(argv)
    cfg, params = llama_mod.load(args.model)
    tok = tokenizer.from_gguf(GGUFReader(args.model))
    with open(args.text) as f:
        ids = tok.encode(f.read())
    chunks = [ids[i:i + args.chunk]
              for i in range(0, max(len(ids) - 1, 1), args.chunk)]
    im = collect_llama(cfg, params, [c for c in chunks if len(c) >= 2])
    save(im, args.out)
    print(f"wrote {len(im)} imatrix entries to {args.out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
