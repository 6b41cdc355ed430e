"""Perplexity evaluation over a token stream.

ref: the reference ecosystem's perplexity tool (llama.cpp
tools/perplexity/perplexity.cpp, the canonical quality gate for
quantization formats): the stream is split into fixed windows; each
window is evaluated in one forward pass and every in-window next-token
prediction past a warm-up prefix contributes -log p(target) to the
running mean. BASELINE.md's north star ("ppl Δ vs FP16 within ggml's
bounds") is measured by running this twice — once with quantized weights,
once with the f32 originals — and differencing.

    from ggml_gfx906_tpu.models import perplexity, llama
    res = perplexity.perplexity_llama(cfg, params, tokens, n_ctx=512)
    res["ppl"], res["nll"], res["n_tokens"]
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(0,))
def _window_nll(forward_w, params, toks, targets, mask):
    """Sum of -log p(targets[i] | toks[:i+1]) over masked positions.

    forward_w: static callable (params, toks (W,)) → logits (W, V)."""
    logits = forward_w(params, toks)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    m = mask.astype(jnp.float32)
    return (nll * m).sum(), m.sum()


def perplexity_stream(forward_w, params, tokens, n_ctx: int = 512,
                      warmup: int | None = None) -> dict:
    """Evaluate ppl of `tokens` (1-D int array) with window size n_ctx.

    Windows are non-overlapping; within each window the first `warmup`
    predictions (default n_ctx//4, the reference tool's first-half
    discount scaled down) are excluded so every counted prediction has
    context. The final partial window is zero-padded and masked."""
    toks = np.asarray(tokens, np.int32)
    if toks.size < 2:
        raise ValueError("need at least 2 tokens")
    warmup = n_ctx // 4 if warmup is None else warmup
    total_nll, total_n = 0.0, 0.0
    for s in range(0, toks.size - 1, n_ctx):
        win = toks[s:s + n_ctx + 1]
        inp, tgt = win[:-1], win[1:]
        valid = np.zeros(n_ctx, np.float32)
        valid[:len(tgt)] = 1.0
        start = 0 if s == 0 else warmup       # first window counts fully
        valid[:start] = 0.0
        pad = n_ctx - len(inp)
        if pad:
            inp = np.pad(inp, (0, pad))
            tgt = np.pad(tgt, (0, pad))
        if valid.sum() == 0:
            continue
        nll, cnt = _window_nll(forward_w, params, jnp.asarray(inp),
                               jnp.asarray(tgt), jnp.asarray(valid))
        total_nll += float(nll)
        total_n += float(cnt)
    mean = total_nll / max(total_n, 1.0)
    return {"ppl": math.exp(mean), "nll": mean, "n_tokens": int(total_n)}


def perplexity_llama(cfg, params, tokens, n_ctx: int = 512, **kw) -> dict:
    from . import llama

    def fw(p, toks):
        kv = llama.make_cache(cfg, toks.shape[0])
        logits, _ = llama.forward(cfg, p, toks, kv, jnp.int32(0))
        return logits

    return perplexity_stream(fw, params, tokens, n_ctx, **kw)


def perplexity_gpt2(cfg, params, tokens, n_ctx: int = 512, **kw) -> dict:
    from ..runtime.kv_cache import KVCache
    from . import gpt2

    def fw(p, toks):
        kv = KVCache.create(cfg.n_layer, toks.shape[0], cfg.n_head,
                            cfg.head_dim)
        logits, _ = gpt2.forward(cfg, p, toks, kv, jnp.int32(0))
        return logits

    return perplexity_stream(fw, params, tokens, n_ctx, **kw)


def main(argv=None):
    """CLI: perplexity of a GGUF llama model over a text file.

    python -m ggml_gfx906_tpu.models.perplexity --model m.gguf \
        --text corpus.txt [--n-ctx 512]
    """
    import argparse

    from ..gguf.format import GGUFReader
    from . import llama, tokenizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", required=True)
    ap.add_argument("--n-ctx", type=int, default=512)
    args = ap.parse_args(argv)
    cfg, params = llama.load(args.model)
    tok = tokenizer.from_gguf(GGUFReader(args.model))
    with open(args.text) as f:
        ids = tok.encode(f.read())
    res = perplexity_llama(cfg, params, ids, n_ctx=args.n_ctx)
    print(f"ppl = {res['ppl']:.4f}  (nll {res['nll']:.4f} over "
          f"{res['n_tokens']} tokens)")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
