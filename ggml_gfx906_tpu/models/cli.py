"""CLI inference driver — the `gpt-2-backend` binary analogue.

ref: examples/gpt-2/main-backend.cpp:786 main (same flags: -m model, -p
prompt, -n n_predict, --top_k/--top_p/--temp, -s seed).

    python -m ggml_gfx906_tpu.models.cli -m model.gguf -p "hello" -n 32
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="GGUF model inference on TPU")
    ap.add_argument("-m", "--model", required=True, help="GGUF model path")
    ap.add_argument("-p", "--prompt", default=None, help="text prompt")
    ap.add_argument("--tokens", default=None,
                    help="comma-separated token ids (bypasses tokenizer)")
    ap.add_argument("-n", "--n-predict", type=int, default=32)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.9)
    ap.add_argument("--temp", type=float, default=0.9)
    ap.add_argument("-s", "--seed", type=int, default=-1)
    ap.add_argument("--greedy", action="store_true", help="argmax decoding")
    args = ap.parse_args(argv)

    from ..gguf import GGUFReader
    from ..runtime.sampling import greedy, sample_top_k_top_p
    from . import gpt2, tokenizer

    reader = GGUFReader(args.model)
    arch = reader.kv.get("general.architecture")
    if arch == "gpt2":
        cfg, params = gpt2.load(args.model)
        generate = gpt2.generate
    elif arch == "gptj":
        from . import gptj
        cfg, params = gptj.load(args.model)
        generate = gptj.generate
    elif arch == "llama" and int(reader.kv.get("llama.expert_count", 0)) >= 2:
        from . import moe
        cfg, params = moe.load(args.model)
        generate = moe.generate
    elif arch == "llama":
        from . import llama
        cfg, params = llama.load(args.model)
        generate = llama.generate
    else:
        print(f"error: unsupported architecture {arch!r}", file=sys.stderr)
        return 1

    tok = tokenizer.from_gguf(reader)
    if args.tokens is not None:
        prompt_ids = [int(t) for t in args.tokens.split(",")]
    elif args.prompt is not None:
        if tok is None:
            print("error: model has no tokenizer; use --tokens", file=sys.stderr)
            return 1
        prompt_ids = tok.encode(args.prompt)
    else:
        print("error: need -p or --tokens", file=sys.stderr)
        return 1
    if not prompt_ids:
        print("error: empty prompt after tokenization", file=sys.stderr)
        return 1

    print(f"model: {arch}, {cfg.n_layer} layers, n_embd={cfg.n_embd}, "
          f"device: {jax.devices()[0]}", file=sys.stderr)
    print(f"prompt tokens: {prompt_ids}", file=sys.stderr)

    if args.greedy:
        sampler = greedy
    else:
        seed = args.seed if args.seed >= 0 else int(time.time())
        key_holder = [jax.random.PRNGKey(seed)]

        def sampler(logits):
            key_holder[0], sub = jax.random.split(key_holder[0])
            return sample_top_k_top_p(logits, sub, args.top_k, args.top_p,
                                      args.temp)

    t0 = time.time()
    out = generate(cfg, params, prompt_ids, args.n_predict, sampler=sampler)
    dt = time.time() - t0
    n_new = len(out) - len(prompt_ids)
    print(f"generated {n_new} tokens in {dt:.2f}s "
          f"({n_new / dt:.1f} tok/s incl. compile)", file=sys.stderr)
    if tok is not None:
        print(tok.decode(out))
    else:
        print(",".join(map(str, out)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
