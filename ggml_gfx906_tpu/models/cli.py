"""CLI inference drivers — the gpt-2 binaries ladder analogue.

Single-sequence generate (ref: examples/gpt-2/main-backend.cpp:786 main —
same flags: -m model, -p prompt, -n n_predict, --top_k/--top_p/--temp,
-s seed):

    python -m ggml_gfx906_tpu.models.cli -m model.gguf -p "hello" -n 32

Continuous-batching serving (ref: examples/gpt-2/main-batched.cpp:786 —
parallel sequences over the slot engine; here the production Engine with
chunked admission, windowed harvest, paged KV):

    python -m ggml_gfx906_tpu.models.cli serve -m model.gguf \
        --prompts prompts.txt -n 64 --max-batch 8
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import numpy as np


def _load_model(reader, path):
    """(arch, module, cfg, params) for any supported GGUF architecture."""
    arch = reader.kv.get("general.architecture")
    if arch == "gpt2":
        from . import gpt2 as mod
    elif arch == "gptj":
        from . import gptj as mod
    elif arch == "llama" and int(reader.kv.get("llama.expert_count", 0)) >= 2:
        from . import moe as mod
    elif arch == "llama":
        from . import llama as mod
    else:
        return arch, None, None, None
    cfg, params = mod.load(path)
    return arch, mod, cfg, params


def main(argv=None):
    argv = sys.argv[1:] if argv is None else list(argv)
    if argv and argv[0] == "serve":
        return serve_main(argv[1:])
    return generate_main(argv)


def serve_main(argv):
    """`serve` subcommand: N prompts through the continuous-batching
    Engine, completions streamed as they finish, aggregate tok/s at the
    end (the user-facing entry point for the framework's batched-serving
    path — VERDICT r03 #7)."""
    ap = argparse.ArgumentParser(
        prog="cli serve", description="batched GGUF serving on TPU")
    ap.add_argument("-m", "--model", required=True, help="GGUF model path")
    ap.add_argument("--prompts", required=True,
                    help="file with one prompt per line ('-' = stdin)")
    ap.add_argument("--tokens", action="store_true",
                    help="prompt lines are comma-separated token ids")
    ap.add_argument("-n", "--n-predict", type=int, default=64,
                    help="max new tokens per request")
    ap.add_argument("--max-batch", type=int, default=8,
                    help="engine slots (parallel sequences)")
    ap.add_argument("--max-seq", type=int, default=None,
                    help="per-slot KV capacity (default: model n_ctx)")
    ap.add_argument("--paged-pages", type=int, default=None,
                    help="use a paged KV pool of this many pages")
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8 KV cache — half the KV HBM and the "
                         "fastest measured serving config with the "
                         "window-delta engine (docs/SERVING.md)")
    ap.add_argument("--weights-layout", default=None,
                    choices=["kernel", "int8", "auto"],
                    help="execution layout (default: config "
                         "weights_layout; 'int8' is the production "
                         "serving layout on tunnel runtimes — loads via "
                         "the chunked minimum-transfer path)")
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.9)
    ap.add_argument("--temp", type=float, default=0.0,
                    help="0 = greedy (default)")
    ap.add_argument("-s", "--seed", type=int, default=0,
                    help="base seed (request i uses seed+i)")
    ap.add_argument("--no-eos", action="store_true",
                    help="ignore the tokenizer eos id (always run -n)")
    args = ap.parse_args(argv)

    from ..gguf import GGUFReader
    from ..runtime.engine import Engine
    from ..utils import config
    from . import tokenizer

    reader = GGUFReader(args.model)
    if args.weights_layout:   # scoped to the load (in-process callers)
        prev = config.get("weights_layout")
        config.set("weights_layout", args.weights_layout)
    try:
        arch, mod, cfg, params = _load_model(reader, args.model)
    finally:
        if args.weights_layout:
            config.set("weights_layout", prev)
    if mod is None:
        print(f"error: unsupported architecture {arch!r}", file=sys.stderr)
        return 1
    tok = tokenizer.from_gguf(reader)

    src = sys.stdin if args.prompts == "-" else open(args.prompts)
    with src:
        lines = [ln.rstrip("\n") for ln in src if ln.strip()]
    if not lines:
        print("error: no prompts", file=sys.stderr)
        return 1
    if args.tokens:
        prompt_ids = [[int(t) for t in ln.split(",")] for ln in lines]
    else:
        if tok is None:
            print("error: model has no tokenizer; use --tokens",
                  file=sys.stderr)
            return 1
        prompt_ids = [tok.encode(ln) for ln in lines]

    eos_id = None
    if not args.no_eos and tok is not None:
        eos_id = getattr(tok, "eos_id", None)
    max_seq = args.max_seq or min(cfg.n_ctx, 2048)
    print(f"model: {arch}, {cfg.n_layer} layers, n_embd={cfg.n_embd}, "
          f"slots={args.max_batch}, max_seq={max_seq}, "
          f"device: {jax.devices()[0]}", file=sys.stderr)

    if args.kv_quant:
        config.set("kv_quant", True)
    eng = Engine(mod, cfg, params, max_batch=args.max_batch,
                 max_seq=max_seq, paged_pages=args.paged_pages)
    rid2idx = {}
    for i, ids in enumerate(prompt_ids):
        rid = eng.submit(ids, args.n_predict, eos_id=eos_id,
                         temp=args.temp, top_k=args.top_k,
                         top_p=args.top_p, seed=args.seed + i)
        rid2idx[rid] = i

    t0 = time.time()

    def on_finish(req):
        i = rid2idx[req.rid]
        text = (tok.decode(req.out) if tok is not None
                else ",".join(map(str, req.out)))
        print(f"[{i}] {text}", flush=True)
        print(f"[{i}] done: {len(req.out)} tokens at "
              f"+{time.time()-t0:.2f}s", file=sys.stderr)

    done = eng.run(on_finish=on_finish)
    dt = time.time() - t0
    toks = sum(len(r.out) for r in done)
    print(f"served {len(done)} requests, {toks} tokens in {dt:.2f}s "
          f"({toks/dt:.1f} tok/s aggregate incl. compile)", file=sys.stderr)
    return 0


def generate_main(argv):
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
    ap.add_argument("--spec", type=int, default=0, metavar="K",
                    help="speculative greedy decoding: verify K "
                         "prompt-lookup-drafted tokens per forward "
                         "(stream identical to --greedy; llama-arch only)")
    args = ap.parse_args(argv)

    from ..gguf import GGUFReader
    from ..runtime.sampling import greedy, sample_top_k_top_p
    from . import tokenizer

    reader = GGUFReader(args.model)
    arch, mod, cfg, params = _load_model(reader, args.model)
    if mod is None:
        print(f"error: unsupported architecture {arch!r}", file=sys.stderr)
        return 1
    generate = mod.generate

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

    if args.spec:
        if arch != "llama" or mod.__name__.endswith(".moe"):
            print("error: --spec supports the llama architecture",
                  file=sys.stderr)
            return 1
        from . import speculative

        t0 = time.time()
        out, stats = speculative.spec_generate(
            cfg, params, prompt_ids, args.n_predict, k=args.spec,
            return_stats=True)
        dt = time.time() - t0
        n_new = len(out) - len(prompt_ids)
        print(f"generated {n_new} tokens in {dt:.2f}s "
              f"({n_new / dt:.1f} tok/s incl. compile; "
              f"accept {stats['accept_rate']:.2f}, "
              f"{stats['tokens_per_step']:.1f} tok/verify)",
              file=sys.stderr)
        print(tok.decode(out) if tok is not None
              else ",".join(map(str, out)))
        return 0

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
