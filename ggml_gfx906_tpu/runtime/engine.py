"""Continuous-batching serving engine.

ref: examples/gpt-2/main-batched.cpp — llama.cpp-style request batching
(gpt2_batch token/pos/seq_id arrays :139, KV-cell bookkeeping :88) — and
the scheduler's role of keeping devices busy (src/ggml-backend.cpp).

TPU-native shape: a fixed pool of B slots over a preallocated batched KV
cache. Admission prefills one sequence (bucketed lengths → few compiled
programs) and installs it into a free slot; every engine step runs ONE
jit-compiled batched decode for all active slots (inactive slots are
masked). Host-side bookkeeping is deterministic — the property the
multi-host path relies on (SURVEY.md §7 hard part (e)).
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .batched_kv import BatchedKVCache


@dataclass
class Request:
    rid: int
    prompt: list[int]
    max_new_tokens: int
    eos_id: int | None = None
    out: list[int] = field(default_factory=list)
    done: bool = False


def _bucket(n: int, buckets=(16, 32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


class Engine:
    """Continuous batching over a model exposing forward_batch/prefill_kv
    (models/llama.py)."""

    def __init__(self, model_mod, cfg, params, max_batch: int = 8,
                 max_seq: int = 1024):
        self.m = model_mod
        self.cfg = cfg
        self.params = params
        self.max_batch = max_batch
        self.max_seq = max_seq
        self.kv = BatchedKVCache.create(
            cfg.n_layer, max_batch, max_seq, cfg.n_kv_head, cfg.head_dim,
            dtype=cfg.compute_dtype)
        self.slots: list[Request | None] = [None] * max_batch
        self.cur_tok = np.zeros(max_batch, np.int32)
        self.queue: list[Request] = []
        self.finished: list[Request] = []
        self._rid = itertools.count()

        mm, c, p = self.m, self.cfg, self.params

        @jax.jit
        def _decode_step(params, kv, toks, active):
            logits, kv = mm.forward_batch(c, params, toks[:, None], kv,
                                          kv.lengths)
            nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
            new_len = kv.lengths + active.astype(jnp.int32)
            kv = BatchedKVCache(kv.k, kv.v, new_len)
            return nxt, kv

        self._decode_step = _decode_step

        @jax.jit
        def _install(kv, b, k_slot, v_slot, length):
            return kv.set_slot(b, k_slot, v_slot, length)

        self._install = _install

        @jax.jit
        def _prefill(padded_tokens):
            return mm.prefill_kv(c, p, padded_tokens, self.max_seq)

        self._prefill = _prefill

    # -- public API -------------------------------------------------------

    def submit(self, prompt: list[int], max_new_tokens: int,
               eos_id: int | None = None) -> int:
        if not prompt:
            raise ValueError("empty prompt")
        if len(prompt) >= self.max_seq:
            raise ValueError(f"prompt length {len(prompt)} >= max_seq {self.max_seq}")
        r = Request(next(self._rid), list(prompt), max_new_tokens, eos_id)
        self.queue.append(r)
        return r.rid

    def run(self) -> list[Request]:
        """Run until all submitted requests complete; returns them."""
        while self.queue or any(s is not None for s in self.slots):
            self.step()
        out, self.finished = self.finished, []
        return out

    # -- engine internals -------------------------------------------------

    def _free_slot(self) -> int | None:
        for b, s in enumerate(self.slots):
            if s is None:
                return b
        return None

    def _admit(self):
        while self.queue:
            b = self._free_slot()
            if b is None:
                return
            r = self.queue.pop(0)
            toks = np.asarray(r.prompt, np.int32)
            bucket = _bucket(len(toks))
            padded = np.zeros(bucket, np.int32)
            padded[:len(toks)] = toks
            # bucketed prefill (compiled once per bucket size); padding K/V
            # beyond the true length is overwritten by later decode writes
            logits, kf, vf = self._prefill(jnp.asarray(padded))
            first_tok = int(jnp.argmax(logits[len(toks) - 1]))
            self.kv = self._install(self.kv, jnp.int32(b), kf, vf,
                                    jnp.int32(len(toks)))
            self.slots[b] = r
            r.out.append(first_tok)
            self.cur_tok[b] = first_tok
            self._check_done(b)

    def _check_done(self, b: int):
        r = self.slots[b]
        if r is None:
            return
        if (len(r.out) >= r.max_new_tokens
                or (r.eos_id is not None and r.out and r.out[-1] == r.eos_id)
                or len(r.prompt) + len(r.out) >= self.max_seq):
            r.done = True
            self.finished.append(r)
            self.slots[b] = None
            self.kv = BatchedKVCache(
                self.kv.k, self.kv.v,
                self.kv.lengths.at[b].set(0))

    def step(self):
        """One engine iteration: admit waiting requests, one batched decode."""
        self._admit()
        active = np.array([s is not None for s in self.slots], bool)
        if not active.any():
            return
        toks = jnp.asarray(self.cur_tok)
        nxt, self.kv = self._decode_step(self.params, self.kv, toks,
                                         jnp.asarray(active))
        nxt = np.asarray(nxt)
        for b, r in enumerate(self.slots):
            if r is None:
                continue
            r.out.append(int(nxt[b]))
            self.cur_tok[b] = int(nxt[b])
            self._check_done(b)
