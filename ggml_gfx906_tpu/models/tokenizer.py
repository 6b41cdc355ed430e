"""GPT-2-style byte-level BPE tokenizer.

ref: the reference ships a simplified greedy subword tokenizer
(gpt_tokenize, examples/common.cpp:91 + impl) reading vocab from the model
file. Here: a full byte-level BPE (merges-driven, llama.cpp-compatible GGUF
metadata `tokenizer.ggml.tokens` / `tokenizer.ggml.merges`) with the same
greedy longest-match fallback when merges are absent — matching the
reference binaries' behavior on their .bin vocabularies.
"""
from __future__ import annotations

import re
from functools import lru_cache


@lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte↔unicode mapping (the standard table)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_GPT2_SPLIT = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+""",
    re.UNICODE,
)


class BPETokenizer:
    def __init__(self, tokens: list[str], merges: list[str] | None = None):
        self.tokens = list(tokens)
        self.token_to_id = {t: i for i, t in enumerate(tokens)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.bpe_ranks: dict[tuple[str, str], int] = {}
        if merges:
            for i, m in enumerate(merges):
                a, b = m.split(" ", 1)
                self.bpe_ranks[(a, b)] = i
        self._cache: dict[str, list[str]] = {}

    @property
    def n_vocab(self) -> int:
        return len(self.tokens)

    # -- BPE ---------------------------------------------------------------

    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            a, b = best
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        self._cache[token] = word
        return word

    def _greedy(self, token: str) -> list[str]:
        """Longest-match fallback — the reference gpt_tokenize strategy
        (examples/common.cpp): repeatedly take the longest prefix in vocab."""
        out = []
        i = 0
        while i < len(token):
            for j in range(len(token), i, -1):
                cand = token[i:j]
                if cand in self.token_to_id:
                    out.append(cand)
                    i = j
                    break
            else:
                out.append(token[i])  # unknown single char → may drop later
                i += 1
        return out

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for piece in _GPT2_SPLIT.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in piece.encode("utf-8"))
            parts = self._bpe(mapped) if self.bpe_ranks else self._greedy(mapped)
            for p in parts:
                tid = self.token_to_id.get(p)
                if tid is not None:
                    ids.append(tid)
        return ids

    def decode(self, ids: list[int]) -> str:
        text = "".join(self.tokens[i] for i in ids)
        raw = bytearray(self.byte_decoder.get(c, ord(" ")) for c in text)
        return raw.decode("utf-8", errors="replace")


def from_gguf(reader) -> BPETokenizer | None:
    tokens = reader.kv.get("tokenizer.ggml.tokens")
    if tokens is None:
        return None
    merges = reader.kv.get("tokenizer.ggml.merges")
    return BPETokenizer(tokens, merges)
