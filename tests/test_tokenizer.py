"""Tokenizers from GGUF metadata alone (ref role: examples/common.h:91
gpt_tokenize + vocab read from the model file; llama.cpp llm_tokenizer_spm
for the SentencePiece semantics).

The SPM vocab here is synthetic but exercises every mechanism: score-driven
merge priority, tie-breaking, ▁ whitespace, <0xXX> byte fallback, control
token stripping — and it round-trips through our own GGUF writer/reader so
`from_gguf` is tested at the file boundary, not on an in-memory dict.
"""
import numpy as np
import pytest

from ggml_gfx906_tpu.gguf import GGUFReader, GGUFWriter
from ggml_gfx906_tpu.models.tokenizer import (
    TT_BYTE, TT_CONTROL, TT_NORMAL, TT_UNKNOWN, BPETokenizer, SPMTokenizer,
    from_gguf,
)


def _spm_vocab():
    """id 0=<unk>, 1=<s>, 2=</s>, 3..258 = <0x00>..<0xFF>, then pieces."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [TT_UNKNOWN, TT_CONTROL, TT_CONTROL]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TT_BYTE)
    pieces = {
        "▁": -2.0, "a": -1.0, "b": -1.0, "c": -1.0, "d": -1.0,
        "ab": -3.0, "bc": -2.5, "abc": -4.0, "▁ab": -3.5,
        "▁the": -5.0, "t": -1.2, "h": -1.3, "e": -1.1, "th": -6.0,
        "he": -7.0, "▁t": -8.0, "▁th": -6.5,
    }
    scores = [0.0] * len(tokens)
    for p, s in pieces.items():
        tokens.append(p)
        types.append(TT_NORMAL)
        scores.append(s)
    return tokens, scores, types


def _write_spm_gguf(path):
    tokens, scores, types = _spm_vocab()
    w = GGUFWriter()
    w.set("general.architecture", "llama")
    w.set("tokenizer.ggml.model", "llama")
    w.set("tokenizer.ggml.tokens", tokens)
    w.set("tokenizer.ggml.scores", [float(s) for s in scores])
    w.set("tokenizer.ggml.token_type", [int(t) for t in types])
    w.set("tokenizer.ggml.bos_token_id", 1)
    w.set("tokenizer.ggml.eos_token_id", 2)
    w.set("tokenizer.ggml.unknown_token_id", 0)
    w.set("tokenizer.ggml.add_bos_token", True)
    # GGUF requires >=0 tensors; a tokenizer-only file is legal
    w.add_array_tensor("dummy", np.zeros((4,), np.float32))
    w.write(path)
    return tokens


@pytest.fixture(scope="module")
def spm(tmp_path_factory):
    path = tmp_path_factory.mktemp("tok") / "tok.gguf"
    _write_spm_gguf(path)
    tok = from_gguf(GGUFReader(path))
    assert isinstance(tok, SPMTokenizer)
    return tok


def test_spm_merge_priority(spm):
    # "bc" (-2.5) outranks "ab" (-3.0): "abc" → a + bc first, then "abc"
    # itself is in vocab (-4.0) so the final merge lands on the full piece
    ids = spm.encode("abc", add_bos=False)
    # ▁ prefix: "▁abc" not in vocab; "▁ab" (-3.5) vs "a"+"bc"… the merge
    # sequence is deterministic — assert via decoded pieces
    pieces = [spm.tokens[i] for i in ids]
    assert "".join(pieces) == "▁abc"
    # highest-score pair merged first: bc must appear merged before ab
    assert "bc" in pieces or "abc" in pieces


def test_spm_known_segmentation(spm):
    # "▁the" is a whole vocab piece with a good score
    ids = spm.encode("the", add_bos=False)
    assert [spm.tokens[i] for i in ids] == ["▁the"]


def test_spm_bos_and_decode(spm):
    ids = spm.encode("the ab")
    assert ids[0] == spm.bos_id
    assert spm.decode(ids) == "the ab"


def test_spm_byte_fallback_roundtrip(spm):
    # 'z', digits, emoji: none in vocab → <0xXX> fallback, decode restores
    for text in ["zap!", "a b c", "héllo", "🎉 abc", "tab\tand\nnewline"]:
        ids = spm.encode(text)
        assert spm.decode(ids) == text, text
    # every non-piece char became byte tokens, not unk
    ids = spm.encode("z", add_bos=False)
    assert [spm.token_types[i] for i in ids[-1:]] == [TT_BYTE]


def test_spm_empty_and_space(spm):
    assert spm.encode("", add_bos=False) == []
    assert spm.decode(spm.encode(" leading")) == " leading"


def test_spm_tie_break_leftmost():
    # two equal-score merge candidates: leftmost must merge first
    tokens = ["<unk>", "xy", "yz", "x", "y", "z"]
    types = [TT_UNKNOWN] + [TT_NORMAL] * 5
    scores = [0.0, -1.0, -1.0, -0.1, -0.1, -0.1]
    tok = SPMTokenizer(tokens, scores, types, add_space_prefix=False,
                       add_bos=False)
    ids = tok.encode("xyz")
    assert [tok.tokens[i] for i in ids] == ["xy", "z"]


def test_bpe_gguf_roundtrip(tmp_path):
    # byte-level BPE from GGUF metadata (merges present)
    from ggml_gfx906_tpu.models.tokenizer import bytes_to_unicode

    enc = bytes_to_unicode()
    base = [enc[b] for b in range(256)]
    vocab = base + ["he", "ll", "hell", "llo", "hello", "Ġw", "Ġwo"]
    merges = ["h e", "l l", "he ll", "ll o", "hell o", "Ġ w", "Ġw o"]
    w = GGUFWriter()
    w.set("tokenizer.ggml.model", "gpt2")
    w.set("tokenizer.ggml.tokens", vocab)
    w.set("tokenizer.ggml.merges", merges)
    w.add_array_tensor("dummy", np.zeros((4,), np.float32))
    path = tmp_path / "bpe.gguf"
    w.write(path)
    tok = from_gguf(GGUFReader(path))
    assert isinstance(tok, BPETokenizer)
    ids = tok.encode("hello wo")
    assert tok.decode(ids) == "hello wo"
    assert tok.tokens[ids[0]] == "hello"


def test_llama_gguf_serves_from_file_alone(tmp_path, capsys):
    """load → tokenize → serve a llama GGUF end-to-end from the file alone
    through the CLI (the round-2 gap: a real checkpoint used to fail at the
    tokenize step)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from ggml_gfx906_tpu.models import cli, convert

    tokens, scores, types = _spm_vocab()
    torch.manual_seed(0)
    config = transformers.LlamaConfig(
        vocab_size=len(tokens), hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = transformers.LlamaForCausalLM(config)
    path = tmp_path / "llama-tok.gguf"
    convert.convert_llama(model.state_dict(), config, path,
                          tokens=tokens, scores=scores, token_types=types)

    rc = cli.main(["-m", str(path), "-p", "the ab", "-n", "4", "--greedy"])
    assert rc == 0
    outerr = capsys.readouterr()
    assert "prompt tokens:" in outerr.err
    assert outerr.out.strip() != ""
    greedy_text = outerr.out.strip()

    # --spec K must produce the IDENTICAL stream (speculative decoding's
    # exactness contract) and report its acceptance stats
    rc = cli.main(["-m", str(path), "-p", "the ab", "-n", "4", "--spec", "4"])
    assert rc == 0
    outerr = capsys.readouterr()
    assert outerr.out.strip() == greedy_text
    assert "accept" in outerr.err


def test_cli_serve_batched_from_file(tmp_path, capsys):
    """`cli serve`: N prompts through the continuous-batching Engine from a
    GGUF file alone — streamed completions + aggregate tok/s (the
    user-facing entry point for batched serving, ref the gpt-2 binaries
    ladder examples/gpt-2/main-batched.cpp:786)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from ggml_gfx906_tpu.models import cli, convert

    tokens, scores, types = _spm_vocab()
    torch.manual_seed(0)
    config = transformers.LlamaConfig(
        vocab_size=len(tokens), hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = transformers.LlamaForCausalLM(config)
    path = tmp_path / "llama-serve.gguf"
    convert.convert_llama(model.state_dict(), config, path,
                          tokens=tokens, scores=scores, token_types=types)
    pfile = tmp_path / "prompts.txt"
    pfile.write_text("the ab\nabc abc\nb c d\n")

    rc = cli.main(["serve", "-m", str(path), "--prompts", str(pfile),
                   "-n", "4", "--max-batch", "2", "--max-seq", "32",
                   "--no-eos"])
    assert rc == 0
    outerr = capsys.readouterr()
    lines = [ln for ln in outerr.out.splitlines() if ln.startswith("[")]
    assert len(lines) == 3                      # one completion per prompt
    assert {ln.split("]")[0] + "]" for ln in lines} == {"[0]", "[1]", "[2]"}
    assert "tok/s aggregate" in outerr.err
    # serve must agree with the single-sequence CLI on the same prompt
    rc = cli.main(["-m", str(path), "-p", "the ab", "-n", "4", "--greedy"])
    assert rc == 0
    single = capsys.readouterr().out.strip()
    served = next(ln for ln in lines if ln.startswith("[0] "))[4:]
    assert single.endswith(served) or served in single
    # and the production execution-layout flag plumbs through the load
    rc = cli.main(["serve", "-m", str(path), "--prompts", str(pfile),
                   "-n", "2", "--max-batch", "2", "--max-seq", "32",
                   "--no-eos", "--weights-layout", "int8"])
    assert rc == 0
    assert "tok/s aggregate" in capsys.readouterr().err
