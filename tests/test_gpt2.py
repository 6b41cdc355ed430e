"""GPT-2 end-to-end parity vs HF transformers (random weights, CPU).

This replaces the reference's "download 117M and compare tokens" smoke test
(ci/run.sh) with an offline-capable oracle: torch GPT2LMHeadModel with a
fixed random init is the ground truth for logits and greedy decode.
"""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_gfx906_tpu.models import convert, gpt2
from ggml_gfx906_tpu.quant import GGMLType
from ggml_gfx906_tpu.runtime.kv_cache import KVCache


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    config = transformers.GPT2Config(
        vocab_size=256, n_positions=64, n_embd=256, n_layer=2, n_head=4)
    model = transformers.GPT2LMHeadModel(config)
    model.eval()
    return model, config


@pytest.fixture(scope="module")
def gguf_f32(hf_model, tmp_path_factory):
    model, config = hf_model
    path = tmp_path_factory.mktemp("m") / "gpt2-f32.gguf"
    convert.convert_gpt2(model.state_dict(), config, path)
    return path


def test_logits_parity_f32(hf_model, gguf_f32):
    model, config = hf_model
    cfg, params = gpt2.load(gguf_f32)
    assert cfg.n_vocab == 256 and cfg.n_layer == 2

    toks = np.array([5, 17, 200, 3, 77, 129], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    kv = KVCache.create(cfg.n_layer, 64, cfg.n_head, cfg.head_dim)
    logits, kv = gpt2.forward(cfg, params, jnp.asarray(toks), kv, jnp.int32(0))
    got = np.asarray(logits)
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse
    assert int(kv.length) == len(toks)


def test_incremental_decode_matches_full(hf_model, gguf_f32):
    """KV-cache decode (token by token) must equal the full-sequence forward."""
    model, config = hf_model
    cfg, params = gpt2.load(gguf_f32)
    toks = np.array([9, 8, 7, 30, 12], dtype=np.int32)

    kv = KVCache.create(cfg.n_layer, 64, cfg.n_head, cfg.head_dim)
    full_logits, _ = gpt2.forward(cfg, params, jnp.asarray(toks), kv, jnp.int32(0))

    kv = KVCache.create(cfg.n_layer, 64, cfg.n_head, cfg.head_dim)
    rows = []
    for i, t in enumerate(toks):
        lg, kv = gpt2.forward(cfg, params, jnp.asarray([t], np.int32), kv,
                              jnp.int32(i))
        rows.append(np.asarray(lg[0]))
    inc = np.stack(rows)
    full = np.asarray(full_logits)
    nmse = ((inc - full) ** 2).sum() / (full ** 2).sum()
    assert nmse < 1e-9, nmse


def test_greedy_generate_matches_hf(hf_model, gguf_f32):
    model, config = hf_model
    cfg, params = gpt2.load(gguf_f32)
    prompt = [12, 42, 7]
    n_new = 8
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt], dtype=torch.int64), do_sample=False,
            max_new_tokens=n_new, pad_token_id=0)[0].tolist()
    got = gpt2.generate(cfg, params, prompt, n_new)
    assert got == ref, (got, ref)


@pytest.mark.parametrize("qtype", [GGMLType.Q8_0, GGMLType.Q4_K],
                         ids=lambda t: t.name)
def test_quantized_forward_close(hf_model, tmp_path, qtype):
    """Quantized model logits stay within quantization-error distance of f32
    (the ppl-parity smoke check)."""
    model, config = hf_model
    path = tmp_path / f"gpt2-{qtype.name}.gguf"
    convert.convert_gpt2(model.state_dict(), config, path, ftype=qtype)
    cfg, params = gpt2.load(path)
    # verify the weights really are quantized on disk
    from ggml_gfx906_tpu.ops.quantized import QuantTensor
    assert isinstance(params["blocks"][0]["qkv_w"], QuantTensor)

    toks = np.array([5, 17, 200, 3], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    kv = KVCache.create(cfg.n_layer, 64, cfg.n_head, cfg.head_dim)
    logits, _ = gpt2.forward(cfg, params, jnp.asarray(toks), kv, jnp.int32(0))
    got = np.asarray(logits)
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < (1e-3 if qtype == GGMLType.Q8_0 else 3e-2), nmse
    # top-1 prediction should survive quantization on this tiny model
    assert np.argmax(got[-1]) == np.argmax(ref[-1])
