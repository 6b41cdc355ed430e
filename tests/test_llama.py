"""Llama-family parity vs HF transformers (random weights, CPU) — the
north-star architecture (BASELINE.json: 7B Q4_K decode)."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_gfx906_tpu.models import convert, llama
from ggml_gfx906_tpu.quant import GGMLType


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    config = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    model = transformers.LlamaForCausalLM(config)
    model.eval()
    return model, config


@pytest.fixture(scope="module")
def gguf_f32(hf_model, tmp_path_factory):
    model, config = hf_model
    path = tmp_path_factory.mktemp("m") / "llama-f32.gguf"
    convert.convert_llama(model.state_dict(), config, path)
    return path


def test_logits_parity_f32(hf_model, gguf_f32):
    model, config = hf_model
    cfg, params = llama.load(gguf_f32)
    assert cfg.n_kv_head == 2 and cfg.n_head == 4

    toks = np.array([5, 17, 200, 3, 77, 129], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    kv = llama.make_cache(cfg)
    logits, kv = llama.forward(cfg, params, jnp.asarray(toks), kv, jnp.int32(0))
    got = np.asarray(logits)
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse


def test_incremental_matches_full(hf_model, gguf_f32):
    model, config = hf_model
    cfg, params = llama.load(gguf_f32)
    toks = np.array([9, 8, 7, 30, 12], dtype=np.int32)
    kv = llama.make_cache(cfg)
    full, _ = llama.forward(cfg, params, jnp.asarray(toks), kv, jnp.int32(0))
    kv = llama.make_cache(cfg)
    rows = []
    for i, t in enumerate(toks):
        lg, kv = llama.forward(cfg, params, jnp.asarray([t], np.int32), kv,
                               jnp.int32(i))
        rows.append(np.asarray(lg[0]))
    inc = np.stack(rows)
    nmse = ((inc - np.asarray(full)) ** 2).sum() / (np.asarray(full) ** 2).sum()
    assert nmse < 1e-9, nmse


def test_greedy_generate_matches_hf(hf_model, gguf_f32):
    model, config = hf_model
    cfg, params = llama.load(gguf_f32)
    prompt = [12, 42, 7]
    with torch.no_grad():
        ref = model.generate(torch.tensor([prompt], dtype=torch.int64),
                             do_sample=False, max_new_tokens=6,
                             pad_token_id=0)[0].tolist()
    got = llama.generate(cfg, params, prompt, 6)
    assert got == ref, (got, ref)


def test_q4k_forward_close(hf_model, tmp_path):
    model, config = hf_model
    path = tmp_path / "llama-q4k.gguf"
    convert.convert_llama(model.state_dict(), config, path, ftype=GGMLType.Q4_K)
    cfg, params = llama.load(path)
    from ggml_gfx906_tpu.ops.quantized import QuantTensor
    assert isinstance(params["blocks"][0]["wq"], QuantTensor)
    toks = np.array([5, 17, 200, 3], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    kv = llama.make_cache(cfg)
    logits, _ = llama.forward(cfg, params, jnp.asarray(toks), kv, jnp.int32(0))
    nmse = ((np.asarray(logits) - ref) ** 2).sum() / (ref ** 2).sum()
    # tiny random models amplify 4-bit error; real-model ppl parity
    # is anchored by the codec thresholds in test_quantize_fns
    assert nmse < 5e-2, nmse
