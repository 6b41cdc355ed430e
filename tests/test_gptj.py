"""GPT-J parity vs HF transformers (random weights, CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_gfx906_tpu.models import convert, gptj


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    config = transformers.GPTJConfig(
        vocab_size=256, n_positions=64, n_embd=256, n_layer=2, n_head=4,
        rotary_dim=32, n_inner=None)
    model = transformers.GPTJForCausalLM(config)
    model.eval()
    return model, config


@pytest.fixture(scope="module")
def gguf_f32(hf_model, tmp_path_factory):
    model, config = hf_model
    path = tmp_path_factory.mktemp("m") / "gptj-f32.gguf"
    convert.convert_gptj(model.state_dict(), config, path)
    return path


def test_logits_parity_f32(hf_model, gguf_f32):
    model, config = hf_model
    cfg, params = gptj.load(gguf_f32)
    assert cfg.n_rot == 32
    toks = np.array([5, 17, 200, 3, 77], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    kv = gptj.make_cache(cfg)
    logits, _ = gptj.forward(cfg, params, jnp.asarray(toks), kv, jnp.int32(0))
    got = np.asarray(logits)
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse


def test_greedy_generate_matches_hf(hf_model, gguf_f32):
    model, config = hf_model
    cfg, params = gptj.load(gguf_f32)
    prompt = [12, 42, 7]
    with torch.no_grad():
        ref = model.generate(torch.tensor([prompt], dtype=torch.int64),
                             do_sample=False, max_new_tokens=6,
                             pad_token_id=0)[0].tolist()
    got = gptj.generate(cfg, params, prompt, 6)
    assert got == ref, (got, ref)
