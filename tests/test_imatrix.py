"""imatrix collection + imatrix-aware quantize CLI (the reference's
tools/imatrix → ggml_quantize_chunk(quant_weights) pipeline)."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_gfx906_tpu.models import convert, imatrix, llama, quantize_cli
from ggml_gfx906_tpu.quant import GGMLType


@pytest.fixture(scope="module")
def gguf_f32(tmp_path_factory):
    torch.manual_seed(0)
    config = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    model = transformers.LlamaForCausalLM(config)
    model.eval()
    path = tmp_path_factory.mktemp("m") / "llama-f32.gguf"
    convert.convert_llama(model.state_dict(), config, path)
    return path


@pytest.mark.slow
def test_collect_and_quantize_iq2xxs(gguf_f32, tmp_path):
    cfg, params = llama.load(gguf_f32)
    rng = np.random.default_rng(0)
    chunks = [rng.integers(0, cfg.n_vocab, 24).tolist() for _ in range(2)]
    im = imatrix.collect_llama(cfg, params, chunks)
    # every matmul weight gets an entry of the right width, all positive
    assert "blk.0.attn_q.weight" in im and "blk.1.ffn_down.weight" in im
    assert im["blk.0.attn_q.weight"].shape == (cfg.n_embd,)
    assert im["blk.0.ffn_down.weight"].shape == (cfg.n_ff,)
    assert all((v >= 0).all() for v in im.values())

    impath = tmp_path / "cal.npz"
    imatrix.save(im, str(impath))

    out = tmp_path / "m-iq2xxs.gguf"
    quantize_cli.quantize_gguf(gguf_f32, out, GGMLType.IQ2_XXS,
                               verbose=False, imatrix=imatrix.load(str(impath)))
    cfg2, params2 = llama.load(out)
    # loads and runs; IQ weights go through the XLA dequant path
    kv = llama.make_cache(cfg2, 32)
    logits, _ = llama.forward(cfg2, params2,
                              jnp.asarray([1, 2, 3], jnp.int32), kv,
                              jnp.int32(0))
    assert np.isfinite(np.asarray(logits)).all()


def test_imatrix_required_without_file(gguf_f32, tmp_path):
    with pytest.raises(ValueError, match="requires an imatrix"):
        quantize_cli.quantize_gguf(gguf_f32, tmp_path / "x.gguf",
                                   GGMLType.IQ2_XXS, verbose=False)
