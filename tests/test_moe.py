"""MoE (Mixtral-class) end-to-end: MUL_MAT_ID routing in a full model
(VERDICT r02 missing #6 — mul_mat_id and parallel/ep.py existed but no
model used them).

ref: GGML_OP_MUL_MAT_ID MoE routing (include/ggml.h:450-581 enum; CUDA
path ggml-cuda.cu MUL_MAT_ID); llama.cpp's Mixtral schema (arch=llama +
llama.expert_count, stacked blk.N.ffn_*_exps tensors)."""
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_gfx906_tpu.models import convert, moe
from ggml_gfx906_tpu.quant import GGMLType


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    config = transformers.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = transformers.MixtralForCausalLM(config)
    model.eval()
    return model, config


@pytest.fixture(scope="module")
def gguf_f32(hf_model, tmp_path_factory):
    model, config = hf_model
    path = tmp_path_factory.mktemp("moe") / "mixtral-f32.gguf"
    convert.convert_mixtral(model.state_dict(), config, path)
    return path


def test_logits_parity_vs_hf(hf_model, gguf_f32):
    model, _ = hf_model
    cfg, params = moe.load(gguf_f32)
    assert cfg.n_expert == 4 and cfg.n_expert_used == 2
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.n_vocab, 12).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0]
    ref = ref.numpy().astype(np.float64)
    kv = moe.make_cache(cfg, 32)
    logits, _ = moe.forward_jit(cfg, params, jnp.asarray(toks), kv,
                                jnp.int32(0))
    got = np.asarray(logits, np.float64)
    nmse = ((got - ref) ** 2).mean() / (ref ** 2).mean()
    assert nmse < 1e-9, nmse


def test_greedy_decode_matches_hf(hf_model, gguf_f32):
    model, _ = hf_model
    cfg, params = moe.load(gguf_f32)
    prompt = [3, 17, 99]
    n_new = 8
    ids = torch.tensor([prompt])
    with torch.no_grad():
        ref = model.generate(ids, max_new_tokens=n_new, do_sample=False,
                             num_beams=1)[0].tolist()
    got = moe.generate(cfg, params, prompt, n_new, max_seq=32)
    assert got == ref, (got, ref)


def test_incremental_matches_full(gguf_f32):
    cfg, params = moe.load(gguf_f32)
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, 10).astype(np.int32))
    kv = moe.make_cache(cfg, 32)
    full, _ = moe.forward_jit(cfg, params, toks, kv, jnp.int32(0))
    kv2 = moe.make_cache(cfg, 32)
    l1, kv2 = moe.forward_jit(cfg, params, toks[:6], kv2, jnp.int32(0))
    l2, kv2 = moe.forward_jit(cfg, params, toks[6:], kv2, jnp.int32(6))
    np.testing.assert_allclose(np.asarray(l2), np.asarray(full[6:]),
                               rtol=2e-4, atol=2e-5)


def test_quantized_experts_forward():
    """Q4_K QuantTensor expert stacks through mul_mat_id inside the model
    (the fused Pallas kernels serve each expert's matmul)."""
    cfg = moe.MoEConfig(n_vocab=128, n_ctx=32, n_embd=256, n_head=4,
                        n_kv_head=2, n_layer=1, n_ff=512, n_expert=4,
                        n_expert_used=2)
    pf = moe.random_params(cfg, seed=2)
    # quantize ONLY the expert stacks: with random weights the router is
    # chaotic, so quantizing attention/embeddings flips expert choices and
    # the comparison stops isolating the QuantTensor-experts path
    from ggml_gfx906_tpu.ops.quantized import QuantTensor

    def q_exps(stack):
        return [QuantTensor.quantize(GGMLType.Q4_K, np.asarray(e))
                for e in stack]

    pq = {**pf, "blocks": [
        {**blk,
         "gate_exps": q_exps(blk["gate_exps"]),
         "up_exps": q_exps(blk["up_exps"]),
         "down_exps": q_exps(blk["down_exps"])}
        for blk in pf["blocks"]]}
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, 8).astype(np.int32))
    lf, _ = moe.forward(cfg, pf, toks, moe.make_cache(cfg, 16), jnp.int32(0))
    lq, _ = moe.forward(cfg, pq, toks, moe.make_cache(cfg, 16), jnp.int32(0))
    lf, lq = np.asarray(lf, np.float64), np.asarray(lq, np.float64)
    nmse = ((lq - lf) ** 2).mean() / (lf ** 2).mean()
    # plumbing bound: Q4_K's own error at this weight scale is
    # ~0.8% NMSE (quantization QUALITY is gated by the codec
    # oracles and test_served_quality, not here)
    assert nmse < 2e-2, nmse


def test_engine_serves_moe(gguf_f32):
    """Continuous batching over the MoE model: engine output matches
    single-sequence generate token-for-token."""
    from ggml_gfx906_tpu.runtime.engine import Engine

    cfg, params = moe.load(gguf_f32)
    eng = Engine(moe, cfg, params, max_batch=2, max_seq=32)
    prompts = [[3, 17, 99], [5, 8]]
    rids = [eng.submit(p, 6) for p in prompts]
    done = {r.rid: r for r in eng.run()}
    for rid, prompt in zip(rids, prompts):
        expect = moe.generate(cfg, params, prompt, 6, max_seq=32)
        assert prompt + done[rid].out == expect
