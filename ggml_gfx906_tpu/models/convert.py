"""Model converters: HF/torch state dicts → GGUF.

Replaces the reference's per-example Python converters
(examples/gpt-2/convert-ckpt-to-ggml.py etc.) with direct GGUF writers using
llama.cpp-compatible schemas, plus per-tensor quantization policy mirroring
ggml_common_quantize_0 (examples/common-ggml.cpp:41 — only the 2-D matmul
weights are quantized; norms/biases stay f32; ne[0] must divide the block).
"""
from __future__ import annotations

import re

import numpy as np

from ..gguf import GGUFWriter
from ..quant.types import GGMLType, TYPE_TRAITS

# tensor-name patterns eligible for quantization (ref: quantize.cpp to_quant
# lists — the 2-D weight matrices)
QUANT_PATTERNS = [
    r"token_embd\.weight",
    r"output\.weight",
    r"blk\.\d+\.attn_qkv\.weight",
    r"blk\.\d+\.attn_output\.weight",
    r"blk\.\d+\.(attn_q|attn_k|attn_v)\.weight",
    r"blk\.\d+\.ffn_(up|down|gate)\.weight",
]


def _pick_type(name: str, arr: np.ndarray, ftype: GGMLType) -> GGMLType:
    if ftype == GGMLType.F32 or arr.ndim != 2:
        return GGMLType.F32
    if not any(re.fullmatch(p, name) for p in QUANT_PATTERNS):
        return GGMLType.F32
    if arr.shape[-1] % TYPE_TRAITS[ftype].blck_size != 0:
        return GGMLType.F16  # fallback like ggml's incompatible-ne[0] path
    return ftype


def _add(w: GGUFWriter, name: str, arr: np.ndarray, ftype: GGMLType):
    t = _pick_type(name, arr, ftype)
    w.add_array_tensor(name, np.asarray(arr, dtype=np.float32), t)


def convert_llama(state_dict: dict, config, path,
                  ftype: GGMLType = GGMLType.F32,
                  tokens: list[str] | None = None,
                  scores: list[float] | None = None,
                  token_types: list[int] | None = None):
    """HF LlamaForCausalLM state_dict → llama GGUF.

    No q/k permutation: HF's rotate_half rotary equals ggml's NEOX mode
    pairwise rotation (pairs (i, i+d/2) by theta_i), so weights map 1:1."""

    def t(name):
        return state_dict[name].detach().cpu().numpy().astype(np.float32)

    w = GGUFWriter()
    w.set("general.architecture", "llama")
    w.set("general.name", "llama")
    w.set("llama.vocab_size", int(config.vocab_size))
    w.set("llama.context_length", int(config.max_position_embeddings))
    w.set("llama.embedding_length", int(config.hidden_size))
    w.set("llama.block_count", int(config.num_hidden_layers))
    w.set("llama.feed_forward_length", int(config.intermediate_size))
    w.set("llama.attention.head_count", int(config.num_attention_heads))
    w.set("llama.attention.head_count_kv", int(config.num_key_value_heads))
    w.set("llama.attention.layer_norm_rms_epsilon", float(config.rms_norm_eps))
    w.set("llama.rope.freq_base", float(getattr(config, "rope_theta", 10000.0)))
    if tokens is not None:
        w.set("tokenizer.ggml.model", "llama")
        w.set("tokenizer.ggml.tokens", tokens)
        if scores is not None:
            w.set("tokenizer.ggml.scores", [float(s) for s in scores])
        if token_types is not None:
            w.set("tokenizer.ggml.token_type", [int(x) for x in token_types])
        w.set("tokenizer.ggml.bos_token_id", 1)
        w.set("tokenizer.ggml.eos_token_id", 2)
        w.set("tokenizer.ggml.unknown_token_id", 0)

    _add(w, "token_embd.weight", t("model.embed_tokens.weight"), ftype)
    _add(w, "output_norm.weight", t("model.norm.weight"), ftype)
    if "lm_head.weight" in state_dict:
        _add(w, "output.weight", t("lm_head.weight"), ftype)
    for i in range(config.num_hidden_layers):
        hf = f"model.layers.{i}."
        gg = f"blk.{i}."
        _add(w, gg + "attn_norm.weight", t(hf + "input_layernorm.weight"), ftype)
        _add(w, gg + "attn_q.weight", t(hf + "self_attn.q_proj.weight"), ftype)
        _add(w, gg + "attn_k.weight", t(hf + "self_attn.k_proj.weight"), ftype)
        _add(w, gg + "attn_v.weight", t(hf + "self_attn.v_proj.weight"), ftype)
        _add(w, gg + "attn_output.weight", t(hf + "self_attn.o_proj.weight"), ftype)
        _add(w, gg + "ffn_norm.weight", t(hf + "post_attention_layernorm.weight"), ftype)
        _add(w, gg + "ffn_gate.weight", t(hf + "mlp.gate_proj.weight"), ftype)
        _add(w, gg + "ffn_up.weight", t(hf + "mlp.up_proj.weight"), ftype)
        _add(w, gg + "ffn_down.weight", t(hf + "mlp.down_proj.weight"), ftype)
    w.write(path)
    return path


def convert_gptj(state_dict: dict, config, path,
                 ftype: GGMLType = GGMLType.F32,
                 tokens: list[str] | None = None):
    """HF GPTJForCausalLM state_dict → gptj GGUF. HF Linear is (out, in) —
    no transpose (unlike gpt2's Conv1D). Rotary is interleaved (ggml NORMAL
    mode), weights map 1:1."""

    def t(name):
        return state_dict[name].detach().cpu().numpy().astype(np.float32)

    w = GGUFWriter()
    w.set("general.architecture", "gptj")
    w.set("gptj.vocab_size", int(config.vocab_size))
    w.set("gptj.context_length", int(config.n_positions))
    w.set("gptj.embedding_length", int(config.n_embd))
    w.set("gptj.block_count", int(config.n_layer))
    w.set("gptj.attention.head_count", int(config.n_head))
    w.set("gptj.rope.dimension_count", int(config.rotary_dim))
    w.set("gptj.attention.layer_norm_epsilon", float(config.layer_norm_epsilon))
    if tokens is not None:
        w.set("tokenizer.ggml.model", "gpt2")
        w.set("tokenizer.ggml.tokens", tokens)

    _add(w, "token_embd.weight", t("transformer.wte.weight"), ftype)
    _add(w, "output_norm.weight", t("transformer.ln_f.weight"), ftype)
    _add(w, "output_norm.bias", t("transformer.ln_f.bias"), ftype)
    _add(w, "output.weight", t("lm_head.weight"), ftype)
    _add(w, "output.bias", t("lm_head.bias"), ftype)
    for i in range(config.n_layer):
        hf = f"transformer.h.{i}."
        gg = f"blk.{i}."
        _add(w, gg + "attn_norm.weight", t(hf + "ln_1.weight"), ftype)
        _add(w, gg + "attn_norm.bias", t(hf + "ln_1.bias"), ftype)
        _add(w, gg + "attn_q.weight", t(hf + "attn.q_proj.weight"), ftype)
        _add(w, gg + "attn_k.weight", t(hf + "attn.k_proj.weight"), ftype)
        _add(w, gg + "attn_v.weight", t(hf + "attn.v_proj.weight"), ftype)
        _add(w, gg + "attn_output.weight", t(hf + "attn.out_proj.weight"), ftype)
        _add(w, gg + "ffn_up.weight", t(hf + "mlp.fc_in.weight"), ftype)
        _add(w, gg + "ffn_up.bias", t(hf + "mlp.fc_in.bias"), ftype)
        _add(w, gg + "ffn_down.weight", t(hf + "mlp.fc_out.weight"), ftype)
        _add(w, gg + "ffn_down.bias", t(hf + "mlp.fc_out.bias"), ftype)
    w.write(path)
    return path


def convert_gpt2(state_dict: dict, config, path, ftype: GGMLType = GGMLType.F32,
                 tokens: list[str] | None = None,
                 merges: list[str] | None = None):
    """HF GPT2LMHeadModel state_dict → gpt2 GGUF.

    HF's Conv1D stores weights (in, out); ggml mul_mat wants (out, in) —
    transposed here (same flip the reference converter does)."""

    def t(name):
        return state_dict[name].detach().cpu().numpy().astype(np.float32)

    w = GGUFWriter()
    w.set("general.architecture", "gpt2")
    w.set("general.name", "gpt2")
    w.set("gpt2.vocab_size", int(config.vocab_size))
    w.set("gpt2.context_length", int(config.n_positions))
    w.set("gpt2.embedding_length", int(config.n_embd))
    w.set("gpt2.block_count", int(config.n_layer))
    w.set("gpt2.attention.head_count", int(config.n_head))
    w.set("gpt2.attention.layer_norm_epsilon", float(config.layer_norm_epsilon))
    if tokens is not None:
        w.set("tokenizer.ggml.model", "gpt2")
        w.set("tokenizer.ggml.tokens", tokens)
    if merges is not None:
        w.set("tokenizer.ggml.merges", merges)

    _add(w, "token_embd.weight", t("transformer.wte.weight"), ftype)
    _add(w, "position_embd.weight", t("transformer.wpe.weight"), ftype)
    _add(w, "output_norm.weight", t("transformer.ln_f.weight"), ftype)
    _add(w, "output_norm.bias", t("transformer.ln_f.bias"), ftype)
    for i in range(config.n_layer):
        hf = f"transformer.h.{i}."
        gg = f"blk.{i}."
        _add(w, gg + "attn_norm.weight", t(hf + "ln_1.weight"), ftype)
        _add(w, gg + "attn_norm.bias", t(hf + "ln_1.bias"), ftype)
        _add(w, gg + "attn_qkv.weight", t(hf + "attn.c_attn.weight").T, ftype)
        _add(w, gg + "attn_qkv.bias", t(hf + "attn.c_attn.bias"), ftype)
        _add(w, gg + "attn_output.weight", t(hf + "attn.c_proj.weight").T, ftype)
        _add(w, gg + "attn_output.bias", t(hf + "attn.c_proj.bias"), ftype)
        _add(w, gg + "ffn_norm.weight", t(hf + "ln_2.weight"), ftype)
        _add(w, gg + "ffn_norm.bias", t(hf + "ln_2.bias"), ftype)
        _add(w, gg + "ffn_up.weight", t(hf + "mlp.c_fc.weight").T, ftype)
        _add(w, gg + "ffn_up.bias", t(hf + "mlp.c_fc.bias"), ftype)
        _add(w, gg + "ffn_down.weight", t(hf + "mlp.c_proj.weight").T, ftype)
        _add(w, gg + "ffn_down.bias", t(hf + "mlp.c_proj.bias"), ftype)
    w.write(path)
    return path


def convert_mixtral(state_dict: dict, config, path,
                    ftype: GGMLType = GGMLType.F32):
    """HF MixtralForCausalLM state_dict → Mixtral-convention GGUF
    (arch=llama + llama.expert_count, stacked blk.N.ffn_*_exps tensors —
    the llama.cpp schema the reference ecosystem serves Mixtral with).

    Expert stacks are quantized per 2-D expert slice when ftype is set
    (each expert's rows quantize independently; wire bytes identical to
    per-expert tensors)."""
    import torch  # noqa: F401  (state_dict tensors)

    def t(name):
        return state_dict[name].detach().cpu().numpy().astype(np.float32)

    w = GGUFWriter()
    w.set("general.architecture", "llama")
    w.set("general.name", "mixtral")
    w.set("llama.vocab_size", int(config.vocab_size))
    w.set("llama.context_length", int(config.max_position_embeddings))
    w.set("llama.embedding_length", int(config.hidden_size))
    w.set("llama.block_count", int(config.num_hidden_layers))
    w.set("llama.feed_forward_length", int(config.intermediate_size))
    w.set("llama.attention.head_count", int(config.num_attention_heads))
    w.set("llama.attention.head_count_kv", int(config.num_key_value_heads))
    w.set("llama.attention.layer_norm_rms_epsilon",
          float(config.rms_norm_eps))
    w.set("llama.rope.freq_base", float(getattr(config, "rope_theta",
                                                10000.0)))
    w.set("llama.expert_count", int(config.num_local_experts))
    w.set("llama.expert_used_count", int(config.num_experts_per_tok))

    def add_exps(name, arrs):
        stacked = np.ascontiguousarray(np.stack(arrs))      # (E, n_out, K)
        tt = ftype
        if tt != GGMLType.F32 and stacked.shape[-1] % \
                TYPE_TRAITS[tt].blck_size == 0:
            w.add_array_tensor(name, stacked, tt)
        else:
            w.add_array_tensor(name, stacked)

    _add(w, "token_embd.weight", t("model.embed_tokens.weight"), ftype)
    _add(w, "output_norm.weight", t("model.norm.weight"), ftype)
    if "lm_head.weight" in state_dict:
        _add(w, "output.weight", t("lm_head.weight"), ftype)
    E = int(config.num_local_experts)
    for i in range(config.num_hidden_layers):
        hf = f"model.layers.{i}."
        gg = f"blk.{i}."
        _add(w, gg + "attn_norm.weight", t(hf + "input_layernorm.weight"),
             ftype)
        for s, d in (("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v"),
                     ("o", "attn_output")):
            _add(w, gg + d + ".weight",
                 t(hf + f"self_attn.{s}_proj.weight"), ftype)
        _add(w, gg + "ffn_norm.weight",
             t(hf + "post_attention_layernorm.weight"), ftype)
        w.add_array_tensor(gg + "ffn_gate_inp.weight",
                           t(hf + "block_sparse_moe.gate.weight"))
        moe = hf + "block_sparse_moe.experts."
        add_exps(gg + "ffn_gate_exps.weight",
                 [t(moe + f"{e}.w1.weight") for e in range(E)])
        add_exps(gg + "ffn_down_exps.weight",
                 [t(moe + f"{e}.w2.weight") for e in range(E)])
        add_exps(gg + "ffn_up_exps.weight",
                 [t(moe + f"{e}.w3.weight") for e in range(E)])
    w.write(path)
    return path
