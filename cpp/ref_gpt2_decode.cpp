// Cross-runtime parity oracle: drives the REFERENCE ggml runtime (compiled
// from /root/reference at test time, like tests/test_c_oracle.py does for the
// quant codecs) on a GGUF file produced by ggml_gfx906_tpu's writer.
//
// Proves two things at once:
//   (a) our GGUF writer output is accepted by the reference C reader
//       (ref: src/gguf.cpp:319 gguf_init_from_file_impl), and
//   (b) greedy decode in the reference runtime is token-for-token identical
//       (f32) / NMSE-close (quantized) to our TPU-native runtime
//       (ref smoke equivalent: ci/run.sh gpt-2 inference).
//
// Deliberately cache-free: every step re-evaluates the full prefix (the
// models under test are tiny), so this file carries none of the KV-cache
// view machinery of examples/gpt-2/main-backend.cpp — only the public ggml
// graph API. Usage:
//   ref_gpt2_decode MODEL.gguf N_PREDICT LOGITS_OUT.bin TOK0 [TOK1 ...]
// Prints one token id per line (prompt first, then generated); writes the
// f32 logits vector that produced the LAST token to LOGITS_OUT.bin.

#include "ggml.h"
#include "ggml-cpu.h"
#include "gguf.h"

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static struct ggml_tensor * require(struct ggml_context * ctx, const char * name) {
    struct ggml_tensor * t = ggml_get_tensor(ctx, name);
    if (!t) {
        fprintf(stderr, "missing tensor: %s\n", name);
        exit(3);
    }
    return t;
}

static uint32_t kv_u32(struct gguf_context * g, const std::string & key) {
    int64_t id = gguf_find_key(g, key.c_str());
    if (id < 0) {
        fprintf(stderr, "missing kv: %s\n", key.c_str());
        exit(3);
    }
    return gguf_get_val_u32(g, id);
}

struct hp {
    int64_t n_vocab, n_ctx, n_embd, n_head, n_layer;
    float   eps;
};

// Evaluate tokens[0..n) from scratch; return logits for the last position.
static std::vector<float> eval_prefix(struct ggml_context * wctx, const hp & h,
                                      const std::vector<int32_t> & toks,
                                      int n_threads) {
    const int64_t N  = (int64_t) toks.size();
    const int64_t D  = h.n_embd;
    const int64_t hd = D / h.n_head;

    // generous arena: activations for a tiny model; data IS allocated here
    size_t need = 512u*1024*1024;
    struct ggml_init_params ip = { need, NULL, false };
    struct ggml_context * ctx = ggml_init(ip);

    struct ggml_tensor * embd = ggml_new_tensor_1d(ctx, GGML_TYPE_I32, N);
    struct ggml_tensor * pos  = ggml_new_tensor_1d(ctx, GGML_TYPE_I32, N);
    memcpy(embd->data, toks.data(), N*sizeof(int32_t));
    for (int64_t i = 0; i < N; ++i) ((int32_t *) pos->data)[i] = (int32_t) i;

    struct ggml_tensor * wte = require(wctx, "token_embd.weight");
    struct ggml_tensor * x = ggml_add(ctx,
        ggml_get_rows(ctx, wte, embd),
        ggml_get_rows(ctx, require(wctx, "position_embd.weight"), pos));

    char nm[128];
    for (int64_t il = 0; il < h.n_layer; ++il) {
        #define W(suffix) (snprintf(nm, sizeof(nm), "blk.%d." suffix, (int) il), require(wctx, nm))
        struct ggml_tensor * t = ggml_norm(ctx, x, h.eps);
        t = ggml_add(ctx, ggml_mul(ctx, t, W("attn_norm.weight")), W("attn_norm.bias"));
        t = ggml_add(ctx, ggml_mul_mat(ctx, W("attn_qkv.weight"), t), W("attn_qkv.bias"));

        // t is f32 [3D, N]; slice fused qkv by byte offset
        struct ggml_tensor * q = ggml_view_2d(ctx, t, D, N, t->nb[1], 0*D*sizeof(float));
        struct ggml_tensor * k = ggml_view_2d(ctx, t, D, N, t->nb[1], 1*D*sizeof(float));
        struct ggml_tensor * v = ggml_view_2d(ctx, t, D, N, t->nb[1], 2*D*sizeof(float));

        struct ggml_tensor * q3 = ggml_permute(ctx, ggml_cont_3d(ctx, q, hd, h.n_head, N), 0, 2, 1, 3);
        struct ggml_tensor * k3 = ggml_permute(ctx, ggml_cont_3d(ctx, k, hd, h.n_head, N), 0, 2, 1, 3);
        struct ggml_tensor * att = ggml_soft_max(ctx,
            ggml_diag_mask_inf(ctx,
                ggml_scale(ctx, ggml_mul_mat(ctx, k3, q3), 1.0f/sqrtf((float) hd)),
                /*n_past=*/0));
        struct ggml_tensor * vT = ggml_cont_3d(ctx,
            ggml_permute(ctx, ggml_cont_3d(ctx, v, hd, h.n_head, N), 1, 2, 0, 3),
            N, hd, h.n_head);
        struct ggml_tensor * o = ggml_cont_2d(ctx,
            ggml_permute(ctx, ggml_mul_mat(ctx, vT, att), 0, 2, 1, 3), D, N);
        o = ggml_add(ctx, ggml_mul_mat(ctx, W("attn_output.weight"), o), W("attn_output.bias"));
        x = ggml_add(ctx, x, o);

        struct ggml_tensor * f = ggml_norm(ctx, x, h.eps);
        f = ggml_add(ctx, ggml_mul(ctx, f, W("ffn_norm.weight")), W("ffn_norm.bias"));
        f = ggml_gelu(ctx, ggml_add(ctx, ggml_mul_mat(ctx, W("ffn_up.weight"), f), W("ffn_up.bias")));
        f = ggml_add(ctx, ggml_mul_mat(ctx, W("ffn_down.weight"), f), W("ffn_down.bias"));
        x = ggml_add(ctx, x, f);
        #undef W
    }

    x = ggml_norm(ctx, x, h.eps);
    x = ggml_add(ctx, ggml_mul(ctx, x, require(wctx, "output_norm.weight")),
                 require(wctx, "output_norm.bias"));
    struct ggml_tensor * head = ggml_get_tensor(wctx, "output.weight");
    if (!head) head = wte;  // tied embeddings
    struct ggml_tensor * logits = ggml_mul_mat(ctx, head, x);

    struct ggml_cgraph * gf = ggml_new_graph(ctx);
    ggml_build_forward_expand(gf, logits);
    if (ggml_graph_compute_with_ctx(ctx, gf, n_threads) != GGML_STATUS_SUCCESS) {
        fprintf(stderr, "graph compute failed\n");
        exit(4);
    }

    std::vector<float> out(h.n_vocab);
    memcpy(out.data(), (const char *) logits->data + (N-1)*h.n_vocab*sizeof(float),
           h.n_vocab*sizeof(float));
    ggml_free(ctx);
    return out;
}

int main(int argc, char ** argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s MODEL.gguf N_PREDICT LOGITS_OUT TOK0 [TOK1 ...]\n", argv[0]);
        return 1;
    }
    const char * fname     = argv[1];
    const int    n_predict = atoi(argv[2]);
    const char * out_path  = argv[3];

    std::vector<int32_t> toks;
    for (int i = 4; i < argc; ++i) toks.push_back(atoi(argv[i]));

    struct ggml_context * wctx = NULL;
    struct gguf_init_params gp = { /*no_alloc=*/false, &wctx };
    struct gguf_context * g = gguf_init_from_file(fname, gp);
    if (!g) {
        fprintf(stderr, "reference gguf reader REJECTED %s\n", fname);
        return 2;
    }

    hp h;
    h.n_vocab = kv_u32(g, "gpt2.vocab_size");
    h.n_ctx   = kv_u32(g, "gpt2.context_length");
    h.n_embd  = kv_u32(g, "gpt2.embedding_length");
    h.n_head  = kv_u32(g, "gpt2.attention.head_count");
    h.n_layer = kv_u32(g, "gpt2.block_count");
    int64_t ke = gguf_find_key(g, "gpt2.attention.layer_norm_epsilon");
    h.eps = ke >= 0 ? gguf_get_val_f32(g, ke) : 1e-5f;

    for (size_t i = 0; i < toks.size(); ++i) printf("%d\n", toks[i]);

    std::vector<float> logits;
    for (int step = 0; step < n_predict; ++step) {
        logits = eval_prefix(wctx, h, toks, 2);
        int32_t best = 0;
        for (int64_t v = 1; v < h.n_vocab; ++v) {
            if (logits[v] > logits[best]) best = (int32_t) v;
        }
        toks.push_back(best);
        printf("%d\n", best);
    }

    FILE * fo = fopen(out_path, "wb");
    fwrite(logits.data(), sizeof(float), logits.size(), fo);
    fclose(fo);

    gguf_free(g);
    ggml_free(wctx);
    return 0;
}
