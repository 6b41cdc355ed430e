"""Config tiering and cooperative-abort surfaces (ggml_set_abort_callback
analogue, include/ggml.h:650-653; env/flag consolidation)."""
import numpy as np
import pytest

from ggml_gfx906_tpu.utils import abort, config


def test_config_precedence(monkeypatch):
    assert config.get("int8_min_m") == 64                  # default
    monkeypatch.setenv("GGML_TPU_INT8_MIN_M", "32")
    assert config.get("int8_min_m") == 32                  # env wins
    config.set("int8_min_m", 16)
    try:
        assert config.get("int8_min_m") == 16              # override wins
        src = dict((n, s) for n, _, s, _ in config.describe())
        assert src["int8_min_m"] == "override"
    finally:
        config.unset("int8_min_m")
    assert config.get("int8_min_m") == 32


def test_config_unknown_key():
    with pytest.raises(KeyError):
        config.get("no_such_knob")
    with pytest.raises(KeyError):
        config.set("no_such_knob", 1)


def test_abort_stops_engine():
    from ggml_gfx906_tpu.models import llama
    from ggml_gfx906_tpu.runtime.engine import Engine

    cfg = llama.LlamaConfig(n_vocab=64, n_ctx=32, n_embd=32, n_head=2,
                            n_kv_head=2, n_layer=1, n_ff=64)
    params = llama.random_params(cfg, seed=0)
    eng = Engine(llama, cfg, params, max_batch=1, max_seq=32)
    eng.submit([1, 2, 3], 16)
    steps = {"n": 0}

    # abort on the SECOND poll: the scan-window path polls once per
    # harvest window (documented cancel granularity), and a 16-token run
    # spans only a few windows at the default depth
    def cb():
        steps["n"] += 1
        return steps["n"] > 1

    abort.set_abort_callback(cb)
    try:
        with pytest.raises(abort.Aborted):
            eng.run()
    finally:
        abort.set_abort_callback(None)
    assert 0 < len(eng.slots[0].out) < 16   # stopped mid-generation


def test_abort_stops_generate():
    from ggml_gfx906_tpu.models import llama

    cfg = llama.LlamaConfig(n_vocab=64, n_ctx=32, n_embd=32, n_head=2,
                            n_kv_head=2, n_layer=1, n_ff=64)
    params = llama.random_params(cfg, seed=0)
    calls = {"n": 0}

    def cb():
        calls["n"] += 1
        return calls["n"] > 2

    abort.set_abort_callback(cb)
    try:
        with pytest.raises(abort.Aborted):
            llama.generate(cfg, params, [1, 2], 10, max_seq=32)
    finally:
        abort.set_abort_callback(None)


def test_observe_taps_and_graph_dump(tmp_path):
    """Per-node observation (eval-callback analogue) + graph dump."""
    import jax.numpy as jnp

    from ggml_gfx906_tpu.models import llama
    from ggml_gfx906_tpu.utils import observe, trace

    cfg = llama.LlamaConfig(n_vocab=64, n_ctx=32, n_embd=32, n_head=2,
                            n_kv_head=2, n_layer=2, n_ff=64)
    params = llama.random_params(cfg, seed=0)
    seen = {}

    def spy(name, value):
        seen[name] = value.shape

    with observe.observer(spy):
        kv = llama.make_cache(cfg, 16)
        logits, _ = llama.forward(cfg, params, jnp.asarray([1, 2], jnp.int32),
                                  kv, jnp.int32(0))
        np.asarray(logits)   # flush callbacks
    assert "blk.0.attn_out" in seen and "blk.1.ffn_out" in seen
    assert seen["logits"] == (2, 64)
    # no observer → no taps traced
    seen.clear()
    kv = llama.make_cache(cfg, 16)
    np.asarray(llama.forward(cfg, params, jnp.asarray([1], jnp.int32),
                             kv, jnp.int32(0))[0])
    assert not seen

    txt = trace.dump_graph(
        lambda x: x * 2 + 1, jnp.ones((4,)), path=str(tmp_path / "g.txt"))
    assert "hlo" in txt or "stablehlo" in txt or "module" in txt
