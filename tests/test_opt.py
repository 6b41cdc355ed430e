"""Training layer tests — port of the reference test strategy
(tests/test-opt.cpp: dataset shuffling :199, gradient accumulation :284,
forward/backward weight evolution :338, epoch-vs-fit equivalence :466,
regression convergence) plus AdamW parity vs torch.optim.AdamW.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ggml_gfx906_tpu.training import (
    AdamWParams, SGDParams, adamw_init, adamw_step, sgd_step)
from ggml_gfx906_tpu.training.dataset import Dataset
from ggml_gfx906_tpu.training.fit import fit, make_train_step


def test_dataset_shuffle_and_batches():
    data = np.arange(20, dtype=np.float32).reshape(10, 2)
    labels = np.arange(10, dtype=np.float32)[:, None]
    ds = Dataset(data, labels)
    x, y = ds.get_batch(1, 2)
    np.testing.assert_array_equal(x, data[2:4])
    rng = np.random.default_rng(0)
    ds.shuffle(rng)
    got = np.concatenate([ds.get_batch(i, 2)[0] for i in range(5)])
    # shuffled but a permutation of the original rows
    assert not np.array_equal(got, data)
    np.testing.assert_array_equal(np.sort(got.ravel()), np.sort(data.ravel()))
    # partial shuffle leaves the tail (val split) in place
    ds2 = Dataset(data, labels)
    ds2.shuffle(np.random.default_rng(1), n=6)
    np.testing.assert_array_equal(ds2.get_batch(3, 2)[0], data[6:8])
    np.testing.assert_array_equal(ds2.get_batch(4, 2)[0], data[8:10])


def test_adamw_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 6)).astype(np.float32)
    hp = AdamWParams(alpha=0.01, beta1=0.9, beta2=0.95, eps=1e-8, wd=0.1)

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=hp.alpha, betas=(hp.beta1, hp.beta2),
                             eps=hp.eps, weight_decay=hp.wd)
    params = {"w": jnp.asarray(w0)}
    state = adamw_init(params)
    for it in range(5):
        g = rng.standard_normal((4, 6)).astype(np.float32)
        tw.grad = torch.tensor(g)
        topt.step()
        params, state = adamw_step(params, {"w": jnp.asarray(g)}, state, hp)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tw.detach().numpy(), rtol=2e-5, atol=2e-6,
                                   err_msg=f"iter {it}")


def test_sgd_with_decay():
    params = {"w": jnp.asarray(np.ones((3,), np.float32))}
    g = {"w": jnp.asarray(np.full((3,), 2.0, np.float32))}
    out = sgd_step(params, g, SGDParams(alpha=0.1, wd=0.5))
    # w*(1-0.1*0.5) - 0.1*2 = 0.95 - 0.2
    np.testing.assert_allclose(np.asarray(out["w"]), 0.75, rtol=1e-6)


def test_grad_accumulation_equivalence():
    """opt_period=2 with half-batches == one step on the full batch
    (ref test-opt.cpp grad accumulation test)."""
    rng = np.random.default_rng(3)
    X = rng.standard_normal((8, 4)).astype(np.float32)
    Y = (X @ rng.standard_normal((4, 1)).astype(np.float32))

    def loss_fn(p, x, y):
        return ((x @ p["w"] - y) ** 2).mean()

    hp = AdamWParams(alpha=0.01)
    w0 = rng.standard_normal((4, 1)).astype(np.float32)

    # full batch, opt_period=1
    p1 = {"w": jnp.asarray(w0)}
    st1 = adamw_init(p1)
    step1 = make_train_step(loss_fn, hp, opt_period=1)
    acc1 = jax.tree.map(jnp.zeros_like, p1)
    p1, st1, acc1, _ = step1(p1, st1, acc1, jnp.int32(0),
                             jnp.asarray(X), jnp.asarray(Y))

    # two half batches, opt_period=2 (loss is a mean, so grads average)
    p2 = {"w": jnp.asarray(w0)}
    st2 = adamw_init(p2)
    step2 = make_train_step(loss_fn, hp, opt_period=2)
    acc2 = jax.tree.map(jnp.zeros_like, p2)
    for ib in range(2):
        p2, st2, acc2, _ = step2(p2, st2, acc2, jnp.int32(ib),
                                 jnp.asarray(X[ib * 4:(ib + 1) * 4]),
                                 jnp.asarray(Y[ib * 4:(ib + 1) * 4]))
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]),
                               rtol=1e-5, atol=1e-7)


def test_linear_regression_convergence():
    """fit() drives a linear model to the ground truth (ref test-opt.cpp
    regression test)."""
    rng = np.random.default_rng(0)
    true_w = np.array([[2.0], [-3.0], [0.5]], np.float32)
    X = rng.standard_normal((256, 3)).astype(np.float32)
    Y = X @ true_w + 0.01 * rng.standard_normal((256, 1)).astype(np.float32)

    def loss_fn(p, x, y):
        return ((x @ p["w"] + p["b"] - y) ** 2).mean()

    params = {"w": jnp.zeros((3, 1)), "b": jnp.zeros(())}
    ds = Dataset(X, Y)
    params, result = fit(loss_fn, params, ds, batch_size=32, n_epochs=60,
                         hp=AdamWParams(alpha=0.05), verbose=False)
    np.testing.assert_allclose(np.asarray(params["w"]), true_w, atol=0.05)
    assert result.train_loss[-1] < 0.01


def test_mnist_fc_trains_and_saves(tmp_path):
    """End-to-end mnist parity flow: train → eval → GGUF save/load → same acc
    (ref: mnist example flow, examples/mnist)."""
    from ggml_gfx906_tpu.models import mnist

    X, Y = mnist.synthetic_mnist(2000, seed=0)
    params, result = mnist.train("fc", X, Y, n_epochs=2, batch_size=100,
                                 verbose=False)
    Xt, Yt = mnist.synthetic_mnist(500, seed=1)
    acc = mnist.evaluate("fc", params, Xt, Yt)
    assert acc > 0.9, acc
    p = tmp_path / "mnist-fc.gguf"
    mnist.save_gguf("fc", params, p)
    arch, params2 = mnist.load_gguf(p)
    assert arch == "fc"
    acc2 = mnist.evaluate("fc", params2, Xt, Yt)
    assert acc2 == acc


def test_mnist_cnn_trains():
    from ggml_gfx906_tpu.models import mnist

    X, Y = mnist.synthetic_mnist(1500, seed=2)
    params, result = mnist.train("cnn", X, Y, n_epochs=2, batch_size=100,
                                 verbose=False)
    Xt, Yt = mnist.synthetic_mnist(400, seed=3)
    acc = mnist.evaluate("cnn", params, Xt, Yt)
    assert acc > 0.85, acc
