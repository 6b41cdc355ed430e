"""Training-state checkpoint/resume: an interrupted fit must continue
bit-exactly (same shuffles, same updates) as an uninterrupted run."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggml_gfx906_tpu.training import checkpoint as ckpt
from ggml_gfx906_tpu.training.dataset import Dataset
from ggml_gfx906_tpu.training.fit import fit
from ggml_gfx906_tpu.training.opt import AdamWParams


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    w_true = rng.standard_normal((4, 3)).astype(np.float32)
    x = rng.standard_normal((64, 4)).astype(np.float32)
    y = x @ w_true + 0.01 * rng.standard_normal((64, 3)).astype(np.float32)
    params = {"w": jnp.zeros((4, 3), jnp.float32),
              "b": jnp.zeros((3,), jnp.float32)}

    def loss(p, bx, by):
        return jnp.mean((bx @ p["w"] + p["b"] - by) ** 2)

    return params, Dataset(x, y), loss


def test_rng_roundtrip():
    rng = np.random.default_rng(123)
    rng.standard_normal(10)
    buf = ckpt.encode_rng(rng)
    rng2 = ckpt.decode_rng(buf)
    np.testing.assert_array_equal(rng.standard_normal(5),
                                  rng2.standard_normal(5))


def test_fit_resume_bit_exact(tmp_path):
    hp = AdamWParams(alpha=1e-2)
    params, ds, loss = _problem()
    straight, res_s = fit(loss, params, ds, batch_size=8, n_epochs=4,
                          hp=hp, verbose=False, seed=7)

    params2, ds2, _ = _problem()
    d = str(tmp_path / "ck")
    fit(loss, params2, ds2, batch_size=8, n_epochs=2, hp=hp,
        verbose=False, seed=7, checkpoint_dir=d)
    assert ckpt.all_steps(d) == [0, 1]
    # fresh call, fresh dataset/params — resumes after epoch 2
    params3, ds3, _ = _problem()
    resumed, res_r = fit(loss, params3, ds3, batch_size=8, n_epochs=4,
                         hp=hp, verbose=False, seed=7, checkpoint_dir=d)
    for k in straight:
        np.testing.assert_array_equal(np.asarray(straight[k]),
                                      np.asarray(resumed[k]))
    assert res_r.train_loss == pytest.approx(res_s.train_loss)


def test_checkpoint_prunes_old_steps(tmp_path):
    d = str(tmp_path / "ck")
    for s in range(4):
        ckpt.save(d, s, {"x": np.full(3, s)})
    assert ckpt.all_steps(d) == [2, 3]
    assert int(ckpt.restore_latest(d)["x"][0]) == 3
