"""MNIST train+eval — the reference's end-to-end training example.

ref: examples/mnist/mnist-common.cpp — fc model (784→500 relu→10,
MNIST_NHIDDEN=500 mnist-common.h:32) and cnn model (2× [conv3x3 + relu +
pool2x2] with 8/16 channels MNIST_CNN_NCB=8, then dense→10), trained via
ggml_opt_fit with AdamW and cross-entropy; weights saved/loaded as GGUF.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..gguf import GGUFReader, GGUFWriter
from ..training import AdamWParams
from ..training.dataset import Dataset
from ..training.fit import fit

HW = 28
NINPUT = HW * HW
NCLASSES = 10
NHIDDEN = 500
CNN_NCB = 8


# ---------------------------------------------------------------- fc model

def init_fc(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    s1 = np.sqrt(2.0 / NINPUT)
    s2 = np.sqrt(2.0 / NHIDDEN)
    return {
        "fc1_w": jnp.asarray(rng.standard_normal((NHIDDEN, NINPUT)).astype(np.float32) * s1),
        "fc1_b": jnp.zeros((NHIDDEN,), jnp.float32),
        "fc2_w": jnp.asarray(rng.standard_normal((NCLASSES, NHIDDEN)).astype(np.float32) * s2),
        "fc2_b": jnp.zeros((NCLASSES,), jnp.float32),
    }


def forward_fc(params: dict, x: jax.Array) -> jax.Array:
    """x (B, 784) → logits (B, 10)."""
    h = ops.relu(x @ params["fc1_w"].T + params["fc1_b"])
    return h @ params["fc2_w"].T + params["fc2_b"]


# ---------------------------------------------------------------- cnn model

def init_cnn(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)

    def w(*shape, fan_in):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * np.sqrt(2.0 / fan_in))

    ncb = CNN_NCB
    return {
        "conv1_k": w(ncb, 1, 3, 3, fan_in=9),
        "conv1_b": jnp.zeros((ncb,), jnp.float32),
        "conv2_k": w(ncb * 2, ncb, 3, 3, fan_in=9 * ncb),
        "conv2_b": jnp.zeros((ncb * 2,), jnp.float32),
        "dense_w": w(NCLASSES, (HW // 4) ** 2 * ncb * 2, fan_in=(HW // 4) ** 2 * ncb * 2),
        "dense_b": jnp.zeros((NCLASSES,), jnp.float32),
    }


def forward_cnn(params: dict, x: jax.Array) -> jax.Array:
    """x (B, 784) → logits (B, 10). conv3x3(pad1)+relu+pool2x2, twice, dense."""
    b = x.shape[0]
    h = x.reshape(b, 1, HW, HW)
    h = ops.conv_2d(h, params["conv1_k"], padding=(1, 1))
    h = ops.relu(h + params["conv1_b"][None, :, None, None])
    h = ops.pool_2d(h, "max", (2, 2), (2, 2))
    h = ops.conv_2d(h, params["conv2_k"], padding=(1, 1))
    h = ops.relu(h + params["conv2_b"][None, :, None, None])
    h = ops.pool_2d(h, "max", (2, 2), (2, 2))
    h = h.reshape(b, -1)
    return h @ params["dense_w"].T + params["dense_b"]


# ---------------------------------------------------------------- training

def loss_fn(forward):
    def f(params, x, y):
        logits = forward(params, x)
        return ops.cross_entropy_loss(logits, y)
    return f


def accuracy_fn(forward):
    def f(params, x, y):
        logits = forward(params, x)
        return (jnp.argmax(logits, -1) == jnp.argmax(y, -1)).mean()
    return f


def train(arch: str, data: np.ndarray, labels_onehot: np.ndarray,
          n_epochs: int = 3, batch_size: int = 500, lr: float = 1e-3,
          val_split: float = 0.05, seed: int = 0, verbose=True):
    """mnist_model_train analogue (ref mnist-common.cpp:412 → ggml_opt_fit)."""
    forward = forward_fc if arch == "fc" else forward_cnn
    params = init_fc(seed) if arch == "fc" else init_cnn(seed)
    ds = Dataset(data.astype(np.float32), labels_onehot.astype(np.float32))
    params, result = fit(
        loss_fn(forward), params, ds, batch_size, n_epochs=n_epochs,
        val_split=val_split, hp=AdamWParams(alpha=lr),
        accuracy_fn=accuracy_fn(forward), seed=seed, verbose=verbose)
    return params, result


def evaluate(arch: str, params: dict, data, labels_onehot) -> float:
    forward = forward_fc if arch == "fc" else forward_cnn
    logits = jax.jit(forward)(params, jnp.asarray(data, jnp.float32))
    return float((jnp.argmax(logits, -1)
                  == jnp.argmax(jnp.asarray(labels_onehot), -1)).mean())


# ---------------------------------------------------------------- GGUF io
# (ref: the mnist example saves trained weights as GGUF; tensor names match
# mnist-common.cpp:160-210)

def save_gguf(arch: str, params: dict, path):
    w = GGUFWriter()
    w.set("general.architecture", f"mnist-{arch}")
    if arch == "fc":
        w.add_array_tensor("fc1.weight", np.asarray(params["fc1_w"]))
        w.add_array_tensor("fc1.bias", np.asarray(params["fc1_b"]))
        w.add_array_tensor("fc2.weight", np.asarray(params["fc2_w"]))
        w.add_array_tensor("fc2.bias", np.asarray(params["fc2_b"]))
    else:
        w.add_array_tensor("conv1.kernel", np.asarray(params["conv1_k"]))
        w.add_array_tensor("conv1.bias", np.asarray(params["conv1_b"]))
        w.add_array_tensor("conv2.kernel", np.asarray(params["conv2_k"]))
        w.add_array_tensor("conv2.bias", np.asarray(params["conv2_b"]))
        w.add_array_tensor("dense.weight", np.asarray(params["dense_w"]))
        w.add_array_tensor("dense.bias", np.asarray(params["dense_b"]))
    w.write(path)


def load_gguf(path) -> tuple[str, dict]:
    r = GGUFReader(path)
    arch = r.kv["general.architecture"].removeprefix("mnist-")
    t = lambda n: jnp.asarray(r.tensor_float(n))
    if arch == "fc":
        params = {"fc1_w": t("fc1.weight"), "fc1_b": t("fc1.bias"),
                  "fc2_w": t("fc2.weight"), "fc2_b": t("fc2.bias")}
    else:
        params = {"conv1_k": t("conv1.kernel"), "conv1_b": t("conv1.bias"),
                  "conv2_k": t("conv2.kernel"), "conv2_b": t("conv2.bias"),
                  "dense_w": t("dense.weight"), "dense_b": t("dense.bias")}
    return arch, params


def synthetic_mnist(n: int, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Class-dependent blob images (stand-in for the real MNIST files, which
    cannot be downloaded in this sandbox). Learnable but not trivial."""
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, NCLASSES, n)
    xs = rng.random((n, HW, HW), dtype=np.float32) * 0.3
    for i, y in enumerate(ys):
        r, c = divmod(int(y), 4)
        xs[i, 4 + r * 7:11 + r * 7, 3 + c * 6:9 + c * 6] += 0.7
    onehot = np.eye(NCLASSES, dtype=np.float32)[ys]
    return xs.reshape(n, NINPUT), onehot
