"""Vision model zoo tests: yolo (vs torch reference impl), magika (golden
values cross-checked against the reference C binary during development).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ggml_gfx906_tpu.gguf import GGUFWriter
from ggml_gfx906_tpu.models import magika, yolo


def _rand_yolo_gguf(path, rng):
    """Random-weight yolov3-tiny GGUF with the reference tensor names/shapes
    (ref load_model yolov3-tiny.cpp:122-136; channel progression 16..1024)."""
    w = GGUFWriter()
    chans = [(3, 16), (16, 32), (32, 64), (64, 128), (128, 256), (256, 512),
             (512, 1024), (1024, 256), (256, 512), (512, 255), (256, 128),
             (384, 256), (256, 255)]
    ksize = [3] * 7 + [1, 3, 1, 1, 3, 1]
    for i, ((ic, oc), k) in enumerate(zip(chans, ksize)):
        w.add_array_tensor(f"l{i}_weights",
                           (rng.standard_normal((oc, ic, k, k)) * 0.05).astype(np.float32))
        w.add_array_tensor(f"l{i}_biases",
                           (rng.standard_normal((oc, 1, 1)) * 0.1).astype(np.float32))
        if i not in yolo.NO_BN:
            w.add_array_tensor(f"l{i}_scales",
                               (1 + 0.1 * rng.standard_normal((oc, 1, 1))).astype(np.float32))
            w.add_array_tensor(f"l{i}_rolling_mean",
                               (0.1 * rng.standard_normal((oc, 1, 1))).astype(np.float32))
            w.add_array_tensor(f"l{i}_rolling_variance",
                               (1 + 0.1 * rng.random((oc, 1, 1))).astype(np.float32))
    w.write(path)


def test_yolo_forward_matches_torch(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    path = tmp_path / "yolo.gguf"
    _rand_yolo_gguf(path, rng)
    layers = yolo.load(path)
    img = rng.random((1, 3, 416, 416), dtype=np.float32)
    l15, l22 = jax.jit(yolo.forward)(layers, jnp.asarray(img))
    assert l15.shape == (1, 255, 13, 13)
    assert l22.shape == (1, 255, 26, 26)

    # independent torch reimplementation of the same graph
    def tconv(x, i):
        lyr = layers[i]
        wt = torch.tensor(np.asarray(lyr["w"]))
        pad = 0 if i in yolo.NO_PAD else wt.shape[-1] // 2
        y = torch.nn.functional.conv2d(x, wt, padding=pad)
        c = y.shape[1]
        if i not in yolo.NO_BN:
            y = (y - torch.tensor(np.asarray(lyr["mean"])).view(1, c, 1, 1)) \
                / torch.sqrt(torch.tensor(np.asarray(lyr["var"])).view(1, c, 1, 1))
            y = y * torch.tensor(np.asarray(lyr["scale"])).view(1, c, 1, 1)
        y = y + torch.tensor(np.asarray(lyr["b"])).view(1, c, 1, 1)
        if i not in yolo.NO_BN:
            y = torch.nn.functional.leaky_relu(y, 0.1)
        return y

    def tpool2(x):
        return torch.nn.functional.max_pool2d(x, 2, 2)

    with torch.no_grad():
        x = torch.tensor(img)
        x = tconv(x, 0); x = tpool2(x)
        x = tconv(x, 1); x = tpool2(x)
        x = tconv(x, 2); x = tpool2(x)
        x = tconv(x, 3); x = tpool2(x)
        x = tconv(x, 4); l8 = x; x = tpool2(x)
        x = tconv(x, 5)
        x = torch.nn.functional.max_pool2d(
            torch.nn.functional.pad(x, (0, 1, 0, 1), value=-torch.inf), 2, 1)
        x = tconv(x, 6); x = tconv(x, 7); l13 = x
        x = tconv(x, 8); t15 = tconv(x, 9)
        y = tconv(l13, 10)
        y = torch.nn.functional.interpolate(y, scale_factor=2, mode="nearest")
        y = torch.cat([y, l8], dim=1)
        y = tconv(y, 11); t22 = tconv(y, 12)

    for mine, ref in [(l15, t15), (l22, t22)]:
        a, b = np.asarray(mine), ref.numpy()
        nmse = ((a - b) ** 2).sum() / (b ** 2).sum()
        assert nmse < 1e-9, nmse


def test_yolo_detect_pipeline(tmp_path):
    rng = np.random.default_rng(1)
    path = tmp_path / "yolo.gguf"
    _rand_yolo_gguf(path, rng)
    layers = yolo.load(path)
    # netw/neth=128 exercises the identical pipeline (letterbox, two
    # detection heads, NMS) at ~1/10 the CPU compile cost of 416
    img = rng.random((3, 96, 150), dtype=np.float32)
    dets = yolo.detect(layers, img, netw=128, neth=128, thresh=0.2)
    for d in dets:  # random weights: just structural sanity + finite boxes
        assert len(d.box) == 4 and np.isfinite(d.box).all()
        assert d.classes.shape == (80,)


def test_magika_golden():
    """Golden outputs captured from the reference C `magika` binary run on
    the same deterministic random model/file (cross-validated during
    development; ref printed: xlsx 11.88%% rst 10.51%% javabytecode 9.76%%
    for this input — label ids 106, 77, 38)."""
    rng = np.random.default_rng(0)

    def t(*shape, scale=0.1):
        return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))

    params = {
        "dense_w": t(128, 257), "dense_b": t(128),
        "ln_g": t(384, scale=1.0), "ln_b": t(384),
        "dense1_w": t(256, 512), "dense1_b": t(256),
        "dense2_w": t(256, 256), "dense2_b": t(256),
        "ln1_g": t(256, scale=1.0), "ln1_b": t(256),
        "label_w": t(113, 256), "label_b": t(113),
    }
    data = rng.integers(0, 256, 100, np.uint8).tobytes()
    probs = magika.classify_bytes(params, data)
    assert probs.shape == (113,)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    top3 = np.argsort(-probs)[:3]
    np.testing.assert_array_equal(top3, [106, 77, 38])
    np.testing.assert_allclose(probs[top3], [0.1190, 0.1049, 0.0976],
                               atol=2e-3)


def test_magika_input_prep_edges():
    # tiny file: all three windows overlap
    out = magika.prepare_input(b"ab")
    assert out[0] == ord("a") and out[1] == ord("b")
    assert (out[2:512] == 256).all()
    # exact beg/mid/end placement for an odd-size file (ref arithmetic)
    n = 1025
    data = bytes(range(256)) * 5  # 1280 bytes
    data = data[:n]
    out = magika.prepare_input(data)
    arr = np.frombuffer(data, np.uint8)
    np.testing.assert_array_equal(out[:512], arr[:512])
    np.testing.assert_array_equal(out[-512:], arr[-512:])
