"""YOLOv3-tiny object detection.

ref: examples/yolo/yolov3-tiny.cpp — 13 conv layers with batch-norm +
leaky-relu (apply_conv2d :170), maxpools (incl. darknet's stride-1 "same"
pool, build_graph :421), route/upsample/concat head, two yolo detection
layers (16: mask {3,4,5}, 23: mask {0,1,2}, anchors :459-475), logistic
activations on xy/objectness/classes (apply_yolo :193), box decode
(get_yolo_box :207) and NMS.

Weights GGUF tensor names: l{i}_weights/biases/scales/rolling_mean/
rolling_variance (load_model :122-136).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..gguf import GGUFReader

# layers without batch-norm / activation / padding (ref :113-121)
NO_PAD = {7, 9, 10, 12}
NO_BN = {9, 12}

ANCHORS = [10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319]
MASK16 = [3, 4, 5]
MASK23 = [0, 1, 2]
N_CLASSES = 80


def load(path) -> list[dict]:
    r = GGUFReader(path)
    layers = []
    for i in range(13):
        lyr = {
            "w": jnp.asarray(r.tensor_float(f"l{i}_weights")),
            "b": jnp.asarray(r.tensor_float(f"l{i}_biases")).reshape(-1),
        }
        if i not in NO_BN:
            lyr["scale"] = jnp.asarray(r.tensor_float(f"l{i}_scales")).reshape(-1)
            lyr["mean"] = jnp.asarray(r.tensor_float(f"l{i}_rolling_mean")).reshape(-1)
            lyr["var"] = jnp.asarray(r.tensor_float(f"l{i}_rolling_variance")).reshape(-1)
        layers.append(lyr)
    return layers


def _conv(x, lyr, idx: int):
    """apply_conv2d: conv 3x3(p1)/1x1(p0) → bn → bias → leaky(0.1)."""
    pad = 0 if idx in NO_PAD else (lyr["w"].shape[-1] // 2)
    y = ops.conv_2d(x, lyr["w"], padding=(pad, pad))
    c = y.shape[1]
    if idx not in NO_BN:
        y = (y - lyr["mean"].reshape(1, c, 1, 1)) / jnp.sqrt(
            lyr["var"].reshape(1, c, 1, 1))
        y = y * lyr["scale"].reshape(1, c, 1, 1)
    y = y + lyr["b"].reshape(1, c, 1, 1)
    if idx not in NO_BN:
        y = ops.leaky_relu(y, 0.1)
    return y


def _pool2(x):
    return ops.pool_2d(x, "max", (2, 2), (2, 2))


def _pool_same(x):
    """darknet stride-1 'same' maxpool: pad right/bottom with -inf."""
    xp = jnp.pad(x, [(0, 0), (0, 0), (0, 1), (0, 1)],
                 constant_values=-jnp.inf)
    return ops.pool_2d(xp, "max", (2, 2), (1, 1))


def forward(layers: list[dict], img: jax.Array):
    """img (1, 3, H, W) f32 in [0,1] → (layer_15 (1,255,h,w), layer_22)."""
    x = _conv(img, layers[0], 0)
    x = _pool2(x)
    x = _conv(x, layers[1], 1)
    x = _pool2(x)
    x = _conv(x, layers[2], 2)
    x = _pool2(x)
    x = _conv(x, layers[3], 3)
    x = _pool2(x)
    x = _conv(x, layers[4], 4)
    layer_8 = x
    x = _pool2(x)
    x = _conv(x, layers[5], 5)
    x = _pool_same(x)
    x = _conv(x, layers[6], 6)
    x = _conv(x, layers[7], 7)
    layer_13 = x
    x = _conv(x, layers[8], 8)
    layer_15 = _conv(x, layers[9], 9)

    y = _conv(layer_13, layers[10], 10)
    y = ops.upscale_nearest(y, 2, 2)
    y = ops.concat(y, layer_8, axis=1)
    y = _conv(y, layers[11], 11)
    layer_22 = _conv(y, layers[12], 12)
    return layer_15, layer_22


@dataclass
class Detection:
    box: tuple  # (x, y, w, h) relative to the original image
    classes: np.ndarray = field(default=None)
    objectness: float = 0.0


def decode_yolo_layer(pred: np.ndarray, mask, netw: int, neth: int,
                      img_w: int, img_h: int, thresh: float):
    """ref: apply_yolo + get_yolo_box + get_yolo_detections (:193-260):
    logistic on xy/objectness/classes, anchor box decode, letterbox
    correction. pred: (255, h, w) f32."""
    n_anchor = len(mask)
    _, h, w = pred.shape
    p = pred.reshape(n_anchor, 4 + 1 + N_CLASSES, h, w).astype(np.float64)
    sig = lambda a: 1.0 / (1.0 + np.exp(-a))
    xy = sig(p[:, 0:2])
    wh = p[:, 2:4]
    obj = sig(p[:, 4])
    cls = sig(p[:, 5:])

    # letterbox scaling (correct_yolo_box semantics)
    if netw / img_w < neth / img_h:
        new_w, new_h = netw, (img_h * netw) // img_w
    else:
        new_h, new_w = neth, (img_w * neth) // img_h

    dets = []
    cols, rows = np.meshgrid(np.arange(w), np.arange(h))
    for a in range(n_anchor):
        bx = (cols + xy[a, 0]) / w
        by = (rows + xy[a, 1]) / h
        bw = np.exp(wh[a, 0]) * ANCHORS[2 * mask[a]] / netw
        bh = np.exp(wh[a, 1]) * ANCHORS[2 * mask[a] + 1] / neth
        keep = obj[a] > thresh
        for r, c in zip(*np.nonzero(keep)):
            x = (bx[r, c] - (netw - new_w) / 2.0 / netw) / (new_w / netw)
            y = (by[r, c] - (neth - new_h) / 2.0 / neth) / (new_h / neth)
            ww = bw[r, c] * netw / new_w
            hh = bh[r, c] * neth / new_h
            probs = obj[a, r, c] * cls[a, :, r, c]
            probs[probs <= thresh] = 0.0
            dets.append(Detection((x, y, ww, hh), probs, float(obj[a, r, c])))
    return dets


def _iou(a, b):
    def corners(t):
        x, y, w, h = t
        return x - w / 2, y - h / 2, x + w / 2, y + h / 2

    ax0, ay0, ax1, ay1 = corners(a)
    bx0, by0, bx1, by1 = corners(b)
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / union if union > 0 else 0.0


def nms(dets: list[Detection], iou_thresh: float = 0.45) -> list[Detection]:
    """per-class greedy NMS (ref do_nms_sort semantics)."""
    for k in range(N_CLASSES):
        order = sorted(range(len(dets)), key=lambda i: -dets[i].classes[k])
        for ii in range(len(order)):
            i = order[ii]
            if dets[i].classes[k] == 0:
                continue
            for jj in range(ii + 1, len(order)):
                j = order[jj]
                if _iou(dets[i].box, dets[j].box) > iou_thresh:
                    dets[j].classes[k] = 0.0
    return [d for d in dets if d.classes.max() > 0]


def letterbox(img: np.ndarray, netw: int, neth: int) -> np.ndarray:
    """img (3, H, W) in [0,1] → (3, neth, netw) aspect-preserving resize
    onto a 0.5-gray canvas (ref letterbox_image)."""
    import jax.image

    _, h, w = img.shape
    if netw / w < neth / h:
        new_w, new_h = netw, (h * netw) // w
    else:
        new_h, new_w = neth, (w * neth) // h
    resized = np.asarray(jax.image.resize(jnp.asarray(img),
                                          (3, new_h, new_w), "bilinear"))
    out = np.full((3, neth, netw), 0.5, np.float32)
    dy, dx = (neth - new_h) // 2, (netw - new_w) // 2
    out[:, dy:dy + new_h, dx:dx + new_w] = resized
    return out


def detect(layers: list[dict], img: np.ndarray, netw: int = 416,
           neth: int = 416, thresh: float = 0.5) -> list[Detection]:
    """Full pipeline: letterbox → network → two yolo heads → NMS."""
    _, img_h, img_w = img.shape
    sized = letterbox(img, netw, neth)
    l15, l22 = jax.jit(forward)(layers, jnp.asarray(sized[None]))
    dets = decode_yolo_layer(np.asarray(l15[0]), MASK16, netw, neth,
                             img_w, img_h, thresh)
    dets += decode_yolo_layer(np.asarray(l22[0]), MASK23, netw, neth,
                              img_w, img_h, thresh)
    return nms(dets)
