"""SAM parity vs HF transformers SamModel (random weights, CPU).

Uses a shrunken ViT (4 layers, 256x256 image) for test speed; the
architecture code paths (windowed + global attention, rel-pos, neck,
prompt encoder, two-way decoder) are identical at full size.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ggml_gfx906_tpu.models import sam


@pytest.fixture(scope="module")
def hf_sam():
    torch.manual_seed(0)
    cfg = transformers.SamConfig()
    cfg.vision_config.num_hidden_layers = 4
    cfg.vision_config.image_size = 256
    cfg.vision_config.global_attn_indexes = [1, 3]
    cfg.prompt_encoder_config.image_size = 256
    cfg.prompt_encoder_config.image_embedding_size = 16
    model = transformers.SamModel(cfg)
    model.eval()
    return model, cfg


@pytest.fixture(scope="module")
def my_sam(hf_sam):
    model, hf_cfg = hf_sam
    cfg, params = sam.from_hf(model.state_dict(), n_layer=4)
    cfg = sam.SamConfig(n_enc_layer=4, n_img_size=256)
    return cfg, params


def test_image_encoder_parity(hf_sam, my_sam, monkeypatch):
    model, _ = hf_sam
    cfg, params = my_sam
    monkeypatch.setattr(sam, "GLOBAL_ATTN", (1, 3))
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref = model.vision_encoder(torch.tensor(img))[0].numpy()
    got = np.asarray(jax.jit(
        lambda p, im: sam.encode_image(cfg, p, im))(params["enc"],
                                                    jnp.asarray(img)))
    nmse = ((got - ref) ** 2).sum() / (ref ** 2).sum()
    assert nmse < 1e-9, nmse


def test_full_mask_decode_parity(hf_sam, my_sam, monkeypatch):
    """End-to-end: image + point prompt → masks + iou vs HF SamModel."""
    model, _ = hf_sam
    cfg, params = my_sam
    monkeypatch.setattr(sam, "GLOBAL_ATTN", (1, 3))
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 3, 256, 256)).astype(np.float32)
    points = np.array([[[[100.0, 120.0]]]])  # HF wants (B, point_batch, N, 2)
    labels = np.array([[[1]]])
    with torch.no_grad():
        out = model(pixel_values=torch.tensor(img),
                    input_points=torch.tensor(points),
                    input_labels=torch.tensor(labels),
                    multimask_output=True)
        ref_masks = out.pred_masks[0, 0].numpy()       # (3, 256, 256)
        ref_iou = out.iou_scores[0, 0].numpy()         # (3,)

    emb = sam.encode_image(cfg, params["enc"], jnp.asarray(img))
    sparse = sam.encode_points(cfg, params["pe"],
                               points[0].astype(np.float32),
                               labels[0].astype(np.int32))
    masks, iou = sam.decode_masks(cfg, params["dec"], params["pe"], emb, sparse)
    # HF multimask_output drops mask 0 (the single-mask token)
    got_masks = np.asarray(masks)[0, 1:4]
    got_iou = np.asarray(iou)[0, 1:4]
    nmse = ((got_masks - ref_masks) ** 2).sum() / (ref_masks ** 2).sum()
    assert nmse < 1e-6, nmse
    np.testing.assert_allclose(got_iou, ref_iou, rtol=1e-4, atol=1e-5)


def test_sam_gguf_roundtrip(my_sam, tmp_path):
    """GGUF save/load must reproduce config and every tensor exactly
    (dotted-path pytree serialization, gguf/pytree.py)."""
    cfg, params = my_sam
    path = str(tmp_path / "sam.gguf")
    sam.save_gguf(path, cfg, params)
    cfg2, params2 = sam.load_gguf(path)
    assert cfg2 == cfg
    leaves1 = jax.tree_util.tree_flatten_with_path(params)[0]
    leaves2 = jax.tree_util.tree_flatten_with_path(params2)[0]
    # tuples become lists on load; compare by path string and value
    as_map = {jax.tree_util.keystr(k): v for k, v in leaves2}
    assert len(leaves1) == len(as_map)
    for k, v in leaves1:
        got = as_map[jax.tree_util.keystr(k)]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
