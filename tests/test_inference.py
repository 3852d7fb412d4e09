"""Inference pipeline tests: box merging semantics, precomputed detector
round-trip, online visual feature construction, aspect-classifier predict
functions, and the torch classifier import."""

import numpy as np
import pytest

from macsa_tpu.inference.pipeline import (
    PrecomputedDetector,
    are_boxes_nearby,
    construct_visual_features,
    merge_boxes,
)


def test_merge_boxes_merges_nearby_same_category():
    boxes = [
        {"category": "bed", "coordinates": [10, 10, 100, 100]},
        {"category": "bed", "coordinates": [12, 8, 105, 98]},   # nearby -> merge
        {"category": "bed", "coordinates": [300, 300, 400, 400]},  # far -> new key
        {"category": "chair", "coordinates": [50, 50, 80, 80]},
    ]
    merged = merge_boxes(boxes, epsilon=30)
    assert merged["bed"]["coordinates"] == (10, 8, 105, 100)
    assert merged["bed"]["count"] == 2
    # far bed becomes bed_<i> with the reference's running counter (i counts
    # boxes after the first, so the 3rd box gets suffix 2)
    assert "bed_2" in merged
    assert merged["chair"]["count"] == 1


def test_are_boxes_nearby():
    assert are_boxes_nearby((0, 0, 10, 10), (5, 5, 12, 14), 5)
    assert not are_boxes_nearby((0, 0, 10, 10), (6, 0, 10, 10), 5)


def _make_image(tmp_path, name="img.png", w=400, h=300):
    from PIL import Image
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    path = str(tmp_path / name)
    Image.fromarray(arr).save(path)
    return path, arr


def test_precomputed_detector_roundtrip(tmp_path):
    path, _ = _make_image(tmp_path)
    # csv-order boxes (x1, x2, y1, y2) on (H, W)
    det = PrecomputedDetector({"img.png": [(10, 120, 20, 200)]})
    boxes = det(path)
    assert len(boxes) == 1
    # detector convention (x1, y1, x2, y2); construct_visual_features unpacks
    # (y1, x1, y2, x2) and crops [x1:x2, y1:y2] on (H, W) -> original box
    y1, x1, y2, x2 = boxes[0]["coordinates"]
    assert (x1, x2, y1, y2) == (10, 120, 20, 200)


def test_construct_visual_features(tmp_path):
    path, arr = _make_image(tmp_path)
    det = PrecomputedDetector({"img.png": [(10, 120, 20, 200),
                                           (50, 250, 5, 150)]})
    images, rois, coors = construct_visual_features(det, [path], eps=0,
                                                    num_roi=3, num_img=2)
    assert images.shape == (2, 224, 224, 3)
    assert rois.shape == (2, 3, 224, 224, 3)
    assert coors.shape == (2, 3, 4)
    # image 0 is populated, image 1 (missing) is zeros
    assert np.abs(images[0]).sum() > 0
    assert np.abs(images[1]).sum() == 0
    # two ROIs populated, third is zero padding
    assert np.abs(rois[0, 0]).sum() > 0
    assert np.abs(rois[0, 1]).sum() > 0
    assert np.abs(rois[0, 2]).sum() == 0
    np.testing.assert_allclose(coors[0, 0], [10 / 512, 120 / 512,
                                             20 / 512, 200 / 512])


def test_missing_image_zero_features(tmp_path):
    det = PrecomputedDetector({})
    images, rois, coors = construct_visual_features(
        det, [str(tmp_path / "nope.png")], eps=0, num_roi=2, num_img=1)
    assert np.abs(images).sum() == 0
    assert np.abs(rois).sum() == 0


def test_predict_functions(rng):
    import jax.numpy as jnp
    from macsa_tpu.models.aspect_classifier import (predict_image_aspects,
                                                    predict_roi_aspects)
    names = ["Location", "Food", "Room"]
    logits = jnp.asarray([[5.0, -5.0, 5.0], [-5.0, -5.0, -5.0]])
    assert predict_image_aspects(logits, names, 0.45) == [["Location", "Room"], []]
    assert predict_roi_aspects(jnp.asarray([[0.1, 3.0, 0.2]]), names) == ["Food"]


def test_import_torch_aspect_classifier(rng):
    """MyImgModel-style state dict (tiny resnet) -> params that run."""
    import jax
    import jax.numpy as jnp
    from macsa_tpu.config import ResNetConfig
    from macsa_tpu.models.aspect_classifier import (
        AspectClassifier, import_torch_aspect_classifier)

    cfg = ResNetConfig(stage_sizes=(1, 1, 1, 1), num_filters=4, dtype="float32")
    model = AspectClassifier(3, cfg)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    # build a torch-style dict from the flax params (inverse transforms)
    sd = {}

    def put_conv(prefix, kernel):
        sd[f"{prefix}.weight"] = np.asarray(kernel).transpose(3, 2, 0, 1)

    def put_bn(prefix, bn):
        sd[f"{prefix}.weight"] = np.asarray(bn["scale"])
        sd[f"{prefix}.bias"] = np.asarray(bn["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(bn["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(bn["var"])

    bb = ref["backbone"]
    put_conv("feature_extractor.conv1", bb["conv1"]["kernel"])
    put_bn("feature_extractor.bn1", bb["bn1"])
    for stage in range(4):
        blk = bb[f"layer{stage + 1}_0"]
        p = f"feature_extractor.layer{stage + 1}.0"
        for c in ("conv1", "conv2", "conv3"):
            put_conv(f"{p}.{c}", blk[c]["kernel"])
        for b in ("bn1", "bn2", "bn3"):
            put_bn(f"{p}.{b}", blk[b])
        put_conv(f"{p}.downsample.0", blk["ds_conv"]["kernel"])
        put_bn(f"{p}.downsample.1", blk["ds_bn"])
    sd["linear.weight"] = np.asarray(ref["linear"]["kernel"]).T
    sd["linear.bias"] = np.asarray(ref["linear"]["bias"])

    got = import_torch_aspect_classifier(sd, stage_sizes=cfg.stage_sizes)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3))
                    .astype(np.float32))
    out_ref = model.apply({"params": ref}, x)
    out_got = model.apply({"params": got}, x)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_got),
                               rtol=1e-5, atol=1e-5)
