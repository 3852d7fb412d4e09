"""AOT serving bundle: export -> reload -> logit parity with the live model.

The bundle (macsa_tpu/inference/export.py) serializes the jitted 6-aspect
inference forward as StableHLO plus flax-serialized params; a server
deserializes and calls it without any model-building Python.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macsa_tpu.config import (ASPECTS, FCMFConfig, ModelConfig, ResNetConfig,
                              TextEncoderConfig)

VOCAB = 128
MODEL = ModelConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                    intermediate_size=32)
TEXT = TextEncoderConfig(vocab_size=VOCAB, hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=4, intermediate_size=32,
                         max_position_embeddings=64)
RESNET = ResNetConfig(stage_sizes=(1, 1, 1, 1), num_filters=4, grid_size=2,
                      dtype="float32")
CFG = FCMFConfig(model=MODEL, text=TEXT, num_imgs=2, num_roi=2,
                 num_patches=4, visual_feat_dim=128, max_text_len=12,
                 box_heads=4)
B, IMG = 2, 64  # exported batch size; 64/32 -> 2x2 grid


def _batch(rng, n):
    a, l, cfg = len(ASPECTS), CFG.max_text_len, CFG
    return {
        "images": rng.normal(
            size=(n, cfg.num_imgs, IMG, IMG, 3)).astype(np.float32),
        "roi_images": rng.normal(
            size=(n, cfg.num_imgs, cfg.num_roi, IMG, IMG, 3)).astype(np.float32),
        "roi_coors": rng.uniform(
            0, 1, size=(n, cfg.num_imgs, cfg.num_roi, 4)).astype(np.float32),
        "input_ids": rng.integers(2, VOCAB, size=(n, a, l)).astype(np.int32),
        "token_type_ids": np.zeros((n, a, l), np.int32),
        "attention_mask": np.ones((n, a, l), np.int32),
        "added_mask": np.ones((n, a, l + cfg.num_patches), np.int32),
    }


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    """Export a tiny random-params model through the real checkpoint path."""
    from macsa_tpu.inference.export import export_bundle
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.train.checkpoints import CheckpointManager

    tmp = tmp_path_factory.mktemp("export")
    model, visual = FCMF(CFG), VisualFeatures(RESNET)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    batch = _batch(rng, 1)
    visual_params = visual.init(key, jnp.asarray(batch["images"]))
    grid, roi = (
        visual.apply(visual_params, jnp.asarray(batch["images"]),
                     method=VisualFeatures.grid_features),
        visual.apply(visual_params, jnp.asarray(batch["roi_images"]),
                     method=VisualFeatures.pooled_features))
    params = model.init(key, jnp.asarray(batch["input_ids"][:, 0]), grid, roi,
                        jnp.asarray(batch["roi_coors"]), None,
                        jnp.asarray(batch["attention_mask"][:, 0]),
                        jnp.asarray(batch["added_mask"][:, 0]))["params"]

    mgr = CheckpointManager(str(tmp / "ckpt"))
    mgr.save_params("raw", jax.tree.map(np.asarray, params))

    out = export_bundle(
        checkpoint=str(tmp / "ckpt" / "raw"),
        output_dir=str(tmp / "bundle"), batch_size=B,
        platforms=("cpu",), fcmf_config=CFG, resnet_config=RESNET,
        image_size=IMG)
    return out, model, visual, params, visual_params


def test_bundle_files_and_meta(bundle):
    out, *_ = bundle
    assert os.path.exists(os.path.join(out, "model.stablehlo"))
    assert os.path.exists(os.path.join(out, "params.msgpack"))
    with open(os.path.join(out, "bundle.json")) as f:
        meta = json.load(f)
    assert meta["batch_size"] == B
    assert meta["aspects"] == list(ASPECTS)
    assert meta["config"]["text"]["fused_attention"] is False


def test_reload_matches_live_model(bundle):
    """Deserialized StableHLO call == live model.apply to float tolerance."""
    from macsa_tpu.inference.export import load_bundle
    from macsa_tpu.train.steps import fcmf_forward_all_aspects

    out, model, visual, params, visual_params = bundle
    served = load_bundle(out)
    batch = _batch(np.random.default_rng(1), B)

    got = served.predict(batch)
    want = np.asarray(fcmf_forward_all_aspects(
        model, params, visual, visual_params,
        {k: jnp.asarray(v) for k, v in batch.items()}, deterministic=True))
    assert got.shape == (B, len(ASPECTS), CFG.num_labels)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_partial_batch_padding(bundle):
    """predict() pads n < exported batch and returns exactly n rows;
    the padded row does not change real rows' logits."""
    from macsa_tpu.inference.export import load_bundle

    out, *_ = bundle
    served = load_bundle(out)
    full = _batch(np.random.default_rng(2), B)
    one = {k: v[:1] for k, v in full.items()}
    got_one = served.predict(one)
    got_full = served.predict(full)
    assert got_one.shape[0] == 1
    np.testing.assert_allclose(got_one[0], got_full[0], atol=1e-5, rtol=1e-5)

    labels = served.predict_labels(one)
    assert len(labels) == 1 and set(labels[0]) == set(ASPECTS)

    too_many = {k: np.repeat(v, 2, axis=0) for k, v in full.items()}
    with pytest.raises(ValueError):
        served.predict(too_many)


def test_bfloat16_bundle_close_to_f32(bundle, tmp_path):
    """--dtype bfloat16 export: same StableHLO serving path at bf16 compute
    (the fast TPU serving point, docs/BENCHMARKS.json bundle_bf16).  Logits
    track the f32 bundle to bf16 tolerance and the meta records the dtype."""
    from macsa_tpu.inference.export import export_bundle, load_bundle

    out, model, visual, params, visual_params = bundle
    ckpt = os.path.join(os.path.dirname(out), "ckpt", "raw")
    out16 = export_bundle(
        checkpoint=ckpt, output_dir=str(tmp_path / "bundle16"), batch_size=B,
        platforms=("cpu",), fcmf_config=CFG, resnet_config=RESNET,
        image_size=IMG, dtype="bfloat16")
    with open(os.path.join(out16, "bundle.json")) as f:
        meta = json.load(f)
    assert meta["config"]["model"]["dtype"] == "bfloat16"

    batch = _batch(np.random.default_rng(3), B)
    got16 = load_bundle(out16).predict(batch)
    got32 = load_bundle(out).predict(batch)
    # bf16 activations: coarse absolute tolerance, but predictions agree
    np.testing.assert_allclose(got16, got32, atol=0.15, rtol=0.2)
