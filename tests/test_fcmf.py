"""FCMF encoder/classifier tests: shapes, jit-compilability, mask plumbing,
and weight sharing of the fusion encoder (mm_attention is shared between the
per-image ROI branch and the final fusion, fcmf_pretraining.py:117,139)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macsa_tpu.config import small_test_configs
from macsa_tpu.models.fcmf import FCMF, FCMFEncoder

MODEL, TEXT, FCMF_CFG, DEC = small_test_configs()


def make_inputs(rng, b=2):
    cfg = FCMF_CFG
    l = cfg.max_text_len
    ids = rng.integers(2, TEXT.vocab_size, size=(b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    vis = rng.normal(size=(b, cfg.num_imgs, cfg.num_patches,
                           cfg.visual_feat_dim)).astype(np.float32)
    roi = rng.normal(size=(b, cfg.num_imgs, cfg.num_roi,
                           cfg.visual_feat_dim)).astype(np.float32)
    coors = rng.uniform(0, 1, size=(b, cfg.num_imgs, cfg.num_roi, 4)).astype(np.float32)
    added = np.ones((b, l + cfg.num_patches), np.int32)
    return (jnp.asarray(ids), jnp.asarray(vis), jnp.asarray(roi),
            jnp.asarray(coors), None, jnp.asarray(mask), jnp.asarray(added))


def test_encoder_output_shape_and_jit(rng):
    enc = FCMFEncoder(FCMF_CFG)
    inputs = make_inputs(rng)
    params = enc.init(jax.random.PRNGKey(0), *inputs)
    fused = jax.jit(lambda p, *a: enc.apply(p, *a))(params, *inputs)
    b = inputs[0].shape[0]
    assert fused.shape == (b, 1 + 2 * FCMF_CFG.num_imgs, MODEL.hidden_size)
    assert np.isfinite(np.asarray(fused)).all()


def test_mm_attention_weights_shared(rng):
    enc = FCMFEncoder(FCMF_CFG)
    inputs = make_inputs(rng)
    params = enc.init(jax.random.PRNGKey(0), *inputs)["params"]
    # exactly one mm_attention parameter subtree (used twice in the forward)
    assert "mm_attention" in params
    assert "text2img_attention" in params
    # the shared-module forward must be sensitive to mm_attention weights
    fused1 = enc.apply({"params": params}, *inputs)
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    import flax
    params2 = flax.core.unfreeze(params2)
    leaf = params2["mm_attention"]["layer_0"]["attention"]["self"]["query"]["kernel"]
    params2["mm_attention"]["layer_0"]["attention"]["self"]["query"]["kernel"] = leaf + 0.5
    fused2 = enc.apply({"params": params2}, *inputs)
    assert not np.allclose(np.asarray(fused1), np.asarray(fused2))


def test_classifier_logits(rng):
    model = FCMF(FCMF_CFG)
    inputs = make_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), *inputs)
    logits = jax.jit(lambda p, *a: model.apply(p, *a))(params, *inputs)
    assert logits.shape == (2, FCMF_CFG.num_labels)
    assert logits.dtype == jnp.float32


def test_roi_coordinates_affect_output(rng):
    """The geometric box attention must make the output depend on ROI boxes."""
    enc = FCMFEncoder(FCMF_CFG)
    inputs = list(make_inputs(rng))
    params = enc.init(jax.random.PRNGKey(0), *inputs)
    out1 = enc.apply(params, *inputs)
    inputs[3] = inputs[3] * 0.1
    out2 = enc.apply(params, *inputs)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_dropout_rng_training_mode(rng):
    model = FCMF(FCMF_CFG)
    inputs = make_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), *inputs)
    l1 = model.apply(params, *inputs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    l2 = model.apply(params, *inputs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_encoder_with_mde_enabled(rng):
    """use_mde + alpha<1 routes the patch branch through the denoiser
    (the reference's alternative encoder, fcmf_pretraining.py:267-287)."""
    import dataclasses
    cfg = dataclasses.replace(FCMF_CFG, use_mde=True, alpha=0.6)
    enc = FCMFEncoder(cfg)
    inputs = make_inputs(rng)
    params = enc.init(jax.random.PRNGKey(0), *inputs)
    assert "mde" in params["params"]
    fused = jax.jit(lambda p, *a: enc.apply(p, *a))(params, *inputs)
    b = inputs[0].shape[0]
    assert fused.shape == (b, 1 + 2 * cfg.num_imgs, MODEL.hidden_size)
    assert np.isfinite(np.asarray(fused)).all()

    # denoising must actually change the image branch vs the plain encoder
    plain = FCMFEncoder(FCMF_CFG)
    plain_params = plain.init(jax.random.PRNGKey(0), *inputs)
    ref = plain.apply(plain_params, *inputs)
    assert not np.allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)
