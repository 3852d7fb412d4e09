"""End-to-end tiny train-step tests: fine-tune and pretrain steps run, loss
decreases on an overfit batch, and the multi-device (dp=8) sharded step
produces the same result as single-device — the TPU analogue of a fake
distributed backend test (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macsa_tpu.config import (
    DecoderConfig,
    FCMFConfig,
    ModelConfig,
    ResNetConfig,
    TextEncoderConfig,
)
from macsa_tpu.models.fcmf import FCMF
from macsa_tpu.models.resnet import VisualFeatures
from macsa_tpu.models.seq2seq import FCMFSeq2Seq
from macsa_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from macsa_tpu.train.optim import make_adamw, linear_warmup_schedule
from macsa_tpu.train.state import TrainState
from macsa_tpu.train.steps import (
    extract_visual,
    make_finetune_eval_step,
    make_finetune_train_step,
    make_pretrain_train_step,
)

VOCAB = 128
MODEL = ModelConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                    intermediate_size=32)
TEXT = TextEncoderConfig(vocab_size=VOCAB, hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=4, intermediate_size=32,
                         max_position_embeddings=64)
RESNET = ResNetConfig(stage_sizes=(1, 1, 1, 1), num_filters=4, grid_size=2,
                      dtype="float32")
FCMF_CFG = FCMFConfig(model=MODEL, text=TEXT, num_imgs=2, num_roi=2,
                      num_patches=4, visual_feat_dim=128, max_text_len=12,
                      box_heads=4)
DEC = DecoderConfig(vocab_size=VOCAB, hidden_size=32, num_blocks=1, num_heads=4,
                    ffn_hidden=32, max_decode_len=6)

B, A, L, IMG = 8, 3, 12, 64  # batch (divisible by the dp=8 mesh), aspects, text len, image size (64/32 -> 2x2 grid)


def finetune_batch(rng):
    cfg = FCMF_CFG
    return {
        "images": jnp.asarray(rng.normal(
            size=(B, cfg.num_imgs, IMG, IMG, 3)).astype(np.float32)),
        "roi_images": jnp.asarray(rng.normal(
            size=(B, cfg.num_imgs, cfg.num_roi, IMG, IMG, 3)).astype(np.float32)),
        "roi_coors": jnp.asarray(rng.uniform(
            0, 1, size=(B, cfg.num_imgs, cfg.num_roi, 4)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(2, VOCAB, size=(B, A, L))
                                 .astype(np.int32)),
        "token_type_ids": jnp.zeros((B, A, L), jnp.int32),
        "attention_mask": jnp.ones((B, A, L), jnp.int32),
        "added_mask": jnp.ones((B, A, L + cfg.num_patches), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 4, size=(B, A)).astype(np.int32)),
    }


@pytest.fixture(scope="module")
def models():
    model = FCMF(FCMF_CFG)
    visual = VisualFeatures(RESNET)
    rng = np.random.default_rng(0)
    batch = finetune_batch(rng)
    key = jax.random.PRNGKey(0)
    visual_params = visual.init(key, batch["images"])
    grid, roi = extract_visual(visual, visual_params, batch["images"],
                               batch["roi_images"])
    params = model.init(key, batch["input_ids"][:, 0], grid, roi,
                        batch["roi_coors"], None,
                        batch["attention_mask"][:, 0],
                        batch["added_mask"][:, 0])["params"]
    return model, visual, params, visual_params


def _make_state(models_tuple):
    model, visual, params, visual_params = models_tuple
    tx = make_adamw(linear_warmup_schedule(1e-3, 2, 100),
                    head_learning_rate=linear_warmup_schedule(1e-2, 2, 100))
    return TrainState.create(params, visual_params, tx)


def test_finetune_step_runs_and_learns(models, rng):
    model, visual, params, visual_params = models
    state = _make_state(models)
    batch = finetune_batch(rng)
    step = make_finetune_train_step(model, visual, donate=False)
    key = jax.random.PRNGKey(0)
    state, m0 = step(state, batch, key)
    losses = [float(m0["loss"])]
    for _ in range(8):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses  # overfits a fixed batch


def test_finetune_eval_step(models, rng):
    model, visual, params, visual_params = models
    batch = finetune_batch(rng)
    eval_step = make_finetune_eval_step(model, visual)
    preds, logits = eval_step(params, visual_params, batch)
    assert preds.shape == (B, A)
    assert logits.shape == (B, A, FCMF_CFG.num_labels)


def test_finetune_step_sharded_matches_single(models, rng):
    """dp=8 sharded step == single-device step (gradient all-reduce over the
    mesh must be mathematically transparent)."""
    model, visual, params, visual_params = models
    batch = finetune_batch(rng)
    key = jax.random.PRNGKey(1)

    state1 = _make_state(models)
    step1 = make_finetune_train_step(model, visual, donate=False)
    state1, m1 = step1(state1, batch, key)

    mesh = make_mesh(dp=8, devices=jax.devices("cpu"))
    state2 = _make_state(models)
    step8 = make_finetune_train_step(model, visual, mesh=mesh, donate=False)
    state2 = replicate(state2, mesh)
    sbatch = shard_batch(batch, mesh)
    state2, m8 = step8(state2, sbatch, jax.device_put(
        key, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_pretrain_step_runs(rng):
    cfg = FCMF_CFG
    model = FCMFSeq2Seq(cfg, DEC)
    visual = VisualFeatures(RESNET)
    t = DEC.max_decode_len
    batch = {
        "images": jnp.asarray(rng.normal(
            size=(B, cfg.num_imgs, IMG, IMG, 3)).astype(np.float32)),
        "roi_images": jnp.asarray(rng.normal(
            size=(B, cfg.num_imgs, cfg.num_roi, IMG, IMG, 3)).astype(np.float32)),
        "roi_coors": jnp.asarray(rng.uniform(
            0, 1, size=(B, cfg.num_imgs, cfg.num_roi, 4)).astype(np.float32)),
        "enc_input_ids": jnp.asarray(rng.integers(2, VOCAB, size=(B, L))
                                     .astype(np.int32)),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "added_mask": jnp.ones((B, L + cfg.num_patches), jnp.int32),
        "dec_input_ids": jnp.asarray(rng.integers(2, VOCAB, size=(B, t))
                                     .astype(np.int32)),
        "labels": jnp.asarray(
            np.where(rng.uniform(size=(B, t)) < 0.2, -100,
                     rng.integers(2, VOCAB, size=(B, t))).astype(np.int32)),
    }
    key = jax.random.PRNGKey(0)
    visual_params = visual.init(key, batch["images"])
    grid, roi = extract_visual(visual, visual_params, batch["images"],
                               batch["roi_images"])
    params = model.init(key, batch["enc_input_ids"], batch["dec_input_ids"],
                        grid, roi, batch["roi_coors"], None,
                        batch["attention_mask"], batch["added_mask"])["params"]
    tx = make_adamw(1e-3)
    state = TrainState.create(params, visual_params, tx)
    step = make_pretrain_train_step(model, visual, donate=False)
    state, m0 = step(state, batch, key)
    state, m1 = step(state, batch, key)
    assert np.isfinite(float(m0["loss"])) and np.isfinite(float(m1["loss"]))
    assert float(m1["loss"]) < float(m0["loss"])


def test_make_mesh_honors_default_device_pin():
    """Regression for the r4 golden-drift root cause: make_mesh must build
    over the PINNED default device's platform.  It used `jax.devices()`,
    which ignores the conftest's CPU pin and returns the highest-priority
    registered backend — the real TPU in this deployment — so under bare
    pytest the e2e driver tests silently ran dp=1 on the remote chip.
    Under the conftest (default device pinned to CPU, 8 forced devices)
    a no-args make_mesh must be the 8-device CPU mesh."""
    mesh = make_mesh()
    assert all(d.platform == "cpu" for d in mesh.devices.flat), \
        [d.platform for d in mesh.devices.flat]
    assert mesh.devices.size == 8
