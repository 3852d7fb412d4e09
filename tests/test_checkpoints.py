"""Checkpoint tests: orbax save/restore round-trip with optimizer state and
epoch/best bookkeeping, Phase-1 -> Phase-2 encoder transfer semantics, and
embedding resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macsa_tpu.train.checkpoints import (
    CheckpointManager,
    resize_embedding,
    transfer_encoder_params,
)
from macsa_tpu.train.optim import make_adamw
from macsa_tpu.train.state import TrainState


def _tiny_state(seed=0):
    rng = np.random.default_rng(seed)
    params = {"encoder": {"dense": {"kernel": jnp.asarray(
        rng.normal(size=(4, 4)).astype(np.float32))}},
        "classifier": {"kernel": jnp.asarray(
            rng.normal(size=(4, 2)).astype(np.float32))}}
    visual = {"conv": {"kernel": jnp.asarray(
        rng.normal(size=(3, 3)).astype(np.float32))}}
    tx = make_adamw(1e-3)
    return TrainState.create(params, visual, tx)


def test_save_restore_roundtrip(tmp_path):
    state = _tiny_state()
    # advance the state so opt_state is non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)

    mgr = CheckpointManager(str(tmp_path))
    mgr.save("best", state, epoch=3, best_score=0.71)
    assert mgr.exists("best")
    assert not mgr.exists("last")

    fresh = _tiny_state(seed=99)
    restored, epoch, best = mgr.restore("best", fresh)
    assert epoch == 3
    assert best == pytest.approx(0.71, abs=1e-6)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_copy_duplicates_checkpoint(tmp_path):
    """copy() clones a saved checkpoint on disk (the best->last fast path for
    improving epochs) and the clone restores identically."""
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("best", state, epoch=2, best_score=0.5)
    mgr.copy("best", "last")
    assert mgr.exists("last")
    restored, epoch, best = mgr.restore("last", _tiny_state(seed=7))
    assert epoch == 2 and best == pytest.approx(0.5, abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # copy over an existing dst replaces it atomically
    mgr.copy("best", "last")
    assert mgr.exists("last")


def test_restore_subtrees_skips_opt_state(tmp_path):
    """Partial restore pulls only the requested top-level subtrees (the
    params-only readers: inference CLI, IAOG transfer, --do_test reload)."""
    from macsa_tpu.train.checkpoints import restore_subtrees

    state = _tiny_state()
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("best", state, epoch=1, best_score=0.3)
    mgr.finalize()

    got = restore_subtrees(str(tmp_path / "best"), ("params",))
    assert set(got.keys()) == {"params"}
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(got["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # payloads without the requested keys (bare param trees) restore whole
    mgr.save_params("raw", {"dense": {"kernel": np.ones((2, 2), np.float32)}})
    raw = restore_subtrees(str(tmp_path / "raw"), ("params",))
    np.testing.assert_array_equal(raw["dense"]["kernel"], np.ones((2, 2)))


def test_restore_params_only(tmp_path):
    """Eval reload restores params + visual_params into a fresh state while
    leaving its optimizer state untouched."""
    state = _tiny_state()
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("best", state, epoch=1, best_score=0.3)

    fresh = _tiny_state(seed=5)
    restored = mgr.restore_params_only("best", fresh)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.visual_params),
                    jax.tree_util.tree_leaves(restored.visual_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state stays the fresh one (not the checkpoint's)
    for a, b in zip(jax.tree_util.tree_leaves(fresh.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transfer_encoder_params():
    """encoder subtree copied, head params untouched, shared embedding
    materialized into bert word embeddings (run_multimodal_fcmf.py:382-412)."""
    rng = np.random.default_rng(0)
    seq2seq = {
        "shared_embedding": rng.normal(size=(10, 4)).astype(np.float32),
        "encoder": {
            "bert": {"embeddings": {"LayerNorm": {"scale": np.ones(4)}}},
            "vismap2text": {"kernel": rng.normal(size=(8, 4)).astype(np.float32)},
        },
        "decoder": {"block_0": {"w_kx": np.zeros((2, 4, 2))}},
    }
    fcmf = {
        "encoder": {
            "bert": {"embeddings": {
                "word_embeddings": {"embedding": np.zeros((10, 4), np.float32)},
                "LayerNorm": {"scale": np.zeros(4)}}},
            "vismap2text": {"kernel": np.zeros((8, 4), np.float32)},
        },
        "text_pooler": {"dense": {"kernel": np.full((4, 4), 7.0)}},
        "classifier": {"kernel": np.full((4, 4), 9.0)},
    }
    out = transfer_encoder_params(seq2seq, fcmf)
    np.testing.assert_array_equal(out["encoder"]["vismap2text"]["kernel"],
                                  seq2seq["encoder"]["vismap2text"]["kernel"])
    np.testing.assert_array_equal(
        out["encoder"]["bert"]["embeddings"]["word_embeddings"]["embedding"],
        seq2seq["shared_embedding"])
    # strict=False: head params keep their fresh values
    np.testing.assert_array_equal(out["classifier"]["kernel"],
                                  fcmf["classifier"]["kernel"])
    # decoder is dropped entirely (Phase-2 has none)
    assert "decoder" not in out


def test_resize_embedding():
    table = np.arange(12, dtype=np.float32).reshape(6, 2)
    smaller = resize_embedding(table, 4)
    np.testing.assert_array_equal(smaller, table[:4])
    bigger = resize_embedding(table, 9)
    assert bigger.shape == (9, 2)
    np.testing.assert_array_equal(bigger[:6], table)


def test_resolve_iaog_checkpoint(tmp_path):
    """--pretrained_iaog_path accepts both a Phase-1 output dir and a direct
    orbax checkpoint dir (regression: passing out_pre/last used to silently
    skip the encoder transfer)."""
    from macsa_tpu.train.checkpoints import resolve_iaog_checkpoint

    out = tmp_path / "out_pre"
    last = out / "last"
    last.mkdir(parents=True)
    (last / "_CHECKPOINT_METADATA").write_text("{}")

    # output-dir spelling -> resolves to the contained checkpoint
    assert resolve_iaog_checkpoint(str(out)) == str(last)
    # direct-checkpoint spelling -> resolves to itself
    assert resolve_iaog_checkpoint(str(last)) == str(last)
    # best is preferred over last when both exist
    best = out / "best"
    best.mkdir()
    (best / "_CHECKPOINT_METADATA").write_text("{}")
    assert resolve_iaog_checkpoint(str(out)) == str(best)
    # nothing there -> None
    assert resolve_iaog_checkpoint(str(tmp_path / "missing")) is None
