"""Tensor parallelism (mp axis) tests on the virtual 8-device CPU mesh.

The reference has no TP (SURVEY.md §2.4); this validates the optional
Megatron-style param sharding: a dp4 x mp2 mesh must produce the same
training losses as the replicated dp8 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from macsa_tpu.config import small_test_configs
from macsa_tpu.models.fcmf import FCMF
from macsa_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from macsa_tpu.parallel.sharding import leaf_spec, shard_state, state_shardings
from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
from macsa_tpu.train.state import TrainState

MODEL, TEXT, CFG, DEC = small_test_configs()


def _make(rng, b=8, cfg=CFG):
    l = cfg.max_text_len
    return {
        "input_ids": rng.integers(2, TEXT.vocab_size, size=(b, 6, l)).astype(np.int32),
        "token_type_ids": np.zeros((b, 6, l), np.int32),
        "attention_mask": np.ones((b, 6, l), np.int32),
        "added_mask": np.ones((b, 6, l + cfg.num_patches), np.int32),
        "labels": rng.integers(0, 4, size=(b, 6)).astype(np.int32),
        "grid": rng.normal(size=(b, cfg.num_imgs, cfg.num_patches,
                                 cfg.visual_feat_dim)).astype(np.float32),
        "roi": rng.normal(size=(b, cfg.num_imgs, cfg.num_roi,
                                cfg.visual_feat_dim)).astype(np.float32),
        "roi_coors": rng.uniform(0, 1, size=(b, cfg.num_imgs, cfg.num_roi,
                                             4)).astype(np.float32),
    }


def test_leaf_spec_rules():
    import jax.tree_util as jtu
    k = lambda *names: tuple(jtu.DictKey(n) for n in names)
    w2 = np.zeros((4, 4)); w1 = np.zeros((4,))
    assert leaf_spec(k("a", "attention", "self", "query", "kernel"), w2) == P(None, "mp")
    assert leaf_spec(k("a", "attention", "self", "query", "bias"), w1) == P("mp")
    assert leaf_spec(k("a", "attention", "output", "dense", "kernel"), w2) == P("mp", None)
    assert leaf_spec(k("a", "mlp", "intermediate_dense", "kernel"), w2) == P(None, "mp")
    assert leaf_spec(k("a", "mlp", "output_dense", "kernel"), w2) == P("mp", None)
    assert leaf_spec(k("bert", "embeddings", "word_embeddings", "embedding"),
                     w2) == P("mp", None)
    assert leaf_spec(k("a", "mlp", "output_LayerNorm", "scale"), w1) == P()
    assert leaf_spec(k("classifier", "kernel"), w2) == P()


def _run(mesh, batch, tp=False, steps=3, cfg=CFG):
    model = FCMF(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["input_ids"][:1, 0]),
                        jnp.asarray(batch["grid"][:1]),
                        jnp.asarray(batch["roi"][:1]),
                        jnp.asarray(batch["roi_coors"][:1]), None,
                        jnp.asarray(batch["attention_mask"][:1, 0]),
                        jnp.asarray(batch["added_mask"][:1, 0]))["params"]
    tx = make_adamw(linear_warmup_schedule(1e-3, 2, 100))
    state = TrainState.create(params, {}, tx)
    # the sharding pytree must share the state's static metadata (tx), so
    # it is built from this very instance
    state_sharding = state_shardings(state, mesh) if tp else None
    if state_sharding is None:
        state = replicate(state, mesh)
    else:
        state = shard_state(state, mesh)

    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))

    def step(state, b):
        def loss_fn(p):
            bb, a = b["input_ids"].shape[:2]
            fold = lambda x: x.reshape((bb * a,) + x.shape[2:])
            tile = lambda x: jnp.repeat(x, a, axis=0)
            logits = model.apply({"params": p}, fold(b["input_ids"]),
                                 tile(b["grid"]), tile(b["roi"]),
                                 tile(b["roi_coors"]), fold(b["token_type_ids"]),
                                 fold(b["attention_mask"]), fold(b["added_mask"]),
                                 deterministic=True).reshape(bb, a, -1)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            ce = -jnp.take_along_axis(logp, b["labels"][..., None], -1)[..., 0]
            return ce.mean(axis=0).sum()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    state_s = state_sharding if state_sharding is not None else repl
    jstep = jax.jit(step, in_shardings=(state_s, data),
                    out_shardings=(state_s, repl))
    sb = shard_batch(batch, mesh)
    losses = []
    for _ in range(steps):
        state, loss = jstep(state, sb)
        losses.append(float(loss))
    return losses


def test_tp_matches_replicated(rng, cpu_devices):
    if len(cpu_devices) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = _make(rng)

    mesh_dp = make_mesh(dp=8, mp=1, devices=cpu_devices[:8])
    ref = _run(mesh_dp, batch)

    mesh_tp = make_mesh(dp=4, mp=2, devices=cpu_devices[:8])
    got = _run(mesh_tp, batch, tp=True)
    assert ref[0] > ref[-1], f"loss should decrease: {ref}"
    np.testing.assert_allclose(got, ref, rtol=0, atol=5e-4)


def test_fused_attention_composes_with_tp(rng, cpu_devices):
    """The shard_map-wrapped Pallas kernel (interpret mode) must reproduce
    the XLA-path training losses on both a dp8 mesh and a dp4 x mp2 TP mesh
    — the fused-attention x multi-chip composition (VERDICT r2 item 1).

    The kernel shards batch over dp and heads over mp: with the Megatron
    column-sharded q/k/v projections, its inputs/outputs are already in the
    TP-natural layout, so no resharding is inserted around it."""
    import dataclasses

    from macsa_tpu.parallel.mesh import kernel_mesh

    if len(cpu_devices) < 8:
        pytest.skip("needs 8 virtual devices")
    # L >= 32 so the text-encoder blocks hit the kernel's engagement gate
    fused = lambda c: dataclasses.replace(c, fused_attention=True,
                                          fused_attention_interpret=True)
    cfg_plain = dataclasses.replace(CFG, max_text_len=40)
    cfg_fused = dataclasses.replace(cfg_plain, model=fused(MODEL),
                                    text=fused(TEXT))
    batch = _make(rng, cfg=cfg_plain)

    mesh_dp = make_mesh(dp=8, mp=1, devices=cpu_devices[:8])
    ref = _run(mesh_dp, batch, cfg=cfg_plain)

    with kernel_mesh(mesh_dp):
        got_dp = _run(mesh_dp, batch, cfg=cfg_fused)
    np.testing.assert_allclose(got_dp, ref, rtol=0, atol=5e-4)

    mesh_tp = make_mesh(dp=4, mp=2, devices=cpu_devices[:8])
    with kernel_mesh(mesh_tp):
        got_tp = _run(mesh_tp, batch, tp=True, cfg=cfg_fused)
    np.testing.assert_allclose(got_tp, ref, rtol=0, atol=5e-4)


def test_scanned_eval_step_on_tp_mesh(rng, cpu_devices):
    """make_finetune_eval_step (forward-only, scanned text encoder with
    in-program param stacking) must produce the replicated single-device
    logits on a dp4 x mp2 TP mesh."""
    if len(cpu_devices) < 8:
        pytest.skip("needs 8 virtual devices")
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.config import ResNetConfig
    from macsa_tpu.train.steps import make_finetune_eval_step

    batch = _make(rng)
    model = FCMF(CFG)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["input_ids"][:1, 0]),
                        jnp.asarray(batch["grid"][:1]),
                        jnp.asarray(batch["roi"][:1]),
                        jnp.asarray(batch["roi_coors"][:1]), None,
                        jnp.asarray(batch["attention_mask"][:1, 0]),
                        jnp.asarray(batch["added_mask"][:1, 0]))["params"]
    visual = VisualFeatures(ResNetConfig(stage_sizes=(1,), dtype="float32"))

    # reference: unsharded, unrolled (scan_text=False)
    ref_step = make_finetune_eval_step(model, visual, scan_text=False)
    want_preds, want_logits = ref_step(params, {}, batch)

    mesh = make_mesh(dp=4, mp=2, devices=cpu_devices[:8])
    tx = make_adamw(linear_warmup_schedule(1e-3, 2, 100))
    state = TrainState.create(params, {}, tx)
    shardings = state_shardings(state, mesh)
    state = shard_state(state, mesh)
    eval_step = make_finetune_eval_step(
        model, visual, mesh=mesh, param_sharding=shardings.params,
        visual_sharding=NamedSharding(mesh, P()))
    got_preds, got_logits = eval_step(state.params, state.visual_params,
                                      shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(got_preds),
                                  np.asarray(want_preds))
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), rtol=2e-5, atol=2e-5)
