"""Optimizer / schedule tests.

Covers the reference recipe surface (reference: run_multimodal_fcmf.py:247-314,
fcmf_framework/optimization.py): linear warmup schedule values, dual-LR
routing (encoder vs classifier head), no-decay masking of bias/LayerNorm,
gradient accumulation (optax.MultiSteps), and the BertAdam reimplementation
(no bias correction, decoupled weight decay, inline warmup schedules).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from macsa_tpu.train.optim import (SCHEDULES, bert_adam,
                                   linear_warmup_schedule, make_adamw)


def test_linear_warmup_schedule_values():
    s = linear_warmup_schedule(1.0, warmup_steps=10, total_steps=110)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 0.5)
    np.testing.assert_allclose(float(s(10)), 1.0)
    # linear decay to 0 at total_steps
    np.testing.assert_allclose(float(s(60)), 0.5)
    np.testing.assert_allclose(float(s(110)), 0.0)


def _params():
    return {
        "encoder": {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
                    "LayerNorm": {"scale": jnp.ones((3,)), "bias": jnp.ones((3,))}},
        "classifier": {"kernel": jnp.ones((3, 4)), "bias": jnp.ones((4,))},
    }


def test_dual_lr_routing():
    """classifier params move with head LR, encoder params with base LR
    (run_multimodal_fcmf.py:252-286)."""
    params = _params()
    tx = make_adamw(1e-3, weight_decay=0.0, max_grad_norm=None,
                    head_learning_rate=1e-1)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    enc = float(np.abs(updates["encoder"]["dense"]["kernel"]).mean())
    head = float(np.abs(updates["classifier"]["kernel"]).mean())
    np.testing.assert_allclose(head / enc, 100.0, rtol=1e-3)


def test_no_decay_mask():
    """bias and LayerNorm/scale get no weight decay: with zero grads the
    decayed params still move, non-decayed do not."""
    params = _params()
    tx = make_adamw(1e-2, weight_decay=0.5, max_grad_norm=None)
    state = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, state, params)
    assert float(np.abs(updates["encoder"]["dense"]["kernel"]).sum()) > 0
    assert float(np.abs(updates["encoder"]["dense"]["bias"]).sum()) == 0
    assert float(np.abs(updates["encoder"]["LayerNorm"]["scale"]).sum()) == 0


def test_gradient_accumulation_matches_mean_grad():
    """k accumulation micro-steps == one step on the mean gradient
    (run_multimodal_fcmf.py:477-488)."""
    params = {"w": jnp.ones((4,))}
    g1 = {"w": jnp.asarray([1.0, 2.0, 3.0, 4.0])}
    g2 = {"w": jnp.asarray([3.0, 2.0, 1.0, 0.0])}
    mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)

    tx_acc = make_adamw(1e-2, weight_decay=0.0, max_grad_norm=None,
                        accumulate_steps=2)
    s = tx_acc.init(params)
    u1, s = tx_acc.update(g1, s, params)
    # first micro-step: no update applied yet
    assert float(np.abs(u1["w"]).sum()) == 0
    u2, s = tx_acc.update(g2, s, params)

    tx_ref = make_adamw(1e-2, weight_decay=0.0, max_grad_norm=None)
    sr = tx_ref.init(params)
    ur, _ = tx_ref.update(mean, sr, params)
    np.testing.assert_allclose(np.asarray(u2["w"]), np.asarray(ur["w"]),
                               rtol=1e-6)


def test_bert_adam_no_bias_correction():
    """First-step update magnitude reflects raw (1-b1)g / (sqrt((1-b2)g^2)+e)
    — i.e. NO Adam bias correction (fcmf_framework/optimization.py)."""
    params = {"w": jnp.asarray([1.0])}
    g = {"w": jnp.asarray([1.0])}
    tx = bert_adam(lr=1.0, weight_decay=0.0, max_grad_norm=None)
    s = tx.init(params)
    u, s = tx.update(g, s, params)
    expected = -(0.1 * 1.0) / (np.sqrt(0.001 * 1.0) + 1e-6)
    np.testing.assert_allclose(np.asarray(u["w"])[0], expected, rtol=1e-5)


def test_bert_adam_decayed_and_scheduled():
    params = {"w": jnp.asarray([2.0])}
    g = {"w": jnp.asarray([0.5])}
    tx = bert_adam(lr=1e-2, warmup=0.1, t_total=100, schedule="warmup_linear",
                   weight_decay=0.01)
    s = tx.init(params)
    # step 0: progress 0 -> lr 0 (warmup from zero), update must be 0
    u, s = tx.update(g, s, params)
    np.testing.assert_allclose(np.asarray(u["w"])[0], 0.0, atol=1e-12)
    u, s = tx.update(g, s, params)
    assert float(np.abs(np.asarray(u["w"])).sum()) > 0


def test_bert_adam_schedules():
    for name, fn in SCHEDULES.items():
        v0 = float(fn(jnp.asarray(0.0), 0.1))
        vw = float(fn(jnp.asarray(0.05), 0.1))
        np.testing.assert_allclose(v0, 0.0, atol=1e-12)
        np.testing.assert_allclose(vw, 0.5, rtol=1e-6)
    np.testing.assert_allclose(
        float(SCHEDULES["warmup_constant"](jnp.asarray(0.5), 0.1)), 1.0)
    np.testing.assert_allclose(
        float(SCHEDULES["warmup_linear"](jnp.asarray(0.75), 0.1)), 0.25)
