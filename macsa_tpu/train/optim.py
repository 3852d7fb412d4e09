"""Optimizers and LR schedules (optax).

Replicates the reference recipe:
* AdamW with no-decay groups for bias/LayerNorm params
  (reference: run_multimodal_fcmf.py:249-289, run_pretraining_fcmf.py:203-212),
* dual learning rates — encoder vs classifier head (`classifier`,
  `text_pooler` submodules get `classifier_head_learning_rate`,
  run_multimodal_fcmf.py:252-286),
* HF-style linear warmup schedule (run_multimodal_fcmf.py:310-314),
* global-norm clipping at 1.0 (run_multimodal_fcmf.py:484-485),
* gradient accumulation as optax.MultiSteps
  (run_multimodal_fcmf.py:477-488) — on TPU, prefer a larger batch instead,
* `bert_adam` — the reference's BertAdam (fcmf_framework/optimization.py):
  Adam *without* bias correction, inline warmup, decoupled weight decay;
  kept for capability parity (the live reference drivers use AdamW).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def linear_warmup_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """HF get_linear_schedule_with_warmup semantics."""
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps))
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def _is_no_decay(path: tuple) -> bool:
    """bias and LayerNorm params are excluded from weight decay
    (run_multimodal_fcmf.py:249, no_decay=['bias','LayerNorm.*'])."""
    keys = [getattr(p, "key", str(p)) for p in path]
    last = keys[-1]
    if last in ("bias", "out_bias"):
        return True
    # our LayerNorm modules: LayerNorm / *_LayerNorm / ln — params scale+bias
    if last == "scale":
        return True
    return False


def _decay_mask(params) -> Any:
    flat = jax.tree_util.tree_map_with_path(lambda p, _: not _is_no_decay(p), params)
    return flat


def make_adamw(
    learning_rate: optax.ScalarOrSchedule,
    weight_decay: float = 0.01,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    head_learning_rate: Optional[optax.ScalarOrSchedule] = None,
    head_path_keywords: Sequence[str] = ("classifier", "text_pooler"),
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW matching the reference's optimizer surface."""

    def base(lr):
        return optax.adamw(lr, eps=eps, weight_decay=weight_decay,
                           mask=_decay_mask)

    if head_learning_rate is None:
        tx = base(learning_rate)
    else:
        def label(params):
            def lbl(path, _):
                keys = [str(getattr(p, "key", p)) for p in path]
                return "head" if any(any(kw in k for kw in head_path_keywords)
                                     for k in keys) else "encoder"
            return jax.tree_util.tree_map_with_path(lbl, params)

        tx = optax.multi_transform(
            {"encoder": base(learning_rate), "head": base(head_learning_rate)},
            label)

    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(tx)
    out = optax.chain(*chain)
    if accumulate_steps > 1:
        out = optax.MultiSteps(out, every_k_schedule=accumulate_steps)
    return out


# ---------------------------------------------------------------------------
# BertAdam (reference fcmf_framework/optimization.py) — capability parity
# ---------------------------------------------------------------------------

def warmup_cosine(x, warmup=0.002):
    if x < warmup:
        return x / warmup
    return 0.5 * (1.0 + jnp.cos(jnp.pi * x))


def warmup_constant(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_linear(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, 1.0 - x)


SCHEDULES = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


class BertAdamState(NamedTuple):
    count: jnp.ndarray
    next_m: Any
    next_v: Any


def bert_adam(
    lr: float,
    warmup: float = -1,
    t_total: int = -1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    e: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    """BERT-style Adam without bias correction, decoupled weight decay, and
    inline warmup — the math of the reference's BertAdam.step
    (fcmf_framework/optimization.py), as an optax transformation.

    Note: the reference clips per-parameter-group; here clipping is global
    (the live drivers also clip globally, run_multimodal_fcmf.py:484-485).
    """
    sched_fn = SCHEDULES[schedule]

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return BertAdamState(jnp.zeros([], jnp.int32), zeros,
                             jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, opt_state, params):
        count = opt_state.count
        next_m = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, opt_state.next_m, grads)
        next_v = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, opt_state.next_v, grads)
        if t_total != -1:
            progress = count.astype(jnp.float32) / t_total
            lr_t = lr * sched_fn(progress, warmup)
        else:
            lr_t = lr

        def upd(m, v, p):
            u = m / (jnp.sqrt(v) + e)
            if weight_decay > 0.0:
                u = u + weight_decay * p
            return -lr_t * u

        updates = jax.tree_util.tree_map(upd, next_m, next_v, params)
        return updates, BertAdamState(count + 1, next_m, next_v)

    tx = optax.GradientTransformation(init, update)
    if max_grad_norm is not None and max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
