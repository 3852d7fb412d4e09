"""Jitted train/eval steps for the baseline models.

Each reference baseline trainer duplicates the FCMF loop structure
(reference: mROBERTa/train_mroberta_vimacsa_full.py:290-560,
tomROBERTa/train_tomroberta_vimacsa_full.py, EF-CapTrRoBERTa/
train_ef_captr_roberta.py); here one factory per model shares the same
folded-aspect CE machinery as the FCMF step (macsa_tpu.train.steps)."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from macsa_tpu.models.baselines import EFCapTrRoBERTa, MRoBERTa, TomBERT
from macsa_tpu.models.resnet import VisualFeatures
from macsa_tpu.train.state import TrainState
from macsa_tpu.train.steps import (_fold_aspects, _tile_visual, cross_entropy,
                                   extract_visual)

Array = jax.Array
Batch = Dict[str, Array]


def _visual_pair(visual, visual_params, batch, dtype):
    grid, roi = extract_visual(visual, visual_params, batch["images"],
                               batch["roi_images"], stop_grad=True,
                               out_dtype=dtype)
    return grid, roi


def baseline_forward(model, params, visual: Optional[VisualFeatures],
                     visual_params, batch: Batch, deterministic: bool = True,
                     dropout_rng=None) -> Array:
    """-> logits [B, A, num_labels] for any of the three baselines."""
    b, a = batch["input_ids"].shape[:2]
    fold = lambda x: x.reshape((b * a,) + x.shape[2:])
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None

    if isinstance(model, EFCapTrRoBERTa):
        logits = model.apply({"params": params}, fold(batch["input_ids"]),
                             fold(batch["attention_mask"]),
                             deterministic=deterministic, rngs=rngs)
        return logits.reshape(b, a, -1)

    dtype = model.text_config.jnp_dtype
    grid, roi = _visual_pair(visual, visual_params, batch, dtype)
    if isinstance(model, MRoBERTa):
        logits = model.apply({"params": params}, fold(batch["input_ids"]),
                             fold(batch["attention_mask"]),
                             _tile_visual(grid, a), _tile_visual(roi, a),
                             deterministic=deterministic, rngs=rngs)
    elif isinstance(model, TomBERT):
        logits = model.apply({"params": params},
                             fold(batch["target_ids"]), fold(batch["target_mask"]),
                             fold(batch["input_ids"]), fold(batch["attention_mask"]),
                             _tile_visual(grid, a), _tile_visual(roi, a),
                             deterministic=deterministic, rngs=rngs)
    else:
        raise TypeError(type(model))
    return logits.reshape(b, a, -1)


def make_baseline_train_step(model, visual: Optional[VisualFeatures],
                             mesh: Optional[Mesh] = None,
                             donate: bool = True) -> Callable:
    def step(state: TrainState, batch: Batch, rng: Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits = baseline_forward(model, params, visual,
                                      state.visual_params, batch,
                                      deterministic=False, dropout_rng=rng)
            ce = cross_entropy(logits, batch["labels"])
            loss = ce.mean(axis=0).sum()
            acc = (logits.argmax(-1) == batch["labels"]).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss, "accuracy": acc}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    return jax.jit(step, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def make_baseline_eval_step(model, visual: Optional[VisualFeatures],
                            mesh: Optional[Mesh] = None) -> Callable:
    def step(params, visual_params, batch: Batch):
        logits = baseline_forward(model, params, visual, visual_params, batch,
                                  deterministic=True)
        return logits.argmax(-1), logits

    if mesh is None:
        return jax.jit(step)
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    return jax.jit(step, in_shardings=(repl, repl, data),
                   out_shardings=(data, data))
