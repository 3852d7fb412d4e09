"""Jitted train/eval steps for the two phases (and baselines).

TPU re-design of the reference step loops:
* Phase-2 fine-tune (reference: run_multimodal_fcmf.py:427-489): the 6-aspect
  Python loop becomes a folded B*A batch through one forward; per-aspect CE
  is computed in one shot and summed over aspects (the reference sums the six
  per-aspect means, :474-475),
* the 35 per-step ResNet forwards (:448-460) become two batched NHWC convs
  (all images / all ROI crops folded into the batch),
* Phase-1 pretrain (run_pretraining_fcmf.py:290-337): seq2seq CE with
  ignore_index=-100,
* AMP fp16 + GradScaler is replaced by bf16 activations with f32 params —
  no loss scaling needed on TPU,
* DDP gradient all-reduce is implicit: batches arrive dp-sharded, params
  replicated, and XLA inserts the psum over ICI.

Every step is a pure function of (state, batch, rng) built by a `make_*`
factory closing over the models, then `jax.jit`-ed with NamedShardings.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from macsa_tpu.models.fcmf import FCMF
from macsa_tpu.models.resnet import VisualFeatures
from macsa_tpu.models.seq2seq import FCMFSeq2Seq, seq2seq_loss
from macsa_tpu.train.state import TrainState

Array = jax.Array
Batch = Dict[str, Array]


def extract_visual(visual: VisualFeatures, visual_params, images: Array,
                   roi_images: Array, stop_grad: bool = True,
                   out_dtype=jnp.float32) -> Tuple[Array, Array]:
    """images [B,I,H,W,3], roi_images [B,I,R,H,W,3] ->
    (grid [B,I,49,2048], roi [B,I,R,2048]).

    One batched conv stack each — the reference runs 7 + 7xR separate
    ResNet-152 forwards per step (run_multimodal_fcmf.py:448-460).
    uint8 inputs are normalized on device (macsa_tpu.ops.image_prep) — the
    host ships 1 byte/pixel instead of the reference's float32.

    The backbone runs on XLA's conv pipeline (~66% MFU at batch 8); a
    whole-bottleneck Pallas alternative measured slower at every stage
    subset and is retired to tools_dev/fused_resnet_experiment.py."""
    from macsa_tpu.ops.image_prep import device_normalize
    conv_dtype = jnp.dtype(visual.config.dtype)
    images = device_normalize(images, conv_dtype)
    roi_images = device_normalize(roi_images, conv_dtype)
    grid = visual.apply(visual_params, images,
                        method=VisualFeatures.grid_features)
    roi = visual.apply(visual_params, roi_images,
                       method=VisualFeatures.pooled_features)
    grid, roi = grid.astype(out_dtype), roi.astype(out_dtype)
    if stop_grad:
        grid, roi = jax.lax.stop_gradient(grid), jax.lax.stop_gradient(roi)
    return grid, roi


def _fold_aspects(batch: Batch) -> Tuple[Dict[str, Array], int, int]:
    """[B, A, ...] text views -> [B*A, ...]; returns (folded, B, A)."""
    b, a = batch["input_ids"].shape[:2]
    fold = lambda x: x.reshape((b * a,) + x.shape[2:])
    out = {k: fold(batch[k]) for k in
           ("input_ids", "token_type_ids", "attention_mask", "added_mask")
           if k in batch}
    return out, b, a


def _tile_visual(x: Array, a: int) -> Array:
    """[B, ...] -> [B*A, ...] matching the aspect fold order (b*A + a)."""
    return jnp.repeat(x, a, axis=0)


def cross_entropy(logits: Array, labels: Array) -> Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def fcmf_forward_all_aspects(model: FCMF, params, visual: VisualFeatures,
                             visual_params, batch: Batch,
                             deterministic: bool = True,
                             dropout_rng: Optional[Array] = None,
                             fine_tune_cnn: bool = False) -> Array:
    """Full FCMF forward over all aspect views -> logits [B, A, num_labels].

    If the batch carries precomputed `grid`/`roi` features (the frozen-CNN
    epoch cache, see finetune.VisualFeatureCache), the ResNet stack is
    skipped entirely."""
    if "grid" in batch:
        dt = model.config.model.jnp_dtype
        grid = jax.lax.stop_gradient(batch["grid"].astype(dt))
        roi = jax.lax.stop_gradient(batch["roi"].astype(dt))
    else:
        grid, roi = extract_visual(visual, visual_params, batch["images"],
                                   batch["roi_images"],
                                   stop_grad=not fine_tune_cnn,
                                   out_dtype=model.config.model.jnp_dtype)
    text, b, a = _fold_aspects(batch)
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    logits = model.apply(
        {"params": params},
        text["input_ids"],
        _tile_visual(grid, a),
        _tile_visual(roi, a),
        _tile_visual(batch["roi_coors"], a),
        text.get("token_type_ids"),
        text["attention_mask"],
        text["added_mask"],
        deterministic=deterministic,
        rngs=rngs)
    return logits.reshape(b, a, -1)


def make_finetune_train_step(model: FCMF, visual: VisualFeatures,
                             mesh: Optional[Mesh] = None,
                             donate: bool = True,
                             state_sharding=None) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, metrics).

    `state_sharding`: optional NamedSharding pytree for the TrainState
    (parallel.sharding.state_shardings) enabling tensor parallelism over
    the mesh's mp axis; default replicated (dp only)."""

    def step(state: TrainState, batch: Batch, rng: Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params, visual_params):
            logits = fcmf_forward_all_aspects(
                model, params, visual, visual_params, batch,
                deterministic=False, dropout_rng=rng,
                fine_tune_cnn=state.fine_tune_cnn)
            # per-aspect mean CE summed over aspects (run_multimodal_fcmf.py:474)
            ce = cross_entropy(logits, batch["labels"])  # [B, A]
            loss = ce.mean(axis=0).sum()
            acc = (logits.argmax(-1) == batch["labels"]).mean()
            return loss, acc

        if state.fine_tune_cnn:
            (loss, acc), grads = jax.value_and_grad(
                lambda p, vp: loss_fn(p, vp), argnums=(0, 1),
                has_aux=True)(state.params, state.visual_params)
            new_state = state.apply_gradients(grads[0], grads[1])
        else:
            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.visual_params)
            new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, "accuracy": acc}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    state_s = state_sharding if state_sharding is not None else repl
    return jax.jit(step,
                   in_shardings=(state_s, data, repl),
                   out_shardings=(state_s, repl),
                   donate_argnums=(0,) if donate else ())


def scanned_forward_variant(model):
    """Same model with `text.scan_layers=True` for forward-only programs.

    The scanned text encoder compiles to a ~3x smaller executable at zero
    forward cost (measured 62.9 vs 64.0 ms/step, batch 8 v5e — the scan
    penalty is all in the backward's residual/grad stacking, see
    config.py).  Params keep the training (unrolled) layout on disk and in
    the TrainState; `stack_text_params` converts in-program."""
    import dataclasses
    cfg = dataclasses.replace(
        model.config,
        text=dataclasses.replace(model.config.text, scan_layers=True))
    if isinstance(model, FCMFSeq2Seq):
        return FCMFSeq2Seq(cfg, model.decoder_config)
    return type(model)(cfg)


def stack_text_params(params, num_layers: int):
    """Unrolled FCMF/FCMFSeq2Seq params -> text-encoder subtree stacked for
    the scanned module (jit-safe; no-op if already stacked)."""
    from macsa_tpu.models.text_encoder import stack_layer_params
    p = dict(params)
    p["encoder"] = dict(params["encoder"])
    p["encoder"]["bert"] = stack_layer_params(p["encoder"]["bert"],
                                              num_layers)
    return p


def make_finetune_eval_step(model: FCMF, visual: VisualFeatures,
                            mesh: Optional[Mesh] = None,
                            param_sharding=None,
                            visual_sharding=None,
                            scan_text: bool = True) -> Callable:
    eval_model = scanned_forward_variant(model) if scan_text else model
    num_layers = model.config.text.num_hidden_layers

    def step(params, visual_params, batch: Batch):
        if scan_text:
            params = stack_text_params(params, num_layers)
        logits = fcmf_forward_all_aspects(eval_model, params, visual,
                                          visual_params, batch,
                                          deterministic=True)
        return logits.argmax(-1), logits  # preds [B, A]

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    return jax.jit(step,
                   in_shardings=(param_sharding or repl,
                                 visual_sharding or repl, data),
                   out_shardings=(data, data))


def make_pretrain_train_step(model: FCMFSeq2Seq, visual: VisualFeatures,
                             mesh: Optional[Mesh] = None,
                             donate: bool = True,
                             state_sharding=None,
                             vocab_chunk: int = 0) -> Callable:
    """Phase-1 IAOG seq2seq step (run_pretraining_fcmf.py:290-337).

    `vocab_chunk` > 0 swaps the full-logits CE for the fused chunked-vocab
    head+loss (seq2seq.chunked_seq2seq_loss): the [B, T, 64001] f32 logit
    tensor is never materialized; loss and the token-accuracy argmax come
    out of one online-logsumexp scan over vocab chunks.  Gradient-exact
    (tests/test_seq2seq.py pins loss+grads against the full path)."""
    from macsa_tpu.models.seq2seq import chunked_seq2seq_loss

    def step(state: TrainState, batch: Batch, rng: Array):
        rng = jax.random.fold_in(rng, state.step)

        def visual_feats():
            if "grid" in batch:  # frozen-CNN feature cache (feature_cache.py)
                dt = model.config.model.jnp_dtype
                return (jax.lax.stop_gradient(batch["grid"].astype(dt)),
                        jax.lax.stop_gradient(batch["roi"].astype(dt)))
            return extract_visual(
                visual, state.visual_params, batch["images"],
                batch["roi_images"], stop_grad=True,
                out_dtype=model.config.model.jnp_dtype)

        def loss_fn(params):
            grid, roi = visual_feats()
            apply_args = (
                {"params": params},
                batch["enc_input_ids"], batch["dec_input_ids"], grid, roi,
                batch["roi_coors"], batch.get("token_type_ids"),
                batch["attention_mask"], batch["added_mask"])
            if vocab_chunk > 0:
                hidden = model.apply(*apply_args, deterministic=False,
                                     rngs={"dropout": rng}, return_hidden=True)
                loss, pred = chunked_seq2seq_loss(
                    hidden, params["shared_embedding"],
                    params["decoder"]["out_bias"], batch["labels"],
                    chunk_size=vocab_chunk)
                return loss, pred
            logits = model.apply(*apply_args, deterministic=False,
                                 rngs={"dropout": rng})
            loss = seq2seq_loss(logits, batch["labels"])
            return loss, logits.argmax(-1)

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads)
        valid = batch["labels"] != -100
        acc = jnp.where(valid, pred == batch["labels"], 0).sum() \
            / jnp.maximum(valid.sum(), 1)
        return new_state, {"loss": loss, "token_accuracy": acc}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    state_s = state_sharding if state_sharding is not None else repl
    return jax.jit(step, in_shardings=(state_s, data, repl),
                   out_shardings=(state_s, repl),
                   donate_argnums=(0,) if donate else ())
