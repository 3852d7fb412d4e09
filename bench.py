"""Benchmark: FCMF Phase-2 fine-tune throughput on real hardware.

Measures full training-step throughput — batched ResNet-152 visual extraction
(7 images + 28 ROI crops per sample) + 6 aspect-view FCMF forwards + backward
+ AdamW update — in image-text pairs/sec (samples/sec * 7 images), the
reference's headline throughput metric (BASELINE.md: 7.1 pairs/s on a Kaggle
GPU at fp16, batch 2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_S = 7.1  # ViIM-FCMF fine-tune epoch bars (BASELINE.md)


def make_batch(rng, cfg, b, a=6):
    import jax.numpy as jnp
    l = cfg.max_text_len
    return {
        # float32 pixels: uint8 elementwise compute is ~120x slower on this
        # TPU stack (see macsa_tpu.ops.image_prep docs), so the bench uses the
        # default float path; uint8 transfer stays an opt-in for
        # host-link-bound deployments.
        "images": jnp.asarray(rng.normal(size=(b, cfg.num_imgs, 224, 224, 3))
                              .astype(np.float32)),
        "roi_images": jnp.asarray(
            rng.normal(size=(b, cfg.num_imgs, cfg.num_roi, 224, 224, 3))
            .astype(np.float32)),
        "roi_coors": jnp.asarray(
            rng.uniform(0, 1, size=(b, cfg.num_imgs, cfg.num_roi, 4))
            .astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(2, cfg.text.vocab_size,
                                              size=(b, a, l)).astype(np.int32)),
        "token_type_ids": jnp.zeros((b, a, l), jnp.int32),
        "attention_mask": jnp.ones((b, a, l), jnp.int32),
        "added_mask": jnp.ones((b, a, l + cfg.num_patches), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 4, size=(b, a)).astype(np.int32)),
    }


def main():
    import jax
    import jax.numpy as jnp

    from macsa_tpu.config import FCMFConfig, ModelConfig, ResNetConfig, TextEncoderConfig
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
    from macsa_tpu.train.state import TrainState
    from macsa_tpu.train.steps import extract_visual, make_finetune_train_step

    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))

    cfg = FCMFConfig(model=ModelConfig(dtype="bfloat16"),
                     text=TextEncoderConfig(dtype="bfloat16"))
    rcfg = ResNetConfig()
    model, visual = FCMF(cfg), VisualFeatures(rcfg)

    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, batch_size)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    visual_params = visual.init(key, batch["images"][:1, :1])
    grid, roi = extract_visual(visual, visual_params, batch["images"][:1],
                               batch["roi_images"][:1])
    params = model.init(key, batch["input_ids"][:1, 0], grid, roi,
                        batch["roi_coors"][:1], None,
                        batch["attention_mask"][:1, 0],
                        batch["added_mask"][:1, 0])["params"]
    tx = make_adamw(linear_warmup_schedule(7e-5, 100, 10000),
                    head_learning_rate=linear_warmup_schedule(7e-4, 100, 10000))
    state = TrainState.create(params, visual_params, tx)
    print(f"# init: {time.time() - t0:.1f}s", file=sys.stderr)

    step = make_finetune_train_step(model, visual, donate=False)

    t0 = time.time()
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    # warmup
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])

    # Force a HOST fetch of the loss every step: on this platform (axon
    # tunnel) block_until_ready resolves early, so only a device->host scalar
    # transfer gives honest wall-clock (verified: block_until_ready-timed
    # loops report >1000x the FLOP roofline).
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, batch, key)
        float(metrics["loss"])
    dt = time.time() - t0

    samples_per_s = batch_size * steps / dt
    pairs_per_s = samples_per_s * cfg.num_imgs
    print(f"# {dt / steps * 1e3:.1f} ms/step, {samples_per_s:.2f} samples/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "fcmf_finetune_image_text_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
