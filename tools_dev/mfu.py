"""Exact FLOP count + MFU for the fine-tune step via XLA cost analysis.

Compiles the same programs bench.py measures (full step / extract_visual /
text+fusion grad) and reads XLA's own flop estimate from
`compiled.cost_analysis()`, then combines with measured step times to report
achieved TF/s and MFU against the chip's bf16 peak.

Usage: BENCH_BATCH=8 python tools_dev/mfu.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e: 197 bf16 TFLOP/s per chip (public spec)
PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))


def flops_of(jitted, *args) -> float:
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))

    from bench import fast_init, make_batch
    from macsa_tpu.config import FCMFConfig, ModelConfig, ResNetConfig, TextEncoderConfig
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
    from macsa_tpu.train.state import TrainState
    from macsa_tpu.train.steps import extract_visual, make_finetune_train_step

    b = int(os.environ.get("BENCH_BATCH", "8"))
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    cfg = FCMFConfig(model=ModelConfig(dtype="bfloat16",
                                       fused_attention=fused),
                     text=TextEncoderConfig(dtype="bfloat16",
                                            fused_attention=fused))
    rcfg = ResNetConfig()
    model, visual = FCMF(cfg), VisualFeatures(rcfg)
    batch = make_batch(cfg, b)
    key = jax.random.PRNGKey(0)

    visual_params = fast_init(visual.init, batch["images"][:1, :1])
    grid, roi = jax.eval_shape(
        lambda vp, im, ri: extract_visual(visual, vp, im, ri),
        visual_params, batch["images"][:1], batch["roi_images"][:1])
    params = fast_init(
        lambda k, *a: model.init(k, *a)["params"],
        batch["input_ids"][:1, 0],
        jnp.zeros(grid.shape, grid.dtype), jnp.zeros(roi.shape, roi.dtype),
        batch["roi_coors"][:1], None, batch["attention_mask"][:1, 0],
        batch["added_mask"][:1, 0])
    tx = make_adamw(linear_warmup_schedule(7e-5, 100, 10000),
                    head_learning_rate=linear_warmup_schedule(7e-4, 100, 10000))
    state = TrainState.create(params, visual_params, tx)

    ev = jax.jit(lambda vp, im, ri: extract_visual(visual, vp, im, ri))
    f_vis = flops_of(ev, state.visual_params, batch["images"],
                     batch["roi_images"])

    step = make_finetune_train_step(model, visual, donate=False)
    f_step = flops_of(step, state, batch, key)

    print(f"batch {b}:")
    print(f"  extract_visual   : {f_vis / 1e12:7.2f} TFLOP")
    print(f"  full train step  : {f_step / 1e12:7.2f} TFLOP "
          f"(fusion+text fwd/bwd+opt = {(f_step - f_vis) / 1e12:.2f})")
    ms = os.environ.get("STEP_MS")
    rows = [("full step", f_step, ms),
            ("extract_visual", f_vis, os.environ.get("VIS_MS")),
            ("model (step-vis)", f_step - f_vis, os.environ.get("MODEL_MS"))]
    for name, f, t in rows:
        if t:
            tf_s = f / (float(t) / 1e3) / 1e12
            print(f"  {name:17s}: {float(t):6.1f} ms -> {tf_s:6.1f} TF/s "
                  f"= {tf_s / PEAK_TFLOPS * 100:4.1f}% of {PEAK_TFLOPS:.0f} "
                  f"TF/s peak")


if __name__ == "__main__":
    main()
