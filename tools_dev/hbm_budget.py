"""Measured HBM budget for the full-scale training programs.

Compiles the same programs bench.py runs (extract_visual, finetune fusion
step, pretrain seq2seq step) at full scale and reads XLA's own memory
analysis from `compiled.memory_analysis()` — argument/output/temp/code
bytes — plus the exact TrainState footprint from the pytree.  These are the
inputs to docs/SCALING.md's per-chip budget table (dp8 / dp4xmp2
projections).

Usage (TPU host): BENCH_BATCH=8 python tools_dev/hbm_budget.py
Prints a human table + ONE machine-parseable JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_bytes(tree) -> int:
    import jax
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))


def mem_of(compiled) -> dict:
    m = compiled.memory_analysis()
    fields = ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes")
    out = {}
    for f in fields:
        v = getattr(m, f, None)
        if v is not None:
            out[f.replace("_size_in_bytes", "")] = int(v)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from macsa_tpu.train.common import compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))

    from bench import fast_init, make_batch
    from macsa_tpu.config import (DecoderConfig, FCMFConfig, ModelConfig,
                                  ResNetConfig, TextEncoderConfig)
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.models.seq2seq import FCMFSeq2Seq
    from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
    from macsa_tpu.train.state import TrainState
    from macsa_tpu.train.steps import (extract_visual,
                                       make_finetune_train_step,
                                       make_pretrain_train_step)

    b = int(os.environ.get("BENCH_BATCH", "8"))
    b_pre = int(os.environ.get("BENCH_BATCH_PRETRAIN", "16"))
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    cfg = FCMFConfig(model=ModelConfig(dtype="bfloat16",
                                       fused_attention=fused),
                     text=TextEncoderConfig(dtype="bfloat16",
                                            fused_attention=fused))
    model = FCMF(cfg)
    visual = VisualFeatures(ResNetConfig())
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

    out = {"batch": b, "batch_pretrain": b_pre, "bytes": {}}
    bt = out["bytes"]
    bt["params"] = tree_bytes(state.params)
    bt["visual_params"] = tree_bytes(state.visual_params)
    bt["opt_state"] = tree_bytes(state.opt_state)
    bt["train_state_total"] = tree_bytes(state)
    # Megatron-mp shards the text-encoder attention/MLP matrices
    # (parallel/sharding.py); everything else stays replicated.
    bt["params_text_encoder"] = tree_bytes(state.params.get("encoder", {}))
    bt["batch_pixels_f32"] = (batch["images"].nbytes
                              + batch["roi_images"].nbytes)
    bt["batch_features"] = int(np.prod(grid.shape) * b * 2
                               + np.prod(roi.shape) * b * 2)  # bf16

    ev = jax.jit(lambda vp, im, ri: extract_visual(visual, vp, im, ri))
    cv = ev.lower(state.visual_params, batch["images"],
                  batch["roi_images"]).compile()
    out["visual_program"] = mem_of(cv)

    fbatch = {k: v for k, v in batch.items()
              if k not in ("images", "roi_images")}
    fbatch["grid"] = jnp.zeros((b,) + grid.shape[1:], grid.dtype)
    fbatch["roi"] = jnp.zeros((b,) + roi.shape[1:], roi.dtype)
    fstep = make_finetune_train_step(model, visual, donate=False)
    cf = fstep.lower(state, fbatch, key).compile()
    out["model_program"] = mem_of(cf)

    dec_cfg = DecoderConfig(vocab_size=cfg.text.vocab_size, dtype="bfloat16")
    s2s = FCMFSeq2Seq(cfg, dec_cfg)
    pb = make_batch(cfg, b_pre)
    pb["enc_input_ids"] = pb.pop("input_ids")[:, 0]
    for k in ("token_type_ids", "attention_mask", "added_mask"):
        pb[k] = pb[k][:, 0]
    t_dec = dec_cfg.max_decode_len
    pb["dec_input_ids"] = jnp.zeros((b_pre, t_dec), jnp.int32)
    pb["labels"] = jnp.zeros((b_pre, t_dec), jnp.int32)
    pgrid, proi = jax.eval_shape(
        lambda vp, im, ri: extract_visual(visual, vp, im, ri),
        visual_params, pb["images"], pb["roi_images"])
    pparams = fast_init(
        lambda k, *a: s2s.init(k, *a)["params"],
        pb["enc_input_ids"][:1], pb["dec_input_ids"][:1],
        jnp.zeros((1,) + pgrid.shape[1:], pgrid.dtype),
        jnp.zeros((1,) + proi.shape[1:], proi.dtype),
        pb["roi_coors"][:1], None, pb["attention_mask"][:1],
        pb["added_mask"][:1])
    pstate = TrainState.create(pparams, visual_params, tx)
    bt["pretrain_params"] = tree_bytes(pstate.params)
    bt["pretrain_state_total"] = tree_bytes(pstate)
    pbatch = {k: v for k, v in pb.items()
              if k not in ("images", "roi_images")}
    pbatch["grid"] = jnp.zeros(pgrid.shape, pgrid.dtype)
    pbatch["roi"] = jnp.zeros(proi.shape, proi.dtype)
    pstep = make_pretrain_train_step(s2s, visual, donate=False)
    cp = pstep.lower(pstate, pbatch, key).compile()
    out["pretrain_program"] = mem_of(cp)

    def gib(n):
        return f"{n / 2**30:6.2f} GiB"

    print(f"batch {b} (pretrain {b_pre}):")
    print(f"  finetune TrainState : {gib(bt['train_state_total'])} "
          f"(params {gib(bt['params'])}, resnet {gib(bt['visual_params'])}, "
          f"opt {gib(bt['opt_state'])})")
    print(f"  pretrain TrainState : {gib(bt['pretrain_state_total'])}")
    print(f"  text-encoder params : {gib(bt['params_text_encoder'])} "
          f"(the Megatron-mp-shardable slice)")
    for name in ("visual_program", "model_program", "pretrain_program"):
        m = out[name]
        print(f"  {name:19s}: temp {gib(m.get('temp', 0))}  "
              f"args {gib(m.get('argument', 0))}  "
              f"out {gib(m.get('output', 0))}  "
              f"code {gib(m.get('generated_code', 0))}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
