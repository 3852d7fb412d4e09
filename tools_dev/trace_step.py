"""Capture a device trace of the fine-tune step and print top HLO ops.

jax.profiler trace -> xplane.pb -> tensorboard_plugin_profile's converter ->
hlo_stats table, sorted by self time.  Attribution tool for the MFU push:
tells us which ops own the gap between achieved and peak TF/s.

Usage: BENCH_BATCH=8 TRACE_MODE=model python tools_dev/trace_step.py
  TRACE_MODE: full (default) | model (cached-feature fusion step) |
              visual (ResNet extraction only) |
              pretrain (cached-feature seq2seq step, batch 16)

If the tensorboard_plugin_profile gviz converter is unavailable (protobuf
version mismatch on this image), the trace still lands in TRACE_DIR —
aggregate it with tools_dev/analyze_trace.py instead.
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from macsa_tpu.train.common import compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))

    from bench import fast_init, make_batch
    from macsa_tpu.config import (FCMFConfig, ModelConfig, ResNetConfig,
                                  TextEncoderConfig)
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
    from macsa_tpu.train.state import TrainState
    from macsa_tpu.train.steps import extract_visual, make_finetune_train_step

    mode = os.environ.get("TRACE_MODE", "full")
    b = int(os.environ.get("BENCH_BATCH",
                           "16" if mode == "pretrain" else "8"))
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    logdir = os.environ.get("TRACE_DIR", "/tmp/macsa_trace")

    scan = os.environ.get("BENCH_SCAN", "0") != "0"
    cfg = FCMFConfig(model=ModelConfig(dtype="bfloat16",
                                       fused_attention=fused),
                     text=TextEncoderConfig(dtype="bfloat16",
                                            fused_attention=fused,
                                            scan_layers=scan))
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
    step = make_finetune_train_step(model, visual, donate=False)

    if mode == "visual":
        vstep = jax.jit(lambda vp, im, ri: extract_visual(visual, vp, im, ri))

        def run(state):
            g, r = vstep(state.visual_params, batch["images"],
                         batch["roi_images"])
            return state, g
    elif mode == "model":
        g, r = jax.jit(lambda vp, im, ri: extract_visual(visual, vp, im, ri))(
            visual_params, batch["images"], batch["roi_images"])
        mbatch = {k: v for k, v in batch.items()
                  if k not in ("images", "roi_images")}
        mbatch["grid"], mbatch["roi"] = g, r

        def run(state):
            state, metrics = step(state, mbatch, key)
            return state, metrics["loss"]
    elif mode == "pretrain":
        from macsa_tpu.config import DecoderConfig
        from macsa_tpu.models.seq2seq import FCMFSeq2Seq
        from macsa_tpu.train.steps import make_pretrain_train_step

        dec_cfg = DecoderConfig(vocab_size=cfg.text.vocab_size,
                                dtype="bfloat16",
                                scan_blocks=os.environ.get(
                                    "BENCH_SCAN_DECODER", "1") != "0")
        s2s = FCMFSeq2Seq(cfg, dec_cfg)
        t_dec = dec_cfg.max_decode_len
        batch["enc_input_ids"] = batch.pop("input_ids")[:, 0]
        for k2 in ("token_type_ids", "attention_mask", "added_mask"):
            batch[k2] = batch[k2][:, 0]
        batch["dec_input_ids"] = jax.jit(
            lambda k: jax.random.randint(k, (b, t_dec), 2,
                                         cfg.text.vocab_size, jnp.int32))(
            jax.random.PRNGKey(7))
        batch["labels"] = jnp.roll(batch["dec_input_ids"], -1,
                                   axis=1).at[:, -1].set(-100)
        pparams = fast_init(
            lambda k, *a: s2s.init(k, *a)["params"],
            batch["enc_input_ids"][:1], batch["dec_input_ids"][:1],
            jnp.zeros((1,) + grid.shape[1:], grid.dtype),
            jnp.zeros((1,) + roi.shape[1:], roi.dtype),
            batch["roi_coors"][:1], None, batch["attention_mask"][:1],
            batch["added_mask"][:1])
        state = TrainState.create(pparams, visual_params, tx)
        g, r = jax.jit(lambda vp, im, ri: extract_visual(visual, vp, im, ri))(
            visual_params, batch["images"], batch["roi_images"])
        mbatch = {k: v for k, v in batch.items()
                  if k not in ("images", "roi_images")}
        mbatch["grid"], mbatch["roi"] = g, r
        pstep = make_pretrain_train_step(s2s, visual, donate=False)

        def run(state):
            state, metrics = pstep(state, mbatch, key)
            return state, metrics["loss"]
    else:
        def run(state):
            state, metrics = step(state, batch, key)
            return state, metrics["loss"]

    # warm up (compile outside the trace)
    state, out = run(state)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]

    n = int(os.environ.get("TRACE_STEPS", "5"))
    with jax.profiler.trace(logdir):
        for _ in range(n):
            state, out = run(state)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]

    planes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        raise SystemExit(f"no xplane.pb under {logdir}")
    xplane = planes[-1]
    print(f"# trace: {xplane}", file=sys.stderr)

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd
    except Exception as e:  # protobuf version mismatch on this image
        print(f"# gviz converter unavailable ({type(e).__name__}); "
              f"aggregate with: python tools_dev/analyze_trace.py {logdir}",
              file=sys.stderr)
        return
    data, _ = rttd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    # gviz table: {cols: [...], rows: [{c: [{v: ...}]}]}
    cols = [c["label"] for c in table[0]["cols"]] if isinstance(table, list) \
        else [c["label"] for c in table["cols"]]
    rows = table[0]["rows"] if isinstance(table, list) else table["rows"]

    def col(name):
        for i, c in enumerate(cols):
            if name.lower() in c.lower():
                return i
        raise KeyError(f"{name} not in {cols}")

    i_cat = col("category")
    i_expr = col("HLO op expression") if any(
        "expression" in c.lower() for c in cols) else col("op name")
    i_self = col("total self time (us)") if any(
        "self time (us)" in c.lower() for c in cols) else col("self")
    parsed = []
    for r in rows:
        c = r["c"]
        parsed.append((c[i_cat]["v"], str(c[i_expr]["v"])[:110],
                       float(c[i_self]["v"] or 0)))
    total = sum(p[2] for p in parsed)
    print(f"total self time: {total / 1e3 / n:.2f} ms/step over {n} steps")
    by_cat = {}
    for cat, _, t in parsed:
        by_cat[cat] = by_cat.get(cat, 0.0) + t
    print("\n== by category ==")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {t / 1e3 / n:8.3f} ms/step  {100 * t / total:5.1f}%  {cat}")
    print("\n== top 30 ops ==")
    for cat, expr, t in sorted(parsed, key=lambda p: -p[2])[:30]:
        print(f"  {t / 1e3 / n:8.3f} ms/step  {100 * t / total:5.1f}%  "
              f"[{cat}] {expr}")


if __name__ == "__main__":
    main()
