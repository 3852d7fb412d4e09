"""Exact FLOP count + measured MFU for the training programs.

Compiles the same programs bench.py measures and reads XLA's own flop
estimate from `compiled.cost_analysis()`, then MEASURES each program's step
time itself (bench.py's chained-steps method: N data-dependent steps, one
tail fetch — robust to the axon tunnel's broken block_until_ready and
multi-second RTT swings) and reports achieved TF/s and MFU against the
chip's bf16 peak.

Programs (mirroring bench.py's modes):
* visual   — batched ResNet-152 grid+ROI extraction (extract_visual)
* model    — fusion fwd+bwd+AdamW on cached features (the steady-state
             frozen-CNN epoch program)
* full     — visual + model chained per step (the finetune driver's
             split-program structure)
* pretrain — seq2seq fwd+bwd+AdamW on cached features (batch 16)

Usage: python tools_dev/mfu.py            (whole suite; ~4 compiles)
       MFU_MODES=model,pretrain python tools_dev/mfu.py
Prints human-readable rows + ONE machine-parseable JSON line.

**Per-process isolation (default, r5).** Measuring several programs in
one process contaminates the later ones: the r4 committed record timed
the pretrain program at 73.7 ms/step when measured fourth-in-process vs
34.8 ms standalone (docs/MFU_PRETRAIN_RECHECK.txt root-causes the 2.1x).
So when more than one mode is requested, each mode now runs in its own
fresh subprocess (MFU_MODES=<mode> child invocations) and the parent
merges the per-child JSON.  MFU_ISOLATE=0 restores the old
single-process composition for studying exactly that interference.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e: 197 bf16 TFLOP/s per chip (public spec)
PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))


def compile_and_count(jitted, *args):
    """-> (compiled, flops from XLA cost analysis)."""
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    return c, float(ca.get("flops", 0.0))


def isolated_suite(modes):
    """Run each mode as `MFU_MODES=<mode>` in a fresh subprocess; merge the
    children's JSON lines into one suite record."""
    merged = None
    print(f"mfu suite, one fresh process per mode ({','.join(modes)}):")
    for mode in modes:
        env = dict(os.environ, MFU_MODES=mode)
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr)
            raise SystemExit(f"mfu child for mode {mode!r} failed "
                             f"(exit {proc.returncode})")
        line = next(l for l in reversed(proc.stdout.splitlines())
                    if l.startswith("{"))
        child = json.loads(line)
        if merged is None:
            merged = {k: v for k, v in child.items() if k != "modes"}
            merged["isolated_processes"] = True
            merged["modes"] = {}
        merged["modes"].update(child["modes"])
        for name, r in child["modes"].items():
            print(f"  {name:9s}: {r['tflop']:7.2f} TFLOP  "
                  f"{r['ms_per_step']:7.1f} ms/step -> "
                  f"{r['tf_per_s']:6.1f} TF/s = {r['mfu_pct']:4.1f}% MFU"
                  f"   [own process]")
    print(json.dumps(merged))


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
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    modes = os.environ.get("MFU_MODES", "visual,model,full,pretrain").split(",")
    if len(modes) > 1 and os.environ.get("MFU_ISOLATE", "1") != "0":
        return isolated_suite(modes)
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

    # --- programs -------------------------------------------------------
    ev, f_vis = compile_and_count(
        jax.jit(lambda vp, im, ri: extract_visual(visual, vp, im, ri)),
        state.visual_params, batch["images"], batch["roi_images"])

    gz = jnp.zeros(
        (b,) + grid.shape[1:], grid.dtype), jnp.zeros(
        (b,) + roi.shape[1:], roi.dtype)
    fbatch = {k: v for k, v in batch.items()
              if k not in ("images", "roi_images")}
    fbatch["grid"], fbatch["roi"] = gz
    # donate=False: the original `state` seeds several measurement chains —
    # a donated first call would free its buffers under the later chains
    fstep, f_model = compile_and_count(
        make_finetune_train_step(model, visual, donate=False),
        state, fbatch, key)

    def timed(run, n):
        """run(n) must chain n steps and return a scalar-fetchable value."""
        run(1)       # upload + first step
        run(2)       # steady-state buffers
        t0 = time.time()
        run(steps)
        return (time.time() - t0) / steps * 1e3  # ms/step

    results = {}

    if "visual" in modes or "full" in modes:
        def run_vis(n):
            images = batch["images"]
            for _ in range(n):
                g, r = ev(state.visual_params, images, batch["roi_images"])
                images = images + g[0, 0, 0, 0] * 0
            float(g[0, 0, 0, 0])
        ms_vis = timed(run_vis, steps)
        if "visual" in modes:
            results["visual"] = (f_vis, ms_vis, b)

    if "model" in modes or "full" in modes:
        def run_model(n, st=[state]):
            for _ in range(n):
                st[0], m = fstep(st[0], fbatch, key)
            float(m["loss"])
        ms_model = timed(run_model, steps)
        if "model" in modes:
            results["model"] = (f_model, ms_model, b)

    if "full" in modes:
        # the driver's split-program chain: extract | fuse+update
        def run_full(n, st=[state]):
            b2 = dict(fbatch)
            for _ in range(n):
                b2["grid"], b2["roi"] = ev(st[0].visual_params,
                                           batch["images"],
                                           batch["roi_images"])
                st[0], m = fstep(st[0], b2, key)
            float(m["loss"])
        ms_full = timed(run_full, steps)
        results["full"] = (f_vis + f_model, ms_full, b)

    if "pretrain" in modes:
        dec_cfg = DecoderConfig(vocab_size=cfg.text.vocab_size,
                                dtype="bfloat16",
                                scan_blocks=os.environ.get(
                                    "BENCH_SCAN_DECODER", "1") != "0")
        s2s = FCMFSeq2Seq(cfg, dec_cfg)
        t_dec = dec_cfg.max_decode_len
        pb = make_batch(cfg, b_pre)
        pb["enc_input_ids"] = pb.pop("input_ids")[:, 0]
        for k in ("token_type_ids", "attention_mask", "added_mask"):
            pb[k] = pb[k][:, 0]
        pb["dec_input_ids"] = jax.jit(
            lambda k: jax.random.randint(k, (b_pre, t_dec), 2,
                                         cfg.text.vocab_size, jnp.int32))(
            jax.random.PRNGKey(7))
        pb["labels"] = jnp.roll(pb["dec_input_ids"], -1,
                                axis=1).at[:, -1].set(-100)
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
        # cached-features variant: the seq2seq program alone (its visual
        # extraction is the SAME ev program measured above)
        pbatch = {k: v for k, v in pb.items()
                  if k not in ("images", "roi_images")}
        pbatch["grid"] = jnp.zeros(pgrid.shape, pgrid.dtype)
        pbatch["roi"] = jnp.zeros(proi.shape, proi.dtype)
        pstep, f_pre = compile_and_count(
            make_pretrain_train_step(s2s, visual, donate=False),
            pstate, pbatch, key)

        def run_pre(n, st=[pstate]):
            for _ in range(n):
                st[0], m = pstep(st[0], pbatch, key)
            float(m["loss"])
        ms_pre = timed(run_pre, steps)
        results["pretrain"] = (f_pre, ms_pre, b_pre)

    out = {"peak_tflops": PEAK_TFLOPS, "batch": b,
           "batch_pretrain": b_pre, "steps": steps, "modes": {}}
    print(f"batch {b} (pretrain {b_pre}), {steps} timed steps, "
          f"peak {PEAK_TFLOPS:.0f} bf16 TF/s:")
    for name, (f, ms, bs) in results.items():
        tfs = f / (ms / 1e3) / 1e12
        mfu = tfs / PEAK_TFLOPS * 100
        print(f"  {name:9s}: {f / 1e12:7.2f} TFLOP  {ms:7.1f} ms/step -> "
              f"{tfs:6.1f} TF/s = {mfu:4.1f}% MFU")
        out["modes"][name] = {"tflop": round(f / 1e12, 3),
                              "ms_per_step": round(ms, 2),
                              "tf_per_s": round(tfs, 2),
                              "mfu_pct": round(mfu, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
