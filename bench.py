"""Benchmark: FCMF throughput on real hardware, in image-text pairs/sec
(samples/sec * 7 images) — the reference's headline metric.

BENCH_MODE selects the measured path (baselines from BASELINE.md):
* full (default)  — Phase-2 fine-tune train step: batched ResNet-152 visual
  extraction (7 images + 28 ROI crops/sample) + 6 aspect-view FCMF forwards
  + backward + AdamW, as two chained programs exactly like the finetune
  driver (BENCH_SPLIT=0 for the single-program variant).  Baseline 7.1
  pairs/s (Kaggle GPU fp16, batch 2).
* pretrain        — Phase-1 IAOG seq2seq train step (FCMFEncoder + 12-block
  decoder teacher forcing), batch 16 like the reference.  Baseline 33
  pairs/s (Pretraining notebook epoch bars, 3.3-3.5 s/it).
* inference       — eval-only path: visual extraction + 6-aspect batched
  forward (inference.py:284-329's per-aspect loop, batched).  The reference
  publishes no inference throughput; vs_baseline uses the 7.1 pairs/s
  fine-tune figure as a LOWER bound on the reference (forward-only is
  strictly faster than train).
* bundle          — the AOT StableHLO serving artifact (inference/export.py):
  the exported+serialized+reloaded forward at serving dtype (f32, XLA
  attention), timed through `exported.call` exactly as a bundle server
  runs it.
* visual / model  — breakdown modes: ResNet extraction alone / fusion
  fwd+bwd+update on cached features.
* pretrain_model  — steady-state Phase-1: the seq2seq fwd+bwd+update on
  cached frozen-CNN features, the path the pretrain driver runs for every
  epoch >= 1 (train/feature_cache.py + --cache_visual_features).
* pixels          — the cold-epoch path: real host JPEG decode + fused
  resize-normalize through the native C++ image pipe
  (macsa_tpu/native/image_pipe.cpp), float32 host->device transfer
  (the reference's exact data shape, vimacsa_dataset.py:25-30), then the
  full train step.  Epoch 0 of a real run looks like this; epochs >=1 hit
  the HBM feature cache instead (see BENCH_MODE=model).  Host decode runs
  in a prefetch thread overlapping the device step, like data/loader.py.
  BENCH_PIXEL_TRANSFER=u8 measures the drivers' default packed-uint32
  frame path instead (1 byte/pixel over the host link, normalize fused
  into the in-program unpack — see ops/image_prep.py; metric suffix
  `_pixels_u8`).

Timing method (axon tunnel quirks, measured 2026-08-16):
* `block_until_ready` is broken on the axon plugin — it returns before the
  computation finishes (tail-only block timing once reported >1000x the FLOP
  roofline).
* A per-step host fetch of the loss is honest but hostage to the tunnel's
  round-trip latency, which swings from ~40 ms to multiple seconds — the
  same step measured 255 ms and 4.2 s minutes apart.
* So: run N *chained* steps (each step's state feeds the next) and fetch one
  scalar at the end.  The final loss *value* physically depends on every
  prior step, so the fetch cannot complete early — this lower-bounds device
  time by construction and adds only one RTT, amortized over N steps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINES = {  # pairs/s, BASELINE.md throughput table
    "full": 7.1,       # ViIM-FCMF fine-tune epoch bars
    "visual": 7.1,     # breakdown of the full step
    "model": 7.1,      # breakdown of the full step
    "pretrain": 33.0,  # IAOG pretraining epoch bars (batch 16)
    "pretrain_model": 33.0,  # steady-state pretrain (cached features)
    "inference": 7.1,  # no published number; fine-tune rate = lower bound
    "bundle": 7.1,     # AOT StableHLO serving bundle (same lower bound)
    "pixels": 7.1,     # cold-epoch full step (the reference decodes on the
                       # host every epoch too — it never caches pixels)
}


def make_jpeg_pool(pool_dir, n=48, hw=(384, 512), seed=0):
    """Write a pool of random JPEGs once; returns their paths."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    os.makedirs(pool_dir, exist_ok=True)
    paths = []
    for i in range(n):
        p = os.path.join(pool_dir, f"im{i:03d}.jpg")
        if not os.path.exists(p):
            Image.fromarray(rng.integers(0, 256, size=hw + (3,),
                                         dtype=np.uint8)).save(p, quality=88)
        paths.append(p)
    return paths


def host_pixel_batch(paths, b, num_imgs, num_roi, step_idx, decode,
                     resize_norm):
    """Decode + resize + normalize one full float32 pixel batch on the host.

    Mirrors the dataset's per-sample work (vimacsa_dataset.py:123-199):
    one 224x224 resize-normalize per image plus `num_roi` crop+resizes
    per image."""
    imgs = np.empty((b, num_imgs, 224, 224, 3), np.float32)
    rois = np.empty((b, num_imgs, num_roi, 224, 224, 3), np.float32)
    k = step_idx * b * num_imgs
    for i in range(b):
        for j in range(num_imgs):
            k += 1
            img = decode(paths[k % len(paths)])
            imgs[i, j] = resize_norm(img, 224)
            h, w = img.shape[:2]
            for r in range(num_roi):
                y0 = (r * 37) % (h // 2)
                x0 = (r * 61) % (w // 2)
                rois[i, j, r] = resize_norm(
                    np.ascontiguousarray(img[y0:y0 + h // 2,
                                             x0:x0 + w // 2]), 224)
    return imgs, rois


def host_pixel_batch_u8(paths, b, num_imgs, num_roi, step_idx, decode,
                        resize_u8):
    """uint8 variant of `host_pixel_batch` for the packed-word transfer
    (BENCH_PIXEL_TRANSFER=u8): decode + resize only — normalization moves
    on-device (ops.image_prep.pack_pixels_u8 / device_normalize), the host
    link carries 1 byte/pixel instead of 4."""
    imgs = np.empty((b, num_imgs, 224, 224, 3), np.uint8)
    rois = np.empty((b, num_imgs, num_roi, 224, 224, 3), np.uint8)
    k = step_idx * b * num_imgs
    for i in range(b):
        for j in range(num_imgs):
            k += 1
            img = decode(paths[k % len(paths)])
            imgs[i, j] = resize_u8(img, 224)
            h, w = img.shape[:2]
            for r in range(num_roi):
                y0 = (r * 37) % (h // 2)
                x0 = (r * 61) % (w // 2)
                rois[i, j, r] = resize_u8(
                    np.ascontiguousarray(img[y0:y0 + h // 2,
                                             x0:x0 + w // 2]), 224)
    return imgs, rois


def make_batch(cfg, b, a=6, seed=0):
    """Synthetic batch generated ON DEVICE (one jitted program, no host
    pixels): a host-built batch is ~170 MB of float32 pixels at batch 8,
    and shipping it through the axon tunnel used to eat a large slice of
    the 'compile+first step' wall time (measured r2: warm start dropped
    from ~215 s to ~2 min after moving batch+param creation on-device)."""
    import jax
    import jax.numpy as jnp
    l = cfg.max_text_len

    # float32 pixels: uint8 elementwise compute is ~120x slower on this
    # TPU stack (see macsa_tpu.ops.image_prep docs), so the bench uses the
    # default float path; uint8 transfer stays an opt-in for
    # host-link-bound deployments.
    @jax.jit
    def build(key):
        ks = jax.random.split(key, 5)
        return {
            "images": jax.random.normal(
                ks[0], (b, cfg.num_imgs, 224, 224, 3), jnp.float32),
            "roi_images": jax.random.normal(
                ks[1], (b, cfg.num_imgs, cfg.num_roi, 224, 224, 3),
                jnp.float32),
            "roi_coors": jax.random.uniform(
                ks[2], (b, cfg.num_imgs, cfg.num_roi, 4), jnp.float32),
            "input_ids": jax.random.randint(
                ks[3], (b, a, l), 2, cfg.text.vocab_size, jnp.int32),
            "token_type_ids": jnp.zeros((b, a, l), jnp.int32),
            "attention_mask": jnp.ones((b, a, l), jnp.int32),
            "added_mask": jnp.ones((b, a, l + cfg.num_patches), jnp.int32),
            "labels": jax.random.randint(ks[4], (b, a), 0, 4, jnp.int32),
        }

    return build(jax.random.PRNGKey(seed))


def fast_init(fn, *args, seed=0):
    """Materialize `fn(key, *args)`'s param pytree from shapes only.

    Full flax init runs the whole forward on device (~minutes through the
    tunnel for ResNet-152 + FCMF); the bench only needs *shaped* params —
    MXU time is not data-dependent — so the shapes come from jax.eval_shape
    and the values from ONE jitted on-device program (host-side numpy params
    were ~1 GB shipped through the tunnel, the bulk of the old 54 s init).
    """
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(fn, jax.random.PRNGKey(seed), *args)
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    @jax.jit
    def build(key):
        out = []
        for i, (path, s) in enumerate(paths_leaves):
            name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
            if not np.issubdtype(np.dtype(s.dtype), np.floating):
                out.append(jnp.zeros(s.shape, s.dtype))
            elif name in ("scale", "var"):  # LayerNorm / BN multipliers
                out.append(jnp.ones(s.shape, s.dtype))
            elif name in ("bias", "mean"):
                out.append(jnp.zeros(s.shape, s.dtype))
            else:
                out.append(0.02 * jax.random.normal(
                    jax.random.fold_in(key, i), s.shape, s.dtype))
        return out

    return jax.tree_util.tree_unflatten(treedef, build(jax.random.PRNGKey(seed)))


def main():
    import jax
    import jax.numpy as jnp

    from macsa_tpu.train.common import compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
    # rbg dropout-mask generation is ~2x cheaper than threefry on this TPU
    # (measured: 6.7 vs 13 ms/step of mask RNG at batch 8)
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))

    from macsa_tpu.config import FCMFConfig, ModelConfig, ResNetConfig, TextEncoderConfig
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
    from macsa_tpu.train.state import TrainState
    from macsa_tpu.train.steps import extract_visual, make_finetune_train_step

    if os.environ.get("BENCH_CACHE_DEBUG"):
        # print persistent-cache hit/miss decisions (key, path, bytes)
        import logging
        logging.basicConfig(stream=sys.stderr)
        logging.getLogger("jax._src.compilation_cache").setLevel(
            logging.DEBUG)
        logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

    mode = os.environ.get("BENCH_MODE", "full")
    if mode not in BASELINES:
        raise SystemExit(f"unknown BENCH_MODE={mode!r}; "
                         f"choose one of {sorted(BASELINES)}")
    # full/model default to batch 16 — the measured-best operating point on
    # one v5e chip (r04 sweep, docs/DESIGN.md: per-step constants like the
    # batch-invariant AdamW update amortize; b32 regresses in the extract
    # program's conv fusions).  visual/pixels/inference are per-sample-flat
    # and stay at 8; pretrain is 16 like the reference.
    default_batch = ("16" if mode in ("pretrain", "pretrain_model",
                                      "full", "model") else "8")
    batch_size = int(os.environ.get("BENCH_BATCH", default_batch))
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    # Pallas fused attention (ops/fused_attention.py) on by default; set
    # BENCH_FUSED=0 to measure the plain-XLA attention path.  (A fused
    # ResNet kernel was measured slower at every stage subset and retired;
    # its micro-bench lives in tools_dev/fused_resnet_experiment.py.)
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    # BENCH_SCAN=1 runs the text encoder as a lax.scan over layers: 3x
    # smaller executable / 2x faster compile, ~13 ms/step slower backward
    # (config.py scan_layers).  Default: scan for the forward-only
    # inference mode (penalty ~0 there), unrolled for the train modes.
    scan = os.environ.get("BENCH_SCAN",
                          "1" if mode == "inference" else "0") != "0"
    scan_unroll = int(os.environ.get("BENCH_SCAN_UNROLL", "1"))
    # BENCH_REMAT=1: checkpoint_dots on the text-encoder blocks (recompute
    # elementwise in bwd instead of saving activations — config.py).
    # BENCH_REMAT_FFN=1: the finer FFN-only variant (attention untouched).
    remat = os.environ.get("BENCH_REMAT", "0") != "0"
    remat_ffn = os.environ.get("BENCH_REMAT_FFN", "0") != "0"
    cfg = FCMFConfig(model=ModelConfig(dtype="bfloat16",
                                       fused_attention=fused,
                                       remat_ffn=remat_ffn),
                     text=TextEncoderConfig(dtype="bfloat16",
                                            fused_attention=fused,
                                            scan_layers=scan,
                                            scan_unroll=scan_unroll,
                                            remat_blocks=remat,
                                            remat_ffn=remat_ffn))
    rcfg = ResNetConfig()
    visual = VisualFeatures(rcfg)

    batch = make_batch(cfg, batch_size)
    key = jax.random.PRNGKey(0)
    tx = make_adamw(linear_warmup_schedule(7e-5, 100, 10000),
                    head_learning_rate=linear_warmup_schedule(7e-4, 100, 10000))

    t0 = time.time()
    visual_params = fast_init(visual.init, batch["images"][:1, :1])
    grid, roi = jax.eval_shape(
        lambda vp, im, ri: extract_visual(visual, vp, im, ri),
        visual_params, batch["images"][:1], batch["roi_images"][:1])

    if mode in ("pretrain", "pretrain_model"):
        from macsa_tpu.config import DecoderConfig
        from macsa_tpu.models.seq2seq import FCMFSeq2Seq
        from macsa_tpu.train.steps import make_pretrain_train_step

        dec_cfg = DecoderConfig(vocab_size=cfg.text.vocab_size,
                                dtype="bfloat16",
                                scan_blocks=os.environ.get(
                                    "BENCH_SCAN_DECODER", "1") != "0")
        model = FCMFSeq2Seq(cfg, dec_cfg)
        t_dec = dec_cfg.max_decode_len
        batch["enc_input_ids"] = batch.pop("input_ids")[:, 0]
        for k in ("token_type_ids", "attention_mask", "added_mask"):
            batch[k] = batch[k][:, 0]
        batch["dec_input_ids"] = jax.jit(
            lambda k: jax.random.randint(k, (batch_size, t_dec), 2,
                                         cfg.text.vocab_size, jnp.int32))(
            jax.random.PRNGKey(7))
        # pad -> ignore_index, iaog_dataset.py:89-96
        batch["labels"] = jnp.roll(batch["dec_input_ids"], -1,
                                   axis=1).at[:, -1].set(-100)
        params = fast_init(
            lambda k, *a: model.init(k, *a)["params"],
            batch["enc_input_ids"][:1], batch["dec_input_ids"][:1],
            jnp.zeros(grid.shape, grid.dtype), jnp.zeros(roi.shape, roi.dtype),
            batch["roi_coors"][:1], None, batch["attention_mask"][:1],
            batch["added_mask"][:1])
        state = TrainState.create(params, visual_params, tx)
        # BENCH_VOCAB_CHUNK > 0: fused chunked-vocab CE (no [B,T,V] f32
        # logits; seq2seq.chunked_seq2seq_loss) — the r5 measurement knob
        step = make_pretrain_train_step(
            model, visual,
            vocab_chunk=int(os.environ.get("BENCH_VOCAB_CHUNK", "0")))
    else:
        model = FCMF(cfg)
        params = fast_init(
            lambda k, *a: model.init(k, *a)["params"],
            batch["input_ids"][:1, 0],
            jnp.zeros(grid.shape, grid.dtype), jnp.zeros(roi.shape, roi.dtype),
            batch["roi_coors"][:1], None, batch["attention_mask"][:1, 0],
            batch["added_mask"][:1, 0])
        state = TrainState.create(params, visual_params, tx)
        step = make_finetune_train_step(model, visual)
    print(f"# init: {time.time() - t0:.1f}s", file=sys.stderr)

    def aot(fn, *example):
        """Explicitly trace+lower then XLA-compile `fn`, timing each phase.

        Separates Python tracing from XLA compilation (where the
        persistent cache either hits or pays the full compile) so the
        'compile+first step' number is attributable — VERDICT r2 weak #1.
        The returned compiled object is used for every subsequent call, so
        jit never re-traces.
        """
        cache_dir = jax.config.jax_compilation_cache_dir

        def entries():
            try:
                return set(os.listdir(cache_dir))
            except OSError:
                return set()

        before = entries()
        t0 = time.time()
        lowered = fn.lower(*example)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        wrote = entries() - before  # a new cache file == genuine compile
        print(f"# trace+lower: {t1 - t0:.1f}s, xla compile: {t2 - t1:.1f}s "
              f"(persistent cache {'miss' if wrote else 'hit'}, "
              f"dir {cache_dir})", file=sys.stderr)
        return compiled

    if mode == "inference":
        from macsa_tpu.train.steps import fcmf_forward_all_aspects
        fwd = jax.jit(lambda p, vp, bb: fcmf_forward_all_aspects(
            model, p, visual, vp, bb, deterministic=True))
        ibatch = {k: v for k, v in batch.items() if k != "labels"}
        fwd = aot(fwd, state.params, state.visual_params, ibatch)

        def run_chain(state, n):
            images = ibatch["images"]
            logits = None
            for _ in range(n):
                bb = dict(ibatch)
                bb["images"] = images
                logits = fwd(state.params, state.visual_params, bb)
                # zero-valued data dependency chains the steps so the tail
                # fetch cannot complete before every forward has run
                images = images + logits[0, 0, 0] * 0
            return state, {"loss": logits[0, 0, 0]}
    elif mode == "bundle":
        # AOT StableHLO serving path (inference/export.py): the SAME
        # program a shipped bundle executes — f32 params/compute, XLA
        # attention (no Mosaic custom_call; the bundle must stay portable),
        # exported -> serialized -> deserialized -> jitted `exported.call`.
        # Measures the serving artifact itself, not an in-process stand-in.
        import dataclasses
        from macsa_tpu.train.steps import fcmf_forward_all_aspects
        # BENCH_BUNDLE_DTYPE=bfloat16 measures the fast serving point
        # (export.py --dtype bfloat16); default f32 = checkpoint-exact
        sdt = os.environ.get("BENCH_BUNDLE_DTYPE", "float32")
        serving_cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, dtype=sdt,
                                      fused_attention=False),
            text=dataclasses.replace(cfg.text, dtype=sdt,
                                     fused_attention=False,
                                     fused_attention_interpret=False))
        serving_visual = VisualFeatures(
            dataclasses.replace(rcfg, dtype=sdt))
        serving_model = FCMF(serving_cfg)

        def fwd(p, vp, bb):
            return fcmf_forward_all_aspects(serving_model, p, serving_visual,
                                            vp, bb, deterministic=True)

        ibatch = {k: v for k, v in batch.items() if k != "labels"}
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
            (state.params, state.visual_params, ibatch))
        t0 = time.time()
        exported = jax.export.export(jax.jit(fwd))(*abstract)
        blob = exported.serialize()
        reloaded = jax.export.deserialize(blob)
        print(f"# export+serialize+deserialize: {time.time() - t0:.1f}s, "
              f"bundle {len(blob) / 1e6:.1f} MB", file=sys.stderr)
        call = aot(jax.jit(reloaded.call), state.params,
                   state.visual_params, ibatch)

        def run_chain(state, n):
            images = ibatch["images"]
            logits = None
            for _ in range(n):
                bb = dict(ibatch)
                bb["images"] = images
                logits = call(state.params, state.visual_params, bb)
                images = images + logits[0, 0, 0] * 0
            return state, {"loss": logits[0, 0, 0]}
    elif mode == "visual":
        # ResNet extraction alone; chained via a zero-valued data dependency
        # so the tail fetch cannot complete before every step has run.
        vstep = jax.jit(lambda vp, im, ri: extract_visual(visual, vp, im, ri))
        vstep = aot(vstep, state.visual_params, batch["images"],
                    batch["roi_images"])

        def run_chain(state, n):
            images = batch["images"]
            for _ in range(n):
                grid, roi = vstep(state.visual_params, images,
                                  batch["roi_images"])
                images = images + grid[0, 0, 0, 0] * 0
            return state, {"loss": grid[0, 0, 0, 0]}
    elif mode in ("model", "pretrain_model"):
        # fusion (or pretrain seq2seq) fwd+bwd+update on cached features —
        # the steady-state frozen-CNN epoch path the drivers run for every
        # epoch >= 1 (train/feature_cache.py; the pretrain driver shares
        # it, train/pretrain.py --cache_visual_features).  ResNet runs once
        # outside the timed chain.
        grid_v, roi_v = jax.jit(
            lambda vp, im, ri: extract_visual(visual, vp, im, ri))(
                visual_params, batch["images"], batch["roi_images"])
        batch = {k: v for k, v in batch.items()
                 if k not in ("images", "roi_images")}
        batch["grid"], batch["roi"] = grid_v, roi_v
        step = aot(step, state, batch, key)

        def run_chain(state, n):
            for _ in range(n):
                state, metrics = step(state, batch, key)
            return state, metrics
    elif mode == "pixels":
        import queue as queue_mod
        import threading

        from macsa_tpu import native
        from macsa_tpu.models.resnet import IMAGENET_MEAN, IMAGENET_STD

        native.ensure_built()
        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)
        # f32 (default, the reference's exact transfer shape) or u8: packed
        # uint32 words, 1 byte/pixel over the host link, normalized on
        # device by int32 unpacking (ops.image_prep.unpack_normalize_u32)
        transfer = os.environ.get("BENCH_PIXEL_TRANSFER", "f32")
        if transfer not in ("f32", "u8"):
            raise SystemExit(f"BENCH_PIXEL_TRANSFER={transfer!r}: f32|u8")
        if native.available():
            decode_fn = native.decode
            rn_fn = lambda a, s: native.resize_normalize(a, s, mean, std)
            r8_fn = native.resize_u8
            pipe = "native C++ (libjpeg)"
        else:
            from PIL import Image
            decode_fn = lambda p: np.asarray(Image.open(p).convert("RGB"))

            def rn_fn(a, s):
                r = np.asarray(Image.fromarray(a).resize(
                    (s, s), Image.BILINEAR), np.float32) / 255.0
                return (r - mean) / std

            def r8_fn(a, s):
                return np.asarray(Image.fromarray(a).resize(
                    (s, s), Image.BILINEAR), np.uint8)
            pipe = "PIL fallback"
        print(f"# pixels: host pipe = {pipe}, transfer = {transfer}",
              file=sys.stderr)
        paths = make_jpeg_pool(
            os.environ.get("BENCH_JPEG_DIR", "/tmp/bench_jpeg_pool"))
        if transfer == "u8":
            # the drivers' productized frame-packed path (pixel_transfer=
            # packed): the step program itself unpacks uint32 frame words
            # (ops.image_prep.device_normalize dispatch), exactly like
            # train/finetune.py's default data path
            from macsa_tpu.ops.image_prep import (pack_pixels_u8,
                                                  packed_words_per_frame)
            wpf = packed_words_per_frame(224)
            batch["images"] = jnp.zeros(
                (batch_size, cfg.num_imgs, wpf), jnp.uint32)
            batch["roi_images"] = jnp.zeros(
                (batch_size, cfg.num_imgs, cfg.num_roi, wpf), jnp.uint32)
        step = aot(step, state, batch, key)
        n_workers = int(os.environ.get("BENCH_PIXEL_WORKERS", "2"))

        def run_chain(state, n):
            # prefetch thread pool overlapping host decode with the device
            # step, mirroring data/loader.py's producer
            from concurrent.futures import ThreadPoolExecutor
            q: "queue_mod.Queue" = queue_mod.Queue(maxsize=4)
            pool = ThreadPoolExecutor(max_workers=n_workers)

            def produce(t):
                if transfer == "u8":
                    imgs, rois = host_pixel_batch_u8(
                        paths, batch_size, cfg.num_imgs, cfg.num_roi, t,
                        decode_fn, r8_fn)
                    # .view(uint32) is zero-copy: 224*224*3 % 4 == 0
                    q.put((pack_pixels_u8(imgs), pack_pixels_u8(rois)))
                else:
                    q.put(host_pixel_batch(paths, batch_size, cfg.num_imgs,
                                           cfg.num_roi, t, decode_fn, rn_fn))
            futs = [pool.submit(produce, t) for t in range(n)]
            metrics = None
            for _ in range(n):
                b2 = dict(batch)
                imgs, rois = q.get()
                b2["images"] = jax.device_put(imgs)
                b2["roi_images"] = jax.device_put(rois)
                state, metrics = step(state, b2, key)
            for f in futs:
                f.result()
            pool.shutdown(wait=False)
            return state, metrics
    elif mode == "full" and os.environ.get("BENCH_SPLIT", "1") == "1":
        # Split the step into its two programs (extract | fuse+update),
        # chained per iteration — the SAME structure the finetune driver
        # actually runs (its feature-cache extract_jit is a separate
        # program).  Measured faster than the combined program at every
        # batch (b8: 99.5 vs 101.5 ms; b16: 197.3 vs 217.1 — in the
        # combined program XLA's ResNet fusions degrade at b16, emitting
        # bare mul/add splits that don't exist at b8; traced 2026-08-19).
        # BENCH_SPLIT=0 measures the one-program variant.
        vstep = jax.jit(lambda vp, im, ri: extract_visual(visual, vp, im, ri))
        vstep = aot(vstep, state.visual_params, batch["images"],
                    batch["roi_images"])
        fbatch = {k: v for k, v in batch.items()
                  if k not in ("images", "roi_images")}
        g0, r0 = jax.eval_shape(
            lambda vp, im, ri: extract_visual(visual, vp, im, ri),
            state.visual_params, batch["images"], batch["roi_images"])
        fbatch["grid"] = jnp.zeros(g0.shape, g0.dtype)
        fbatch["roi"] = jnp.zeros(r0.shape, r0.dtype)
        step = aot(step, state, fbatch, key)

        def run_chain(state, n):
            b2 = dict(fbatch)
            for _ in range(n):
                b2["grid"], b2["roi"] = vstep(state.visual_params,
                                              batch["images"],
                                              batch["roi_images"])
                state, metrics = step(state, b2, key)
            return state, metrics
    else:
        step = aot(step, state, batch, key)

        def run_chain(state, n):
            for _ in range(n):
                state, metrics = step(state, batch, key)
            return state, metrics

    t0 = time.time()
    state, metrics = run_chain(state, 1)
    loss0 = float(metrics["loss"])  # executable upload + first step
    print(f"# first step (incl. program upload): {time.time() - t0:.1f}s "
          f"(loss {loss0:.3f})", file=sys.stderr)

    # warmup (steady-state buffers)
    state, metrics = run_chain(state, 2)
    float(metrics["loss"])

    t0 = time.time()
    state, metrics = run_chain(state, steps)
    final = float(metrics["loss"])  # depends on all `steps` updates
    dt = time.time() - t0

    samples_per_s = batch_size * steps / dt
    pairs_per_s = samples_per_s * cfg.num_imgs
    print(f"# {dt / steps * 1e3:.1f} ms/step, {samples_per_s:.2f} samples/s "
          f"(final loss {final:.3f})", file=sys.stderr)
    if mode in ("pretrain", "inference", "bundle"):
        metric = f"fcmf_{mode}_image_text_pairs_per_s"
    elif mode == "pretrain_model":
        metric = "fcmf_pretrain_image_text_pairs_per_s_model"
    else:
        suffix = "" if mode == "full" else f"_{mode}"
        if mode == "pixels" and os.environ.get("BENCH_PIXEL_TRANSFER") == "u8":
            suffix = "_pixels_u8"  # distinguishable from the f32 pixels run
        metric = f"fcmf_finetune_image_text_pairs_per_s{suffix}"
    print(json.dumps({
        "metric": metric,
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINES[mode], 2),
    }))


if __name__ == "__main__":
    main()
