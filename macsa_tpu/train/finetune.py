"""Phase-2 MACSA fine-tune driver (FCMF classifier).

TPU-native equivalent of the reference driver
(reference: run_multimodal_fcmf.py): same flag surface (argparse), same data
prerequisites, dual-LR AdamW + linear warmup, optional encoder freeze,
IAOG encoder transfer, per-epoch dev macro-F1 with best/last checkpoints,
and the test harness writing `test_results_fcmf.txt` + the human-auditable
`test_predictions_formatted.txt`.

TPU differences (by design):
* one jitted train step covers ResNet feature extraction + all 6 aspect
  views (the reference loops both in Python, :448-475),
* bf16 activations instead of AMP fp16 (no GradScaler),
* SPMD data parallelism over a jax Mesh instead of DDP/NCCL,
* orbax checkpoints instead of torch.save.

Run: python -m macsa_tpu.train.finetune --do_train --do_eval ...
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np

from macsa_tpu.config import ASPECTS, FCMFConfig, ModelConfig, ResNetConfig


def build_argparser() -> argparse.ArgumentParser:
    """Flag surface mirroring run_multimodal_fcmf.py:65-118."""
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--pretrained_hf_model", type=str, default="uitnlp/visobert")
    p.add_argument("--resnet_weights", type=str, default=None,
                   help="torchvision resnet152 state-dict file")
    p.add_argument("--num_imgs", type=int, default=7)
    p.add_argument("--num_rois", type=int, default=4)
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--max_seq_length", type=int, default=170)
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--eval_batch_size", type=int, default=8)
    p.add_argument("--encoder_learning_rate", type=float, default=7e-5)
    p.add_argument("--classifier_head_learning_rate", type=float, default=7e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--num_train_epochs", type=int, default=12)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--prng", type=str, default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="JAX PRNG impl; rbg halves dropout-mask cost on TPU")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_test", action="store_true")
    p.add_argument("--bf16", action="store_true", default=True,
                   help="bf16 activations (replaces the reference --fp16)")
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--pretrained_iaog_path", type=str, default=None,
                   help="Phase-1 checkpoint dir for encoder transfer")
    p.add_argument("--freeze_encoder", action="store_true")
    p.add_argument("--fine_tune_cnn", action="store_true")
    p.add_argument("--cross_mask_mode", type=str, default="causal_quirk",
                   choices=["causal_quirk", "padding"])
    p.add_argument("--use_mde", action="store_true", default=False,
                   help="enable the Multimodal Denoising Encoder on the "
                        "patch branch when alpha < 1 (the reference's "
                        "alternative encoder, fcmf_pretraining.py:243-290)")
    p.add_argument("--pixel_transfer", type=str, default="packed",
                   choices=["packed", "f32"],
                   help="host->device pixel encoding. packed (default): "
                        "uint32 words, 1 byte/pixel, normalize fused into "
                        "the on-device unpack (cold-epoch 14 -> 46.6 pairs/s "
                        "measured, docs/BENCHMARKS.json); f32: the "
                        "reference's host-normalized float32 shape "
                        "(vimacsa_dataset.py:25-30).  Same math either way "
                        "(ops/image_prep.py; agree to ~1 ulp f32)")
    p.add_argument("--fused_attention", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas fused softmax+dropout+PV attention for the "
                        "text-encoder blocks; auto = on for TPU backends")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--resnet_stages", type=str, default="3,8,36,3",
                   help="ResNet stage sizes (default: ResNet-152); smaller "
                        "values for smoke tests, e.g. '1,1,1,1'")
    p.add_argument("--mp", type=int, default=1,
                   help="tensor-parallel (model) mesh axis size; params are "
                        "Megatron-sharded over mp (parallel.sharding), "
                        "dp = n_devices // mp")
    p.add_argument("--cache_visual_features", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="cache the frozen-CNN visual features in HBM after "
                        "the first pass over each split (exact — eval-mode "
                        "BN; skips the ResNet stack and the raw-pixel "
                        "host->device transfer). auto = on unless "
                        "--fine_tune_cnn")
    p.add_argument("--feature_cache_dir", type=str, default=None,
                   help="cross-stage on-disk feature cache "
                        "(train/disk_feature_cache.py): content-addressed "
                        "(image bytes + ROI boxes + ResNet weights), so "
                        "pretrain/finetune/eval processes sharing the dir "
                        "reuse each other's frozen-CNN extraction instead "
                        "of re-decoding (the reference re-decodes every "
                        "epoch, vimacsa_dataset.py:123-199).  Single-host "
                        "only; requires the HBM feature cache")
    return p


def main(argv: Optional[list] = None) -> dict:
    import jax
    import jax.numpy as jnp

    from macsa_tpu.data.loader import DataLoader, pad_batch
    from macsa_tpu.data.vimacsa import MACSADataset
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.parallel.mesh import (fetch_global, make_mesh,
                                         maybe_initialize_distributed,
                                         replicate, set_kernel_mesh,
                                         shard_batch)
    from macsa_tpu.train import common
    from macsa_tpu.train.checkpoints import (CheckpointManager,
                                             resolve_iaog_checkpoint,
                                             transfer_encoder_params)
    from macsa_tpu.train.metrics import aspect_report
    from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
    from macsa_tpu.train.state import TrainState
    from macsa_tpu.train.steps import (extract_visual,
                                       make_finetune_eval_step,
                                       make_finetune_train_step)
    from macsa_tpu.utils.logging import MetricWriter, maybe_profile, setup_logging

    args = build_argparser().parse_args(argv)
    jax.config.update("jax_default_prng_impl", args.prng)
    common.enable_compilation_cache()
    maybe_initialize_distributed()
    n_hosts, host_id = jax.process_count(), jax.process_index()
    is_main = host_id == 0
    logger = setup_logging(args.output_dir if is_main else None,
                           is_main=is_main)
    writer = MetricWriter(args.output_dir) if is_main else \
        type("NullWriter", (), {"write": staticmethod(lambda *a, **k: None)})()
    np.random.seed(args.seed)

    dtype = "bfloat16" if args.bf16 else "float32"
    fused = common.resolve_fused_attention(args.fused_attention, mp=args.mp,
                                           logger=logger)
    text_cfg = common.build_text_config(args.pretrained_hf_model, dtype,
                                        fused_attention=fused)
    cfg = FCMFConfig(model=ModelConfig(
                         dtype=dtype, fused_attention=fused.enabled,
                         fused_attention_interpret=fused.interpret),
                     text=text_cfg,
                     num_imgs=args.num_imgs, num_roi=args.num_rois,
                     alpha=args.alpha, max_text_len=args.max_seq_length,
                     decoder_cross_mask_mode=args.cross_mask_mode,
                     use_mde=args.use_mde)
    rcfg = ResNetConfig(dtype=dtype, stage_sizes=tuple(
        int(s) for s in args.resnet_stages.split(",")))

    tokenizer = common.load_tokenizer(args.pretrained_hf_model)
    roi_boxes, dict_img, dict_roi = common.load_metadata(args.data_dir)

    def make_dataset(split: str) -> MACSADataset:
        records = common.load_records(os.path.join(args.data_dir, f"{split}.json"))
        return MACSADataset(records, tokenizer, args.image_dir, roi_boxes,
                            dict_img, dict_roi, num_img=args.num_imgs,
                            num_roi=args.num_rois,
                            max_text_len=args.max_seq_length,
                            pixel_mode=args.pixel_transfer)

    # --- model & params -------------------------------------------------
    model = FCMF(cfg)
    visual = VisualFeatures(rcfg)
    key = jax.random.PRNGKey(args.seed)
    b0, a0, l0 = 1, len(ASPECTS), args.max_seq_length
    dummy = {
        "images": jnp.zeros((b0, cfg.num_imgs, 224, 224, 3), jnp.float32),
        "roi_images": jnp.zeros((b0, cfg.num_imgs, cfg.num_roi, 224, 224, 3),
                                jnp.float32),
        "roi_coors": jnp.zeros((b0, cfg.num_imgs, cfg.num_roi, 4), jnp.float32),
    }
    visual_params = common.jit_init(visual, key, dummy["images"][:, :1])
    grid, roi = common.output_zeros(
        lambda vp: extract_visual(visual, vp, dummy["images"],
                                  dummy["roi_images"]), visual_params)
    params = common.jit_init(
        model, key, jnp.ones((b0, l0), jnp.int32), grid, roi,
        dummy["roi_coors"], None, jnp.ones((b0, l0), jnp.int32),
        jnp.ones((b0, l0 + cfg.num_patches), jnp.int32))["params"]
    params = common.import_text_params(params, args.pretrained_hf_model, logger)
    visual_params = common.import_resnet_params(visual_params,
                                                args.resnet_weights, logger)

    # --- IAOG encoder transfer (run_multimodal_fcmf.py:382-412) ----------
    ckpt = CheckpointManager(args.output_dir)
    if args.pretrained_iaog_path:
        ckpt_path = resolve_iaog_checkpoint(args.pretrained_iaog_path)
        if ckpt_path is not None:
            logger.info(f"Transferring IAOG encoder from {ckpt_path}")
            # partial restore: only the param tree — the Phase-1 optimizer
            # moments (~2/3 of the checkpoint) are dead weight here
            from macsa_tpu.train.checkpoints import restore_subtrees
            raw = restore_subtrees(ckpt_path, ("params",))
            seq2seq_params = raw["params"] if "params" in raw else raw
            params = transfer_encoder_params(seq2seq_params, params)
        else:
            logger.warning(f"no IAOG checkpoint under {args.pretrained_iaog_path}; "
                           "training from scratch")

    # --- optimizer (dual LR, run_multimodal_fcmf.py:247-289) -------------
    train_ds = make_dataset("train") if args.do_train else None
    steps_per_epoch = (len(train_ds) // args.train_batch_size) if train_ds else 0
    num_train_steps = int(steps_per_epoch / args.gradient_accumulation_steps
                          * args.num_train_epochs)
    warmup = int(num_train_steps * args.warmup_proportion)
    tx = make_adamw(
        linear_warmup_schedule(args.encoder_learning_rate, warmup, num_train_steps),
        weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        head_learning_rate=linear_warmup_schedule(
            args.classifier_head_learning_rate, warmup, num_train_steps),
        accumulate_steps=args.gradient_accumulation_steps)
    if args.freeze_encoder:
        import optax
        # zero out encoder updates (run_multimodal_fcmf.py:230-236)
        def label(p):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen" if str(path[0].key) == "encoder"
                else "train", p)
        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()},
                                   label)
    state = TrainState.create(params, visual_params, tx,
                              fine_tune_cnn=args.fine_tune_cnn)

    start_epoch, best_f1 = 0, 0.0
    if args.resume_from_checkpoint and ckpt.exists(args.resume_from_checkpoint):
        state, start_epoch, best_f1 = ckpt.restore(args.resume_from_checkpoint,
                                                   state)
        logger.info(f"resumed from epoch {start_epoch}, best F1 {best_f1:.4f}")

    mesh = make_mesh(mp=args.mp)
    set_kernel_mesh(mesh)  # Pallas kernels shard_map themselves over this
    if args.mp > 1:
        from macsa_tpu.parallel.sharding import shard_state, state_shardings
        state_shard = state_shardings(state, mesh)
        place = lambda s: shard_state(s, mesh)
    else:
        state_shard = None
        place = lambda s: replicate(s, mesh)
    state = place(state)
    train_step = make_finetune_train_step(model, visual, mesh=mesh,
                                          state_sharding=state_shard)
    eval_step = make_finetune_eval_step(
        model, visual, mesh=mesh,
        param_sharding=state_shard.params if state_shard else None,
        visual_sharding=state_shard.visual_params if state_shard else None)

    # --- frozen-CNN visual feature cache (HBM) ---------------------------
    # Exact across epochs (eval-mode BN + stop_gradient); first pass over a
    # split computes + scatters, later passes gather and skip the ResNet
    # stack AND the raw-pixel host->device transfer.
    use_feature_cache = (args.cache_visual_features == "on" or
                         (args.cache_visual_features == "auto"
                          and not args.fine_tune_cnn))
    if use_feature_cache:
        from macsa_tpu.train.feature_cache import VisualFeatureCache
        extract_jit = jax.jit(lambda vp, im, ri: extract_visual(
            visual, vp, im, ri, out_dtype=cfg.model.jnp_dtype))
        caches: dict = {}
        cached_rows: dict = {}  # split -> np.bool_ [n] rows already cached

    # --- cross-stage on-disk feature cache (disk_feature_cache.py) -------
    # Content-addressed, so a finetune run reuses the pretraining run's
    # extraction of the same images (and vice versa) instead of re-decoding.
    disk_cache, split_keys = None, {}
    if use_feature_cache and args.feature_cache_dir:
        if n_hosts > 1:
            logger.warning("--feature_cache_dir is single-host only; "
                           "disabled under multi-host")
        else:
            from macsa_tpu.train.disk_feature_cache import (DiskFeatureCache,
                                                            prefill_hbm_cache,
                                                            record_key)
            disk_cache = DiskFeatureCache(args.feature_cache_dir)
            cache_fp = common.resnet_fingerprint(args.resnet_weights, rcfg,
                                                 args.seed)

    def ensure_cache(split: str, dataset) -> None:
        """Create the split's HBM cache and prefill it from disk BEFORE the
        loader starts, so epoch-0 batches whose features are already on
        disk skip host decoding entirely (needs_pixels consults
        cached_rows, which the prefill marks)."""
        if not use_feature_cache or split in caches:
            return
        n = len(dataset)
        caches[split] = VisualFeatureCache(
            n, cfg.num_imgs, cfg.num_roi, cfg.num_patches, mesh=mesh)
        cached_rows[split] = np.zeros(n, np.bool_)
        logger.info(f"visual feature cache[{split}]: "
                    f"{caches[split].nbytes / 2**20:.0f} MiB HBM")
        if disk_cache is not None:
            split_keys[split] = [
                record_key(rec.get("list_img") or [], args.image_dir,
                           roi_boxes, args.num_imgs, args.num_rois, cache_fp)
                for rec in dataset.records]
            loaded = prefill_hbm_cache(disk_cache, split_keys[split],
                                       caches[split])
            if loaded.any():
                cached_rows[split] |= loaded
                logger.info(
                    f"feature cache[{split}]: prefilled "
                    f"{int(loaded.sum())}/{n} rows from disk "
                    f"({args.feature_cache_dir})")

    def global_idx(idx: np.ndarray) -> np.ndarray:
        """This host's batch rows -> the global batch's rows (process order,
        matching `make_array_from_process_local_data`'s row layout).  Cache
        warm/cold decisions MUST be made on the global rows: the lookup and
        extract paths are different collective programs, and a host deciding
        differently from its peers would deadlock the mesh."""
        if n_hosts == 1:
            return idx
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(idx)).reshape(-1)

    def featurize(split: str, n_samples: int, batch: dict) -> dict:
        """Replace raw pixels with (possibly cached) visual features.

        Per-batch host-side warm check: drop_last drops a *different* tail
        each epoch, so a later epoch can contain rows the first pass never
        saw — those batches recompute and fill the cache."""
        if not use_feature_cache:
            batch.pop("_idx", None)
            return batch
        idx = global_idx(np.asarray(batch.pop("_idx")))
        # absent when the loader sent a light (all-rows-warm) batch
        images = batch.pop("images", None)
        roi_images = batch.pop("roi_images", None)
        cache = caches[split]
        valid = idx >= 0  # pad rows carry -1
        if cached_rows[split][idx[valid]].all():
            grid, roi = cache.lookup(idx)
        else:
            assert images is not None, (
                "cold feature-cache rows in a pixel-less batch — the "
                "loader's needs_pixels gate and cached_rows disagree")
            vis = shard_batch({"im": images, "ri": roi_images}, mesh)
            grid, roi = extract_jit(state.visual_params, vis["im"], vis["ri"])
            cache.update(idx, grid, roi)
            cached_rows[split][idx[valid]] = True
            if disk_cache is not None:
                rows = np.nonzero(valid)[0]
                keys = [split_keys[split][int(idx[r])] for r in rows]
                disk_cache.store_async(keys, grid[rows], roi[rows])
        batch["grid"], batch["roi"] = grid, roi
        return batch

    def pixels_needed(split: str):
        """Per-sample gate for the loader: pixels are required only until the
        HBM feature cache owns that row (None => always carry pixels).

        Multi-host: gating stays off for the TRAIN loader — each host
        shuffles its own shard, so it cannot evaluate its peers' rows and a
        divergent light-vs-pixels call would crash featurize.  (Eval uses
        deterministic stripes, where the loader gates on the global step
        rows — see DataLoader._stripe_batches.)"""
        if not use_feature_cache:
            return None
        return lambda i: not (split in cached_rows and cached_rows[split][i])

    def run_eval(dataset, split: str = "dev") -> dict:
        """Dev/test eval, sharded over hosts in SPMD lockstep.

        Global step s computes dataset rows [s*G, (s+1)*G), G = n_hosts *
        eval_batch_size; each host feeds its stripe and every row is computed
        exactly once on one dp shard (the reference instead evals everything
        on the master rank, run_multimodal_fcmf.py:500; round-1 macsa_tpu
        replicated the whole set on every host).  Predictions and labels
        come back via fetch_global, so every host returns the full report."""
        n = len(dataset)
        g = n_hosts * args.eval_batch_size
        ensure_cache(split, dataset)
        loader = DataLoader(dataset, args.eval_batch_size, num_workers=8,
                            cache=use_feature_cache,
                            needs_pixels=pixels_needed(split),
                            num_hosts=n_hosts, host_id=host_id,
                            eval_stripe=True)
        trues = np.zeros((n, len(ASPECTS)), np.int32)
        preds = np.zeros((n, len(ASPECTS)), np.int32)
        for s, batch in enumerate(loader):
            batch.pop("text", None)
            batch = featurize(split, n, batch)
            sb = shard_batch(batch, mesh)
            p, _ = eval_step(state.params, state.visual_params, sb)
            m = min(g, n - s * g)  # trailing rows are -1-marked clone pads
            preds[s * g:s * g + m] = fetch_global(p)[:m]
            trues[s * g:s * g + m] = fetch_global(sb["labels"])[:m]
        return aspect_report(trues, preds)

    result = {}
    if args.do_train:
        dev_ds = make_dataset("dev") if args.do_eval else None
        ensure_cache("train", train_ds)
        # per-host contiguous shard of the training data; the per-step global
        # batch (n_hosts * train_batch_size) is assembled by shard_batch
        loader = DataLoader(train_ds, args.train_batch_size, shuffle=True,
                            seed=args.seed, drop_last=True, num_workers=8,
                            cache=True, num_hosts=n_hosts, host_id=host_id,
                            needs_pixels=(pixels_needed("train")
                                          if n_hosts == 1 else None))
        key = jax.random.PRNGKey(args.seed)
        with maybe_profile(args.profile_dir):
            for epoch in range(start_epoch, args.num_train_epochs):
                loader.set_epoch(epoch)
                t0, seen = time.time(), 0
                for i, batch in enumerate(loader):
                    batch.pop("text", None)
                    batch = featurize("train", len(train_ds), batch)
                    sb = shard_batch(batch, mesh)
                    state, metrics = train_step(state, sb, key)
                    seen += args.train_batch_size
                    if (i + 1) % args.log_every == 0:
                        loss = float(metrics["loss"])
                        rate = seen / (time.time() - t0)
                        logger.info(f"epoch {epoch} step {i + 1}: "
                                    f"loss {loss:.4f}  {rate:.2f} samples/s")
                        writer.write(int(state.step), loss=loss,
                                     samples_per_s=rate, epoch=epoch)
                if args.do_eval and dev_ds is not None:
                    report = run_eval(dev_ds)
                    f1 = report["average"]["f1"]
                    logger.info(f"epoch {epoch} dev macro-F1 {f1:.4f}")
                    writer.write(int(state.step), dev_f1=f1, epoch=epoch)
                    if f1 > best_f1:
                        best_f1 = f1
                        logger.info(f"new best F1 {best_f1:.4f}; saving best")
                        ckpt.save("best", state, epoch + 1, best_f1)
                        ckpt.copy("best", "last")  # identical payload
                        continue
                ckpt.save("last", state, epoch + 1, best_f1)
        ckpt.finalize()
        result["best_dev_f1"] = best_f1

    if args.do_test:
        if ckpt.exists("best"):
            state = ckpt.restore_params_only("best", state)
            state = place(state)
        test_ds = make_dataset("test")
        ensure_cache("test", test_ds)
        loader = DataLoader(test_ds, args.eval_batch_size, num_workers=8,
                            cache=use_feature_cache,
                            needs_pixels=pixels_needed("test"))
        trues, preds, texts = [], [], []
        for batch in loader:
            texts.extend(batch.pop("text"))
            b = batch["labels"].shape[0]
            padded = pad_batch(batch, args.eval_batch_size)
            padded.pop("pad_mask")
            padded = featurize("test", len(test_ds), padded)
            sb = shard_batch(padded, mesh)
            p, _ = eval_step(state.params, state.visual_params, sb)
            preds.append(fetch_global(p)[:b])
            trues.append(batch["labels"])
        trues, preds = np.concatenate(trues), np.concatenate(preds)
        report = aspect_report(trues, preds)
        result["test"] = report

        # artifact files matching the reference (:660-694); byte format
        # pinned by tests/test_metrics.py::test_report_files_byte_format
        from macsa_tpu.train.metrics import write_test_reports
        write_test_reports(args.output_dir, report, texts, trues, preds)
        logger.info(f"test macro-F1 {report['average']['f1']:.4f}")

    if disk_cache is not None:
        disk_cache.flush()  # queued feature writes land before exit
    return result


if __name__ == "__main__":
    main()
