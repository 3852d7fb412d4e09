"""Phase-1 IAOG pretraining driver (FCMF seq2seq).

TPU-native equivalent of the reference driver
(reference: run_pretraining_fcmf.py): same flags, IAOG label preprocessing
(normalize sentiment words, :139-168), AdamW (weight decay 1e-5) + linear
warmup, CE(ignore -100) over decoder logits, periodic debug decoding
(:340-372), per-epoch checkpointing, and an eval harness with greedy/beam
generation (the reference's is commented out, :376-452 — here it is live).

Run: python -m macsa_tpu.train.pretrain --do_train ...
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np

from macsa_tpu.config import DecoderConfig, FCMFConfig, ModelConfig, ResNetConfig


def build_argparser() -> argparse.ArgumentParser:
    """Flag surface mirroring run_pretraining_fcmf.py:45-84."""
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_data_dir", type=str, required=True,
                   help="dir with train_with_iaog.json / dev_with_iaog.json")
    p.add_argument("--data_dir", type=str, default=None,
                   help="dir with roi_data.csv + label JSONs (defaults to "
                        "pretrained_data_dir)")
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--pretrained_hf_model", type=str, default="uitnlp/visobert")
    p.add_argument("--resnet_weights", type=str, default=None)
    p.add_argument("--num_imgs", type=int, default=7)
    p.add_argument("--num_rois", type=int, default=4)
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--max_seq_length", type=int, default=170)
    p.add_argument("--max_len_decoder", type=int, default=20)
    p.add_argument("--train_batch_size", type=int, default=16,
                   help="global batch (default 16, the reference's).  The "
                        "steady-state seq2seq step keeps scaling well past "
                        "it on one v5e chip — b96 measured 1.6x the b16 "
                        "throughput (docs/DESIGN.md batch sweep); batch is "
                        "a training hyperparameter, so raising it is the "
                        "user's call, not the default's")
    p.add_argument("--eval_batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--num_train_epochs", type=int, default=20)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--prng", type=str, default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="JAX PRNG impl; rbg halves dropout-mask cost on TPU")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fine_tune_cnn", action="store_true")
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--checkpoint_every", type=int, default=1,
                   help="epochs between non-best `last` saves (best "
                        "improvements always checkpoint).  1 = the "
                        "reference's per-epoch cadence "
                        "(run_pretraining_fcmf.py:454-460); larger values "
                        "cut the multi-GB per-epoch device fetch on "
                        "remote-TPU links — the final epoch always saves.")
    p.add_argument("--cross_mask_mode", type=str, default="causal_quirk",
                   choices=["causal_quirk", "padding"])
    p.add_argument("--pixel_transfer", type=str, default="packed",
                   choices=["packed", "f32"],
                   help="host->device pixel encoding (see finetune.py): "
                        "packed uint32 words (default) or the reference's "
                        "host-normalized float32")
    p.add_argument("--scan_decoder", type=str, default="on",
                   choices=["on", "off"],
                   help="run the 12 decoder blocks as one lax.scan body "
                        "(stacked params, config.py scan_blocks): ~12x "
                        "fewer ops / ~3x smaller executable at the same "
                        "step math; 'off' unrolls block_{i} modules")
    p.add_argument("--vocab_chunk", type=int, default=0,
                   help="fused chunked-vocab CE: >0 scans the weight-tied "
                        "output head in chunks of this many vocab rows "
                        "(online logsumexp; the [B,T,64001] f32 logits are "
                        "never materialized; gradient-exact).  0 (default) "
                        "keeps the full-logits loss — measured speed-"
                        "neutral at chunk 16384 on one v5e chip at b16; "
                        "use for memory-tight configs (docs/DESIGN.md).")
    p.add_argument("--use_mde", action="store_true", default=False)
    p.add_argument("--resnet_stages", type=str, default="3,8,36,3")
    p.add_argument("--mp", type=int, default=1,
                   help="tensor-parallel mesh axis size (parallel.sharding)")
    p.add_argument("--cache_visual_features", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="cache frozen-CNN visual features in HBM, keyed by "
                        "the ORIGINAL review index (IAOG samples from the "
                        "same review share images). auto = on unless "
                        "--fine_tune_cnn")
    p.add_argument("--feature_cache_dir", type=str, default=None,
                   help="cross-stage on-disk feature cache shared with the "
                        "finetune driver (train/disk_feature_cache.py; "
                        "content-addressed by image bytes + ROI boxes + "
                        "ResNet weights).  Single-host only")
    p.add_argument("--fused_attention", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas fused softmax+dropout+PV attention for the "
                        "text-encoder blocks; auto = on for TPU backends")
    p.add_argument("--beam_size", type=int, default=3)
    p.add_argument("--debug_decode_every", type=int, default=10,
                   help="decode 2 samples every N steps (reference :340-372)")
    p.add_argument("--log_every", type=int, default=10)
    return p


def preprocess_iaog_records(records, normalizer=None):
    """Normalize the sentiment-word part of each 'word#Aspect' label
    (run_pretraining_fcmf.py:139-158)."""
    from macsa_tpu.data.text_preprocess import TextNormalize
    from macsa_tpu.train.common import normalize_comment
    tn = normalizer or TextNormalize()
    for rec in records:
        labels = rec.get("iaog_labels")
        if not isinstance(labels, list):
            continue
        out = []
        for label in labels:
            if "#" not in label:
                out.append(label)
                continue
            word, aspect = label.split("#", 1)
            out.append(f"{normalize_comment(word.strip(), tn)}#{aspect.strip()}")
        rec["iaog_labels"] = out
    return records


def main(argv: Optional[list] = None) -> dict:
    import jax
    import jax.numpy as jnp

    from macsa_tpu.data.iaog import IAOGDataset
    from macsa_tpu.data.loader import DataLoader
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.models.seq2seq import FCMFSeq2Seq
    from macsa_tpu.parallel.mesh import (make_mesh,
                                         maybe_initialize_distributed,
                                         replicate, set_kernel_mesh,
                                         shard_batch)
    from macsa_tpu.train import common
    from macsa_tpu.train.checkpoints import CheckpointManager
    from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
    from macsa_tpu.train.state import TrainState
    from macsa_tpu.train.steps import extract_visual, make_pretrain_train_step
    from macsa_tpu.utils.logging import MetricWriter, setup_logging

    args = build_argparser().parse_args(argv)
    jax.config.update("jax_default_prng_impl", args.prng)
    common.enable_compilation_cache()
    data_dir = args.data_dir or args.pretrained_data_dir
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
    tokenizer = common.load_tokenizer(args.pretrained_hf_model)
    vocab_size = len(tokenizer)
    cfg = FCMFConfig(model=ModelConfig(
                         dtype=dtype, fused_attention=fused.enabled,
                         fused_attention_interpret=fused.interpret),
                     text=text_cfg,
                     num_imgs=args.num_imgs, num_roi=args.num_rois,
                     alpha=args.alpha, max_text_len=args.max_seq_length,
                     decoder_cross_mask_mode=args.cross_mask_mode,
                     use_mde=args.use_mde)
    dec_cfg = DecoderConfig(vocab_size=vocab_size,
                            hidden_size=cfg.model.hidden_size,
                            num_blocks=cfg.model.num_hidden_layers,
                            num_heads=cfg.model.num_attention_heads,
                            max_decode_len=args.max_len_decoder, dtype=dtype,
                            scan_blocks=args.scan_decoder == "on")
    rcfg = ResNetConfig(dtype=dtype, stage_sizes=tuple(
        int(s) for s in args.resnet_stages.split(",")))

    roi_boxes, dict_img, dict_roi = common.load_metadata(data_dir)

    def make_dataset(split: str) -> IAOGDataset:
        records = common.load_records(
            os.path.join(args.pretrained_data_dir, f"{split}_with_iaog.json"))
        records = preprocess_iaog_records(records)
        return IAOGDataset(records, tokenizer, args.image_dir, roi_boxes,
                           dict_img, dict_roi, num_img=args.num_imgs,
                           num_roi=args.num_rois,
                           max_text_len=args.max_seq_length,
                           max_len_decoder=args.max_len_decoder,
                           pixel_mode=args.pixel_transfer)

    model = FCMFSeq2Seq(cfg, dec_cfg)
    visual = VisualFeatures(rcfg)
    key = jax.random.PRNGKey(args.seed)
    b0, l0, t0_len = 1, args.max_seq_length, args.max_len_decoder
    dummy_images = jnp.zeros((b0, cfg.num_imgs, 224, 224, 3), jnp.float32)
    dummy_rois = jnp.zeros((b0, cfg.num_imgs, cfg.num_roi, 224, 224, 3),
                           jnp.float32)
    visual_params = common.jit_init(visual, key, dummy_images[:, :1])
    grid, roi = common.output_zeros(
        lambda vp: extract_visual(visual, vp, dummy_images, dummy_rois),
        visual_params)
    params = common.jit_init(
        model, key, jnp.ones((b0, l0), jnp.int32),
        jnp.ones((b0, t0_len), jnp.int32),
        grid, roi, jnp.zeros((b0, cfg.num_imgs, cfg.num_roi, 4), jnp.float32),
        None, jnp.ones((b0, l0), jnp.int32),
        jnp.ones((b0, l0 + cfg.num_patches), jnp.int32))["params"]

    # import HF backbone; the shared (tied) token table also comes from it
    import flax
    from macsa_tpu.models.text_encoder import load_hf_checkpoint
    from macsa_tpu.train.checkpoints import resize_embedding
    try:
        _, bert_params = load_hf_checkpoint(args.pretrained_hf_model)
        params = flax.core.unfreeze(params)
        table = bert_params["embeddings"].pop("word_embeddings")["embedding"]
        params["shared_embedding"] = resize_embedding(table, vocab_size)
        params["encoder"]["bert"] = bert_params
        logger.info("imported HF backbone weights (tied token table resized "
                    f"to {vocab_size})")
    except (FileNotFoundError, OSError) as e:
        logger.warning(f"no HF weights ({e}); random init")

    train_ds = make_dataset("train") if args.do_train else None
    steps_per_epoch = (len(train_ds) // args.train_batch_size) if train_ds else 0
    num_train_steps = int(steps_per_epoch / args.gradient_accumulation_steps
                          * args.num_train_epochs)
    tx = make_adamw(
        linear_warmup_schedule(args.learning_rate,
                               int(num_train_steps * args.warmup_proportion),
                               num_train_steps),
        weight_decay=args.weight_decay, eps=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
        accumulate_steps=args.gradient_accumulation_steps)
    state = TrainState.create(params, visual_params, tx)

    ckpt = CheckpointManager(args.output_dir)
    start_epoch, best_loss = 0, float("inf")
    if args.resume_from_checkpoint and ckpt.exists(args.resume_from_checkpoint):
        try:
            state, start_epoch, neg_best = ckpt.restore(
                args.resume_from_checkpoint, state)
        except Exception:
            other = "off" if args.scan_decoder == "on" else "on"
            logger.error(
                "checkpoint restore failed — if this checkpoint was written "
                f"with the other decoder layout, rerun with --scan_decoder "
                f"{other} (models/decoder.py stack_block_params converts "
                "layouts offline)")
            raise
        best_loss = -neg_best
        logger.info(f"resumed from epoch {start_epoch}")

    mesh = make_mesh(mp=args.mp)
    set_kernel_mesh(mesh)  # Pallas kernels shard_map themselves over this
    if args.mp > 1:
        from macsa_tpu.parallel.sharding import shard_state, state_shardings
        state_shard = state_shardings(state, mesh)
        state = shard_state(state, mesh)
    else:
        state_shard = None
        state = replicate(state, mesh)
    train_step = make_pretrain_train_step(model, visual, mesh=mesh,
                                          state_sharding=state_shard,
                                          vocab_chunk=args.vocab_chunk)

    # --- frozen-CNN visual feature cache, keyed by ORIGINAL review index
    # (IAOG expands each review into one sample per aspect — all of them
    # share the same images, so the cache dedupes across aspects too).
    use_feature_cache = (args.cache_visual_features == "on" or
                         (args.cache_visual_features == "auto"
                          and not args.fine_tune_cnn))
    if use_feature_cache:
        from macsa_tpu.train.feature_cache import VisualFeatureCache
        extract_jit = jax.jit(lambda vp, im, ri: extract_visual(
            visual, vp, im, ri, out_dtype=cfg.model.jnp_dtype))
        fc_state = {"cache": None, "seen": None, "keys": None}

    # cross-stage on-disk feature cache (shared with finetune — the same
    # content-addressed keys, so Phase 2 reuses Phase 1's extraction)
    disk_cache = None
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

    def ensure_cache(records) -> None:
        """Create the HBM cache (keyed by ORIGINAL review index) and prefill
        it from disk BEFORE the loader starts, so already-extracted reviews
        skip host decoding from step 0."""
        if not use_feature_cache or fc_state["cache"] is not None:
            return
        n_records = len(records)
        fc_state["cache"] = VisualFeatureCache(
            n_records, cfg.num_imgs, cfg.num_roi, cfg.num_patches, mesh=mesh)
        fc_state["seen"] = np.zeros(n_records, np.bool_)
        logger.info(f"visual feature cache: "
                    f"{fc_state['cache'].nbytes / 2**20:.0f} MiB HBM")
        if disk_cache is not None:
            fc_state["keys"] = [
                record_key(rec.get("list_img") or [], args.image_dir,
                           roi_boxes, args.num_imgs, args.num_rois, cache_fp)
                for rec in records]
            loaded = prefill_hbm_cache(disk_cache, fc_state["keys"],
                                       fc_state["cache"])
            if loaded.any():
                fc_state["seen"] |= loaded
                logger.info(f"feature cache: prefilled "
                            f"{int(loaded.sum())}/{n_records} reviews from "
                            f"disk ({args.feature_cache_dir})")

    def featurize(n_records: int, batch: dict) -> dict:
        if not use_feature_cache:
            batch.pop("orig_idx", None)
            return batch
        idx = np.asarray(batch.pop("orig_idx"))
        if n_hosts > 1:
            # warm/cold is decided on the GLOBAL batch rows: lookup and
            # extract are different collective programs, and a host deciding
            # differently from its peers would deadlock the mesh
            from jax.experimental import multihost_utils
            idx = np.asarray(multihost_utils.process_allgather(idx)).reshape(-1)
        # absent when the loader sent a light (all-rows-warm) batch
        images = batch.pop("images", None)
        roi_images = batch.pop("roi_images", None)
        valid = idx >= 0
        if fc_state["seen"][idx[valid]].all():
            grid, roi = fc_state["cache"].lookup(idx)
        else:
            assert images is not None, (
                "cold feature-cache rows in a pixel-less batch — the "
                "loader's needs_pixels gate and seen-rows disagree")
            vis = shard_batch({"im": images, "ri": roi_images}, mesh)
            grid, roi = extract_jit(state.visual_params, vis["im"], vis["ri"])
            fc_state["cache"].update(idx, grid, roi)
            fc_state["seen"][idx[valid]] = True
            if disk_cache is not None:
                rows = np.nonzero(valid)[0]
                keys = [fc_state["keys"][int(idx[r])] for r in rows]
                disk_cache.store_async(keys, grid[rows], roi[rows])
        batch["grid"], batch["roi"] = grid, roi
        return batch

    # In-training debug decoding (run_pretraining_fcmf.py:340-372): every N
    # steps, greedy-decode 2 samples and log prediction vs label.
    bos_id = tokenizer.bos_token_id or tokenizer.cls_token_id or 0
    eos_id = tokenizer.eos_token_id or tokenizer.sep_token_id or 2

    @jax.jit
    def _debug_decode(params, visual_params, batch2):
        if "grid" in batch2:
            grid = batch2["grid"].astype(cfg.model.jnp_dtype)
            roi = batch2["roi"].astype(cfg.model.jnp_dtype)
        else:
            grid, roi = extract_visual(visual, visual_params, batch2["images"],
                                       batch2["roi_images"],
                                       out_dtype=cfg.model.jnp_dtype)
        return model.apply(
            {"params": params}, batch2["enc_input_ids"], grid, roi,
            batch2["roi_coors"], bos_id, eos_id,
            None, batch2["attention_mask"], batch2["added_mask"],
            args.max_len_decoder, method=FCMFSeq2Seq.greedy_decode)

    def debug_decode(batch, texts):
        two = {k: v[:2] for k, v in batch.items()}
        seqs = np.asarray(_debug_decode(state.params, state.visual_params, two))
        for j in range(min(2, seqs.shape[0])):
            pred = tokenizer.decode([t for t in seqs[j] if t != eos_id],
                                    skip_special_tokens=True)
            label_ids = [t for t in np.asarray(batch["dec_input_ids"][j])
                         if t != tokenizer.pad_token_id]
            label = tokenizer.decode(label_ids, skip_special_tokens=True)
            src = texts[j][:60] if texts else ""
            logger.info(f"  [debug] src='{src}' pred='{pred}' label='{label}'")

    result = {}
    if args.do_train:
        # pixels required only until the feature cache owns the sample's
        # ORIGINAL review row (aspect-expanded samples share images).
        # Multi-host keeps the gate off: each host shuffles its own shard,
        # so it cannot evaluate its peers' rows and a divergent
        # light-vs-pixels call would crash featurize.
        ensure_cache(train_ds.records)
        needs_pixels = None
        if use_feature_cache and n_hosts == 1:
            needs_pixels = lambda i: (  # noqa: E731
                fc_state["seen"] is None
                or not fc_state["seen"][train_ds.samples[i]["original_idx"]])
        loader = DataLoader(train_ds, args.train_batch_size, shuffle=True,
                            seed=args.seed, drop_last=True, num_workers=8,
                            cache=True, num_hosts=n_hosts, host_id=host_id,
                            needs_pixels=needs_pixels)
        dev_ds = make_dataset("dev") if args.do_eval else None
        key = jax.random.PRNGKey(args.seed)
        for epoch in range(start_epoch, args.num_train_epochs):
            loader.set_epoch(epoch)
            t0, seen, ep_loss, n = time.time(), 0, 0.0, 0
            for i, batch in enumerate(loader):
                texts = batch.pop("text", None)
                batch.pop("_idx", None)
                batch.pop("target_aspect", None)
                batch = featurize(len(train_ds.records), batch)
                sb = shard_batch(batch, mesh)
                state, metrics = train_step(state, sb, key)
                seen += args.train_batch_size
                ep_loss += float(metrics["loss"]); n += 1
                if (i + 1) % args.log_every == 0:
                    rate = seen / (time.time() - t0)
                    logger.info(f"epoch {epoch} step {i + 1}: "
                                f"loss {float(metrics['loss']):.4f} "
                                f"tok-acc {float(metrics['token_accuracy']):.3f} "
                                f"{rate:.2f} samples/s")
                    writer.write(int(state.step), loss=float(metrics["loss"]),
                                 token_accuracy=float(metrics["token_accuracy"]),
                                 samples_per_s=rate, epoch=epoch)
                if args.debug_decode_every and \
                        (i + 1) % args.debug_decode_every == 0:
                    debug_decode(batch, texts)
            mean_loss = ep_loss / max(n, 1)
            logger.info(f"epoch {epoch} mean loss {mean_loss:.4f} ({n} steps)")
            if n > 0 and mean_loss < best_loss:
                best_loss = mean_loss
                ckpt.save("best", state, epoch + 1, -best_loss)
                ckpt.copy("best", "last")  # identical payload, no re-fetch
            elif ((epoch + 1 - start_epoch) % max(args.checkpoint_every, 1)
                  == 0 or epoch == int(args.num_train_epochs) - 1):
                ckpt.save("last", state, epoch + 1, -best_loss)
        ckpt.finalize()
        result["best_train_loss"] = best_loss
        if disk_cache is not None:
            disk_cache.flush()  # queued feature writes land before exit

    if args.do_eval:
        from macsa_tpu.train.generation import evaluate_generation
        dev_ds = make_dataset("dev")
        gen = evaluate_generation(model, state, visual, dev_ds, tokenizer,
                                  args.eval_batch_size, mesh,
                                  beam_size=args.beam_size,
                                  max_len=args.max_len_decoder, logger=logger)
        result["generation"] = gen
        logger.info(f"dev generation: {gen}")

    return result


if __name__ == "__main__":
    main()
