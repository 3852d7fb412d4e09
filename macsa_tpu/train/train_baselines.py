"""Unified baseline trainer: mRoBERTa / TomBERT / EF-CapTrRoBERTa.

TPU-native equivalent of the three reference baseline trainers
(reference: mROBERTa/train_mroberta_vimacsa_full.py,
tomROBERTa/train_tomroberta_vimacsa_full.py,
EF-CapTrRoBERTa/train_ef_captr_roberta.py): each mirrors the FCMF driver's
loop (AdamW + linear warmup, per-epoch dev macro-F1, best/last checkpoints,
test report + formatted prediction dump).  One driver, `--model` selects the
architecture and dataset builder.

Run: python -m macsa_tpu.train.train_baselines --model mroberta --do_train ...
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np



def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, required=True,
                   choices=["mroberta", "tomroberta", "efcap"])
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--image_dir", type=str, default=None)
    p.add_argument("--caption_file", type=str, default=None,
                   help="visual captions JSON (efcap)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--pretrained_hf_model", type=str, default="uitnlp/visobert")
    p.add_argument("--resnet_weights", type=str, default=None)
    p.add_argument("--num_imgs", type=int, default=7)
    p.add_argument("--num_rois", type=int, default=7)
    p.add_argument("--max_seq_length", type=int, default=170)
    p.add_argument("--max_cap_length", type=int, default=256)
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--eval_batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--num_train_epochs", type=int, default=12)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--prng", type=str, default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="JAX PRNG impl; rbg halves dropout-mask cost on TPU")
    p.add_argument("--fused_attention", type=str, default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_test", action="store_true")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--log_every", type=int, default=20)
    return p


def main(argv: Optional[list] = None) -> dict:
    import jax
    import jax.numpy as jnp

    from macsa_tpu.data.baselines import (EFCapDataset, MRoBERTaDataset,
                                          TomBERTDataset)
    from macsa_tpu.data.loader import DataLoader, pad_batch
    from macsa_tpu.models.baselines import EFCapTrRoBERTa, MRoBERTa, TomBERT
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.config import ResNetConfig
    from macsa_tpu.parallel.mesh import (fetch_global, make_mesh,
                                         maybe_initialize_distributed,
                                         replicate, set_kernel_mesh,
                                         shard_batch)
    from macsa_tpu.train import common
    from macsa_tpu.train.baseline_steps import (make_baseline_eval_step,
                                                make_baseline_train_step)
    from macsa_tpu.train.checkpoints import CheckpointManager
    from macsa_tpu.train.metrics import aspect_report
    from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
    from macsa_tpu.train.state import TrainState
    from macsa_tpu.train.steps import extract_visual
    from macsa_tpu.utils.logging import MetricWriter, setup_logging

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
    text_cfg = common.build_text_config(
        args.pretrained_hf_model, dtype,
        fused_attention=common.resolve_fused_attention(args.fused_attention,
                                                       logger=logger))
    tokenizer = common.load_tokenizer(args.pretrained_hf_model)

    uses_visual = args.model in ("mroberta", "tomroberta")
    if uses_visual:
        roi_boxes, _, _ = common.load_metadata(args.data_dir) \
            if os.path.exists(os.path.join(args.data_dir,
                                           "resnet152_image_label.json")) \
            else (None, None, None)
        if roi_boxes is None:
            from macsa_tpu.data.images import roi_boxes_from_csv
            roi_boxes = roi_boxes_from_csv(
                os.path.join(args.data_dir, "roi_data.csv"))
    caption_dict = {}
    if args.model == "efcap" and args.caption_file:
        import json
        with open(args.caption_file) as f:
            caption_dict = json.load(f)

    def make_dataset(split: str):
        records = common.load_records(os.path.join(args.data_dir, f"{split}.json"))
        if args.model == "mroberta":
            return MRoBERTaDataset(records, tokenizer, args.image_dir, roi_boxes,
                                   num_img=args.num_imgs, num_roi=args.num_rois,
                                   max_len=args.max_seq_length)
        if args.model == "tomroberta":
            return TomBERTDataset(records, tokenizer, args.image_dir, roi_boxes,
                                  num_img=args.num_imgs, num_roi=args.num_rois,
                                  sentence_len=args.max_seq_length)
        return EFCapDataset(records, tokenizer, caption_dict,
                            num_img=args.num_imgs, max_len=args.max_cap_length)

    # --- model ----------------------------------------------------------
    if args.model == "mroberta":
        model = MRoBERTa(text_cfg)
    elif args.model == "tomroberta":
        model = TomBERT(text_cfg)
    else:
        model = EFCapTrRoBERTa(text_cfg)
    visual = VisualFeatures(ResNetConfig(dtype=dtype)) \
        if uses_visual else None

    key = jax.random.PRNGKey(args.seed)
    b0, l0 = 1, args.max_seq_length
    if uses_visual:
        dummy_img = jnp.zeros((b0, args.num_imgs, 224, 224, 3), jnp.float32)
        dummy_roi = jnp.zeros((b0, args.num_imgs, args.num_rois, 224, 224, 3),
                              jnp.float32)
        visual_params = common.jit_init(visual, key, dummy_img[:, :1])
        visual_params = common.import_resnet_params(visual_params,
                                                    args.resnet_weights, logger)
        grid, roi = common.output_zeros(
            lambda vp: extract_visual(visual, vp, dummy_img, dummy_roi),
            visual_params)
        if args.model == "mroberta":
            params = common.jit_init(
                model, key, jnp.ones((b0, l0), jnp.int32),
                jnp.ones((b0, l0), jnp.int32), grid, roi)["params"]
        else:
            params = common.jit_init(
                model, key, jnp.ones((b0, 16), jnp.int32),
                jnp.ones((b0, 16), jnp.int32),
                jnp.ones((b0, l0), jnp.int32),
                jnp.ones((b0, l0), jnp.int32), grid, roi)["params"]
    else:
        visual_params = {}
        l0 = args.max_cap_length
        params = common.jit_init(model, key, jnp.ones((b0, l0), jnp.int32),
                                 jnp.ones((b0, l0), jnp.int32))["params"]

    # import HF backbone into the 'roberta' subtree
    import flax
    from macsa_tpu.models.text_encoder import load_hf_checkpoint
    try:
        _, bert_params = load_hf_checkpoint(args.pretrained_hf_model)
        params = flax.core.unfreeze(params)
        params["roberta"] = bert_params
        logger.info("imported HF backbone weights")
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
        weight_decay=args.weight_decay, max_grad_norm=args.max_grad_norm,
        accumulate_steps=args.gradient_accumulation_steps)
    state = TrainState.create(params, visual_params, tx)

    ckpt = CheckpointManager(args.output_dir)
    start_epoch, best_f1 = 0, 0.0
    if args.resume_from_checkpoint and ckpt.exists(args.resume_from_checkpoint):
        state, start_epoch, best_f1 = ckpt.restore(args.resume_from_checkpoint, state)

    mesh = make_mesh()
    set_kernel_mesh(mesh)  # Pallas kernels shard_map themselves over this
    state = replicate(state, mesh)
    train_step = make_baseline_train_step(model, visual, mesh=mesh)
    eval_step = make_baseline_eval_step(model, visual, mesh=mesh)

    def run_eval(dataset):
        loader = DataLoader(dataset, args.eval_batch_size, num_workers=8)
        trues, preds, texts = [], [], []
        for batch in loader:
            texts.extend(batch.pop("text", []))
            batch.pop("_idx", None)
            b = batch["labels"].shape[0]
            padded = pad_batch(batch, args.eval_batch_size)
            padded.pop("pad_mask")
            sb = shard_batch(padded, mesh)
            p, _ = eval_step(state.params, state.visual_params, sb)
            preds.append(fetch_global(p)[:b])
            trues.append(batch["labels"])
        return np.concatenate(trues), np.concatenate(preds), texts

    result = {}
    if args.do_train:
        dev_ds = make_dataset("dev") if args.do_eval else None
        loader = DataLoader(train_ds, args.train_batch_size, shuffle=True,
                            seed=args.seed, drop_last=True, num_workers=8,
                            cache=True, num_hosts=n_hosts, host_id=host_id)
        key = jax.random.PRNGKey(args.seed)
        for epoch in range(start_epoch, args.num_train_epochs):
            loader.set_epoch(epoch)
            t0, seen = time.time(), 0
            for i, batch in enumerate(loader):
                batch.pop("text", None)
                batch.pop("_idx", None)
                sb = shard_batch(batch, mesh)
                state, metrics = train_step(state, sb, key)
                seen += args.train_batch_size
                if (i + 1) % args.log_every == 0:
                    rate = seen / (time.time() - t0)
                    logger.info(f"epoch {epoch} step {i + 1}: loss "
                                f"{float(metrics['loss']):.4f}  {rate:.2f} samples/s")
                    writer.write(int(state.step), loss=float(metrics["loss"]),
                                 samples_per_s=rate, epoch=epoch)
            if args.do_eval and dev_ds is not None:
                trues, preds, _ = run_eval(dev_ds)
                f1 = aspect_report(trues, preds)["average"]["f1"]
                logger.info(f"epoch {epoch} dev macro-F1 {f1:.4f}")
                writer.write(int(state.step), dev_f1=f1, epoch=epoch)
                if f1 > best_f1:
                    best_f1 = f1
                    ckpt.save("best", state, epoch + 1, best_f1)
                    ckpt.copy("best", "last")  # identical payload
                    continue
            ckpt.save("last", state, epoch + 1, best_f1)
        ckpt.finalize()
        result["best_dev_f1"] = best_f1

    if args.do_test:
        if ckpt.exists("best"):
            state = ckpt.restore_params_only("best", state)
            state = replicate(state, mesh)
        trues, preds, texts = run_eval(make_dataset("test"))
        report = aspect_report(trues, preds)
        result["test"] = report
        from macsa_tpu.train.metrics import write_test_reports
        write_test_reports(args.output_dir, report, texts, trues, preds,
                           results_filename=f"test_results_{args.model}.txt")
        logger.info(f"test macro-F1 {report['average']['f1']:.4f}")
    return result


if __name__ == "__main__":
    main()
