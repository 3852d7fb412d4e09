"""Single-sample inference CLI.

TPU-native equivalent of the reference inference entry point
(reference: inference.py:332-440): normalize the text, predict image/ROI
aspect tags, build the auxiliary tag sentence, construct visual features
online, then classify all 6 aspects -> {aspect: polarity}, written to a file
and printed.

Differences by design:
* the 6-aspect loop (inference.py:304-326) is one batched jit forward,
* checkpoints load from orbax (our training output) or directly from
  reference torch .pth files via macsa_tpu.train.torch_import (the legacy
  key-renaming fallback chain of inference.py:163-217 is inside the importer),
* ROI detection is pluggable: --yolo_weights when ultralytics is available,
  else --roi_csv precomputed boxes (PrecomputedDetector).

Run: python -m macsa_tpu.inference.cli --checkpoint ... --text "..." \
       --image_list a.png b.png

Batch serving mode (no reference equivalent — inference.py is single-sample
only): `--input_json records.json` where the file holds a list of
`{"text": ..., "image_list": [...]}` records classifies every record through
ONE jitted batched forward per chunk (`--batch_size`, last chunk padded so a
single compiled program serves the whole file) and writes JSONL predictions.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from macsa_tpu.config import ASPECTS, POLARITIES, FCMFConfig, ModelConfig, ResNetConfig


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax checkpoint dir OR reference torch .pth file")
    p.add_argument("--bundle", type=str, default=None,
                   help="AOT serving bundle dir (macsa_tpu.inference.export); "
                        "replaces --checkpoint and all architecture flags — "
                        "shapes/config come from bundle.json")
    p.add_argument("--pretrained_hf_model", type=str, required=True)
    p.add_argument("--image_model_checkpoint", type=str, default=None,
                   help="image aspect classifier (orbax dir or torch .pth)")
    p.add_argument("--roi_model_checkpoint", type=str, default=None)
    p.add_argument("--resnet_weights", type=str, default=None)
    p.add_argument("--roi_csv", type=str, default=None,
                   help="precomputed roi_data.csv for the detector")
    p.add_argument("--yolo_weights", type=str, default=None)
    p.add_argument("--text", type=str, default=None)
    p.add_argument("--image_list", type=str, nargs="*", default=[])
    p.add_argument("--input_json", type=str, default=None,
                   help="batch mode: JSON list of {text, image_list} records; "
                        "predictions written as JSONL to --output_file")
    p.add_argument("--batch_size", type=int, default=8,
                   help="records per jitted forward in --input_json mode")
    p.add_argument("--num_imgs", type=int, default=7)
    p.add_argument("--num_rois", type=int, default=4)
    p.add_argument("--eps", type=float, default=30.0)
    p.add_argument("--max_seq_length", type=int, default=170)
    p.add_argument("--output_file", type=str, default=None)
    p.add_argument("--cross_mask_mode", type=str, default="causal_quirk")
    p.add_argument("--resnet_stages", type=str, default="3,8,36,3",
                   help="ResNet stage sizes; must match the training setup")
    p.add_argument("--fused_attention", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="Pallas fused-attention kernel (same escape hatch "
                        "the training drivers expose)")
    p.add_argument("--scan_layers", type=str, default="on",
                   choices=("on", "off"),
                   help="run the text encoder as a lax.scan over layers: "
                        "~35%% smaller compiled program and ~2x faster XLA "
                        "compile at zero forward cost (measured 62.9 vs "
                        "64.0 ms/step) — unrolled train checkpoints are "
                        "stacked at load time")
    return p


def _load_fcmf_params(path: str, model, cfg, key):
    """orbax dir / torch .pth -> (FCMF params, visual params or None).

    Orbax train-state checkpoints carry the ResNet `visual_params` the
    model was trained against; serving MUST use those (not a fresh init) —
    the reference's inference loads its resnet checkpoints the same way
    (inference.py:57-139).  Partial restore still skips the optimizer
    moments (~2/3 of the payload)."""
    import jax.numpy as jnp
    if os.path.isdir(path):
        from macsa_tpu.train.checkpoints import restore_subtrees
        raw = restore_subtrees(os.path.abspath(path),
                               ("params", "visual_params"))
        if "params" in raw:
            return raw["params"], raw.get("visual_params")
        return raw, None
    from macsa_tpu.train.torch_import import (import_fcmf_classifier,
                                              load_torch_checkpoint)
    sd = load_torch_checkpoint(path)
    return import_fcmf_classifier(sd, cfg.text.num_hidden_layers), None


def main(argv: Optional[list] = None) -> dict:
    import jax
    import jax.numpy as jnp

    from macsa_tpu.data.images import roi_boxes_from_csv
    from macsa_tpu.data.vimacsa import build_aspect_views
    from macsa_tpu.inference.pipeline import (PrecomputedDetector,
                                              YoloDetector,
                                              construct_visual_features,
                                              predict_visual_tags)
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.train import common
    from macsa_tpu.utils.logging import setup_logging

    parser = build_argparser()
    args = parser.parse_args(argv)
    if (args.text is None) == (args.input_json is None):
        parser.error("exactly one of --text / --input_json is required")
    if (args.checkpoint is None) == (args.bundle is None):
        parser.error("exactly one of --checkpoint / --bundle is required")
    logger = setup_logging(None)
    common.enable_compilation_cache()

    served = image_size = None
    if args.bundle is not None:
        # AOT serving path: the StableHLO bundle replaces the model build.
        # Architecture/shape flags come from bundle.json so the host-side
        # featurization matches the exported program exactly.
        from macsa_tpu.inference.export import load_bundle
        served = load_bundle(args.bundle)
        mc = served.meta["config"]
        args.num_imgs, args.num_rois = mc["num_imgs"], mc["num_roi"]
        args.max_seq_length = mc["max_text_len"]
        num_patches = mc["num_patches"]
        image_size = served.meta.get("image_size", 224)
        if args.batch_size > served.batch_size:
            logger.warning("--batch_size %d > bundle batch %d; clamping",
                           args.batch_size, served.batch_size)
            args.batch_size = served.batch_size
        tokenizer = common.load_tokenizer(args.pretrained_hf_model)
    else:
        import dataclasses

        fused = common.resolve_fused_attention(args.fused_attention,
                                               logger=logger)
        text_cfg = common.build_text_config(args.pretrained_hf_model,
                                            "float32",
                                            fused_attention=fused)
        text_cfg = dataclasses.replace(
            text_cfg, scan_layers=args.scan_layers == "on")
        cfg = FCMFConfig(model=ModelConfig(
                             dtype="float32", fused_attention=fused.enabled,
                             fused_attention_interpret=fused.interpret),
                         text=text_cfg,
                         num_imgs=args.num_imgs, num_roi=args.num_rois,
                         max_text_len=args.max_seq_length,
                         decoder_cross_mask_mode=args.cross_mask_mode)
        num_patches = cfg.num_patches
        image_size = 224
        tokenizer = common.load_tokenizer(args.pretrained_hf_model)
        model = FCMF(cfg)
        visual = VisualFeatures(ResNetConfig(
            dtype="float32", stage_sizes=tuple(
                int(s) for s in args.resnet_stages.split(","))))

    # detector
    if args.yolo_weights:
        detector = YoloDetector(args.yolo_weights)
    elif args.roi_csv:
        detector = PrecomputedDetector(roi_boxes_from_csv(args.roi_csv))
    else:
        detector = lambda path: []  # no ROI source -> zero features
        logger.warning("no --roi_csv / --yolo_weights; ROIs will be empty")

    # visual tag classifiers (inference.py:294), shared by both modes
    taggers = None
    if args.image_model_checkpoint and args.roi_model_checkpoint:
        from macsa_tpu.models.aspect_classifier import AspectClassifier
        from macsa_tpu.tools.classifier_io import load_classifier_params
        img_clf = AspectClassifier(len(ASPECTS) - 1)  # 5 classes (no Public_area
        # in the vision label space, run_image_categories.py)
        roi_clf = AspectClassifier(len(ASPECTS) - 1)
        names = [a for a in ASPECTS if a != "Public_area"]
        ip = load_classifier_params(args.image_model_checkpoint, img_clf)
        rp = load_classifier_params(args.roi_model_checkpoint, roi_clf)
        taggers = (img_clf, ip, roi_clf, rp, names)

    def prep_record(raw_text: str, image_list: list) -> dict:
        """One record -> normalized text, tags, visual tensors, aspect views
        (inference.py:402-403, :294, :248-281)."""
        text = common.normalize_comment(raw_text)
        img_tags, roi_tags = ["empty"], ["empty"]
        if taggers and image_list:
            img_clf, ip, roi_clf, rp, names = taggers
            img_tags, roi_tags = predict_visual_tags(
                detector, img_clf, ip, roi_clf, rp, image_list, names,
                eps=args.eps)
            img_tags = img_tags or ["empty"]
            roi_tags = roi_tags or ["empty"]
        images, roi_images, roi_coors = construct_visual_features(
            detector, image_list, args.eps, args.num_rois, args.num_imgs,
            size=image_size)
        views = build_aspect_views(text, img_tags, roi_tags, tokenizer,
                                   args.max_seq_length, num_patches)
        return {"text": text, "img_tags": img_tags, "roi_tags": roi_tags,
                "images": images, "roi_images": roi_images,
                "roi_coors": roi_coors, "views": views}

    if served is None:
        # params
        key = jax.random.PRNGKey(0)
        params, ckpt_visual = _load_fcmf_params(args.checkpoint, model, cfg,
                                                key)
        if ckpt_visual is not None:
            visual_params = ckpt_visual
            if args.resnet_weights:
                logger.warning("--resnet_weights ignored: checkpoint "
                               "carries its own visual_params")
        else:
            visual_params = common.jit_init(
                visual, key, jnp.zeros((1, 1, 224, 224, 3)))
            visual_params = common.import_resnet_params(
                visual_params, args.resnet_weights, logger)
        if cfg.text.scan_layers:
            # unrolled train-checkpoint layout -> the scanned module's
            # stacked layout (no-op if already stacked)
            from macsa_tpu.models.text_encoder import stack_layer_params
            params = dict(params)
            params["encoder"] = dict(params["encoder"])
            params["encoder"]["bert"] = stack_layer_params(
                params["encoder"]["bert"], cfg.text.num_hidden_layers)

        from macsa_tpu.train.steps import fcmf_forward_all_aspects
        fwd = jax.jit(lambda p, vp, bb: fcmf_forward_all_aspects(
            model, p, visual, vp, bb, deterministic=True))

    def predict_chunk(recs: list) -> np.ndarray:
        """records (uniform chunk size) -> polarity indices [len(recs), A];
        all 6 aspects x all records in one batched forward
        (vs inference.py:304-326's per-aspect loop)."""
        batch = {
            "images": np.stack([r["images"] for r in recs]),
            "roi_images": np.stack([r["roi_images"] for r in recs]),
            "roi_coors": np.stack([r["roi_coors"] for r in recs]),
        }
        for k in ("input_ids", "token_type_ids", "attention_mask",
                  "added_mask"):
            batch[k] = np.stack([r["views"][k] for r in recs])
        if served is not None:
            return served.predict(batch).argmax(-1)
        logits = fwd(params, visual_params,
                     {k: jnp.asarray(v) for k, v in batch.items()})
        return np.asarray(jnp.argmax(logits, axis=-1))

    if args.input_json is None:  # single-sample mode
        rec = prep_record(args.text, args.image_list)
        preds = predict_chunk([rec])[0]
        result = {asp: POLARITIES[preds[i]] for i, asp in enumerate(ASPECTS)}
        print(json.dumps(result, ensure_ascii=False))
        if args.output_file:
            with open(args.output_file, "w") as f:
                json.dump({"text": args.text, "normalized": rec["text"],
                           "image_tags": rec["img_tags"],
                           "roi_tags": rec["roi_tags"],
                           "prediction": result}, f, ensure_ascii=False,
                          indent=2)
        return result

    # batch serving mode
    import time
    with open(args.input_json) as f:
        records = json.load(f)
    if not isinstance(records, list) or not records:
        raise SystemExit(f"--input_json must hold a non-empty JSON list, "
                         f"got {type(records).__name__}")
    bs = max(1, min(args.batch_size, len(records)))
    results, t0 = [], time.time()
    for lo in range(0, len(records), bs):
        chunk = records[lo:lo + bs]
        recs = [prep_record(r.get("text", ""), r.get("image_list", []))
                for r in chunk]
        n = len(recs)
        recs += [recs[-1]] * (bs - n)  # pad to the one compiled shape
        preds = predict_chunk(recs)[:n]
        for r, rec, p in zip(chunk, recs, preds):
            results.append({
                "text": r.get("text", ""), "normalized": rec["text"],
                "image_tags": rec["img_tags"], "roi_tags": rec["roi_tags"],
                "prediction": {asp: POLARITIES[p[i]]
                               for i, asp in enumerate(ASPECTS)}})
    dt = time.time() - t0
    out = args.output_file or (args.input_json + ".predictions.jsonl")
    with open(out, "w") as f:
        for r in results:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    summary = {"records": len(results), "batch_size": bs,
               "records_per_s": round(len(results) / dt, 3),
               "output_file": out}
    print(json.dumps(summary, ensure_ascii=False))
    return summary


if __name__ == "__main__":
    main()
