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
    p.add_argument("--checkpoint", type=str, required=True,
                   help="orbax checkpoint dir OR reference torch .pth file")
    p.add_argument("--pretrained_hf_model", type=str, required=True)
    p.add_argument("--image_model_checkpoint", type=str, default=None,
                   help="image aspect classifier (orbax dir or torch .pth)")
    p.add_argument("--roi_model_checkpoint", type=str, default=None)
    p.add_argument("--resnet_weights", type=str, default=None)
    p.add_argument("--roi_csv", type=str, default=None,
                   help="precomputed roi_data.csv for the detector")
    p.add_argument("--yolo_weights", type=str, default=None)
    p.add_argument("--text", type=str, required=True)
    p.add_argument("--image_list", type=str, nargs="*", default=[])
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
    return p


def _load_fcmf_params(path: str, model, cfg, key):
    """orbax dir / torch .pth -> FCMF params."""
    import jax.numpy as jnp
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        return raw["params"] if "params" in raw else raw
    from macsa_tpu.train.torch_import import (import_fcmf_classifier,
                                              load_torch_checkpoint)
    sd = load_torch_checkpoint(path)
    return import_fcmf_classifier(sd, cfg.text.num_hidden_layers)


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
    from macsa_tpu.train.steps import extract_visual
    from macsa_tpu.utils.logging import setup_logging

    args = build_argparser().parse_args(argv)
    logger = setup_logging(None)
    common.enable_compilation_cache()

    fused = common.resolve_fused_attention(args.fused_attention, logger=logger)
    text_cfg = common.build_text_config(args.pretrained_hf_model, "float32",
                                        fused_attention=fused)
    cfg = FCMFConfig(model=ModelConfig(
                         dtype="float32", fused_attention=fused.enabled,
                         fused_attention_interpret=fused.interpret),
                     text=text_cfg,
                     num_imgs=args.num_imgs, num_roi=args.num_rois,
                     max_text_len=args.max_seq_length,
                     decoder_cross_mask_mode=args.cross_mask_mode)
    tokenizer = common.load_tokenizer(args.pretrained_hf_model)
    model = FCMF(cfg)
    visual = VisualFeatures(ResNetConfig(dtype="float32", stage_sizes=tuple(
        int(s) for s in args.resnet_stages.split(","))))

    # detector
    if args.yolo_weights:
        detector = YoloDetector(args.yolo_weights)
    elif args.roi_csv:
        detector = PrecomputedDetector(roi_boxes_from_csv(args.roi_csv))
    else:
        detector = lambda path: []  # no ROI source -> zero features
        logger.warning("no --roi_csv / --yolo_weights; ROIs will be empty")

    # 1. text normalization (inference.py:402-403)
    text = common.normalize_comment(args.text)

    # 2. visual aspect tags (inference.py:294)
    img_tags, roi_tags = ["empty"], ["empty"]
    if args.image_model_checkpoint and args.roi_model_checkpoint and args.image_list:
        from macsa_tpu.models.aspect_classifier import AspectClassifier
        from macsa_tpu.tools.classifier_io import load_classifier_params
        img_clf = AspectClassifier(len(ASPECTS) - 1)  # 5 classes (no Public_area
        # in the vision label space, run_image_categories.py)
        roi_clf = AspectClassifier(len(ASPECTS) - 1)
        names = [a for a in ASPECTS if a != "Public_area"]
        ip = load_classifier_params(args.image_model_checkpoint, img_clf)
        rp = load_classifier_params(args.roi_model_checkpoint, roi_clf)
        img_tags, roi_tags = predict_visual_tags(
            detector, img_clf, ip, roi_clf, rp, args.image_list, names,
            eps=args.eps)
        img_tags = img_tags or ["empty"]
        roi_tags = roi_tags or ["empty"]

    # 3. online visual features (inference.py:248-281)
    images, roi_images, roi_coors = construct_visual_features(
        detector, args.image_list, args.eps, args.num_rois, args.num_imgs)

    # 4. params
    key = jax.random.PRNGKey(0)
    visual_params = visual.init(key, jnp.zeros((1, 1, 224, 224, 3)))
    visual_params = common.import_resnet_params(visual_params,
                                                args.resnet_weights, logger)
    grid, roi = extract_visual(visual, visual_params, jnp.asarray(images)[None],
                               jnp.asarray(roi_images)[None])
    params = _load_fcmf_params(args.checkpoint, model, cfg, key)

    # 5. all 6 aspects in one batched forward (vs inference.py:304-326 loop)
    views = build_aspect_views(text, img_tags, roi_tags, tokenizer,
                               args.max_seq_length, cfg.num_patches)
    a = len(ASPECTS)
    logits = model.apply(
        {"params": params},
        jnp.asarray(views["input_ids"]),
        jnp.repeat(grid, a, axis=0),
        jnp.repeat(roi, a, axis=0),
        jnp.repeat(jnp.asarray(roi_coors)[None], a, axis=0),
        jnp.asarray(views["token_type_ids"]),
        jnp.asarray(views["attention_mask"]),
        jnp.asarray(views["added_mask"]))
    preds = np.asarray(jnp.argmax(logits, axis=-1))
    result = {asp: POLARITIES[preds[i]] for i, asp in enumerate(ASPECTS)}

    print(json.dumps(result, ensure_ascii=False))
    if args.output_file:
        with open(args.output_file, "w") as f:
            json.dump({"text": args.text, "normalized": text,
                       "image_tags": img_tags, "roi_tags": roi_tags,
                       "prediction": result}, f, ensure_ascii=False, indent=2)
    return result


if __name__ == "__main__":
    main()
