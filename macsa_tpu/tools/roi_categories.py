"""Offline ROI -> aspect-category labeler (trainer + exporter).

TPU-native equivalent of the reference tool
(reference: image_processing/run_roi_categories.py): a single-label
ResNet-152+Linear classifier over ROI crops trained with CE, an image-level
leak-free train/dev/test split (:90-115 — all ROIs of an image stay in one
split), and `--get_cate` exporting the deduplicated per-image tag sets as
`resnet152_roi_label.json` (:291-338).

Label input: a CSV with columns `file_name, x1, x2, y1, y2, label` (the
roi_data.csv layout plus a label column).

Run: python -m macsa_tpu.tools.roi_categories --do_train \
       --roi_label_path roi_labels.csv --image_dir imgs/ --output_dir out/
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from macsa_tpu.tools.image_categories import DEFAULT_CLASSES


def load_roi_table(path: str) -> List[dict]:
    rows = []
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        for row in reader:
            rows.append({"file_name": row[0],
                         "box": tuple(float(v) for v in row[1:5]),
                         "label": row[5] if len(row) > 5 else None})
    return rows


def image_level_split(rows: List[dict], seed: int = 18):
    """70/15/15 split on unique images so no ROI leaks across splits
    (run_roi_categories.py:90-115)."""
    names = sorted({r["file_name"] for r in rows})
    rng = np.random.default_rng(seed)
    rng.shuffle(names)
    n = len(names)
    train_n = int(n * 0.7)
    dev_n = int(n * 0.15)
    train = set(names[:train_n])
    dev = set(names[train_n:train_n + dev_n])
    pick = lambda s: [r for r in rows if r["file_name"] in s]
    test = set(names[train_n + dev_n:])
    return pick(train), pick(dev), pick(test)


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--roi_label_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--classes", type=str, nargs="*", default=DEFAULT_CLASSES)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--num_train_epochs", type=int, default=5)
    p.add_argument("--max_rois_per_image", type=int, default=6)
    p.add_argument("--seed", type=int, default=18)
    p.add_argument("--resnet_weights", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--get_cate", action="store_true")
    return p


def _load_crops(rows: List[dict], image_dir: str) -> np.ndarray:
    from macsa_tpu.data.images import crop_roi, decode_image, resize_normalize
    out = np.zeros((len(rows), 224, 224, 3), np.float32)
    cache: Dict[str, np.ndarray] = {}
    for i, r in enumerate(rows):
        name = r["file_name"]
        if name not in cache:
            suffixed = name if os.path.splitext(name)[1] else name + ".png"
            cache[name] = decode_image(os.path.join(image_dir, suffixed))
        raw = cache[name]
        if raw is None:
            continue
        crop = crop_roi(raw, r["box"])
        if crop is not None:
            out[i] = resize_normalize(crop)
    return out


def main(argv: Optional[list] = None):
    import jax
    import jax.numpy as jnp
    import optax

    from macsa_tpu.models.aspect_classifier import AspectClassifier
    from macsa_tpu.tools.classifier_io import (load_classifier_params,
                                               save_classifier_params)
    from macsa_tpu.train.common import import_resnet_params
    from macsa_tpu.utils.logging import setup_logging

    args = build_argparser().parse_args(argv)
    logger = setup_logging(args.output_dir)
    classes = list(args.classes)
    cls_to_id = {c: i for i, c in enumerate(classes)}
    model = AspectClassifier(len(classes))
    key = jax.random.PRNGKey(args.seed)

    if args.do_train:
        rows = [r for r in load_roi_table(args.roi_label_path)
                if r["label"] in cls_to_id]
        train, dev, test = image_level_split(rows, args.seed)
        logger.info(f"train/dev/test ROIs: {len(train)}/{len(dev)}/{len(test)}")

        from macsa_tpu.train.common import jit_init
        params = jit_init(model, key, jnp.zeros((1, 224, 224, 3)))
        base = import_resnet_params({"params": {}}, args.resnet_weights, logger)
        if base.get("params"):
            import flax
            params = flax.core.unfreeze(params)
            params["params"]["backbone"] = base["params"]["backbone"]
        tx = optax.adam(args.learning_rate)
        p = params["params"]
        opt_state = tx.init(p)

        @jax.jit
        def train_step(p, opt_state, images, labels):
            def loss_fn(pp):
                logits = model.apply({"params": pp}, images)
                logp = jax.nn.log_softmax(logits)
                return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        rng = np.random.default_rng(args.seed)
        best_acc, loss = 0.0, 0.0
        for epoch in range(args.num_train_epochs):
            rng.shuffle(train)
            for i in range(0, len(train) - args.batch_size + 1, args.batch_size):
                chunk = train[i:i + args.batch_size]
                images = _load_crops(chunk, args.image_dir)
                labels = np.asarray([cls_to_id[r["label"]] for r in chunk],
                                    np.int32)
                p, opt_state, loss = train_step(p, opt_state,
                                                jnp.asarray(images),
                                                jnp.asarray(labels))
            # per-class accuracy (confusion-style report, :197-220)
            correct = np.zeros(len(classes)); total = np.zeros(len(classes))
            for i in range(0, len(dev), args.batch_size):
                chunk = dev[i:i + args.batch_size]
                images = _load_crops(chunk, args.image_dir)
                labels = np.asarray([cls_to_id[r["label"]] for r in chunk])
                preds = np.asarray(model.apply({"params": p},
                                               jnp.asarray(images)).argmax(-1))
                for c in range(len(classes)):
                    m = labels == c
                    total[c] += m.sum()
                    correct[c] += (preds[m] == c).sum()
            acc = correct.sum() / max(total.sum(), 1)
            per_class = {classes[c]: f"{correct[c] / max(total[c], 1):.3f}"
                         for c in range(len(classes))}
            logger.info(f"epoch {epoch}: loss {float(loss):.4f} dev acc "
                        f"{acc:.4f} per-class {per_class}")
            if acc >= best_acc:
                best_acc = acc
                save_classifier_params(os.path.join(args.output_dir,
                                                    "roi_classifier_best"),
                                       {"params": p})

    if args.get_cate:
        ckpt = args.checkpoint or os.path.join(args.output_dir,
                                               "roi_classifier_best")
        params = load_classifier_params(ckpt, model)
        rows = load_roi_table(args.roi_label_path)
        by_image: Dict[str, List[dict]] = {}
        for r in rows:
            by_image.setdefault(r["file_name"], []).append(r)
        result: Dict[str, List[str]] = {}
        for name, img_rows in by_image.items():
            img_rows = img_rows[:args.max_rois_per_image]
            crops = _load_crops(img_rows, args.image_dir)
            preds = np.asarray(model.apply(params, jnp.asarray(crops)).argmax(-1))
            suffixed = name if os.path.splitext(name)[1] else name + ".png"
            result[suffixed] = sorted({classes[c] for c in preds})
        out_path = os.path.join(args.output_dir, "resnet152_roi_label.json")
        with open(out_path, "w") as f:
            json.dump(result, f, ensure_ascii=False)
        logger.info(f"wrote {out_path} with {len(result)} entries")


if __name__ == "__main__":
    main()
