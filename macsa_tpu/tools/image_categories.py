"""Offline image -> aspect-category labeler (trainer + exporter).

TPU-native equivalent of the reference tool
(reference: image_processing/run_image_categories.py): trains a multi-label
ResNet-152+Linear classifier with BCE (sigmoid thresholds 0.45 train-eval /
0.45 export), and `--get_cate` batch-infers every image under --image_dir and
writes `resnet152_image_label.json` (:314-356) — a hard prerequisite of every
FCMF run.

Label input: a CSV with columns `file_name, <class_0>, ..., <class_k>`
(0/1 per class — the reference reads the same table from xlsx) or a JSON
{file_name: [class names]}.

Run: python -m macsa_tpu.tools.image_categories --do_train \
       --image_label_path labels.csv --image_dir imgs/ --output_dir out/
     python -m macsa_tpu.tools.image_categories --get_cate ...
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

# the reference's vision-label class space (5 classes; no Public_area)
DEFAULT_CLASSES = ["Location", "Food", "Room", "Facilities", "Service"]


def load_label_table(path: str, classes: List[str]) -> List[Tuple[str, np.ndarray]]:
    if path.endswith(".json"):
        with open(path) as f:
            table = json.load(f)
        out = []
        for name, tags in table.items():
            vec = np.asarray([1 if c in tags else 0 for c in classes], np.float32)
            out.append((name, vec))
        return out
    import csv
    out = []
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        cols = header[1:]
        for row in reader:
            by_name = dict(zip(cols, row[1:]))
            vec = np.asarray([float(by_name.get(c, 0) or 0) for c in classes],
                             np.float32)
            out.append((row[0], vec))
    return out


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--image_label_path", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--classes", type=str, nargs="*", default=DEFAULT_CLASSES)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--num_train_epochs", type=int, default=5)
    p.add_argument("--threshold", type=float, default=0.45)
    p.add_argument("--seed", type=int, default=18)
    p.add_argument("--resnet_weights", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="classifier checkpoint for --get_cate")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--get_cate", action="store_true")
    return p


def _load_images(paths: List[str], image_dir: str) -> np.ndarray:
    from macsa_tpu.data.images import decode_image, resize_normalize
    out = np.zeros((len(paths), 224, 224, 3), np.float32)
    for i, name in enumerate(paths):
        raw = decode_image(os.path.join(image_dir, name))
        if raw is not None:
            out[i] = resize_normalize(raw)
    return out


def sigmoid_bce(logits, labels):
    import jax.numpy as jnp
    import jax
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    return -(labels * logp + (1 - labels) * lognp).mean()


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
    model = AspectClassifier(len(classes))
    key = jax.random.PRNGKey(args.seed)

    if args.do_train:
        table = load_label_table(args.image_label_path, classes)
        rng = np.random.default_rng(args.seed)
        order = rng.permutation(len(table))
        split = int(len(table) * 0.85)
        train, dev = [table[i] for i in order[:split]], [table[i] for i in order[split:]]

        from macsa_tpu.train.common import jit_init
        params = jit_init(model, key, jnp.zeros((1, 224, 224, 3)))
        base = import_resnet_params({"params": {}}, args.resnet_weights, logger)
        if base.get("params"):
            import flax
            params = flax.core.unfreeze(params)
            params["params"]["backbone"] = base["params"]["backbone"]
        tx = optax.adam(args.learning_rate)
        opt_state = tx.init(params["params"])

        @jax.jit
        def train_step(params_tree, opt_state, images, labels):
            def loss_fn(p):
                logits = model.apply({"params": p}, images)
                return sigmoid_bce(logits, labels)
            loss, grads = jax.value_and_grad(loss_fn)(params_tree)
            updates, opt_state = tx.update(grads, opt_state, params_tree)
            return optax.apply_updates(params_tree, updates), opt_state, loss

        p = params["params"]
        best_acc = 0.0
        for epoch in range(args.num_train_epochs):
            rng.shuffle(train)
            for i in range(0, len(train) - args.batch_size + 1, args.batch_size):
                chunk = train[i:i + args.batch_size]
                images = _load_images([c[0] for c in chunk], args.image_dir)
                labels = np.stack([c[1] for c in chunk])
                p, opt_state, loss = train_step(p, opt_state,
                                                jnp.asarray(images),
                                                jnp.asarray(labels))
            # dev accuracy at threshold (reference best-acc selection, :191-224)
            correct = total = 0
            for i in range(0, len(dev), args.batch_size):
                chunk = dev[i:i + args.batch_size]
                images = _load_images([c[0] for c in chunk], args.image_dir)
                labels = np.stack([c[1] for c in chunk])
                logits = model.apply({"params": p}, jnp.asarray(images))
                preds = np.asarray(jax.nn.sigmoid(logits)) > args.threshold
                correct += (preds == labels.astype(bool)).sum()
                total += labels.size
            acc = correct / max(total, 1)
            logger.info(f"epoch {epoch}: loss {float(loss):.4f} dev acc {acc:.4f}")
            if acc >= best_acc:
                best_acc = acc
                save_classifier_params(os.path.join(args.output_dir,
                                                    "image_classifier_best"),
                                       {"params": p})
        logger.info(f"best dev acc {best_acc:.4f}")

    if args.get_cate:
        ckpt = args.checkpoint or os.path.join(args.output_dir,
                                               "image_classifier_best")
        params = load_classifier_params(ckpt, model)
        names = sorted(n for n in os.listdir(args.image_dir)
                       if n.lower().endswith((".png", ".jpg", ".jpeg")))
        result: Dict[str, List[str]] = {}
        for i in range(0, len(names), args.batch_size):
            chunk = names[i:i + args.batch_size]
            images = _load_images(chunk, args.image_dir)
            logits = model.apply(params, jnp.asarray(images))
            probs = np.asarray(jax.nn.sigmoid(logits))
            for name, row in zip(chunk, probs):
                result[name] = [classes[j] for j in np.where(row > args.threshold)[0]]
        out_path = os.path.join(args.output_dir, "resnet152_image_label.json")
        with open(out_path, "w") as f:
            json.dump(result, f, ensure_ascii=False)
        logger.info(f"wrote {out_path} with {len(result)} entries")


if __name__ == "__main__":
    main()
