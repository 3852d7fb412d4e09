"""Generate a fully-offline synthetic ViMACSA-shaped dataset + tokenizer.

Produces everything the training drivers require (see
macsa_tpu/train/common.py:load_metadata and the driver CLIs), so the real
CLI entry points can be exercised end-to-end without the (private) ViMACSA
data or any network egress:

  <out>/tok/     tokenizer.json + tokenizer_config.json + config.json
                 (hidden_size=768 — the fusion stack is fixed at 768 — but
                 only 2 text layers so CPU/TPU smoke runs stay fast)
  <out>/data/    train/dev/test.json, train/dev_with_iaog.json,
                 roi_data.csv, resnet152_image_label.json,
                 resnet152_roi_label.json
  <out>/images/  small random PNGs

Usage: python tools_dev/make_synth_data.py /tmp/synth [n_train]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ASPECTS = ["Location", "Food", "Room", "Facilities", "Service", "Public_area"]
POLARITIES = ["None", "Negative", "Neutral", "Positive"]

WORDS = ("khách sạn phòng đẹp sạch sẽ nhân viên thân thiện đồ ăn ngon vị trí "
         "thuận tiện giá rẻ tốt tệ bẩn cũ ồn view biển hồ bơi rộng nhỏ "
         "thoải mái tuyệt vời bình thường dịch vụ chậm nhanh").split()


def make_tokenizer(tok_dir: str, n_layers: int = 2,
                   intermediate: int = 1024) -> None:
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, ",": 4, ".": 5,
             "empty": 6}
    for w in WORDS:
        for piece in w.split():
            vocab.setdefault(piece, len(vocab))
    for asp in ASPECTS:
        for piece in asp.lower().replace("_", " ").split():
            vocab.setdefault(piece, len(vocab))

    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> </s> $B:0 </s>:0",  # XLM-R style: all type ids 0
        special_tokens=[("<s>", 0), ("</s>", 2)])
    tok.enable_truncation(max_length=170)

    os.makedirs(tok_dir, exist_ok=True)
    tok.save(os.path.join(tok_dir, "tokenizer.json"))
    with open(os.path.join(tok_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "bos_token": "<s>", "eos_token": "</s>",
                   "sep_token": "</s>", "cls_token": "<s>",
                   "pad_token": "<pad>", "unk_token": "<unk>",
                   "model_max_length": 512}, f)
    with open(os.path.join(tok_dir, "config.json"), "w") as f:
        json.dump({"model_type": "xlm-roberta", "vocab_size": len(vocab),
                   "hidden_size": 768, "num_hidden_layers": n_layers,
                   "num_attention_heads": 12,
                   "intermediate_size": intermediate,
                   "max_position_embeddings": 514, "type_vocab_size": 1,
                   "pad_token_id": 1, "layer_norm_eps": 1e-5}, f)


def make_images(img_dir: str, n: int, rng: np.random.Generator) -> list:
    from PIL import Image
    os.makedirs(img_dir, exist_ok=True)
    names = []
    for i in range(n):
        name = f"img_{i:03d}.png"
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        names.append(name)
    return names


def make_records(n: int, img_names: list, rng: np.random.Generator,
                 with_iaog: bool) -> list:
    records = []
    for i in range(n):
        text = " ".join(rng.choice(WORDS, size=rng.integers(6, 15)))
        k = int(rng.integers(1, 4))
        imgs = list(rng.choice(img_names, size=k, replace=False))
        n_lab = int(rng.integers(1, 4))
        asps = rng.choice(ASPECTS, size=n_lab, replace=False)
        labels = [f"{a}#{rng.choice(POLARITIES[1:])}" for a in asps]
        rec = {"comment": text, "list_img": imgs, "text_img_label": labels}
        if with_iaog:
            rec["iaog_labels"] = [
                f"{rng.choice(WORDS)}#{a}" for a in asps]
        records.append(rec)
    return records


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    # full-scale runs (docs/RUNS.md) use 12 layers / 3072 intermediate —
    # the ViSoBERT/XLM-R-base geometry; smoke-test default stays tiny
    n_layers = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    intermediate = 3072 if n_layers >= 12 else 1024
    rng = np.random.default_rng(0)

    make_tokenizer(os.path.join(out, "tok"), n_layers, intermediate)
    img_names = make_images(os.path.join(out, "images"), 12, rng)

    data_dir = os.path.join(out, "data")
    os.makedirs(data_dir, exist_ok=True)
    # *_with_iaog.json holds the SAME reviews as the plain split plus the
    # iaog_labels field — the real dataset's relationship (the IAOG files
    # are produced by annotating train/dev.json, create_IAOG_labels.ipynb),
    # which the cross-stage feature cache relies on (shared images => keys)
    for split, n in [("train", n_train), ("dev", max(4, n_train // 4)),
                     ("test", max(4, n_train // 4))]:
        records = make_records(n, img_names, rng, True)
        if split != "test":
            with open(os.path.join(data_dir, f"{split}_with_iaog.json"),
                      "w") as f:
                json.dump(records, f, ensure_ascii=False)
        for rec in records:
            rec.pop("iaog_labels", None)
        with open(os.path.join(data_dir, f"{split}.json"), "w") as f:
            json.dump(records, f, ensure_ascii=False)

    # roi_data.csv: file_name (no suffix), x1, x2, y1, y2
    with open(os.path.join(data_dir, "roi_data.csv"), "w") as f:
        f.write("file_name,x1,x2,y1,y2\n")
        for name in img_names:
            stem = name[:-4]
            for _ in range(int(rng.integers(1, 4))):
                x1, y1 = rng.integers(0, 32, 2)
                f.write(f"{stem},{x1},{x1 + 24},{y1},{y1 + 24}\n")

    img_aspect = {n: list(rng.choice(ASPECTS, size=rng.integers(1, 3),
                                     replace=False)) for n in img_names}
    roi_aspect = {n: list(rng.choice(ASPECTS, size=rng.integers(1, 3),
                                     replace=False)) for n in img_names}
    with open(os.path.join(data_dir, "resnet152_image_label.json"), "w") as f:
        json.dump(img_aspect, f)
    with open(os.path.join(data_dir, "resnet152_roi_label.json"), "w") as f:
        json.dump(roi_aspect, f)
    print(f"synthetic dataset written to {out}")


if __name__ == "__main__":
    main()
