"""Visual caption generation -> visual_captions JSON (EF-CapTrRoBERTa input).

The reference captions every image with a torch-hub CATR model and batches
greedy decoding (reference: EF-CapTrRoBERTa/Caption_Generation/
generate_captions_vi.py:50-177), exporting {image_name: caption}.

The captioner is pluggable:
* --catr_checkpoint <path.pth> --bert_tokenizer <local dir>: the reference's
  CATR model run NATIVELY on TPU (macsa_tpu/models/catr.py) from a locally
  downloaded torch-hub checkpoint — encode-once + lax.while_loop greedy
  decode instead of the reference's full-model re-forward per token,
* --hf_caption_model <local dir>: any local HF image-to-text checkpoint
  (BLIP/ViT-GPT2/...) via transformers' pipeline (torch CPU),
* --placeholder: emit the dataset's documented fallback caption
  ("hình ảnh bình thường", train_ef_captr_roberta.py:78-79) for every image —
  useful to exercise the EF-CapTr pipeline without a captioner.

The caption JSON is a *dataset input* to the framework either way
(EFCapDataset consumes it, macsa_tpu/data/baselines.py).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, Dict, List, Optional

PLACEHOLDER = "hình ảnh bình thường"


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--output_file", type=str, required=True)
    p.add_argument("--catr_checkpoint", type=str, default=None,
                   help="local CATR torch checkpoint (.pth state dict)")
    p.add_argument("--bert_tokenizer", type=str, default=None,
                   help="local bert-base-uncased tokenizer dir (for CATR)")
    p.add_argument("--hf_caption_model", type=str, default=None,
                   help="local HF image-to-text model dir")
    p.add_argument("--placeholder", action="store_true",
                   help="emit the fallback caption for every image")
    p.add_argument("--batch_size", type=int, default=8)
    return p


def square_pad_resize(path: str, size: int = 299):
    """SquarePad (0-pad to square) + resize + ImageNet normalize.

    Reference: generate_captions_vi.py:22-39 (SquarePad + resize 299 +
    Normalize).  Returns [size, size, 3] float32 NHWC.
    """
    import numpy as np
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    m = max(w, h)
    sq = Image.new("RGB", (m, m), (0, 0, 0))
    sq.paste(img, ((m - w) // 2, (m - h) // 2))
    arr = np.asarray(sq.resize((size, size), Image.BILINEAR),
                     dtype=np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (arr - mean) / std


def catr_captioner(checkpoint: str, tokenizer_dir: str, batch_size: int
                   ) -> Callable[[List[str]], List[str]]:
    """Native-JAX CATR greedy captioner from a torch-hub checkpoint."""
    import numpy as np
    import torch
    from transformers import BertTokenizer

    from macsa_tpu.models.catr import CATR, greedy_decode, import_torch_catr

    sd = torch.load(checkpoint, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "keys"):
        sd = sd["model"]
    cfg, params = import_torch_catr(sd)
    model = CATR(cfg)
    tok = BertTokenizer.from_pretrained(tokenizer_dir)

    def run(paths: List[str]) -> List[str]:
        imgs = np.stack([square_pad_resize(p) for p in paths])
        # pad the tail batch to the compiled batch size (static shapes)
        n = len(paths)
        if n < batch_size:
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - n,) + imgs.shape[1:],
                                np.float32)])
        tokens = np.asarray(greedy_decode(model, params, imgs))[:n]
        caps = []
        for row in tokens.tolist():
            if cfg.end_token in row:
                row = row[:row.index(cfg.end_token)]
            caps.append(tok.decode(row, skip_special_tokens=True).capitalize())
        return caps

    return run


def hf_captioner(model_dir: str, batch_size: int) -> Callable[[List[str]], List[str]]:
    from transformers import pipeline
    pipe = pipeline("image-to-text", model=model_dir, device=-1)

    def run(paths: List[str]) -> List[str]:
        outs = pipe(paths, batch_size=batch_size)
        return [(o[0]["generated_text"] if isinstance(o, list)
                 else o["generated_text"]).strip() for o in outs]

    return run


def generate(image_dir: str, captioner: Optional[Callable], batch_size: int = 8
             ) -> Dict[str, str]:
    names = sorted(n for n in os.listdir(image_dir)
                   if n.lower().endswith((".png", ".jpg", ".jpeg")))
    result: Dict[str, str] = {}
    if captioner is None:
        return {n: PLACEHOLDER for n in names}
    for i in range(0, len(names), batch_size):
        chunk = names[i:i + batch_size]
        caps = captioner([os.path.join(image_dir, n) for n in chunk])
        result.update(dict(zip(chunk, caps)))
    return result


def main(argv=None):
    args = build_argparser().parse_args(argv)
    captioner = None
    if args.catr_checkpoint:
        if not args.bert_tokenizer:
            raise SystemExit("--catr_checkpoint needs --bert_tokenizer <dir>")
        captioner = catr_captioner(args.catr_checkpoint, args.bert_tokenizer,
                                   args.batch_size)
    elif args.hf_caption_model:
        captioner = hf_captioner(args.hf_caption_model, args.batch_size)
    elif not args.placeholder:
        raise SystemExit("provide --catr_checkpoint <pth>, "
                         "--hf_caption_model <dir>, or --placeholder")
    result = generate(args.image_dir, captioner, args.batch_size)
    with open(args.output_file, "w") as f:
        json.dump(result, f, ensure_ascii=False)
    print(f"wrote {args.output_file} with {len(result)} captions")


if __name__ == "__main__":
    main()
