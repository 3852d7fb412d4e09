"""Visual caption generation -> visual_captions JSON (EF-CapTrRoBERTa input).

The reference captions every image with a torch-hub CATR model and batches
greedy decoding (reference: EF-CapTrRoBERTa/Caption_Generation/
generate_captions_vi.py:50-177), exporting {image_name: caption}.

This environment has no torch-hub egress, so the captioner is pluggable:
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
    p.add_argument("--hf_caption_model", type=str, default=None,
                   help="local HF image-to-text model dir")
    p.add_argument("--placeholder", action="store_true",
                   help="emit the fallback caption for every image")
    p.add_argument("--batch_size", type=int, default=8)
    return p


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
    if args.hf_caption_model:
        captioner = hf_captioner(args.hf_caption_model, args.batch_size)
    elif not args.placeholder:
        raise SystemExit("provide --hf_caption_model <dir> or --placeholder")
    result = generate(args.image_dir, captioner, args.batch_size)
    with open(args.output_file, "w") as f:
        json.dump(result, f, ensure_ascii=False)
    print(f"wrote {args.output_file} with {len(result)} captions")


if __name__ == "__main__":
    main()
