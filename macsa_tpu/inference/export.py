"""AOT serving bundle: serialize the FCMF inference forward to StableHLO.

The reference deploys by shipping the full Python stack + torch checkpoint
(inference.py:332-440).  On TPU the natural serving artifact is the
*compiler IR itself*: `jax.export` lowers the jitted 6-aspect batched
forward (visual extraction + fusion classifier) once, at fixed serving
shapes, and serializes portable StableHLO.  A server then needs jax and the
bundle — none of the model-building Python — and pays zero retrace cost.

Bundle layout (a directory):
    model.stablehlo   — serialized jax.export artifact; callable signature
                        (params, visual_params, batch) -> logits [B, A, 4]
    params.msgpack    — flax-serialized {params, visual_params}
    bundle.json       — serving shapes, config dataclasses, aspect/polarity
                        vocab, export platforms

The export always lowers with `fused_attention=off`: the artifact must be
pure StableHLO (a Mosaic `custom_call` would pin it to one libtpu build and
break the CPU fallback platform).  The XLA attention path is ~1%% slower at
serving shapes — portability is worth it.

Usage:
    python -m macsa_tpu.inference.export --checkpoint out_ft/best \
        --output_dir bundle/ --batch_size 8 [--platforms cpu,tpu]
then serve with `load_bundle("bundle/").predict(batch)` — or via the
inference CLI's `--bundle` flag.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np

from macsa_tpu.config import (ASPECTS, POLARITIES, FCMFConfig, ModelConfig,
                              ResNetConfig, TextEncoderConfig)

_MODEL_FILE = "model.stablehlo"
_PARAMS_FILE = "params.msgpack"
_META_FILE = "bundle.json"


def _serving_config(text_cfg: TextEncoderConfig, num_imgs: int, num_roi: int,
                    max_seq_length: int, cross_mask_mode: str,
                    dtype: str = "float32") -> FCMFConfig:
    """XLA attention + the chosen compute dtype: the portable serving
    configuration.  float32 (default) matches the checkpoint-mode forward
    bit-for-bit; bfloat16 is the fast serving point (still pure StableHLO
    — bf16 ops lower on CPU too) with ~1e-2 logit deviation, argmax
    predictions virtually always identical."""
    text_cfg = dataclasses.replace(text_cfg, dtype=dtype,
                                   fused_attention=False,
                                   fused_attention_interpret=False)
    return FCMFConfig(
        model=ModelConfig(dtype=dtype),
        text=text_cfg, num_imgs=num_imgs, num_roi=num_roi,
        max_text_len=max_seq_length,
        decoder_cross_mask_mode=cross_mask_mode)


def _abstract_batch(cfg: FCMFConfig, b: int, image_size: int = 224
                    ) -> Dict[str, Any]:
    import jax
    a, l = len(ASPECTS), cfg.max_text_len
    f32, i32 = np.float32, np.int32
    sh = jax.ShapeDtypeStruct
    s = image_size
    return {
        "images": sh((b, cfg.num_imgs, s, s, 3), f32),
        "roi_images": sh((b, cfg.num_imgs, cfg.num_roi, s, s, 3), f32),
        "roi_coors": sh((b, cfg.num_imgs, cfg.num_roi, 4), f32),
        "input_ids": sh((b, a, l), i32),
        "token_type_ids": sh((b, a, l), i32),
        "attention_mask": sh((b, a, l), i32),
        "added_mask": sh((b, a, l + cfg.num_patches), i32),
    }


def export_bundle(checkpoint: str, output_dir: str, batch_size: int = 8,
                  pretrained_hf_model: Optional[str] = None,
                  resnet_weights: Optional[str] = None,
                  resnet_stages=(3, 8, 36, 3), num_imgs: int = 7,
                  num_rois: int = 4, max_seq_length: int = 170,
                  cross_mask_mode: str = "causal_quirk",
                  platforms=("cpu", "tpu"), logger=None,
                  fcmf_config: Optional[FCMFConfig] = None,
                  resnet_config: Optional[ResNetConfig] = None,
                  image_size: int = 224, dtype: str = "float32") -> str:
    """Lower the full inference forward at serving shapes and write a bundle.

    `checkpoint` accepts the same sources as the inference CLI: an orbax
    train-state / params dir, or a reference torch .pth (legacy key renames
    included, inference.py:172-193).  `fcmf_config`/`resnet_config` override
    the constructed configs (tests; programmatic export of non-default
    architectures) — fused attention is still forced off (portability) and
    the compute dtype to `dtype`: "float32" (default) matches the
    checkpoint-mode forward bit-for-bit; "bfloat16" is the fast serving
    point (see _serving_config).
    """
    import jax
    from flax import serialization

    from macsa_tpu.inference.cli import _load_fcmf_params
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.train import common
    from macsa_tpu.train.steps import fcmf_forward_all_aspects

    if dtype not in ("float32", "bfloat16"):
        raise ValueError(f"serving dtype {dtype!r}: float32|bfloat16")
    if fcmf_config is not None:
        cfg = dataclasses.replace(
            fcmf_config,
            model=dataclasses.replace(fcmf_config.model, dtype=dtype,
                                      fused_attention=False),
            text=dataclasses.replace(fcmf_config.text, dtype=dtype,
                                     fused_attention=False,
                                     fused_attention_interpret=False))
    else:
        text_cfg = common.build_text_config(pretrained_hf_model, dtype)
        cfg = _serving_config(text_cfg, num_imgs, num_rois, max_seq_length,
                              cross_mask_mode, dtype)
    rcfg = resnet_config if resnet_config is not None else ResNetConfig(
        dtype=dtype, stage_sizes=tuple(resnet_stages))
    model, visual = FCMF(cfg), VisualFeatures(rcfg)

    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    params, ckpt_visual = _load_fcmf_params(checkpoint, model, cfg, key)
    if ckpt_visual is not None:
        # serve the ResNet params the model was trained against (cli.py
        # does the same; reference: inference.py:57-139)
        visual_params = ckpt_visual
        if resnet_weights and logger:
            logger.warning("resnet_weights ignored: checkpoint carries its "
                           "own visual_params")
    else:
        visual_params = common.jit_init(
            visual, key, jnp.zeros((1, 1, image_size, image_size, 3)))
        visual_params = common.import_resnet_params(
            visual_params, resnet_weights, logger)

    def fwd(params, visual_params, batch):
        return fcmf_forward_all_aspects(model, params, visual, visual_params,
                                        batch, deterministic=True)

    batch_abs = _abstract_batch(cfg, batch_size, image_size)
    exported = jax.export.export(jax.jit(fwd), platforms=list(platforms))(
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                                    np.asarray(x).dtype),
                     params),
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                                    np.asarray(x).dtype),
                     visual_params),
        batch_abs)

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, _MODEL_FILE), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(output_dir, _PARAMS_FILE), "wb") as f:
        f.write(serialization.to_bytes(
            {"params": jax.tree.map(np.asarray, params),
             "visual_params": jax.tree.map(np.asarray, visual_params)}))
    meta = {
        "batch_size": batch_size,
        "image_size": image_size,
        "aspects": list(ASPECTS),
        "polarities": list(POLARITIES),
        "platforms": list(platforms),
        "config": dataclasses.asdict(cfg),
        "resnet_config": dataclasses.asdict(rcfg),
        "batch_spec": {k: [list(v.shape), str(np.dtype(v.dtype))]
                       for k, v in batch_abs.items()},
    }
    with open(os.path.join(output_dir, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return output_dir


class ServingModel:
    """A loaded bundle: jitted deserialized StableHLO + params.

    `predict(batch)` pads a partial final batch to the exported batch size
    (one compiled shape serves any record count) and returns logits
    [n, A, num_labels] as numpy.
    """

    def __init__(self, exported, params, visual_params, meta: Dict[str, Any]):
        import jax
        self._call = jax.jit(exported.call)
        self._params = params
        self._visual_params = visual_params
        self.meta = meta
        self.batch_size = meta["batch_size"]
        self.batch_spec = meta["batch_spec"]

    def predict(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        n = int(next(iter(batch.values())).shape[0])
        bs = self.batch_size
        if n > bs:
            raise ValueError(f"batch of {n} > exported batch size {bs}; "
                             "split into chunks")
        padded = {}
        for k, (shape, dtype) in self.batch_spec.items():
            x = np.asarray(batch[k], dtype=dtype)
            if list(x.shape)[1:] != shape[1:]:
                raise ValueError(f"{k}: got {x.shape}, bundle expects "
                                 f"[{bs}] + {shape[1:]}")
            if n < bs:
                x = np.concatenate(
                    [x, np.repeat(x[-1:], bs - n, axis=0)], axis=0)
            padded[k] = x
        logits = self._call(self._params, self._visual_params, padded)
        return np.asarray(logits)[:n]

    def predict_labels(self, batch: Dict[str, np.ndarray]):
        """-> list (per record) of {aspect: polarity}."""
        preds = self.predict(batch).argmax(-1)
        pol, asp = self.meta["polarities"], self.meta["aspects"]
        return [{a: pol[p[i]] for i, a in enumerate(asp)} for p in preds]


def load_bundle(path: str) -> ServingModel:
    import jax
    from flax import serialization

    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    with open(os.path.join(path, _MODEL_FILE), "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(os.path.join(path, _PARAMS_FILE), "rb") as f:
        trees = serialization.msgpack_restore(f.read())
    return ServingModel(exported, trees["params"], trees["visual_params"],
                        meta)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", type=str, required=True,
                   help="orbax dir or reference torch .pth")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--pretrained_hf_model", type=str, default=None,
                   help="tokenizer/config dir (for text-encoder dims)")
    p.add_argument("--resnet_weights", type=str, default=None)
    p.add_argument("--resnet_stages", type=str, default="3,8,36,3")
    p.add_argument("--num_imgs", type=int, default=7)
    p.add_argument("--num_rois", type=int, default=4)
    p.add_argument("--max_seq_length", type=int, default=170)
    p.add_argument("--cross_mask_mode", type=str, default="causal_quirk",
                   choices=("causal_quirk", "padding"))
    p.add_argument("--platforms", type=str, default="cpu,tpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="serving compute dtype: float32 matches checkpoint-"
                        "mode logits bit-for-bit; bfloat16 is the fast "
                        "TPU serving point (docs/BENCHMARKS.json bundle "
                        "rows)")
    return p


def main(argv=None) -> str:
    from macsa_tpu.utils.logging import setup_logging
    args = build_argparser().parse_args(argv)
    logger = setup_logging(None)
    out = export_bundle(
        checkpoint=args.checkpoint, output_dir=args.output_dir,
        batch_size=args.batch_size,
        pretrained_hf_model=args.pretrained_hf_model,
        resnet_weights=args.resnet_weights,
        resnet_stages=tuple(int(s) for s in args.resnet_stages.split(",")),
        num_imgs=args.num_imgs, num_rois=args.num_rois,
        max_seq_length=args.max_seq_length,
        cross_mask_mode=args.cross_mask_mode,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s),
        dtype=args.dtype, logger=logger)
    logger.info(f"bundle written to {out}")
    print(json.dumps({"bundle": out}))
    return out


if __name__ == "__main__":
    main()
