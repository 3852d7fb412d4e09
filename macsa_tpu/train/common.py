"""Shared driver plumbing: metadata loading, text normalization, tokenizer,
model/param construction with pretrained-weight import.

Mirrors the reference's driver preamble (reference:
run_multimodal_fcmf.py:170-244): tokenizer, roi_data.csv (+'.png' suffix),
the two offline label JSONs (hard prerequisites — explicit errors if missing,
:188-199), train/dev/test JSON with comment normalization, model + two ResNet
feature extractors.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, NamedTuple, Optional, Union

from macsa_tpu.config import TextEncoderConfig
from macsa_tpu.data.images import roi_boxes_from_csv
from macsa_tpu.data.text_preprocess import TextNormalize, convert_unicode


def normalize_comment(text: str, normalizer: Optional[TextNormalize] = None) -> str:
    """convert_unicode -> (underthesea text_normalize when available) ->
    TextNormalize.normalize — the reference's chain
    (run_multimodal_fcmf.py:204-205)."""
    normalizer = normalizer or TextNormalize()
    text = convert_unicode(text)
    try:  # optional external dependency; identity when absent
        from underthesea import text_normalize as uts_normalize
        text = uts_normalize(text)
    except ImportError:
        pass
    return normalizer.normalize(text)


def load_records(path: str, normalize: bool = True) -> List[Dict[str, Any]]:
    """A {column: {row: value}} or list-of-dicts JSON -> list of records."""
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict):  # pandas orient='columns'
        cols = list(data.keys())
        row_keys = list(next(iter(data.values())).keys())
        records = [{c: data[c][rk] for c in cols} for rk in row_keys]
    else:
        records = list(data)
    if normalize:
        tn = TextNormalize()
        for rec in records:
            rec["comment"] = normalize_comment(rec.get("comment", ""), tn)
    return records


def load_metadata(data_dir: str):
    """-> (roi_boxes, dict_image_aspect, dict_roi_aspect).

    Required-file validation with explicit errors, like the reference
    (run_multimodal_fcmf.py:181-199)."""
    roi_csv = os.path.join(data_dir, "roi_data.csv")
    if not os.path.exists(roi_csv):
        raise ValueError(f"Can't find roi_data.csv under {data_dir}")
    roi_boxes = roi_boxes_from_csv(roi_csv)

    img_json = os.path.join(data_dir, "resnet152_image_label.json")
    roi_json = os.path.join(data_dir, "resnet152_roi_label.json")
    if not (os.path.exists(img_json) and os.path.exists(roi_json)):
        raise ValueError(
            "Get image/roi aspect category first. Please run "
            "tools/image_categories.py or tools/roi_categories.py")
    with open(img_json) as f:
        dict_image_aspect = json.load(f)
    with open(roi_json) as f:
        dict_roi_aspect = json.load(f)
    return roi_boxes, dict_image_aspect, dict_roi_aspect


def load_tokenizer(pretrained_path: str):
    """HF tokenizer wrapped for the loader's thread pool (fast tokenizers
    raise `Already borrowed` under concurrent encode)."""
    from transformers import AutoTokenizer
    from macsa_tpu.data.loader import ThreadSafeTokenizer
    return ThreadSafeTokenizer(
        AutoTokenizer.from_pretrained(pretrained_path, local_files_only=True))


def compilation_cache_dir() -> str:
    """The per-host persistent-cache directory the drivers/bench use.

    `<base>/<host_fingerprint>`: the JAX cache key does not include the
    host's CPU features, and on this deployment the base directory lives on
    a volume shared across machines — without the fingerprint subdir,
    XLA:CPU can load AOT executables compiled for a *different* CPU
    (subtly different numerics; SIGILL in the worst case — see
    macsa_tpu/utils/hostfp.py, incl. the note on which loader warnings
    are benign pseudo-feature mismatches).  An explicit
    `JAX_COMPILATION_CACHE_DIR` env var wins verbatim; `JAX_CACHE` sets the
    base; default base is `~/.cache/jax_comp`.
    """
    explicit = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if explicit:
        return explicit
    from macsa_tpu.utils.hostfp import host_fingerprint
    base = os.environ.get("JAX_CACHE", os.path.expanduser("~/.cache/jax_comp"))
    return os.path.join(base, host_fingerprint())


def enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at the per-host directory.

    The FCMF programs compile in minutes at full scale; every driver is a
    fresh process (pretrain -> finetune -> inference), so without the
    on-disk cache each stage pays the full XLA compile again.
    """
    import jax
    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())


class FusedAttention(NamedTuple):
    """Resolved fused-attention decision: use the Pallas kernel, and whether
    to run it in interpret mode (non-TPU platforms)."""

    enabled: bool
    interpret: bool


def default_compute_platform() -> str:
    """Platform computations run on by default.

    `jax.default_backend()` reports the highest-priority *registered*
    backend, which is wrong in mixed environments where the TPU plugin is
    registered but `jax_default_device` is pinned to CPU (the test harness)
    — computations then execute on CPU while default_backend() still says
    'tpu'.  Prefer the pinned default device's platform when set.
    """
    import jax
    dev = jax.config.jax_default_device
    if dev is not None:
        plat = getattr(dev, "platform", None)
        if plat:
            return plat
    return jax.default_backend()


def resolve_fused_attention(flag: str, mp: int = 1, logger=None
                            ) -> FusedAttention:
    """'on'/'off'/'auto' -> FusedAttention(enabled, interpret).

    auto enables the Pallas fused-attention kernel only on TPU platforms
    (the kernel is Mosaic/TPU-only; CPU keeps the XLA path, and unknown
    accelerators are not assumed compatible).  'on' on a non-TPU platform
    runs the kernel in (slow) interpret mode — a debugging escape hatch.

    Multi-chip meshes and tensor parallelism compose through shard_map
    (ops/fused_attention.fused_self_attention_sharded: batch over dp,
    heads over mp) — the drivers register the mesh via
    `parallel.mesh.set_kernel_mesh` right after `make_mesh`, and the
    attention layer partitions the kernel over it at trace time.  So auto
    no longer drops to the XLA path when >1 device is visible.
    """
    if flag == "off":
        return FusedAttention(False, False)
    on_tpu = default_compute_platform() in ("tpu", "axon")
    if flag == "on":
        return FusedAttention(True, not on_tpu)
    return FusedAttention(on_tpu, False)


def build_text_config(pretrained_path: Optional[str],
                      dtype: str = "bfloat16",
                      fused_attention: Union[FusedAttention, bool] = False,
                      ) -> TextEncoderConfig:
    import dataclasses
    if pretrained_path and os.path.exists(os.path.join(pretrained_path,
                                                       "config.json")):
        with open(os.path.join(pretrained_path, "config.json")) as f:
            cfg = TextEncoderConfig.from_hf_config(json.load(f), dtype=dtype)
    else:
        cfg = TextEncoderConfig(dtype=dtype)
    fa = (fused_attention if isinstance(fused_attention, FusedAttention)
          else FusedAttention(bool(fused_attention), False))
    return dataclasses.replace(cfg, fused_attention=fa.enabled,
                               fused_attention_interpret=fa.interpret)


def jit_init(module, key, *args):
    """``module.init(key, *args)`` compiled as ONE program.

    Eager flax init executes the traced forward op-by-op; on a deployment
    where the TPU sits behind a tunnel every dispatch pays a ~3-4 ms floor,
    so ResNet-152 + FCMF init cost minutes of pure dispatch (docs/RUNS.md
    v1 Stage 1: ~8.4 min process+model init).  Under ``jit`` XLA
    dead-code-eliminates the forward — parameter values depend only on
    key + shape — leaving essentially just the RNG sampling ops.  Values
    come from the same PRNG stream as eager init; fusion changes rounding
    in the initializer math by ~1e-7 relative, immaterial for random init.
    """
    import jax
    return jax.jit(module.init)(key, *args)


def output_zeros(fn, *args):
    """Zeros shaped like ``fn(*args)`` without running ``fn`` (eval_shape).

    Drivers previously ran a full eager ResNet forward on dummy images just
    to obtain grid/roi feature shapes for ``model.init`` — only the SHAPES
    matter there (init never reads input values), so abstract evaluation
    replaces minutes of tunnel-dispatched device work with zero device work.
    """
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(fn, *args))


def import_text_params(params: Dict[str, Any], pretrained_path: str,
                       logger=None) -> Dict[str, Any]:
    """Load HF backbone weights into FCMF params['encoder']['bert'] in place
    (returns a new tree).  Random init is kept when no weight file exists."""
    from macsa_tpu.models.text_encoder import load_hf_checkpoint
    import flax
    try:
        _, bert_params = load_hf_checkpoint(pretrained_path)
    except (FileNotFoundError, OSError) as e:
        if logger:
            logger.warning(f"no HF weights under {pretrained_path} ({e}); "
                           "keeping random init")
        return params
    out = flax.core.unfreeze(params)
    out["encoder"]["bert"] = bert_params
    return out


def import_resnet_params(visual_params: Dict[str, Any],
                         weights_path: Optional[str], logger=None):
    """torchvision resnet152 state-dict file -> VisualFeatures params."""
    if not weights_path or not os.path.exists(weights_path):
        if logger:
            logger.warning("no torchvision resnet weights; keeping random init")
        return visual_params
    import torch
    from macsa_tpu.models.resnet import import_torchvision_resnet
    sd = torch.load(weights_path, map_location="cpu")
    return {"params": import_torchvision_resnet(sd)}


def resnet_fingerprint(weights_path: Optional[str], rcfg, seed: int) -> str:
    """Identity of the visual extractor for the on-disk feature cache
    (train/disk_feature_cache.py): weights SOURCE (file content hash, or
    the init seed when training from random init) + the config fields that
    change the emitted features.  Hashing the source instead of the live
    params avoids fetching ~240 MB of device arrays per run."""
    if weights_path and os.path.exists(weights_path):
        from macsa_tpu.train.disk_feature_cache import file_content_hash
        src = f"torchvision:{file_content_hash(weights_path)}"
    else:
        src = f"randominit:seed{seed}"
    return (f"{src}|stages{','.join(map(str, rcfg.stage_sizes))}"
            f"|f{rcfg.num_filters}|g{rcfg.grid_size}|{rcfg.dtype}")
