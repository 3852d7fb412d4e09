"""Fused ResNet backbone runner: the frozen-CNN feature extractor with a
whole-bottleneck Pallas kernel per identity block.

Functionally identical to `models.resnet.VisualFeatures` (same parameter
pytree, same math — reference: fcmf_framework/resnet_utils.py runs
torchvision resnet152 grid/pooled heads), but re-scheduled for TPU HBM
bandwidth:

* every identity bottleneck (46 of ResNet-152's 50 blocks) runs as ONE
  `ops.fused_conv.fused_bottleneck` program: conv1/conv2(3x3)/conv3 + BN
  affines + residual + ReLUs with all intermediates in VMEM, so each
  block's HBM traffic is exactly one read of x and one write of the
  output (XLA cannot output-fuse elementwise into convolutions; its
  separate residual `add_maximum` fusions alone were ~25 ms of the 112 ms
  batch-8 step),
* activations flow between blocks as flattened [N*H*W, C] rows, so no
  layout copies appear inside a stage,
* the grid (7x7 patch) and pooled (ROI vector) heads share ONE trunk pass:
  images and ROI crops are concatenated into a single conv batch instead
  of two applies,
* the 7x7 stem and each stage's strided block 0 stay on XLA's conv path.

The runner consumes the *same* `{"params": {"backbone": ...}}` pytree as
`VisualFeatures`, so checkpointing and torchvision weight import are
untouched; `tests/test_fused_conv.py` asserts output parity against the
Flax module.

STATUS — measured negative result, kept off by default.  On v5e at batch 8
the fused visual step measures 59.2 ms vs 50.0 ms for the XLA path: the
residual-fusion HBM traffic it removes (~14.8 ms) is outweighed by losing
XLA's conv double-buffering across blocks (the kernel serializes each
bottleneck's three matmuls on one core).  The path stays because it is
parity-tested infrastructure for re-attempting the tiling (stage-3-only
fusion is the open idea) and is reachable via `ResNetConfig.fused_conv`
(`BENCH_FUSED_CONV=1`); it is not on any default path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from macsa_tpu.config import ResNetConfig
from macsa_tpu.ops.fused_conv import block_images, fused_bottleneck

Array = jax.Array


def _affine(bn: Dict[str, Array], eps: float = 1e-5) -> Tuple[Array, Array]:
    """FrozenBatchNorm (models/resnet.py) affine factors, f32."""
    mul = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
    return mul, bn["bias"] - bn["mean"] * mul


def _bn_relu(x: Array, bn: Dict[str, Array], relu: bool = True) -> Array:
    mul, add = _affine(bn)
    y = x * mul.astype(x.dtype) + add.astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _conv(x: Array, kernel: Array, stride: int) -> Array:
    """NHWC conv matching models.resnet._conv (same-ish padding k//2)."""
    kh = kernel.shape[0]
    pad = kh // 2
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bottleneck_xla(p: Dict, x: Array, stride: int, downsample: bool
                    ) -> Array:
    """Pure-XLA bottleneck (models.resnet.Bottleneck math), used for the
    stride/downsample block 0 of each stage — its strided conv2 does not
    fit the row-shift trick, and 4 blocks of 50 are not worth a second
    kernel variant."""
    residual = x
    y = _bn_relu(_conv(x, p["conv1"]["kernel"], 1), p["bn1"])
    y = _bn_relu(_conv(y, p["conv2"]["kernel"], stride), p["bn2"])
    y = _bn_relu(_conv(y, p["conv3"]["kernel"], 1), p["bn3"], relu=False)
    if downsample:
        residual = _bn_relu(_conv(x, p["ds_conv"]["kernel"], stride),
                            p["ds_bn"], relu=False)
    return jax.nn.relu(y + residual)


def _block_args(p: Dict):
    """Bottleneck param tree -> fused_bottleneck weight/affine args."""
    w1 = p["conv1"]["kernel"]
    c, feats = w1.shape[-2], w1.shape[-1]
    m1, a1 = _affine(p["bn1"])
    m2, a2 = _affine(p["bn2"])
    m3, a3 = _affine(p["bn3"])
    w2 = p["conv2"]["kernel"].reshape(9, feats, feats)
    w3 = p["conv3"]["kernel"].reshape(feats, c)
    return (w1.reshape(c, feats), m1, a1, w2, m2, a2, w3, m3, a3)


def run_backbone(variables: Dict, x: Array, cfg: ResNetConfig,
                 interpret: bool = False) -> Array:
    """[N, H, W, 3] normalized float -> [N, H/32, W/32, 2048].

    Mirrors models.resnet.ResNet.__call__ (stem -> 4 stages of
    bottlenecks) over the same `{"params": {"backbone": ...}}` pytree.
    Stem + the strided block 0 of each stage run on XLA; every identity
    bottleneck runs as ONE `fused_bottleneck` pallas program, with the
    activation kept as flattened [N*H*W, C] rows between blocks so the
    only layout copies are the two reshapes at each stage boundary.
    """
    bp = variables["params"]["backbone"]
    dt = jnp.dtype(cfg.dtype)
    x = x.astype(dt)
    x = _conv(x, bp["conv1"]["kernel"], 2)
    x = _bn_relu(x, bp["bn1"])
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    for stage, num_blocks in enumerate(cfg.stage_sizes):
        stride = 2 if stage > 0 else 1
        x = _bottleneck_xla(bp[f"layer{stage + 1}_0"], x, stride,
                            downsample=True)
        if num_blocks == 1:
            continue
        n, h, w, c = x.shape
        feats = bp[f"layer{stage + 1}_1"]["conv1"]["kernel"].shape[-1]
        if block_images(n, h, w, c, feats) is None:
            # no VMEM-feasible whole-image tiling (e.g. stage 4's 49
            # rows/image + 8.7 MB resident weights) -> XLA blocks
            for block in range(1, num_blocks):
                x = _bottleneck_xla(bp[f"layer{stage + 1}_{block}"], x,
                                    1, downsample=False)
            continue
        x2 = x.reshape(n * h * w, c)
        for block in range(1, num_blocks):
            x2 = fused_bottleneck(
                x2, *_block_args(bp[f"layer{stage + 1}_{block}"]),
                n, h, w, interpret)
        x = x2.reshape(n, h, w, c)
    return x


def extract_features(variables: Dict, images: Array, roi_images: Array,
                     cfg: ResNetConfig, interpret: bool = False
                     ) -> Tuple[Array, Array]:
    """One trunk pass over images+ROI crops -> (grid, pooled) features.

    images [B, I, H, W, 3], roi_images [B, I, R, H, W, 3] ->
    grid [B, I, att*att, 2048], roi [B, I, R, 2048] — the same outputs as
    VisualFeatures.grid_features / pooled_features (resnet_utils.py:24,50),
    computed in a single concatenated conv batch.
    """
    b, i = images.shape[:2]
    r = roi_images.shape[2]
    hw = images.shape[-3:]
    flat = jnp.concatenate([images.reshape((-1,) + hw),
                            roi_images.reshape((-1,) + hw)], axis=0)
    feat = run_backbone(variables, flat, cfg, interpret)  # [N, h, w, 2048]
    n, h, w, c = feat.shape
    att = cfg.grid_size
    gi = feat[:b * i]
    if (h, w) != (att, att):  # adaptive mean pool (224 -> 7x7 is identity)
        assert h % att == 0 and w % att == 0, (h, w, att)
        gi = gi.reshape(b * i, att, h // att, att, w // att, c).mean(axis=(2, 4))
    grid = gi.reshape(b, i, att * att, c)
    roi = feat[b * i:].mean(axis=(1, 2)).reshape(b, i, r, c)
    return grid, roi
