"""Fused ResNet backbone runner: the frozen-CNN feature extractor with
Pallas matmul+epilogue kernels for every 1x1 convolution.

Functionally identical to `models.resnet.VisualFeatures` (same parameter
pytree, same math — reference: fcmf_framework/resnet_utils.py runs
torchvision resnet152 grid/pooled heads), but re-scheduled for TPU HBM
bandwidth:

* each bottleneck's 1x1 convs run as `ops.fused_conv.fused_matmul_bn_act`
  — conv + BN affine + (residual add) + ReLU in one MXU pass, so the
  widest activations ([N,14,14,1024] etc.) skip one full HBM write+read
  per block (XLA cannot output-fuse elementwise into convolutions; the
  separate residual `add_maximum` fusions were ~15 ms of the 112 ms
  batch-8 step),
* the grid (7x7 patch) and pooled (ROI vector) heads share ONE trunk pass:
  images and ROI crops are concatenated into a single conv batch instead
  of two applies (halves the f32->bf16 weight-cast traffic and kernel
  dispatches),
* 3x3 convs and the 7x7 stem stay on XLA's conv path (already MXU-bound).

The runner consumes the *same* `{"params": {"backbone": ...}}` pytree as
`VisualFeatures`, so checkpointing and torchvision weight import are
untouched; `tests/test_fused_conv.py` asserts output parity against the
Flax module.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from macsa_tpu.config import ResNetConfig
from macsa_tpu.ops.fused_conv import fused_matmul_bn_act

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


def _matmul_bn(x: Array, kernel: Array, bn: Dict[str, Array],
               residual2, relu: bool, interpret: bool) -> Array:
    """1x1 conv + BN (+residual) (+relu) on [..., C] via the Pallas kernel."""
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    mul, add = _affine(bn)
    x2 = x.reshape(-1, cin)
    y = fused_matmul_bn_act(x2, kernel.reshape(cin, cout).astype(x.dtype),
                            mul, add, residual2, relu, interpret)
    return y


def _bottleneck(p: Dict, x: Array, stride: int, downsample: bool,
                interpret: bool) -> Array:
    """models.resnet.Bottleneck with fused 1x1 convs.

    relu(bn3(conv3(relu(bn2(conv2(relu(bn1(conv1(x)))))))) + residual);
    the stride sits on the 3x3 conv2, the downsample branch is a strided
    1x1 conv + BN (no relu).
    """
    n, h, w, cin = x.shape
    y = _matmul_bn(x, p["conv1"]["kernel"], p["bn1"], None, True, interpret)
    feats = p["conv1"]["kernel"].shape[-1]
    y = _conv(y.reshape(n, h, w, feats), p["conv2"]["kernel"], stride)
    y = _bn_relu(y, p["bn2"])
    n2, h2, w2, _ = y.shape
    if downsample:
        # 1x1 stride-s conv == strided spatial subsample + matmul
        xs = x[:, ::stride, ::stride, :]
        res = _matmul_bn(xs, p["ds_conv"]["kernel"], p["ds_bn"], None,
                         False, interpret)
    else:
        res = x.reshape(n * h * w, cin)
    out = _matmul_bn(y, p["conv3"]["kernel"], p["bn3"], res, True, interpret)
    return out.reshape(n2, h2, w2, out.shape[-1])


def run_backbone(variables: Dict, x: Array, cfg: ResNetConfig,
                 interpret: bool = False) -> Array:
    """[N, H, W, 3] normalized float -> [N, H/32, W/32, 2048].

    Mirrors models.resnet.ResNet.__call__ (stem -> 4 stages of
    bottlenecks) over the same `{"params": {"backbone": ...}}` pytree.
    """
    bp = variables["params"]["backbone"]
    dt = jnp.dtype(cfg.dtype)
    x = x.astype(dt)
    x = _conv(x, bp["conv1"]["kernel"], 2)
    x = _bn_relu(x, bp["bn1"])
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    for stage, num_blocks in enumerate(cfg.stage_sizes):
        for block in range(num_blocks):
            stride = 2 if (stage > 0 and block == 0) else 1
            x = _bottleneck(bp[f"layer{stage + 1}_{block}"], x, stride,
                            downsample=(block == 0), interpret=interpret)
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
