"""ResNet-152 visual feature extractor (Flax, NHWC, frozen BatchNorm).

TPU-native equivalent of the reference's on-device feature extractors
(reference: fcmf_framework/resnet_utils.py): `grid_features` returns the
7x7x2048 attention grid (`myResNetImg`, resnet_utils.py:13-30) and
`pooled_features` the spatially-averaged 2048-d vector (`myResNetRoI`,
resnet_utils.py:39-55).

Design choices (TPU-first, documented deviations):
* NHWC layout — the native TPU convolution layout,
* BatchNorm is *folded*: the reference runs the backbone frozen
  (`if_fine_tune=False` detaches gradients, resnet_utils.py:26-28), so BN is
  applied as a per-channel affine using the pretrained running statistics
  (eval-mode BN).  This removes all mutable state from the jitted step,
* the 7/28 images-per-sample axes are folded into the batch so every
  convolution runs as one large NHWC conv on the MXU (the reference loops
  35 separate forwards per step, run_multimodal_fcmf.py:448-460),
* compute dtype defaults to bf16; the feature outputs are cast back to the
  fusion model's dtype by the caller.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from macsa_tpu.config import ResNetConfig

Array = jax.Array

# ImageNet normalization used by every dataset path (vimacsa_dataset.py:25-30)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm as a per-channel affine with imported stats."""

    features: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, shape, jnp.float32)
        var = self.param("var", nn.initializers.ones, shape, jnp.float32)
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        return x * mul + add


def _conv(features: int, kernel: int, stride: int = 1, name: str = None,
          dtype: jnp.dtype = jnp.bfloat16):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=False,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class Bottleneck(nn.Module):
    """torchvision-style bottleneck (stride on the 3x3 conv)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        y = _conv(self.features, 1, name="conv1", dtype=self.dtype)(x)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn1")(y)
        y = jax.nn.relu(y)
        y = _conv(self.features, 3, self.stride, name="conv2",
                  dtype=self.dtype)(y)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn2")(y)
        y = jax.nn.relu(y)
        y = _conv(self.features * 4, 1, name="conv3", dtype=self.dtype)(y)
        y = FrozenBatchNorm(self.features * 4, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            residual = _conv(self.features * 4, 1, self.stride,
                             name="ds_conv", dtype=self.dtype)(x)
            residual = FrozenBatchNorm(self.features * 4, dtype=self.dtype,
                                       name="ds_bn")(residual)
        return jax.nn.relu(y + residual)


class ResNet(nn.Module):
    """torchvision-compatible ResNet backbone up to layer4 (no fc)."""

    config: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: [B, H, W, 3] normalized float -> [B, H/32, W/32, 2048]."""
        cfg = self.config
        dt = jnp.dtype(cfg.dtype)
        x = x.astype(dt)
        x = nn.Conv(cfg.num_filters, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=dt, param_dtype=jnp.float32, name="conv1")(x)
        x = FrozenBatchNorm(cfg.num_filters, dtype=dt, name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, num_blocks in enumerate(cfg.stage_sizes):
            features = cfg.num_filters * (2 ** stage)
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(features, stride=stride,
                               downsample=(block == 0), dtype=dt,
                               name=f"layer{stage + 1}_{block}")(x)
        return x


class VisualFeatures(nn.Module):
    """Grid (7x7x2048) and pooled (2048) feature heads over one ResNet.

    Folds any leading sample/image axes into the batch before the conv stack.
    """

    config: ResNetConfig = ResNetConfig()

    def setup(self):
        self.backbone = ResNet(self.config)

    def _run(self, images: Array) -> Array:
        lead = images.shape[:-3]
        flat = images.reshape((-1,) + images.shape[-3:])
        feat = self.backbone(flat)  # [N, h, w, 2048]
        return feat, lead

    def grid_features(self, images: Array, att_size: int = None) -> Array:
        """[..., H, W, 3] -> [..., att_size*att_size, 2048] grid features
        (adaptive average pool, resnet_utils.py:24)."""
        att = att_size or self.config.grid_size
        feat, lead = self._run(images)
        n, h, w, c = feat.shape
        if (h, w) != (att, att):
            # adaptive average pooling for h % att == 0 (224 -> 7x7 is identity)
            assert h % att == 0 and w % att == 0, (h, w, att)
            feat = feat.reshape(n, att, h // att, att, w // att, c).mean(axis=(2, 4))
        return feat.reshape(lead + (att * att, c))

    def pooled_features(self, images: Array) -> Array:
        """[..., H, W, 3] -> [..., 2048] spatial mean (resnet_utils.py:50)."""
        feat, lead = self._run(images)
        return feat.mean(axis=(1, 2)).reshape(lead + (feat.shape[-1],))

    def __call__(self, images: Array) -> Array:  # default: grid
        return self.grid_features(images)


def import_torchvision_resnet(state_dict: Dict[str, Any],
                              stage_sizes: Sequence[int] = (3, 8, 36, 3)) -> Dict[str, Any]:
    """Map a torchvision resnet state dict to VisualFeatures params.

    Conv kernels: torch [out, in, kh, kw] -> flax [kh, kw, in, out].
    BN: weight->scale, bias->bias, running_mean->mean, running_var->var.

    Strict: every state-dict key must be consumed (the classifier `fc.*`
    and BN bookkeeping `num_batches_tracked` are the only ignorable ones),
    so a torchvision key-layout drift raises instead of silently dropping
    weights — e.g. a renamed `downsample.{0,1}` would otherwise skip the
    stage-boundary projection entirely.
    """
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    def conv(prefix):
        return {"kernel": take(f"{prefix}.weight").transpose(2, 3, 1, 0)}

    def bn(prefix):
        return {"scale": take(f"{prefix}.weight"),
                "bias": take(f"{prefix}.bias"),
                "mean": take(f"{prefix}.running_mean"),
                "var": take(f"{prefix}.running_var")}

    params: Dict[str, Any] = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            p = f"layer{stage + 1}.{block}"
            entry = {
                "conv1": conv(f"{p}.conv1"), "bn1": bn(f"{p}.bn1"),
                "conv2": conv(f"{p}.conv2"), "bn2": bn(f"{p}.bn2"),
                "conv3": conv(f"{p}.conv3"), "bn3": bn(f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                entry["ds_conv"] = conv(f"{p}.downsample.0")
                entry["ds_bn"] = bn(f"{p}.downsample.1")
            params[f"layer{stage + 1}_{block}"] = entry
    # classifier heads the feature extractor ignores: torchvision's `fc`,
    # the reference vision-label models' `linear` (run_image_categories.py)
    leftover = {k for k in sd if k not in consumed
                and not k.startswith(("fc.", "linear."))
                and not k.endswith("num_batches_tracked")}
    if leftover:
        raise ValueError(
            "unconsumed torchvision resnet keys (layout drift?): "
            + ", ".join(sorted(leftover)[:8])
            + (" ..." if len(leftover) > 8 else ""))
    return {"backbone": params}
