"""ResNet-152 + Linear aspect classifiers for images and ROIs.

Equivalent of the reference's MyImgModel / MyRoIModel
(reference: fcmf_framework/image_process.py:29-49,
image_processing/run_image_categories.py, run_roi_categories.py):
a ResNet-152 global-average feature -> Linear(2048, num_classes).
The image variant is multi-label (sigmoid), the ROI variant single-label
(argmax) — the distinction lives in the predict functions, the module is
shared.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from macsa_tpu.config import ResNetConfig
from macsa_tpu.models.resnet import ResNet, import_torchvision_resnet

Array = jax.Array


class AspectClassifier(nn.Module):
    num_classes: int
    config: ResNetConfig = ResNetConfig()

    def setup(self):
        self.backbone = ResNet(self.config)
        self.linear = nn.Dense(self.num_classes, dtype=jnp.float32,
                               param_dtype=jnp.float32)

    def features(self, images: Array) -> Array:
        """[..., H, W, 3] -> [..., 2048] pooled features."""
        lead = images.shape[:-3]
        flat = images.reshape((-1,) + images.shape[-3:])
        feat = self.backbone(flat).mean(axis=(1, 2))
        return feat.reshape(lead + (feat.shape[-1],))

    def __call__(self, images: Array) -> Array:
        return self.linear(self.features(images).astype(jnp.float32))


def predict_image_aspects(logits: Array, aspect_names, threshold: float = 0.45):
    """Multi-label sigmoid > threshold (run_image_categories.py:339 uses 0.45;
    inference.py path uses 0.6, image_process.py:186)."""
    probs = jax.nn.sigmoid(logits)
    out = []
    for row in np.asarray(probs):
        out.append([aspect_names[i] for i in np.where(row > threshold)[0]])
    return out


def predict_roi_aspects(logits: Array, aspect_names):
    """Single-label argmax (image_process.py:156-158)."""
    idx = np.asarray(jnp.argmax(logits, axis=-1))
    return [aspect_names[i] for i in idx]


def import_torch_aspect_classifier(state_dict: Dict[str, Any],
                                   stage_sizes=(3, 8, 36, 3)) -> Dict[str, Any]:
    """MyImgModel/MyRoIModel state dict -> AspectClassifier params.

    The torch model wraps resnet in `feature_extractor`/`no_fc` Sequentials;
    the conv weights keep their `feature_extractor.*` names."""
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        if k.startswith("feature_extractor."):
            k = k[len("feature_extractor."):]
        if k.startswith("no_fc."):
            continue  # duplicate view of the same tensors
        sd[k] = np.asarray(v)
    backbone = import_torchvision_resnet(sd, stage_sizes)["backbone"]
    return {
        "backbone": backbone,
        "linear": {"kernel": sd["linear.weight"].T, "bias": sd["linear.bias"]},
    }
