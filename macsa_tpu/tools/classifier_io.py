"""Load/save AspectClassifier params (orbax dirs or reference torch .pth)."""

from __future__ import annotations

import os
from typing import Any, Dict


def load_classifier_params(path: str, model) -> Dict[str, Any]:
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        return raw if "params" in raw else {"params": raw}
    from macsa_tpu.models.aspect_classifier import import_torch_aspect_classifier
    from macsa_tpu.train.torch_import import load_torch_checkpoint
    sd = load_torch_checkpoint(path)
    return {"params": import_torch_aspect_classifier(sd)}


def save_classifier_params(path: str, params: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
