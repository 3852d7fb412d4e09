"""Online visual pipeline for single-sample inference.

Behavioral equivalent of the reference's image_process.py: ROI detection with
a class-drop list (image_process.py:13-18,115-142), greedy per-category box
merging with epsilon proximity (:69-113), image/ROI aspect-tag prediction
(:144-189), and auxiliary-feature construction (:229-317) — with a pluggable
detector instead of a hard YOLO dependency:

* `YoloDetector` — used when `ultralytics` is importable and a weights file is
  given (the reference's path),
* `PrecomputedDetector` — boxes from a roi_data.csv-style mapping (the
  training-time source of truth), the default in this environment.

Note the reference's coordinate quirk, reproduced here: detector boxes are
(x1, y1, x2, y2) in image (W, H) space, but the crop treats the tuple as
(y1, x1, y2, x2) when slicing (image_process.py:152,257: `y1, x1, y2, x2 =
coordinates` then `image[:, x1:x2, y1:y2]`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from macsa_tpu.data.images import (crop_roi, decode_image, normalize_coords,
                                   resize_normalize)

# image_process.py:13-18
DROP_ROI_LIST = [
    "mortor", "car", "fork", "spoon", "knife", "cow", "bus", "cell phone",
    "carrot", "stop sign", "handbag", "train", "backpack", "suitcase",
    "scissors", "boat", "orange", "airplane", "apple", "sport ball", "truck",
    "cat", "tie", "frisbee", "traffic light", "book", "remote", "surfboard",
    "tennis racket", "dinning table", "airplane", "keyboard", "mouse",
    "skateboard", "dining table", "sheep", "teddy bear", "zebra", "kite",
    "bear", "vase", "tv",
]


def are_boxes_nearby(coords1, coords2, epsilon) -> bool:
    """All four corner deltas within epsilon (image_process.py:92-103)."""
    return all(abs(a - b) <= epsilon for a, b in zip(coords1, coords2))


def merge_coordinates(coords1, coords2):
    x1a, y1a, x1b, y1b = coords1
    x2a, y2a, x2b, y2b = coords2
    return (min(x1a, x2a), min(y1a, y2a), max(x1b, x2b), max(y1b, y2b))


def merge_boxes(boxes: List[Dict], epsilon: float) -> Dict[str, Dict]:
    """Greedy per-category merge (image_process.py:69-90) — including its
    counter semantics: the suffix counter i increments once per box whose
    category was already seen (merged OR split off), so a non-nearby
    same-category box becomes 'category_<i>' with that running count."""
    merged: Dict[str, Dict] = {}
    i = 1
    for box in boxes:
        category = box["category"]
        coordinates = box["coordinates"]
        if category not in merged:
            merged[category] = {"coordinates": tuple(coordinates), "count": 1}
        else:
            current = merged[category]["coordinates"]
            if are_boxes_nearby(current, coordinates, epsilon):
                merged[category]["coordinates"] = merge_coordinates(
                    current, coordinates)
                merged[category]["count"] += 1
            else:
                merged[f"{category}_{i}"] = {"coordinates": tuple(coordinates),
                                             "count": 1}
            i += 1
    return merged


class PrecomputedDetector:
    """Detection from a {image_name: [(x1, x2, y1, y2), ...]} mapping (the
    roi_data.csv source used at training time).  Boxes are returned in the
    detector (x1, y1, x2, y2) order expected by merge/crop."""

    def __init__(self, roi_boxes: Dict[str, list]):
        self.roi_boxes = roi_boxes

    def __call__(self, image_path: str) -> List[Dict]:
        import os
        name = os.path.basename(image_path)
        boxes = self.roi_boxes.get(name) or self.roi_boxes.get(image_path) or []
        out = []
        for j, (x1, x2, y1, y2) in enumerate(boxes):
            # csv stores crop-order (x1, x2, y1, y2) on (H, W); convert to the
            # detector's (x1, y1, x2, y2) in (W, H) so the shared crop quirk
            # round-trips identically
            out.append({"category": f"roi_{j}",
                        "coordinates": [int(y1), int(x1), int(y2), int(x2)]})
        return out


class YoloDetector:
    """Ultralytics YOLO v8 detection with the drop list
    (image_process.py:115-142).  Optional dependency."""

    def __init__(self, weights_path: str, class_map: Optional[Dict] = None,
                 drop_list: Sequence[str] = tuple(DROP_ROI_LIST)):
        from ultralytics import YOLO  # gated import
        self.model = YOLO(weights_path)
        self.class_map = class_map
        self.drop_list = set(drop_list)

    def __call__(self, image_path: str) -> List[Dict]:
        results = self.model(image_path, verbose=False)
        boxes = []
        for r in results:
            names = self.class_map or r.names
            for b, c in zip(r.boxes.xyxy, r.boxes.cls):
                cls_name = names[int(c)]
                if cls_name in self.drop_list:
                    continue
                x1, y1, x2, y2 = [int(v) for v in np.asarray(b)]
                boxes.append({"category": cls_name,
                              "coordinates": [x1, y1, x2, y2]})
        return boxes


def construct_visual_features(
    detector, list_img_path: Sequence[str], eps: float, num_roi: int,
    num_img: int, size: int = 224,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (images [num_img, S, S, 3], roi_images [num_img, num_roi, S, S, 3],
    roi_coors [num_img, num_roi, 4]) — image_process.py:229-317, NHWC."""
    images = np.zeros((num_img, size, size, 3), np.float32)
    rois = np.zeros((num_img, num_roi, size, size, 3), np.float32)
    coors = np.zeros((num_img, num_roi, 4), np.float32)

    for i, path in enumerate(list(list_img_path)[:num_img]):
        raw = decode_image(path)
        if raw is None:
            continue
        images[i] = resize_normalize(raw, size)
        merged = merge_boxes(detector(path), eps)
        r = 0
        for _, box in merged.items():
            if r == num_roi:
                break
            # the reference's unpack quirk: (y1, x1, y2, x2) = coordinates
            y1, x1, y2, x2 = box["coordinates"]
            crop = crop_roi(raw, (x1, x2, y1, y2))
            if crop is not None:
                rois[i, r] = resize_normalize(crop, size)
            coors[i, r] = normalize_coords((x1, x2, y1, y2))
            r += 1
    return images, rois, coors


def predict_visual_tags(detector, image_model, image_params, roi_model,
                        roi_params, list_img_path: Sequence[str],
                        aspect_names: Sequence[str], eps: float = 30.0,
                        image_threshold: float = 0.6,
                        size: int = 224) -> Tuple[List[str], List[str]]:
    """Image-level (multi-label sigmoid) and ROI-level (argmax) aspect tags
    (image_process.py:144-211)."""
    import jax.numpy as jnp
    from macsa_tpu.models.aspect_classifier import (predict_image_aspects,
                                                    predict_roi_aspects)
    image_tags: List[str] = []
    roi_tags: List[str] = []
    for path in list_img_path:
        raw = decode_image(path)
        if raw is None:
            continue
        img = resize_normalize(raw, size)[None]
        logits = image_model.apply(image_params, jnp.asarray(img))
        image_tags.extend(predict_image_aspects(logits, aspect_names,
                                                image_threshold)[0])
        merged = merge_boxes(detector(path), eps)
        crops = []
        for _, box in merged.items():
            y1, x1, y2, x2 = box["coordinates"]
            crop = crop_roi(raw, (x1, x2, y1, y2))
            if crop is not None:
                crops.append(resize_normalize(crop, size))
        if crops:
            logits = roi_model.apply(roi_params, jnp.asarray(np.stack(crops)))
            roi_tags.extend(predict_roi_aspects(logits, aspect_names))
    return list(dict.fromkeys(image_tags)), list(dict.fromkeys(roi_tags))
