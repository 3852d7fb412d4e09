"""Host-side image pipeline: decode, resize, normalize, ROI crops.

Equivalent of the reference's torchvision transform stack
(reference: vimacsa_dataset.py:25-30,123-199): Resize((224,224), antialias),
float conversion, ImageNet normalization; ROI crops sliced from the *raw*
decoded image with (x1:x2, y1:y2) indexing the (H, W) axes — the reference's
axis convention (vimacsa_dataset.py:153) — then the same transform; box
coordinates normalized by 512 and clipped to [0,1] (vimacsa_dataset.py:159-164).

TPU notes: everything returns NHWC float32 (the native TPU conv layout; the
reference is NCHW).  Unreadable images become zero tensors, matching the
reference's soft fault tolerance (vimacsa_dataset.py:130-135).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
IMAGE_SIZE = 224
COORD_NORM = 512.0


def decode_image(path: str) -> Optional[np.ndarray]:
    """Read an image file -> uint8 HWC RGB array, or None on failure.

    Tries the native libjpeg/libpng decoder first (macsa_tpu/native — GIL
    released, scales across loader threads), then PIL for anything the
    native path can't handle (other formats, CMYK JPEGs, missing
    toolchain)."""
    from macsa_tpu import native
    out = native.decode(path)
    if out is not None:
        return out
    try:
        from PIL import Image
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None


def resize_u8(img: np.ndarray, size: int = IMAGE_SIZE) -> np.ndarray:
    """uint8 HWC -> uint8 [size, size, 3] via antialiased bilinear resize
    (the semantics of torchvision Resize(antialias=True)).  Native C++
    triangle-filter kernel when built, PIL otherwise (same algorithm;
    outputs agree within +-2/255 — Pillow quantizes filter coefficients)."""
    if img.shape[0] == size and img.shape[1] == size:
        return img
    from macsa_tpu import native
    out = native.resize_u8(img, size)
    if out is not None:
        return out
    from PIL import Image
    pil = Image.fromarray(img)
    return np.asarray(pil.resize((size, size), Image.BILINEAR), np.uint8)


def resize_normalize(img: np.ndarray, size: int = IMAGE_SIZE) -> np.ndarray:
    """uint8 HWC -> normalized float32 [size, size, 3] (fused native kernel
    when available; the fallback mirrors its math — multiply by the f32
    reciprocals, image_pipe.cpp:ip_normalize_f32 — so f32 and packed
    transfers agree to float rounding either way)."""
    from macsa_tpu import native
    out = native.resize_normalize(img, size, IMAGENET_MEAN, IMAGENET_STD)
    if out is not None:
        return out
    inv255 = np.float32(1.0) / np.float32(255.0)
    inv_std = np.float32(1.0) / IMAGENET_STD
    x = resize_u8(img, size).astype(np.float32) * inv255
    return (x - IMAGENET_MEAN) * inv_std


def crop_roi(img: np.ndarray, box: Sequence[float]) -> Optional[np.ndarray]:
    """box = (x1, x2, y1, y2) indexing (H, W) as the reference does
    (vimacsa_dataset.py:151-153).  Returns the raw uint8 crop or None if
    empty."""
    h, w = img.shape[:2]
    x1, x2, y1, y2 = box
    x1, x2 = max(0, int(x1)), min(h, int(x2))
    y1, y2 = max(0, int(y1)), min(w, int(y2))
    crop = img[x1:x2, y1:y2]
    if crop.size == 0:
        return None
    return crop


def normalize_coords(box: Sequence[float]) -> np.ndarray:
    """(x1, x2, y1, y2) / 512 clipped to [0, 1] (vimacsa_dataset.py:159-164)."""
    return np.clip(np.asarray(box, np.float32) / COORD_NORM, 0.0, 1.0)


def build_visual_tensors(
    img_paths: Sequence[str],
    img_folder: str,
    roi_boxes: Dict[str, List[Tuple[float, float, float, float]]],
    num_img: int,
    num_roi: int,
    size: int = IMAGE_SIZE,
    pixel_mode: str = "f32",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (images, roi_images, roi_coors [num_img, num_roi, 4]), zero-padded.

    Mirrors vimacsa_dataset.py:123-199 / iaog_dataset.py:113-153.
    `pixel_mode` selects the host->device transfer encoding:
    * "f32": normalized float32 frames [.., S, S, 3] — the reference's exact
      transfer shape (vimacsa_dataset.py:25-30, 4 bytes/pixel);
    * "packed" (drivers' default): uint32 words [.., 1 + S*S*3/4] from
      ops.image_prep.pack_pixels_u8 — 1 byte/pixel over the host link,
      normalization fused into the on-device int32 unpack, empty slots
      carried as validity words so they unpack to the reference's exact
      zero tensors;
    * "u8": raw uint8 frames (kept for tests/micro-benchmarks; uint8
      elementwise device compute is slow — see ops.image_prep)."""
    assert pixel_mode in ("f32", "packed", "u8"), pixel_mode
    u8 = pixel_mode in ("packed", "u8")
    pix = np.uint8 if u8 else np.float32
    prep = resize_u8 if u8 else resize_normalize
    images = np.zeros((num_img, size, size, 3), pix)
    rois = np.zeros((num_img, num_roi, size, size, 3), pix)
    coors = np.zeros((num_img, num_roi, 4), np.float32)
    img_valid = np.zeros((num_img,), np.bool_)
    roi_valid = np.zeros((num_img, num_roi), np.bool_)

    for i, name in enumerate(list(img_paths)[:num_img]):
        raw = decode_image(os.path.join(img_folder, name))
        if raw is not None:
            images[i] = prep(raw, size)
            img_valid[i] = True
        boxes = roi_boxes.get(name, [])[:num_roi]
        if raw is None or not boxes:
            continue
        for r, box in enumerate(boxes):
            crop = crop_roi(raw, box)
            if crop is not None:
                rois[i, r] = prep(crop, size)
                roi_valid[i, r] = True
            coors[i, r] = normalize_coords(box)
    if pixel_mode == "packed":
        from macsa_tpu.ops.image_prep import pack_pixels_u8
        images = pack_pixels_u8(images, img_valid)
        rois = pack_pixels_u8(rois, roi_valid)
    return images, rois, coors


def roi_boxes_from_csv(path: str, suffix: str = ".png") -> Dict[str, list]:
    """roi_data.csv -> {file_name: [(x1, x2, y1, y2), ...]} preserving row
    order.  The reference appends '.png' to file names
    (run_multimodal_fcmf.py:182)."""
    import csv
    out: Dict[str, list] = {}
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        for row in reader:
            name = row[0] + suffix
            box = tuple(float(v) for v in row[1:5])
            out.setdefault(name, []).append(box)
    return out
