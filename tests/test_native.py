"""Native host image pipeline (macsa_tpu/native) parity tests.

Pins three contracts:
* decode: bit-exact vs PIL for PNG (all color types) and JPEG (both ride
  the same libjpeg),
* resize: exact vs a float64 numpy implementation of the triangle-filter
  resampler, and within +-2/255 of PIL's fixed-point implementation,
* the Python fallback path produces the same tensors (loose pixel
  tolerance) so a host without a toolchain degrades gracefully.
"""

import os

import numpy as np
import pytest

from macsa_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native image pipeline not built")


@pytest.fixture
def tmp_images(tmp_path, rng):
    from PIL import Image
    img = rng.integers(0, 256, size=(61, 47, 3), dtype=np.uint8)
    paths = {}
    paths["png"] = str(tmp_path / "a.png")
    Image.fromarray(img).save(paths["png"])
    paths["jpg"] = str(tmp_path / "a.jpg")
    Image.fromarray(img).save(paths["jpg"], quality=90)
    paths["gray_png"] = str(tmp_path / "g.png")
    Image.fromarray(img[:, :, 0]).save(paths["gray_png"])
    paths["rgba_png"] = str(tmp_path / "r.png")
    Image.fromarray(np.dstack([img, img[:, :, :1]]), "RGBA").save(
        paths["rgba_png"])
    paths["gray_jpg"] = str(tmp_path / "g.jpg")
    Image.fromarray(img[:, :, 0]).save(paths["gray_jpg"])
    paths["garbage"] = str(tmp_path / "bad.jpg")
    with open(paths["garbage"], "wb") as f:
        f.write(b"\xff\xd8\xffnot really a jpeg")
    return img, paths


def _pil_rgb(path):
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def test_decode_parity(tmp_images):
    img, paths = tmp_images
    assert np.array_equal(native.decode(paths["png"]), img)
    for key in ["jpg", "gray_png", "rgba_png", "gray_jpg"]:
        ours, pil = native.decode(paths[key]), _pil_rgb(paths[key])
        assert ours is not None and ours.shape == pil.shape
        assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1, key


def test_decode_failure_returns_none(tmp_images):
    _, paths = tmp_images
    assert native.decode(paths["garbage"]) is None
    assert native.decode(str(paths["png"]) + ".missing") is None


def test_decode_image_fallback(tmp_images, monkeypatch):
    """data.images.decode_image survives a native miss via PIL."""
    from macsa_tpu.data import images
    img, paths = tmp_images
    monkeypatch.setattr(native, "decode", lambda path: None)
    out = images.decode_image(paths["png"])
    assert np.array_equal(out, img)
    assert images.decode_image(paths["garbage"]) is None


def _resize_reference(img: np.ndarray, size: int) -> np.ndarray:
    """float64 triangle-filter resampler (the algorithm image_pipe.cpp
    implements), separable horizontal-then-vertical."""
    def coeffs(in_size, out_size):
        scale = in_size / out_size
        fscale = max(scale, 1.0)
        support = fscale
        rows = []
        for i in range(out_size):
            center = (i + 0.5) * scale
            mn = max(int(np.floor(center - support)), 0)
            mx = min(int(np.ceil(center + support)), in_size)
            k = np.arange(mn, mx)
            w = np.clip(1.0 - np.abs((k + 0.5 - center) / fscale), 0.0, None)
            rows.append((mn, w / w.sum()))
        return rows

    x = img.astype(np.float64)
    out_h = np.empty((img.shape[0], size, 3))
    for j, (mn, w) in enumerate(coeffs(img.shape[1], size)):
        out_h[:, j] = np.einsum("hkc,k->hc", x[:, mn:mn + len(w)], w)
    out = np.empty((size, size, 3))
    for i, (mn, w) in enumerate(coeffs(img.shape[0], size)):
        out[i] = np.einsum("khc,k->hc", out_h[mn:mn + len(w)], w)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(37, 53), (300, 10), (224, 224), (64, 640)])
def test_resize_matches_float_reference(rng, shape):
    img = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
    ours = native.resize_u8(img, 224)
    ref = _resize_reference(img, 224)
    # identical algorithm; <=1 covers double-vs-double summation-order ties
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_resize_identity(rng):
    img = rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8)
    assert np.array_equal(native.resize_u8(img, 224), img)


@pytest.mark.parametrize("shape", [(37, 53), (480, 640)])
def test_resize_close_to_pil(rng, shape):
    from PIL import Image
    img = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
    ours = native.resize_u8(img, 224)
    pil = np.asarray(Image.fromarray(img).resize((224, 224), Image.BILINEAR),
                     np.uint8)
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 2


def test_resize_normalize_fused(rng):
    from macsa_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD
    img = rng.integers(0, 256, size=(61, 47, 3), dtype=np.uint8)
    fused = native.resize_normalize(img, 224, IMAGENET_MEAN, IMAGENET_STD)
    resized = native.resize_u8(img, 224).astype(np.float32) / 255.0
    unfused = (resized - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(fused, unfused, atol=1e-5)


def test_build_visual_tensors_native_vs_python(tmp_path, rng, monkeypatch):
    """End-to-end: the native-backed and pure-PIL pipelines build the same
    sample tensors (within the documented +-2/255 resize divergence)."""
    from PIL import Image
    from macsa_tpu.data import images as di

    folder = tmp_path / "imgs"
    folder.mkdir()
    names, boxes = [], {}
    for i in range(2):
        arr = rng.integers(0, 256, size=(97, 83, 3), dtype=np.uint8)
        name = f"i{i}.jpg"
        Image.fromarray(arr).save(str(folder / name), quality=95)
        names.append(name)
        boxes[name] = [(5.0, 60.0, 4.0, 50.0), (0.0, 97.0, 0.0, 83.0)]

    args = (names, str(folder), boxes, 3, 2)
    native_out = di.build_visual_tensors(*args)

    monkeypatch.setattr(native, "decode", lambda path: None)
    monkeypatch.setattr(native, "resize_u8", lambda img, size: None)
    monkeypatch.setattr(native, "resize_normalize",
                        lambda img, size, mean, std: None)
    python_out = di.build_visual_tensors(*args)

    for a, b in zip(native_out, python_out):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_allclose(a, b, atol=2.5 / 255 / 0.225)


def test_ensure_built_idempotent():
    assert native.ensure_built()
    assert os.path.exists(native._SO)
