"""Pallas ops tests (interpret mode on CPU): uint8 normalize kernel and the
fused box-bias attention — forward vs unfused XLA reference, and the custom
VJP vs autodiff of the reference."""

import jax
import jax.numpy as jnp
import numpy as np

from macsa_tpu.ops.box_attention_kernel import (
    box_attention_reference,
    fused_box_attention,
)
from macsa_tpu.ops.image_prep import (
    device_normalize,
    normalize_images_u8,
    normalize_images_u8_reference,
    pack_images_u8,
    pack_pixels_u8,
    packed_words_per_frame,
    unpack_normalize_pixels,
    unpack_normalize_u32,
)


def test_normalize_kernel_matches_reference(rng):
    imgs = rng.integers(0, 256, size=(2, 3, 17, 19, 3)).astype(np.uint8)
    got = np.asarray(normalize_images_u8(jnp.asarray(imgs), jnp.float32,
                                         interpret=True))
    want = np.asarray(normalize_images_u8_reference(jnp.asarray(imgs),
                                                    jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_normalize_kernel_odd_sizes(rng):
    # total elements not a multiple of the block: padding path
    imgs = rng.integers(0, 256, size=(1, 5, 7, 3)).astype(np.uint8)
    got = np.asarray(normalize_images_u8(jnp.asarray(imgs), jnp.float32,
                                         interpret=True))
    want = np.asarray(normalize_images_u8_reference(jnp.asarray(imgs),
                                                    jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_packed_u32_transfer_matches_reference(rng):
    # the packed host-link path: pack on host, unpack+normalize on device
    imgs = rng.integers(0, 256, size=(2, 2, 8, 8, 3)).astype(np.uint8)
    words = pack_images_u8(imgs)
    assert words.dtype == np.uint32 and words.size * 4 == imgs.size
    got = np.asarray(unpack_normalize_u32(jnp.asarray(words), imgs.shape,
                                          jnp.float32))
    want = np.asarray(normalize_images_u8_reference(jnp.asarray(imgs),
                                                    jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_packed_u32_transfer_pad_path(rng):
    # element count not a multiple of 4: the host pads, the unpack trims
    imgs = rng.integers(0, 256, size=(3, 5, 3)).astype(np.uint8)
    words = pack_images_u8(imgs)
    got = np.asarray(unpack_normalize_u32(jnp.asarray(words), imgs.shape,
                                          jnp.float32))
    want = np.asarray(normalize_images_u8_reference(jnp.asarray(imgs),
                                                    jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_frame_packed_transfer_roundtrip(rng):
    # the drivers' packed path: per-frame validity word + pixel words
    s = 16
    imgs = rng.integers(0, 256, size=(2, 3, s, s, 3)).astype(np.uint8)
    valid = np.array([[True, False, True], [True, True, False]])
    words = pack_pixels_u8(imgs, valid)
    assert words.shape == (2, 3, packed_words_per_frame(s))
    assert words.dtype == np.uint32
    got = np.asarray(unpack_normalize_pixels(jnp.asarray(words), s,
                                             jnp.float32))
    want = np.array(normalize_images_u8_reference(jnp.asarray(imgs),
                                                  jnp.float32))
    want[~valid] = 0.0  # invalid frames are EXACT zeros (reference's
    #                     empty-slot value, vimacsa_dataset.py:130-135)
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-6, atol=1e-6)
    assert (got[~valid] == 0.0).all()


def test_frame_packed_matches_host_f32(rng):
    # the packed device math mirrors the host f32 pipe's formula
    # ((x * (1/255) - mean) * inv_std, data/images.py:resize_normalize);
    # XLA's FMA fusion leaves ~1 ulp of freedom, hence allclose not equal
    from macsa_tpu.models.resnet import IMAGENET_MEAN, IMAGENET_STD
    s = 8
    imgs = rng.integers(0, 256, size=(4, s, s, 3)).astype(np.uint8)
    inv255 = np.float32(1.0) / np.float32(255.0)
    inv_std = np.float32(1.0) / np.asarray(IMAGENET_STD, np.float32)
    host = (imgs.astype(np.float32) * inv255
            - np.asarray(IMAGENET_MEAN, np.float32)) * inv_std
    got = np.asarray(unpack_normalize_pixels(
        jnp.asarray(pack_pixels_u8(imgs)), s, jnp.float32))
    np.testing.assert_allclose(got, host, rtol=1e-6, atol=1e-6)


def test_device_normalize_dispatch(rng):
    # uint32 packed frames route through the self-describing unpack
    s = 16
    imgs = rng.integers(0, 256, size=(2, s, s, 3)).astype(np.uint8)
    got = np.asarray(device_normalize(jnp.asarray(pack_pixels_u8(imgs)),
                                      jnp.float32))
    want = np.asarray(normalize_images_u8_reference(jnp.asarray(imgs),
                                                    jnp.float32))
    assert got.shape == imgs.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _inputs(rng, bh=3, n=4, d=96):
    q = rng.normal(size=(bh, n, d)).astype(np.float32)
    k = rng.normal(size=(bh, n, d)).astype(np.float32)
    v = rng.normal(size=(bh, n, d)).astype(np.float32)
    gates = np.maximum(rng.normal(size=(bh, n, n)), 0).astype(np.float32)
    return map(jnp.asarray, (q, k, v, gates))


def test_fused_box_attention_forward(rng):
    q, k, v, gates = _inputs(rng)
    got = np.asarray(fused_box_attention(q, k, v, gates, True))
    want = np.asarray(box_attention_reference(q, k, v, gates))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_box_attention_grad(rng):
    q, k, v, gates = _inputs(rng, bh=2, n=4, d=8)

    def loss_fused(q, k, v, g):
        return jnp.sum(fused_box_attention(q, k, v, g, True) ** 2)

    def loss_ref(q, k, v, g):
        return jnp.sum(box_attention_reference(q, k, v, g) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, gates)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, gates)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
