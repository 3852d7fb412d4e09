"""Pallas kernel: on-device uint8 -> normalized float image preprocessing.

The reference converts images to normalized float32 on the CPU and ships
them to the device (vimacsa_dataset.py:25-30 + batch .to(device),
run_multimodal_fcmf.py:439) — 4 bytes/pixel over the host link.  Here the
host ships raw uint8 (1 byte/pixel, 4x less PCIe/ICI traffic and host RAM)
and this kernel fuses /255, mean-subtract, std-divide on the VPU right
before the ResNet stack.

Layout: the [..., 3] channel-minor image tensor is viewed as a flat [R, 128]
lane-aligned block; the channel of each element is recovered as
(flat_index % 3) with broadcasted iotas — no gathers, pure elementwise.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from macsa_tpu.models.resnet import IMAGENET_MEAN, IMAGENET_STD

LANES = 128
BLOCK_ROWS = 256  # 256x128 elements per grid step

# f32 constants mirroring the native pipe's math exactly
# (native/image_pipe.cpp:ip_normalize_f32: (x * (1/255) - mean) * inv_std)
# so the packed device path is bit-identical to the host f32 path.
_INV255 = np.float32(1.0) / np.float32(255.0)
_INV_STD = np.float32(1.0) / np.asarray(IMAGENET_STD, np.float32)


def _kernel(x_ref, o_ref, *, mean, std):
    from jax.experimental import pallas as pl

    x = x_ref[:].astype(jnp.float32) * (1.0 / 255.0)
    rows, lanes = x.shape
    r0 = pl.program_id(0) * rows
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + r0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    ch = (row_ids * lanes + col_ids) % 3
    m = jnp.where(ch == 0, mean[0], jnp.where(ch == 1, mean[1], mean[2]))
    s = jnp.where(ch == 0, std[0], jnp.where(ch == 1, std[1], std[2]))
    o_ref[:] = ((x - m) / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def normalize_images_u8(images: jax.Array, out_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jax.Array:
    """uint8 [..., H, W, 3] -> normalized out_dtype of the same shape.

    Equivalent math to the host-side transform (vimacsa_dataset.py:25-30):
    x/255 -> (x - imagenet_mean) / imagenet_std, per channel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert images.shape[-1] == 3, images.shape
    shape = images.shape
    n = int(np.prod(shape))
    block = BLOCK_ROWS * LANES
    n_pad = -(-n // block) * block
    flat = images.reshape(-1)
    if n_pad != n:
        flat = jnp.pad(flat, (0, n_pad - n))
    flat = flat.reshape(-1, LANES)
    grid = flat.shape[0] // BLOCK_ROWS

    out = pl.pallas_call(
        functools.partial(_kernel, mean=tuple(IMAGENET_MEAN),
                          std=tuple(IMAGENET_STD)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, out_dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat)
    return out.reshape(-1)[:n].reshape(shape)


def normalize_images_u8_reference(images: jax.Array,
                                  out_dtype=jnp.bfloat16) -> jax.Array:
    """Plain-XLA reference implementation (for tests and CPU fallback)."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(out_dtype)


def pack_images_u8(images: np.ndarray) -> np.ndarray:
    """Host side of the packed-uint32 transfer: view a uint8 image batch as
    little-endian uint32 words (4 bytes/word, zero-copy when already
    4-aligned and contiguous).

    Ships 1 byte/pixel over the host link — 4x less traffic than the
    reference's float32 batches (vimacsa_dataset.py:25-30 ship normalized
    f32) — while the device never executes a single uint8 op: the words
    are unpacked with int32 shifts in `unpack_normalize_u32` (uint8
    elementwise compute is ~120x slower on this TPU stack, see
    `device_normalize`)."""
    assert images.dtype == np.uint8, images.dtype
    assert sys.byteorder == "little", \
        "packed transfer assumes little-endian hosts (byte j at bits 8j)"
    flat = np.ascontiguousarray(images).reshape(-1)
    pad = (-flat.size) % 4
    if pad:
        flat = np.pad(flat, (0, pad))
    return flat.view(np.uint32)


def packed_words_per_frame(image_size: int) -> int:
    """Length of one packed frame: 1 validity word + the pixel words."""
    nbytes = image_size * image_size * 3
    assert nbytes % 4 == 0, image_size
    return 1 + nbytes // 4


def pack_pixels_u8(images: np.ndarray,
                   valid: np.ndarray | None = None) -> np.ndarray:
    """Frame-structured host packing for the driver data path:
    uint8 [..., S, S, 3] (+ optional validity [...]) -> uint32
    [..., 1 + S*S*3/4].

    Each frame is self-describing: word 0 is the validity flag, the rest are
    the frame's pixel bytes as little-endian uint32 words.  Invalid frames
    (empty image/ROI slots, unreadable files) unpack to EXACT zeros in
    normalized space — the reference's empty-slot representation
    (vimacsa_dataset.py:130-135 zero-fills AFTER the normalize transform),
    which plain u8 zeros cannot encode ((0/255 - mean)/std != 0).

    Leading axes (batch, image, ROI) are preserved, so the packed tensor
    stays shardable on the batch axis and `unpack_normalize_pixels` can
    recover the frame shape from the word count alone."""
    assert images.dtype == np.uint8, images.dtype
    assert sys.byteorder == "little", \
        "packed transfer assumes little-endian hosts (byte j at bits 8j)"
    assert images.shape[-1] == 3, images.shape
    lead = images.shape[:-3]
    nbytes = int(np.prod(images.shape[-3:]))
    assert nbytes % 4 == 0, images.shape
    words = np.ascontiguousarray(images).reshape(lead + (nbytes,)) \
        .view(np.uint32)
    if valid is None:
        head = np.ones(lead + (1,), np.uint32)
    else:
        assert valid.shape == lead, (valid.shape, lead)
        head = valid.astype(np.uint32).reshape(lead + (1,))
    return np.concatenate([head, words], axis=-1)


@functools.partial(jax.jit, static_argnames=("shape", "out_dtype"))
def unpack_normalize_u32(words: jax.Array, shape, out_dtype=jnp.bfloat16):
    """Device side of the packed-uint32 transfer: uint32 words (little-endian
    packed bytes from `pack_images_u8`) -> normalized image tensor `shape`.

    All device compute is int32/f32: bitcast to int32, extract each byte as
    (w >> 8j) & 0xFF (the mask makes the arithmetic shift exact), then the
    same (x/255 - mean)/std as the host transform.  Equivalent to
    `normalize_images_u8_reference(unpacked_u8)` bit-for-bit."""
    n = int(np.prod(shape))
    assert words.size * 4 >= n, (words.size, shape)
    w = jax.lax.bitcast_convert_type(words, jnp.int32)
    b = jnp.stack([(w >> (8 * j)) & 0xFF for j in range(4)], axis=-1)
    x = b.reshape(-1)[:n].reshape(shape).astype(jnp.float32) * _INV255
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    return ((x - mean) * _INV_STD).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("image_size", "out_dtype"))
def unpack_normalize_pixels(words: jax.Array, image_size: int = 224,
                            out_dtype=jnp.bfloat16) -> jax.Array:
    """Device side of the frame-structured packed transfer
    (`pack_pixels_u8`): uint32 [..., 1 + S*S*3/4] -> normalized out_dtype
    [..., S, S, 3].

    Word 0 of each frame is its validity flag — invalid frames come out as
    exact zeros (the reference's empty-slot value, vimacsa_dataset.py:130-135
    zero-fills after the transform).  The pixel math mirrors the host f32
    pipe's formula ((x * (1/255) - mean) * (1/std), all f32 — see
    native/image_pipe.cpp:ip_normalize_f32); XLA's FMA fusion leaves ~1 ulp
    of freedom, so packed and f32-shipped batches agree to float rounding
    (identical after most bf16 casts)."""
    wpf = packed_words_per_frame(image_size)
    assert words.shape[-1] == wpf, (words.shape, wpf)
    lead = words.shape[:-1]
    shape = lead + (image_size, image_size, 3)
    mask = (words[..., 0] != 0)[..., None, None, None]
    w = jax.lax.bitcast_convert_type(words[..., 1:], jnp.int32)
    b = jnp.stack([(w >> (8 * j)) & 0xFF for j in range(4)], axis=-1)
    x = b.reshape(shape).astype(jnp.float32) * _INV255
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    out = jnp.where(mask, (x - mean) * _INV_STD, 0.0)
    return out.astype(out_dtype)


def device_normalize(images: jax.Array, out_dtype=jnp.bfloat16,
                     use_pallas: bool = False) -> jax.Array:
    """Production entry dispatching on the transfer encoding:

    * uint32 — frame-structured packed words from `pack_pixels_u8` (the
      drivers' default: 1 byte/pixel over the host link, normalize fused
      into int32 unpacking on device; cold-epoch rate 14 -> 46.6 pairs/s
      measured on v5e through the axon tunnel, docs/BENCHMARKS.json),
    * uint8 — raw pixels normalized on device.  Measured caveat (v5e,
      2026-08): uint8 elementwise compute is ~120x slower than f32 on this
      XLA TPU stack (9.1s vs 75ms for a 42MB batch) and Mosaic hangs on
      uint8 VMEM casts — the packed uint32 path exists precisely to ship
      bytes without ever executing a uint8 op,
    * float — already host-normalized (the reference's transfer shape,
      vimacsa_dataset.py:25-30); just cast."""
    if images.dtype == jnp.uint32:
        # frame shape is self-describing: words/frame -> square side
        size = int(np.sqrt((images.shape[-1] - 1) * 4 // 3))
        return unpack_normalize_pixels(images, image_size=size,
                                       out_dtype=out_dtype)
    if images.dtype == jnp.uint8:
        if use_pallas:
            return normalize_images_u8(images, out_dtype)
        return normalize_images_u8_reference(images, out_dtype)
    return images.astype(out_dtype)
