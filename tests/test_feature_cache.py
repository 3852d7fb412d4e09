"""Frozen-CNN visual feature cache tests (train/feature_cache.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from macsa_tpu.train.feature_cache import VisualFeatureCache


def test_scatter_gather_roundtrip(rng):
    cache = VisualFeatureCache(10, num_imgs=2, num_roi=2, num_patches=4,
                               feat_dim=8, dtype=jnp.float32)
    grid = jnp.asarray(rng.normal(size=(3, 2, 4, 8)), jnp.float32)
    roi = jnp.asarray(rng.normal(size=(3, 2, 2, 8)), jnp.float32)
    idx = np.asarray([7, 2, 5], np.int32)
    cache.update(idx, grid, roi)
    g2, r2 = cache.lookup(idx)
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(grid))
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(roi))
    # untouched rows stay zero
    g0, _ = cache.lookup(np.asarray([0], np.int32))
    assert float(np.abs(np.asarray(g0)).sum()) == 0.0


def test_pad_rows_dropped(rng):
    """Index -1 (padded eval rows) must not corrupt any cache row."""
    cache = VisualFeatureCache(4, num_imgs=1, num_roi=1, num_patches=2,
                               feat_dim=4, dtype=jnp.float32)
    real = jnp.ones((1, 1, 2, 4), jnp.float32)
    cache.update(np.asarray([3], np.int32), real, jnp.ones((1, 1, 1, 4)))
    junk = jnp.full((2, 1, 2, 4), 99.0)
    cache.update(np.asarray([-1, -1], np.int32), junk,
                 jnp.full((2, 1, 1, 4), 99.0))
    full = np.asarray(cache.grid)
    assert (full[3] == 1.0).all()
    assert (full[:3] == 0.0).all()  # -1 scatters dropped, nothing else touched


# --- cross-stage on-disk cache (train/disk_feature_cache.py) -------------

def _bf16():
    import ml_dtypes
    return np.dtype(ml_dtypes.bfloat16)


def test_disk_cache_store_load_roundtrip(tmp_path, rng):
    from macsa_tpu.train.disk_feature_cache import DiskFeatureCache
    disk = DiskFeatureCache(str(tmp_path / "cache"))
    grid = rng.normal(size=(3, 2, 4, 8)).astype(_bf16())
    roi = rng.normal(size=(3, 2, 2, 8)).astype(_bf16())
    keys = ["k0", "k1", "k2"]
    assert not disk.has("k0")
    disk.store_async(keys, grid, roi)
    disk.flush()
    assert all(disk.has(k) for k in keys)
    g2, r2 = disk.load(["k2", "k0"])
    np.testing.assert_array_equal(g2.view(np.uint16),
                                  grid[[2, 0]].view(np.uint16))
    np.testing.assert_array_equal(r2.view(np.uint16),
                                  roi[[2, 0]].view(np.uint16))
    # a fresh instance re-indexes from disk (the cross-PROCESS reuse)
    disk2 = DiskFeatureCache(str(tmp_path / "cache"))
    assert len(disk2) == 3 and disk2.has("k1")


def test_disk_cache_prefill_hbm(tmp_path, rng):
    from macsa_tpu.train.disk_feature_cache import (DiskFeatureCache,
                                                    prefill_hbm_cache)
    disk = DiskFeatureCache(str(tmp_path / "cache"))
    grid = rng.normal(size=(2, 1, 2, 4)).astype(_bf16())
    roi = rng.normal(size=(2, 1, 1, 4)).astype(_bf16())
    disk.store_async(["a", "b"], grid, roi)
    disk.flush()
    cache = VisualFeatureCache(4, num_imgs=1, num_roi=1, num_patches=2,
                               feat_dim=4, dtype=jnp.bfloat16)
    # rows 1 and 3 have disk entries; row 0 has none; row 2 is unkeyed
    loaded = prefill_hbm_cache(disk, ["missing", "a", None, "b"], cache)
    np.testing.assert_array_equal(loaded, [False, True, False, True])
    g, r = cache.lookup(np.asarray([1, 3], np.int32))
    np.testing.assert_array_equal(np.asarray(g).view(np.uint16),
                                  grid.view(np.uint16))
    np.testing.assert_array_equal(np.asarray(r).view(np.uint16),
                                  roi.view(np.uint16))


def test_record_key_content_addressing(tmp_path):
    """Keys change with image bytes, boxes, shapes, and extractor identity —
    and only with those."""
    from macsa_tpu.train.disk_feature_cache import record_key
    (tmp_path / "x.png").write_bytes(b"imagebytes-v1")
    boxes = {"x.png": [(1.0, 2.0, 3.0, 4.0)]}
    k = lambda **kw: record_key(
        kw.pop("names", ["x.png"]), str(tmp_path),
        kw.pop("boxes", boxes), kw.pop("num_img", 2),
        kw.pop("num_roi", 2), kw.pop("fp", "fp1"))
    base = k()
    assert k() == base  # deterministic
    assert k(fp="fp2") != base
    assert k(num_img=3) != base
    assert k(boxes={"x.png": [(1.0, 2.0, 3.0, 5.0)]}) != base
    assert k(names=[]) != base
    # image content change must invalidate (file_content_hash memoizes per
    # path, so write a NEW path with different bytes to model it)
    (tmp_path / "y.png").write_bytes(b"imagebytes-v2")
    boxes2 = {"y.png": boxes["x.png"]}
    assert k(names=["y.png"], boxes=boxes2) != base
    # absent files key as absent, not as an error
    assert k(names=["nope.png"]) != base
