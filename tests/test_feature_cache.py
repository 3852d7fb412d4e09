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
