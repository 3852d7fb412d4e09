"""HBM-resident visual feature cache for frozen-CNN training.

The reference re-runs all 35 ResNet-152 forwards on the SAME images every
epoch (run_multimodal_fcmf.py:448-460) even though the backbone is frozen
(`if_fine_tune=False`, resnet_utils.py:26-28) — the features are constant
across epochs.  Here epoch 0 computes them once and scatters them into
device-resident cache arrays; later epochs gather by sample index and skip
both the ResNet stack and the raw-pixel host->device transfer (~4 bytes/pixel
x 35 frames/sample) entirely.  Exact: eval-mode BN + stop_gradient means the
cached features are bit-identical to recomputation.

Memory: n_samples x I x (49 + R) x 2048 bf16 — ~1.5 MB/sample at the
reference shapes (I=7, R=4), ~4.4 GB for the full ViMACSA train split.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class VisualFeatureCache:
    def __init__(self, n_samples: int, num_imgs: int, num_roi: int,
                 num_patches: int = 49, feat_dim: int = 2048,
                 dtype=jnp.bfloat16, mesh=None):
        self.n = n_samples
        shape_g = (n_samples, num_imgs, num_patches, feat_dim)
        shape_r = (n_samples, num_imgs, num_roi, feat_dim)
        self.grid = jnp.zeros(shape_g, dtype)
        self.roi = jnp.zeros(shape_r, dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            self.grid = jax.device_put(self.grid, repl)
            self.roi = jax.device_put(self.roi, repl)
        # in-place scatter: donate the cache buffer so no copy is made.
        # Padded eval rows carry index -1; negative indices WRAP in jax
        # before mode="drop" can reject them, so remap them out of bounds
        # first — then the scatter genuinely drops them.
        def _scatter(c, v, i):
            i = jnp.where(i < 0, c.shape[0], i)
            return c.at[i].set(v, mode="drop")
        self._scatter = jax.jit(_scatter, donate_argnums=(0,))
        self._gather = jax.jit(lambda c, i: c[i])

    @property
    def nbytes(self) -> int:
        return self.grid.nbytes + self.roi.nbytes

    def update(self, idx: np.ndarray, grid: Array, roi: Array) -> None:
        idx = jnp.asarray(idx, jnp.int32)
        self.grid = self._scatter(self.grid, grid.astype(self.grid.dtype), idx)
        self.roi = self._scatter(self.roi, roi.astype(self.roi.dtype), idx)

    def lookup(self, idx: np.ndarray) -> Tuple[Array, Array]:
        idx = jnp.asarray(idx, jnp.int32)
        return self._gather(self.grid, idx), self._gather(self.roi, idx)
