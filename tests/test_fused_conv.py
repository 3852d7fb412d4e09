"""Fused-ResNet experiment (tools_dev/fused_resnet_experiment.py) parity.

The kernels are retired from the product tree (measured slower than XLA's
conv pipeline at every stage subset — see the experiment module's STATUS),
but stay parity-tested so the scaffold remains trustworthy if the tiling
is ever re-attempted.  All checks run in interpret mode on the CPU test
platform against the unfused XLA math (f32, highest precision): the raw
kernel vs a numpy-style reference, its custom VJP vs autodiff of the
reference, and the full fused backbone / extract_features vs the Flax
`VisualFeatures` module on the identical parameter pytree.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macsa_tpu.config import ResNetConfig
from macsa_tpu.models.resnet import VisualFeatures

_spec = importlib.util.spec_from_file_location(
    "fused_resnet_experiment",
    os.path.join(os.path.dirname(__file__), os.pardir, "tools_dev",
                 "fused_resnet_experiment.py"))
fused_resnet = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fused_resnet)
_tile_m = fused_resnet._tile_m
fused_matmul_bn_act = fused_resnet.fused_matmul_bn_act


def _ref(x2, w, mul, add, res=None, relu=True):
    y = (x2 @ w) * mul + add
    if res is not None:
        y = y + res
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("m", [16, 300, 512])
@pytest.mark.parametrize("has_res,relu", [(True, True), (False, True),
                                          (True, False)])
def test_kernel_matches_reference(rng, m, has_res, relu):
    k, n = 24, 40
    x2 = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    mul = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    add = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32)) \
        if has_res else None
    out = fused_matmul_bn_act(x2, w, mul, add, res, relu, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref(x2, w, mul, add, res, relu)),
                               atol=1e-4)


def test_kernel_vjp_matches_autodiff(rng):
    m, k, n = 48, 16, 24
    x2 = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    mul = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    add = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))

    fused = jax.grad(
        lambda *a: (fused_matmul_bn_act(*a, True, True) ** 2).sum(),
        argnums=(0, 1, 2, 3, 4))(x2, w, mul, add, res)
    ref = jax.grad(lambda *a: (_ref(*a, relu=True) ** 2).sum(),
                   argnums=(0, 1, 2, 3, 4))(x2, w, mul, add, res)
    for f, r in zip(fused, ref):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r), atol=1e-3)


def test_kernel_vjp_no_residual(rng):
    m, k, n = 32, 16, 24
    x2 = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    mul = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    add = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    fused = jax.grad(
        lambda a, b: (fused_matmul_bn_act(a, b, mul, add, None, True, True)
                      ** 2).sum(), argnums=(0, 1))(x2, w)
    ref = jax.grad(
        lambda a, b: (_ref(a, b, mul, add, None, True) ** 2).sum(),
        argnums=(0, 1))(x2, w)
    for f, r in zip(fused, ref):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r), atol=1e-3)


def test_tile_m_fits_and_covers():
    for m, k, n in [(43904, 256, 1024), (878080, 64, 256), (13720, 2048, 512),
                    (16, 24, 40), (300, 24, 40)]:
        tm = _tile_m(m, k, n, True)
        assert tm >= 8 and tm % 8 == 0
        buf = tm * (2 * k + 8 * n) + 2 * k * n
        assert buf <= 7 * 1024 * 1024, (m, k, n, tm, buf)


@pytest.fixture
def tiny_cfg():
    # two stages incl. a non-downsample block and a strided downsample
    return ResNetConfig(stage_sizes=(2, 1), num_filters=8, grid_size=1,
                        dtype="float32")


@pytest.fixture
def tiny_visual(tiny_cfg, rng):
    visual = VisualFeatures(tiny_cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = visual.init(jax.random.PRNGKey(0), imgs)
    # randomize the frozen-BN stats so the affine actually does something
    def jitter(path, x):
        return x + 0.1 * jnp.asarray(
            np.random.default_rng(len(str(path))).normal(size=x.shape),
            x.dtype)
    params = jax.tree_util.tree_map_with_path(jitter, variables["params"])
    return visual, {"params": params}


def test_backbone_matches_flax(tiny_cfg, tiny_visual, rng):
    visual, variables = tiny_visual
    x = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    ref = visual.apply(variables, x, method=lambda self, im: self.backbone(im))
    out = fused_resnet.run_backbone(variables, x, tiny_cfg, stages=(1, 2),
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_extract_features_matches_flax(tiny_cfg, tiny_visual, rng):
    visual, variables = tiny_visual
    b, i, r = 2, 3, 2
    imgs = jnp.asarray(rng.normal(size=(b, i, 32, 32, 3)).astype(np.float32))
    rois = jnp.asarray(
        rng.normal(size=(b, i, r, 32, 32, 3)).astype(np.float32))
    grid, roi = fused_resnet.extract_features(variables, imgs, rois,
                                              tiny_cfg, stages=(1, 2),
                                              interpret=True)
    ref_grid = visual.apply(variables, imgs,
                            method=VisualFeatures.grid_features)
    ref_roi = visual.apply(variables, rois,
                           method=VisualFeatures.pooled_features)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref_grid),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(roi), np.asarray(ref_roi),
                               rtol=1e-4, atol=1e-4)


def test_backbone_grads_match_flax(tiny_cfg, tiny_visual, rng):
    """fine_tune_cnn path: parameter grads through the fused runner."""
    visual, variables = tiny_visual
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    def loss_fused(v):
        return (fused_resnet.run_backbone(v, x, tiny_cfg, (1, 2), True)
                ** 2).sum()

    def loss_ref(v):
        return (visual.apply(v, x,
                             method=lambda s, im: s.backbone(im)) ** 2).sum()

    gf = jax.grad(loss_fused)(variables)
    gr = jax.grad(loss_ref)(variables)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(gr))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]), rtol=1e-3, atol=1e-3,
            err_msg=str(path))
