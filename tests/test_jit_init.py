"""`common.jit_init` / `common.output_zeros` equivalence pins.

Drivers initialize full-scale models with `jit_init` (one compiled program
instead of minutes of per-op tunnel dispatch) and feed `model.init` dummy
features from `output_zeros` (eval_shape, zero device work) — see
train/common.py. These tests pin that the shortcut is semantically
equivalent to the eager path the drivers used before: same PRNG stream ->
same parameter values (up to fusion rounding), and init depends only on
input shapes, never values.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from macsa_tpu.train import common


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, feats):
        h = nn.Dense(16)(x)
        h = nn.LayerNorm()(h + nn.Dense(16)(feats))
        return nn.Dense(4)(h)


def test_jit_init_matches_eager_init():
    m = _Tiny()
    key = jax.random.PRNGKey(7)
    x = jnp.ones((2, 8), jnp.float32)
    feats = jnp.ones((2, 8), jnp.float32)
    eager = m.init(key, x, feats)
    jitted = common.jit_init(m, key, x, feats)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        eager, jitted)


def test_output_zeros_shapes_and_no_execution():
    calls = []

    def fn(p):
        calls.append(1)  # traced once under eval_shape, never executed
        return {"grid": jnp.einsum("ij,jk->ik", p, p)[None].astype(jnp.bfloat16),
                "roi": jnp.zeros((3, 5), jnp.int32)}

    p = jnp.ones((4, 4), jnp.float32)
    out = common.output_zeros(fn, p)
    assert out["grid"].shape == (1, 4, 4) and out["grid"].dtype == jnp.bfloat16
    assert out["roi"].shape == (3, 5) and out["roi"].dtype == jnp.int32
    assert not out["grid"].any()


def test_init_is_value_independent():
    # model.init with zero features (output_zeros) must produce the same
    # params as with real features: init depends on shapes only.
    m = _Tiny()
    key = jax.random.PRNGKey(3)
    x = jnp.ones((2, 8), jnp.float32)
    a = common.jit_init(m, key, x, jnp.zeros((2, 8), jnp.float32))
    b = common.jit_init(m, key, x, jax.random.normal(key, (2, 8)))
    jax.tree_util.tree_map(
        lambda u, v: np.testing.assert_array_equal(np.asarray(u),
                                                   np.asarray(v)), a, b)
