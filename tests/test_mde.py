"""Multimodal Denoising Encoder tests: shapes, strong/weak split sizes, and
the theta-gated max-pool fusion behavior (mm_modeling.py:448-555)."""

import jax
import jax.numpy as jnp
import numpy as np

from macsa_tpu.config import ModelConfig
from macsa_tpu.models.mde import MultimodalDenoisingEncoder

CFG = ModelConfig(hidden_size=16, num_attention_heads=4,
                  attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)


def _run(alpha, rng, n=10):
    mde = MultimodalDenoisingEncoder(CFG, alpha=alpha)
    text = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(2, n, 16)).astype(np.float32))
    params = mde.init(jax.random.PRNGKey(0), text, img)
    return mde.apply(params, text, img)


def test_output_is_topk_alpha_sized(rng):
    out = _run(0.7, rng, n=10)
    assert out.shape == (2, 7, 16)  # k_strong = int(10 * 0.7)
    out = _run(0.3, rng, n=10)
    assert out.shape == (2, 3, 16)


def test_alpha_one_is_identity_selection(rng):
    """alpha=1 -> all patches strong, no weak pool: output is a permutation
    of the inputs (top-k ordering by guidance score)."""
    mde = MultimodalDenoisingEncoder(CFG, alpha=1.0)
    text = jnp.asarray(rng.normal(size=(1, 3, 16)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(1, 6, 16)).astype(np.float32))
    params = mde.init(jax.random.PRNGKey(0), text, img)
    out = np.asarray(mde.apply(params, text, img))
    src = np.asarray(img[0])
    for row in out[0]:
        assert any(np.allclose(row, s, atol=1e-5) for s in src)


def test_fusion_mixes_weak_into_strong(rng):
    """With alpha<1 the updated strong vectors must differ from a pure top-k
    gather (theta gate pulls in assigned weak patches)."""
    mde = MultimodalDenoisingEncoder(CFG, alpha=0.5)
    text = jnp.asarray(rng.normal(size=(1, 4, 16)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(1, 8, 16)).astype(np.float32))
    params = mde.init(jax.random.PRNGKey(0), text, img)
    out = np.asarray(mde.apply(params, text, img))
    src = np.asarray(img[0])
    # at least one output row is NOT one of the raw patches (it was fused)
    fused_rows = sum(
        0 if any(np.allclose(row, s, atol=1e-5) for s in src) else 1
        for row in out[0])
    assert fused_rows >= 1


def test_mde_gradient_finite_at_zero_features(rng):
    """Zero-padded missing images produce exactly-zero patch features
    (bias-free convs + identity-init BN); the cosine normalize must keep
    gradients finite there (regression: linalg.norm grad NaN at x=0 poisoned
    vismap2text and the whole model from the first update)."""
    mc = ModelConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                     intermediate_size=64)
    mde = MultimodalDenoisingEncoder(mc, alpha=0.7)
    text = jnp.asarray(rng.normal(size=(2, 6, 32)), jnp.float32)
    img_rand = jnp.asarray(rng.normal(size=(2, 9, 32)), jnp.float32)
    params = mde.init(jax.random.PRNGKey(0), text, img_rand)

    for img in (jnp.zeros((2, 9, 32), jnp.float32),        # all zero
                img_rand.at[0].set(0.0)):                   # one sample zero
        g = jax.grad(lambda x: jnp.sum(mde.apply(params, text, x) ** 2))(img)
        assert np.isfinite(np.asarray(g)).all()
        out = mde.apply(params, text, img)
        assert np.isfinite(np.asarray(out)).all()
