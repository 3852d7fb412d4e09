"""Unit tests for the BERT-style fusion blocks: golden math vs independent
numpy implementations of the standard formulas (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erf, softmax

from macsa_tpu.config import ModelConfig
from macsa_tpu.models import layers

CFG = ModelConfig(hidden_size=16, num_attention_heads=4, intermediate_size=32,
                  hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def np_layernorm(x, scale, bias, eps=1e-12):
    u = x.mean(-1, keepdims=True)
    s = ((x - u) ** 2).mean(-1, keepdims=True)
    return (x - u) / np.sqrt(s + eps) * scale + bias


def test_gelu_erf_matches_formula(rng):
    x = rng.normal(size=(8, 16)).astype(np.float32)
    got = np.asarray(layers.gelu_erf(jnp.asarray(x)))
    want = x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_layernorm_tf_eps_inside_sqrt(rng):
    x = rng.normal(size=(2, 5, 16)).astype(np.float32) * 3 + 1
    mod = layers.LayerNormTF(epsilon=1e-12)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, np_layernorm(x, scale, bias), rtol=1e-5, atol=1e-5)


def test_attention_core_vs_numpy(rng):
    b, n, l, d = 2, 4, 6, 8
    q = rng.normal(size=(b, n, l, d)).astype(np.float32)
    k = rng.normal(size=(b, n, l, d)).astype(np.float32)
    v = rng.normal(size=(b, n, l, d)).astype(np.float32)
    mask = np.zeros((b, 1, 1, l), np.float32)
    mask[:, :, :, -2:] = -10000.0
    got = np.asarray(layers.attention_core(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)))
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d) + mask
    want = softmax(scores, axis=-1) @ v
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bert_layer_shapes_and_masking(rng):
    b, l = 2, 10
    x = jnp.asarray(rng.normal(size=(b, l, CFG.hidden_size)).astype(np.float32))
    mask01 = np.ones((b, l), np.int32)
    mask01[:, 7:] = 0
    ext = layers.extend_attention_mask(jnp.asarray(mask01))
    layer = layers.BertLayer(CFG)
    params = layer.init(jax.random.PRNGKey(0), x, ext)
    out = layer.apply(params, x, ext)
    assert out.shape == (b, l, CFG.hidden_size)
    # masked key positions must not influence unmasked outputs
    x2 = x.at[:, 7:, :].add(100.0)
    out2 = layer.apply(params, x2, ext)
    np.testing.assert_allclose(np.asarray(out[:, :7]), np.asarray(out2[:, :7]),
                               rtol=1e-4, atol=1e-4)


def test_cross_encoder_and_poolers(rng):
    b, l1, l2 = 2, 5, 7
    s1 = jnp.asarray(rng.normal(size=(b, l1, CFG.hidden_size)).astype(np.float32))
    s2 = jnp.asarray(rng.normal(size=(b, l2, CFG.hidden_size)).astype(np.float32))
    enc = layers.BertCrossEncoder(CFG)
    params = enc.init(jax.random.PRNGKey(0), s1, s2, None)
    out = enc.apply(params, s1, s2, None)
    assert out.shape == (b, l1, CFG.hidden_size)

    pooler = layers.TokenPooler(CFG, token_index=1)
    pp = pooler.init(jax.random.PRNGKey(1), out)
    pooled = pooler.apply(pp, out)
    assert pooled.shape == (b, CFG.hidden_size)
    # pooling token 1: changing token 0 must not change the pooled output
    out_mod = out.at[:, 0].add(5.0)
    np.testing.assert_allclose(np.asarray(pooler.apply(pp, out_mod)),
                               np.asarray(pooled), rtol=1e-6)


def test_extend_attention_mask_values():
    m = jnp.asarray([[1, 1, 0]])
    ext = layers.extend_attention_mask(m)
    assert ext.shape == (1, 1, 1, 3)
    np.testing.assert_allclose(np.asarray(ext)[0, 0, 0], [0.0, 0.0, -10000.0])


def test_query_slicing_exact_self_attention(rng):
    """num_query_tokens=1 must equal the first row of the full output —
    query rows never interact inside one attention+FFN layer."""
    from macsa_tpu.config import ModelConfig
    mc = ModelConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                     intermediate_size=64)
    enc = layers.MultimodalEncoder(mc)
    x = jnp.asarray(rng.normal(size=(3, 9, 32)), jnp.float32)
    mask = layers.extend_attention_mask(
        jnp.asarray(rng.integers(0, 2, (3, 9)), jnp.int32), dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, mask)
    full = enc.apply(params, x, mask)
    sliced = enc.apply(params, x, mask, num_query_tokens=1)
    assert sliced.shape == (3, 1, 32)
    np.testing.assert_allclose(np.asarray(sliced), np.asarray(full[:, :1]),
                               rtol=0, atol=1e-6)


def test_query_slicing_exact_cross_attention(rng):
    """Cross-attention queries are row-independent: feeding only the CLS row
    equals slicing the full output."""
    from macsa_tpu.config import ModelConfig
    mc = ModelConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                     intermediate_size=64)
    enc = layers.BertCrossEncoder(mc)
    s1 = jnp.asarray(rng.normal(size=(3, 11, 32)), jnp.float32)
    s2 = jnp.asarray(rng.normal(size=(3, 5, 32)), jnp.float32)
    mask = layers.extend_attention_mask(
        jnp.asarray(rng.integers(0, 2, (3, 5)), jnp.int32), dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), s1, s2, mask)
    full = enc.apply(params, s1, s2, mask)
    sliced = enc.apply(params, s1[:, :1], s2, mask)
    np.testing.assert_allclose(np.asarray(sliced), np.asarray(full[:, :1]),
                               rtol=0, atol=1e-6)


def test_remat_ffn_exact_parity():
    """ModelConfig.remat_ffn (FFN-only checkpoint_dots) must be a pure
    memory/schedule knob: identical param structure, identical forward, and
    matching grads — deterministic AND with live dropout (nn.remat replays
    the same RNG in the recomputed region)."""
    import dataclasses

    cfg = ModelConfig(hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=4, intermediate_size=64)
    cfg_r = dataclasses.replace(cfg, remat_ffn=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    m, mr = layers.BertLayer(cfg), layers.BertLayer(cfg_r)
    p = m.init({"params": jax.random.PRNGKey(0)}, x, None, True)["params"]
    pr = mr.init({"params": jax.random.PRNGKey(0)}, x, None, True)["params"]
    assert (jax.tree_util.tree_structure(pr)
            == jax.tree_util.tree_structure(p))

    def loss(params, mod, det):
        rngs = None if det else {"dropout": jax.random.PRNGKey(7)}
        out = mod.apply({"params": params}, x, None, det, rngs=rngs)
        return (out ** 2).sum()

    for det in (True, False):
        l0, g0 = jax.value_and_grad(lambda q: loss(q, m, det))(p)
        l1, g1 = jax.value_and_grad(lambda q: loss(q, mr, det))(p)
        assert float(l0) == float(l1)
        for (path, a), b in zip(
                jax.tree_util.tree_flatten_with_path(g0)[0],
                jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7,
                err_msg=jax.tree_util.keystr(path))
