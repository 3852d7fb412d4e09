"""Fused (Pallas) self-attention kernel: parity with the XLA math.

Deterministic forward/backward run in interpret mode on the CPU test
platform and must match the unfused reference exactly (both f32 highest
precision).  The in-kernel PRNG dropout path needs a real TPU
(`pltpu.prng_seed` has no CPU interpret lowering) and is validated by the
TPU-side checks recorded in docs/DESIGN.md: seed-deterministic outputs,
seed sensitivity, mean ~= deterministic output, and finite-difference
agreement of the custom VJP through the dropout mask.

The kernel consumes the projections' native [B, L, H*d] layout (heads are
sliced in-kernel); the reference math runs on split heads and is merged
back for comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macsa_tpu.ops.fused_attention import attention_reference, fused_self_attention

B, H, D = 2, 4, 8


def _merged(rng, b, l, hd):
    return jnp.asarray(rng.normal(size=(b, l, hd)).astype(np.float32))


def _reference(q3, k3, v3, mask, h):
    split = lambda x: x.reshape(x.shape[0], x.shape[1], h, -1).transpose(
        0, 2, 1, 3)
    out = attention_reference(split(q3), split(k3), split(v3), mask)
    return out.transpose(0, 2, 1, 3).reshape(q3.shape)


@pytest.fixture
def qkvm(rng):
    l = 20  # deliberately sublane-unaligned: exercises implicit pad rows
    q, k, v = (_merged(rng, B, l, H * D) for _ in range(3))
    mask = np.zeros((B, l), np.float32)
    mask[:, -4:] = np.finfo(np.float32).min  # HF-style padding mask values
    return q, k, v, jnp.asarray(mask)


def test_forward_matches_reference(qkvm):
    q, k, v, mask = qkvm
    seed = jnp.zeros((1,), jnp.int32)
    out = fused_self_attention(q, k, v, mask, seed, H, 0.0, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_reference(q, k, v, mask, H)),
                               atol=1e-5)


def test_forward_aligned_length(rng):
    l = 32  # already sublane-aligned: no pad rows at all
    q, k, v = (_merged(rng, B, l, H * D) for _ in range(3))
    mask = jnp.zeros((B, l), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    out = fused_self_attention(q, k, v, mask, seed, H, 0.0, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_reference(q, k, v, mask, H)),
                               atol=1e-5)


def test_gradients_match_reference(qkvm, rng):
    q, k, v, mask = qkvm
    seed = jnp.zeros((1,), jnp.int32)
    w = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
    g_fused = jax.grad(
        lambda *a: (fused_self_attention(*a, mask, seed, H, 0.0, True)
                    * w).sum(), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda *a: (_reference(*a, mask, H) * w).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bert_self_attention_fused_flag_parity(rng):
    """BertSelfAttention with the fused flag must reproduce the XLA path
    deterministically (this is the exact text-encoder call pattern)."""
    import dataclasses

    from macsa_tpu.config import ModelConfig
    from macsa_tpu.models.layers import BertSelfAttention, extend_attention_mask

    cfg = ModelConfig(hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=4, intermediate_size=64)
    b, l = 2, 36  # >= 32 so the fused path triggers
    x = jnp.asarray(rng.normal(size=(b, l, 32)).astype(np.float32))
    mask01 = np.ones((b, l), np.int32)
    mask01[:, -5:] = 0
    ext = extend_attention_mask(jnp.asarray(mask01))

    plain = BertSelfAttention(cfg)
    params = plain.init(jax.random.PRNGKey(0), x, x, ext)
    ref = plain.apply(params, x, x, ext, True)
    fused_mod = BertSelfAttention(dataclasses.replace(
        cfg, fused_attention=True, fused_attention_interpret=True))
    out = fused_mod.apply(params, x, x, ext, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # sliced-query call sites must keep the XLA path (kernel contract)
    ref1 = plain.apply(params, x[:, :1], x, ext, True)
    out1 = fused_mod.apply(params, x[:, :1], x, ext, True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=1e-6)
