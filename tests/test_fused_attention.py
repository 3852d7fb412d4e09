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


def test_sharded_kernel_matches_reference(rng, cpu_devices):
    """shard_map-wrapped kernel over dp and dp x mp meshes: forward and
    gradients must match the unfused reference (VERDICT r2 item 1 — the
    multi-chip composition the bare pallas_call lacks a GSPMD rule for)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from macsa_tpu.ops.fused_attention import fused_self_attention_sharded
    from macsa_tpu.parallel.mesh import make_mesh

    b, l = 8, 40
    q, k, v = (_merged(rng, b, l, H * D) for _ in range(3))
    mask = np.zeros((b, l), np.float32)
    mask[:, -7:] = -10000.0
    mask = jnp.asarray(mask)
    seed = jnp.zeros((1,), jnp.int32)
    w = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    ref = _reference(q, k, v, mask, H)
    g_ref = jax.grad(lambda *a: (_reference(*a, mask, H) * w).sum(),
                     argnums=(0, 1, 2))(q, k, v)

    for dp, mp in ((8, 1), (4, 2)):  # heads H=4 shard over mp=2
        mesh = make_mesh(dp=dp, mp=mp, devices=cpu_devices[:8])
        dspec = NamedSharding(mesh, P("dp"))
        qd, kd, vd = (jax.device_put(x, dspec) for x in (q, k, v))
        md = jax.device_put(mask, dspec)

        def f(q, k, v):
            return fused_self_attention_sharded(q, k, v, md, seed, H, 0.0,
                                                True, mesh=mesh)

        out = jax.jit(f)(qd, kd, vd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        g = jax.jit(jax.grad(lambda *a: (f(*a) * w).sum(),
                             argnums=(0, 1, 2)))(qd, kd, vd)
        for a, b_ in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-5)


def test_bert_layer_uses_sharded_kernel_on_mesh(rng, cpu_devices,
                                                monkeypatch):
    """With a registered kernel mesh, BertSelfAttention must route through
    the shard_map wrapper (counted) and still match the XLA path."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    import macsa_tpu.ops.fused_attention as fa
    from macsa_tpu.config import ModelConfig
    from macsa_tpu.models.layers import BertSelfAttention, extend_attention_mask
    from macsa_tpu.parallel.mesh import kernel_mesh, make_mesh

    cfg = ModelConfig(hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=4, intermediate_size=64)
    b, l = 8, 36
    x = jnp.asarray(rng.normal(size=(b, l, 32)).astype(np.float32))
    mask01 = np.ones((b, l), np.int32)
    mask01[:, -5:] = 0
    ext = extend_attention_mask(jnp.asarray(mask01))

    plain = BertSelfAttention(cfg)
    params = plain.init(jax.random.PRNGKey(0), x, x, ext)
    ref = plain.apply(params, x, x, ext, True)

    calls = []
    orig = fa.fused_self_attention_sharded

    def counted(*a, **kw):
        calls.append(kw.get("mesh"))
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "fused_self_attention_sharded", counted)
    fused_mod = BertSelfAttention(dataclasses.replace(
        cfg, fused_attention=True, fused_attention_interpret=True))
    mesh = make_mesh(dp=4, mp=2, devices=cpu_devices[:8])
    with kernel_mesh(mesh):
        xd = jax.device_put(x, NamedSharding(mesh, P("dp")))
        out = jax.jit(lambda p, x: fused_mod.apply(p, x, x, ext, True))(
            params, xd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert len(calls) == 1 and calls[0] is mesh

    # indivisible shapes fall back to the XLA path instead of crashing:
    # batch 3 does not tile dp=4
    calls.clear()
    with kernel_mesh(mesh):
        out3 = fused_mod.apply(params, x[:3], x[:3], ext[:3], True)
    assert not calls
    np.testing.assert_allclose(
        np.asarray(out3),
        np.asarray(plain.apply(params, x[:3], x[:3], ext[:3], True)),
        atol=1e-5)


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
