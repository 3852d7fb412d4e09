"""Tests for the per-head decoder attention and the box-relational attention:
golden values against independent numpy implementations of the published
formulas (scaled dot scores, -1e4/-1e9 mask fills, log-clamped geometric
gates)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import softmax

from macsa_tpu.models.attention import PerHeadAttention
from macsa_tpu.models.box_attention import (
    BoxMultiHeadedAttention,
    box_relational_embedding,
)


def _np_per_head(k, q, w_kx, w_qx, proj_w, proj_b, mask=None):
    """Reference semantics at batch size 1 (head slot c uses weight head c)."""
    nh, e, d = w_kx.shape
    outs = []
    for h in range(nh):
        kx = k @ w_kx[h]
        qx = q @ w_qx[h]
        score = qx @ kx.transpose(0, 2, 1) / np.sqrt(d)
        if mask is not None:
            score = np.where(mask, score, -1e4)
        p = softmax(score, axis=-1)
        outs.append(p @ kx)  # value stream = key projection
    out = np.concatenate(outs, axis=-1)
    return out @ proj_w + proj_b


def test_per_head_attention_scaled_dot(rng):
    e, d, nh, lk, lq = 12, 3, 4, 6, 5
    mod = PerHeadAttention(embed_dim=e, hidden_dim=d, n_head=nh)
    k = rng.normal(size=(1, lk, e)).astype(np.float32)
    q = rng.normal(size=(1, lq, e)).astype(np.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(k), jnp.asarray(q))
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    got = np.asarray(mod.apply(params, jnp.asarray(k), jnp.asarray(q)))
    want = _np_per_head(k, q, p["w_kx"], p["w_qx"],
                        p["proj"]["kernel"], p["proj"]["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_per_head_attention_length_mask(rng):
    e, d, nh, lk = 8, 2, 4, 6
    mod = PerHeadAttention(embed_dim=e, hidden_dim=d, n_head=nh)
    k = rng.normal(size=(2, lk, e)).astype(np.float32)
    q = rng.normal(size=(2, 1, e)).astype(np.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(k), jnp.asarray(q))
    lengths = jnp.asarray([3, 6])
    out = mod.apply(params, jnp.asarray(k), jnp.asarray(q), lengths=lengths)
    # batch 0 must ignore keys >= 3; batch 1 (length 6) sees them
    k2 = k.copy()
    k2[:, 3:] += 50.0
    out2 = mod.apply(params, jnp.asarray(k2), jnp.asarray(q), lengths=lengths)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                               rtol=1e-4, atol=1e-4)
    assert not np.allclose(np.asarray(out[1]), np.asarray(out2[1]))


def test_per_head_attention_causal(rng):
    e, d, nh, l = 8, 2, 4, 5
    mod = PerHeadAttention(embed_dim=e, hidden_dim=d, n_head=nh)
    x = rng.normal(size=(1, l, e)).astype(np.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x), jnp.asarray(x), causal=True)
    # future tokens must not influence earlier outputs
    x2 = x.copy()
    x2[:, -1] += 10.0
    out2 = mod.apply(params, jnp.asarray(x2), jnp.asarray(x2), causal=True)
    np.testing.assert_allclose(np.asarray(out[:, :-1]), np.asarray(out2[:, :-1]),
                               rtol=1e-4, atol=1e-4)


def _np_box_embedding(boxes, dim_g=64, wave_len=1000.0):
    b, n, _ = boxes.shape
    x_min, x_max, y_min, y_max = [boxes[..., i:i + 1] for i in range(4)]
    cx, cy = (x_min + x_max) * 0.5, (y_min + y_max) * 0.5
    w, h = (x_max - x_min) + 1.0, (y_max - y_min) + 1.0
    dx = np.log(np.maximum(np.abs((cx - cx.transpose(0, 2, 1)) / w), 1e-3))
    dy = np.log(np.maximum(np.abs((cy - cy.transpose(0, 2, 1)) / h), 1e-3))
    dw = np.log(w / w.transpose(0, 2, 1))
    dh = np.log(h / h.transpose(0, 2, 1))
    pos = np.stack([dx, dy, dw, dh], -1).astype(np.float32)  # [B,N,N,4]
    nf = dim_g // 8
    dim_mat = (1.0 / np.power(wave_len, np.arange(nf, dtype=np.float32) / nf)
               ).astype(np.float32)
    # float32 throughout: sin/cos args reach ~700, where f32-vs-f64 drift is
    # visible; the torch reference also runs f32
    mul = (np.float32(100.0) * pos)[..., None] * dim_mat
    mul = mul.reshape(b, n, n, 4 * nf)
    return np.concatenate([np.sin(mul), np.cos(mul)], -1)


def test_box_relational_embedding_golden(rng):
    boxes = rng.uniform(0, 1, size=(2, 4, 4)).astype(np.float32)
    # raw (dx, dy, dw, dh) log-ratio matrix: exact comparison
    raw = np.asarray(box_relational_embedding(jnp.asarray(boxes),
                                              trignometric_embedding=False))
    b, n, _ = boxes.shape
    x_min, x_max, y_min, y_max = [boxes[..., i:i + 1] for i in range(4)]
    cx, cy = (x_min + x_max) * 0.5, (y_min + y_max) * 0.5
    w, h = (x_max - x_min) + 1.0, (y_max - y_min) + 1.0
    dx = np.log(np.maximum(np.abs((cx - cx.transpose(0, 2, 1)) / w), 1e-3))
    dy = np.log(np.maximum(np.abs((cy - cy.transpose(0, 2, 1)) / h), 1e-3))
    dw = np.log(w / w.transpose(0, 2, 1))
    dh = np.log(h / h.transpose(0, 2, 1))
    # XLA log() vs libm log() differ at f32 ulp level
    np.testing.assert_allclose(raw, np.stack([dx, dy, dw, dh], -1),
                               rtol=2e-4, atol=1e-4)
    # trig embedding: sin/cos phase args reach ~|100*log(1e-3)| ~ 690, where a
    # 1e-7 relative pow() difference between backends shifts the phase by
    # ~7e-5 — tolerate the amplification on the bounded sin/cos outputs
    got = np.asarray(box_relational_embedding(jnp.asarray(boxes)))
    want = _np_box_embedding(boxes)
    assert got.shape == (2, 4, 4, 64)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_box_attention_geometric_gate(rng):
    """log(clamp(w_g, 1e-6)) must be added to scores before softmax: with an
    identical-features input, differing boxes change the output."""
    b, n, dm = 2, 4, 16
    mod = BoxMultiHeadedAttention(num_heads=4, d_model=dm, dropout_rate=0.0)
    x = jnp.asarray(rng.normal(size=(b, n, dm)).astype(np.float32))
    boxes1 = jnp.asarray(rng.uniform(0, 1, size=(b, n, 4)).astype(np.float32))
    boxes2 = boxes1 * 0.2
    params = mod.init(jax.random.PRNGKey(0), x, x, x, boxes1)
    out1 = mod.apply(params, x, x, x, boxes1)
    out2 = mod.apply(params, x, x, x, boxes2)
    assert out1.shape == (b, n, dm)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_box_attention_full_numpy_golden(rng):
    """End-to-end numpy check of the box attention math."""
    b, n, dm, h = 1, 3, 8, 2
    mod = BoxMultiHeadedAttention(num_heads=h, d_model=dm, dropout_rate=0.0)
    x = rng.normal(size=(b, n, dm)).astype(np.float32)
    boxes = rng.uniform(0, 1, size=(b, n, 4)).astype(np.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x),
                      jnp.asarray(x), jnp.asarray(boxes))
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(x),
                               jnp.asarray(x), jnp.asarray(boxes)))

    d_k = dm // h
    geo = _np_box_embedding(boxes)
    wg = np.maximum(geo @ p["wg"]["kernel"] + p["wg"]["bias"], 0.0)  # [B,N,N,h]
    wg = wg.transpose(0, 3, 1, 2)
    heads = lambda y: y.reshape(b, n, h, d_k).transpose(0, 2, 1, 3)
    q = heads(x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"])
    k = heads(x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"])
    v = heads(x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"])
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d_k)
    scores = scores + np.log(np.maximum(wg, 1e-6))
    out = softmax(scores, -1) @ v
    out = out.transpose(0, 2, 1, 3).reshape(b, n, dm)
    want = out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
