"""Geometric (box-relational) ROI self-attention.

TPU-native re-design of the reference's Relation-Networks-style attention
(reference: fcmf_framework/roi_modeling.py): pairwise box displacement
log-ratios -> 64-d sinusoidal geometric embedding, 8 per-head scalar gates
(ReLU), and `log(clamp(w_g, 1e-6))` added to the scaled-dot scores before the
softmax (roi_modeling.py:40-41).

Design: the whole thing is one fused chain of einsums over static [B, N, N]
shapes (N = num ROIs, typically 4), so XLA fuses it into a handful of MXU
calls; there is no per-head Python loop (the reference loops the 8 WG linears,
roi_modeling.py:161 — here the 8 gates are a single [64, 8] matmul).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

BOX_MASK_FILL = -1e9  # roi_modeling.py:32
GEO_CLAMP_MIN = 1e-6  # roi_modeling.py:40


def box_relational_embedding(
    boxes: Array, dim_g: int = 64, wave_len: float = 1000.0,
    trignometric_embedding: bool = True,
) -> Array:
    """Pairwise geometric embedding of bounding boxes.

    boxes: [B, N, 4] with coordinates (x_min, x_max, y_min, y_max) — the
    column order the reference chunks (roi_modeling.py:95).
    Returns [B, N, N, dim_g] (or [B, N, N, 4] without the trig embedding).
    Math follows roi_modeling.py:79-138.
    """
    boxes = boxes.astype(jnp.float32)
    x_min, x_max, y_min, y_max = jnp.split(boxes, 4, axis=-1)  # each [B, N, 1]

    cx = (x_min + x_max) * 0.5
    cy = (y_min + y_max) * 0.5
    w = (x_max - x_min) + 1.0
    h = (y_max - y_min) + 1.0

    # delta[b, i, j] = f(box_i, box_j); normalizers use box_i (broadcast [B,N,1])
    delta_x = jnp.log(jnp.maximum(jnp.abs((cx - jnp.swapaxes(cx, 1, 2)) / w), 1e-3))
    delta_y = jnp.log(jnp.maximum(jnp.abs((cy - jnp.swapaxes(cy, 1, 2)) / h), 1e-3))
    delta_w = jnp.log(w / jnp.swapaxes(w, 1, 2))
    delta_h = jnp.log(h / jnp.swapaxes(h, 1, 2))

    position_mat = jnp.stack([delta_x, delta_y, delta_w, delta_h], axis=-1)  # [B,N,N,4]

    if not trignometric_embedding:
        return position_mat

    n_freq = dim_g // 8
    feat_range = jnp.arange(n_freq, dtype=jnp.float32)
    dim_mat = 1.0 / jnp.power(wave_len, feat_range / n_freq)  # [n_freq]
    mul = (100.0 * position_mat)[..., None] * dim_mat  # [B,N,N,4,n_freq]
    mul = mul.reshape(*mul.shape[:3], 4 * n_freq)
    return jnp.concatenate([jnp.sin(mul), jnp.cos(mul)], axis=-1)  # [B,N,N,dim_g]


class BoxMultiHeadedAttention(nn.Module):
    """Multi-head self-attention with relative-position (box) gates.

    Equivalent surface to the reference's BoxMultiHeadedAttention
    (roi_modeling.py:49-180): h heads over d_model, 4 projection linears
    (q/k/v/out), 8 WG gates on the 64-d geometric embedding.
    """

    num_heads: int
    d_model: int
    trignometric_embedding: bool = True
    legacy_extra_skip: bool = False
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # fuse score+log-gate+softmax+PV into one Pallas kernel
    # (macsa_tpu.ops.box_attention_kernel); used when no mask/dropout applies
    use_pallas_kernel: bool = False

    @nn.compact
    def __call__(
        self,
        query: Array,  # [B, N, d_model]
        key: Array,
        value: Array,
        boxes: Array,   # [B, N, 4]
        mask: Optional[Array] = None,  # [B, Nq, Nk] 0/1; 0 -> -1e9 fill
        deterministic: bool = True,
    ) -> Array:
        h, d_model = self.num_heads, self.d_model
        d_k = d_model // h
        dim_g = 64 if self.trignometric_embedding else 4

        geo = box_relational_embedding(
            boxes, dim_g=dim_g,
            trignometric_embedding=self.trignometric_embedding,
        ).astype(self.dtype)  # [B, N, N, dim_g]

        dense = lambda name: nn.Dense(d_model, dtype=self.dtype, param_dtype=jnp.float32,
                                      name=name)
        def heads(x):
            b, n, _ = x.shape
            return x.reshape(b, n, h, d_k).transpose(0, 2, 1, 3)

        q = heads(dense("q_proj")(query))
        k = heads(dense("k_proj")(key))
        v = heads(dense("v_proj")(value))

        # 8 per-head scalar gates as one [dim_g, h] matmul + per-gate bias
        # (reference: roi_modeling.py:74,161-163 — a Python loop of Linear(64,1)).
        wg = nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32, name="wg")(geo)
        w_g = jax.nn.relu(wg).transpose(0, 3, 1, 2)  # [B, h, N, N]

        drop_active = self.dropout_rate > 0.0 and not deterministic
        if self.use_pallas_kernel and mask is None and not drop_active:
            from macsa_tpu.ops.box_attention_kernel import fused_box_attention
            b, _, n, dk = q.shape
            fold = lambda x: x.reshape(b * h, *x.shape[2:])
            out = fused_box_attention(fold(q), fold(k), fold(v), fold(w_g))
            out = out.reshape(b, h, n, dk).transpose(0, 2, 1, 3).reshape(
                b, n, d_model).astype(self.dtype)
            if self.legacy_extra_skip:
                out = value + out
            return dense("out_proj")(out)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        scores = scores / math.sqrt(d_k)
        if mask is not None:
            scores = jnp.where(mask[:, None].astype(bool), scores, BOX_MASK_FILL)
        # log of geometric weights added to feature scores (roi_modeling.py:40-41)
        scores = scores + jnp.log(jnp.maximum(w_g.astype(jnp.float32), GEO_CLAMP_MIN))

        probs = jax.nn.softmax(scores, axis=-1)
        if self.dropout_rate > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keepmask = jax.random.bernoulli(rng, 1.0 - self.dropout_rate, probs.shape)
            probs = probs * keepmask / (1.0 - self.dropout_rate)
        probs = probs.astype(self.dtype)

        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d_model)

        if self.legacy_extra_skip:  # roi_modeling.py:177-178
            out = value + out

        return dense("out_proj")(out)
