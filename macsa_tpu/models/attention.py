"""Per-head-parameter attention (decoder / MDE attention).

TPU-native re-design of the reference's generic `Attention`
(reference: fcmf_framework/mm_modeling.py:35-132): per-head projection tensors
`w_kx`/`w_qx` of shape [n_head, embed, hidden], three score functions
(scaled_dot_product / mlp / bi_linear), and the quirk that the *value* stream
is the key projection `kx` (there is no separate W_v; see mm_modeling.py:129).

Masking semantics reproduced from mm_modeling.py:105-124:
* `lengths` (1-D int per batch)  -> key-length mask, fill -1e4,
* `causal=True` (the reference triggers this whenever a 2-D tensor is passed
  as `memory_len`, regardless of its values, mm_modeling.py:115-118)
  -> tril(q_len, k_len) mask, fill -1e4.

Deliberate deviation (documented): the reference's repeat/view pairing of
per-head weights with the batch makes the head<->weight assignment depend on
the batch size (mm_modeling.py:79-85: `k.repeat(n_head,1,1)` is head-slot-major
while `w_kx.repeat(mb,1,1)` is head-minor, so batch element b's head slot c
uses weight head (c*mb+b) % n_head).  We implement the intended semantics
(head slot c uses weight head c), which is *exactly* equal to the reference at
batch size 1 and batch-size-invariant otherwise.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

MASK_FILL = -1e4  # mm_modeling.py:124


class PerHeadAttention(nn.Module):
    embed_dim: int
    hidden_dim: int  # per-head dim
    n_head: int = 1
    score_function: str = "scaled_dot_product"
    dtype: jnp.dtype = jnp.float32
    # Reproduce the reference's batch-size-dependent head<->weight pairing
    # exactly (head slot c of batch element b uses weight head
    # (c*B + b) % n_head — mm_modeling.py:79-85,129-130) instead of the
    # intended batch-invariant mapping.  Parity-testing aid; identical to
    # the default at B=1 or n_head=1.
    emulate_reference_heads: bool = False

    @nn.compact
    def __call__(
        self,
        k: Array,  # [B, Lk, E] — also the value stream after projection
        q: Array,  # [B, Lq, E]
        *,
        lengths: Optional[Array] = None,  # [B] int: valid key length per batch
        causal: bool = False,             # tril(q_len, k_len) mask
        key_mask: Optional[Array] = None,  # [B, Lk] 0/1 keep mask
        return_probs: bool = False,
    ):
        if k.ndim == 2:
            k = k[:, None, :]
        if q.ndim == 2:
            q = q[:, None, :]
        e, d, nh = self.embed_dim, self.hidden_dim, self.n_head

        xavier = nn.initializers.xavier_uniform()
        w_kx = self.param("w_kx", xavier, (nh, e, d), jnp.float32)
        w_qx = self.param("w_qx", xavier, (nh, e, d), jnp.float32)

        kx = jnp.einsum("ble,hed->bhld", k.astype(self.dtype), w_kx.astype(self.dtype))
        qx = jnp.einsum("ble,hed->bhld", q.astype(self.dtype), w_qx.astype(self.dtype))

        if self.emulate_reference_heads:
            # remap head slots to the reference's repeat/view pairing:
            # slot c of batch b reads weight head (c*B + b) % n_head
            bsz = kx.shape[0]
            idx = (jnp.arange(nh)[None, :] * bsz
                   + jnp.arange(bsz)[:, None]) % nh  # [B, nh]
            idx = idx[:, :, None, None]
            kx = jnp.take_along_axis(kx, idx, axis=1)
            qx = jnp.take_along_axis(qx, idx, axis=1)

        if self.score_function == "scaled_dot_product":
            score = jnp.einsum("bhqd,bhkd->bhqk", qx, kx) / math.sqrt(d)
        elif self.score_function == "mlp":
            w = self.param("weight", xavier, (2 * d, 1), jnp.float32).astype(self.dtype)
            lq, lk = qx.shape[2], kx.shape[2]
            kxx = jnp.broadcast_to(kx[:, :, None, :, :], kx.shape[:2] + (lq, lk, d))
            qxx = jnp.broadcast_to(qx[:, :, :, None, :], qx.shape[:2] + (lq, lk, d))
            kq = jnp.concatenate([kxx, qxx], axis=-1)
            score = jnp.tanh(jnp.squeeze(kq @ w, axis=-1))
        elif self.score_function == "bi_linear":
            w = self.param("weight", xavier, (d, d), jnp.float32).astype(self.dtype)
            score = jnp.tanh(jnp.einsum("bhqd,de,bhke->bhqk", qx, w, kx))
        else:
            raise ValueError(f"invalid score_function: {self.score_function}")

        lq, lk = score.shape[2], score.shape[3]
        score = score.astype(jnp.float32)
        if causal:
            tri = jnp.tril(jnp.ones((lq, lk), dtype=bool))
            score = jnp.where(tri[None, None], score, MASK_FILL)
        elif lengths is not None:
            col = jnp.arange(lk)[None, :]
            keep = col < lengths[:, None]  # [B, Lk]
            score = jnp.where(keep[:, None, None, :], score, MASK_FILL)
        elif key_mask is not None:
            score = jnp.where(key_mask[:, None, None, :].astype(bool), score, MASK_FILL)

        probs = jax.nn.softmax(score, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, kx)  # value stream = kx
        out = out.transpose(0, 2, 1, 3).reshape(out.shape[0], lq, nh * d)
        out = nn.Dense(e, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        if return_probs:
            return out, probs
        return out
