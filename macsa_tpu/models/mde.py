"""Multimodal Denoising Encoder (MDE).

Re-design of the reference MDE (reference: fcmf_framework/mm_modeling.py:448-555):
text-CLS-guided scoring of image patches, top-k(alpha) strong/weak split,
cosine-similarity assignment of weak->strong patches, and theta-gated max-pool
fusion.  The module is instantiated-but-disabled in the reference's active
FCMFEncoder (fcmf_pretraining.py:34-35); it is provided here for capability
parity and can be enabled via FCMFConfig.alpha < 1 wiring in a custom encoder.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from macsa_tpu.config import ModelConfig
from macsa_tpu.models.attention import PerHeadAttention

Array = jax.Array


class MultimodalDenoisingEncoder(nn.Module):
    config: ModelConfig
    alpha: float = 0.7

    def setup(self):
        cfg = self.config
        self.guidance_attention = PerHeadAttention(
            cfg.hidden_size, cfg.hidden_size // cfg.num_attention_heads,
            cfg.num_attention_heads, "scaled_dot_product", dtype=cfg.jnp_dtype)

    def __call__(self, text_hidden: Array, image_hidden: Array) -> Array:
        """text_hidden: [B, L, H]; image_hidden: [B, N, H] -> [B, K, H]."""
        b, n, h = image_hidden.shape
        k_strong = max(1, int(n * self.alpha))
        m_weak = n - k_strong

        # 1. scoring: text CLS queries image patches (mm_modeling.py:480-488)
        text_query = text_hidden[:, 0:1, :]
        lengths = jnp.full((b,), n, jnp.int32)
        _, raw = self.guidance_attention(image_hidden, text_query,
                                         lengths=lengths, return_probs=True)
        scores = raw.reshape(b, -1, 1, n).mean(axis=1)[:, 0, :]  # [B, N]

        # 2. top-k strong / weak split (mm_modeling.py:492-506)
        _, idx_strong = jax.lax.top_k(scores, k_strong)
        v_strong = jnp.take_along_axis(image_hidden, idx_strong[..., None], axis=1)
        if m_weak == 0:
            return v_strong
        _, idx_weak = jax.lax.top_k(-scores, m_weak)
        v_weak = jnp.take_along_axis(image_hidden, idx_weak[..., None], axis=1)

        # 3. cosine similarity weak->strong (mm_modeling.py:509-513).
        # NaN-safe normalize: linalg.norm's gradient at an exactly-zero row
        # is NaN even under a maximum() clamp (0 * d||x||/dx = 0 * 0/0), and
        # zero rows DO occur — a zero-padded missing image through bias-free
        # convs + identity-init BN yields exactly-zero features.  rsqrt of
        # (sum(x^2) + eps) keeps both value and gradient finite at x = 0.
        def norm(x):
            x = x.astype(jnp.float32)
            sq = jnp.sum(x * x, axis=-1, keepdims=True)
            return x * jax.lax.rsqrt(sq + 1e-12)
        sim = jnp.einsum("bmh,bkh->bmk", norm(v_weak), norm(v_strong))

        # 4. theta gate & assignment (mm_modeling.py:516-523)
        max_sim = jnp.max(sim, axis=-1)                     # [B, M]
        assign = jnp.argmax(sim, axis=-1)                   # [B, M]
        theta_weak = jnp.exp(max_sim) / (jnp.exp(max_sim) + math.e)

        # 5. masked max-pool fusion (mm_modeling.py:526-550)
        mask = jax.nn.one_hot(assign, k_strong, dtype=jnp.float32)  # [B, M, K]
        pool_in = jnp.where(mask[..., None] == 0, -1e4,
                            v_weak[:, :, None, :].astype(jnp.float32))
        attended = jnp.max(pool_in, axis=1)                 # [B, K, H]
        has_child = jnp.sum(mask, axis=1) > 0               # [B, K]
        attended = jnp.where(has_child[..., None], attended, 0.0)

        theta_map = jnp.where(mask == 0, -1e4, theta_weak[..., None] * mask)
        theta_strong = jnp.max(theta_map, axis=1)           # [B, K]
        theta_strong = jnp.where(theta_strong == -1e4, 0.0, theta_strong)[..., None]

        updated = ((1.0 - theta_strong) * v_strong.astype(jnp.float32)
                   + theta_strong * attended)
        return updated.astype(image_hidden.dtype)
