"""Baseline architectures: mRoBERTa, TomBERT, EF-CapTrRoBERTa (TPU-native).

Re-designs of the reference baselines trained on the same pipeline:
* mRoBERTa (reference: mROBERTa/train_mroberta_vimacsa_full.py:191-288):
  text encoder -> visual projections -> one cross-attention (text queries
  all 7x49 patches + 7xR ROIs) with residual+LN -> 3-layer post-LN
  transformer encoder -> CLS classifier,
* TomBERT (tomROBERTa/train_tomroberta_vimacsa_full.py:187-257): two-stream
  target/sentence encodings through a shared backbone, Target-Image-Matching
  block(s), 1-layer multimodal encoder over [target-CLS | sentence], classifier
  on the concatenated first two tokens (2H -> 4),
* EF-CapTrRoBERTa (EF-CapTrRoBERTa/train_ef_captr_roberta.py:121-134):
  caption-augmented text-only classifier.

The torch `nn.TransformerEncoderLayer` semantics (post-LN, GELU, LN eps 1e-5)
are reproduced by `TorchEncoderLayer`; `nn.MultiheadAttention` by the fused
einsum attention of macsa_tpu.models.layers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from macsa_tpu.config import FCMFConfig, TextEncoderConfig
from macsa_tpu.models import layers
from macsa_tpu.models.text_encoder import TextEncoder

Array = jax.Array


class MHA(nn.Module):
    """torch nn.MultiheadAttention equivalent (q/k/v + out projections)."""

    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: Array, key: Array, value: Array,
                 key_padding_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        dense = lambda name: nn.Dense(self.hidden_size, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        q = layers.split_heads(dense("q_proj")(query), self.num_heads)
        k = layers.split_heads(dense("k_proj")(key), self.num_heads)
        v = layers.split_heads(dense("v_proj")(value), self.num_heads)
        mask = None
        if key_padding_mask is not None:  # 1 = keep
            mask = (1.0 - key_padding_mask[:, None, None, :].astype(jnp.float32)) \
                * jnp.finfo(jnp.float32).min
        rng = (None if deterministic or self.dropout_rate == 0.0
               else self.make_rng("dropout"))
        ctx = layers.attention_core(q, k, v, mask, dropout_rate=self.dropout_rate,
                                    deterministic=deterministic, dropout_rng=rng)
        return dense("out_proj")(layers.merge_heads(ctx))


class TorchEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer, post-LN, GELU."""

    hidden_size: int
    num_heads: int
    ffn_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, key_padding_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        attn = MHA(self.hidden_size, self.num_heads, self.dropout_rate,
                   self.dtype, name="self_attn")(
            x, x, x, key_padding_mask, deterministic)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = layers.LayerNormTF(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn)
        h = nn.Dense(self.ffn_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear1")(x)
        h = layers.gelu_erf(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear2")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return layers.LayerNormTF(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)


class MRoBERTa(nn.Module):
    """mRoBERTa (Yu & Jiang 2019 adaptation)."""

    text_config: TextEncoderConfig
    num_labels: int = 4
    num_mm_layers: int = 3
    visual_feat_dim: int = 2048

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array,
                 visual_embeds_att: Array,  # [B, I, P, 2048]
                 roi_embeds_att: Array,     # [B, I, R, 2048]
                 deterministic: bool = True) -> Array:
        cfg = self.text_config
        dt = cfg.jnp_dtype
        text, _ = TextEncoder(cfg, name="roberta")(
            input_ids, None, attention_mask, deterministic)

        b = visual_embeds_att.shape[0]
        vis = visual_embeds_att.reshape(b, -1, self.visual_feat_dim).astype(dt)
        roi = roi_embeds_att.reshape(b, -1, self.visual_feat_dim).astype(dt)
        vis = nn.Dense(cfg.hidden_size, dtype=dt, param_dtype=jnp.float32,
                       kernel_init=layers.normal_init(0.02),
                       name="vis_projection")(vis)
        roi = nn.Dense(cfg.hidden_size, dtype=dt, param_dtype=jnp.float32,
                       kernel_init=layers.normal_init(0.02),
                       name="roi_projection")(roi)
        visual = jnp.concatenate([vis, roi], axis=1)

        attn = MHA(cfg.hidden_size, cfg.num_attention_heads,
                   cfg.attention_probs_dropout_prob, dt,
                   name="cross_attention")(text, visual, visual,
                                           deterministic=deterministic)
        fused = layers.LayerNormTF(epsilon=1e-5, dtype=dt, name="norm_cross")(
            text + attn)

        for i in range(self.num_mm_layers):
            fused = TorchEncoderLayer(cfg.hidden_size, cfg.num_attention_heads,
                                      cfg.intermediate_size,
                                      cfg.hidden_dropout_prob, dt,
                                      name=f"mm_layer_{i}")(
                fused, attention_mask, deterministic)

        cls = fused[:, 0, :]
        cls = nn.Dropout(cfg.hidden_dropout_prob)(cls, deterministic=deterministic)
        return nn.Dense(self.num_labels, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        kernel_init=layers.normal_init(0.02),
                        name="classifier")(cls.astype(jnp.float32))


class TargetImageMatching(nn.Module):
    """MHA + addnorm + 4x FFN + addnorm
    (tomROBERTa/train_tomroberta_vimacsa_full.py:187-199)."""

    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, target: Array, image: Array,
                 deterministic: bool = True) -> Array:
        attn = MHA(self.hidden_size, self.num_heads, self.dropout_rate,
                   self.dtype, name="mha")(target, image, image,
                                           deterministic=deterministic)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        h = layers.LayerNormTF(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            target + attn)
        f = nn.Dense(self.hidden_size * 4, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ff1")(h)
        f = layers.gelu_erf(f)
        f = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ff2")(f)
        f = nn.Dropout(self.dropout_rate)(f, deterministic=deterministic)
        return layers.LayerNormTF(epsilon=1e-5, dtype=self.dtype, name="norm2")(h + f)


class TomBERT(nn.Module):
    text_config: TextEncoderConfig
    num_labels: int = 4
    num_tim_layers: int = 1
    num_mm_layers: int = 1
    visual_feat_dim: int = 2048

    @nn.compact
    def __call__(self, target_ids: Array, target_mask: Array,
                 sentence_ids: Array, sentence_mask: Array,
                 visual_embeds_att: Array, roi_embeds_att: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.text_config
        dt = cfg.jnp_dtype
        backbone = TextEncoder(cfg, name="roberta")  # shared two-stream
        h_t, _ = backbone(target_ids, None, target_mask, deterministic)
        h_s, _ = backbone(sentence_ids, None, sentence_mask, deterministic)

        b = visual_embeds_att.shape[0]
        vis = visual_embeds_att.reshape(b, -1, self.visual_feat_dim).astype(dt)
        roi = roi_embeds_att.reshape(b, -1, self.visual_feat_dim).astype(dt)
        vis = nn.Dense(cfg.hidden_size, dtype=dt, param_dtype=jnp.float32,
                       kernel_init=layers.normal_init(0.02),
                       name="vis_projection")(vis)
        roi = nn.Dense(cfg.hidden_size, dtype=dt, param_dtype=jnp.float32,
                       kernel_init=layers.normal_init(0.02),
                       name="roi_projection")(roi)
        g_visual = jnp.concatenate([vis, roi], axis=1)

        h_v = h_t
        for i in range(self.num_tim_layers):
            h_v = TargetImageMatching(cfg.hidden_size, cfg.num_attention_heads,
                                      cfg.attention_probs_dropout_prob, dt,
                                      name=f"ti_matching_{i}")(
                h_v, g_visual, deterministic)

        mm_input = jnp.concatenate([h_v[:, 0:1, :], h_s], axis=1)
        mm_mask = jnp.concatenate(
            [jnp.ones((b, 1), sentence_mask.dtype), sentence_mask], axis=1)
        h_mm = mm_input
        for i in range(self.num_mm_layers):
            h_mm = TorchEncoderLayer(cfg.hidden_size, cfg.num_attention_heads,
                                     cfg.intermediate_size,
                                     cfg.hidden_dropout_prob, dt,
                                     name=f"mm_layer_{i}")(
                h_mm, mm_mask, deterministic)

        pooled = jnp.concatenate([h_mm[:, 0, :], h_mm[:, 1, :]], axis=-1)
        pooled = nn.Dropout(cfg.hidden_dropout_prob)(pooled,
                                                     deterministic=deterministic)
        return nn.Dense(self.num_labels, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        kernel_init=layers.normal_init(0.02),
                        name="classifier")(pooled.astype(jnp.float32))


class EFCapTrRoBERTa(nn.Module):
    """Text-only classifier over caption-augmented input."""

    text_config: TextEncoderConfig
    num_labels: int = 4

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.text_config
        seq, _ = TextEncoder(cfg, name="roberta")(
            input_ids, None, attention_mask, deterministic)
        cls = seq[:, 0, :]
        cls = nn.Dropout(cfg.hidden_dropout_prob)(cls, deterministic=deterministic)
        return nn.Dense(self.num_labels, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        name="classifier")(cls.astype(jnp.float32))
