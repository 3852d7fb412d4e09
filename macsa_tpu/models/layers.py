"""BERT-style fusion building blocks, TPU-native.

Functional re-design of the reference's fusion layer zoo
(reference: fcmf_framework/mm_modeling.py:10-431): self-attention layers,
cross-attention ("co-attention") layers, FFN blocks, TF-style LayerNorm
(eps inside the sqrt), and the first/second-token poolers.

TPU notes:
* attention is a single batched einsum chain — no per-head Python loops;
  XLA maps the contractions straight onto the MXU,
* LayerNorm statistics are always computed in float32 regardless of the
  activation dtype (bf16-safe),
* masks are *additive* float masks (0 for keep, -10000.0 for drop), matching
  the reference's convention (mm_modeling.py:206,253; fcmf_pretraining.py:56).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from macsa_tpu.config import ModelConfig

Array = jax.Array


def gelu_erf(x: Array) -> Array:
    """Exact (erf-based) GELU — the reference's `gelu` (mm_modeling.py:10-15)."""
    return jax.nn.gelu(x, approximate=False)


def swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


ACT2FN: dict[str, Callable[[Array], Array]] = {
    "gelu": gelu_erf,
    "relu": jax.nn.relu,
    "swish": swish,
}


def normal_init(stddev: float = 0.02):
    return nn.initializers.normal(stddev=stddev)


class LayerNormTF(nn.Module):
    """LayerNorm with epsilon inside the square root, stats in f32.

    Equivalent math to the reference's FCMFLayerNorm (mm_modeling.py:158-171).
    """

    epsilon: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


def split_heads(x: Array, num_heads: int) -> Array:
    """[B, L, H] -> [B, num_heads, L, H/num_heads]."""
    b, l, h = x.shape
    return x.reshape(b, l, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: Array) -> Array:
    """[B, n, L, d] -> [B, L, n*d]."""
    b, n, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, n * d)


def attention_core(
    q: Array,
    k: Array,
    v: Array,
    additive_mask: Optional[Array],
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    softmax_dtype: jnp.dtype = jnp.float32,
) -> Array:
    """Scaled-dot-product attention over pre-split heads.

    q,k,v: [B, n_heads, L, d]; additive_mask broadcastable to [B, n, Lq, Lk].
    Softmax runs in float32 for bf16 stability; result returns in q.dtype.
    Matches the reference score math (mm_modeling.py:202-215).
    """
    d = q.shape[-1]
    scores = jnp.einsum("bnqd,bnkd->bnqk", q, k).astype(softmax_dtype)
    scores = scores / math.sqrt(d)
    if additive_mask is not None:
        scores = scores + additive_mask.astype(softmax_dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(q.dtype)
    return jnp.einsum("bnqk,bnkd->bnqd", probs, v)


class BertSelfAttention(nn.Module):
    """Multi-head self/cross attention projections + core.

    Covers both BertSelfAttention (mm_modeling.py:174-219) and BertCoAttention
    (mm_modeling.py:221-266) of the reference — they differ only in whether
    K/V come from a second sequence.

    With `config.fused_attention` the softmax+dropout+PV chain runs as one
    Pallas kernel (ops/fused_attention.py) whenever the call site matches the
    kernel's contract — self-attention (Lq == Lk >= 32) under a [B,1,1,Lk]
    padding mask, i.e. exactly the text-encoder blocks.  Other call sites
    (CLS-query-sliced branches, the 15-token fusion stage, cross-attention)
    keep the XLA path.  Deterministic outputs are identical math; training
    dropout masks come from the on-core PRNG instead of jax.random
    (statistically equivalent iid Bernoulli keeps).
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, q_states: Array, kv_states: Array, additive_mask: Optional[Array],
                 deterministic: bool = True) -> Array:
        cfg = self.config
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=cfg.jnp_dtype,
                                      param_dtype=jnp.float32,
                                      kernel_init=normal_init(cfg.initializer_range),
                                      name=name)
        qr = dense("query")(q_states)
        kr = dense("key")(kv_states)
        vr = dense("value")(kv_states)
        rng = (None if deterministic or cfg.attention_probs_dropout_prob == 0.0
               else self.make_rng("dropout"))
        rate = 0.0 if rng is None else cfg.attention_probs_dropout_prob
        # interpret mode is a config decision made by the driver from the
        # platform the computation actually runs on (train.common.
        # resolve_fused_attention) — `jax.default_backend()` lies in mixed
        # TPU-plugin/CPU environments (reports the plugin even when the
        # default device is pinned to CPU).
        interpret = cfg.fused_attention_interpret
        if (cfg.fused_attention and additive_mask is not None
                and additive_mask.ndim == 4 and additive_mask.shape[1] == 1
                and additive_mask.shape[2] == 1
                and qr.shape[1] == kr.shape[1] and qr.shape[1] >= 32
                # interpret mode has no lowering for the in-kernel PRNG —
                # training dropout on CPU stays on the XLA path
                and not (interpret and rate > 0.0)):
            # Multi-chip meshes: the kernel partitions itself via shard_map
            # over the registered mesh (batch over dp, heads over mp) —
            # pallas_call has no GSPMD rule, so the bare call under a
            # sharded jit would be replicated.  Falls back to the XLA path
            # when the static shapes don't tile the mesh.
            from macsa_tpu.parallel.mesh import get_kernel_mesh
            mesh = get_kernel_mesh()
            sharded_ok = mesh is not None and (
                qr.shape[0] % mesh.shape.get("dp", 1) == 0
                and cfg.num_attention_heads % mesh.shape.get("mp", 1) == 0)
            if mesh is None or sharded_ok:
                # the kernel consumes the projections' native [B, L, H*d]
                # layout and returns merged heads — no transpose ops at all
                from macsa_tpu.ops.fused_attention import (
                    fused_self_attention, fused_self_attention_sharded)
                if rng is None:
                    seed = jnp.zeros((1,), jnp.int32)
                else:
                    seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1,
                                              dtype=jnp.int32)
                mask_row = additive_mask[:, 0, 0, :].astype(jnp.float32)
                if mesh is None:
                    return fused_self_attention(
                        qr, kr, vr, mask_row, seed,
                        cfg.num_attention_heads, rate, interpret)
                return fused_self_attention_sharded(
                    qr, kr, vr, mask_row, seed, cfg.num_attention_heads,
                    rate, interpret, mesh=mesh)
        q = split_heads(qr, cfg.num_attention_heads)
        k = split_heads(kr, cfg.num_attention_heads)
        v = split_heads(vr, cfg.num_attention_heads)
        ctx = attention_core(q, k, v, additive_mask,
                             dropout_rate=cfg.attention_probs_dropout_prob,
                             deterministic=deterministic, dropout_rng=rng)
        return merge_heads(ctx)


class BertSelfOutput(nn.Module):
    """dense -> dropout -> LN(x + residual) (mm_modeling.py:269-280)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden: Array, residual: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        h = nn.Dense(cfg.hidden_size, dtype=cfg.jnp_dtype, param_dtype=jnp.float32,
                     kernel_init=normal_init(cfg.initializer_range), name="dense")(hidden)
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        return LayerNormTF(epsilon=cfg.layer_norm_eps, dtype=cfg.jnp_dtype,
                           name="LayerNorm")(h + residual)


class BertAttention(nn.Module):
    """Self-attention + output block (mm_modeling.py:283-292).

    `num_query_tokens` restricts the *query* rows to the first N tokens
    (K/V stay full).  Because query rows never interact inside one
    attention+FFN layer, the first N output rows are mathematically
    identical to slicing the full output — an exact speedup when only a
    pooled prefix (e.g. the CLS token) is consumed downstream."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden: Array, additive_mask: Optional[Array],
                 deterministic: bool = True,
                 num_query_tokens: Optional[int] = None) -> Array:
        q_states = (hidden if num_query_tokens is None
                    else hidden[:, :num_query_tokens])
        ctx = BertSelfAttention(self.config, name="self")(
            q_states, hidden, additive_mask, deterministic)
        return BertSelfOutput(self.config, name="output")(ctx, q_states,
                                                          deterministic)


class BertCrossAttention(nn.Module):
    """Cross-attention (Q from s1, K/V from s2) + output (mm_modeling.py:294-303)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, s1: Array, s2: Array, s2_additive_mask: Optional[Array],
                 deterministic: bool = True) -> Array:
        ctx = BertSelfAttention(self.config, name="self")(
            s1, s2, s2_additive_mask, deterministic)
        return BertSelfOutput(self.config, name="output")(ctx, s1, deterministic)


class BertMLP(nn.Module):
    """Intermediate + output FFN (mm_modeling.py:305-328)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        act = ACT2FN[cfg.hidden_act]
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.jnp_dtype, param_dtype=jnp.float32,
                     kernel_init=normal_init(cfg.initializer_range),
                     name="intermediate_dense")(hidden)
        h = act(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.jnp_dtype, param_dtype=jnp.float32,
                     kernel_init=normal_init(cfg.initializer_range),
                     name="output_dense")(h)
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        return LayerNormTF(epsilon=cfg.layer_norm_eps, dtype=cfg.jnp_dtype,
                           name="output_LayerNorm")(h + hidden)


def _mlp_cls(cfg: "ModelConfig"):
    """BertMLP, optionally remat'ed FFN-only (ModelConfig.remat_ffn):
    checkpoint_dots saves the pre-activation FFN1 output and recomputes
    gelu in the backward, halving the wide [.., L, intermediate]
    saved-activation writes without touching the attention (whose Pallas
    custom-VJP a whole-block remat would force to recompute).  Param path
    is unchanged (nn.remat wraps the class; `name=` stays "mlp")."""
    if not cfg.remat_ffn:
        return BertMLP
    import jax
    # wrapped fn sees (module, hidden, deterministic): deterministic (a
    # python bool) is static arg 2
    return nn.remat(BertMLP, static_argnums=(2,),
                    policy=jax.checkpoint_policies.checkpoint_dots)


class BertLayer(nn.Module):
    """Full transformer layer (mm_modeling.py:331-342)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden: Array, additive_mask: Optional[Array],
                 deterministic: bool = True,
                 num_query_tokens: Optional[int] = None) -> Array:
        h = BertAttention(self.config, name="attention")(
            hidden, additive_mask, deterministic,
            num_query_tokens=num_query_tokens)
        return _mlp_cls(self.config)(self.config, name="mlp")(h, deterministic)


class BertCrossAttentionLayer(nn.Module):
    """Cross-attention transformer layer (mm_modeling.py:344-355)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, s1: Array, s2: Array, s2_additive_mask: Optional[Array],
                 deterministic: bool = True) -> Array:
        h = BertCrossAttention(self.config, name="attention")(
            s1, s2, s2_additive_mask, deterministic)
        return _mlp_cls(self.config)(self.config, name="mlp")(h, deterministic)


class MultimodalEncoder(nn.Module):
    """Stack of `num_layers` BertLayers; the reference uses 1
    (mm_modeling.py:373-387)."""

    config: ModelConfig
    num_layers: int = 1

    @nn.compact
    def __call__(self, hidden: Array, additive_mask: Optional[Array],
                 deterministic: bool = True,
                 num_query_tokens: Optional[int] = None) -> Array:
        """`num_query_tokens`: compute only the first N output rows.  Exact
        (see BertAttention) — applied at the LAST layer only, since earlier
        layers must still produce every token as K/V for the next."""
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            hidden = BertLayer(self.config, name=f"layer_{i}")(
                hidden, additive_mask, deterministic,
                num_query_tokens=num_query_tokens if last else None)
        return hidden


class BertCrossEncoder(nn.Module):
    """Stack of `num_layers` cross-attention layers; the reference uses 1
    (mm_modeling.py:389-403)."""

    config: ModelConfig
    num_layers: int = 1

    @nn.compact
    def __call__(self, s1: Array, s2: Array, s2_additive_mask: Optional[Array],
                 deterministic: bool = True) -> Array:
        for i in range(self.num_layers):
            s1 = BertCrossAttentionLayer(self.config, name=f"layer_{i}")(
                s1, s2, s2_additive_mask, deterministic)
        return s1


class TokenPooler(nn.Module):
    """dense+tanh over the hidden state at `token_index`.

    token_index=0 == BertPooler (mm_modeling.py:419-431);
    token_index=1 == BertText1Pooler (mm_modeling.py:405-417).
    """

    config: ModelConfig
    token_index: int = 0

    @nn.compact
    def __call__(self, hidden: Array) -> Array:
        cfg = self.config
        first = hidden[:, self.token_index]
        pooled = nn.Dense(cfg.hidden_size, dtype=cfg.jnp_dtype, param_dtype=jnp.float32,
                          kernel_init=normal_init(cfg.initializer_range),
                          name="dense")(first)
        return jnp.tanh(pooled)


class AttentionPooler(nn.Module):
    """dense+tanh applied position-wise (mm_modeling.py:148-157)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden: Array) -> Array:
        cfg = self.config
        pooled = nn.Dense(cfg.hidden_size, dtype=cfg.jnp_dtype, param_dtype=jnp.float32,
                          kernel_init=normal_init(cfg.initializer_range),
                          name="dense")(hidden)
        return jnp.tanh(pooled)


def extend_attention_mask(mask: Array, dtype=jnp.float32, neg: float = -10000.0) -> Array:
    """[B, L] 0/1 mask -> [B, 1, 1, L] additive mask with `neg` at masked slots.

    The reference's extended-mask convention (fcmf_pretraining.py:54-56)."""
    ext = mask[:, None, None, :].astype(dtype)
    return (1.0 - ext) * neg
