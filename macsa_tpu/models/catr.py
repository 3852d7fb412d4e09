"""CATR image-captioning model (TPU-native, Flax).

The reference generates Vietnamese-pipeline captions with the torch-hub CATR
model (reference: EF-CapTrRoBERTa/Caption_Generation/generate_captions_vi.py:
129-130 loads `saahiluppal/catr` v3; :50-71 runs greedy decoding).  CATR is a
DETR-style captioner: ResNet backbone -> 1x1 projection to d=256 -> sine 2-D
position embedding -> 6-layer transformer encoder over the flattened feature
grid -> 6-layer transformer decoder over BERT-tokenized caption prefixes ->
3-layer MLP head to the BERT vocabulary (30522).

TPU-first redesign (not a port):
* The reference's `evaluate` loop re-runs the FULL model (ResNet + encoder +
  decoder) once per generated token — up to 127 complete forwards per batch
  (generate_captions_vi.py:51-70).  Here the image is encoded ONCE and a
  `lax.while_loop` drives decoder-only steps with static shapes, with the
  same all-finished early exit on the SEP token.
* NHWC convolutions, bf16-friendly matmuls, everything jittable.

Weight import is shape-driven: `import_torch_catr` reads a torch state dict
(the hub checkpoint's `model` tree), infers backbone depth / layer counts /
pre-vs-post-norm (DETR only materializes `encoder.norm` when
normalize_before=True) and returns `(CATRConfig, params)`.  This makes the
import robust to the exact hub release without egress to verify one.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from macsa_tpu.config import ResNetConfig
from macsa_tpu.models.resnet import ResNet

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CATRConfig:
    """CATR v3 architecture constants (torch-hub `saahiluppal/catr`)."""

    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    vocab_size: int = 30522          # bert-base-uncased
    max_position_embeddings: int = 128
    layer_norm_eps: float = 1e-12    # DecoderEmbeddings LN
    pre_norm: bool = True            # DETR normalize_before
    mlp_hidden: int = 512
    backbone_stages: Tuple[int, ...] = (3, 4, 23, 3)  # ResNet-101
    backbone_channels: int = 2048
    start_token: int = 101           # [CLS]
    end_token: int = 102             # [SEP]
    pad_token: int = 0


def sine_position_embedding(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0,
                            dtype=jnp.float32) -> Array:
    """DETR PositionEmbeddingSine (normalize=True, scale=2*pi), no padding.

    Returns [h*w, 2*num_pos_feats] (y-part then x-part, per DETR's channel
    concat order).
    """
    eps = 1e-6
    scale = 2 * math.pi
    y = (jnp.arange(1, h + 1, dtype=dtype)[:, None] / (h + eps) * scale)
    x = (jnp.arange(1, w + 1, dtype=dtype)[None, :] / (w + eps) * scale)
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    dim_t = temperature ** (2 * (jnp.arange(num_pos_feats, dtype=dtype) // 2)
                            / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    # interleave sin/cos over pairs, as stack(...,dim=4).flatten(3)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(h, w, num_pos_feats)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, w, num_pos_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1).reshape(h * w, -1)


class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (packed QKV proj)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 mask: Optional[Array] = None) -> Array:
        """q [B,Tq,D], k/v [B,Tk,D], mask additive [*,Tq,Tk] or None."""
        d = self.dim
        in_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (3 * d, d), jnp.float32)
        in_b = self.param("in_proj_bias", nn.initializers.zeros,
                          (3 * d,), jnp.float32)
        hd = d // self.heads
        dt = q.dtype

        def proj(x, i):
            w = in_w[i * d:(i + 1) * d].astype(dt)
            b = in_b[i * d:(i + 1) * d].astype(dt)
            y = x @ w.T + b
            return y.reshape(x.shape[:-1] + (self.heads, hd))

        qh, kh, vh = proj(q, 0), proj(k, 1), proj(v, 2)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        ctx = ctx.reshape(q.shape[:-1] + (d,))
        return nn.Dense(d, dtype=dt, param_dtype=jnp.float32,
                        name="out_proj")(ctx)


def _ln(eps, name=None):
    # use_fast_variance=False: exact E[(x-mu)^2] matches torch LayerNorm
    # bit-for-bit even at large activation magnitudes (parity > the
    # negligible speed delta in this offline tool).
    return nn.LayerNorm(epsilon=eps, dtype=None, param_dtype=jnp.float32,
                        use_fast_variance=False, name=name)


class EncoderLayer(nn.Module):
    """DETR TransformerEncoderLayer (relu FFN; pre/post-norm selectable)."""

    cfg: CATRConfig

    @nn.compact
    def __call__(self, src: Array, pos: Array) -> Array:
        c = self.cfg
        norm1 = _ln(1e-5, "norm1")
        norm2 = _ln(1e-5, "norm2")
        attn = TorchMHA(c.hidden_dim, c.nheads, name="self_attn")
        lin1 = nn.Dense(c.dim_feedforward, dtype=src.dtype,
                        param_dtype=jnp.float32, name="linear1")
        lin2 = nn.Dense(c.hidden_dim, dtype=src.dtype,
                        param_dtype=jnp.float32, name="linear2")
        if c.pre_norm:
            s2 = norm1(src)
            src = src + attn(s2 + pos, s2 + pos, s2)
            s2 = norm2(src)
            return src + lin2(jax.nn.relu(lin1(s2)))
        q = src + pos
        src = norm1(src + attn(q, q, src))
        return norm2(src + lin2(jax.nn.relu(lin1(src))))


class DecoderLayer(nn.Module):
    """DETR TransformerDecoderLayer: causal self-attn + cross-attn + FFN."""

    cfg: CATRConfig

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, query_pos: Array,
                 pos: Array, tgt_mask: Array) -> Array:
        c = self.cfg
        norm1 = _ln(1e-5, "norm1")
        norm2 = _ln(1e-5, "norm2")
        norm3 = _ln(1e-5, "norm3")
        self_attn = TorchMHA(c.hidden_dim, c.nheads, name="self_attn")
        cross = TorchMHA(c.hidden_dim, c.nheads, name="multihead_attn")
        lin1 = nn.Dense(c.dim_feedforward, dtype=tgt.dtype,
                        param_dtype=jnp.float32, name="linear1")
        lin2 = nn.Dense(c.hidden_dim, dtype=tgt.dtype,
                        param_dtype=jnp.float32, name="linear2")
        if c.pre_norm:
            t2 = norm1(tgt)
            tgt = tgt + self_attn(t2 + query_pos, t2 + query_pos, t2, tgt_mask)
            t2 = norm2(tgt)
            tgt = tgt + cross(t2 + query_pos, memory + pos, memory)
            t2 = norm3(tgt)
            return tgt + lin2(jax.nn.relu(lin1(t2)))
        q = tgt + query_pos
        tgt = norm1(tgt + self_attn(q, q, tgt, tgt_mask))
        tgt = norm2(tgt + cross(tgt + query_pos, memory + pos, memory))
        return norm3(tgt + lin2(jax.nn.relu(lin1(tgt))))


class CATR(nn.Module):
    """Full CATR captioner.

    `encode(images)` -> memory; `decode_logits(memory, tokens)` -> [B,T,V];
    `__call__` composes both (the torch model's forward).
    Images: NHWC float, ImageNet-normalized, any (H, W).
    """

    cfg: CATRConfig = CATRConfig()

    def setup(self):
        c = self.cfg
        self.backbone = ResNet(ResNetConfig(stage_sizes=c.backbone_stages,
                                            dtype="float32"))
        self.input_proj = nn.Dense(c.hidden_dim, param_dtype=jnp.float32)
        self.enc = [EncoderLayer(c) for _ in range(c.enc_layers)]
        self.dec = [DecoderLayer(c) for _ in range(c.dec_layers)]
        if c.pre_norm:
            self.encoder_norm = _ln(1e-5)
        self.decoder_norm = _ln(1e-5)
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_dim,
                                        param_dtype=jnp.float32)
        self.position_embeddings = nn.Embed(c.max_position_embeddings,
                                            c.hidden_dim,
                                            param_dtype=jnp.float32)
        self.embed_norm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                       param_dtype=jnp.float32,
                                       use_fast_variance=False)
        dims = [c.mlp_hidden, c.mlp_hidden, c.vocab_size]
        self.mlp = [nn.Dense(d, param_dtype=jnp.float32) for d in dims]

    def encode(self, images: Array) -> Tuple[Array, Array]:
        """[B,H,W,3] -> (memory [B,hw,D], pos [hw,D])."""
        feat = self.backbone(images)          # [B,h,w,2048]
        b, h, w, _ = feat.shape
        src = self.input_proj(feat.astype(jnp.float32)).reshape(
            b, h * w, self.cfg.hidden_dim)    # 1x1 conv == dense on channels
        pos = sine_position_embedding(h, w, self.cfg.hidden_dim // 2)
        x = src
        for layer in self.enc:
            x = layer(x, pos)
        if self.cfg.pre_norm:
            x = self.encoder_norm(x)
        return x, pos

    def decode_logits(self, memory: Array, pos: Array, tokens: Array,
                      pad_mask: Optional[Array] = None) -> Array:
        """tokens [B,T] int32 -> logits [B,T,V] (teacher forcing / prefix).

        `pad_mask` [B,T] True=masked replicates the reference's
        tgt_key_padding_mask; the causal mask is always applied.
        """
        c = self.cfg
        t = tokens.shape[1]
        emb = self.word_embeddings(tokens)
        qpos = self.position_embeddings(jnp.arange(t))
        x = self.embed_norm(emb + qpos[None])
        causal = jnp.where(
            jnp.tril(jnp.ones((t, t), bool)), 0.0, -1e9)[None, None]
        if pad_mask is not None:
            causal = causal + jnp.where(pad_mask, -1e9, 0.0)[:, None, None, :]
        for layer in self.dec:
            x = layer(x, memory, qpos[None], pos, causal)
        x = self.decoder_norm(x)
        for i, layer in enumerate(self.mlp):
            x = layer(x) if i == len(self.mlp) - 1 else jax.nn.relu(layer(x))
        return x

    def __call__(self, images: Array, tokens: Array,
                 pad_mask: Optional[Array] = None) -> Array:
        memory, pos = self.encode(images)
        return self.decode_logits(memory, pos, tokens, pad_mask)


def greedy_decode(model: CATR, params, images: Array,
                  max_len: Optional[int] = None) -> Array:
    """Batched greedy captioning with all-finished early exit.

    Encode once, then `lax.while_loop` decoder-only steps (vs the
    reference's full-model re-forward per token,
    generate_captions_vi.py:51-70).  Returns token ids [B, max_len]
    starting with CLS; everything from the first SEP on is PAD.
    """
    c = model.cfg
    max_len = max_len or c.max_position_embeddings

    @jax.jit
    def run(params, images):
        memory, pos = model.apply(params, images, method=CATR.encode)
        b = images.shape[0]
        tokens0 = jnp.full((b, max_len), c.pad_token, jnp.int32)
        tokens0 = tokens0.at[:, 0].set(c.start_token)

        def cond(state):
            i, _, finished = state
            return (i < max_len - 1) & ~jnp.all(finished)

        def body(state):
            i, tokens, finished = state
            logits = model.apply(params, memory, pos, tokens,
                                 method=CATR.decode_logits)
            nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, c.pad_token, nxt)
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, nxt[:, None], i + 1, axis=1)
            finished = finished | (nxt == c.end_token)
            return i + 1, tokens, finished

        _, tokens, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tokens0, jnp.zeros((b,), bool)))
        return tokens

    return run(params, images)


# --------------------------------------------------------------------------
# torch-hub checkpoint import
# --------------------------------------------------------------------------

def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def infer_catr_config(sd: Dict[str, Any], nheads: int = 8) -> CATRConfig:
    """Derive the architecture from a CATR torch state dict's shapes/keys.

    `nheads` cannot be inferred (the packed in_proj is [3d, d] for any head
    count) — it defaults to CATR's 8; pass explicitly for other models.
    """
    d = _np(sd["input_proj.weight"]).shape[0]
    vocab, _ = _np(sd["transformer.embeddings.word_embeddings.weight"]).shape
    maxpos = _np(sd["transformer.embeddings.position_embeddings.weight"]).shape[0]
    ffn = _np(sd["transformer.encoder.layers.0.linear1.weight"]).shape[0]
    mlp_hidden = _np(sd["mlp.layers.0.weight"]).shape[0]
    n_enc = 1 + max(int(m.group(1)) for k in sd
                    if (m := re.match(r"transformer\.encoder\.layers\.(\d+)\.", k)))
    n_dec = 1 + max(int(m.group(1)) for k in sd
                    if (m := re.match(r"transformer\.decoder\.layers\.(\d+)\.", k)))
    stages = []
    for stage in range(1, 5):
        blocks = {int(m.group(1)) for k in sd
                  if (m := re.match(rf"backbone\.0\.body\.layer{stage}\.(\d+)\.", k))}
        stages.append(1 + max(blocks))
    return CATRConfig(hidden_dim=d, nheads=nheads, vocab_size=vocab,
                      max_position_embeddings=maxpos, dim_feedforward=ffn,
                      mlp_hidden=mlp_hidden, enc_layers=n_enc, dec_layers=n_dec,
                      pre_norm="transformer.encoder.norm.weight" in sd,
                      backbone_stages=tuple(stages))


def import_torch_catr(state_dict: Dict[str, Any], nheads: int = 8
                      ) -> Tuple[CATRConfig, Dict[str, Any]]:
    """torch-hub CATR state dict -> (config, flax params).

    Layer naming follows DETR/CATR: `backbone.0.body.*` (torchvision resnet
    inside IntermediateLayerGetter), `transformer.{encoder,decoder}.layers.N`
    with torch MultiheadAttention packed projections, `transformer.embeddings`
    (BERT-style decoder embeddings), `mlp.layers.N`, `input_proj` (1x1 conv).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    cfg = infer_catr_config(sd, nheads=nheads)

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def lnp(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def mha(prefix):
        return {"in_proj_weight": sd[f"{prefix}.in_proj_weight"],
                "in_proj_bias": sd[f"{prefix}.in_proj_bias"],
                "out_proj": dense(f"{prefix}.out_proj")}

    # ResNet backbone: reuse the torchvision mapping shape (conv/bn pairs)
    def conv(prefix):
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}

    def bn(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"],
                "mean": sd[f"{prefix}.running_mean"],
                "var": sd[f"{prefix}.running_var"]}

    bb = "backbone.0.body"
    backbone: Dict[str, Any] = {"conv1": conv(f"{bb}.conv1"),
                                "bn1": bn(f"{bb}.bn1")}
    for stage, num_blocks in enumerate(cfg.backbone_stages):
        for block in range(num_blocks):
            p = f"{bb}.layer{stage + 1}.{block}"
            entry = {"conv1": conv(f"{p}.conv1"), "bn1": bn(f"{p}.bn1"),
                     "conv2": conv(f"{p}.conv2"), "bn2": bn(f"{p}.bn2"),
                     "conv3": conv(f"{p}.conv3"), "bn3": bn(f"{p}.bn3")}
            if f"{p}.downsample.0.weight" in sd:
                entry["ds_conv"] = conv(f"{p}.downsample.0")
                entry["ds_bn"] = bn(f"{p}.downsample.1")
            backbone[f"layer{stage + 1}_{block}"] = entry

    params: Dict[str, Any] = {
        "backbone": backbone,
        # 1x1 conv [D,2048,1,1] -> dense kernel [2048,D]
        "input_proj": {"kernel": sd["input_proj.weight"][:, :, 0, 0].T,
                       "bias": sd["input_proj.bias"]},
        "word_embeddings": {
            "embedding": sd["transformer.embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["transformer.embeddings.position_embeddings.weight"]},
        "embed_norm": lnp("transformer.embeddings.LayerNorm"),
        "decoder_norm": lnp("transformer.decoder.norm"),
    }
    if cfg.pre_norm:
        params["encoder_norm"] = lnp("transformer.encoder.norm")
    for i in range(cfg.enc_layers):
        p = f"transformer.encoder.layers.{i}"
        params[f"enc_{i}"] = {"self_attn": mha(f"{p}.self_attn"),
                              "linear1": dense(f"{p}.linear1"),
                              "linear2": dense(f"{p}.linear2"),
                              "norm1": lnp(f"{p}.norm1"),
                              "norm2": lnp(f"{p}.norm2")}
    for i in range(cfg.dec_layers):
        p = f"transformer.decoder.layers.{i}"
        params[f"dec_{i}"] = {"self_attn": mha(f"{p}.self_attn"),
                              "multihead_attn": mha(f"{p}.multihead_attn"),
                              "linear1": dense(f"{p}.linear1"),
                              "linear2": dense(f"{p}.linear2"),
                              "norm1": lnp(f"{p}.norm1"),
                              "norm2": lnp(f"{p}.norm2"),
                              "norm3": lnp(f"{p}.norm3")}
    for i in range(3):
        params[f"mlp_{i}"] = dense(f"mlp.layers.{i}")
    return cfg, {"params": params}
