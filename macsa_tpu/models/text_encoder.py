"""XLM-R / ViSoBERT-compatible RoBERTa text encoder (Flax).

The reference wraps a HuggingFace `AutoModel` as its text backbone
(reference: fcmf_framework/mm_modeling.py:433-446) and feeds it
`input_ids/token_type_ids/attention_mask`, consuming
`(sequence_output, pooled_output)`.  Here the backbone is a from-scratch Flax
RoBERTa with a weight-import path from HF PyTorch checkpoints, so reference
checkpoints produce logit-parity on TPU.

TPU notes: all layers reuse the fused einsum attention of
`macsa_tpu.models.layers`; activations run in the configured compute dtype
(bf16 in training) while LayerNorm statistics stay f32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from macsa_tpu.config import ModelConfig, TextEncoderConfig
from macsa_tpu.models import layers

Array = jax.Array


def _block_config(cfg: TextEncoderConfig) -> ModelConfig:
    """Transformer-block hyperparams for the backbone (HF RoBERTa LN eps=1e-5)."""
    return ModelConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act="gelu",
        hidden_dropout_prob=cfg.hidden_dropout_prob,
        attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
        layer_norm_eps=cfg.layer_norm_eps,
        initializer_range=cfg.initializer_range,
        dtype=cfg.dtype,
        fused_attention=cfg.fused_attention,
        fused_attention_interpret=cfg.fused_attention_interpret,
        remat_ffn=cfg.remat_ffn,
    )


def create_position_ids(input_ids: Array, padding_idx: int) -> Array:
    """RoBERTa position ids: pad tokens keep padding_idx; others count from
    padding_idx+1 (HF `create_position_ids_from_input_ids` semantics)."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx


class RobertaEmbeddings(nn.Module):
    config: TextEncoderConfig

    @nn.compact
    def __call__(self, input_ids: Array, token_type_ids: Optional[Array] = None,
                 deterministic: bool = True,
                 embedding_table: Optional[Array] = None) -> Array:
        cfg = self.config
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        if embedding_table is not None:
            # externally shared token embeddings (seq2seq three-way weight
            # tying, fcmf_pretraining.py:162-166)
            word = embedding_table[input_ids].astype(cfg.jnp_dtype)
        else:
            word = nn.Embed(cfg.vocab_size, cfg.hidden_size, embedding_init=init,
                            param_dtype=jnp.float32, dtype=cfg.jnp_dtype,
                            name="word_embeddings")(input_ids)
        pos_ids = create_position_ids(input_ids, cfg.pad_token_id)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, embedding_init=init,
                       param_dtype=jnp.float32, dtype=cfg.jnp_dtype,
                       name="position_embeddings")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, embedding_init=init,
                       param_dtype=jnp.float32, dtype=cfg.jnp_dtype,
                       name="token_type_embeddings")(token_type_ids)
        h = word + pos + tok
        h = layers.LayerNormTF(epsilon=cfg.layer_norm_eps, dtype=cfg.jnp_dtype,
                               name="LayerNorm")(h)
        return nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)


class _ScanBertLayer(nn.Module):
    """BertLayer body with the (carry, y) contract `nn.scan` expects."""

    config: ModelConfig

    @nn.compact
    def __call__(self, hidden: Array, additive_mask: Array,
                 deterministic: bool) -> Tuple[Array, None]:
        hidden = layers.BertLayer(self.config, name="layer")(
            hidden, additive_mask, deterministic)
        return hidden, None


class TextEncoder(nn.Module):
    """RoBERTa encoder returning (sequence_output, pooled_output).

    Same output contract the reference consumes from its FeatureExtractor
    (mm_modeling.py:440-446).

    With `config.scan_layers` the layer stack runs as a `lax.scan` over one
    compiled layer body with params stacked on a leading [num_layers] axis
    (path `layers/layer/...`); otherwise layers unroll as `layer_{i}`
    modules (the default — see config.py for the measured trade-off).
    Identical math either way — `stack_layer_params`/`unstack_layer_params`
    convert between the two param layouts (and work under jit, so
    forward-only programs can consume unrolled checkpoints through the
    scanned module at the cost of one in-program stack).
    """

    config: TextEncoderConfig

    @nn.compact
    def __call__(self, input_ids: Array, token_type_ids: Optional[Array] = None,
                 attention_mask: Optional[Array] = None,
                 deterministic: bool = True,
                 embedding_table: Optional[Array] = None) -> Tuple[Array, Array]:
        cfg = self.config
        block_cfg = _block_config(cfg)
        h = RobertaEmbeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, deterministic, embedding_table)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        # HF extended-mask convention: (1 - m) * finfo.min
        ext = attention_mask[:, None, None, :].astype(jnp.float32)
        ext = (1.0 - ext) * jnp.finfo(jnp.float32).min
        if cfg.scan_layers and cfg.num_hidden_layers > 1:
            scan = nn.scan(
                _ScanBertLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=cfg.num_hidden_layers,
                unroll=cfg.scan_unroll,
            )
            h, _ = scan(block_cfg, name="layers")(h, ext, deterministic)
        else:
            block_cls = layers.BertLayer
            if cfg.remat_blocks:
                import jax
                # wrapped fn sees (module, hidden, mask, deterministic):
                # deterministic (a python bool) is static arg 3
                block_cls = nn.remat(
                    layers.BertLayer, static_argnums=(3,),
                    policy=jax.checkpoint_policies.checkpoint_dots)
            for i in range(cfg.num_hidden_layers):
                h = block_cls(block_cfg, name=f"layer_{i}")(h, ext,
                                                            deterministic)
        pooled = layers.TokenPooler(block_cfg, token_index=0, name="pooler")(h)
        return h, pooled


def stack_layer_params(params: Dict[str, Any],
                       num_layers: int) -> Dict[str, Any]:
    """Convert unrolled `layer_{i}` TextEncoder params to the scanned
    `layers/layer` layout (leaves stacked on a leading [L] axis)."""
    if "layers" in params or num_layers <= 1:
        return params
    out = {k: v for k, v in params.items()
           if not k.startswith("layer_")}
    per_layer = [params[f"layer_{i}"] for i in range(num_layers)]
    # numpy stacking for host-side use (imports, checkpoint conversion);
    # jnp under tracing so the conversion can live inside a jitted program
    on_host = all(not isinstance(x, jax.core.Tracer)
                  for x in jax.tree_util.tree_leaves(per_layer))
    stack = ((lambda *xs: np.stack([np.asarray(x) for x in xs]))
             if on_host else (lambda *xs: jnp.stack(xs)))
    out["layers"] = {"layer": jax.tree_util.tree_map(stack, *per_layer)}
    return out


def unstack_layer_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of `stack_layer_params` (scanned -> unrolled layout)."""
    if "layers" not in params:
        return params
    out = {k: v for k, v in params.items() if k != "layers"}
    stacked = params["layers"]["layer"]
    num_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(num_layers):
        out[f"layer_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return out


# ---------------------------------------------------------------------------
# HF PyTorch checkpoint import
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    arr = np.asarray(x)
    return arr.T if arr.ndim == 2 else arr


def import_hf_text_encoder(state_dict: Dict[str, Any],
                           num_layers: int,
                           scan_layers: bool = False) -> Dict[str, Any]:
    """Map a HF RoBERTa/XLM-R PyTorch state dict (tensors or numpy arrays,
    keys optionally prefixed with 'roberta.'/'bert.'/'cell.') to TextEncoder
    params.  Kernels are transposed torch [out,in] -> flax [in,out].

    `scan_layers` selects the param layout — unrolled `layer_{i}`
    (default, matches TextEncoderConfig.scan_layers) or stacked
    `layers/layer`.

    Covers the legacy-name variance the reference handles at load time
    (inference.py:172-193) by stripping any leading model prefix.
    """
    sd: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        for prefix in ("roberta.", "bert.", "cell.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        sd[k] = np.asarray(v)

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}

    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
            "LayerNorm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "self": {
                    "query": dense(f"{p}.attention.self.query"),
                    "key": dense(f"{p}.attention.self.key"),
                    "value": dense(f"{p}.attention.self.value"),
                },
                "output": {
                    "dense": dense(f"{p}.attention.output.dense"),
                    "LayerNorm": ln(f"{p}.attention.output.LayerNorm"),
                },
            },
            "mlp": {
                "intermediate_dense": dense(f"{p}.intermediate.dense"),
                "output_dense": dense(f"{p}.output.dense"),
                "output_LayerNorm": ln(f"{p}.output.LayerNorm"),
            },
        }
    if "pooler.dense.weight" in sd:
        params["pooler"] = {"dense": dense("pooler.dense")}
    if scan_layers and num_layers > 1:
        params = stack_layer_params(params, num_layers)
    return params


def load_hf_checkpoint(path: str, dtype: str = "float32",
                       scan_layers: bool = False):
    """Load a local HF checkpoint directory -> (TextEncoderConfig, params).

    Uses `transformers` only for config/tokenizer plumbing and `torch` (CPU)
    or safetensors purely to read the weight file; all compute is JAX.
    """
    import json
    import os

    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = TextEncoderConfig.from_hf_config(hf_cfg, dtype=dtype)

    st_path = os.path.join(path, "model.safetensors")
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file
        sd = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch
        sd = {k: v.numpy() for k, v in torch.load(bin_path, map_location="cpu").items()}
    else:
        raise FileNotFoundError(f"no weight file under {path}")
    import dataclasses
    cfg = dataclasses.replace(cfg, scan_layers=scan_layers)
    params = import_hf_text_encoder(sd, cfg.num_hidden_layers,
                                    scan_layers=scan_layers)
    return cfg, params
