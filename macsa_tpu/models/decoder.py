"""IAOG transformer decoder (TPU-native, static-shape KV cache).

Re-design of the reference decoder stack (reference:
fcmf_framework/mm_modeling.py:558-666): position-wise FFN, AddNorm,
TransformerDecoderBlock (causal self-attention + cross-attention to the fused
encoder sequence), sinusoidal positional encoding, and the 12-block
`IAOGDecoder` whose output head is weight-tied to the token embedding
(mm_modeling.py:644-645).

TPU decode path: the reference caches each block's *input* states by python
list concat (`state[2][i]`, mm_modeling.py:588-591).  Here the cache is a
preallocated [B, max_len, H] buffer per block written with
`lax.dynamic_update_slice`, and attention masks out unwritten positions —
identical math, fully static shapes, scannable.

Cross-attention mask semantics (config `decoder_cross_mask_mode`):
* "causal_quirk" (faithful default): the reference passes the 0/1 combined
  encoder mask as `memory_len`; being 2-D it triggers a causal tril over
  (dec_len, enc_len) regardless of values (mm_modeling.py:115-118,607-610), so
  decoder step t attends encoder tokens 0..t only.  At incremental decode we
  keep the train-consistent rule (step t sees 0..t); the reference's own eval
  harness is commented out (fcmf_pretraining.py:379-518) so train semantics
  are definitive.
* "padding": the sane alternative — the combined mask is used as an encoder
  padding mask.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from macsa_tpu.config import DecoderConfig
from macsa_tpu.models import layers
from macsa_tpu.models.attention import PerHeadAttention, MASK_FILL

Array = jax.Array
Cache = Dict[str, Any]


def sinusoidal_positions(max_len: int, dim: int) -> jnp.ndarray:
    """P[pos, 2i] = sin(pos / 10000^(2i/dim)), P[pos, 2i+1] = cos(...)
    (mm_modeling.py:615-627)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    inv = jnp.power(10000.0, jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    x = pos / inv  # [max_len, dim/2]
    p = jnp.zeros((max_len, dim), dtype=jnp.float32)
    p = p.at[:, 0::2].set(jnp.sin(x))
    p = p.at[:, 1::2].set(jnp.cos(x))
    return p


class PositionWiseFFN(nn.Module):
    """dense1 -> gelu -> dense2 (mm_modeling.py:558-565)."""

    hidden_size: int
    ffn_hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.ffn_hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="dense1")(x)
        h = layers.gelu_erf(h)
        return nn.Dense(self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                        name="dense2")(h)


class AddNorm(nn.Module):
    """LN(dropout(Y) + X) (mm_modeling.py:566-573)."""

    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, y: Array, deterministic: bool = True) -> Array:
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return layers.LayerNormTF(epsilon=1e-12, dtype=self.dtype, name="ln")(y + x)


class TransformerDecoderBlock(nn.Module):
    """Causal self-attn + encoder cross-attn + FFN (mm_modeling.py:574-613)."""

    config: DecoderConfig
    cross_mask_mode: str = "causal_quirk"

    def setup(self):
        cfg = self.config
        emulate = cfg.emulate_reference_heads
        self.attention1 = PerHeadAttention(cfg.hidden_size, cfg.head_dim, cfg.num_heads,
                                           dtype=cfg.jnp_dtype,
                                           emulate_reference_heads=emulate)
        self.addnorm1 = AddNorm(cfg.dropout, dtype=cfg.jnp_dtype)
        self.attention2 = PerHeadAttention(cfg.hidden_size, cfg.head_dim, cfg.num_heads,
                                           dtype=cfg.jnp_dtype,
                                           emulate_reference_heads=emulate)
        self.addnorm2 = AddNorm(cfg.dropout, dtype=cfg.jnp_dtype)
        self.ffn = PositionWiseFFN(cfg.hidden_size, cfg.ffn_hidden, dtype=cfg.jnp_dtype)
        self.add_norm3 = AddNorm(cfg.dropout, dtype=cfg.jnp_dtype)

    def _cross(self, y: Array, enc_outputs: Array, enc_mask: Optional[Array],
               step: Optional[Array], deterministic: bool) -> Array:
        """Cross-attention with the configured mask semantics."""
        b, lq = y.shape[0], y.shape[1]
        lk = enc_outputs.shape[1]
        if self.cross_mask_mode == "causal_quirk":
            if step is None:  # teacher forcing: tril(q_len, enc_len)
                return self.attention2(enc_outputs, y, causal=True)
            # incremental: step t sees encoder tokens 0..t
            lengths = jnp.full((b,), 0, jnp.int32) + jnp.minimum(step + 1, lk)
            return self.attention2(enc_outputs, y, lengths=lengths)
        # padding mode: enc_mask is a [B, Lk] 0/1 mask
        if enc_mask is None:
            return self.attention2(enc_outputs, y)
        return self.attention2(enc_outputs, y, key_mask=enc_mask)

    def __call__(self, x: Array, enc_outputs: Array, enc_mask: Optional[Array],
                 deterministic: bool = True,
                 cache: Optional[Cache] = None,
                 step: Optional[Array] = None) -> Tuple[Array, Optional[Cache]]:
        if cache is None:
            # teacher forcing: causal tril over the full sequence
            x2 = self.attention1(x, x, causal=True)
            y = self.addnorm1(x, x2, deterministic)
            y2 = self._cross(y, enc_outputs, enc_mask, None, deterministic)
            z = self.addnorm2(y, y2, deterministic)
            out = self.add_norm3(z, self.ffn(z), deterministic)
            return out, None

        # incremental decode: x is [B, 1, H]; cache["kv"] is [B, max_len, H]
        kv = jax.lax.dynamic_update_slice(
            cache["kv"], x.astype(cache["kv"].dtype), (0, step, 0))
        lengths = jnp.full((x.shape[0],), step + 1, jnp.int32)
        x2 = self.attention1(kv, x, lengths=lengths)
        y = self.addnorm1(x, x2, deterministic)
        y2 = self._cross(y, enc_outputs, enc_mask, step, deterministic)
        z = self.addnorm2(y, y2, deterministic)
        out = self.add_norm3(z, self.ffn(z), deterministic)
        return out, {"kv": kv}


class _ScanDecoderBlock(nn.Module):
    """TransformerDecoderBlock body with the (carry, ys) contract `nn.scan`
    expects; the per-block KV cache (when decoding) is the scanned
    input/output (stacked on a leading [num_blocks] axis)."""

    config: DecoderConfig
    cross_mask_mode: str

    @nn.compact
    def __call__(self, x: Array, cache_kv: Optional[Array],
                 enc_outputs: Array, enc_mask: Optional[Array],
                 deterministic: bool, step: Optional[Array]):
        blk = TransformerDecoderBlock(self.config,
                                      cross_mask_mode=self.cross_mask_mode,
                                      name="block")
        cache = None if cache_kv is None else {"kv": cache_kv}
        out, new_cache = blk(x, enc_outputs, enc_mask, deterministic,
                             cache=cache, step=step)
        return out, (None if new_cache is None else new_cache["kv"])


class IAOGDecoder(nn.Module):
    """12-block decoder; embedding scaled by sqrt(H) + sinusoidal pos-enc;
    output head weight-tied to the embedding (mm_modeling.py:634-666).

    The token-embedding table is passed in (shared three ways with the text
    backbone, fcmf_pretraining.py:162-166).

    With `config.scan_blocks` the block stack runs as one `lax.scan` body
    with params stacked on a leading [num_blocks] axis (path
    `blocks/block/...`) and the decode cache a single stacked
    [num_blocks, B, max_len, H] buffer; otherwise blocks unroll as
    `block_{i}` modules.  Identical math either way —
    `stack_block_params`/`unstack_block_params` convert layouts (see
    config.py for the measured trade-off: the T=20 decoder is
    dispatch-bound when unrolled).
    """

    config: DecoderConfig
    cross_mask_mode: str = "causal_quirk"

    @property
    def _scanned(self) -> bool:
        return self.config.scan_blocks and self.config.num_blocks > 1

    def init_cache(self, batch_size: int) -> Cache:
        cfg = self.config
        shape = (batch_size, cfg.max_decode_len, cfg.hidden_size)
        if self._scanned:
            return {"kv": jnp.zeros((cfg.num_blocks,) + shape, cfg.jnp_dtype)}
        return {f"block_{i}": {"kv": jnp.zeros(shape, cfg.jnp_dtype)}
                for i in range(cfg.num_blocks)}

    def _embed(self, token_ids: Array, embedding_table: Array,
               position_offset: Array, deterministic: bool) -> Array:
        cfg = self.config
        x = embedding_table[token_ids].astype(cfg.jnp_dtype) * math.sqrt(cfg.hidden_size)
        l = token_ids.shape[1]
        pos_table = sinusoidal_positions(cfg.max_position_embeddings,
                                         cfg.hidden_size)
        pe = jax.lax.dynamic_slice(pos_table, (position_offset, 0),
                                   (l, cfg.hidden_size))
        x = x + pe.astype(cfg.jnp_dtype)[None]
        return nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

    @nn.compact
    def __call__(self, token_ids: Array, enc_outputs: Array,
                 enc_mask: Optional[Array], embedding_table: Array,
                 deterministic: bool = True,
                 cache: Optional[Cache] = None,
                 step: Optional[Array] = None,
                 return_hidden: bool = False):
        """Teacher-forcing when cache is None ([B, T] ids -> [B, T, V] logits);
        otherwise one decode step ([B, 1] ids -> [B, 1, V] logits, new cache).

        `return_hidden` (teacher-forcing only) skips the weight-tied output
        head and returns the final hidden states [B, T, H] — the fused
        chunked-vocab CE (seq2seq.chunked_seq2seq_loss) applies the head
        chunk-by-chunk without materializing [B, T, V] logits."""
        cfg = self.config
        offset = jnp.asarray(0, jnp.int32) if cache is None else step
        x = self._embed(token_ids, embedding_table, offset, deterministic)
        if self._scanned:
            scan = nn.scan(
                _ScanDecoderBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=((nn.broadcast if cache is None else 0,)
                         + (nn.broadcast,) * 4),
                out_axes=0,
                length=cfg.num_blocks,
                unroll=cfg.scan_unroll,
            )
            cache_kv = None if cache is None else cache["kv"]
            x, kv = scan(cfg, self.cross_mask_mode, name="blocks")(
                x, cache_kv, enc_outputs, enc_mask, deterministic, step)
            new_cache = None if cache is None else {"kv": kv}
        else:
            new_cache = {} if cache is not None else None
            for i in range(cfg.num_blocks):
                blk = TransformerDecoderBlock(
                    cfg, cross_mask_mode=self.cross_mask_mode,
                    name=f"block_{i}")
                blk_cache = None if cache is None else cache[f"block_{i}"]
                x, updated = blk(x, enc_outputs, enc_mask, deterministic,
                                 cache=blk_cache, step=step)
                if cache is not None:
                    new_cache[f"block_{i}"] = updated
        out_bias = self.param("out_bias", nn.initializers.zeros,
                              (cfg.vocab_size,), jnp.float32)
        if return_hidden:
            return x
        logits = (x.astype(jnp.float32) @ embedding_table.T.astype(jnp.float32)
                  + out_bias)
        if cache is not None:
            return logits, new_cache
        return logits


def stack_block_params(params: Dict[str, Any],
                       num_blocks: int) -> Dict[str, Any]:
    """Convert unrolled `block_{i}` IAOGDecoder params to the scanned
    `blocks/block` layout (leaves stacked on a leading [num_blocks] axis).
    jit-safe; no-op if already stacked."""
    if "blocks" in params or num_blocks <= 1:
        return params
    import numpy as np
    out = {k: v for k, v in params.items() if not k.startswith("block_")}
    per_block = [params[f"block_{i}"] for i in range(num_blocks)]
    on_host = all(not isinstance(x, jax.core.Tracer)
                  for x in jax.tree_util.tree_leaves(per_block))
    stack = ((lambda *xs: np.stack([np.asarray(x) for x in xs]))
             if on_host else (lambda *xs: jnp.stack(xs)))
    out["blocks"] = {"block": jax.tree_util.tree_map(stack, *per_block)}
    return out


def unstack_block_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of `stack_block_params` (scanned -> unrolled layout)."""
    if "blocks" not in params:
        return params
    out = {k: v for k, v in params.items() if k != "blocks"}
    stacked = params["blocks"]["block"]
    num_blocks = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(num_blocks):
        out[f"block_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return out
