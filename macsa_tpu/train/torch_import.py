"""Import reference-trained PyTorch FCMF checkpoints into macsa_tpu params.

Covers the reference checkpoint naming incl. the legacy variants the
reference's own loader renames (reference: inference.py:163-217):
`ent2img*` -> `text2img*`, `ent2roi*` -> `text2roi*`,
`comb_attention` -> `mm_attention`, and the encoder-prefix fixes.

Module mapping (torch name -> flax path):
* encoder.bert.cell.*                 -> encoder/bert/* (HF RoBERTa import)
* encoder.vismap2text / roimap2text   -> Dense (kernel transposed)
* encoder.box_head.linears.{0,1,2,3}  -> box_head/{q,k,v,out}_proj
* encoder.box_head.WGs.{0..7}         -> box_head/wg (8 Linear(64,1) fused
                                         into one [64, 8] Dense — see
                                         macsa_tpu.models.box_attention)
* encoder.text2img_attention.layer.0.* / encoder.mm_attention.layer.0.*
                                      -> .../layer_0/{attention/{self,output},
                                         mlp/{intermediate_dense,output_dense,
                                         output_LayerNorm}}
* *_pooler.dense, text_pooler, classifier -> same names
* decoder.embedding.weight            -> shared_embedding (tied three ways,
                                         fcmf_pretraining.py:162-166)
* decoder.blks.blockN.*               -> decoder/block_N/* (w_kx/w_qx kept
                                         per-head, proj/ffn transposed,
                                         AddNorm ln weight->scale)
* decoder.dense.bias                  -> decoder/out_bias
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from macsa_tpu.models.text_encoder import import_hf_text_encoder


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def normalize_reference_keys(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """The reference's legacy-key renaming pass (inference.py:172-193)."""
    out = {}
    for key, value in state_dict.items():
        new_key = key
        for prefix in ("module.",):  # DDP wrapper
            if new_key.startswith(prefix):
                new_key = new_key[len(prefix):]
        new_key = new_key.replace("ent2img", "text2img")
        new_key = new_key.replace("ent2roi", "text2roi")
        new_key = new_key.replace("comb_attention", "mm_attention")
        if new_key.startswith("encoder.text_pooler.") or \
                new_key.startswith("encoder.classifier."):
            new_key = new_key.replace("encoder.", "", 1)
        if not new_key.startswith(("encoder.", "decoder.", "text_pooler.",
                                   "classifier.")):
            new_key = "encoder." + new_key
        out[new_key] = _np(value)
    return out


def _dense(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _bert_block(sd, prefix):
    """One fusion BertLayer / BertCrossAttentionLayer."""
    return {
        "attention": {
            "self": {
                "query": _dense(sd, f"{prefix}.attention.self.query"),
                "key": _dense(sd, f"{prefix}.attention.self.key"),
                "value": _dense(sd, f"{prefix}.attention.self.value"),
            },
            "output": {
                "dense": _dense(sd, f"{prefix}.attention.output.dense"),
                "LayerNorm": _ln(sd, f"{prefix}.attention.output.LayerNorm"),
            },
        },
        "mlp": {
            "intermediate_dense": _dense(sd, f"{prefix}.intermediate.dense"),
            "output_dense": _dense(sd, f"{prefix}.output.dense"),
            "output_LayerNorm": _ln(sd, f"{prefix}.output.LayerNorm"),
        },
    }


def _box_head(sd, prefix, num_heads: int = 8):
    wg_kernel = np.stack([_np(sd[f"{prefix}.WGs.{h}.weight"])[0]
                          for h in range(num_heads)], axis=1)  # [64, 8]
    wg_bias = np.asarray([_np(sd[f"{prefix}.WGs.{h}.bias"])[0]
                          for h in range(num_heads)])
    return {
        "q_proj": _dense(sd, f"{prefix}.linears.0"),
        "k_proj": _dense(sd, f"{prefix}.linears.1"),
        "v_proj": _dense(sd, f"{prefix}.linears.2"),
        "out_proj": _dense(sd, f"{prefix}.linears.3"),
        "wg": {"kernel": wg_kernel, "bias": wg_bias},
    }


def import_fcmf_encoder(sd: Dict[str, np.ndarray], num_text_layers: int,
                        tie_external_embedding: bool = False,
                        scan_layers: bool = False) -> Dict[str, Any]:
    """encoder.* keys -> FCMFEncoder params subtree."""
    bert_sd = {k[len("encoder.bert.cell."):]: v for k, v in sd.items()
               if k.startswith("encoder.bert.cell.")}
    bert = import_hf_text_encoder(bert_sd, num_text_layers,
                                  scan_layers=scan_layers)
    if tie_external_embedding:
        bert["embeddings"] = {k: v for k, v in bert["embeddings"].items()
                              if k != "word_embeddings"}
    enc = {
        "bert": bert,
        "vismap2text": _dense(sd, "encoder.vismap2text"),
        "roimap2text": _dense(sd, "encoder.roimap2text"),
        "box_head": _box_head(sd, "encoder.box_head"),
        "text2img_attention": {
            "layer_0": _bert_block(sd, "encoder.text2img_attention.layer.0")},
        "mm_attention": {
            "layer_0": _bert_block(sd, "encoder.mm_attention.layer.0")},
        "text2img_pooler": {"dense": _dense(sd, "encoder.text2img_pooler.dense")},
        "text2roi_pooler": {"dense": _dense(sd, "encoder.text2roi_pooler.dense")},
    }
    return enc


def import_fcmf_classifier(state_dict: Dict[str, Any],
                           num_text_layers: int = 12,
                           scan_layers: bool = False) -> Dict[str, Any]:
    """Full Phase-2 FCMF torch checkpoint -> FCMF (classifier) params."""
    sd = normalize_reference_keys(state_dict)
    return {
        "encoder": import_fcmf_encoder(sd, num_text_layers,
                                       scan_layers=scan_layers),
        "text_pooler": {"dense": _dense(sd, "text_pooler.dense")},
        "classifier": _dense(sd, "classifier"),
    }


def _decoder_block(sd, prefix):
    def attn(p):
        return {
            "w_kx": _np(sd[f"{p}.w_kx"]),
            "w_qx": _np(sd[f"{p}.w_qx"]),
            "proj": _dense(sd, f"{p}.proj"),
        }
    return {
        "attention1": attn(f"{prefix}.attention1"),
        "addnorm1": {"ln": _ln(sd, f"{prefix}.addnorm1.ln")},
        "attention2": attn(f"{prefix}.attention2"),
        "addnorm2": {"ln": _ln(sd, f"{prefix}.addnorm2.ln")},
        "ffn": {"dense1": _dense(sd, f"{prefix}.ffn.dense1"),
                "dense2": _dense(sd, f"{prefix}.ffn.dense2")},
        "add_norm3": {"ln": _ln(sd, f"{prefix}.add_norm3.ln")},
    }


def import_fcmf_seq2seq(state_dict: Dict[str, Any], num_text_layers: int = 12,
                        num_blocks: int = 12,
                        scan_layers: bool = False,
                        scan_blocks: bool = False) -> Dict[str, Any]:
    """Full Phase-1 FCMFSeq2Seq torch checkpoint -> FCMFSeq2Seq params.

    `scan_blocks` emits the decoder in the scanned `blocks/block` layout
    (DecoderConfig.scan_blocks — the pretrain driver's default)."""
    sd = normalize_reference_keys(state_dict)
    decoder = {f"block_{i}": _decoder_block(sd, f"decoder.blks.block{i}")
               for i in range(num_blocks)}
    decoder["out_bias"] = _np(sd["decoder.dense.bias"])
    if scan_blocks and num_blocks > 1:
        from macsa_tpu.models.decoder import stack_block_params
        decoder = stack_block_params(decoder, num_blocks)
    return {
        "shared_embedding": _np(sd["decoder.embedding.weight"]),
        "encoder": import_fcmf_encoder(sd, num_text_layers,
                                       tie_external_embedding=True,
                                       scan_layers=scan_layers),
        "decoder": decoder,
    }


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.save'd checkpoint file -> raw state dict (handles the reference's
    {'model_state_dict': ...} wrapper, run_multimodal_fcmf.py:40-58)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        return ckpt["model_state_dict"]
    return ckpt
