"""Baseline model tests: forward shapes, masking behavior, a train step that
learns, and dataset tokenization formats."""

import jax
import jax.numpy as jnp
import numpy as np

from macsa_tpu.config import TextEncoderConfig
from macsa_tpu.models.baselines import (EFCapTrRoBERTa, MRoBERTa, TomBERT,
                                        TorchEncoderLayer)
from macsa_tpu.data.baselines import EFCapDataset, MRoBERTaDataset, TomBERTDataset

TEXT = TextEncoderConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=4, intermediate_size=32,
                         max_position_embeddings=64)
B, A, L, I, P, R = 2, 6, 10, 2, 4, 2
VD = 64


def test_torch_encoder_layer_masks_padded_keys(rng):
    layer = TorchEncoderLayer(hidden_size=16, num_heads=4, ffn_size=32,
                              dropout_rate=0.0)
    x = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    out = layer.apply(params, x, mask)
    x2 = x.at[:, 4:].add(100.0)
    out2 = layer.apply(params, x2, mask)
    # batch 0 ignores padded keys (positions 4-5) except at those query rows
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(out2[0, :4]),
                               rtol=1e-4, atol=1e-4)
    assert not np.allclose(np.asarray(out[1, :4]), np.asarray(out2[1, :4]))


def _visual(rng):
    vis = jnp.asarray(rng.normal(size=(B, I, P, VD)).astype(np.float32))
    roi = jnp.asarray(rng.normal(size=(B, I, R, VD)).astype(np.float32))
    return vis, roi


def test_mroberta_forward(rng):
    model = MRoBERTa(TEXT, visual_feat_dim=VD)
    ids = jnp.asarray(rng.integers(2, 128, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    vis, roi = _visual(rng)
    params = model.init(jax.random.PRNGKey(0), ids, mask, vis, roi)
    logits = jax.jit(lambda p: model.apply(p, ids, mask, vis, roi))(params)
    assert logits.shape == (B, 4)
    # visual features must influence the output
    logits2 = model.apply(params, ids, mask, vis * 0.0, roi * 0.0)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_tomroberta_forward(rng):
    model = TomBERT(TEXT, visual_feat_dim=VD)
    t_ids = jnp.asarray(rng.integers(2, 128, size=(B, 6)).astype(np.int32))
    t_mask = jnp.ones((B, 6), jnp.int32)
    s_ids = jnp.asarray(rng.integers(2, 128, size=(B, L)).astype(np.int32))
    s_mask = jnp.ones((B, L), jnp.int32)
    vis, roi = _visual(rng)
    params = model.init(jax.random.PRNGKey(0), t_ids, t_mask, s_ids, s_mask,
                        vis, roi)
    logits = model.apply(params, t_ids, t_mask, s_ids, s_mask, vis, roi)
    assert logits.shape == (B, 4)
    # shared backbone: exactly one roberta subtree
    assert "roberta" in params["params"]


def test_efcap_forward(rng):
    model = EFCapTrRoBERTa(TEXT)
    ids = jnp.asarray(rng.integers(2, 128, size=(B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    logits = model.apply(params, ids, mask)
    assert logits.shape == (B, 4)


class FakeTokenizer:
    pad_token_id = 1

    def __init__(self):
        self.calls = []

    def __call__(self, text, pair=None, max_length=None, truncation=None,
                 padding=None, return_token_type_ids=False):
        self.calls.append({"text": text, "pair": pair, "max_length": max_length})
        ids = [ord(c) % 90 + 3 for c in (str(text) + str(pair or ""))][:max_length]
        ids += [self.pad_token_id] * (max_length - len(ids))
        out = {"input_ids": ids,
               "attention_mask": [1 if i != self.pad_token_id else 0 for i in ids]}
        if return_token_type_ids:
            out["token_type_ids"] = [0] * max_length
        return out


REC = {"comment": "Phòng đẹp", "list_img": ["a.png"],
       "text_img_label": ["Room#Positive"]}


def test_mroberta_dataset_format(tmp_path):
    tok = FakeTokenizer()
    ds = MRoBERTaDataset([REC], tok, str(tmp_path), {}, num_img=2, num_roi=2,
                         max_len=16, load_images=False)
    s = ds[0]
    assert s["input_ids"].shape == (6, 16)
    # pair tokenization (aspect.lower(), text.lower())
    assert tok.calls[0]["text"] == "location"
    assert tok.calls[0]["pair"] == "phòng đẹp"
    assert tok.calls[5]["text"] == "public area"


def test_tomroberta_dataset_format(tmp_path):
    tok = FakeTokenizer()
    ds = TomBERTDataset([REC], tok, str(tmp_path), {}, num_img=2, num_roi=2,
                        sentence_len=24, load_images=False)
    s = ds[0]
    assert s["target_ids"].shape == (6, 16)
    assert s["input_ids"].shape == (6, 24)
    assert tok.calls[0]["text"] == "location"       # target
    assert tok.calls[1]["text"] == "location </s></s> phòng đẹp"  # sentence


def test_efcap_dataset_format():
    tok = FakeTokenizer()
    ds = EFCapDataset([REC], tok, {"a.png": "một căn phòng"}, num_img=2,
                      max_len=32)
    s = ds[0]
    assert s["input_ids"].shape == (6, 32)
    assert tok.calls[0]["text"] == "Phòng đẹp"
    assert tok.calls[0]["pair"] == "Location . một căn phòng"
    # caption fallback
    ds2 = EFCapDataset([dict(REC, list_img=["missing.png"])], tok, {}, 2, 32)
    _ = ds2[0]
    assert tok.calls[-1]["pair"].endswith("hình ảnh bình thường")
