"""CATR captioner tests: shapes, causality, decode, torch parity, import.

Reference: EF-CapTrRoBERTa/Caption_Generation/generate_captions_vi.py (the
torch-hub CATR greedy captioner).  No egress for the real hub checkpoint, so
parity is established against an inline torch transcription of the
DETR/CATR layers (torch.nn.MultiheadAttention + pre-norm sublayer order).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from macsa_tpu.models.catr import (CATR, CATRConfig, greedy_decode,
                                   import_torch_catr,
                                   sine_position_embedding)

TINY = CATRConfig(hidden_dim=8, nheads=2, enc_layers=2, dec_layers=2,
                  dim_feedforward=16, vocab_size=32,
                  max_position_embeddings=8, mlp_hidden=12,
                  backbone_stages=(1, 1, 1, 1),
                  start_token=1, end_token=2)


def _tiny_inputs(b=2, hw=64, t=5, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(b, hw, hw, 3)).astype(np.float32)
    tokens = rng.integers(1, TINY.vocab_size, size=(b, t)).astype(np.int32)
    return images, tokens


def test_forward_shapes():
    model = CATR(TINY)
    images, tokens = _tiny_inputs()
    params = model.init(jax.random.PRNGKey(0), images, tokens)
    logits = model.apply(params, images, tokens)
    assert logits.shape == (2, 5, TINY.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_decoder_causality():
    """Logits at position i must not depend on tokens after i."""
    model = CATR(TINY)
    images, tokens = _tiny_inputs()
    params = model.init(jax.random.PRNGKey(0), images, tokens)
    out1 = np.asarray(model.apply(params, images, tokens))
    tokens2 = tokens.copy()
    tokens2[:, 3:] = (tokens2[:, 3:] + 7) % TINY.vocab_size
    out2 = np.asarray(model.apply(params, images, tokens2))
    np.testing.assert_allclose(out1[:, :3], out2[:, :3], atol=1e-5)
    assert not np.allclose(out1[:, 3:], out2[:, 3:])


def test_greedy_decode_static_shape_and_stop():
    model = CATR(TINY)
    images, tokens = _tiny_inputs()
    params = model.init(jax.random.PRNGKey(0), images, tokens)
    out = np.asarray(greedy_decode(model, params, images, max_len=8))
    assert out.shape == (2, 8)
    assert (out[:, 0] == TINY.start_token).all()
    # everything after the first end_token must be pad
    for row in out:
        row = row.tolist()
        if TINY.end_token in row:
            i = row.index(TINY.end_token)
            assert all(v == TINY.pad_token for v in row[i + 1:])


def test_sine_position_embedding_matches_detr_formula():
    """Golden re-derivation of DETR PositionEmbeddingSine (normalize=True)."""
    import math
    h, w, npos = 3, 4, 6
    got = np.asarray(sine_position_embedding(h, w, npos))
    eps, scale, temp = 1e-6, 2 * math.pi, 10000.0
    y_embed = np.tile(np.arange(1, h + 1, dtype=np.float32)[:, None], (1, w))
    x_embed = np.tile(np.arange(1, w + 1, dtype=np.float32)[None, :], (h, 1))
    y_embed = y_embed / (h + eps) * scale
    x_embed = x_embed / (w + eps) * scale
    dim_t = temp ** (2 * (np.arange(npos) // 2) / npos)
    px = x_embed[..., None] / dim_t
    py = y_embed[..., None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])],
                  axis=-1).reshape(h, w, npos)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])],
                  axis=-1).reshape(h, w, npos)
    want = np.concatenate([py, px], axis=-1).reshape(h * w, 2 * npos)
    np.testing.assert_allclose(got, want, atol=1e-5)


# --------------------------------------------------------------------------
# torch parity: inline transcription of the CATR transformer (DETR layers)
# --------------------------------------------------------------------------

def _torch_catr_transformer(cfg, sd_out):
    """Build torch CATR transformer + embeddings + mlp; record state dict
    into sd_out with hub naming."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(0)
    d, h, ffn = cfg.hidden_dim, cfg.nheads, cfg.dim_feedforward

    class EncLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn = tnn.MultiheadAttention(d, h, batch_first=True)
            self.linear1 = tnn.Linear(d, ffn)
            self.linear2 = tnn.Linear(ffn, d)
            self.norm1 = tnn.LayerNorm(d)
            self.norm2 = tnn.LayerNorm(d)

        def forward(self, src, pos):  # pre-norm (CATR normalize_before)
            s2 = self.norm1(src)
            q = k = s2 + pos
            src = src + self.self_attn(q, k, s2, need_weights=False)[0]
            s2 = self.norm2(src)
            return src + self.linear2(torch.relu(self.linear1(s2)))

    class DecLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn = tnn.MultiheadAttention(d, h, batch_first=True)
            self.multihead_attn = tnn.MultiheadAttention(d, h,
                                                         batch_first=True)
            self.linear1 = tnn.Linear(d, ffn)
            self.linear2 = tnn.Linear(ffn, d)
            self.norm1 = tnn.LayerNorm(d)
            self.norm2 = tnn.LayerNorm(d)
            self.norm3 = tnn.LayerNorm(d)

        def forward(self, tgt, memory, qpos, pos, tgt_mask):
            t2 = self.norm1(tgt)
            q = k = t2 + qpos
            tgt = tgt + self.self_attn(q, k, t2, attn_mask=tgt_mask,
                                       need_weights=False)[0]
            t2 = self.norm2(tgt)
            tgt = tgt + self.multihead_attn(t2 + qpos, memory + pos, memory,
                                            need_weights=False)[0]
            t2 = self.norm3(tgt)
            return tgt + self.linear2(torch.relu(self.linear1(t2)))

    class Transformer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encs = tnn.ModuleList([EncLayer()
                                        for _ in range(cfg.enc_layers)])
            self.decs = tnn.ModuleList([DecLayer()
                                        for _ in range(cfg.dec_layers)])
            self.enc_norm = tnn.LayerNorm(d)
            self.dec_norm = tnn.LayerNorm(d)
            self.word = tnn.Embedding(cfg.vocab_size, d)
            self.posemb = tnn.Embedding(cfg.max_position_embeddings, d)
            self.emb_ln = tnn.LayerNorm(d, eps=cfg.layer_norm_eps)
            self.mlp = tnn.ModuleList([
                tnn.Linear(d, cfg.mlp_hidden),
                tnn.Linear(cfg.mlp_hidden, cfg.mlp_hidden),
                tnn.Linear(cfg.mlp_hidden, cfg.vocab_size)])

        def forward(self, src, pos, tokens):
            x = src
            for e in self.encs:
                x = e(x, pos)
            memory = self.enc_norm(x)
            t = tokens.shape[1]
            qpos = self.posemb.weight[:t][None]
            tgt = self.emb_ln(self.word(tokens) + qpos)
            causal = torch.full((t, t), float("-inf"))
            causal = torch.triu(causal, diagonal=1)
            for dl in self.decs:
                tgt = dl(tgt, memory, qpos, pos, causal)
            out = self.dec_norm(tgt)
            out = torch.relu(self.mlp[0](out))
            out = torch.relu(self.mlp[1](out))
            return self.mlp[2](out)

    tr = Transformer().eval()
    # record the hub-style state dict
    for i, e in enumerate(tr.encs):
        for name, v in e.state_dict().items():
            sd_out[f"transformer.encoder.layers.{i}.{name}"] = v
    for i, dl in enumerate(tr.decs):
        for name, v in dl.state_dict().items():
            sd_out[f"transformer.decoder.layers.{i}.{name}"] = v
    sd_out["transformer.encoder.norm.weight"] = tr.enc_norm.weight
    sd_out["transformer.encoder.norm.bias"] = tr.enc_norm.bias
    sd_out["transformer.decoder.norm.weight"] = tr.dec_norm.weight
    sd_out["transformer.decoder.norm.bias"] = tr.dec_norm.bias
    sd_out["transformer.embeddings.word_embeddings.weight"] = tr.word.weight
    sd_out["transformer.embeddings.position_embeddings.weight"] = \
        tr.posemb.weight
    sd_out["transformer.embeddings.LayerNorm.weight"] = tr.emb_ln.weight
    sd_out["transformer.embeddings.LayerNorm.bias"] = tr.emb_ln.bias
    for i, m in enumerate(tr.mlp):
        sd_out[f"mlp.layers.{i}.weight"] = m.weight
        sd_out[f"mlp.layers.{i}.bias"] = m.bias
    return tr


def _tiny_torch_backbone_sd(sd_out, stages):
    """Random tiny torchvision-style resnet tensors under backbone.0.body."""
    import torch

    g = torch.Generator().manual_seed(1)

    def conv(name, cout, cin, k):
        sd_out[name + ".weight"] = torch.randn(cout, cin, k, k,
                                               generator=g) * 0.05

    def bn(name, c):
        sd_out[name + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd_out[name + ".bias"] = torch.randn(c, generator=g) * 0.1
        sd_out[name + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        sd_out[name + ".running_var"] = torch.rand(c, generator=g) + 0.5

    bb = "backbone.0.body"
    conv(f"{bb}.conv1", 64, 3, 7)
    bn(f"{bb}.bn1", 64)
    cin = 64
    for stage, nblocks in enumerate(stages):
        feats = 64 * (2 ** stage)
        for b in range(nblocks):
            p = f"{bb}.layer{stage + 1}.{b}"
            conv(f"{p}.conv1", feats, cin if b == 0 else feats * 4, 1)
            bn(f"{p}.bn1", feats)
            conv(f"{p}.conv2", feats, feats, 3)
            bn(f"{p}.bn2", feats)
            conv(f"{p}.conv3", feats * 4, feats, 1)
            bn(f"{p}.bn3", feats * 4)
            if b == 0:
                conv(f"{p}.downsample.0", feats * 4,
                     cin if b == 0 else feats * 4, 1)
                bn(f"{p}.downsample.1", feats * 4)
        cin = feats * 4


def test_torch_parity_transformer_and_import():
    """Import a torch CATR state dict; logits must match torch to ~1e-4.

    The torch side is an inline transcription of the DETR/CATR pre-norm
    layers using torch.nn.MultiheadAttention — this pins down the packed
    QKV projection mapping, the pos-embedding add points, the sublayer
    order, and the mask conventions.
    """
    torch = pytest.importorskip("torch")
    cfg = TINY
    sd = {}
    tr = _torch_catr_transformer(cfg, sd)
    _tiny_torch_backbone_sd(sd, cfg.backbone_stages)
    g = torch.Generator().manual_seed(2)
    sd["input_proj.weight"] = torch.randn(cfg.hidden_dim, 2048, 1, 1,
                                          generator=g) * 0.05
    sd["input_proj.bias"] = torch.randn(cfg.hidden_dim, generator=g) * 0.05

    icfg, params = import_torch_catr(sd, nheads=cfg.nheads)
    assert icfg.pre_norm and icfg.enc_layers == cfg.enc_layers
    assert icfg.backbone_stages == cfg.backbone_stages
    model = CATR(icfg)

    images, tokens = _tiny_inputs(b=2, hw=64, t=5)
    # JAX full forward
    logits_jax = np.asarray(model.apply(params, images, tokens))

    # torch path: backbone via the JAX resnet (identical weights; backbone
    # parity is covered by the resnet import tests) -> input_proj ->
    # transformer in torch
    from macsa_tpu.models.resnet import ResNet
    from macsa_tpu.config import ResNetConfig
    feat = ResNet(ResNetConfig(stage_sizes=cfg.backbone_stages,
                               dtype="float32")).apply(
        {"params": params["params"]["backbone"]}, images)
    b, h, w, _ = feat.shape
    feat_t = torch.from_numpy(np.asarray(feat, np.float32))
    proj_w = sd["input_proj.weight"][:, :, 0, 0]
    src = feat_t.reshape(b, h * w, -1) @ proj_w.T + sd["input_proj.bias"]
    pos = torch.from_numpy(
        np.asarray(sine_position_embedding(h, w, cfg.hidden_dim // 2)))
    with torch.no_grad():
        logits_t = tr(src.float(), pos[None].float(),
                      torch.from_numpy(tokens.astype(np.int64))).numpy()
    np.testing.assert_allclose(logits_jax, logits_t, atol=2e-4, rtol=2e-3)


def test_import_structure_matches_init():
    """Imported pytree must exactly match the model's init structure."""
    torch = pytest.importorskip("torch")
    cfg = TINY
    sd = {}
    _torch_catr_transformer(cfg, sd)
    _tiny_torch_backbone_sd(sd, cfg.backbone_stages)
    g = torch.Generator().manual_seed(3)
    sd["input_proj.weight"] = torch.randn(cfg.hidden_dim, 2048, 1, 1,
                                          generator=g)
    sd["input_proj.bias"] = torch.randn(cfg.hidden_dim, generator=g)
    icfg, params = import_torch_catr(sd, nheads=cfg.nheads)
    model = CATR(icfg)
    images, tokens = _tiny_inputs()
    init = model.init(jax.random.PRNGKey(0), images, tokens)
    from flax.core import unfreeze
    init_shapes = jax.tree.map(lambda x: tuple(x.shape), init)
    got_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), params)
    assert unfreeze(init_shapes) == unfreeze(got_shapes)
