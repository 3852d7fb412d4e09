"""Logit-level parity against the REFERENCE's own PyTorch modules.

The strongest fidelity evidence available without the ViMACSA dataset: the
reference's pure-torch model code (`/root/reference/fcmf_framework/
{mm_modeling,roi_modeling,fcmf_pretraining,fcmf_multimodal,optimization}.py`)
is imported directly, its HF `FeatureExtractor` backbone stubbed with a
fixed-weight tiny RobertaModel (768-hidden to satisfy the reference's
hardcoded HIDDEN_SIZE, 1 layer for speed), weights are transferred through
`macsa_tpu.train.torch_import`, and outputs must agree at logit level:

* BoxMultiHeadedAttention (roi_modeling.py:49-180),
* the full Phase-2 FCMF classifier (fcmf_multimodal.py:12-51, which runs
  FCMFEncoder fcmf_pretraining.py:14-141 end to end),
* the full Phase-1 FCMFSeq2Seq teacher-forcing forward
  (fcmf_pretraining.py:143-221 -> IAOGDecoder mm_modeling.py:634-666,
  including the 3-way weight tying and the rebuilt decoder cross mask),
* one BertAdam step (optimization.py).
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

ref_mm = pytest.importorskip("fcmf_framework.mm_modeling")
ref_roi = pytest.importorskip("fcmf_framework.roi_modeling")
ref_pre = pytest.importorskip("fcmf_framework.fcmf_pretraining")
ref_cls = pytest.importorskip("fcmf_framework.fcmf_multimodal")
ref_opt = pytest.importorskip("fcmf_framework.optimization")

HIDDEN = ref_mm.HIDDEN_SIZE  # 768, hardcoded throughout the reference
VOCAB = 100
TEXT_LAYERS = 1  # backbone depth is configurable on both sides; 1 for speed
B, L, I, R = 2, 32, 2, 2


def _hf_cfg():
    return transformers.RobertaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=TEXT_LAYERS,
        num_attention_heads=ref_mm.NUM_ATTENTION_HEADS,
        intermediate_size=ref_mm.INTERMEDIATE_SIZE,
        max_position_embeddings=80, type_vocab_size=1, pad_token_id=1,
    )


class StubFeatureExtractor(torch.nn.Module):
    """Drop-in for the reference's FeatureExtractor (mm_modeling.py:433-446):
    same `.cell` attribute (so state-dict keys match `encoder.bert.cell.*`),
    same (seq, pooled, attentions) return triple — but the AutoModel download
    is replaced with a randomly-initialized local RobertaModel."""

    def __init__(self, pretrained_path):
        super().__init__()
        torch.manual_seed(0)
        self.cell = transformers.RobertaModel(_hf_cfg())

    def forward(self, input_ids, token_type_ids, attention_mask):
        out = self.cell(input_ids=input_ids, token_type_ids=token_type_ids,
                        attention_mask=attention_mask, output_attentions=True)
        return out.last_hidden_state, out.pooler_output, out.attentions


@pytest.fixture
def stub_backbone(monkeypatch):
    monkeypatch.setattr(ref_pre, "FeatureExtractor", StubFeatureExtractor)


def _inputs(rng, b=B):
    ids = rng.integers(2, VOCAB, size=(b, L))
    attn = np.ones((b, L), np.int64)
    attn[0, -6:] = 0
    ids = np.where(attn, ids, 1)
    added = np.ones((b, L + 49), np.int64)
    added[-1, 3:7] = 0  # exercises both the patch mask and the t2r quirk slice
    vis = rng.normal(size=(b, I, 49, 2048)).astype(np.float32)
    roi = rng.normal(size=(b, I, R, 2048)).astype(np.float32)
    coors = rng.uniform(0, 1, size=(b, I, R, 4)).astype(np.float32)
    tt = np.zeros((b, L), np.int64)
    return ids, tt, attn, added, vis, roi, coors


def _our_cfg():
    from macsa_tpu.config import FCMFConfig, ModelConfig, TextEncoderConfig
    return FCMFConfig(
        model=ModelConfig(),  # the reference's module-level constants
        text=TextEncoderConfig.from_hf_config(_hf_cfg()),
        num_imgs=I, num_roi=R, max_text_len=L)


def test_box_attention_vs_reference_torch(rng):
    """BoxMultiHeadedAttention: geometric embedding + per-head WG gates +
    log-clamped score bias (roi_modeling.py:14-180)."""
    from macsa_tpu.models.box_attention import BoxMultiHeadedAttention
    from macsa_tpu.train.torch_import import _box_head

    d_model, h, n = 64, 8, 5
    torch.manual_seed(1)
    ref = ref_roi.BoxMultiHeadedAttention(h, d_model)
    ref.eval()

    q = rng.normal(size=(B, n, d_model)).astype(np.float32)
    boxes = rng.uniform(0, 1, size=(B, n, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref(*(torch.tensor(q),) * 3, torch.tensor(boxes)).numpy()

    ours = BoxMultiHeadedAttention(num_heads=h, d_model=d_model,
                                   dropout_rate=0.1)
    sd = {f"bh.{k}": v for k, v in ref.state_dict().items()}
    params = _box_head(sd, "bh", num_heads=h)
    got = ours.apply({"params": params}, *(jnp.asarray(q),) * 3,
                     jnp.asarray(boxes), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_fcmf_classifier_logits_vs_reference_torch(stub_backbone, rng):
    """Full Phase-2 forward: reference FCMF (fcmf_multimodal.py:39-51) vs
    macsa_tpu FCMF with weights transferred by import_fcmf_classifier —
    covers FCMFEncoder's image loop, ROI branch (incl. the text-position
    mask-slice quirk), shared mm_attention, pooler, and classifier."""
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.train.torch_import import import_fcmf_classifier

    torch.manual_seed(2)
    ref = ref_cls.FCMF("stubbed", num_labels=4, num_imgs=I, num_roi=R)
    ref.eval()

    ids, tt, attn, added, vis, roi, coors = _inputs(rng)
    with torch.no_grad():
        want = ref(torch.tensor(ids), torch.tensor(vis), torch.tensor(roi),
                   torch.tensor(coors), torch.tensor(tt), torch.tensor(attn),
                   torch.tensor(added)).numpy()

    params = import_fcmf_classifier(ref.state_dict(),
                                    num_text_layers=TEXT_LAYERS)
    model = FCMF(_our_cfg())
    got = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(vis),
                      jnp.asarray(roi), jnp.asarray(coors), jnp.asarray(tt),
                      jnp.asarray(attn), jnp.asarray(added))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=3e-4)


def test_fcmf_seq2seq_teacher_forcing_vs_reference_torch(stub_backbone, rng):
    """Full Phase-1 forward: reference FCMFSeq2Seq (is_train=True, eval-mode
    dropout) vs macsa_tpu FCMFSeq2Seq — covers the IAOGDecoder's 12 blocks
    (per-head w_kx/w_qx attention, causal dec_valid_lens masking, the 2-D
    cross-mask causal quirk mm_modeling.py:115-118), sqrt(H)-scaled tied
    embeddings + sinusoidal pos-enc, the rebuilt text+visual cross mask
    (fcmf_pretraining.py:184-195), and the tied output head.

    Batch size 1: the reference Attention's repeat/view pairing assigns head
    slot c the weight head (c*B + b) % n_head — a batch-size-DEPENDENT
    mapping (mm_modeling.py:79-85).  macsa_tpu implements the intended
    batch-invariant semantics (head c uses weight c; documented deviation,
    models/attention.py), which coincides with the reference exactly at
    B=1."""
    from macsa_tpu.config import DecoderConfig
    from macsa_tpu.models.seq2seq import FCMFSeq2Seq
    from macsa_tpu.train.torch_import import import_fcmf_seq2seq

    torch.manual_seed(3)
    ref = ref_pre.FCMFSeq2Seq(VOCAB, 8, "stubbed", num_imgs=I, num_roi=R,
                              alpha=0.7)
    ref.eval()

    b = 1
    ids, tt, attn, added, vis, roi, coors = _inputs(rng, b=b)
    t_dec = 6
    dec_ids = rng.integers(2, VOCAB, size=(b, t_dec))
    with torch.no_grad():
        want = ref(torch.tensor(ids), torch.tensor(dec_ids), torch.tensor(vis),
                   torch.tensor(roi), torch.tensor(coors), torch.tensor(tt),
                   torch.tensor(attn), torch.tensor(added),
                   is_train=True).numpy()

    params = import_fcmf_seq2seq(ref.state_dict(),
                                 num_text_layers=TEXT_LAYERS,
                                 num_blocks=ref_mm.NUM_HIDDEN_LAYERS)
    cfg = _our_cfg()
    dec_cfg = DecoderConfig(vocab_size=VOCAB, max_decode_len=8)
    model = FCMFSeq2Seq(cfg, dec_cfg)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(dec_ids), jnp.asarray(vis), jnp.asarray(roi),
                      jnp.asarray(coors), jnp.asarray(tt), jnp.asarray(attn),
                      jnp.asarray(added))
    assert got.shape == want.shape == (b, t_dec, VOCAB)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=3e-4)


def test_per_head_attention_emulated_mapping_vs_reference_torch(rng):
    """B>1 head-mapping pin: the reference Attention pairs head slot c of
    batch element b with weight head (c*B + b) % n_head (mm_modeling.py:79-85).
    `emulate_reference_heads` must reproduce its outputs exactly at B=3 —
    and the default batch-invariant mapping must NOT (the quirk is real)."""
    from macsa_tpu.models.attention import PerHeadAttention

    e, d, nh, b, lk, lq = 32, 8, 4, 3, 7, 5
    torch.manual_seed(5)
    ref = ref_mm.Attention(e, hidden_dim=d, n_head=nh)
    ref.eval()
    k = rng.normal(size=(b, lk, e)).astype(np.float32)
    q = rng.normal(size=(b, lq, e)).astype(np.float32)
    mem = [7, 4, 6]
    with torch.no_grad():
        want, _ = ref(torch.tensor(k), torch.tensor(q), memory_len=mem)
    want = want.numpy()

    params = {
        "w_kx": ref.w_kx.detach().numpy(),
        "w_qx": ref.w_qx.detach().numpy(),
        "proj": {"kernel": ref.proj.weight.detach().numpy().T,
                 "bias": ref.proj.bias.detach().numpy()},
    }
    emul = PerHeadAttention(e, d, nh, emulate_reference_heads=True)
    got = emul.apply({"params": params}, jnp.asarray(k), jnp.asarray(q),
                     lengths=jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    std = PerHeadAttention(e, d, nh)
    got_std = std.apply({"params": params}, jnp.asarray(k), jnp.asarray(q),
                        lengths=jnp.asarray(mem))
    assert np.abs(np.asarray(got_std) - want).max() > 1e-3


def test_fcmf_seq2seq_teacher_forcing_b2_emulated_heads(stub_backbone, rng):
    """Full Phase-1 forward at B=2: with `emulate_reference_heads` the
    decoder reproduces the reference's batch-size-dependent head pairing, so
    logits agree with torch at batch size >1 — converting the documented B=1
    deviation (models/attention.py) into a tested equivalence."""
    from macsa_tpu.config import DecoderConfig
    from macsa_tpu.models.seq2seq import FCMFSeq2Seq
    from macsa_tpu.train.torch_import import import_fcmf_seq2seq

    torch.manual_seed(4)
    ref = ref_pre.FCMFSeq2Seq(VOCAB, 8, "stubbed", num_imgs=I, num_roi=R,
                              alpha=0.7)
    ref.eval()

    b = 2
    ids, tt, attn, added, vis, roi, coors = _inputs(rng, b=b)
    t_dec = 6
    dec_ids = rng.integers(2, VOCAB, size=(b, t_dec))
    with torch.no_grad():
        want = ref(torch.tensor(ids), torch.tensor(dec_ids), torch.tensor(vis),
                   torch.tensor(roi), torch.tensor(coors), torch.tensor(tt),
                   torch.tensor(attn), torch.tensor(added),
                   is_train=True).numpy()

    params = import_fcmf_seq2seq(ref.state_dict(),
                                 num_text_layers=TEXT_LAYERS,
                                 num_blocks=ref_mm.NUM_HIDDEN_LAYERS)
    dec_cfg = DecoderConfig(vocab_size=VOCAB, max_decode_len=8,
                            emulate_reference_heads=True)
    model = FCMFSeq2Seq(_our_cfg(), dec_cfg)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(dec_ids), jnp.asarray(vis), jnp.asarray(roi),
                      jnp.asarray(coors), jnp.asarray(tt), jnp.asarray(attn),
                      jnp.asarray(added))
    assert got.shape == want.shape == (b, t_dec, VOCAB)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=3e-4)


def test_bert_adam_step_vs_reference_torch(rng):
    """3 BertAdam steps on identical params/grads: EMA moments, no bias
    correction, decoupled weight decay, inline warmup_linear schedule
    (optimization.py:130-160).  Clipping disabled on both sides — the
    reference clips PER PARAMETER, ours globally (the live reference drivers
    also clip globally, run_multimodal_fcmf.py:484-485)."""
    from macsa_tpu.train.optim import bert_adam

    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    p1 = rng.normal(size=(5,)).astype(np.float32)
    grads = [(rng.normal(size=(4, 3)).astype(np.float32) * 0.1,
              rng.normal(size=(5,)).astype(np.float32) * 0.1)
             for _ in range(3)]

    tp = [torch.nn.Parameter(torch.tensor(p0)),
          torch.nn.Parameter(torch.tensor(p1))]
    opt = ref_opt.BertAdam(tp, lr=1e-3, warmup=0.5, t_total=4,
                           schedule="warmup_linear", weight_decay=0.01,
                           max_grad_norm=-1)
    for g0, g1 in grads:
        tp[0].grad = torch.tensor(g0)
        tp[1].grad = torch.tensor(g1)
        opt.step()

    tx = bert_adam(lr=1e-3, warmup=0.5, t_total=4, schedule="warmup_linear",
                   weight_decay=0.01, max_grad_norm=-1)
    params = {"a": jnp.asarray(p0), "b": jnp.asarray(p1)}
    state = tx.init(params)
    import optax
    for g0, g1 in grads:
        updates, state = tx.update({"a": jnp.asarray(g0), "b": jnp.asarray(g1)},
                                   state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["a"]),
                               tp[0].detach().numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["b"]),
                               tp[1].detach().numpy(), rtol=1e-6, atol=1e-7)
