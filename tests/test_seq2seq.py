"""FCMFSeq2Seq tests: teacher-forcing loss semantics, weight tying through
the shared table, greedy decode, and beam search (beam=1 == greedy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macsa_tpu.config import (DecoderConfig, FCMFConfig, ModelConfig,
                              TextEncoderConfig)
from macsa_tpu.models.seq2seq import FCMFSeq2Seq, seq2seq_loss

VOCAB = 64
MODEL = ModelConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                    intermediate_size=32, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)
TEXT = TextEncoderConfig(vocab_size=VOCAB, hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=4, intermediate_size=32,
                         max_position_embeddings=64, hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0)
CFG = FCMFConfig(model=MODEL, text=TEXT, num_imgs=2, num_roi=2, num_patches=4,
                 visual_feat_dim=16, max_text_len=10, box_heads=4)
DEC = DecoderConfig(vocab_size=VOCAB, hidden_size=32, num_blocks=1, num_heads=4,
                    ffn_hidden=32, max_decode_len=5, dropout=0.0)
B, L, T = 2, 10, 5
BOS, EOS = 0, 2


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    model = FCMFSeq2Seq(CFG, DEC)
    enc_ids = jnp.asarray(rng.integers(3, VOCAB, size=(B, L)).astype(np.int32))
    dec_ids = jnp.asarray(rng.integers(3, VOCAB, size=(B, T)).astype(np.int32))
    vis = jnp.asarray(rng.normal(size=(B, 2, 4, 16)).astype(np.float32))
    roi = jnp.asarray(rng.normal(size=(B, 2, 2, 16)).astype(np.float32))
    coors = jnp.asarray(rng.uniform(0, 1, size=(B, 2, 2, 4)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    added = jnp.ones((B, L + 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), enc_ids, dec_ids, vis, roi,
                        coors, None, mask, added)
    return model, params, enc_ids, dec_ids, vis, roi, coors, mask, added


def test_teacher_forcing_and_loss(setup):
    model, params, enc_ids, dec_ids, vis, roi, coors, mask, added = setup
    logits = model.apply(params, enc_ids, dec_ids, vis, roi, coors, None,
                         mask, added)
    assert logits.shape == (B, T, VOCAB)
    labels = np.roll(np.asarray(dec_ids), -1, axis=1)
    labels[:, -1] = -100
    loss = seq2seq_loss(logits, jnp.asarray(labels))
    assert np.isfinite(float(loss))
    # fully-ignored labels -> zero loss
    assert float(seq2seq_loss(logits, jnp.full_like(dec_ids, -100))) == 0.0


def test_shared_embedding_drives_logits(setup):
    model, params, enc_ids, dec_ids, vis, roi, coors, mask, added = setup
    import flax
    p2 = flax.core.unfreeze(params)
    p2["params"]["shared_embedding"] = p2["params"]["shared_embedding"] * 2.0
    l1 = model.apply(params, enc_ids, dec_ids, vis, roi, coors, None, mask, added)
    l2 = model.apply(p2, enc_ids, dec_ids, vis, roi, coors, None, mask, added)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    # the bert subtree must not define its own word embeddings (tied externally)
    assert "word_embeddings" not in params["params"]["encoder"]["bert"]["embeddings"]


def test_greedy_decode(setup):
    model, params, enc_ids, dec_ids, vis, roi, coors, mask, added = setup
    tokens = model.apply(params, enc_ids, vis, roi, coors, BOS, EOS,
                         None, mask, added, method=FCMFSeq2Seq.greedy_decode)
    assert tokens.shape == (B, DEC.max_decode_len)
    assert tokens.dtype == jnp.int32


def test_beam1_matches_greedy(setup):
    model, params, enc_ids, dec_ids, vis, roi, coors, mask, added = setup
    greedy = np.asarray(model.apply(params, enc_ids, vis, roi, coors, BOS, EOS,
                                    None, mask, added,
                                    method=FCMFSeq2Seq.greedy_decode))
    seqs, scores = model.apply(params, enc_ids, vis, roi, coors, BOS, EOS, 1,
                               None, mask, added,
                               method=FCMFSeq2Seq.beam_decode)
    seqs = np.asarray(seqs)
    # identical until (and including) the first EOS of each row
    for b in range(B):
        g = greedy[b]
        s = seqs[b]
        end = np.where(g == EOS)[0]
        end = int(end[0]) + 1 if len(end) else len(g)
        np.testing.assert_array_equal(s[:end], g[:end])


def test_beam_scores_are_ordered_vs_greedy(setup):
    """Beam-3's best score must be >= beam-1's score (wider search)."""
    model, params, enc_ids, dec_ids, vis, roi, coors, mask, added = setup
    _, s1 = model.apply(params, enc_ids, vis, roi, coors, BOS, EOS, 1,
                        None, mask, added, method=FCMFSeq2Seq.beam_decode)
    _, s3 = model.apply(params, enc_ids, vis, roi, coors, BOS, EOS, 3,
                        None, mask, added, method=FCMFSeq2Seq.beam_decode)
    assert np.all(np.asarray(s3) >= np.asarray(s1) - 1e-4)


def test_scanned_forward_variant_decodes_identically():
    """The generation eval runs decode through scanned_forward_variant with
    stack_text_params applied in-program (train/generation.py); outputs
    must be identical to the unrolled model's decode."""
    import dataclasses

    from macsa_tpu.train.steps import (scanned_forward_variant,
                                       stack_text_params)

    rng = np.random.default_rng(1)
    text2 = dataclasses.replace(TEXT, num_hidden_layers=2)
    cfg2 = dataclasses.replace(CFG, text=text2)
    model = FCMFSeq2Seq(cfg2, DEC)
    enc_ids = jnp.asarray(rng.integers(3, VOCAB, size=(B, L)).astype(np.int32))
    vis = jnp.asarray(rng.normal(size=(B, 2, 4, 16)).astype(np.float32))
    roi = jnp.asarray(rng.normal(size=(B, 2, 2, 16)).astype(np.float32))
    coors = jnp.asarray(rng.uniform(0, 1, size=(B, 2, 2, 4)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    added = jnp.ones((B, L + 4), jnp.int32)
    dec_ids = jnp.asarray(rng.integers(3, VOCAB, size=(B, T)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(1), enc_ids, dec_ids, vis, roi,
                        coors, None, mask, added)["params"]

    sm = scanned_forward_variant(model)
    assert sm.config.text.scan_layers

    @jax.jit
    def scanned_greedy(p):
        p = stack_text_params(p, 2)
        return sm.apply({"params": p}, enc_ids, vis, roi, coors, BOS, EOS,
                        None, mask, added, T,
                        method=FCMFSeq2Seq.greedy_decode)

    want = model.apply({"params": params}, enc_ids, vis, roi, coors, BOS,
                       EOS, None, mask, added, T,
                       method=FCMFSeq2Seq.greedy_decode)
    np.testing.assert_array_equal(np.asarray(scanned_greedy(params)),
                                  np.asarray(want))

    @jax.jit
    def scanned_beam(p):
        p = stack_text_params(p, 2)
        seqs, scores = sm.apply({"params": p}, enc_ids, vis, roi, coors,
                                BOS, EOS, 3, None, mask, added, T,
                                method=FCMFSeq2Seq.beam_decode)
        return seqs, scores

    want_seqs, want_scores = model.apply(
        {"params": params}, enc_ids, vis, roi, coors, BOS, EOS, 3, None,
        mask, added, T, method=FCMFSeq2Seq.beam_decode)
    got_seqs, got_scores = scanned_beam(params)
    np.testing.assert_array_equal(np.asarray(got_seqs), np.asarray(want_seqs))
    np.testing.assert_allclose(np.asarray(got_scores),
                               np.asarray(want_scores), rtol=2e-5, atol=2e-5)

def test_scanned_decoder_blocks_decode_identically():
    """scan_blocks decoder (stacked params + stacked KV cache) produces the
    same greedy and beam decodes as the unrolled layout — the beam cache
    reorder must index batch on axis 1 of the stacked cache."""
    import dataclasses

    from macsa_tpu.models.decoder import stack_block_params

    rng = np.random.default_rng(7)
    dec_u = dataclasses.replace(DEC, num_blocks=2)
    dec_s = dataclasses.replace(dec_u, scan_blocks=True)
    m_u = FCMFSeq2Seq(CFG, dec_u)
    m_s = FCMFSeq2Seq(CFG, dec_s)
    enc_ids = jnp.asarray(rng.integers(3, VOCAB, size=(B, L)).astype(np.int32))
    dec_ids = jnp.asarray(rng.integers(3, VOCAB, size=(B, T)).astype(np.int32))
    vis = jnp.asarray(rng.normal(size=(B, 2, 4, 16)).astype(np.float32))
    roi = jnp.asarray(rng.normal(size=(B, 2, 2, 16)).astype(np.float32))
    coors = jnp.asarray(rng.uniform(0, 1, size=(B, 2, 2, 4)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    added = jnp.ones((B, L + 4), jnp.int32)
    p_u = m_u.init(jax.random.PRNGKey(0), enc_ids, dec_ids, vis, roi, coors,
                   None, mask, added)["params"]
    p_s = dict(p_u)
    p_s["decoder"] = stack_block_params(p_u["decoder"], 2)

    tf_u = m_u.apply({"params": p_u}, enc_ids, dec_ids, vis, roi, coors,
                     None, mask, added)
    tf_s = m_s.apply({"params": p_s}, enc_ids, dec_ids, vis, roi, coors,
                     None, mask, added)
    np.testing.assert_allclose(np.asarray(tf_s), np.asarray(tf_u),
                               rtol=1e-5, atol=1e-5)

    kw = dict(token_type_ids=None, attention_mask=mask,
              added_attention_mask=added)
    g_u = m_u.apply({"params": p_u}, enc_ids, vis, roi, coors, BOS, EOS,
                    method=FCMFSeq2Seq.greedy_decode, **kw)
    g_s = m_s.apply({"params": p_s}, enc_ids, vis, roi, coors, BOS, EOS,
                    method=FCMFSeq2Seq.greedy_decode, **kw)
    np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_u))

    b_u, s_u = m_u.apply({"params": p_u}, enc_ids, vis, roi, coors, BOS, EOS,
                         3, method=FCMFSeq2Seq.beam_decode, **kw)
    b_s, s_s = m_s.apply({"params": p_s}, enc_ids, vis, roi, coors, BOS, EOS,
                         3, method=FCMFSeq2Seq.beam_decode, **kw)
    np.testing.assert_array_equal(np.asarray(b_s), np.asarray(b_u))
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_u),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("chunk", [16, 24])  # 24 exercises the vocab pad path
def test_chunked_vocab_loss_matches_full(setup, chunk):
    """chunked_seq2seq_loss (online-logsumexp scan over vocab chunks, no
    [B, T, V] logits) is gradient-exact against the full-logits path: same
    loss, same grads for every param, same argmax predictions."""
    from macsa_tpu.models.seq2seq import chunked_seq2seq_loss

    model, params, enc_ids, dec_ids, vis, roi, coors, mask, added = setup
    labels = np.roll(np.asarray(dec_ids), -1, axis=1)
    labels[:, -1] = -100
    labels[0, 2] = -100  # an interior ignored token too
    labels = jnp.asarray(labels)

    def full_loss(p):
        logits = model.apply({"params": p}, enc_ids, dec_ids, vis, roi,
                             coors, None, mask, added)
        return seq2seq_loss(logits, labels)

    def chunked(p):
        hidden = model.apply({"params": p}, enc_ids, dec_ids, vis, roi,
                             coors, None, mask, added, return_hidden=True)
        return chunked_seq2seq_loss(hidden, p["shared_embedding"],
                                    p["decoder"]["out_bias"], labels,
                                    chunk_size=chunk)

    p = params["params"]
    l_full, g_full = jax.value_and_grad(full_loss)(p)
    (l_chunk, pred), g_chunk = jax.value_and_grad(
        chunked, has_aux=True)(p)
    np.testing.assert_allclose(float(l_chunk), float(l_full),
                               rtol=1e-6, atol=1e-6)
    logits = model.apply({"params": p}, enc_ids, dec_ids, vis, roi, coors,
                         None, mask, added)
    np.testing.assert_array_equal(np.asarray(pred),
                                  np.asarray(logits.argmax(-1)))
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_full)
    flat_c = jax.tree_util.tree_leaves(g_chunk)
    assert len(flat_f) == len(flat_c)
    for (path, a), b in zip(flat_f, flat_c):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
