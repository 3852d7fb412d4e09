"""Text encoder parity: our Flax RoBERTa vs HuggingFace's torch RobertaModel
on a tiny randomly-initialized config — validates both the architecture and
the weight-import mapping (the reference consumes an HF AutoModel,
mm_modeling.py:433-446)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macsa_tpu.config import TextEncoderConfig
from macsa_tpu.models.text_encoder import (
    TextEncoder,
    create_position_ids,
    import_hf_text_encoder,
    stack_layer_params,
    unstack_layer_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_hf_roberta():
    cfg = transformers.RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.RobertaModel(cfg)
    model.eval()
    return cfg, model


def test_position_ids_roberta_semantics():
    ids = jnp.asarray([[5, 7, 9, 1, 1], [5, 1, 1, 1, 1]])
    pos = np.asarray(create_position_ids(ids, padding_idx=1))
    np.testing.assert_array_equal(pos, [[2, 3, 4, 1, 1], [2, 1, 1, 1, 1]])


def test_parity_with_hf_roberta(tiny_hf_roberta, rng):
    hf_cfg, hf_model = tiny_hf_roberta
    cfg = TextEncoderConfig.from_hf_config(hf_cfg)
    params = import_hf_text_encoder(hf_model.state_dict(), cfg.num_hidden_layers)

    b, l = 2, 12
    ids = rng.integers(2, hf_cfg.vocab_size, size=(b, l))
    mask = np.ones((b, l), np.int64)
    mask[0, 8:] = 0
    ids = np.where(mask, ids, hf_cfg.pad_token_id)

    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask))
    want_seq = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()

    model = TextEncoder(cfg)
    got_seq, got_pooled = model.apply(
        {"params": params}, jnp.asarray(ids), None, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_seq), want_seq, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled,
                               rtol=1e-3, atol=2e-4)


def test_scanned_layers_match_unrolled(rng):
    """scan_layers (lax.scan over one layer body, stacked params) is the
    same math as the unrolled layer_{i} stack — fwd, pooled, and grads."""
    import dataclasses

    cfg_u = TextEncoderConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, scan_layers=False)
    cfg_s = dataclasses.replace(cfg_u, scan_layers=True)
    ids = jnp.asarray(rng.integers(2, 96, size=(2, 10)))
    mask = jnp.asarray(np.array([[1] * 10, [1] * 6 + [0] * 4]))

    m_u, m_s = TextEncoder(cfg_u), TextEncoder(cfg_s)
    p_u = m_u.init(jax.random.PRNGKey(0), ids, attention_mask=mask)["params"]
    p_s = stack_layer_params(p_u, cfg_u.num_hidden_layers)
    assert p_s["layers"]["layer"]["mlp"]["output_dense"]["kernel"].shape == \
        (3, 64, 32)

    seq_u, pool_u = m_u.apply({"params": p_u}, ids, attention_mask=mask)
    seq_s, pool_s = m_s.apply({"params": p_s}, ids, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(seq_s), np.asarray(seq_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool_s), np.asarray(pool_u),
                               rtol=1e-5, atol=1e-5)

    # roundtrip layout conversion is exact
    p_rt = unstack_layer_params(p_s)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p_u, p_rt)

    # grads agree (stacked vs per-layer)
    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, ids, attention_mask=mask)[0]
                       ** 2)
    g_u = stack_layer_params(jax.grad(lambda p: loss(m_u, p))(p_u), 3)
    g_s = jax.grad(lambda p: loss(m_s, p))(p_s)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        g_u["layers"], jax.tree_util.tree_map(np.asarray, g_s["layers"]))

    # dropout path traces and runs under scan (split rngs per layer)
    out, _ = m_s.apply({"params": p_s}, ids, attention_mask=mask,
                       deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(3)})
    assert out.shape == seq_s.shape


def test_shared_embedding_table_overrides_internal(tiny_hf_roberta, rng):
    hf_cfg, hf_model = tiny_hf_roberta
    cfg = TextEncoderConfig.from_hf_config(hf_cfg)
    params = import_hf_text_encoder(hf_model.state_dict(), cfg.num_hidden_layers)
    ids = jnp.asarray(rng.integers(2, hf_cfg.vocab_size, size=(1, 6)))
    model = TextEncoder(cfg)
    table = jnp.asarray(params["embeddings"]["word_embeddings"]["embedding"])
    seq_a, _ = model.apply({"params": params}, ids)
    # dropping the internal table and passing it externally must be identical
    ext_params = {k: v for k, v in params.items()}
    ext_params["embeddings"] = {k: v for k, v in params["embeddings"].items()
                                if k != "word_embeddings"}
    seq_b, _ = model.apply({"params": ext_params}, ids, embedding_table=table)
    np.testing.assert_allclose(np.asarray(seq_a), np.asarray(seq_b), rtol=1e-6)
