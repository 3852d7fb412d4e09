"""Torch-checkpoint import tests: a synthetic state dict with the reference's
exact key naming (incl. legacy `ent2img`/`comb_attention` variants,
inference.py:172-193) must map onto our FCMF params and run."""

import jax
import jax.numpy as jnp
import numpy as np

from macsa_tpu.config import FCMFConfig, ModelConfig, TextEncoderConfig
from macsa_tpu.models.fcmf import FCMF
from macsa_tpu.train.torch_import import (
    import_fcmf_classifier,
    normalize_reference_keys,
)

H, LAYERS, HEADS, INTER = 16, 1, 4, 32
VOCAB, MAXPOS = 50, 40
VD = 24  # visual feat dim
MODEL = ModelConfig(hidden_size=H, num_hidden_layers=LAYERS,
                    num_attention_heads=HEADS, intermediate_size=INTER,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
TEXT = TextEncoderConfig(vocab_size=VOCAB, hidden_size=H, num_hidden_layers=LAYERS,
                         num_attention_heads=HEADS, intermediate_size=INTER,
                         max_position_embeddings=MAXPOS, hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0)
CFG = FCMFConfig(model=MODEL, text=TEXT, num_imgs=2, num_roi=2, num_patches=4,
                 visual_feat_dim=VD, max_text_len=8, box_heads=8)


def synthetic_reference_state_dict(rng, legacy_names=False):
    """Random tensors under the reference FCMF's torch key names/shapes."""
    sd = {}

    def lin(prefix, out_dim, in_dim):
        sd[f"{prefix}.weight"] = rng.normal(size=(out_dim, in_dim)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(out_dim,)).astype(np.float32)

    def ln(prefix, dim=H):
        sd[f"{prefix}.weight"] = rng.normal(size=(dim,)).astype(np.float32) + 1
        sd[f"{prefix}.bias"] = rng.normal(size=(dim,)).astype(np.float32)

    def bert_block(prefix):
        for part in ("query", "key", "value"):
            lin(f"{prefix}.attention.self.{part}", H, H)
        lin(f"{prefix}.attention.output.dense", H, H)
        ln(f"{prefix}.attention.output.LayerNorm")
        lin(f"{prefix}.intermediate.dense", INTER, H)
        lin(f"{prefix}.output.dense", H, INTER)
        ln(f"{prefix}.output.LayerNorm")

    # HF roberta backbone (encoder.bert.cell.*)
    p = "encoder.bert.cell"
    sd[f"{p}.embeddings.word_embeddings.weight"] = rng.normal(
        size=(VOCAB, H)).astype(np.float32)
    sd[f"{p}.embeddings.position_embeddings.weight"] = rng.normal(
        size=(MAXPOS, H)).astype(np.float32)
    sd[f"{p}.embeddings.token_type_embeddings.weight"] = rng.normal(
        size=(1, H)).astype(np.float32)
    ln(f"{p}.embeddings.LayerNorm")
    bert_block(f"{p}.encoder.layer.0")
    lin(f"{p}.pooler.dense", H, H)

    t2i = "ent2img_attention" if legacy_names else "text2img_attention"
    mm = "comb_attention" if legacy_names else "mm_attention"
    t2ip = "ent2img_pooler" if legacy_names else "text2img_pooler"
    t2rp = "ent2roi_pooler" if legacy_names else "text2roi_pooler"

    lin("encoder.vismap2text", H, VD)
    lin("encoder.roimap2text", H, VD)
    for i in range(4):
        lin(f"encoder.box_head.linears.{i}", H, H)
    for h in range(8):
        lin(f"encoder.box_head.WGs.{h}", 1, 64)
    bert_block(f"encoder.{t2i}.layer.0")
    bert_block(f"encoder.{mm}.layer.0")
    lin(f"encoder.{t2ip}.dense", H, H)
    lin(f"encoder.{t2rp}.dense", H, H)
    # legacy checkpoints keep the head under encoder. (inference.py:181-183)
    head_prefix = "encoder." if legacy_names else ""
    lin(f"{head_prefix}text_pooler.dense", H, H)
    lin(f"{head_prefix}classifier", 4, H)
    return sd


def _run(params):
    model = FCMF(CFG)
    rng = np.random.default_rng(1)
    b, l = 2, CFG.max_text_len
    out = model.apply(
        {"params": params},
        jnp.asarray(rng.integers(2, VOCAB, size=(b, l)).astype(np.int32)),
        jnp.asarray(rng.normal(size=(b, 2, 4, VD)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, 2, 2, VD)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, size=(b, 2, 2, 4)).astype(np.float32)),
        None, jnp.ones((b, l), jnp.int32),
        jnp.ones((b, l + 4), jnp.int32))
    return np.asarray(out)


def test_import_modern_names(rng):
    sd = synthetic_reference_state_dict(rng)
    params = import_fcmf_classifier(sd, num_text_layers=LAYERS)
    logits = _run(params)
    assert logits.shape == (2, 4)
    assert np.isfinite(logits).all()
    # spot-check kernel transposition: vismap2text torch [H, VD] -> flax [VD, H]
    np.testing.assert_array_equal(params["encoder"]["vismap2text"]["kernel"],
                                  sd["encoder.vismap2text.weight"].T)
    # WG fusion: kernel column h == WGs.h weight row
    np.testing.assert_array_equal(
        params["encoder"]["box_head"]["wg"]["kernel"][:, 3],
        sd["encoder.box_head.WGs.3.weight"][0])


def test_import_legacy_names_match_modern(rng):
    """ent2img/comb_attention legacy checkpoints must produce identical params
    (and logits) to the modern naming."""
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    modern = synthetic_reference_state_dict(rng1, legacy_names=False)
    legacy = synthetic_reference_state_dict(rng2, legacy_names=True)
    p_mod = import_fcmf_classifier(modern, num_text_layers=LAYERS)
    p_leg = import_fcmf_classifier(legacy, num_text_layers=LAYERS)
    np.testing.assert_allclose(_run(p_mod), _run(p_leg), rtol=1e-5)


def torchvision_resnet152_schema():
    """The exact key -> shape schema of
    `torchvision.models.resnet152().state_dict()` (torchvision 0.16 layout),
    including BN `num_batches_tracked` bookkeeping entries and the `fc`
    classifier head the feature extractor ignores."""
    shapes = {}

    def bn(prefix, ch):
        shapes[f"{prefix}.weight"] = (ch,)
        shapes[f"{prefix}.bias"] = (ch,)
        shapes[f"{prefix}.running_mean"] = (ch,)
        shapes[f"{prefix}.running_var"] = (ch,)
        shapes[f"{prefix}.num_batches_tracked"] = ()

    shapes["conv1.weight"] = (64, 3, 7, 7)
    bn("bn1", 64)
    in_ch = 64
    for stage, (blocks, width) in enumerate(
            zip((3, 8, 36, 3), (64, 128, 256, 512))):
        for b in range(blocks):
            p = f"layer{stage + 1}.{b}"
            shapes[f"{p}.conv1.weight"] = (width, in_ch if b == 0
                                           else width * 4, 1, 1)
            bn(f"{p}.bn1", width)
            shapes[f"{p}.conv2.weight"] = (width, width, 3, 3)
            bn(f"{p}.bn2", width)
            shapes[f"{p}.conv3.weight"] = (width * 4, width, 1, 1)
            bn(f"{p}.bn3", width * 4)
            if b == 0:
                shapes[f"{p}.downsample.0.weight"] = (width * 4, in_ch, 1, 1)
                bn(f"{p}.downsample.1", width * 4)
        in_ch = width * 4
    shapes["fc.weight"] = (1000, 2048)
    shapes["fc.bias"] = (1000,)
    return shapes


def test_torchvision_resnet152_import_full_depth():
    """Full-structure torchvision resnet152 fixture (random values, exact
    key layout incl. downsample blocks and num_batches_tracked) imports at
    full 152-layer depth and matches VisualFeatures' param tree exactly."""
    from macsa_tpu.config import ResNetConfig
    from macsa_tpu.models.resnet import VisualFeatures, import_torchvision_resnet

    schema = torchvision_resnet152_schema()
    if True:  # verify the schema itself against torchvision when available
        try:
            import torchvision
            real = torchvision.models.resnet152().state_dict()
            assert {k: tuple(v.shape) for k, v in real.items()} == schema
        except ImportError:
            pass
    rng = np.random.default_rng(0)
    sd = {k: rng.normal(size=s).astype(np.float32) if s else np.int64(7)
          for k, s in schema.items()}
    params = import_torchvision_resnet(sd)

    model = VisualFeatures(ResNetConfig())
    want = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 1, 224, 224, 3), jnp.float32))["params"]
    got_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    want_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                  jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_paths == want_paths
    # downsample imported at every stage boundary
    for stage in (1, 2, 3, 4):
        blk = params["backbone"][f"layer{stage}_0"]
        assert "ds_conv" in blk and "ds_bn" in blk
    # value spot-checks: conv kernel transposition + BN stat mapping
    np.testing.assert_array_equal(
        params["backbone"]["layer3_17"]["conv2"]["kernel"],
        sd["layer3.17.conv2.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        params["backbone"]["layer4_0"]["ds_bn"]["var"],
        sd["layer4.0.downsample.1.running_var"])


def test_torchvision_import_rejects_layout_drift():
    """A renamed downsample key (layout drift) must raise, not silently
    drop the stage-boundary projection."""
    from macsa_tpu.models.resnet import import_torchvision_resnet

    schema = torchvision_resnet152_schema()
    rng = np.random.default_rng(1)
    sd = {k: rng.normal(size=s).astype(np.float32) if s else np.int64(1)
          for k, s in schema.items()}
    sd["layer2.0.shortcut.0.weight"] = sd.pop("layer2.0.downsample.0.weight")
    try:
        import_torchvision_resnet(sd)
        raise AssertionError("layout drift not detected")
    except ValueError as e:
        assert "unconsumed" in str(e)


def test_normalize_reference_keys():
    sd = {"module.ent2img_attention.x": np.zeros(1),
          "comb_attention.y": np.zeros(1),
          "encoder.text_pooler.dense.weight": np.zeros((2, 2)),
          "decoder.embedding.weight": np.zeros((4, 2))}
    out = normalize_reference_keys(sd)
    assert "encoder.text2img_attention.x" in out
    assert "encoder.mm_attention.y" in out
    assert "text_pooler.dense.weight" in out
    assert "decoder.embedding.weight" in out
