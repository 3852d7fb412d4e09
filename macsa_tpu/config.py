"""Central configuration dataclasses.

The reference keeps its architecture hyper-parameters as module-level globals
(reference: fcmf_framework/mm_modeling.py:21-30) and its run configuration as
per-driver argparse flags (reference: run_multimodal_fcmf.py:65-118,
run_pretraining_fcmf.py:45-84).  Here every entry point consumes typed,
hashable dataclasses so they can be closed over by jitted functions.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

# Task constants (reference: vimacsa_dataset.py:16-23, run_multimodal_fcmf.py:89-90)
ASPECTS = ("Location", "Food", "Room", "Facilities", "Service", "Public_area")
POLARITIES = ("None", "Negative", "Neutral", "Positive")
NUM_ASPECTS = len(ASPECTS)
NUM_POLARITIES = len(POLARITIES)


def _dtype_field(default: str = "float32"):
    return dataclasses.field(default=default)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Fusion-model architecture constants.

    Mirrors the module-level globals of the reference
    (fcmf_framework/mm_modeling.py:21-30).
    """

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    # compute dtype for activations; params are always float32
    dtype: str = _dtype_field()
    # fuse softmax+dropout+PV into one Pallas kernel where applicable
    # (ops/fused_attention.py); off by default — enabled by drivers on TPU
    fused_attention: bool = False
    # run the Pallas kernel in interpret mode (CPU debugging/testing only).
    # Resolved by the drivers from the platform the computation executes on
    # (train.common.resolve_fused_attention) — NOT inferred at trace time,
    # where the target platform is unknowable.
    fused_attention_interpret: bool = False
    # jax.checkpoint ONLY the FFN sub-module (checkpoint_dots): saves the
    # pre-gelu FFN1 output, recomputes gelu in backward — halves the
    # double-[.., L, 3072] saved-activation writes the r04 trace attributed
    # 22% of the fusion program to, WITHOUT touching the attention (whose
    # Pallas custom-VJP whole-block remat would force to recompute — the
    # r04 remat_blocks −19%).  Off by default; measurement in
    # docs/DESIGN.md ("Selective FFN remat", r05).
    remat_ffn: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    """XLM-R / ViSoBERT-compatible RoBERTa encoder configuration.

    Matches the HF config fields the reference relies on through
    `AutoModel.from_pretrained` (fcmf_framework/mm_modeling.py:433-446).
    """

    vocab_size: int = 15004  # uitnlp/visobert vocab
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    dtype: str = _dtype_field()
    fused_attention: bool = False
    fused_attention_interpret: bool = False
    # lax.scan over the (identical) encoder layers instead of unrolling
    # them.  Same math; the compiled program contains ONE layer body, which
    # cuts the full train-step executable 73 -> 26 MB and XLA compile
    # 65 -> 35 s — executable upload through the TPU tunnel was the dominant
    # cold first-step cost (BENCH_r02: 29 min, root-caused to upload not
    # compile).  Measured trade-off (v5e, batch 8): the scanned TRAIN step
    # pays ~13 ms/step (104.5 -> 115.6 ms) of dynamic-update-slice traffic —
    # residual stacking + per-layer grad accumulation into the stacked
    # buffers (profiled in docs/DESIGN.md) — so training keeps the unrolled
    # layout by default; forward-only programs (inference, beam-decode eval)
    # have neither cost and default to scan at their call sites, consuming
    # the same checkpoints via `stack_layer_params`.
    # Param layout when scanned: layers/layer/... stacked on a leading [L].
    scan_layers: bool = False
    # lax.scan unroll factor: >1 repeats the body per iteration.  Measured
    # strictly worse on the train step (144.5 ms/step at unroll=3 vs 115.6
    # at 1) — kept for experimentation.
    scan_unroll: int = 1
    # jax.checkpoint each encoder block with checkpoint_dots: saves matmul
    # outputs, recomputes elementwise (gelu/LN/dropout-apply) in backward —
    # trades the saved-activation HBM writes the r04 fusion-step trace
    # attributed (the double [B*A,170,3072] FFN tensors) for VPU recompute.
    # Measured on the v5e fusion step (docs/DESIGN.md); off by default.
    remat_blocks: bool = False
    # FFN-only remat (see ModelConfig.remat_ffn)
    remat_ffn: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf_config(cls, hf_config: Any, dtype: str = "float32") -> "TextEncoderConfig":
        """Build from a `transformers` PretrainedConfig (or dict)."""
        get = (lambda k, d=None: hf_config.get(k, d)) if isinstance(hf_config, dict) else (
            lambda k, d=None: getattr(hf_config, k, d))
        return cls(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            num_hidden_layers=get("num_hidden_layers"),
            num_attention_heads=get("num_attention_heads"),
            intermediate_size=get("intermediate_size"),
            max_position_embeddings=get("max_position_embeddings"),
            type_vocab_size=get("type_vocab_size", 1),
            pad_token_id=get("pad_token_id", 1),
            layer_norm_eps=get("layer_norm_eps", 1e-5),
            hidden_dropout_prob=get("hidden_dropout_prob", 0.1),
            attention_probs_dropout_prob=get("attention_probs_dropout_prob", 0.1),
            dtype=dtype,
        )


@dataclasses.dataclass(frozen=True)
class FCMFConfig:
    """FCMF encoder / classifier configuration.

    Mirrors the constructor surface of the reference
    (fcmf_framework/fcmf_pretraining.py:14-19, fcmf_framework/fcmf_multimodal.py:12-18).
    """

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    text: TextEncoderConfig = dataclasses.field(default_factory=TextEncoderConfig)
    num_imgs: int = 7
    num_roi: int = 4
    alpha: float = 0.7
    num_labels: int = NUM_POLARITIES
    num_patches: int = 49  # 7x7 ResNet grid (fcmf_framework/resnet_utils.py:24)
    visual_feat_dim: int = 2048  # ResNet-152 channel dim
    max_text_len: int = 170  # vimacsa_dataset.py:101
    box_heads: int = 8  # roi_modeling.py BoxMultiHeadedAttention(8, 768)
    # Reproduce the reference decoder's cross-attention mask semantics: a 2-D
    # mask passed as `memory_len` triggers a *causal tril* over (dec_len,
    # enc_len) regardless of its values (mm_modeling.py:115-118,607-610).
    # "causal_quirk" = faithful; "padding" = use the mask as a padding mask.
    decoder_cross_mask_mode: str = "causal_quirk"
    # fuse the geometric ROI attention into a Pallas kernel
    # (macsa_tpu.ops.box_attention_kernel); eval/no-dropout paths only
    use_pallas_box_attention: bool = False
    # enable the Multimodal Denoising Encoder on the image-patch branch when
    # alpha < 1 (the reference's alternative encoder,
    # fcmf_pretraining.py:243-290; disabled in the active one, :34-35)
    use_mde: bool = False

    @property
    def num_visual_tokens(self) -> int:
        return 2 * self.num_imgs

    @property
    def fused_len(self) -> int:
        return 1 + 2 * self.num_imgs  # [CLS] + img vecs + roi vecs


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """IAOG transformer decoder configuration (mm_modeling.py:634-666)."""

    vocab_size: int = 15004
    hidden_size: int = 768
    num_blocks: int = 12
    num_heads: int = 12
    ffn_hidden: int = 768  # PositionWiseFFN(HIDDEN_SIZE, HIDDEN_SIZE) — mm_modeling.py:583
    dropout: float = 0.1
    max_position_embeddings: int = 512
    max_decode_len: int = 20  # --max_len_decoder default (run_pretraining_fcmf.py:61)
    dtype: str = _dtype_field()
    # Run the 12 identical blocks as one lax.scan body with params stacked
    # on a leading [num_blocks] axis (path blocks/block/...).  Unlike the
    # L=170 text encoder (where scan loses ~13 ms/step to residual stacking,
    # see TextEncoderConfig.scan_layers), the decoder works at T=20 with
    # ffn_hidden=768: per-block residuals are ~2 MB and the unrolled stack
    # is sequencer-dispatch-bound — the r04 pretrain trace measured ~20k op
    # executions/step (sliced param prefetches + tiny matmuls), 29.6 ms
    # device-busy inside a 69.9 ms wall step.  Scanning collapses the op
    # count ~12x.  Measured trade-off recorded in docs/DESIGN.md.
    # `stack_block_params`/`unstack_block_params` convert checkpoints
    # between the two layouts.
    scan_blocks: bool = False
    scan_unroll: int = 1
    # emulate the reference Attention's batch-size-dependent head<->weight
    # pairing (models/attention.py) — parity testing only
    emulate_reference_heads: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    """ResNet-152 (torchvision-compatible) feature extractor config."""

    stage_sizes: tuple = (3, 8, 36, 3)  # ResNet-152
    num_filters: int = 64
    grid_size: int = 7  # att_size for grid features (resnet_utils.py:13)
    dtype: str = _dtype_field("bfloat16")


def small_test_configs(vocab_size: int = 512):
    """Tiny configs for unit tests — same structure, toy sizes."""
    model = ModelConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=64)
    text = TextEncoderConfig(vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
                             num_attention_heads=4, intermediate_size=64,
                             max_position_embeddings=256)
    fcmf = FCMFConfig(model=model, text=text, num_imgs=3, num_roi=2, num_patches=49,
                      visual_feat_dim=64, max_text_len=24, box_heads=4)
    dec = DecoderConfig(vocab_size=vocab_size, hidden_size=32, num_blocks=2, num_heads=4,
                        ffn_hidden=32, max_decode_len=8)
    return model, text, fcmf, dec
