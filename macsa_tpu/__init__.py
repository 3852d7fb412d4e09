"""macsa_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for Vietnamese
Multimodal Aspect-Category Sentiment Analysis (MACSA).

Re-designed from scratch with the capabilities of the reference PyTorch stack
`sonbui25/Multimodal-Aspect-Category-Sentiment-Analysis`:

* the FCMF (Fine-grained Cross-Modal Fusion) encoder — ViSoBERT/XLM-R text
  backbone, ResNet-152 grid + geometric ROI features, text->image and text->ROI
  cross-attention fusion (reference: fcmf_framework/fcmf_pretraining.py:14-141),
* the two-phase IAOG pipeline — seq2seq implicit-aspect-opinion pretraining
  followed by a 6-aspect x 4-polarity classifier fine-tune
  (reference: run_pretraining_fcmf.py / run_multimodal_fcmf.py),
* the mRoBERTa / TomBERT / EF-CapTrRoBERTa baselines, the offline image/ROI
  aspect-labeling tools, and a single-sample inference CLI.

TPU-first design notes (not a port):
* the reference's per-aspect (x6) and per-image (x7) Python loops are folded
  into batch dimensions / vmap so XLA tiles everything onto the MXU,
* data parallelism is SPMD via `jax.sharding.Mesh` + NamedSharding instead of
  DDP/NCCL; gradients reduce over ICI with XLA collectives,
* bf16 activations replace AMP fp16 (no GradScaler), params/optimizer in f32,
* checkpoint/resume/phase-transfer via orbax,
* hot ops (image normalization, fused box-bias attention) have Pallas kernels.
"""

__version__ = "0.1.0"

from macsa_tpu.config import (  # noqa: F401
    ModelConfig,
    TextEncoderConfig,
    ASPECTS,
    POLARITIES,
)
