from macsa_tpu.models import layers  # noqa: F401
from macsa_tpu.models.attention import PerHeadAttention  # noqa: F401
from macsa_tpu.models.box_attention import (  # noqa: F401
    BoxMultiHeadedAttention,
    box_relational_embedding,
)
from macsa_tpu.models.decoder import IAOGDecoder, TransformerDecoderBlock  # noqa: F401
from macsa_tpu.models.fcmf import FCMF, FCMFEncoder  # noqa: F401
from macsa_tpu.models.mde import MultimodalDenoisingEncoder  # noqa: F401
from macsa_tpu.models.resnet import ResNet, VisualFeatures  # noqa: F401
from macsa_tpu.models.seq2seq import FCMFSeq2Seq, seq2seq_loss  # noqa: F401
from macsa_tpu.models.text_encoder import TextEncoder  # noqa: F401
