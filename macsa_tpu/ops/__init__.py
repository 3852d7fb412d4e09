from macsa_tpu.ops.image_prep import normalize_images_u8  # noqa: F401
from macsa_tpu.ops.box_attention_kernel import fused_box_attention  # noqa: F401
