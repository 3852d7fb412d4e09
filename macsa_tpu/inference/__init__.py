from macsa_tpu.inference.pipeline import (  # noqa: F401
    DROP_ROI_LIST,
    merge_boxes,
    construct_visual_features,
)
