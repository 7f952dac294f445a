from mmmot_tpu.ops.masking import (
    NEG_INF,
    masked_max,
    masked_mean,
    masked_softmax,
    masked_log_softmax,
    pad_to,
    pair_mask,
)
from mmmot_tpu.ops.crop_resize import (crop_and_resize,
                                       crop_and_resize_batched,
                                       crop_and_resize_mxu,
                                       normalize_crops)
from mmmot_tpu.ops.frustum import (frustum_sample, frustum_sample_batched,
                                   project_points)
