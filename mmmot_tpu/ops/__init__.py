from mmmot_tpu.ops.masking import (
    NEG_INF,
    masked_max,
    masked_mean,
    masked_softmax,
    masked_log_softmax,
    pad_to,
    pair_mask,
)
