from gcpnet_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_softmax_denominator,
    masked_mean,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_softmax_denominator",
    "masked_mean",
]
