from gcpnet_tpu.ops.pallas_segment import (
    row_splits_from_sorted_ids,
    segment_sum_sorted,
)
from gcpnet_tpu.ops.segment import (
    masked_mean,
    segment_mean,
    segment_softmax_denominator,
    segment_sum,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_softmax_denominator",
    "masked_mean",
    "segment_sum_sorted",
    "row_splits_from_sorted_ids",
]
