from buckgnn_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax_weights,
)
from buckgnn_tpu.ops.sage import sage_aggregate  # noqa: F401
