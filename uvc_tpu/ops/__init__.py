from uvc_tpu.ops.stes import ste_ceil, ste_floor, least_k_sum
from uvc_tpu.ops.gumbel import (
    gumbel_softmax,
    gumbel_topk_mask,
    softl0,
)
