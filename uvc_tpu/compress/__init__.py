from uvc_tpu.compress.scores import group_scores
from uvc_tpu.compress.resource import (
    MacsTable,
    build_macs_table,
    flops_fraction,
)
from uvc_tpu.compress.state import CompressionState, MinimaxHParams
from uvc_tpu.compress.masks import (
    build_masks,
    prox_weights,
    prune_weights,
    apply_masks_to_params,
    count_remaining_params,
    total_maskable_params,
)
from uvc_tpu.compress.minimax import init_compression_state, arch_update
