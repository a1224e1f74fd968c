from uvc_tpu.baselines.pruning import (  # noqa: F401
    magnitude_scores, synflow_scores, taylor_scores, sp_structured_masks,
    global_threshold_mask, local_threshold_mask, identity_masks,
    apply_weight_masks, mask_sparsity, maskable_paths)
from uvc_tpu.baselines.gmp import cubic_sparsity, GMPSchedule  # noqa: F401
