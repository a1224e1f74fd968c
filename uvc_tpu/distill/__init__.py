from uvc_tpu.distill.losses import (
    distillation_loss,
    soft_target_cross_entropy,
    label_smoothing_cross_entropy,
)
