from uvc_tpu.utils.schedules import (
    warmup_cosine_schedule,
    warmup_linear_schedule,
    warmup_constant_schedule,
    get_tau,
)
