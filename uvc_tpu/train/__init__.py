from uvc_tpu.train.state import TrainState, TrainHParams, create_train_state
from uvc_tpu.train.step import (
    build_stage1_step,
    build_stage2_step,
    build_eval_step,
)
