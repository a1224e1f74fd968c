from uvc_tpu.infer.compact import compact_model, apply_compact  # noqa: F401
from uvc_tpu.infer.export import (export_serving, save_serving,  # noqa: F401
                                  load_serving, ServingModel)
