from uvc_tpu.infer.compact import compact_model, apply_compact  # noqa: F401
