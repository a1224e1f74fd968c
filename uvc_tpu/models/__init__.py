"""Model registry dispatch.

``get_model(cfg)`` returns the module implementing the backbone family for
a config — the reference's equivalent is the if/else over model_type in
setup() (joint_train.py:135-148: DistilledVisionTransformer vs t2t_vit_14).
Every module exposes ``init_params(key, cfg, **kw)``, ``apply(params, x,
cfg, **kw)`` and ``eval_logits(out, cfg)`` with identical signatures so
train steps are model-agnostic.
"""

from uvc_tpu.models import vit
from uvc_tpu.models.vit import apply, eval_logits, init_params  # noqa: F401


def get_model(cfg):
    if cfg.cls_attn_layers > 0:
        from uvc_tpu.models import cait
        return cait
    if cfg.tokens_type != "none":
        if cfg.t2t_variant != "none":
            from uvc_tpu.models import t2t_ablations
            return t2t_ablations
        from uvc_tpu.models import t2t_vit
        return t2t_vit
    return vit
