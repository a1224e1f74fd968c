from uvc_tpu.models import vit
from uvc_tpu.models.vit import init_params, apply, eval_logits
