from uvc_tpu.data.mixup import mixup_cutmix, one_hot_smooth
