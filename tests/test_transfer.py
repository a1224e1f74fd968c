"""Transfer-learning checkpoint loading (T2TViT/utils.py:45-89,
transfer_learning.py): class-count-mismatched heads are re-initialized and
learned position embeddings are bicubically grid-resized, so a 1000-class
224px checkpoint fine-tunes on CIFAR-sized label sets / other resolutions."""

import jax
import numpy as np

from uvc_tpu.configs import get_config
from uvc_tpu.models import vit
from uvc_tpu.models.convert import (from_torch_state_dict, resize_pos_embed,
                                    to_torch_state_dict)

CFG = get_config("testing")  # D=8, L=1, H=1, img 32 -> 4 patches + cls
D = CFG.embed_dim


def _ckpt_sd(num_classes=1000, distilled=False):
    cfg = CFG.replace(num_classes=num_classes, distilled=distilled)
    p = vit.init_params(jax.random.PRNGKey(0), cfg)
    return to_torch_state_dict(jax.tree.map(np.asarray, p), cfg)


def test_class_mismatch_reinits_head_keeps_backbone():
    sd = _ckpt_sd(num_classes=1000)
    params = from_torch_state_dict(sd, CFG.replace(num_classes=10))
    assert params["head"]["kernel"].shape == (D, 10)
    assert np.all(params["head"]["bias"] == 0)
    # trunc_normal(std=.02) init, not zeros and not the checkpoint's head
    assert np.any(params["head"]["kernel"] != 0)
    assert np.abs(params["head"]["kernel"]).max() <= 0.04 + 1e-6
    np.testing.assert_array_equal(params["norm"]["scale"], sd["norm.weight"])
    np.testing.assert_array_equal(params["pos_embed"], sd["pos_embed"])


def test_missing_head_keys_reinit():
    # reference transfer checkpoints delete head.{weight,bias} outright
    sd = {k: v for k, v in _ckpt_sd(num_classes=10).items()
          if not k.startswith("head.")}
    params = from_torch_state_dict(sd, CFG.replace(num_classes=10))
    assert params["head"]["kernel"].shape == (D, 10)
    assert np.any(params["head"]["kernel"] != 0)


def test_pos_embed_grid_resize_and_forward():
    sd = _ckpt_sd(num_classes=10)
    cls_row = np.arange(D, dtype=np.float32).reshape(1, 1, D)
    grid = np.full((1, 4, D), 0.25, np.float32)
    sd["pos_embed"] = np.concatenate([cls_row, grid], axis=1)

    cfg64 = CFG.replace(img_size=64, num_classes=10)  # 16 patches + cls
    params = from_torch_state_dict(sd, cfg64)
    assert params["pos_embed"].shape == (1, cfg64.seq_len, D)
    # cls row carried over unscaled; constant grid stays constant under
    # the bicubic interpolation
    np.testing.assert_array_equal(params["pos_embed"][0, 0], cls_row[0, 0])
    np.testing.assert_allclose(params["pos_embed"][0, 1:], 0.25, atol=1e-5)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out = vit.apply(jax.tree.map(np.asarray, params), x, cfg64, train=False)
    assert out.logits.shape == (2, 10)
    assert bool(np.all(np.isfinite(np.asarray(out.logits))))


def test_distilled_to_plain_prefix_handling():
    sd = _ckpt_sd(num_classes=10, distilled=True)  # 2 prefix rows
    sd["pos_embed"] = np.concatenate(
        [np.full((1, 1, D), 7.0, np.float32),      # cls
         np.full((1, 1, D), 9.0, np.float32),      # dist
         np.full((1, 4, D), 0.5, np.float32)], axis=1)
    cfg64 = CFG.replace(img_size=64, num_classes=10)  # plain, 1 prefix row
    params = from_torch_state_dict(sd, cfg64)
    assert params["pos_embed"].shape == (1, cfg64.seq_len, D)
    np.testing.assert_allclose(params["pos_embed"][0, 0], 7.0)
    np.testing.assert_allclose(params["pos_embed"][0, 1:], 0.5, atol=1e-5)


def test_resize_pos_embed_plain_to_distilled_repeats_cls():
    pos = np.concatenate([np.full((1, 1, D), 3.0, np.float32),
                          np.full((1, 4, D), 0.125, np.float32)], axis=1)
    out = resize_pos_embed(pos, new_len=11, new_prefix=2, old_prefix=1)
    assert out.shape == (1, 11, D)
    np.testing.assert_allclose(out[0, 0], 3.0)
    np.testing.assert_allclose(out[0, 1], 3.0)   # dist row repeats cls
    np.testing.assert_allclose(out[0, 2:], 0.125, atol=1e-5)
