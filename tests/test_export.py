"""AOT serving export (uvc_tpu/infer/export.py): the serialized StableHLO
artifact must round-trip through jax.export and reproduce apply_compact's
logits with zero uvc_tpu model code on the load side."""

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.compress.masks import build_masks
from uvc_tpu.configs import get_config
from uvc_tpu.infer.compact import apply_compact, compact_model
from uvc_tpu.infer.export import (ServingModel, export_serving,
                                  load_serving, save_serving)
from uvc_tpu.models import vit

CFG = get_config("testing").replace(embed_dim=16, num_heads=2, depth=3,
                                    num_classes=7)


def _compact():
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    s = jnp.array([[1.0, 32.0], [0.0, 32.0], [0.0, 32.0]])
    r = jnp.zeros((3, 2))
    masks = build_masks(params, s, r, CFG)
    params["block_gating"] = jnp.array(
        [[-1.0, 1.0], [-1.0, 1.0], [1.0, -1.0]])
    return compact_model(params, masks, CFG)


def test_export_roundtrip_matches_apply_compact(tmp_path):
    layers, top = _compact()
    arts = export_serving(layers, top, CFG, batch_sizes=(4,),
                          dtype=jnp.float32)
    assert set(arts) == {"b4"}

    path = str(tmp_path / "serve.npz")
    save_serving(path, arts)
    model = load_serving(path)
    assert model.batch_sizes == [4]

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (4, CFG.img_size, CFG.img_size, 3))
    got = np.asarray(model(x))
    ref = apply_compact(layers, top, x, CFG, dtype=jnp.float32)
    want = np.asarray(0.5 * (ref.logits + ref.logits_kd)) if CFG.distilled \
        else np.asarray(ref.logits)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_export_pads_partial_batch():
    layers, top = _compact()
    model = ServingModel(export_serving(layers, top, CFG, batch_sizes=(2, 4),
                                        dtype=jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (3, CFG.img_size, CFG.img_size, 3))
    out3 = np.asarray(model(x))              # pads 3 -> 4, trims back
    assert out3.shape == (3, CFG.num_classes)
    out_direct = np.asarray(model(x[:2]))    # exact fit on the b2 artifact
    np.testing.assert_allclose(out_direct, out3[:2], rtol=2e-4, atol=2e-4)

    too_big = jnp.zeros((5, CFG.img_size, CFG.img_size, 3))
    try:
        model(too_big)
        assert False, "expected ValueError for oversized batch"
    except ValueError:
        pass


def test_export_token_slimming_artifact():
    layers, top = _compact()
    model = ServingModel(export_serving(layers, top, CFG, batch_sizes=(2,),
                                        token_ratio=0.7, dtype=jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (2, CFG.img_size, CFG.img_size, 3))
    ref = apply_compact(layers, top, x, CFG, dtype=jnp.float32,
                        token_ratio=0.7)
    want = 0.5 * (ref.logits + ref.logits_kd) if CFG.distilled else ref.logits
    np.testing.assert_allclose(np.asarray(model(x)), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
