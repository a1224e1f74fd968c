"""Ahead-of-time serving export (StableHLO) for compacted models.

The reference has no deployment artifact at all — serving means loading
the training checkpoint into the full PyTorch module tree and re-running
eval (post_train.py:357-360 keeps the dense-shaped masked weights).  On
TPU the natural deployment unit is an AOT-compiled program: we lower the
compacted inference function (infer/compact.py apply_compact) through
``jax.export`` to a serialized StableHLO artifact that

  * embeds the weights as constants (the compact model is the frozen
    discovered architecture — nothing is trainable at serving),
  * pins the input spec (batch, img, img, 3) uint8/float — static shapes
    so XLA tiles every matmul onto the MXU,
  * on a TPU backend captures the fused Pallas sublayer kernels as
    Mosaic custom calls inside the artifact,
  * round-trips with ``jax.export.deserialize`` into a callable that
    needs only jax — no uvc_tpu import, no Python model code — which is
    the actual contract a serving fleet wants.

Several batch sizes can be packed into one file; the loader picks the
smallest exported batch >= the request and pads.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.configs import ViTConfig


def export_serving(layers: List[dict], top: dict, cfg: ViTConfig, *,
                   batch_sizes: Sequence[int] = (8,),
                   token_ratio: Optional[float] = None,
                   dtype=jnp.bfloat16) -> Dict[str, bytes]:
    """Serialize apply_compact to StableHLO, one artifact per batch size.

    Returns {"b<batch>": serialized_bytes}.  The export captures the
    current default backend's lowering (CPU: plain XLA; TPU: Mosaic
    kernels), recorded in the artifact's platform list.
    """
    from uvc_tpu.infer.compact import apply_compact

    arts: Dict[str, bytes] = {}
    for b in batch_sizes:
        def serve(x):
            out = apply_compact(layers, top, x.astype(dtype), cfg,
                                dtype=dtype, token_ratio=token_ratio)
            if cfg.distilled:
                # deployed eval head = mean of both heads (vit.py eval
                # fusion; reference model_distilled.py returns the pair)
                return 0.5 * (out.logits + out.logits_kd)
            return out.logits

        spec = jax.ShapeDtypeStruct((b, cfg.img_size, cfg.img_size, 3),
                                    jnp.float32)
        exp = jax.export.export(jax.jit(serve))(spec)
        arts[f"b{b}"] = exp.serialize()
    return arts


class ServingModel:
    """A deserialized serving artifact: callable, no model code needed."""

    def __init__(self, artifacts: Dict[str, bytes]):
        self._fns = {}
        for key, data in artifacts.items():
            exp = jax.export.deserialize(
                data if isinstance(data, bytes) else bytes(data))
            self._fns[int(key[1:])] = exp.call
        self._batches = sorted(self._fns)

    @property
    def batch_sizes(self) -> List[int]:
        return list(self._batches)

    def __call__(self, x) -> jax.Array:
        """Run on [B, H, W, 3] images; pads B up to an exported batch."""
        b = x.shape[0]
        fit = next((s for s in self._batches if s >= b), None)
        if fit is None:
            raise ValueError(
                f"batch {b} exceeds largest exported size {self._batches[-1]}")
        if fit != b:
            x = jnp.concatenate(
                [x, jnp.zeros((fit - b,) + x.shape[1:], x.dtype)], axis=0)
        return self._fns[fit](jnp.asarray(x, jnp.float32))[:b]


def save_serving(path: str, artifacts: Dict[str, bytes]) -> None:
    """Write artifacts as an .npz (bytes stored as uint8 arrays)."""
    np.savez(path, **{k: np.frombuffer(v, np.uint8)
                      for k, v in artifacts.items()})


def load_serving(path: str) -> ServingModel:
    with np.load(path) as z:
        return ServingModel({k: z[k].tobytes() for k in z.files})
