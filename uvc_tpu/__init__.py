"""UVC-TPU: a TPU-native JAX framework for Unified Vision Transformer Compression.

Re-implements the full capability surface of VITA-Group/UVC (ICLR'22) as an
idiomatic JAX / XLA / Pallas / pjit framework:

* joint structured pruning of attention heads, within-head dims, and MLP
  neurons, learned block skipping, and token/patch slimming, solved as a
  constrained minimax (primal-dual / ADMM-style) optimization under a
  differentiable FLOPs budget (reference: UVC/uvc_optimizer.py,
  UVC/uvc_utils.py);
* a two-stage pipeline: stage-1 joint architecture+weight search
  (reference: UVC/joint_train.py) and stage-2 mask-frozen distillation
  fine-tuning (reference: UVC/post_train.py);
* DeiT and T2T-ViT model families (reference: UVC/models/,
  UVC/T2TViT/models/);
* a baseline-pruning suite (magnitude / Taylor / SynFlow / structured head
  scoring + gradual magnitude pruning) (reference: UVC/Baseline_pruning/).

Unlike the reference (PyTorch + apex + NCCL), everything here is built
TPU-first: pure-functional models over parameter pytrees, a single jitted
SPMD train step per stage, XLA collectives over an ICI device mesh,
Pallas kernels for the masked attention / MLP hot path, and a closed-form
analytic FLOPs model instead of runtime MACs threading.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import uvc_tpu` light)."""
    import importlib
    lazy = {
        "get_config": ("uvc_tpu.configs", "get_config"),
        "CONFIGS": ("uvc_tpu.configs", "CONFIGS"),
        "get_model": ("uvc_tpu.models", "get_model"),
        "run_stage1": ("uvc_tpu.train.stage1", "run_stage1"),
        "run_stage2": ("uvc_tpu.train.stage2", "run_stage2"),
        "run_baseline": ("uvc_tpu.baselines.finetune", "run_baseline"),
        "compact_model": ("uvc_tpu.infer.compact", "compact_model"),
        "apply_compact": ("uvc_tpu.infer.compact", "apply_compact"),
        "fused_attention": ("uvc_tpu.ops.attention", "fused_attention"),
    }
    if name in lazy:
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'uvc_tpu' has no attribute {name!r}")
