"""Longer-horizon trajectory fidelity: DeiT-Tiny-shaped stage-1 run.

The reference's de-facto golden output is the published DeiT-Tiny ImageNet
log (/root/reference/log/deit-tiny-log.log): budget 0.5, 30 epochs
(5 warmup), zlr staircase 1/5/9/13/17, soft KD (alpha 0.1, tau 1.0) from
the dense pretrained weights — Real FLOPs holds in the 83.7-100% gumbel-
sampling band through warmup, descends 83.7 -> 64.7 -> 57.7 -> 48.5 ->
~41.5% by epoch 10, then settles in the 42.7% neighborhood of the 0.5
budget, with Expectation and Real FLOPs converging to within 0.1%.

That exact run needs ImageNet + a pretrained checkpoint; this harness
reproduces the *pipeline and dynamics at the real model shape* — the full
12-block/3-head/192-wide DeiT-Tiny architecture (not the 2-block toy of
tests/test_fidelity.py):

  phase A  pretrain the dense model on a structured synthetic task
           (class-conditional sinusoid textures, 100 classes, 64px) —
           stands in for the pretrained ImageNet checkpoint
  phase B  stage-1 UVC with the reference tiny recipe (budget 0.5, zlr
           staircase, block gating, soft KD from the phase-A dense
           weights), epoch axis compressed 2x (15 epochs, warmup 1),
           dual rates scaled for the shorter step horizon (see inline)

and gates the Real-FLOPs series against the published trajectory's shape:

  G1  warmup epochs stay in the no-pruning band (>= 10/12 blocks = 83.3%;
      the reference's own warmup reports sample 83.7-100% — the report
      draws hard-gumbel gating)
  G2  descent reaches <= 60% by epoch 10 (reference: 57.7% by epoch 8/30)
  G3  constraint satisfied and not collapsed: mean Real FLOPs over the
      last 3 epochs in [0.20, 0.55].  The reference lands at 42.7% (this
      harness measures ~45% after the same overshoot-below-budget-then-
      recover shape as the published 41.5 -> 42.7 tail); the gate also
      catches both failure modes observed while building this — collapse
      to ~2% when the loss has no signal (gating_weight=5 instead of the
      recipe's 5e-4), and a dual limit cycle when the dual rates are
      scaled too aggressively
  G4  |Expectation - Real| <= 0.08 tail mean (gating converged; the
      published tail shows them within 0.1%, this run ends at 0.1%)
  G5  dual/primal invariants: z >= 0, y >= 0, p >= 0, s >= 0 at the end

Measured PASS trajectory (TPU v5e, ~25 min):
  91.9 93.3 72.4 73.1 70.6 73.1 59.7 55.2 73.1 49.9 44.6 39.2 31.1 43.6
  45.5 — accuracy 99.7% at 45% Real FLOPs, exp/real converged to 0.1%.

Usage:  timeout 3600 python scripts/trajectory_fidelity.py \
            --out FIDELITY_r03.json                          # ~25 min TPU

Exits non-zero if any gate fails; --out writes the gate results, the
Real-FLOPs series and accuracies as a JSON round artifact (VERDICT r2
missing #2).  Referenced from CLAUDE.md (workflows).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

EPOCHS = 15        # reference: 30
WARMUP = 1         # reference: 5
PRETRAIN_EPOCHS = 5
STEPS = 100        # batches per epoch
BATCH = 128
CLASSES = 100
IMG = 64


class TextureLoader:
    """Structured synthetic task: each class is a distinct 3-channel
    sinusoid texture (frequency/orientation/color mix) + per-sample phase
    jitter and pixel noise.  Learnable by a tiny ViT in a few hundred
    steps, so the compression loss has real accuracy pressure to push
    against (pure-noise data lets stage-1 prune everything: measured
    collapse to 2.4% Real FLOPs)."""

    def __init__(self, batch_size, num_batches, *, seed=0):
        rng = np.random.default_rng(1234)   # class definitions are fixed
        self.freq = rng.uniform(0.15, 0.9, (CLASSES, 2))
        self.color = rng.uniform(0.3, 1.0, (CLASSES, 3))
        self.rng = np.random.default_rng(seed)
        self.batch_size = batch_size
        self.num_batches = num_batches
        yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
        self._grid = (xx, yy)

    def __len__(self):
        return self.num_batches

    def set_epoch(self, epoch):
        pass

    def _make(self, labels, phases):
        xx, yy = self._grid
        fx = self.freq[labels, 0][:, None, None]
        fy = self.freq[labels, 1][:, None, None]
        wave = np.sin(fx * xx + fy * yy + phases[:, None, None])
        img = wave[..., None] * self.color[labels][:, None, None, :]
        img = (img * 0.5 + 0.5) * 255.0
        noise = self.rng.normal(0.0, 12.0, img.shape)
        return np.clip(img + noise, 0, 255).astype(np.uint8)

    def __iter__(self):
        for _ in range(self.num_batches):
            labels = self.rng.integers(0, CLASSES, self.batch_size)
            phases = self.rng.uniform(0, 2 * np.pi, self.batch_size) \
                .astype(np.float32)
            yield self._make(labels, phases), labels.astype(np.int32)


def main():
    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.configs import get_config
    from uvc_tpu.train.stage1 import run_stage1
    from uvc_tpu.train.state import TrainHParams
    from uvc_tpu.utils.logging import MetricLogger

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write the JSON artifact here "
                         "(e.g. FIDELITY_r03.json)")
    opts = ap.parse_args()
    t0 = time.time()

    cfg = get_config("deit_tiny_distilled_patch16_224").replace(
        img_size=IMG, num_classes=CLASSES)
    out = tempfile.mkdtemp(prefix="traj_fid_")
    train = TextureLoader(BATCH, STEPS, seed=0)
    test = TextureLoader(BATCH, 5, seed=99)

    # ---- phase A: dense pretrain (stands in for the DeiT checkpoint) ----
    hp_pre = MinimaxHParams(enable_patch_gating=0, enable_pruning=False)
    thp_pre = TrainHParams(
        learning_rate=1e-3, warmup_lr=1e-3, weight_decay=0.05,
        warmup_steps=0, t_total=PRETRAIN_EPOCHS * STEPS,
        num_epochs=PRETRAIN_EPOCHS, warmup_epochs=PRETRAIN_EPOCHS,
        num_classes=CLASSES, mixup=0.0, cutmix=0.0, smoothing=0.1,
        distillation_type="none",
        compute_dtype=(jax.numpy.bfloat16
                       if jax.devices()[0].platform != "cpu"
                       else jax.numpy.float32))
    logger = MetricLogger(out, "pretrain")
    pre = run_stage1(cfg, hp_pre, thp_pre, train_loader=train,
                     test_loader=test, seed=0, output_dir=out,
                     name="pretrain", eval_each_epoch=True,
                     save_checkpoints=False, logger=logger)
    dense = jax.tree.map(jax.numpy.copy, pre.state.params)

    # ---- phase B: stage-1 UVC, reference tiny recipe compressed 2x ----
    hp = MinimaxHParams(
        budget=0.5, slr=0.02, rlr=0.02, glr=0.1, ylr=2e-4, plr=2e-4,
        # dual rates scaled 2x: the reference traverses its dual (z/y/p)
        # trajectory over 75k steps; this run has 1.5k, so the duals need
        # faster ascent to bind within the horizon.  5x was measured to
        # overshoot into a limit cycle (8.6% <-> 68%); 2x descends through
        # the budget with reference-like overshoot-and-recover.  Primal
        # rates (slr/rlr/glr/lr) stay at recipe values — they are coupled
        # to per-step weight adaptation, not to the horizon.
        zlr_schedule=(2, 10, 18, 26, 34), gating_interval=10,
        gating_weight=5e-4,   # the published tiny recipe (log Namespace);
                              # the argparse default 5 slams gates shut
        eps=0.1, eps_decay=0.92, use_gumbel=True,
        enable_block_gating=True, enable_part_gating=False,
        enable_patch_gating=0)
    thp = TrainHParams(
        learning_rate=1e-4, warmup_lr=1e-4, weight_decay=0.05,
        warmup_steps=25, t_total=EPOCHS * STEPS, num_epochs=EPOCHS,
        warmup_epochs=WARMUP, num_classes=CLASSES, mixup=0.8, cutmix=1.0,
        distillation_type="soft", distillation_alpha=0.1,
        distillation_tau=1.0,
        compute_dtype=thp_pre.compute_dtype)
    logger = MetricLogger(out, "tinyshape")
    result = run_stage1(cfg, hp, thp, train_loader=train, test_loader=test,
                        params=dense, teacher_params=dense, seed=0,
                        output_dir=out, name="tinyshape",
                        eval_each_epoch=True, save_checkpoints=False,
                        logger=logger)
    cs = result.state.cstate

    series = []
    with open(os.path.join(out, "tinyshape", "metrics.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            if "train/flops_real" in rec:
                series.append((rec["train/flops_real"],
                               rec["train/flops_expectation"]))
    real = [r for r, _ in series]
    exp = [e for _, e in series]
    print("Real-FLOPs series (per epoch):",
          " ".join(f"{v * 100:.1f}" for v in real))
    print(f"pretrain acc: {pre.best_acc * 100:.1f}%  "
          f"compressed acc: {result.best_acc * 100:.1f}%")

    gates = {
        "G1 warmup in no-pruning band (>= 83.3%)":
            all(v >= 10.0 / 12.0 - 1e-3 for v in real[:WARMUP]),
        "G2 descent <= 60% by epoch 10": min(real[:10]) <= 0.60,
        "G3 tail mean in [0.20, 0.55]":
            0.20 <= float(np.mean(real[-3:])) <= 0.55,
        "G4 |exp - real| <= 0.08 tail mean":
            float(np.mean([abs(e - r) for e, r in series[-3:]])) <= 0.08,
        "G5 dual/primal invariants":
            float(cs.z) >= 0
            and bool(np.all(np.asarray(cs.y) >= 0))
            and bool(np.all(np.asarray(cs.p) >= 0))
            and bool(np.all(np.asarray(cs.s) >= 0)),
    }
    ok = True
    for name, passed in gates.items():
        print(f"{name}: {'PASS' if passed else 'FAIL'}")
        ok &= passed
    if opts.out:
        with open(opts.out, "w") as f:
            json.dump({
                "harness": "trajectory_fidelity",
                "golden_source": "reference log/deit-tiny-log.log "
                                 "(Real FLOPs 42.71% @ budget 0.5)",
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
                "ok": bool(ok), "wall_s": round(time.time() - t0, 1),
                "gates": {k: bool(v) for k, v in gates.items()},
                "real_flops_series": [round(v, 4) for v in real],
                "exp_flops_series": [round(v, 4) for v in exp],
                "pretrain_acc": round(float(pre.best_acc), 4),
                "compressed_acc": round(float(result.best_acc), 4),
            }, f, indent=1)
        print(f"wrote {opts.out}")
    print("ALL PASS" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
