"""Schedule semantics vs hand-computed reference values.

zlr staircase: reference builds {i*gap: zlr_list[i]} with gap =
num_epochs // len(list) and applies the largest entry with key <= epoch
(joint_train.py:999-1005 + PresetLRScheduler, utils/scheduler.py:81-87).
tau ramp: tau = min + (max-min) * ite/total with (10, 0.1) — tau RISES
0.1 -> 10 (joint_train.py:83-85)."""

import numpy as np

from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.utils.schedules import (get_tau, warmup_cosine_schedule,
                                     warmup_linear_schedule)


def test_zlr_staircase_reference_shape():
    hp = MinimaxHParams(zlr_schedule=(1.0, 5.0, 9.0))
    # num_epochs=30, 3 entries -> gap 10: [0,10) -> 1, [10,20) -> 5, 20+ -> 9
    want = {0: 1.0, 9: 1.0, 10: 5.0, 19: 5.0, 20: 9.0, 29: 9.0, 35: 9.0}
    for epoch, zlr in want.items():
        assert hp.zlr_for_epoch(epoch, 30) == zlr


def test_zlr_staircase_degenerate_shapes():
    # single entry: constant
    hp = MinimaxHParams(zlr_schedule=(2.0,))
    assert hp.zlr_for_epoch(0, 30) == 2.0
    assert hp.zlr_for_epoch(29, 30) == 2.0
    # more entries than epochs: gap clamps to 1 (one entry per epoch)
    hp = MinimaxHParams(zlr_schedule=(1.0, 2.0, 3.0, 4.0))
    assert hp.zlr_for_epoch(0, 2) == 1.0
    assert hp.zlr_for_epoch(1, 2) == 2.0
    assert hp.zlr_for_epoch(3, 2) == 4.0


def test_zlr_staircase_per_epoch_ramp():
    # the fidelity harness's equal-integral ramp relies on gap=1 when
    # len(list) == num_epochs: epoch e takes entry e, last entry sticks
    sched = tuple(float(v) for v in range(1, 16))
    hp = MinimaxHParams(zlr_schedule=sched)
    for e in range(15):
        assert hp.zlr_for_epoch(e, 15) == sched[e]
    assert hp.zlr_for_epoch(20, 15) == sched[-1]
    # what the trainer EXECUTES: run_stage1 numbers epochs from 1
    # (stage1.py epoch loop), so entry 0 never applies and the ramp seen
    # on-chip is entries 1..14 with entry 14 repeating at epoch 15 —
    # the convention the fidelity harness's integral accounting uses
    executed = [hp.zlr_for_epoch(e, 15) for e in range(1, 16)]
    assert executed == list(sched[1:]) + [sched[-1]]
    # below scenario shape (15 entries, 12 epochs): gap stays 1 and the
    # final executed epoch (12) takes entry 12, not 11
    assert hp.zlr_for_epoch(12, 12) == sched[12]


def test_tau_ramp_rises():
    assert np.isclose(float(get_tau(10.0, 0.1, 0, 1000)), 0.1)
    assert np.isclose(float(get_tau(10.0, 0.1, 500, 1000)), 5.05)
    assert np.isclose(float(get_tau(10.0, 0.1, 1000, 1000)), 10.0)
    # clipped past the end
    assert np.isclose(float(get_tau(10.0, 0.1, 2000, 1000)), 10.0)


def test_warmup_cosine_endpoints():
    fn = warmup_cosine_schedule(1e-3, warmup_steps=10, t_total=110)
    assert float(fn(0)) == 0.0
    assert np.isclose(float(fn(10)), 1e-3)
    # half the cosine span: cos(pi/2) -> lr/2
    assert np.isclose(float(fn(60)), 5e-4, rtol=1e-2)
    assert float(fn(110)) <= 1e-6


def test_warmup_linear_endpoints():
    fn = warmup_linear_schedule(1e-3, warmup_steps=10, t_total=110)
    assert np.isclose(float(fn(10)), 1e-3)
    assert np.isclose(float(fn(60)), 5e-4, rtol=1e-2)
