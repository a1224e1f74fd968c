"""Gradient-sparsity diagnostics (diagnostics.py + the
show_gradient_sparsity CLI).  Reference capability:
Baseline_pruning/show_gradient_sparsity.py — which as shipped does not
run (imports a nonexistent engine function); this is the working
equivalent, so it gets the tests the reference never had."""

import jax.numpy as jnp
import numpy as np

from uvc_tpu.diagnostics import (aggregate_sparsity, format_report,
                                 gradient_sparsity_stats)


def test_stats_hand_computed():
    grads = {"a": {"kernel": jnp.array([0.0, 0.0, 3.0, -4.0])},
             "bias": jnp.array([0.0, 1e-6])}
    stats = gradient_sparsity_stats(grads)
    k = stats["a.kernel"]
    assert k["size"] == 4
    assert k["zeros"] == 0.5
    assert np.isclose(k["l1"], 7.0)
    assert np.isclose(k["l2"], 5.0)
    assert np.isclose(k["max"], 4.0)
    # exact-zero counting (threshold=0) matches the reference's
    # torch.sum(weight == 0) semantics: 1e-6 is NOT a zero
    assert stats["bias"]["zeros"] == 0.5
    # aggregate is size-weighted: (2 + 1) / 6
    assert np.isclose(aggregate_sparsity(stats), 3 / 6)


def test_near_zero_threshold():
    stats = gradient_sparsity_stats({"w": jnp.array([0.0, 1e-6, 1.0])},
                                    threshold=1e-5)
    assert np.isclose(stats["w"]["near_zeros"], 2 / 3)
    assert np.isclose(stats["w"]["zeros"], 1 / 3)


def test_format_report_ranks_by_zeros():
    stats = gradient_sparsity_stats({
        "dense": jnp.ones((8,)),
        "sparse": jnp.array([0.0] * 7 + [1.0]),
    })
    rep = format_report(stats)
    assert rep.index("sparse") < rep.index("dense")
    assert "overall zero-gradient fraction" in rep


def test_cli_runs(capsys):
    from uvc_tpu.cli.show_gradient_sparsity import main
    main(["--model_type", "testing", "--dataset", "synthetic",
          "--img_size", "32", "--train_batch_size", "4",
          "--synthetic_steps", "2", "--num_batches", "2"])
    out = capsys.readouterr().out
    assert "overall zero-gradient fraction" in out
    # the tiny model's embedding + head leaves all show up
    assert "cls_token" in out or "head" in out or "blocks" in out
