"""generate_mask CLI end-to-end (reference:
Baseline_pruning/generating_mask.py) and the persistent-compile-cache
helper (utils/cache.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvc_tpu.cli.generate_mask import main as gen_main
from uvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture()
def pretrained_ckpt(tmp_path):
    """Pretrained-shaped weights: mask generation is a post-training
    tool (the reference always scores a trained model), and a FRESH init
    is degenerate by design — the zero-init classifier head (reference
    _init_vit_weights, model_distilled.py:71-74) makes every |g*w|
    taylor score 0 and piles magnitude ties at 0.  Randomize the
    zero-init leaves to stand in for training.  The head matches the
    synthetic dataset's 1000 classes so gradient scoring sees every
    label (mismatched heads now FILTER batches instead of aliasing)."""
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import get_model
    cfg = get_config("testing").replace(img_size=32, num_classes=1000)
    params = get_model(cfg).init_params(jax.random.PRNGKey(0), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    params["head"]["kernel"] = 0.02 * jax.random.normal(
        k1, params["head"]["kernel"].shape)
    path = tmp_path / "pretrained.ckpt"
    save_checkpoint(str(path), {"params": params})
    return str(path)


@pytest.mark.parametrize("mtype,scope", [("mag", "global"),
                                         ("mag", "local"),
                                         ("taylor", "global")])
def test_generate_mask_cli_hits_sparsity(tmp_path, pretrained_ckpt,
                                         mtype, scope, capsys):
    out = tmp_path / f"{mtype}_{scope}.ckpt"
    gen_main(["--type", mtype, "--scope", scope, "--sparsity", "0.5",
              "--model_type", "testing", "--dataset", "synthetic",
              "--input_size", "32", "--batch_size", "4",
              "--num_batches", "1", "--pretrained", pretrained_ckpt,
              "--save_file", str(out)])
    assert "saved mask to" in capsys.readouterr().out
    flat = load_checkpoint(str(out))
    masks = [np.asarray(v) for v in jax.tree_util.tree_leaves(flat)]
    assert masks and all(set(np.unique(m)) <= {0.0, 1.0} for m in masks)
    total = sum(m.size for m in masks)
    kept = sum(m.sum() for m in masks)
    # continuous scores -> the global kth-threshold is near-exact; local
    # is per-leaf so rounding on the micro config's tiny leaves widens it
    tol = 0.02 if scope == "global" else 0.1
    assert abs(kept / total - 0.5) < tol


def test_generate_mask_mismatched_head_filters_not_aliases(tmp_path,
                                                           capsys):
    """A 10-class checkpoint scored against 1000-class synthetic data
    must not alias labels mod the head width (ADVICE r4): batches are
    filtered to expressible labels, and when none survive the CLI
    refuses with guidance instead of emitting skewed masks."""
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import get_model
    cfg = get_config("testing").replace(img_size=32)  # 10-class head
    params = get_model(cfg).init_params(jax.random.PRNGKey(0), cfg)
    params["head"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(1), params["head"]["kernel"].shape)
    ckpt = tmp_path / "narrow.ckpt"
    save_checkpoint(str(ckpt), {"params": params})
    # synthetic seed-0 labels are ~uniform over 1000 classes: a 4-sample
    # batch deterministically has none < 10
    with pytest.raises(SystemExit, match="labels"):
        gen_main(["--type", "taylor", "--sparsity", "0.5",
                  "--model_type", "testing", "--dataset", "synthetic",
                  "--input_size", "32", "--batch_size", "4",
                  "--num_batches", "1", "--pretrained", str(ckpt),
                  "--save_file", str(tmp_path / "out.ckpt")])
    assert "filtered to labels" in capsys.readouterr().out


def test_generate_mask_cli_sp_structured(tmp_path):
    out = tmp_path / "sp.ckpt"
    gen_main(["--type", "sp", "--atten_density", "0.5",
              "--mlp_density", "0.5", "--model_type", "testing",
              "--dataset", "synthetic", "--input_size", "32",
              "--batch_size", "4", "--num_batches", "1",
              "--save_file", str(out)])
    structural = load_checkpoint(str(out) + ".structural")
    assert "attn" in structural and "mlp" in structural
    flat = load_checkpoint(str(out))
    assert jax.tree_util.tree_leaves(flat)


def test_enable_compilation_cache(tmp_path, monkeypatch):
    from uvc_tpu.utils.cache import enable_compilation_cache
    monkeypatch.delenv("UVC_COMPILE_CACHE", raising=False)
    assert enable_compilation_cache(None) is None

    d = str(tmp_path / "cache")
    assert enable_compilation_cache(d) == d
    assert jax.config.jax_compilation_cache_dir == d
    # relay compiles of 1-20 s must be cached (default threshold is 60)
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0

    # env-var fallback
    monkeypatch.setenv("UVC_COMPILE_CACHE", str(tmp_path / "env_cache"))
    assert enable_compilation_cache(None) == str(tmp_path / "env_cache")

    # restore something harmless for the rest of the suite
    jax.config.update("jax_compilation_cache_dir", None)


def test_compilation_cache_writes_entries(tmp_path):
    from uvc_tpu.utils.cache import enable_compilation_cache
    d = enable_compilation_cache(str(tmp_path / "c"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        @jax.jit
        def uniquely_shaped(x):      # fresh HLO: not in the in-memory cache
            return jnp.tanh(x @ x.T) * 3.25 + 0.125

        uniquely_shaped(jnp.ones((37, 19))).block_until_ready()
        import os
        entries = [f for root, _, fs in os.walk(d) for f in fs]
        assert entries, "no persistent cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
