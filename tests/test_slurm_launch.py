"""SLURM launcher shim (cli/slurm_launch.py) — env derivation, nodelist
parsing, requeue-resume injection.  Reference behavior being mirrored:
Baseline_pruning/run_with_submitit.py (dist env setup :68-87,
checkpoint/requeue :58-66)."""

import os

import pytest

from uvc_tpu.cli.slurm_launch import (build_argv, derive_slurm_args,
                                      find_resume_ckpt, first_host, main)


@pytest.mark.parametrize("nodelist,want", [
    ("node1", "node1"),
    ("node1,node2", "node1"),
    ("node[001-004]", "node001"),
    ("node[3,7-9]", "node3"),
    ("tpu-host-[12-15],other[1-2]", "tpu-host-12"),
    ("rack[2]node[05-08]", "rack2node05"),
    # plain name BEFORE a bracketed group: the top-level comma must
    # split hosts even though '[' appears later in the list
    ("tpu-a,tpu-b[2-4]", "tpu-a"),
    ("host1,node[3-4],node7", "host1"),
])
def test_first_host(nodelist, want):
    assert first_host(nodelist) == want


def test_derive_outside_slurm_is_none():
    assert derive_slurm_args({}) is None
    # single-task allocations stay single-process
    assert derive_slurm_args({"SLURM_PROCID": "0",
                              "SLURM_NTASKS": "1"}) is None


def test_derive_multinode():
    env = {"SLURM_PROCID": "2", "SLURM_NTASKS": "3",
           "SLURM_JOB_NODELIST": "tpu[001-003]"}
    got = derive_slurm_args(env)
    assert got == {"coordinator": "tpu001:12321",
                   "num_processes": 3, "process_id": 2}


def test_derive_override_wins():
    env = {"SLURM_PROCID": "0", "SLURM_NTASKS": "2",
           "SLURM_JOB_NODELIST": "tpu[001-002]",
           "UVC_COORDINATOR": "10.0.0.5", "UVC_COORDINATOR_PORT": "999"}
    assert derive_slurm_args(env)["coordinator"] == "10.0.0.5:999"
    env["UVC_COORDINATOR"] = "10.0.0.5:1234"      # explicit port kept
    assert derive_slurm_args(env)["coordinator"] == "10.0.0.5:1234"


def test_find_resume_ckpt_is_stage_aware(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    (run / "deit_1.ckpt").write_bytes(b"a")
    (run / "deit_post_0.ckpt").write_bytes(b"b")
    (run / "deit_best.ckpt").write_bytes(b"e")   # accuracy snapshot
    newest = run / "deit_3.ckpt"
    newest.write_bytes(b"c")
    newest_post = run / "deit_post_4.ckpt"
    newest_post.write_bytes(b"d")
    os.utime(run / "deit_1.ckpt", (1, 1))
    os.utime(run / "deit_post_0.ckpt", (1, 1))
    os.utime(newest, (2, 2))
    os.utime(newest_post, (3, 3))
    os.utime(run / "deit_best.ckpt", (9, 9))     # newest but not resumable
    # stage-1 relaunch resumes from the newest stage-1 epoch ckpt...
    assert find_resume_ckpt(str(tmp_path), "run") == str(newest)
    # ...while a --stage2 relaunch resumes the stage-2 run itself (never
    # the stage-1 ckpt: post_train restores a full stage-2 tree)
    assert find_resume_ckpt(str(tmp_path), "run", stage2=True) == \
        str(newest_post)
    assert find_resume_ckpt(str(tmp_path), "absent") is None
    # a dir holding only stage-2 ckpts offers no stage-1 resume
    post_only = tmp_path / "post_only"
    post_only.mkdir()
    (post_only / "deit_post_2.ckpt").write_bytes(b"x")
    assert find_resume_ckpt(str(tmp_path), "post_only") is None


def test_build_argv_injects_dist_and_resume(tmp_path):
    run = tmp_path / "cli_run"
    run.mkdir()
    ck = run / "m_2.ckpt"
    ck.write_bytes(b"x")
    env = {"SLURM_PROCID": "1", "SLURM_NTASKS": "2",
           "SLURM_JOB_NODELIST": "h[1-2]", "SLURM_RESTART_COUNT": "1"}
    argv = build_argv(["--output_dir", str(tmp_path),
                       "--name", "cli_run"], env)
    assert argv[argv.index("--coordinator") + 1] == "h1:12321"
    assert argv[argv.index("--process_id") + 1] == "1"
    assert argv[argv.index("--resume") + 1] == str(ck)
    # fresh (non-requeued) steps and explicit --resume are left alone
    fresh = build_argv(["--output_dir", str(tmp_path),
                        "--name", "cli_run"], dict(env,
                                                   SLURM_RESTART_COUNT="0"))
    assert "--resume" not in fresh
    explicit = build_argv(["--resume", "mine.ckpt"], env)
    assert explicit.count("--resume") == 1


def test_build_argv_probe_defaults_match_flags(tmp_path, monkeypatch):
    """The resume probe must look where the trainers actually write
    (flags.py defaults output_dir='output/uvc_train', name='debug')."""
    from uvc_tpu.cli import flags as flags_mod
    import argparse as ap
    p = ap.ArgumentParser()
    flags_mod.add_common_flags(p)
    defaults = {a.dest: a.default for a in p._actions}
    run = tmp_path / defaults["output_dir"] / defaults["name"]
    run.mkdir(parents=True)
    ck = run / "m_5.ckpt"
    ck.write_bytes(b"x")
    monkeypatch.chdir(tmp_path)
    env = {"SLURM_RESTART_COUNT": "1"}
    argv = build_argv([], env)   # no flags at all: pure defaults
    assert argv[argv.index("--resume") + 1] == str(
        os.path.join(defaults["output_dir"], defaults["name"], "m_5.ckpt"))


def test_build_argv_equals_form_not_overridden(tmp_path):
    run = tmp_path / "r"
    run.mkdir()
    (run / "m_1.ckpt").write_bytes(b"x")
    env = {"SLURM_PROCID": "0", "SLURM_NTASKS": "2",
           "SLURM_JOB_NODELIST": "h[1-2]", "SLURM_RESTART_COUNT": "1"}
    argv = build_argv([f"--output_dir={tmp_path}", "--name=r",
                       "--resume=mine.ckpt",
                       "--coordinator=10.0.0.5:1234"], env)
    # --flag=value forms count as explicit: nothing injected on top
    assert not any(a == "--resume" or a == "--coordinator" for a in argv)
    assert sum(a.startswith("--resume") for a in argv) == 1
    # and the probe still reads the equals-form output_dir/name
    argv2 = build_argv([f"--output_dir={tmp_path}", "--name=r"], env)
    assert argv2[argv2.index("--resume") + 1] == str(run / "m_1.ckpt")


def test_build_argv_reads_config_yaml(tmp_path):
    """output_dir/name set via -c config.yaml (parse_with_config) must
    be visible to the requeue-resume probe; explicit CLI still wins."""
    run = tmp_path / "yml_out" / "yml_run"
    run.mkdir(parents=True)
    (run / "m_7.ckpt").write_bytes(b"x")
    cfgf = tmp_path / "c.yaml"
    cfgf.write_text(f"output_dir: {tmp_path / 'yml_out'}\nname: yml_run\n")
    env = {"SLURM_RESTART_COUNT": "1"}
    argv = build_argv(["-c", str(cfgf)], env)
    assert argv[argv.index("--resume") + 1] == str(run / "m_7.ckpt")
    # CLI flag beats the config value (parse_with_config order)
    other = tmp_path / "yml_out" / "cli_run"
    other.mkdir()
    (other / "m_9.ckpt").write_bytes(b"y")
    argv = build_argv(["-c", str(cfgf), "--name", "cli_run"], env)
    assert argv[argv.index("--resume") + 1] == str(other / "m_9.ckpt")


def test_build_argv_stage2_resumes_post_ckpt(tmp_path):
    run = tmp_path / "s2"
    run.mkdir()
    (run / "m_3.ckpt").write_bytes(b"a")           # stage-1 ckpt
    post = run / "m_post_8.ckpt"
    post.write_bytes(b"b")
    env = {"SLURM_RESTART_COUNT": "1"}
    base = ["--output_dir", str(tmp_path), "--name", "s2"]
    argv = build_argv(base, env, stage2=True)
    assert argv[argv.index("--resume") + 1] == str(post)
    # stage-2 relaunch with no stage-2 ckpt yet: no injection (the run
    # restarts cleanly from --checkpoint_dir rather than restoring a
    # stage-1 tree through the stage-2 resume path)
    os.remove(post)
    assert "--resume" not in build_argv(base, env, stage2=True)


def test_main_routes_to_stage(monkeypatch):
    calls = {}
    import uvc_tpu.cli.joint_train as jt
    import uvc_tpu.cli.post_train as pt
    monkeypatch.setattr(jt, "main", lambda a: calls.setdefault("s1", a))
    monkeypatch.setattr(pt, "main", lambda a: calls.setdefault("s2", a))
    main(["--name", "x"])
    main(["--stage2", "--checkpoint_dir", "d"])
    assert calls["s1"] == ["--name", "x"]
    assert calls["s2"] == ["--checkpoint_dir", "d"]
