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


def test_find_resume_ckpt_skips_stage2(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    (run / "deit_1.ckpt").write_bytes(b"a")
    (run / "deit_post_0.ckpt").write_bytes(b"b")
    newest = run / "deit_3.ckpt"
    newest.write_bytes(b"c")
    os.utime(run / "deit_1.ckpt", (1, 1))
    os.utime(newest, (2, 2))
    assert find_resume_ckpt(str(tmp_path), "run") == str(newest)
    assert find_resume_ckpt(str(tmp_path), "absent") is None


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
