"""In-situ A/B of forward-kernel batch groups on the stage-1 step (VERDICT
r4 #5): the fused fwd kernels were tuned under f+b remat constraints; the
teacher forward (utils/losses.py:47-49 in the reference — pure overhead UVC
pays every step) runs the same kernels fwd-only, so a larger batch group
unconstrained by backward-accumulator pressure is the one kernel lever not
yet A/B'd in situ.

Method: per-variant subprocess runs of scripts/tpu_attrib.py with
UVC_ATTRIB_ROWS=full,noteacher (only in-program deltas are trustworthy —
standalone teacher_fwd rows carry pipeline-bubble inflation).  The forced
group applies to the student's initial fwd AND the teacher fwd — both are
fwd-kernel applications, which is exactly the lever under test.  A Mosaic
VMEM rejection is recorded as a failed variant, not an error.

Adopt a variant only if the full-step win exceeds 3%; otherwise this
artifact is the measured-worse ledger entry.

Usage:  timeout 3600 python scripts/tpu_teacher_ab.py --out ATTRIB_r05.json
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))

VARIANTS = [
    # (name, env overrides)  — g=8 attn fwd at D=384 measured 16.07M scoped
    # vmem in r3 (68K over); re-tried here in situ for the record.  mlp fwd
    # g=4 at Small estimates 16.4M by the budget model — expected to fail,
    # but the budget model is conservative (hence the A/B).
    ("default", {}),
    ("mlp_fwd_g4", {"UVC_MLP_FWD_G": "4"}),
    ("attn_fwd_g8", {"UVC_ATTN_FWD_G": "8"}),
]


def run_variant(model, name, env_over, timeout_s):
    out = tempfile.mktemp(suffix=f"_{name}.json")
    env = dict(os.environ)
    env["UVC_ATTRIB_ROWS"] = "full,noteacher"
    env.update(env_over)
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "tpu_attrib.py"), model,
         "--out", out],
        env=env, capture_output=True, text=True, timeout=timeout_s)
    wall = round(time.time() - t0, 1)
    row = {"env": env_over, "wall_s": wall, "rc": p.returncode}
    try:
        if p.returncode == 0 and os.path.exists(out):
            data = json.load(open(out))
            per = data["models"][model]
            row.update(full_ms=per.get("full"),
                       noteacher_ms=per.get("noteacher"))
            if "full" in per and "noteacher" in per:
                row["teacher_in_step_ms"] = round(
                    per["full"] - per["noteacher"], 2)
        else:
            tail = (p.stdout + p.stderr).strip().splitlines()[-12:]
            row["fail_tail"] = "\n".join(tail)
    except Exception as e:           # unreadable/format-drifted output:
        row["fail_tail"] = f"output parse failed: {e!r}"
    finally:
        if os.path.exists(out):
            os.unlink(out)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="small")
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=int, default=1200)
    opts = ap.parse_args()

    rows = {}
    for name, env_over in VARIANTS:
        print(f"--- variant {name} {env_over} ---", flush=True)
        try:
            rows[name] = run_variant(opts.model, name, env_over, opts.timeout)
        except subprocess.TimeoutExpired:
            rows[name] = {"env": env_over, "rc": "timeout",
                          "fail_tail": f"killed at {opts.timeout}s"}
        print(json.dumps(rows[name], indent=1), flush=True)

    ran = {n: r["full_ms"] for n, r in rows.items() if r.get("full_ms")}
    base = ran.get("default")
    if not ran:
        verdict = "no variant ran"
    elif base is None:
        # a transient wedge can kill just the first subprocess — say so
        # instead of pretending nothing ran (the variants data is real)
        verdict = (f"default variant failed; forced-group rows ran "
                   f"({', '.join(f'{n}={v:.2f}ms' for n, v in ran.items())})"
                   f" — rerun for a comparison, no adoption either way")
    else:
        best = min((v, n) for n, v in ran.items())
        win = (base - best[0]) / base
        verdict = (f"best={best[1]} full={best[0]:.2f}ms "
                   f"({win * 100:+.1f}% vs default) — "
                   + ("ADOPT (>3% win)" if best[1] != "default"
                      and win > 0.03 else "defaults stand"))
    print("verdict:", verdict, flush=True)

    if opts.out:
        json.dump({
            "harness": "tpu_teacher_ab",
            "model": opts.model,
            "rows_env": "UVC_ATTRIB_ROWS=full,noteacher",
            "note": ("in-situ fwd-kernel batch-group A/B (VERDICT r4 #5): "
                     "teacher_in_step = full - noteacher; forced groups "
                     "apply to both fwd applications (student initial fwd "
                     "+ teacher fwd)"),
            "variants": rows,
            "verdict": verdict,
        }, open(opts.out, "w"), indent=1)
        print(f"wrote {opts.out}")


if __name__ == "__main__":
    main()
