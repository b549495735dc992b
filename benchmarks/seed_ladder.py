"""Seed-replicate ladder for the query-mode training-arm decision.

Round 4 flipped ``query_mode="auto"`` to phase-aware (approx during
training, pallas at eval) on SINGLE 600-step runs per arm — then a
2000-step run of the default arm read 25.0 ADD-AUC against the arm's
38.85, exposing >10-AUC end-checkpoint spread on this synthetic metric.
This driver runs every training arm at N seeds (fresh world stream +
init per seed, identical across arms) and reports mean +/- spread, so
the default rests on replicated evidence instead of n=1 (VERDICT r4
next-round #2).

Arms (all eval through the pallas query — the production eval mode):
  approx  train approx  (the r1-r4 default-auto training mode)
  exact   train exact   (reference ball_query_gpu.cu:8-54 semantics)
  pallas  train pallas  (the arm the r4 ladder rejected)

Each run also records the ICP with/without AUC delta (--icp), so the
ladder doubles as the seed-replicated ICP efficacy measurement
(VERDICT r4 next-round #3).

  python -m benchmarks.seed_ladder [--seeds 1,2,3] [--steps 600]
        [--out /tmp/seed_ladder.json] [--arms approx,exact,pallas]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

ARMS = {
    "approx": [],
    "exact": ["--query_mode", "exact", "--eval_query_mode", "pallas"],
    "pallas": ["--query_mode", "pallas"],
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", default="1,2,3")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--arms", default="approx,exact,pallas")
    ap.add_argument("--no_icp", action="store_true")
    ap.add_argument("--out", default="/tmp/seed_ladder.json")
    ap.add_argument("--timeout", type=int, default=5400,
                    help="per-run seconds (600 steps feed host batches "
                         "through the dev tunnel at ~1-2 s/step)")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    arms = args.arms.split(",")

    # Resume: keep completed runs already recorded in --out (tunnel
    # outages kill multi-hour ladders; a restart must not repeat them).
    runs = []
    try:
        with open(args.out) as f:
            runs = [r for r in json.load(f).get("runs", [])
                    if r.get("ok")]
    except OSError:
        pass
    done = {(r["arm"], r["seed"]) for r in runs}
    if done:
        print(f"resuming; already done: {sorted(done)}", flush=True)
    for seed in seeds:
        for arm in arms:
            if (arm, seed) in done:
                continue
            cmd = [sys.executable, "-m", "benchmarks.synthetic_e2e",
                   "--steps", str(args.steps), "--seed", str(seed),
                   "--save_ckpt", f"/tmp/ladder_{arm}_s{seed}.pkl",
                   *ARMS[arm]]
            if not args.no_icp:
                cmd.append("--icp")
            t0 = time.time()
            print(f"=== {arm} seed={seed}: {' '.join(cmd)}", flush=True)
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=args.timeout)
                line = next((ln for ln in
                             reversed(r.stdout.strip().splitlines())
                             if ln.startswith("{")), None)
                rec = {"arm": arm, "seed": seed,
                       "seconds": round(time.time() - t0, 1),
                       "ok": r.returncode == 0 and line is not None}
                if line:
                    rec.update(json.loads(line))
                else:
                    rec["tail"] = (r.stdout + r.stderr).splitlines()[-6:]
            except subprocess.TimeoutExpired:
                rec = {"arm": arm, "seed": seed, "ok": False,
                       "seconds": args.timeout, "tail": ["TIMEOUT"]}
            runs.append(rec)
            print(json.dumps(rec), flush=True)
            _dump(args, runs)
    _dump(args, runs)
    print(f"report: {args.out}")


def _summary(runs):
    import numpy as np
    out = {}
    for arm in sorted({r["arm"] for r in runs}):
        vals = [r["add_auc"] for r in runs
                if r["arm"] == arm and r.get("ok") and "add_auc" in r]
        segs = [r["eval_seg_acc"] for r in runs
                if r["arm"] == arm and r.get("ok") and "eval_seg_acc" in r]
        icps = [r["icp"]["delta_add_auc"] for r in runs
                if r["arm"] == arm and r.get("ok") and "icp" in r]
        if vals:
            out[arm] = {
                "n": len(vals),
                "add_auc_mean": round(float(np.mean(vals)), 2),
                "add_auc_min": round(float(np.min(vals)), 2),
                "add_auc_max": round(float(np.max(vals)), 2),
                "seg_acc_mean": round(float(np.mean(segs)), 4),
                "runs": [round(v, 2) for v in vals],
            }
            if icps:
                out[arm]["icp_delta_add_auc_mean"] = round(
                    float(np.mean(icps)), 2)
                out[arm]["icp_delta_runs"] = [round(v, 2) for v in icps]
    return out


def _dump(args, runs):
    with open(args.out, "w") as f:
        json.dump({"runs": runs, "summary": _summary(runs),
                   "steps": args.steps}, f, indent=1)


if __name__ == "__main__":
    main()
