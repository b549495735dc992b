"""Run every pending on-chip measurement and dump one JSON report.

The TPU tunnel was down for the entire second half of round 2; this
script is the one-command path for the queued measurements the moment a
chip is reachable:

  1. ball-query kernel ladder        (query_bench: pallas vs approx)
  2. fused 3-NN kernel ladder        (fp_bench: fused vs XLA)
  3. pipeline A/Bs                   (bench.py: default / --query_mode
                                      pallas / --resize_method lerp /
                                      --resize_method matmul_packed /
                                      --sparse_cnn)
  4. sensor-to-pose raw pipeline     (raw_pipeline_bench — includes the
                                      min/max-network medians in the
                                      on-chip fill)
  5. train-step throughput           (train_bench: built vs raw)
  6. stage breakdown                 (stage_breakdown)

  python -m benchmarks.chip_queue [--out /tmp/chip_report.json]

Each section runs in a subprocess so one failure cannot sink the rest;
stdout/stderr tails are captured into the report.  After reviewing the
numbers: flip ``auto`` in ops/grouping.py to the pallas kernel if it
wins, set CNNConfig.resize_method / sparse defaults likewise, and
refresh README/CLAUDE.md perf tables.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

SECTIONS = [
    ("query_kernel", [sys.executable, "-m", "benchmarks.query_bench",
                      "--iters", "50"]),
    ("fp_kernel", [sys.executable, "-m", "benchmarks.fp_bench",
                   "--iters", "50"]),
    ("bench_default", [sys.executable, "bench.py"]),
    ("bench_pallas", [sys.executable, "bench.py", "--query_mode", "pallas"]),
    ("bench_lerp", [sys.executable, "bench.py", "--resize_method", "lerp"]),
    ("bench_packed", [sys.executable, "bench.py",
                      "--resize_method", "matmul_packed"]),
    ("bench_dense_cnn", [sys.executable, "bench.py", "--dense_cnn"]),
    ("bench_batch2", [sys.executable, "bench.py", "--batch", "2"]),
    ("bench_batch4", [sys.executable, "bench.py", "--batch", "4"]),
    ("raw_pipeline", [sys.executable, "-m",
                      "benchmarks.raw_pipeline_bench"]),
    ("train_steps", [sys.executable, "-m", "benchmarks.train_bench",
                     "--batch", "4", "--steps", "20"]),
    ("train_bs24_accum", [sys.executable, "-m", "benchmarks.train_bench",
                          "--batch", "24", "--grad_accum", "6",
                          "--steps", "5", "--skip_raw"]),
    ("stage_breakdown", [sys.executable, "-m",
                         "benchmarks.stage_breakdown"]),
    ("stage_breakdown_b4", [sys.executable, "-m",
                            "benchmarks.stage_breakdown", "--batch", "4"]),
    ("pn2_breakdown", [sys.executable, "-m", "benchmarks.pn2_breakdown",
                       "--iters", "100"]),
    ("cnn_breakdown", [sys.executable, "-m", "benchmarks.cnn_breakdown",
                       "--iters", "50"]),
    ("pose_breakdown", [sys.executable, "-m", "benchmarks.pose_breakdown",
                        "--iters", "200"]),
    ("icp_stages", [sys.executable, "-m", "benchmarks.stage_breakdown",
                    "--stages", "icp_sampled", "icp_fullres"]),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/chip_report.json")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-section seconds (first compiles are slow)")
    ap.add_argument("--only", default="",
                    help="comma-separated section names to run")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    report = {}
    for name, cmd in SECTIONS:
        if only and name not in only:
            continue
        t0 = time.time()
        print(f"=== {name}: {' '.join(cmd)}", flush=True)
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout)
            tail = (r.stdout + r.stderr).strip().splitlines()[-12:]
            report[name] = {"ok": r.returncode == 0,
                            "seconds": round(time.time() - t0, 1),
                            "tail": tail}
        except subprocess.TimeoutExpired as e:
            # Keep the partial output — after burning a chip-up window
            # the report must show where the section stalled.
            partial = ((e.stdout or b"").decode(errors="replace")
                       + (e.stderr or b"").decode(errors="replace"))
            report[name] = {"ok": False, "seconds": args.timeout,
                            "tail": (["TIMEOUT"]
                                     + partial.strip().splitlines()[-12:])}
        print("\n".join(report[name]["tail"]), flush=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print(f"report: {args.out}")


if __name__ == "__main__":
    main()
