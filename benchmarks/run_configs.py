"""Parity/benchmark harness: the five BASELINE.json configurations.

Maps each reference configuration to this framework's CLI invocation.
With --dry_run (default when the dataset root is missing) it prints the
commands; otherwise it executes them sequentially and collects results.

  python -m benchmarks.run_configs --ycb_root /path/ycb \
      --lm_root /path/Linemod_preprocessed --ckpt_root runs [--run]
"""
from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys

LM_OBJECTS = ("ape", "benchvise", "cam", "can", "cat", "driller", "duck",
              "eggbox", "glue", "holepuncher", "iron", "lamp", "phone")


def build_configs(ycb_root: str, lm_root: str, ckpt_root: str):
    """The five BASELINE.json configs as CLI commands."""
    py = [sys.executable, "-m"]
    cfgs = []
    # 1. LineMOD ape single-object eval (pretrained checkpoint).
    cfgs.append(("lm_ape_eval_pretrained", py + [
        "pvn3d_tpu.apps.evaluate", "--dataset", "linemod", "--cls", "ape",
        "--data_root", lm_root,
        "--checkpoint_dir", f"{ckpt_root}/lm_ape"]))
    # 2. LineMOD full 13-object train+eval (renders/fuse synthesis pkls
    #    are read by the dataset when present).
    for obj in LM_OBJECTS:
        cfgs.append((f"lm_{obj}_train", py + [
            "pvn3d_tpu.apps.train", "--dataset", "linemod", "--cls", obj,
            "--data_root", lm_root,
            "--checkpoint_dir", f"{ckpt_root}/lm_{obj}"]))
        cfgs.append((f"lm_{obj}_eval", py + [
            "pvn3d_tpu.apps.evaluate", "--dataset", "linemod", "--cls", obj,
            "--data_root", lm_root,
            "--checkpoint_dir", f"{ckpt_root}/lm_{obj}"]))
    # 3. YCB-Video 21-object multi-instance train+eval.
    cfgs.append(("ycb_train", py + [
        "pvn3d_tpu.apps.train", "--dataset", "ycb", "--data_root", ycb_root,
        "--checkpoint_dir", f"{ckpt_root}/ycb"]))
    cfgs.append(("ycb_eval", py + [
        "pvn3d_tpu.apps.evaluate", "--dataset", "ycb",
        "--data_root", ycb_root, "--checkpoint_dir", f"{ckpt_root}/ycb"]))
    # 4. ICP-refined evaluation on YCB-Video.
    cfgs.append(("ycb_eval_icp", py + [
        "pvn3d_tpu.apps.evaluate", "--dataset", "ycb",
        "--data_root", ycb_root, "--checkpoint_dir", f"{ckpt_root}/ycb",
        "--icp"]))
    # 5. Multi-host data-parallel YCB training (sharded clustering runs in
    #    the same jitted program).
    cfgs.append(("ycb_train_multihost", py + [
        "pvn3d_tpu.apps.train", "--dataset", "ycb", "--data_root", ycb_root,
        "--checkpoint_dir", f"{ckpt_root}/ycb_mh", "--distributed"]))
    return cfgs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ycb_root", default="/data/ycb")
    p.add_argument("--lm_root", default="/data/Linemod_preprocessed")
    p.add_argument("--ckpt_root", default="runs")
    p.add_argument("--run", action="store_true",
                   help="execute instead of printing")
    p.add_argument("--only", default="",
                   help="comma-separated config-name filter")
    args = p.parse_args(argv)
    cfgs = build_configs(args.ycb_root, args.lm_root, args.ckpt_root)
    if args.only:
        keep = set(args.only.split(","))
        cfgs = [c for c in cfgs if c[0] in keep]
    for name, cmd in cfgs:
        line = " ".join(shlex.quote(c) for c in cmd)
        if not args.run:
            print(f"[{name}] {line}")
            continue
        print(f"=== {name} ===", flush=True)
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
