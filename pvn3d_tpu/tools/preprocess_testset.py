"""Pack a test split into .npz shards for fast evaluation.

Capability match for the reference's offline testset preprocessors
(pvn3d/datasets/{ycb,linemod}/preprocess_testset.py), which pickle the
per-frame tuples so eval skips the PCL/depth-completion cost (YCB training
even blocks until that pickle exists, train_ycb_pvn3d.py:419-423).  Here
frames pack into compressed npz shards of whole batches, loadable with
``iter_packed_batches`` — no pickle, no torch.

  python -m pvn3d_tpu.tools.preprocess_testset --dataset ycb \
      --data_root /path/ycb --out packed/ycb_test --shard_size 64
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from pvn3d_tpu.data.frame import collate


def pack_dataset(dataset, out_dir: str, shard_size: int = 64,
                 max_frames: int = 0, workers: int = 0) -> int:
    os.makedirs(out_dir, exist_ok=True)
    buf, shard, n = [], 0, 0

    def flush():
        nonlocal buf, shard
        if not buf:
            return
        batch = collate(buf)
        np.savez_compressed(
            os.path.join(out_dir, f"shard_{shard:05d}.npz"), **batch)
        buf = []
        shard += 1

    if workers > 0:
        import multiprocessing.pool
        pool = multiprocessing.pool.ThreadPool(workers)
        stream = pool.imap(dataset.__getitem__, range(len(dataset)))
    else:
        stream = (dataset[i] for i in range(len(dataset)))
    for sample in stream:
        if sample is None:
            continue
        buf.append(sample)
        n += 1
        if len(buf) == shard_size:
            flush()
        if max_frames and n >= max_frames:
            break
    flush()
    return n


def iter_packed_batches(out_dir: str, batch_size: int = 0):
    """Yield batch dicts from packed shards (re-batched if requested)."""
    for path in sorted(glob.glob(os.path.join(out_dir, "shard_*.npz"))):
        with np.load(path) as z:
            shard = {k: z[k] for k in z.files}
        n = len(next(iter(shard.values())))
        if not batch_size or batch_size >= n:
            yield shard
        else:
            for s in range(0, n - batch_size + 1, batch_size):
                yield {k: v[s:s + batch_size] for k, v in shard.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=("ycb", "linemod"), default="ycb")
    p.add_argument("--cls", default="ape")
    p.add_argument("--data_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--shard_size", type=int, default=64)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--no_fill_depth", action="store_true")
    args = p.parse_args(argv)
    if args.dataset == "ycb":
        from pvn3d_tpu.data.ycb import YCBDataset
        ds = YCBDataset(args.data_root, split="test",
                        fill_depth=not args.no_fill_depth)
    else:
        from pvn3d_tpu.data.linemod import LineMODDataset
        ds = LineMODDataset(args.data_root, cls_type=args.cls, split="test")
    n = pack_dataset(ds, args.out, shard_size=args.shard_size,
                     max_frames=args.max_frames, workers=args.workers)
    print(f"packed {n} frames into {args.out}")


if __name__ == "__main__":
    main()
