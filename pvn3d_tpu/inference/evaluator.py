"""Pose-accuracy evaluation: on-device frame metrics + host accumulator.

Replaces the reference's TorchEval (pvn3d/lib/utils/pvn3d_eval_utils.py:
239-343): the per-frame ADD/ADD-S computations are one batched XLA program
(no thread pool, no GPU<->CPU ping-pong); the accumulated distance lists are
summarized host-side with the exact VOCap AUC / 0.1-diameter protocols.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pvn3d_tpu import config as C
from pvn3d_tpu.geometry.metrics import add_accuracy_at, cal_add, cal_adds, cal_auc


@functools.partial(jax.jit, static_argnames=("chunk",))
def eval_frame_metrics(poses: jnp.ndarray, gt_cls_ids: jnp.ndarray,
                       gt_rts: jnp.ndarray, mesh_pts: jnp.ndarray,
                       mesh_valid: jnp.ndarray, chunk: int = 512):
    """ADD / ADD-S of every GT instance of one frame.

    Reference: eval_metric (pvn3d_eval_utils.py:113-137) — the pred pose is
    gathered by class id (zeros when the class was never predicted; that
    gather semantics lives in the poses array itself).

    Args:
      poses: (n_cls, 3, 4) predicted per-class poses.
      gt_cls_ids: (I,) int32 GT instance classes (0 = empty slot).
      gt_rts: (I, 3, 4) GT poses.
      mesh_pts: (n_cls, M, 3) padded per-class mesh clouds.
      mesh_valid: (n_cls, M) validity of mesh points.

    Returns:
      add (I,), adds (I,) float32 distances (garbage at empty slots).
    """
    def per_instance(cls_id, gt_rt):
        pred = poses[cls_id]
        pts = mesh_pts[cls_id]
        msk = mesh_valid[cls_id]
        return (cal_add(pred, gt_rt, pts, msk),
                cal_adds(pred, gt_rt, pts, msk, chunk=chunk))

    return jax.vmap(per_instance)(gt_cls_ids.astype(jnp.int32), gt_rts)


class PoseEvaluator:
    """Host-side accumulator of per-class distance lists -> AUC summaries.

    Mirrors TorchEval (pvn3d_eval_utils.py:239-343): class 0 accumulates all
    instances (the PoseCNN "all objects" row); symmetric classes use ADD-S
    for the ADD(-S) column.
    """

    def __init__(self, n_cls: int = 22,
                 sym_cls_ids: Optional[Sequence[int]] = None,
                 ds_type: str = "ycb"):
        self.n_cls = n_cls
        self.ds_type = ds_type
        if sym_cls_ids is None:
            sym_cls_ids = (C.YCB_SYM_CLS_IDS if ds_type == "ycb"
                           else C.LM_SYM_CLS_IDS)
        self.sym_cls_ids = set(int(s) for s in sym_cls_ids)
        self.cls_add_dis = [[] for _ in range(n_cls)]
        self.cls_adds_dis = [[] for _ in range(n_cls)]

    def add_frame(self, gt_cls_ids: np.ndarray, add: np.ndarray,
                  adds: np.ndarray) -> None:
        """Accumulate one frame's instance distances (0-slots skipped)."""
        for cls_id, a, s in zip(np.asarray(gt_cls_ids).ravel(),
                                np.asarray(add).ravel(),
                                np.asarray(adds).ravel()):
            cls_id = int(cls_id)
            if cls_id <= 0:
                continue
            self.cls_add_dis[cls_id].append(float(a))
            self.cls_adds_dis[cls_id].append(float(s))
            self.cls_add_dis[0].append(float(a))
            self.cls_adds_dis[0].append(float(s))

    def _add_s_dis(self, cls_id: int):
        return (self.cls_adds_dis[cls_id] if cls_id in self.sym_cls_ids
                else self.cls_add_dis[cls_id])

    def summarize(self, verbose: bool = False) -> Dict:
        """YCB protocol: per-class + PoseCNN all-object AUCs
        (reference: TorchEval.cal_auc, pvn3d_eval_utils.py:249-296)."""
        add_s_all = []
        per_class = {}
        for cls_id in range(1, self.n_cls):
            add_s = self._add_s_dis(cls_id)
            add_s_all += add_s
            per_class[cls_id] = {
                "add_auc": cal_auc(self.cls_add_dis[cls_id]),
                "adds_auc": cal_auc(self.cls_adds_dis[cls_id]),
                "add_s_auc": cal_auc(add_s),
                "n": len(self.cls_add_dis[cls_id]),
            }
        # Means over classes that actually appeared: subset evals (e.g.
        # --max_frames smokes) must not drag the mean down with AUC-0
        # entries for never-seen classes.
        seen = [v for v in per_class.values() if v["n"] > 0]
        if not seen:
            seen = [{"add_auc": 0.0, "adds_auc": 0.0, "add_s_auc": 0.0}]
        summary = {
            "per_class": per_class,
            "mean_add_auc": float(np.mean([v["add_auc"] for v in seen])),
            "mean_adds_auc": float(np.mean([v["adds_auc"] for v in seen])),
            "mean_add_s_auc": float(np.mean(
                [v["add_s_auc"] for v in seen])),
            "all_add_auc": cal_auc(self.cls_add_dis[0]),
            "all_adds_auc": cal_auc(self.cls_adds_dis[0]),
            "all_add_s_auc": cal_auc(add_s_all),
        }
        if verbose:
            names = C.YCB_CLASSES if self.ds_type == "ycb" else None
            for cls_id, v in per_class.items():
                name = names[cls_id - 1] if names else str(cls_id)
                print(f"{name}: add {v['add_auc']:.2f} "
                      f"adds {v['adds_auc']:.2f} add(-s) {v['add_s_auc']:.2f}")
            print(f"All (PoseCNN): add {summary['all_add_auc']:.2f} "
                  f"adds {summary['all_adds_auc']:.2f} "
                  f"add(-s) {summary['all_add_s_auc']:.2f}")
        return summary

    def summarize_linemod(self, obj_id: int,
                          diameter_m: Optional[float] = None,
                          verbose: bool = False) -> Dict:
        """LineMOD protocol: AUC + ADD(-S) < 0.1 * diameter percentage
        (reference: TorchEval.cal_lm_add, pvn3d_eval_utils.py:298-343)."""
        if diameter_m is None:
            from pvn3d_tpu.utils.assets import lm_diameters
            diameter_m = lm_diameters()[obj_id] / 1000.0
        thresh = diameter_m * 0.1
        add = self.cls_add_dis[obj_id]
        adds = self.cls_adds_dis[obj_id]
        add_s = self._add_s_dis(obj_id)
        summary = {
            "obj_id": obj_id,
            "add_auc": cal_auc(add),
            "adds_auc": cal_auc(adds),
            "add_s_auc": cal_auc(add_s),
            "add_0.1d": add_accuracy_at(add, thresh),
            "adds_0.1d": add_accuracy_at(adds, thresh),
            "add_s_0.1d": add_accuracy_at(add_s, thresh),
            "n": len(add),
        }
        if verbose:
            print(f"obj {obj_id}: add auc {summary['add_auc']:.2f} "
                  f"add<0.1d {summary['add_0.1d']:.2f} "
                  f"adds<0.1d {summary['adds_0.1d']:.2f}")
        return summary
