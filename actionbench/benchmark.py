"""ActionBench metrics core: CD-3D / CD-4D / CD-Motion.

Counterpart of reference actionbench/benchmark.py:17-153:
  * CD-3D — per-frame gradient ICP, then mean chamfer over frames.
  * CD-4D — single first-frame ICP applied to all frames.
  * CD-M  — motion chamfer on synchronized barycentric samples.
ICP runs batched+jitted on device (icp.py); chamfer is host KDTree.
"""

from __future__ import annotations

import logging

import numpy as np

from actionbench.chamfer import (
    compute_chamfer_score,
    compute_motion_chamfer_score,
)
from actionbench.icp import Transform, gradient_icp
from actionbench.sample_mesh import sample_meshes
from actionbench.sample_point_cloud import sample_point_cloud
from actionmesh_tpu.io.mesh import Mesh

logger = logging.getLogger(__name__)


def _compute_per_frame_icp(
    gt_pc: np.ndarray, pred_pc: np.ndarray, n_iter: int = 200
) -> list[Transform]:
    n_ts = gt_pc.shape[0]
    transforms = []
    for k in range(n_ts):
        transforms.append(
            gradient_icp(pc_gt=gt_pc[k], pc_pred=pred_pc[k], lr=0.01, n_iter=n_iter)
        )
        logger.debug("ICP per-frame %d/%d", k + 1, n_ts)
    return transforms


def _compute_unified_icp(
    gt_pc: np.ndarray, pred_pc: np.ndarray, n_iter: int = 200
) -> Transform:
    return gradient_icp(pc_gt=gt_pc[0], pc_pred=pred_pc[0], lr=0.01, n_iter=n_iter)


def compute_chamfer_3d_4d(
    gt_pc: np.ndarray,
    pred_meshes: list[Mesh],
    device: str = "tpu",  # accepted for API parity; jax picks the backend
    is_4D: bool = False,
    n_pts_icp: int = 10_000,
    n_pts_chamfer: int = 100_000,
    seed: int = 44,
    icp_iters: int = 200,
) -> tuple[float, float, float]:
    """Returns (cd_3d, cd_4d, cd_motion); cd_motion is 0.0 unless is_4D."""
    del device
    n_ts = len(pred_meshes)
    gt_pc = np.asarray(gt_pc, np.float32)

    pred_pc = sample_meshes(
        pred_meshes, n_pts=n_pts_chamfer, synchronized=False, seed=seed
    )
    pred_pc_icp = sample_point_cloud(pred_pc, n_pts=n_pts_icp, seed=seed)
    gt_pc_icp = sample_point_cloud(gt_pc, n_pts=n_pts_icp, seed=seed)

    icp_list = _compute_per_frame_icp(gt_pc_icp, pred_pc_icp, n_iter=icp_iters)
    icp_transforms_3d = Transform.stack(*icp_list)
    icp_transform_u4d = _compute_unified_icp(gt_pc_icp, pred_pc_icp, n_iter=icp_iters)

    pred_aligned_3d = icp_transforms_3d.transform_points(pred_pc)
    pred_aligned_u4d = icp_transform_u4d.transform_points(pred_pc)

    cd_3d = float(
        np.mean(
            [
                compute_chamfer_score(gt=gt_pc[k], pred=pred_aligned_3d[k])
                for k in range(n_ts)
            ]
        )
    )
    cd_4d = float(
        np.mean(
            [
                compute_chamfer_score(gt=gt_pc[k], pred=pred_aligned_u4d[k])
                for k in range(n_ts)
            ]
        )
    )

    cd_motion = 0.0
    if is_4D:
        pred_pc_4d = sample_meshes(
            pred_meshes, n_pts=n_pts_chamfer, synchronized=True, seed=seed
        )
        pred_aligned_4d = icp_transform_u4d.transform_points(pred_pc_4d)
        cd_motion = compute_motion_chamfer_score(
            preds=pred_aligned_4d, gts=gt_pc
        )

    return cd_3d, cd_4d, cd_motion
