"""ActionBench metrics core: CD-3D / CD-4D / CD-Motion.

Counterpart of reference actionbench/benchmark.py:17-153:
  * CD-3D — per-frame gradient ICP, then mean chamfer over frames.
  * CD-4D — single first-frame ICP applied to all frames.
  * CD-M  — motion chamfer on synchronized barycentric samples.
ICP runs batched+jitted on device (icp.py); chamfer is host KDTree.
"""

from __future__ import annotations


import numpy as np

from actionbench.chamfer import (
    compute_chamfer_score,
    compute_motion_chamfer_score,
)
from actionbench.icp import Transform, gradient_icp_multi
from actionbench.sample_mesh import sample_meshes
from actionbench.sample_point_cloud import sample_point_cloud
from actionmesh_tpu.io.mesh import Mesh


def _compute_per_frame_icp(
    gt_pc: np.ndarray, pred_pc: np.ndarray, n_iter: int = 200,
    nn_every: int = 1, lr: float = 0.01,
) -> Transform:
    """All T per-frame alignments fused into one batched device loop.

    One 24-init ICP underutilizes the chip (dispatch-bound); fusing the
    evaluator's T=16 problems into a single (T*24)-transform optimization
    is ~4x faster with identical per-problem math (actionbench/icp.py).

    ``nn_every=1`` (default) reproduces the reference's exact math (chamfer
    min differentiated every step, ref actionbench/icp.py:91-106). The
    stop-grad approximation (``nn_every=4``) converges measurably worse
    where ICP actually works — CD-Motion +156% on the synthetic rigid
    class — while saving no meaningful wall time, so exactness is the
    eval default (BENCH_NOTES r3e, full 128-sample A/B).
    """
    return gradient_icp_multi(
        pc_pred=pred_pc, pc_gt=gt_pc, lr=lr, n_iter=n_iter,
        nn_every=nn_every,
    )


def compute_chamfer_3d_4d(
    gt_pc: np.ndarray,
    pred_meshes: list[Mesh],
    device: str = "tpu",  # accepted for API parity; jax picks the backend
    is_4D: bool = False,
    n_pts_icp: int = 10_000,
    n_pts_chamfer: int = 100_000,
    seed: int = 44,
    icp_iters: int = 200,
    icp_nn_every: int = 1,
    icp_lr: float = 0.01,
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

    icp_transforms_3d = _compute_per_frame_icp(
        gt_pc_icp, pred_pc_icp, n_iter=icp_iters, nn_every=icp_nn_every,
        lr=icp_lr,
    )
    # The reference's "unified" ICP (benchmark.py:41-44) optimizes exactly
    # frame 0's (gt, pred) pair — deterministically identical to the
    # per-frame result for frame 0, so reuse it instead of recomputing.
    icp_transform_u4d = Transform(
        R=icp_transforms_3d.R[:1],
        T=icp_transforms_3d.T[:1],
        s=icp_transforms_3d.s[:1],
    )

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
