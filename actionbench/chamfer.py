"""Chamfer metrics (host scipy KDTree, matching the reference exactly).

Counterpart of reference actionbench/chamfer.py:12-86. The reference's
chamfer is CPU scipy even in the CUDA repo; we keep that (it is not on the
device-compute critical path — ICP is, see icp.py).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import KDTree


def compute_chamfer_score(
    pred: np.ndarray,
    gt: np.ndarray,
    n: int = 10_000,
    seed: int = 44,
) -> float:
    """Symmetric chamfer (sum of both directional means), subsampled to n."""
    pred = np.asarray(pred, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    rng_pred = np.random.RandomState(seed=seed)
    rng_gt = np.random.RandomState(seed=seed + 1)

    if 0 < n < len(pred):
        indices_pred = rng_pred.permutation(len(pred))[:n]
    else:
        indices_pred = np.arange(len(pred))
    if 0 < n < len(gt):
        indices_gt = rng_gt.permutation(len(gt))[:n]
    else:
        indices_gt = np.arange(len(gt))

    tree_pred = KDTree(pred)
    d1, _ = tree_pred.query(gt[indices_gt])
    gt_to_pred = np.mean(d1)

    tree_gt = KDTree(gt)
    d2, _ = tree_gt.query(pred[indices_pred])
    pred_to_gt = np.mean(d2)

    return float(gt_to_pred + pred_to_gt)


def compute_motion_chamfer_score(
    preds: np.ndarray,
    gts: np.ndarray,
) -> float:
    """Motion chamfer: match indices on frame 0, average tracked L2 over T."""
    preds = np.asarray(preds, dtype=np.float64)
    gts = np.asarray(gts, dtype=np.float64)
    assert preds.shape[0] == gts.shape[0], "Mismatching number of timesteps"

    tree_pred = KDTree(preds[0])
    _, idx_gt_to_pred = tree_pred.query(gts[0])
    tree_gt = KDTree(gts[0])
    _, idx_pred_to_gt = tree_gt.query(preds[0])

    diff1 = preds[:, idx_gt_to_pred, :] - gts
    d1 = np.linalg.norm(diff1, axis=-1).mean(axis=0)
    diff2 = gts[:, idx_pred_to_gt, :] - preds
    d2 = np.linalg.norm(diff2, axis=-1).mean(axis=0)

    return float(np.mean(d1) + np.mean(d2))
