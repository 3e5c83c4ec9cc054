"""Temporal point-cloud subsampling (single shared permutation).

Counterpart of reference actionbench/sample_point_cloud.py:11-36.
"""

from __future__ import annotations

import numpy as np


def sample_point_cloud(
    point_cloud: np.ndarray, n_pts: int, seed: int = 44
) -> np.ndarray:
    """(T, N, C) -> (T, n_pts, C) using one permutation across all frames."""
    n_pts_src = point_cloud.shape[1]
    if n_pts_src <= n_pts:
        return point_cloud
    rng = np.random.RandomState(seed=seed)
    indices = rng.permutation(n_pts_src)[:n_pts]
    return point_cloud[:, indices]
