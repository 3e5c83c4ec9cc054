"""Gradient ICP in JAX: rigid + anisotropic-scale alignment.

TPU-native counterpart of reference actionbench/icp.py:18-112 (pytorch3d +
Adam, CUDA chamfer). All 24 canonical rotation initializations optimize as
one batched jitted optax Adam loop; the symmetric chamfer loss is a
chunked pairwise-min (flash-style, no (N, M) matrix resident) that XLA maps
onto the MXU as distance matmuls.

Returns an affine Transform (s * p @ R + T, row-vector convention like
pytorch3d Transform3d) selecting the best rotation basin.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax


def euler_angles_to_matrix_xyz(angles: np.ndarray) -> np.ndarray:
    """pytorch3d euler_angles_to_matrix with convention='XYZ'.

    R = X(a0) @ Y(a1) @ Z(a2), each the standard axis rotation.
    """

    def rx(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    return np.stack(
        [rx(a[0]) @ ry(a[1]) @ rz(a[2]) for a in angles]
    )


def canonical_rotation_matrices() -> np.ndarray:
    """24 axis-aligned orientation inits (reference icp.py:18-49)."""
    deg = np.pi / 180
    azim = np.array(
        [0] * 4 + [90] * 4 + [180] * 4 + [270] * 4 + [0] * 4 + [90] * 4,
        dtype=np.float64,
    ) * deg
    elev = np.array(
        [0] * 16 + [90] * 2 + [-90] * 2 + [90] * 2 + [-90] * 2,
        dtype=np.float64,
    ) * deg
    roll = np.array(
        [0, 90, 180, 270] * 4 + [0, 90] * 4, dtype=np.float64
    ) * deg
    return euler_angles_to_matrix_xyz(np.stack([azim, elev, roll], axis=-1))


def rotation_6d_to_matrix(r6d: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt 6D rotation parameterization (Zhou et al.)."""
    a1 = r6d[..., :3]
    a2 = r6d[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def _nn_indices(x: jnp.ndarray, y: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """For each x point, the argmin-distance index into y. No gradient.

    x (R, N, 3), y (R, M, 3) -> (R, N) int32. On TPU this is the Pallas
    fused distance+argmin kernel (ops/nn_argmin.py) — the XLA formulation
    below materializes every (chunk, M) distance block in HBM and is
    ~10-16x slower at eval shapes; it remains the CPU/test path.
    """
    if jax.default_backend() == "tpu":
        from actionmesh_tpu.ops.nn_argmin import nn_argmin

        return nn_argmin(x, y)
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    y_sq = jnp.sum(y * y, axis=-1)  # (R, M)

    def body(carry, x_chunk):
        x_sq = jnp.sum(x_chunk * x_chunk, axis=-1)  # (R, C)
        cross = jnp.einsum(
            "rcd,rmd->rcm", x_chunk, y, preferred_element_type=jnp.float32
        )
        d = x_sq[..., None] - 2.0 * cross + y_sq[:, None, :]
        return carry, jnp.argmin(d, axis=-1).astype(jnp.int32)  # (R, C)

    R, N, _ = x.shape
    pad = (-N) % chunk
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    xc = jnp.moveaxis(xp.reshape(R, -1, chunk, 3), 1, 0)
    _, idx = jax.lax.scan(body, None, xc)
    return jnp.moveaxis(idx, 0, 1).reshape(R, -1)[:, :N]


@dataclasses.dataclass
class Transform:
    """Affine transform p' = s * p @ R + T (row-vector convention)."""

    R: np.ndarray  # (K, 3, 3)
    T: np.ndarray  # (K, 3)
    s: np.ndarray  # (K, 3)

    def transform_points(self, points: np.ndarray) -> np.ndarray:
        """points (K|1, N, 3) or (N, 3) -> transformed, batched over K."""
        points = np.asarray(points, np.float64)
        if points.ndim == 2:
            points = points[None]
        K = len(self.R)
        if points.shape[0] == 1 and K > 1:
            points = np.broadcast_to(points, (K,) + points.shape[1:])
        elif points.shape[0] != K and K == 1:
            return np.einsum(
                "tnd,de->tne", self.s[0] * points, self.R[0]
            ) + self.T[0]
        return (
            np.einsum("knd,kde->kne", self.s[:, None, :] * points, self.R)
            + self.T[:, None, :]
        )

    @staticmethod
    def stack(*transforms: "Transform") -> "Transform":
        return Transform(
            R=np.concatenate([t.R for t in transforms]),
            T=np.concatenate([t.T for t in transforms]),
            s=np.concatenate([t.s for t in transforms]),
        )


def _make_icp_carry(n_problems: int, n_rots: int, lr: float):
    """Initial (params, opt_state, best_loss, best) optimization carry."""
    R = n_problems * n_rots
    params = {
        "T": jnp.zeros((R, 3)),
        "r6d": jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0, 1.0, 0.0]]), (R, 1)),
        "s": jnp.ones((R, 3)),
    }
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    best0 = {
        "R": jnp.tile(jnp.eye(3)[None], (n_problems, 1, 1)),
        "T": jnp.zeros((n_problems, 3)),
        "s": jnp.ones((n_problems, 3)),
    }
    return params, opt.init(params), jnp.full((n_problems,), jnp.inf), best0


@functools.partial(
    jax.jit, static_argnames=("n_rounds", "lr", "nn_every", "nn_chunk")
)
def _icp_optimize(
    pc_pred: jnp.ndarray,
    pc_gt: jnp.ndarray,
    r_init: jnp.ndarray,
    carry,
    lr: float = 0.01,
    n_rounds: int = 25,
    nn_every: int = 1,
    nn_chunk: int = 2048,
):
    """Batched Adam over (translation, 6D rotation, scale).

    Jointly optimizes K independent alignment problems x n_rots rotation
    inits as ONE flattened batch of K*n_rots transforms (pc_pred/pc_gt are
    (K, N, 3) / (K, M, 3)). Batching the problems matters: one 24-init
    problem underutilizes the chip — its per-round work is dispatch-bound —
    so the evaluator's 16 per-frame ICPs run ~4x faster fused than
    sequentially. The best transform is tracked PER problem.

    Classic ICP structure for TPU efficiency: nearest-neighbor
    correspondences refresh every ``nn_every`` Adam steps (the O(N*M)
    distance/argmin pass is VPU-bound and dominates; per-step refresh as in
    the reference's pytorch3d chamfer is ~nn_every x slower for near-
    identical convergence at lr=0.01).

    Runs ``n_rounds`` refresh rounds and returns the updated carry, so the
    host can chain segments — one long program (>~150 rounds) exceeds the
    axon TPU worker's single-launch budget and kills the worker.
    """
    K = pc_pred.shape[0]
    n_rots = r_init.shape[0]
    R = K * n_rots
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

    # (K, N, 3) -> (K*n_rots, N, 3): each problem repeated for its inits
    pred_b = jnp.broadcast_to(
        pc_pred[:, None], (K, n_rots) + pc_pred.shape[1:]
    ).reshape(R, *pc_pred.shape[1:])
    gt_b = jnp.broadcast_to(
        pc_gt[:, None], (K, n_rots) + pc_gt.shape[1:]
    ).reshape(R, *pc_gt.shape[1:])
    r_init_b = jnp.tile(r_init, (K, 1, 1))

    def rotations(p):
        return jnp.einsum(
            "kij,kjl->kil", r_init_b, rotation_6d_to_matrix(p["r6d"])
        )

    def transform(p, R_, pts):
        return p["s"][:, None, :] * pts @ R_ + p["T"][:, None, :]

    def loss_fn(p, nn_ab_gt, pred_ba):
        # Both correspondence gathers are hoisted OUT of the Adam loop
        # (indices are frozen within a round, gt/pred are constants, and the
        # transform is pointwise — transforming the pre-gathered pred subset
        # equals gathering the transformed cloud). This removes the
        # per-step (R, N, 3) gather and, critically, its scatter-add
        # backward, which dominated the fused step.
        R_ = rotations(p)
        moved = transform(p, R_, pred_b)
        moved_ba = transform(p, R_, pred_ba)
        losses = jnp.mean(
            jnp.sum(jnp.square(moved - nn_ab_gt), -1), -1
        ) + jnp.mean(jnp.sum(jnp.square(gt_b - moved_ba), -1), -1)
        return jnp.sum(losses), (losses, R_)

    def round_fn(carry, _):
        params, opt_state, best_loss, best = carry
        # refresh correspondences at the current transform (no gradient)
        p_ng = jax.tree.map(jax.lax.stop_gradient, params)
        moved = transform(p_ng, rotations(p_ng), pred_b)
        idx_ab = _nn_indices(moved, gt_b, chunk=nn_chunk)
        idx_ba = _nn_indices(gt_b, moved, chunk=nn_chunk)
        nn_ab_gt = jnp.take_along_axis(gt_b, idx_ab[..., None], axis=1)
        pred_ba = jnp.take_along_axis(pred_b, idx_ba[..., None], axis=1)

        def adam_step(c, _):
            params, opt_state, best_loss, best = c
            (_, (losses, R_)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, nn_ab_gt, pred_ba)
            updates, opt_state = opt.update(grads, opt_state)
            new_params = optax.apply_updates(params, updates)
            losses_k = losses.reshape(K, n_rots)
            min_loss = jnp.min(losses_k, axis=1)  # (K,)
            arg = jnp.argmin(losses_k, axis=1) + jnp.arange(K) * n_rots
            improved = min_loss < best_loss  # (K,)

            def pick(new, old):
                m = improved.reshape((K,) + (1,) * (old.ndim - 1))
                return jnp.where(m, new, old)

            # reference parity (ref:actionbench/icp.py:97-106): the clone
            # happens AFTER opt.step(), so T/s are the POST-update
            # parameters while R (a pre-step composed tensor) is pre-step
            best = jax.tree.map(
                pick,
                {"R": R_[arg], "T": new_params["T"][arg],
                 "s": new_params["s"][arg]},
                best,
            )
            best_loss = jnp.minimum(best_loss, min_loss)
            return (new_params, opt_state, best_loss, best), None

        carry, _ = jax.lax.scan(
            adam_step, (params, opt_state, best_loss, best), None,
            length=nn_every,
        )
        return carry, None

    return jax.lax.scan(round_fn, carry, None, length=n_rounds)[0]


def gradient_icp_multi(
    pc_pred: np.ndarray,
    pc_gt: np.ndarray,
    lr: float = 0.01,
    n_iter: int = 200,
    nn_every: int = 1,
    rounds_per_launch: int = 25,
) -> Transform:
    """Best rigid+scale alignment for K independent problems in one fused
    device loop (24 rotation inits each). pc_pred (K, N, 3), pc_gt (K, M, 3).

    The Adam loop runs in segments of ``rounds_per_launch`` refresh rounds
    (chained carries, mathematically one loop) to bound per-launch device
    time — see _icp_optimize.
    """
    assert pc_pred.ndim == 3 and pc_gt.ndim == 3 and len(pc_pred) == len(pc_gt)
    K = len(pc_pred)
    r_init = jnp.asarray(canonical_rotation_matrices(), jnp.float32)
    n_rots = r_init.shape[0]
    pred = jnp.asarray(pc_pred, jnp.float32)
    gt = jnp.asarray(pc_gt, jnp.float32)
    carry = _make_icp_carry(K, n_rots, lr)
    # keep the (K*n_rots, chunk, M) fp32 distance block ~<2 GB regardless of K
    nn_chunk = max(128, (2048 // K) // 128 * 128)
    # keep per-launch device time roughly constant as K grows
    seg_rounds = max(1, min(rounds_per_launch, rounds_per_launch * 4 // K))
    # exactly n_iter Adam iterations (reference contract): full rounds of
    # nn_every steps, plus one shorter final round for the remainder —
    # ceil alone would overshoot to nn_every * ceil(n_iter/nn_every)
    rounds_total, rem_steps = divmod(n_iter, nn_every)
    done = 0
    while done < rounds_total:
        seg = min(seg_rounds, rounds_total - done)
        carry = _icp_optimize(
            pred, gt, r_init, carry, lr=lr, n_rounds=seg,
            nn_every=nn_every, nn_chunk=nn_chunk,
        )
        done += seg
    if rem_steps:
        carry = _icp_optimize(
            pred, gt, r_init, carry, lr=lr, n_rounds=1,
            nn_every=rem_steps, nn_chunk=nn_chunk,
        )
    best = carry[3]
    return Transform(
        R=np.asarray(best["R"], np.float64),
        T=np.asarray(best["T"], np.float64),
        s=np.asarray(best["s"], np.float64),
    )


def gradient_icp(
    pc_pred: np.ndarray,
    pc_gt: np.ndarray,
    lr: float = 0.01,
    n_iter: int = 200,
    nn_every: int = 1,
    rounds_per_launch: int = 25,
) -> Transform:
    """Best rigid+scale alignment of pc_pred onto pc_gt over 24 rotation
    inits (single-problem wrapper around gradient_icp_multi)."""
    return gradient_icp_multi(
        pc_pred[None], pc_gt[None], lr=lr, n_iter=n_iter,
        nn_every=nn_every, rounds_per_launch=rounds_per_launch,
    )
