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

    x (R, N, 3), y (R, M, 3) -> (R, N) int32. Chunked over x so the (N, M)
    distance matrix is never resident (and never saved for backward).
    """
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


def _chamfer_mean_sq(
    a: jnp.ndarray, b: jnp.ndarray, chunk: int = 2048
) -> jnp.ndarray:
    """Per-batch symmetric mean squared chamfer (pytorch3d convention).

    NN indices found under stop_gradient; the loss differentiates through
    the gathered pairs — the same gradient autodiff of min() yields (the
    argmin pair) at a fraction of the backward cost.
    """

    def one_direction(x, y):
        idx = _nn_indices(x, y, chunk=chunk)
        nn = jnp.take_along_axis(y, idx[..., None], axis=1)
        return jnp.mean(jnp.sum(jnp.square(x - nn), axis=-1), axis=-1)

    return one_direction(a, b) + one_direction(b, a)


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


def _make_icp_carry(n_rots: int, lr: float):
    """Initial (params, opt_state, best_loss, best) optimization carry."""
    params = {
        "T": jnp.zeros((n_rots, 3)),
        "r6d": jnp.tile(
            jnp.array([[1.0, 0.0, 0.0, 0.0, 1.0, 0.0]]), (n_rots, 1)
        ),
        "s": jnp.ones((n_rots, 3)),
    }
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    best0 = {"R": jnp.eye(3), "T": jnp.zeros(3), "s": jnp.ones(3)}
    return params, opt.init(params), jnp.asarray(jnp.inf), best0


@functools.partial(jax.jit, static_argnames=("n_rounds", "lr", "nn_every"))
def _icp_optimize(
    pc_pred: jnp.ndarray,
    pc_gt: jnp.ndarray,
    r_init: jnp.ndarray,
    carry,
    lr: float = 0.01,
    n_rounds: int = 25,
    nn_every: int = 4,
):
    """Batched Adam over (translation, 6D rotation, scale) per init.

    Classic ICP structure for TPU efficiency: nearest-neighbor
    correspondences refresh every ``nn_every`` Adam steps (the O(N*M)
    distance/argmin pass is VPU-bound and dominates; per-step refresh as in
    the reference's pytorch3d chamfer is ~nn_every x slower for near-
    identical convergence at lr=0.01).

    Runs ``n_rounds`` refresh rounds and returns the updated carry, so the
    host can chain segments — one long program (>~150 rounds) exceeds the
    axon TPU worker's single-launch budget and kills the worker.
    """
    n_rots = r_init.shape[0]
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

    pred_b = jnp.broadcast_to(pc_pred[None], (n_rots,) + pc_pred.shape)
    gt_b = jnp.broadcast_to(pc_gt[None], (n_rots,) + pc_gt.shape)

    def move(p):
        R = jnp.einsum("kij,kjl->kil", r_init, rotation_6d_to_matrix(p["r6d"]))
        return p["s"][:, None, :] * pred_b @ R + p["T"][:, None, :], R

    def loss_fn(p, idx_ab, idx_ba):
        moved, R = move(p)
        nn_ab = jnp.take_along_axis(gt_b, idx_ab[..., None], axis=1)
        nn_ba = jnp.take_along_axis(moved, idx_ba[..., None], axis=1)
        losses = jnp.mean(
            jnp.sum(jnp.square(moved - nn_ab), -1), -1
        ) + jnp.mean(jnp.sum(jnp.square(gt_b - nn_ba), -1), -1)
        return jnp.sum(losses), (losses, R)

    def round_fn(carry, _):
        params, opt_state, best_loss, best = carry
        # refresh correspondences at the current transform (no gradient)
        moved, _ = move(jax.tree.map(jax.lax.stop_gradient, params))
        idx_ab = _nn_indices(moved, gt_b)
        idx_ba = _nn_indices(gt_b, moved)

        def adam_step(c, _):
            params, opt_state, best_loss, best = c
            (_, (losses, R)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, idx_ab, idx_ba)
            updates, opt_state = opt.update(grads, opt_state)
            new_params = optax.apply_updates(params, updates)
            min_loss = jnp.min(losses)
            k = jnp.argmin(losses)
            improved = min_loss < best_loss
            best = jax.tree.map(
                lambda new, old: jnp.where(improved, new, old),
                {"R": R[k], "T": params["T"][k], "s": params["s"][k]},
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


def gradient_icp(
    pc_pred: np.ndarray,
    pc_gt: np.ndarray,
    lr: float = 0.01,
    n_iter: int = 200,
    nn_every: int = 4,
    rounds_per_launch: int = 25,
) -> Transform:
    """Best rigid+scale alignment of pc_pred onto pc_gt over 24 rotation inits.

    The Adam loop runs in segments of ``rounds_per_launch`` refresh rounds
    (chained carries, mathematically one loop) to bound per-launch device
    time — see _icp_optimize.
    """
    r_init = jnp.asarray(canonical_rotation_matrices(), jnp.float32)
    pred = jnp.asarray(pc_pred, jnp.float32)
    gt = jnp.asarray(pc_gt, jnp.float32)
    carry = _make_icp_carry(r_init.shape[0], lr)
    rounds_total = -(-n_iter // nn_every)
    done = 0
    while done < rounds_total:
        seg = min(rounds_per_launch, rounds_total - done)
        carry = _icp_optimize(
            pred, gt, r_init, carry, lr=lr, n_rounds=seg, nn_every=nn_every
        )
        done += seg
    best = carry[3]
    return Transform(
        R=np.asarray(best["R"], np.float64)[None],
        T=np.asarray(best["T"], np.float64)[None],
        s=np.asarray(best["s"], np.float64)[None],
    )
