"""Timestep-keyed state banks for the autoregressive window loop.

TPU-native counterpart of the reference banks
(reference: actionmesh/model/utils/storage.py:21-262). Timestep keys are
host-side floats (window selection is host logic that produces static jit
shapes); latent payloads stay device arrays so the AR loop never round-trips
latents through host memory. Missing timesteps yield a zero latent and
mask=0 — this drives the inpainting-style conditioning mask in Stage I.
"""

from __future__ import annotations

import logging
from typing import Generic, Optional, Sequence, TypeVar

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

T = TypeVar("T")

_EPS = 1e-5


class TimestepIndexedStorage(Generic[T]):
    """Base: items keyed by float timestep with epsilon matching."""

    def __init__(self, verbose: bool = False, tag: str = ""):
        self.items: list[T] = []
        self.timesteps: list[float] = []
        self.verbose = verbose
        self.tag = tag

    @property
    def n_timesteps(self) -> int:
        return len(self.timesteps)

    def get_timestep_index(self, timestep: float, eps: float = _EPS) -> Optional[int]:
        for index, ts in enumerate(self.timesteps):
            if abs(ts - timestep) < eps:
                return index
        return None

    def _update_one(self, timestep: float, item: T, replace: bool = False):
        index = self.get_timestep_index(timestep)
        if index is None:
            self.timesteps.append(timestep)
            self.items.append(item)
            return True, False
        elif replace:
            self.items[index] = item
            return False, True
        return False, False

    def _log_updates(self, added: list[float], replaced: list[float]) -> None:
        if self.verbose:
            name = self.__class__.__name__.upper()
            prefix = f"{name} {self.tag}" if self.tag else name
            if added:
                logger.info("[%s] Added timesteps %s", prefix, added)
            if replaced:
                logger.info("[%s] Replaced timesteps %s", prefix, replaced)

    def get_ordered_timesteps(self) -> np.ndarray:
        order = sorted(range(len(self.timesteps)), key=lambda i: self.timesteps[i])
        return np.array([self.timesteps[i] for i in order], dtype=np.float32)

    def _get_ordered_indices(self) -> list[int]:
        return sorted(range(len(self.timesteps)), key=lambda i: self.timesteps[i])


class LatentBank(TimestepIndexedStorage[jnp.ndarray]):
    """Device-resident latent storage keyed by timestep."""

    def __init__(
        self,
        empty_dims: tuple[int, ...] = (768, 64),
        verbose: bool = False,
        tag: str = "",
    ):
        super().__init__(verbose=verbose, tag=tag)
        self.empty_dims = tuple(empty_dims)

    def _get_empty_item(self) -> jnp.ndarray:
        return jnp.zeros(self.empty_dims, dtype=jnp.float32)

    def update(
        self,
        timesteps: np.ndarray,
        latents: jnp.ndarray,
        replace: bool = False,
    ) -> None:
        """Store latents (any leading shape reshaping to (N, *empty_dims))."""
        ts = np.asarray(timesteps).reshape(-1)
        n = ts.shape[0]
        latents = latents.reshape((n,) + self.empty_dims)
        added, replaced = [], []
        for i in range(n):
            was_added, was_replaced = self._update_one(
                float(ts[i]), latents[i], replace=replace
            )
            if was_added:
                added.append(float(ts[i]))
            if was_replaced:
                replaced.append(float(ts[i]))
        self._log_updates(added, replaced)

    def get(
        self, timesteps: np.ndarray, add_batch_dim: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Fetch latents + presence mask for the given timesteps.

        Returns (latents (N, *dims), mask (N,) int32) or batched variants.
        """
        ts = np.asarray(timesteps).reshape(-1)
        latents, masks = [], []
        for t in ts:
            index = self.get_timestep_index(float(t))
            if index is None:
                latents.append(self._get_empty_item())
                masks.append(0)
            else:
                latents.append(self.items[index])
                masks.append(1)
        latents_out = jnp.stack(latents)
        masks_out = jnp.asarray(masks, dtype=jnp.int32)
        if add_batch_dim:
            return latents_out[None], masks_out[None]
        return latents_out, masks_out

    def get_ordered(self) -> tuple[jnp.ndarray, np.ndarray]:
        order = self._get_ordered_indices()
        latents = jnp.stack([self.items[i] for i in order])
        ts = np.array([self.timesteps[i] for i in order], dtype=np.float32)
        return latents, ts


class MeshBank(TimestepIndexedStorage):
    """Host-side mesh storage keyed by timestep (meshes live on host)."""

    def _get_empty_item(self):
        return None

    def update(self, timesteps: np.ndarray, meshes: Sequence, replace: bool = False):
        ts = np.asarray(timesteps).reshape(-1)
        assert ts.shape[0] == len(meshes)
        added, replaced = [], []
        for i in range(ts.shape[0]):
            was_added, was_replaced = self._update_one(
                float(ts[i]), meshes[i], replace=replace
            )
            if was_added:
                added.append(float(ts[i]))
            if was_replaced:
                replaced.append(float(ts[i]))
        self._log_updates(added, replaced)

    def get(self, timesteps: np.ndarray) -> list:
        ts = np.asarray(timesteps).reshape(-1)
        out = []
        for t in ts:
            index = self.get_timestep_index(float(t))
            out.append(self.items[index] if index is not None else None)
        return out

    def get_ordered(self) -> tuple[list, np.ndarray]:
        order = self._get_ordered_indices()
        meshes = [self.items[i] for i in order]
        ts = np.array([self.timesteps[i] for i in order], dtype=np.float32)
        return meshes, ts
