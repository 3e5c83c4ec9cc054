"""Train-state checkpointing: save/resume the full optimizer state.

The reference's "checkpoints" are pretrained inference weights only
(SURVEY.md §5 — it has no training, hence nothing resumable). Training
introduces state beyond params (Adam moments, step count) whose pytree
contains optax namedtuples, which the flat dotted-key npz format
(utils/weights.save_params) cannot round-trip structurally. This module
serializes the *leaves* in canonical ``jax.tree`` order and rebuilds
against a structurally-identical template state — the same
template-driven restore pattern orbax uses, kept dependency-light.

Sharded restore: each leaf is placed back with the template leaf's
sharding, so resuming on a dp x tp mesh re-shards the moments without a
host-side replicated intermediate.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def save_train_state(state, path: str | Path) -> None:
    """Serialize every leaf of the train state (params, optimizer moments,
    step) to one npz, in canonical tree-flatten order."""
    leaves = jax.tree.leaves(state)
    np.savez(
        path, **{f"leaf_{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    )


def restore_train_state(path: str | Path, template) -> dict:
    """Rebuild a train state from ``save_train_state`` output.

    ``template`` is a structurally-identical state (e.g. freshly built by
    ``init_train_state`` with the same model config and optimizer); its
    treedef supplies the structure and its leaf shardings the placement.
    Shape mismatches raise with the offending leaf index and shapes.
    """
    with np.load(path) as archive:
        stored = [archive[k] for k in sorted(archive.files)]
    t_leaves, treedef = jax.tree.flatten(template)
    if len(stored) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(stored)} leaves, template has "
            f"{len(t_leaves)} — model config or optimizer changed"
        )
    restored = []
    for i, (saved, ref) in enumerate(zip(stored, t_leaves)):
        ref_shape = tuple(getattr(ref, "shape", ()))
        if tuple(saved.shape) != ref_shape:
            raise ValueError(
                f"leaf {i}: checkpoint shape {tuple(saved.shape)} != "
                f"template shape {ref_shape}"
            )
        arr = jnp.asarray(saved, dtype=getattr(ref, "dtype", None))
        sharding = getattr(ref, "sharding", None)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        restored.append(arr)
    return jax.tree.unflatten(treedef, restored)
