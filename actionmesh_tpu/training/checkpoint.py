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


def export_for_inference(
    state: dict,
    path: str | Path,
    *,
    stage: str = "flow",
    use_ema: bool = True,
    compute_dtype=jnp.bfloat16,
) -> Path:
    """Export a train state's params as a native inference checkpoint.

    Writes ``denoiser.npz`` (stage="flow") or ``autoencoder.npz``
    (stage="decoder") under ``path`` in the utils/weights.save_params
    layout, so ``ActionMeshPipeline.load_native(path)`` serves the trained
    model directly. Prefers the EMA shadow (the weights a diffusion
    sampler should run) when present; matmul weights cast to
    ``compute_dtype`` with norm scales left fp32, matching the inference
    storage convention (models/denoiser.init_denoiser).
    """
    from actionmesh_tpu.training.flow_train import cast_params_for_compute
    from actionmesh_tpu.utils.weights import save_params

    names = {
        "flow": "denoiser.npz",
        "decoder": "autoencoder.npz",
        # Stage-0 families (closed-loop Stage-0 extension: the trained
        # TripoSGPipeline loads these via utils/weights.load_params)
        "stage0_dit": "dit.npz",
        "stage0_vae": "vae.npz",
    }
    if stage not in names:
        raise ValueError(f"stage must be one of {sorted(names)}, got {stage!r}")
    params = state.get("ema_params") if use_ema else None
    if params is None:
        params = state["params"]
    if compute_dtype is not None:
        params = cast_params_for_compute(params, compute_dtype)
    out_dir = Path(path)
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / names[stage]
    save_params(params, out)
    return out


def save_train_state(state, path: str | Path) -> None:
    """Serialize every leaf of the train state (params, optimizer moments,
    step) to one npz, in canonical tree-flatten order."""
    flat = {}
    for i, leaf in enumerate(jax.tree.leaves(state)):
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:  # npz cannot represent bf16 natively
            flat[f"leaf_{i:05d}::bf16"] = arr.view(np.uint16)
        else:
            flat[f"leaf_{i:05d}"] = arr
    np.savez(path, **flat)


def restore_train_state(path: str | Path, template) -> dict:
    """Rebuild a train state from ``save_train_state`` output.

    ``template`` is a structurally-identical state (e.g. freshly built by
    ``init_train_state`` with the same model config and optimizer); its
    treedef supplies the structure and its leaf shardings the placement.
    Shape mismatches raise with the offending leaf index and shapes.
    """
    with np.load(path) as archive:
        stored = []
        for k in sorted(archive.files):
            arr = archive[k]
            if k.endswith("::bf16"):
                arr = arr.view(jnp.bfloat16)
            stored.append(arr)
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
