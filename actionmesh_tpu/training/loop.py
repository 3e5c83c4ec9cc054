"""Training driver: optimizer schedule, step loop, logging, checkpoint cadence.

Ties together the SPMD step builders (training/flow_train.py,
training/decoder_train.py), the async input pipeline (training/data.py) and
train-state checkpointing (training/checkpoint.py) into a resumable loop —
the subsystem the inference-only reference never needed (SURVEY.md §4) but a
complete framework does.

Loop structure is TPU-idiomatic: the jitted step is dispatched without
waiting on the previous loss (losses are fetched only at ``log_every``
boundaries), so device compute, host-side batch assembly and the host→HBM
transfer of the *next* batch (DevicePrefetcher) all overlap; the only
synchronization points are log lines and checkpoints.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import optax

from actionmesh_tpu.models.autoencoder import AutoencoderConfig, init_autoencoder
from actionmesh_tpu.models.denoiser import DenoiserConfig, init_denoiser
from actionmesh_tpu.parallel.mesh import (
    autoencoder_param_shardings,
    batch_sharding,
    denoiser_param_shardings,
    shard_params,
)
from actionmesh_tpu.training.checkpoint import restore_train_state, save_train_state
from actionmesh_tpu.training.data import DevicePrefetcher
from actionmesh_tpu.training.decoder_train import make_decoder_train_step
from actionmesh_tpu.training.flow_train import (
    init_train_state,
    make_train_step,
)


@dataclass(frozen=True)
class TrainLoopConfig:
    """Hyperparameters of the outer loop (model architecture lives in the
    DenoiserConfig/AutoencoderConfig passed alongside)."""

    total_steps: int = 1000
    peak_lr: float = 1e-4
    warmup_steps: int = 100
    final_lr_ratio: float = 0.1  # cosine decays peak_lr -> peak_lr * ratio
    clip_norm: float = 1.0
    weight_decay: float = 0.01
    ema_decay: Optional[float] = 0.999
    p_uncond: float = 0.1  # CFG context dropout (flow stage only)
    shift: float = 3.0  # sigma-schedule shift (flow stage only)
    compute_dtype: Optional[str] = None  # None = fp32; "bfloat16" for TPU
    seed: int = 0
    log_every: int = 10
    ckpt_every: int = 500
    out_dir: str = "train_out"
    resume: bool = True

    def __post_init__(self):
        if self.total_steps < 1:
            raise ValueError(f"total_steps={self.total_steps} must be >= 1")
        if self.warmup_steps >= self.total_steps:
            raise ValueError(
                f"warmup_steps={self.warmup_steps} must be < "
                f"total_steps={self.total_steps}"
            )


def make_optimizer(cfg: TrainLoopConfig) -> optax.GradientTransformation:
    """Global-norm clip -> AdamW on a linear-warmup + cosine-decay schedule."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.peak_lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=cfg.total_steps,
        end_value=cfg.peak_lr * cfg.final_lr_ratio,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def _compute_dtype(cfg: TrainLoopConfig):
    if cfg.compute_dtype is None:
        return None
    return jnp.dtype(cfg.compute_dtype)


def _latest_ckpt(out_dir: Path) -> Optional[Path]:
    path = out_dir / "ckpt_latest.npz"
    return path if path.exists() else None


def _save_ckpt(state, out_dir: Path) -> Path:
    """Atomic checkpoint write: tmp file + rename, so a crash mid-write
    never corrupts the resume point."""
    out_dir.mkdir(parents=True, exist_ok=True)
    final = out_dir / "ckpt_latest.npz"
    tmp = out_dir / ".ckpt_tmp.npz"
    save_train_state(state, tmp)
    os.replace(tmp, final)
    return final


def _run_loop(
    state: dict,
    step_fn: Callable,
    batches: Iterator[dict],
    cfg: TrainLoopConfig,
    *,
    needs_key: bool,
    mesh=None,
    on_log: Optional[Callable[[dict], None]] = None,
) -> tuple[dict, list[dict]]:
    """Shared inner loop: prefetch, step, log JSONL, checkpoint, resume-aware."""
    out_dir = Path(cfg.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    log_path = out_dir / "log.jsonl"
    root_key = jax.random.key(cfg.seed)

    start = int(state["step"])
    history: list[dict] = []
    sharding = batch_sharding(mesh) if mesh is not None else None
    prefetch = DevicePrefetcher(batches, sharding=sharding)
    pending: list[tuple[int, jax.Array]] = []  # unsynced (step, loss) pairs
    t0 = time.perf_counter()

    def flush() -> None:
        nonlocal t0
        if not pending:
            return
        records = [
            {"step": s, "loss": float(l), "stage_steps_per_s": None}
            for s, l in pending
        ]
        dt = time.perf_counter() - t0
        rate = len(records) / dt if dt > 0 else None
        for rec in records:
            rec["stage_steps_per_s"] = rate
        with log_path.open("a") as fh:
            for rec in records:
                fh.write(json.dumps(rec) + "\n")
                history.append(rec)
                if on_log is not None:
                    on_log(rec)
        pending.clear()
        t0 = time.perf_counter()

    try:
        for step in range(start, cfg.total_steps):
            try:
                batch = next(prefetch)
            except StopIteration:
                break  # finite dataset exhausted: checkpoint and return
            if needs_key:
                state, loss = step_fn(state, batch, jax.random.fold_in(root_key, step))
            else:
                state, loss = step_fn(state, batch)
            pending.append((step + 1, loss))
            if (step + 1) % cfg.log_every == 0:
                flush()
            if cfg.ckpt_every and (step + 1) % cfg.ckpt_every == 0:
                flush()
                _save_ckpt(state, out_dir)
    finally:
        prefetch.close()
    flush()
    _save_ckpt(state, out_dir)
    return state, history


def run_flow_training(
    model_cfg: DenoiserConfig,
    batches: Iterator[dict],
    cfg: TrainLoopConfig,
    *,
    mesh=None,
    params=None,
    attn_impl: str = "auto_train",
    on_log: Optional[Callable[[dict], None]] = None,
) -> tuple[dict, list[dict]]:
    """Train the Stage-I denoiser with the rectified-flow objective.

    ``batches`` yields host dicts in the training/data.flow_batches layout;
    with ``mesh`` given, params/moments shard Megatron-style and the batch
    shards over dp — the same layouts the inference stack and
    MULTICHIP_AUDIT certify. Resumes from ``out_dir/ckpt_latest.npz`` when
    present (cfg.resume). Returns (final state, loss history).
    """
    if params is None:
        params = init_denoiser(jax.random.key(cfg.seed), model_cfg)
    shardings = None
    if mesh is not None:
        shardings = denoiser_param_shardings(params, mesh)
        params = shard_params(params, shardings)
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer, shardings, ema_decay=cfg.ema_decay)
    ckpt = _latest_ckpt(Path(cfg.out_dir)) if cfg.resume else None
    if ckpt is not None:
        state = restore_train_state(ckpt, state)
    step_fn = make_train_step(
        model_cfg,
        optimizer,
        p_uncond=cfg.p_uncond,
        shift=cfg.shift,
        attn_impl=attn_impl,
        mesh=mesh,
        compute_dtype=_compute_dtype(cfg),
        ema_decay=cfg.ema_decay,
    )
    return _run_loop(
        state, step_fn, batches, cfg, needs_key=True, mesh=mesh, on_log=on_log
    )


def run_decoder_training(
    model_cfg: AutoencoderConfig,
    batches: Iterator[dict],
    cfg: TrainLoopConfig,
    *,
    mesh=None,
    params=None,
    attn_impl: str = "auto_train",
    on_log: Optional[Callable[[dict], None]] = None,
) -> tuple[dict, list[dict]]:
    """Train the Stage-II decoder with masked position MSE (same loop/IO
    contract as run_flow_training; batches use the
    training/decoder_train.decoder_loss layout)."""
    if params is None:
        params = init_autoencoder(jax.random.key(cfg.seed), model_cfg)
    shardings = None
    if mesh is not None:
        shardings = autoencoder_param_shardings(params, mesh)
        params = shard_params(params, shardings)
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer, shardings, ema_decay=None)
    ckpt = _latest_ckpt(Path(cfg.out_dir)) if cfg.resume else None
    if ckpt is not None:
        state = restore_train_state(ckpt, state)
    step_fn = make_decoder_train_step(
        model_cfg,
        optimizer,
        attn_impl=attn_impl,
        mesh=mesh,
        compute_dtype=_compute_dtype(cfg),
    )
    return _run_loop(
        state, step_fn, batches, cfg, needs_key=False, mesh=mesh, on_log=on_log
    )
