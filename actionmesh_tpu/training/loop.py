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
import logging
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

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class TrainLoopConfig:
    """Hyperparameters of the outer loop (model architecture lives in the
    DenoiserConfig/AutoencoderConfig passed alongside)."""

    total_steps: int = 1000  # micro-steps (batches consumed), see grad_accum
    peak_lr: float = 1e-4
    warmup_steps: int = 100
    final_lr_ratio: float = 0.1  # cosine decays peak_lr -> peak_lr * ratio
    clip_norm: float = 1.0
    weight_decay: float = 0.01
    grad_accum: int = 1  # optimizer updates every grad_accum micro-steps
    ema_decay: Optional[float] = 0.999  # per optimizer update (see make_*)
    p_uncond: float = 0.1  # CFG context dropout (flow stage only)
    shift: float = 3.0  # sigma-schedule shift (flow stage only)
    compute_dtype: Optional[str] = None  # None = fp32; "bfloat16" for TPU
    seed: int = 0
    log_every: int = 10
    ckpt_every: int = 500
    eval_every: int = 0  # 0 = no held-out evaluation
    # Also keep ckpt_best.npz, the state at the LOWEST held-out eval metric
    # (early-stopping export; the r4a closed loop measured the Stage-II
    # decoder overfitting past ~1k steps — motion CD degraded 25% between
    # the best-eval point and the final step).
    keep_best_eval: bool = False
    # Which eval-record key selects ckpt_best.npz. eval_fn may return a dict
    # of metrics (e.g. the decoder's chamfer-aware eval adds eval_cd /
    # eval_motion / eval_score); selection defaults to the plain eval loss.
    best_metric: str = "eval_loss"
    # Additionally keep ckpt_best_{key}.npz per listed metric key — lets one
    # training run export checkpoints selected by competing criteria (the
    # closed loop compares MSE-best vs chamfer-best decoder exports).
    track_best_metrics: tuple = ()
    out_dir: str = "train_out"
    resume: bool = True
    profile_steps: Optional[tuple[int, int]] = None  # [start, end) micro-steps
    profile_dir: Optional[str] = None  # default: out_dir/profile

    def __post_init__(self):
        if self.total_steps < 1:
            raise ValueError(f"total_steps={self.total_steps} must be >= 1")
        if self.warmup_steps >= self.total_steps:
            raise ValueError(
                f"warmup_steps={self.warmup_steps} must be < "
                f"total_steps={self.total_steps}"
            )
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum={self.grad_accum} must be >= 1")


def make_optimizer(cfg: TrainLoopConfig) -> optax.GradientTransformation:
    """Global-norm clip -> AdamW on a linear-warmup + cosine-decay schedule.

    With ``grad_accum`` > 1 the chain wraps in ``optax.MultiSteps``:
    gradients from ``grad_accum`` consecutive micro-batches average into
    one update, multiplying the effective batch size without growing the
    per-step activation footprint. The schedule then counts optimizer
    updates (``total_steps // grad_accum``), not micro-steps.
    """
    updates = max(1, cfg.total_steps // cfg.grad_accum)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.peak_lr,
        warmup_steps=min(cfg.warmup_steps, max(0, updates - 1)),
        decay_steps=updates,
        end_value=cfg.peak_lr * cfg.final_lr_ratio,
    )
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )
    if cfg.grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum)
    return opt


def _loop_ema_decay(cfg: TrainLoopConfig) -> Optional[float]:
    """Per-micro-step EMA decay such that the decay per optimizer update is
    exactly ``cfg.ema_decay`` regardless of grad_accum (the train step
    updates the EMA every micro-step)."""
    if cfg.ema_decay is None:
        return None
    return float(cfg.ema_decay ** (1.0 / cfg.grad_accum))


def _compute_dtype(cfg: TrainLoopConfig):
    if cfg.compute_dtype is None:
        return None
    return jnp.dtype(cfg.compute_dtype)


def _latest_ckpt(out_dir: Path) -> Optional[Path]:
    path = out_dir / "ckpt_latest.npz"
    return path if path.exists() else None


def _save_ckpt(state, out_dir: Path, name: str = "ckpt_latest.npz") -> Path:
    """Atomic checkpoint write: tmp file + rename, so a crash mid-write
    never corrupts the resume point."""
    out_dir.mkdir(parents=True, exist_ok=True)
    final = out_dir / name
    tmp = out_dir / f".{name}"  # hidden + still .npz (np.savez appends otherwise)
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
    eval_fn: Optional[Callable[[dict], float]] = None,
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

    last_eval = -1
    # best-eval state persists across resume: without the sidecar, a
    # restarted run starts from best_eval={} and the first (possibly
    # overfit, worse) post-resume eval overwrites ckpt_best.npz
    # (r5 review)
    best_path = out_dir / "best_eval.json"
    best_eval: dict[str, float] = {}
    if cfg.resume and best_path.exists():
        try:
            best_eval = {
                k: float(v) for k, v in json.loads(best_path.read_text()).items()
            }
        except (ValueError, OSError):
            logger.warning("could not parse %s; best-eval tracking resets",
                           best_path)

    def run_eval(step: int) -> None:
        nonlocal last_eval
        if step == last_eval:
            return
        last_eval = step
        flush()
        res = eval_fn(state)
        rec = {"step": step}
        rec.update(res if isinstance(res, dict) else {"eval_loss": res})
        if cfg.keep_best_eval:
            selectors = [(cfg.best_metric, "ckpt_best.npz")] + [
                (k, f"ckpt_best_{k}.npz")
                for k in cfg.track_best_metrics
                if k != cfg.best_metric
            ]
            for key, name in selectors:
                if key not in rec:
                    continue
                if rec[key] < best_eval.get(key, float("inf")):
                    best_eval[key] = rec[key]
                    _save_ckpt(state, out_dir, name=name)
                    tmp = out_dir / ".best_eval.json"
                    tmp.write_text(json.dumps(best_eval))
                    os.replace(tmp, best_path)
                    if key == cfg.best_metric:
                        rec["best"] = True
        with log_path.open("a") as fh:
            fh.write(json.dumps(rec) + "\n")
        history.append(rec)
        if on_log is not None:
            on_log(rec)

    profiling = False
    try:
        for step in range(start, cfg.total_steps):
            try:
                batch = next(prefetch)
            except StopIteration:
                break  # finite dataset exhausted: checkpoint and return
            if cfg.profile_steps and step == cfg.profile_steps[0]:
                jax.profiler.start_trace(
                    cfg.profile_dir or str(out_dir / "profile")
                )
                profiling = True
            if needs_key:
                state, loss = step_fn(state, batch, jax.random.fold_in(root_key, step))
            else:
                state, loss = step_fn(state, batch)
            if profiling and step + 1 >= cfg.profile_steps[1]:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                profiling = False
            pending.append((step + 1, loss))
            if (step + 1) % cfg.log_every == 0:
                flush()
            if eval_fn is not None and cfg.eval_every and (
                (step + 1) % cfg.eval_every == 0
            ):
                run_eval(step + 1)
            if cfg.ckpt_every and (step + 1) % cfg.ckpt_every == 0:
                flush()
                _save_ckpt(state, out_dir)
    finally:
        if profiling:
            jax.profiler.stop_trace()
        prefetch.close()
    flush()
    if eval_fn is not None and cfg.eval_every:
        run_eval(int(state["step"]))
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
    eval_batches: Optional[list[dict]] = None,
) -> tuple[dict, list[dict]]:
    """Train the Stage-I denoiser with the rectified-flow objective.

    ``batches`` yields host dicts in the training/data.flow_batches layout;
    with ``mesh`` given, params/moments shard Megatron-style and the batch
    shards over dp — the same layouts the inference stack and
    MULTICHIP_AUDIT certify. Resumes from ``out_dir/ckpt_latest.npz`` when
    present (cfg.resume). ``eval_batches`` (a fixed list of held-out host
    batches, evaluated every cfg.eval_every steps on the EMA weights when
    tracked, with deterministic noise/sigma draws and no CFG dropout) adds
    ``eval_loss`` records to the log. Returns (final state, loss history).
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
        ema_decay=_loop_ema_decay(cfg),
    )

    eval_fn = None
    if eval_batches:
        from actionmesh_tpu.training.flow_train import flow_matching_loss

        @jax.jit
        def eval_loss(eval_params, batch, key):
            return flow_matching_loss(
                eval_params,
                model_cfg,
                batch,
                key,
                p_uncond=0.0,
                shift=cfg.shift,
                attn_impl=attn_impl,
                mesh=mesh,
                remat=True,
                compute_dtype=_compute_dtype(cfg),
            )

        sharding = batch_sharding(mesh) if mesh is not None else None
        held_out = [
            jax.tree.map(
                lambda x: jax.device_put(x, sharding) if sharding else jnp.asarray(x),
                b,
            )
            for b in eval_batches
        ]
        eval_key = jax.random.key(cfg.seed + 1)

        def eval_fn(current_state: dict) -> float:
            eval_params = (
                current_state["ema_params"]
                if "ema_params" in current_state
                else current_state["params"]
            )
            losses = [
                eval_loss(eval_params, b, jax.random.fold_in(eval_key, i))
                for i, b in enumerate(held_out)
            ]
            return float(sum(float(l) for l in losses) / len(losses))

    return _run_loop(
        state,
        step_fn,
        batches,
        cfg,
        needs_key=True,
        mesh=mesh,
        on_log=on_log,
        eval_fn=eval_fn,
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
    eval_batches: Optional[list[dict]] = None,
    eval_chamfer: bool = False,
) -> tuple[dict, list[dict]]:
    """Train the Stage-II decoder with masked position MSE (same loop/IO
    contract as run_flow_training; batches use the
    training/decoder_train.decoder_loss layout).

    ``eval_chamfer`` adds chamfer-proxy metrics to every held-out eval
    record (eval_cd, eval_motion, and their sum eval_score — CD and CD-M
    carry equal weight on the reference leaderboard,
    ref:actionbench/README.md:63-69); combine with
    ``cfg.best_metric="eval_score"`` for chamfer-aware checkpoint
    selection."""
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

    eval_fn = None
    if eval_batches:
        from actionmesh_tpu.training.decoder_train import decoder_eval_metrics

        @jax.jit
        def eval_metrics(eval_params, batch):
            return decoder_eval_metrics(
                eval_params,
                model_cfg,
                batch,
                attn_impl=attn_impl,
                mesh=mesh,
                remat=True,
                compute_dtype=_compute_dtype(cfg),
                with_chamfer=eval_chamfer,
            )

        sharding = batch_sharding(mesh) if mesh is not None else None
        held_out = [
            jax.tree.map(
                lambda x: jax.device_put(x, sharding) if sharding else jnp.asarray(x),
                b,
            )
            for b in eval_batches
        ]

        def eval_fn(current_state: dict) -> dict:
            per_batch = [eval_metrics(current_state["params"], b) for b in held_out]
            out = {
                k: float(sum(float(m[k]) for m in per_batch) / len(per_batch))
                for k in per_batch[0]
            }
            if eval_chamfer:
                out["eval_score"] = out["eval_cd"] + out["eval_motion"]
            return out

    return _run_loop(
        state,
        step_fn,
        batches,
        cfg,
        needs_key=False,
        mesh=mesh,
        on_log=on_log,
        eval_fn=eval_fn,
    )


def run_vae_training(
    model_cfg,
    batches: Iterator[dict],
    cfg: TrainLoopConfig,
    *,
    params=None,
    kl_weight: float = 1e-4,
    attn_impl: str = "auto",
    on_log: Optional[Callable[[dict], None]] = None,
    eval_batches: Optional[list[dict]] = None,
) -> tuple[dict, list[dict]]:
    """Train the TripoSG vecset VAE with TSDF supervision
    (training/vae_train.py; batches carry surface/points/tsdf pools).
    Same loop/IO contract as run_flow_training; held-out eval reports the
    TSDF MSE (posterior mean, deterministic FPS)."""
    from actionmesh_tpu.models.triposg.vae import init_triposg_vae
    from actionmesh_tpu.training.vae_train import make_vae_train_step, vae_loss

    if params is None:
        params = init_triposg_vae(jax.random.key(cfg.seed), model_cfg)
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer, None, ema_decay=None)
    ckpt = _latest_ckpt(Path(cfg.out_dir)) if cfg.resume else None
    if ckpt is not None:
        state = restore_train_state(ckpt, state)
    step_fn = make_vae_train_step(
        model_cfg, optimizer, kl_weight=kl_weight, attn_impl=attn_impl
    )

    eval_fn = None
    if eval_batches:

        @jax.jit
        def eval_mse(eval_params, batch, key):
            _, parts = vae_loss(
                eval_params, model_cfg, batch, key,
                kl_weight=kl_weight, sample_posterior=False,
                attn_impl=attn_impl,
            )
            return parts["mse"]

        held_out = [jax.tree.map(jnp.asarray, b) for b in eval_batches]
        eval_key = jax.random.key(cfg.seed + 1)

        def eval_fn(current_state: dict) -> float:
            losses = [
                eval_mse(
                    current_state["params"], b, jax.random.fold_in(eval_key, i)
                )
                for i, b in enumerate(held_out)
            ]
            return float(sum(float(l) for l in losses) / len(losses))

    return _run_loop(
        state,
        step_fn,
        batches,
        cfg,
        needs_key=True,
        mesh=None,
        on_log=on_log,
        eval_fn=eval_fn,
    )


def run_distillation(
    model_cfg: DenoiserConfig,
    teacher_params,
    batches: Iterator[dict],
    cfg: TrainLoopConfig,
    *,
    mode: str = "guidance",
    guidance_scale: float = 7.5,
    num_teacher_steps: int = 30,
    teacher_guidance_scale: Optional[float] = None,
    mesh=None,
    student_params=None,
    attn_impl: str = "auto_train",
    on_log: Optional[Callable[[dict], None]] = None,
    eval_batches: Optional[list[dict]] = None,
) -> tuple[dict, list[dict]]:
    """Distill a Stage-I teacher into a cheaper student (training/distill.py).

    ``mode`` "guidance" regresses the teacher's CFG-guided velocity into a
    single conditional forward; "progressive" halves the Euler step count
    (``num_teacher_steps`` -> ``num_teacher_steps // 2``; chain rounds over
    EVEN counts, e.g. 16 -> 8 -> 4 — odd teacher counts are rejected,
    so 30 supports exactly one round, 30 -> 15). The student initializes FROM the teacher (the
    standard warm start) unless ``student_params`` is given. Loop/IO
    contract matches run_flow_training; ``eval_batches`` reports the same
    distillation loss on held-out data with deterministic draws.
    """
    from actionmesh_tpu.training.distill import (
        guidance_distill_loss,
        make_distill_step,
        progressive_distill_loss,
    )

    shardings = None
    if mesh is not None:
        shardings = denoiser_param_shardings(teacher_params, mesh)
        teacher_params = shard_params(teacher_params, shardings)
    if student_params is None:
        student_params = jax.tree.map(jnp.copy, teacher_params)
    elif mesh is not None:
        student_params = shard_params(
            student_params, denoiser_param_shardings(student_params, mesh)
        )
    optimizer = make_optimizer(cfg)
    state = init_train_state(
        student_params, optimizer, shardings, ema_decay=cfg.ema_decay
    )
    ckpt = _latest_ckpt(Path(cfg.out_dir)) if cfg.resume else None
    if ckpt is not None:
        state = restore_train_state(ckpt, state)
    step_fn = make_distill_step(
        model_cfg,
        optimizer,
        teacher_params,
        mode=mode,
        guidance_scale=guidance_scale,
        num_teacher_steps=num_teacher_steps,
        teacher_guidance_scale=teacher_guidance_scale,
        shift=cfg.shift,
        attn_impl=attn_impl,
        mesh=mesh,
        compute_dtype=_compute_dtype(cfg),
        ema_decay=_loop_ema_decay(cfg),
    )

    eval_fn = None
    if eval_batches:
        loss_kw = dict(
            shift=cfg.shift,
            attn_impl=attn_impl,
            mesh=mesh,
            remat=True,
            compute_dtype=_compute_dtype(cfg),
        )

        # teacher enters as a jit ARGUMENT (closed-over param trees would
        # constant-fold into the compiled program at production scale)
        @jax.jit
        def _eval_loss(eval_params, teacher, batch, key):
            if mode == "guidance":
                return guidance_distill_loss(
                    eval_params, teacher, model_cfg, batch, key,
                    guidance_scale=guidance_scale, **loss_kw,
                )
            return progressive_distill_loss(
                eval_params, teacher, model_cfg, batch, key,
                num_teacher_steps=num_teacher_steps,
                teacher_guidance_scale=teacher_guidance_scale, **loss_kw,
            )

        def eval_loss(eval_params, batch, key):
            return _eval_loss(eval_params, teacher_params, batch, key)

        sharding = batch_sharding(mesh) if mesh is not None else None
        held_out = [
            jax.tree.map(
                lambda x: jax.device_put(x, sharding) if sharding else jnp.asarray(x),
                b,
            )
            for b in eval_batches
        ]
        eval_key = jax.random.key(cfg.seed + 1)

        def eval_fn(current_state: dict) -> float:
            eval_params = (
                current_state["ema_params"]
                if "ema_params" in current_state
                else current_state["params"]
            )
            losses = [
                eval_loss(eval_params, b, jax.random.fold_in(eval_key, i))
                for i, b in enumerate(held_out)
            ]
            return float(sum(float(l) for l in losses) / len(losses))

    return _run_loop(
        state,
        step_fn,
        batches,
        cfg,
        needs_key=True,
        mesh=mesh,
        on_log=on_log,
        eval_fn=eval_fn,
    )
