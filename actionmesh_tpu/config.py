"""Config system: dataclass presets with 3-layer override semantics.

Mirrors the reference's Hydra setup (reference: actionmesh/configs/*.yaml,
actionmesh/utils.py:45-74) without the Hydra dependency: a preset name
resolves to a YAML file in actionmesh_tpu/configs/, `load_config(updates)`
applies dotted-path overrides, and pipeline `__call__` kwargs override at
runtime — the same three layers as the reference.

Key values (reference configs/actionmesh.yaml): anchor_idx 0, sliding
windows 15/15, temporal_context_size 16, denoiser_latent_shape (2048, 64),
subsampling_level 1, guidance [[0,1],[1,1]] scale 7.5, scheduler shift 3.0
additive, TripoSG steps 100 / guidance 7.5, face_decimation 40000,
floaters_threshold 0.02. Fast preset: stage_0 50, stage_1 15.
"""

from __future__ import annotations

import copy
import dataclasses
from pathlib import Path
from typing import Any, Optional

import yaml

CONFIG_DIR = Path(__file__).parent / "configs"


@dataclasses.dataclass
class SchedulerConfig:
    num_inference_steps: int = 30
    num_train_timesteps: int = 1000
    shift: float = 3.0
    is_additive: bool = True
    # Sequentialize the CFG guidance branches (reference scheduler.py
    # low-RAM mode): honored by sampling/denoise_loop.py — halves peak
    # activation memory on a single chip. On a multi-chip mesh the dp
    # axis shards the branches instead, which is strictly better.
    split_cfg_batch: bool = False
    # Steps per compiled launch: bounds device time per XLA program (the
    # axon tunnel kills multi-minute programs) and shares one compiled
    # program across all full segments.
    steps_per_launch: int = 5


@dataclasses.dataclass
class GuidanceConfig:
    inference_enabled: bool = True
    guidance_at_inference: list = dataclasses.field(
        default_factory=lambda: [[0, 1], [1, 1]]
    )
    guidance_scales: list = dataclasses.field(default_factory=lambda: [7.5])


@dataclasses.dataclass
class MeshProcessConfig:
    face_decimation: int = 40000
    floaters_threshold: float = 0.02


@dataclasses.dataclass
class Stage0Config:
    num_inference_steps: int = 100
    guidance_scale: float = 7.5
    # SDF decode speed knobs (opt-in; None keeps the reference-equivalent
    # single-level fp32 coarse pass — see models/triposg/pipeline.py
    # decode_latents for semantics and accuracy rationale)
    prefilter_octree_depth: Optional[int] = None
    coarse_decode_dtype: Optional[str] = None


@dataclasses.dataclass
class DenoiserModelConfig:
    num_tokens_nominal: int = 2048
    temporal_context_size: int = 16
    num_attention_heads: int = 16
    width: int = 2048
    in_channels: int = 64
    num_layers: int = 21
    cross_attention_dim: int = 1024
    mlp_ratio: float = 4.0
    inflated_layers: list = dataclasses.field(
        default_factory=lambda: list(range(21))
    )
    # Reference memory knob (autocast weight-cache clearing); accepted for
    # preset parity, no-op under XLA (no autocast cache exists).
    clear_autocast: bool = False
    # tanh GELU on TPU (fused, within bf16 noise); False = exact erf, used
    # by fp32 parity tests (models/denoiser.DenoiserConfig.gelu_approx)
    gelu_approx: bool = True


@dataclasses.dataclass
class AutoencoderModelConfig:
    temporal_context_size: int = 16
    in_channels: int = 3
    in_extra_channels: int = 3
    out_dim: int = 3
    latent_channels: int = 64
    width: int = 1024
    num_attention_heads: int = 8
    num_layers: int = 16
    embed_frequency: int = 8
    embed_include_pi: bool = False
    prediction_mode: str = "direct"
    gelu_approx: bool = True


@dataclasses.dataclass
class PipelineConfig:
    # -- Stage 0
    stage_0: Stage0Config = dataclasses.field(default_factory=Stage0Config)
    mesh_process: MeshProcessConfig = dataclasses.field(
        default_factory=MeshProcessConfig
    )
    # -- Stage I
    temporal_3D_denoiser: DenoiserModelConfig = dataclasses.field(
        default_factory=DenoiserModelConfig
    )
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    cf_guidance: GuidanceConfig = dataclasses.field(default_factory=GuidanceConfig)
    # -- Stage II
    temporal_3D_vae: AutoencoderModelConfig = dataclasses.field(
        default_factory=AutoencoderModelConfig
    )
    # -- Inference parameters
    anchor_idx: int = 0
    sliding_window_denoiser: int = 15
    sliding_window_autoencoder: int = 15
    subsampling_level: int = 1
    # -- TPU runtime
    compute_dtype: str = "bfloat16"
    attn_impl: str = "auto"
    # Stage II decodes target timesteps in batched chunks; 5 bounds peak HBM
    # to ~1/3 of the full T_out=15 batch on a 16 GB v5e chip.
    decode_target_chunk: int = 5

    @property
    def denoiser_latent_shape(self) -> tuple[int, int]:
        return (
            self.temporal_3D_denoiser.num_tokens_nominal,
            self.temporal_3D_denoiser.in_channels,
        )


def _apply_updates(obj: Any, updates: dict) -> None:
    """Apply {'a.b.c': v} dotted-path updates onto nested dataclasses."""
    for path, value in updates.items():
        parts = path.split(".")
        target = obj
        for p in parts[:-1]:
            target = getattr(target, p)
        if not hasattr(target, parts[-1]):
            raise KeyError(f"Unknown config key: {path}")
        setattr(target, parts[-1], value)


def _merge_dict_into(obj: Any, data: dict, prefix: str = "") -> None:
    for k, v in data.items():
        if not hasattr(obj, k):
            raise KeyError(f"Unknown config key: {prefix}{k}")
        current = getattr(obj, k)
        if dataclasses.is_dataclass(current) and isinstance(v, dict):
            _merge_dict_into(current, v, prefix=f"{prefix}{k}.")
        else:
            setattr(obj, k, v)


def load_config(
    config_name: str = "actionmesh",
    config_dir: Optional[str | Path] = None,
    updates: Optional[dict] = None,
) -> PipelineConfig:
    """Resolve a preset (with `defaults` composition) + dotted overrides."""
    config_dir = Path(config_dir) if config_dir is not None else CONFIG_DIR
    name = config_name.removesuffix(".yaml")
    cfg = PipelineConfig()

    def apply_file(preset: str) -> None:
        path = config_dir / f"{preset}.yaml"
        data = yaml.safe_load(path.read_text()) or {}
        for base in data.pop("defaults", []):
            apply_file(base)
        _merge_dict_into(cfg, data)

    apply_file(name)
    if updates:
        _apply_updates(cfg, updates)
    return cfg


def clone_config(cfg: PipelineConfig) -> PipelineConfig:
    return copy.deepcopy(cfg)
