"""Adversarial real-weight ingestion drill (round-4 verdict item 5).

Deliberately-perturbed snapshots for every checkpoint family — missing
tensors, fused / transposed-fused qkv (the reference fuses qkv at RUNTIME,
ref:actionmesh/model/utils/attention_processor.py:106-115, so a shipped
fused tensor means an unexpected layout), fp16 overflow (inf) and NaN
corruption, and config.json variants — asserting every failure is
fail-fast AND the diagnostic NAMES the offending tensor or key.

The injected-fault -> diagnostic table lives in BENCH_NOTES.md (r5).
"""

import dataclasses
import json

import numpy as np
import pytest
from safetensors.numpy import load_file, save_file

from actionmesh_tpu.utils.weights import (
    check_finite_state,
    convert_autoencoder,
    convert_denoiser,
    convert_dinov2,
    convert_triposg_dit,
    load_safetensors_dir,
)
from scripts.ingest_weights import ingest
from tests.test_checkpoint_dryrun import (
    synth_autoencoder_state,
    synth_denoiser_state,
)
from tests.test_ingest_weights import SMALL_DENOISER, write_snapshot

from actionmesh_tpu.models.denoiser import DenoiserConfig


def small_denoiser_cfg() -> DenoiserConfig:
    return DenoiserConfig(**SMALL_DENOISER)


# ---------------------------------------------------------------------------
# Missing tensors: the diagnostic must name the absent key and attach the
# checkpoint-structure report (not a bare KeyError).
# ---------------------------------------------------------------------------


def test_denoiser_missing_tensor_names_it():
    cfg = small_denoiser_cfg()
    state = synth_denoiser_state(cfg)
    del state["blocks.1.s_attn.to_k.weight"]
    with pytest.raises(KeyError) as ei:
        convert_denoiser(state, cfg, verify=False)
    msg = str(ei.value)
    assert "blocks.1.s_attn.to_k.weight" in msg
    assert "Checkpoint structure" in msg


def test_autoencoder_missing_tensor_names_it():
    from actionmesh_tpu.models.autoencoder import AutoencoderConfig

    cfg = AutoencoderConfig(
        temporal_context_size=4, latent_channels=8, width=32, num_layers=2,
        num_attention_heads=2,
    )
    state = synth_autoencoder_state(cfg)
    del state["proj_query.weight"]
    with pytest.raises(KeyError) as ei:
        convert_autoencoder(state, cfg, verify=False)
    msg = str(ei.value)
    assert "proj_query.weight" in msg and "Checkpoint structure" in msg


def test_triposg_dit_missing_tensor_names_it():
    from actionmesh_tpu.models.triposg.dit import triposg_dit_config

    cfg = triposg_dit_config(
        num_tokens=16, in_channels=8, num_layers=2, width=32,
        num_attention_heads=2, cross_attention_dim=16,
    )
    state = synth_denoiser_state(cfg)
    del state["time_proj.linear_2.weight"]
    with pytest.raises(KeyError) as ei:
        convert_triposg_dit(state, cfg, verify=False)
    msg = str(ei.value)
    assert "time_proj.linear_2.weight" in msg
    assert "Checkpoint structure" in msg


def test_dinov2_missing_tensor_names_it():
    transformers = pytest.importorskip("transformers")
    import torch

    from actionmesh_tpu.models.dinov2 import DinoV2Config

    hf_cfg = transformers.Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, patch_size=14, image_size=518,
    )
    torch.manual_seed(0)
    model = transformers.Dinov2Model(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    del state["encoder.layer.1.mlp.fc2.weight"]
    cfg = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2)
    with pytest.raises(KeyError) as ei:
        convert_dinov2(state, cfg, verify=False)
    msg = str(ei.value)
    assert "encoder.layer.1.mlp.fc2.weight" in msg
    assert "Checkpoint structure" in msg


def test_rmbg_missing_tensor_names_it():
    from actionmesh_tpu.models.rmbg import convert_rmbg_weights

    # A near-empty state dict: conversion must fail at the first stage
    # tensor with the structure report, not deep inside BN folding.
    state = {"conv_in.weight": np.zeros((64, 3, 3, 3), np.float32),
             "conv_in.bias": np.zeros((64,), np.float32)}
    with pytest.raises(KeyError) as ei:
        convert_rmbg_weights(state)
    msg = str(ei.value)
    assert "stage1.rebnconvin.conv_s1.weight" in msg
    assert "Checkpoint structure" in msg


# ---------------------------------------------------------------------------
# Fused / transposed-fused qkv layouts
# ---------------------------------------------------------------------------


def _fuse_qkv(state: dict, prefix: str, transpose: bool) -> dict:
    qkv = np.concatenate(
        [state.pop(f"{prefix}.to_{n}.weight") for n in ("q", "k", "v")], axis=0
    )
    state[f"{prefix}.qkv.weight"] = qkv.T if transpose else qkv
    return state


def test_denoiser_fused_qkv_diagnosed():
    cfg = small_denoiser_cfg()
    state = _fuse_qkv(synth_denoiser_state(cfg), "blocks.0.s_attn", False)
    with pytest.raises(ValueError) as ei:
        convert_denoiser(state, cfg, verify=False)
    msg = str(ei.value)
    assert "FUSED qkv" in msg
    assert "blocks.0.s_attn.qkv.weight" in msg
    assert "split rows into thirds" in msg


def test_denoiser_transposed_fused_qkv_diagnosed():
    cfg = small_denoiser_cfg()
    state = _fuse_qkv(synth_denoiser_state(cfg), "blocks.2.s_attn", True)
    with pytest.raises(ValueError) as ei:
        convert_denoiser(state, cfg, verify=False)
    msg = str(ei.value)
    assert "TRANSPOSED" in msg
    assert "blocks.2.s_attn.qkv.weight" in msg


def test_transposed_split_projection_caught_by_shape_verify():
    """A transposed NON-square split projection (cross-attn to_k) survives
    name mapping but must die in verify_converted with the tensor path."""
    cfg = small_denoiser_cfg()
    state = synth_denoiser_state(cfg)
    k = "blocks.0.x_attn.to_k.weight"
    state[k] = state[k].T  # (W, X) -> (X, W)
    with pytest.raises(ValueError) as ei:
        convert_denoiser(state, cfg, verify=True)
    msg = str(ei.value)
    assert "blocks[0].x_attn.to_k" in msg and "checkpoint shape" in msg


# ---------------------------------------------------------------------------
# fp16 extremes / NaN corruption: the shared safetensors loader (all four
# family ingestors route through load_safetensors_dir) must name the tensor.
# ---------------------------------------------------------------------------


def test_fp16_overflow_inf_in_snapshot_names_tensor(tmp_path):
    src, _, _ = write_snapshot(tmp_path / "snap", storage_dtype=np.float16)
    f = src / "denoiser" / "model.safetensors"
    state = dict(load_file(str(f)))
    # fp16 overflow: a value > 65504 stored as fp16 becomes inf
    with np.errstate(over="ignore"):
        state["proj_in.weight"] = (
            np.full_like(state["proj_in.weight"], 70000.0, np.float32)
            .astype(np.float16)
        )
    save_file(state, str(f))
    with pytest.raises(ValueError) as ei:
        ingest(src, tmp_path / "out", dtype_name="bfloat16")
    msg = str(ei.value)
    assert "non-finite" in msg and "proj_in.weight" in msg


def test_rmbg_nan_snapshot_names_tensor(tmp_path):
    from actionmesh_tpu.models.rmbg import RMBGModel

    d = tmp_path / "rmbg"
    d.mkdir()
    w = np.zeros((64, 3, 3, 3), np.float32)
    w[0, 0, 0, 0] = np.nan
    save_file(
        {"stage1.rebnconvin.conv_s1.weight": w}, str(d / "model.safetensors")
    )
    with pytest.raises(ValueError) as ei:
        RMBGModel.from_pretrained(d)
    msg = str(ei.value)
    assert "non-finite" in msg and "stage1.rebnconvin.conv_s1.weight" in msg


def test_check_finite_reports_all_offenders_and_skips_ints():
    state = {
        "a.weight": np.array([1.0, np.inf], np.float16),
        "b.weight": np.array([np.nan], np.float32),
        "steps": np.array([7], np.int64),  # int tensors are exempt
        "ok.weight": np.ones((3,), np.float32),
    }
    with pytest.raises(ValueError) as ei:
        check_finite_state(state, "unit")
    msg = str(ei.value)
    assert "a.weight: 1/2 non-finite" in msg
    assert "b.weight: 1/1 non-finite" in msg
    assert "steps" not in msg and "ok.weight" not in msg
    # clean state passes
    check_finite_state({"ok": np.ones(2, np.float32)}, "unit")


def test_load_safetensors_dir_finite_check_optional(tmp_path):
    d = tmp_path / "snap"
    d.mkdir()
    save_file(
        {"w": np.array([np.inf], np.float32)}, str(d / "model.safetensors")
    )
    with pytest.raises(ValueError, match="non-finite"):
        load_safetensors_dir(d)
    state = load_safetensors_dir(d, check_finite=False)
    assert np.isinf(state["w"]).all()


# ---------------------------------------------------------------------------
# config.json variants
# ---------------------------------------------------------------------------


def test_triposg_config_variant_unknown_key_names_it(tmp_path):
    """A plausible upstream-variant field our mapping does not model must
    raise naming the key (silently defaulting would build a wrong DiT)."""
    from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline

    for sub in ("transformer", "vae"):
        (tmp_path / sub).mkdir()
    (tmp_path / "transformer" / "config.json").write_text(
        json.dumps({"width": 64, "num_kv_heads": 8})
    )
    (tmp_path / "vae" / "config.json").write_text("{}")
    with pytest.raises(ValueError, match="num_kv_heads"):
        TripoSGPipeline.from_pretrained(tmp_path)


def test_actionmesh_config_variant_unknown_key_names_it(tmp_path):
    src, _, _ = write_snapshot(tmp_path / "snap")
    cfg_path = src / "denoiser" / "config.json"
    raw = json.loads(cfg_path.read_text())
    raw["rope_theta"] = 10000  # plausible variant knob we don't model
    cfg_path.write_text(json.dumps(raw))
    with pytest.raises(ValueError, match="rope_theta"):
        ingest(src, tmp_path / "out", dtype_name="float32")
