"""Real-weight ingestion drill (scripts/ingest_weights.py).

Fast tier: family detection, config fail-fast, small-config ingest with
provenance reproducibility. Slow tier: the FULL-SIZE drill — a
production-hyperparameter ActionMesh snapshot (fp16 safetensors +
realistic HF config.json metadata, the layout first real contact will
present) ingested end-to-end with one command and served by the pipeline.
"""

import dataclasses
import json

import numpy as np
import pytest
from safetensors.numpy import save_file

from scripts.ingest_weights import _build_config, detect_family, ingest
from tests.test_checkpoint_dryrun import (
    synth_autoencoder_state,
    synth_denoiser_state,
)

SMALL_DENOISER = dict(
    num_tokens_nominal=16, temporal_context_size=4, in_channels=8,
    num_layers=3, num_attention_heads=2, width=32, cross_attention_dim=16,
    inflated_layers=(0, 1, 2),
)
SMALL_AUTOENCODER = dict(
    temporal_context_size=4, latent_channels=8, width=32, num_layers=2,
    num_attention_heads=2,
)


def write_snapshot(tmp_path, *, storage_dtype=np.float32,
                   denoiser_kw=SMALL_DENOISER, ae_kw=SMALL_AUTOENCODER):
    """ActionMesh HF snapshot layout: subfolder per model, safetensors +
    config.json with the reference's field names and HF mixin metadata."""
    from actionmesh_tpu.models.autoencoder import AutoencoderConfig
    from actionmesh_tpu.models.denoiser import DenoiserConfig

    dcfg = DenoiserConfig(**denoiser_kw)
    acfg = AutoencoderConfig(**ae_kw)
    for sub, state, cfg, extra in (
        ("denoiser", synth_denoiser_state(dcfg), dcfg,
         {"_class_name": "ActionMeshDenoiser", "clear_autocast": True,
          "compile_blocks": False}),
        ("autoencoder", synth_autoencoder_state(acfg), acfg,
         {"_class_name": "ActionMeshAutoencoder", "verbose": True,
          "prediction_mode": "direct"}),
    ):
        d = tmp_path / sub
        d.mkdir(parents=True, exist_ok=True)
        save_file(
            {k: np.asarray(v).astype(storage_dtype) for k, v in state.items()},
            str(d / "model.safetensors"),
        )
        raw = dataclasses.asdict(cfg)
        raw.pop("gelu_approx", None)  # ours-only field, absent upstream
        raw.update(extra)
        (d / "config.json").write_text(json.dumps(raw))
    return tmp_path, dcfg, acfg


def test_detect_family_layouts(tmp_path):
    am = tmp_path / "am"
    (am / "denoiser").mkdir(parents=True)
    assert detect_family(am) == "actionmesh"

    tri = tmp_path / "tri"
    (tri / "transformer").mkdir(parents=True)
    (tri / "vae").mkdir()
    assert detect_family(tri) == "triposg"

    dino = tmp_path / "dino"
    dino.mkdir()
    (dino / "config.json").write_text('{"model_type": "dinov2"}')
    assert detect_family(dino) == "dinov2"

    rmbg = tmp_path / "rmbg"
    rmbg.mkdir()
    save_file(
        {"stage1.rebnconvin.conv_s1.weight": np.zeros((1, 1, 3, 3), np.float32)},
        str(rmbg / "model.safetensors"),
    )
    assert detect_family(rmbg) == "rmbg"

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="Cannot detect"):
        detect_family(empty)


def test_config_unknown_key_raises():
    from actionmesh_tpu.models.denoiser import DenoiserConfig

    with pytest.raises(ValueError, match="mystery_knob"):
        _build_config({"width": 64, "mystery_knob": 1}, DenoiserConfig, "d")
    # HF metadata + torch-only knobs pass through silently
    cfg = _build_config(
        {"width": 64, "_class_name": "X", "clear_autocast": True},
        DenoiserConfig, "d",
    )
    assert cfg.width == 64


def test_small_ingest_provenance_reproducible(tmp_path):
    src, dcfg, acfg = write_snapshot(tmp_path / "snap")
    rec1 = ingest(src, tmp_path / "out1", dtype_name="float32")
    assert rec1["family"] == "actionmesh"
    assert sorted(rec1["written"]) == ["autoencoder.npz", "denoiser.npz"]
    assert rec1["configs"]["denoiser"]["width"] == dcfg.width
    assert rec1["configs"]["autoencoder"]["num_layers"] == acfg.num_layers
    for g in rec1["golden"]:
        assert np.isfinite(g["mean"]) and np.isfinite(g["std"])
        assert g["std"] > 0
    prov = json.loads((tmp_path / "out1" / "PROVENANCE.json").read_text())
    assert prov["golden"] == rec1["golden"]

    # re-ingesting the same snapshot reproduces the golden stats exactly
    rec2 = ingest(src, tmp_path / "out2", dtype_name="float32")
    assert [g["sha256_f32"] for g in rec2["golden"]] == [
        g["sha256_f32"] for g in rec1["golden"]
    ]

    # the native checkpoint round-trips through the pipeline loader layout
    from actionmesh_tpu.utils.weights import load_params

    params = load_params(tmp_path / "out1" / "denoiser.npz")
    assert len(params["blocks"]) == dcfg.num_layers


def test_ingest_wrong_architecture_raises(tmp_path):
    """A snapshot whose config.json disagrees with its weights must raise
    a structural report, not convert silently."""
    src, _, _ = write_snapshot(tmp_path / "snap")
    cfg_path = src / "denoiser" / "config.json"
    raw = json.loads(cfg_path.read_text())
    raw["num_layers"] = 5  # weights have 3
    cfg_path.write_text(json.dumps(raw))
    with pytest.raises((ValueError, KeyError)):
        ingest(src, tmp_path / "out", dtype_name="float32")


@pytest.mark.slow
def test_full_size_ingest_drill(tmp_path):
    """The drill first real contact will run: a production-hyperparameter
    ActionMesh snapshot in fp16 safetensors (the storage dtype real HF
    checkpoints use — TripoSG ships fp16, ref:pipeline.py:140-142) with
    realistic config.json metadata, ingested with one command, then served
    through ActionMeshPipeline.load_native."""
    import jax.numpy as jnp

    from actionmesh_tpu.models.autoencoder import AutoencoderConfig
    from actionmesh_tpu.models.denoiser import DenoiserConfig

    src, dcfg, acfg = write_snapshot(
        tmp_path / "snap",
        storage_dtype=np.float16,
        denoiser_kw=dataclasses.asdict(DenoiserConfig()),
        ae_kw={
            k: v
            for k, v in dataclasses.asdict(AutoencoderConfig()).items()
        },
    )
    rec = ingest(src, tmp_path / "native", dtype_name="bfloat16")
    assert rec["configs"]["denoiser"]["num_layers"] == 21
    assert rec["configs"]["denoiser"]["width"] == 2048
    assert rec["configs"]["autoencoder"]["width"] == 1024
    for g in rec["golden"]:
        assert np.isfinite(g["mean"]) and g["std"] > 0

    # serve the ingested checkpoint through the real pipeline loader
    from actionmesh_tpu.pipeline import ActionMeshPipeline

    pipe = ActionMeshPipeline(
        config_name="actionmesh", weights_dir=None, dtype=jnp.bfloat16
    )
    pipe.load_native(tmp_path / "native")
    assert len(pipe.denoiser_params["blocks"]) == 21
    assert (
        pipe.denoiser_params["blocks"][0]["s_attn"]["to_q"]["kernel"].dtype
        == jnp.bfloat16
    )
