"""One-command real-weight ingestion: HF snapshot dir -> verified native ckpt.

First contact with real pretrained weights should be ONE battle-tested
command per checkpoint family, not an ad-hoc converter session. For a
downloaded HF snapshot directory this script:

  1. detects the family (ActionMesh Stage I/II, TripoSG, DINOv2, RMBG),
  2. parses architecture hyperparameters from config.json FAIL-FAST
     (unknown keys raise; reference config fields:
     ref:actionmesh/model/temporal_denoiser.py:23-50,
     temporal_autoencoder.py:32-57),
  3. converts through utils/weights (structural mismatches raise with a
     state-dict report) and shape-verifies vs the configured architecture,
  4. runs one deterministic golden forward and records its output
     statistics, and
  5. writes the native npz checkpoint(s) + PROVENANCE.json next to them.

The provenance record makes later regressions detectable: re-ingesting the
same snapshot must reproduce the same golden stats.

Usage:
  python scripts/ingest_weights.py pretrained_weights/ActionMesh --out native_ckpt/ActionMesh
  python scripts/ingest_weights.py pretrained_weights/TripoSG   [--family triposg]
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(message)s")
logger = logging.getLogger("ingest")

# Non-architecture keys in reference config.json files (HF mixin metadata
# and torch-only runtime knobs) — ignored rather than failed on.
_META_KEYS = {
    "_class_name", "_name_or_path", "_diffusers_version",
    "transformers_version", "architectures", "model_type", "torch_dtype",
    "dtype", "_commit_hash", "clear_autocast", "compile_blocks",
    "compile_mode", "verbose",
}


def _read_config(path: Path) -> dict:
    cfg = path / "config.json"
    return json.loads(cfg.read_text()) if cfg.exists() else {}


def _build_config(raw: dict, cfg_cls, family: str):
    """Map config.json -> our config dataclass; unknown keys raise."""
    fields = {f.name for f in dataclasses.fields(cfg_cls)}
    unknown = sorted(set(raw) - fields - _META_KEYS)
    if unknown:
        raise ValueError(
            f"{family}: config.json has keys this mapping does not "
            f"recognize: {unknown}. Recognized: "
            f"{sorted(set(raw) & fields)}. Refusing to silently default — "
            "extend scripts/ingest_weights.py after checking the reference "
            "architecture."
        )
    kwargs = {k: v for k, v in raw.items() if k in fields}
    if "inflated_layers" in kwargs:
        kwargs["inflated_layers"] = tuple(kwargs["inflated_layers"])
    return cfg_cls(**kwargs)


def detect_family(path: Path) -> str:
    """Classify a snapshot directory by its layout / weight names."""
    if (path / "denoiser").is_dir() or (path / "autoencoder").is_dir():
        return "actionmesh"
    if (path / "transformer").is_dir() and (path / "vae").is_dir():
        return "triposg"
    raw = _read_config(path)
    if raw.get("model_type") == "dinov2" or "Dinov2Model" in str(
        raw.get("architectures", "")
    ):
        return "dinov2"
    try:
        from actionmesh_tpu.utils.weights import load_safetensors_dir

        keys = load_safetensors_dir(path).keys()
    except FileNotFoundError:
        keys = ()
    if any(k.startswith(("stage1.rebnconv", "side1")) for k in keys):
        return "rmbg"
    if any(k.startswith("encoder.layer.") for k in keys):
        return "dinov2"
    raise ValueError(
        f"Cannot detect checkpoint family under {path}: expected an "
        "ActionMesh (denoiser/ + autoencoder/), TripoSG (transformer/ + "
        "vae/), DINOv2, or RMBG snapshot layout."
    )


def _stats(name: str, arr) -> dict:
    a = np.asarray(arr, np.float32)
    return {
        "probe": name,
        "shape": list(a.shape),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "first8": [float(x) for x in a.reshape(-1)[:8]],
        "sha256_f32": hashlib.sha256(
            np.ascontiguousarray(a, np.float32).tobytes()
        ).hexdigest()[:16],
    }


# ---------------------------------------------------------------------------
# Family ingestors: each returns (files_written, golden_records, configs)
# ---------------------------------------------------------------------------


def ingest_actionmesh(src: Path, out: Path, dtype):
    import jax.numpy as jnp

    from actionmesh_tpu.models.autoencoder import (
        AutoencoderConfig,
        autoencoder_forward,
    )
    from actionmesh_tpu.models.denoiser import DenoiserConfig, denoiser_forward
    from actionmesh_tpu.utils.weights import (
        load_autoencoder,
        load_denoiser,
        save_params,
    )

    files, golden, configs = [], [], {}

    if (src / "denoiser").is_dir():
        cfg = _build_config(
            _read_config(src / "denoiser"), DenoiserConfig, "denoiser"
        )
        configs["denoiser"] = dataclasses.asdict(cfg)
        params = load_denoiser(src / "denoiser", cfg, dtype=dtype)
        rng = np.random.default_rng(0)
        T = 2
        x = jnp.asarray(
            rng.standard_normal((1, T, cfg.num_tokens_nominal, cfg.in_channels)),
            dtype,
        )
        ctx = jnp.asarray(
            rng.standard_normal((1, T, 16, cfg.cross_attention_dim)), dtype
        )
        v = denoiser_forward(
            params, cfg, x, ctx,
            jnp.arange(T, dtype=jnp.float32)[None],
            jnp.full((1,), 500.0),
            None, attn_impl="auto",
        )
        golden.append(_stats("denoiser_fwd_seed0_T2", v))
        save_params(params, out / "denoiser.npz")
        files.append("denoiser.npz")

    if (src / "autoencoder").is_dir():
        cfg = _build_config(
            _read_config(src / "autoencoder"), AutoencoderConfig, "autoencoder"
        )
        configs["autoencoder"] = dataclasses.asdict(cfg)
        params = load_autoencoder(src / "autoencoder", cfg, dtype=dtype)
        rng = np.random.default_rng(1)
        T, N, V = 2, 32, 64
        lat = jnp.asarray(
            rng.standard_normal((1, T, N, cfg.latent_channels)), dtype
        )
        q = jnp.asarray(
            rng.uniform(-0.9, 0.9, (1, V, cfg.in_channels + cfg.in_extra_channels)),
            jnp.float32,
        )
        pred = autoencoder_forward(
            params, cfg, lat,
            jnp.arange(T, dtype=jnp.float32)[None],
            jnp.zeros((1,)), jnp.ones((1, 1)),
            q, attn_impl="auto", compute_dtype=dtype,
        )
        golden.append(_stats("autoencoder_fwd_seed1_T2_V64", pred))
        save_params(params, out / "autoencoder.npz")
        files.append("autoencoder.npz")

    if not files:
        raise FileNotFoundError(f"{src}: no denoiser/ or autoencoder/ subdir")
    return files, golden, configs


def ingest_triposg(src: Path, out: Path, dtype):
    import jax.numpy as jnp

    from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline
    from actionmesh_tpu.utils.weights import save_params

    # from_pretrained already fail-fast-parses config.json, converts, and
    # shape-verifies both subfolders (models/triposg/pipeline.py).
    pipe = TripoSGPipeline.from_pretrained(src, dtype=dtype)
    files, golden = [], []
    save_params(pipe.dit_params, out / "triposg_dit.npz")
    save_params(pipe.vae_params, out / "triposg_vae.npz")
    files += ["triposg_dit.npz", "triposg_vae.npz"]

    rng = np.random.default_rng(2)
    # golden 1: VAE encode of a deterministic unit-sphere surface
    n = min(4 * pipe.vae_cfg.num_tokens, 4096)
    pts = rng.standard_normal((n, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    surf = jnp.asarray(
        np.concatenate([0.8 * pts, pts], axis=1), jnp.float32
    )[None]
    lat = pipe.encode_to_latent(surf, seed=None)
    golden.append(_stats("vae_encode_sphere_mean", lat))
    # golden 2: one DiT velocity eval on seeded noise + zero context
    from actionmesh_tpu.models.triposg.dit import triposg_dit_forward

    x = jnp.asarray(
        rng.standard_normal(
            (1, pipe.vae_cfg.num_tokens, pipe.vae_cfg.latent_channels)
        ),
        dtype,
    )
    ctx = jnp.zeros((1, 16, pipe.dit_cfg.cross_attention_dim), dtype)
    v = triposg_dit_forward(
        pipe.dit_params, pipe.dit_cfg, x, ctx, jnp.full((1,), 500.0),
        attn_impl="auto",
    )
    golden.append(_stats("dit_fwd_seed2_t500", v))
    configs = {
        "dit": dataclasses.asdict(pipe.dit_cfg),
        "vae": dataclasses.asdict(pipe.vae_cfg),
    }
    return files, golden, configs


def ingest_dinov2(src: Path, out: Path, dtype):
    import jax.numpy as jnp

    from actionmesh_tpu.models.dinov2 import DinoV2Config, dinov2_forward
    from actionmesh_tpu.utils.weights import load_dinov2, save_params

    raw = _read_config(src)
    # HF transformers dinov2 config -> our field names
    mapping = {
        "hidden_size": "hidden_size",
        "num_hidden_layers": "num_layers",
        "num_attention_heads": "num_heads",
        "patch_size": "patch_size",
        "image_size": "image_size",
        "layerscale_value": None,  # fixed in architecture
        "mlp_ratio": None,
        "hidden_act": None,
        "qkv_bias": None,
        "initializer_range": None,
        "layer_norm_eps": None,
        "drop_path_rate": None,
        "attention_probs_dropout_prob": None,
        "hidden_dropout_prob": None,
        "use_swiglu_ffn": None,
        "apply_layernorm": None,
        "reshape_hidden_states": None,
        "out_features": None,
        "out_indices": None,
        "stage_names": None,
        "use_mask_token": None,
        "num_channels": None,
        "id2label": None,
        "label2id": None,
    }
    unknown = sorted(set(raw) - set(mapping) - _META_KEYS)
    if unknown:
        raise ValueError(
            f"dinov2: unrecognized config.json keys {unknown} — extend "
            "scripts/ingest_weights.py after checking the architecture."
        )
    kwargs = {
        ours: raw[theirs]
        for theirs, ours in mapping.items()
        if ours is not None and theirs in raw
    }
    cfg = DinoV2Config(**kwargs)
    params = load_dinov2(src, cfg, dtype=dtype)
    save_params(params, out / "dinov2.npz")

    # golden: deterministic gradient image
    size = 224
    g = np.linspace(0, 1, size, dtype=np.float32)
    img = np.stack(
        [np.tile(g, (size, 1)), np.tile(g[:, None], (1, size)), np.full((size, size), 0.5, np.float32)],
        axis=-1,
    )
    feats = dinov2_forward(params, cfg, jnp.asarray(img, dtype)[None])
    return (
        ["dinov2.npz"],
        [_stats("dinov2_gradient224", feats)],
        {"dinov2": dataclasses.asdict(cfg)},
    )


def ingest_rmbg(src: Path, out: Path, dtype):
    del dtype  # RMBG converts/folds BN in fp32 (models/rmbg.py)
    from PIL import Image

    from actionmesh_tpu.models.rmbg import RMBGModel
    from actionmesh_tpu.utils.weights import save_params

    model = RMBGModel.from_pretrained(src)
    save_params(model.params, out / "rmbg.npz")
    rng = np.random.default_rng(3)
    img = Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
    )
    alpha = model.predict_alpha(img)
    return ["rmbg.npz"], [_stats("rmbg_alpha_seed3_64px", alpha)], {}


INGESTORS = {
    "actionmesh": ingest_actionmesh,
    "triposg": ingest_triposg,
    "dinov2": ingest_dinov2,
    "rmbg": ingest_rmbg,
}


def ingest(src: Path, out: Path, family: str = "auto", dtype_name: str = "bfloat16") -> dict:
    import jax.numpy as jnp

    src, out = Path(src), Path(out)
    if family == "auto":
        family = detect_family(src)
    logger.info("family: %s  (%s -> %s)", family, src, out)
    out.mkdir(parents=True, exist_ok=True)
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    t0 = time.time()
    files, golden, configs = INGESTORS[family](src, out, dtype)
    source_files = sorted(
        {
            str(p.relative_to(src)): p.stat().st_size
            for p in src.rglob("*")
            if p.is_file()
        }.items()
    )
    record = {
        "family": family,
        "source": str(src),
        "source_files": source_files,
        "dtype": dtype_name,
        "written": files,
        "configs": configs,
        "golden": golden,
        "ingest_seconds": round(time.time() - t0, 1),
    }
    (out / "PROVENANCE.json").write_text(json.dumps(record, indent=2))
    logger.info(
        "wrote %s + PROVENANCE.json in %.1fs; golden: %s",
        files, record["ingest_seconds"],
        [(g["probe"], g["sha256_f32"]) for g in golden],
    )
    return record


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("snapshot", type=str, help="HF snapshot directory")
    ap.add_argument("--out", type=str, default=None,
                    help="output dir (default: <snapshot>_native)")
    ap.add_argument("--family", type=str, default="auto",
                    choices=["auto", *INGESTORS])
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()
    out = args.out or (args.snapshot.rstrip("/") + "_native")
    ingest(Path(args.snapshot), Path(out), args.family, args.dtype)


if __name__ == "__main__":
    main()
