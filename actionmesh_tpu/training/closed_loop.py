"""Closed-loop quality experiment: train -> infer -> eval on synthetic 4D.

The reference's reason to exist is its ActionBench numbers (CD-3D 0.053 /
CD-4D 0.081 / CD-M 0.148 on real outputs — ref:actionbench/README.md:63-69,
harness ref:actionbench/evaluate_dataset.py:322-411). Real weights and the
real dataset need network egress this environment doesn't have, so this
module closes the quality loop entirely in-environment instead:

  1. **Scenes**: a procedurally deforming mesh family (anisotropic
     breathing + bend + bounded translation) whose motion is visible in
     renders and whose tracked ground truth is exact by construction.
  2. **Data**: every scene is rendered to an RGBA video with the native
     rasterizer, per-frame surfaces are encoded to Stage-I latents through
     a FROZEN tiny TripoSG VAE (posterior mean), per-frame conditioning
     comes from a FROZEN tiny DINOv2 — the same frozen modules the
     inference pipeline is then built with, so train-time and test-time
     conditioning are bitwise-consistent code paths.
  3. **Train**: the Stage-I denoiser (rectified flow, training/flow_train)
     and Stage-II decoder (masked position MSE, training/decoder_train)
     train on held-IN scenes with held-out eval loss.
  4. **Infer**: the REAL {video+3D} pipeline (pipeline_with_3d, the
     counterpart of ref:actionmesh/pipeline_with_3d.py) runs on held-OUT
     scenes from the exported native checkpoints — full preprocessing, CFG
     denoising loop, AR windows, Stage-II vertex-query decode.
  5. **Eval**: the pipeline's actual output meshes are scored by the full
     ActionBench harness (gradient ICP + chamfer + motion chamfer) against
     the scenes' exact tracked ground truth.

The deliverable is the random-init vs trained (vs distilled) CD table —
the first quality numbers in this repo produced by the generative pipeline
itself rather than by synthetic perturbation clouds.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from actionmesh_tpu.io.mesh import Mesh, load_glb
from actionmesh_tpu.models.stage0 import make_uv_sphere

logger = logging.getLogger(__name__)



# ---------------------------------------------------------------------------
# Experiment spec: one object pins every shape/seed shared by data
# generation, training, and inference.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CascadeSpec:
    """Tiny-but-real cascade configuration for the closed loop."""

    # data
    n_frames: int = 16
    window: int = 8
    window_stride: int = 2
    n_lat: int = 24
    n_lon: int = 32
    image_size: int = 192
    surface_samples: int = 1024
    track_points: int = 512  # decoder-training query/track points per scene
    gt_points: int = 20_000  # ActionBench ground-truth points per scene
    # latent space (frozen tiny TripoSG VAE)
    latent_tokens: int = 16
    latent_channels: int = 8
    vae_width: int = 64
    vae_layers: int = 2
    vae_seed: int = 7
    # conditioning (frozen tiny DINOv2)
    dino_hidden: int = 48
    dino_layers: int = 2
    dino_heads: int = 4
    dino_seed: int = 1
    # Stage-I denoiser
    denoiser_width: int = 128
    denoiser_layers: int = 4
    denoiser_heads: int = 4
    # Stage-II decoder
    decoder_width: int = 128
    decoder_layers: int = 4
    decoder_heads: int = 4
    # sampling
    num_inference_steps: int = 16
    guidance_scale: float = 2.0
    # Stage-0 DiT (image -> 3D latent rectified flow; trained by the
    # stage0 phase for the full video->4D closed loop)
    stage0_width: int = 128
    stage0_layers: int = 4
    stage0_heads: int = 4
    stage0_steps: int = 16
    stage0_guidance: float = 2.0
    stage0_dense_depth: int = 7
    stage0_hier_depth: int = 8
    # runtime (mid-scale runs flip these to "auto"/"bfloat16" so the
    # production flash kernel + bf16-with-fp32-islands numerics are in the
    # loop — round-4 verdict item 2: width-128 fp32 evidence cannot see
    # precision bugs that only exist at production width)
    attn_impl: str = "chunked"
    compute_dtype: str = "float32"

    # -- derived configs ----------------------------------------------------

    def pipeline_updates(self) -> dict:
        """config_updates for ActionMeshPipeline matching this spec."""
        return {
            "temporal_3D_denoiser.num_tokens_nominal": self.latent_tokens,
            "temporal_3D_denoiser.in_channels": self.latent_channels,
            "temporal_3D_denoiser.width": self.denoiser_width,
            "temporal_3D_denoiser.num_layers": self.denoiser_layers,
            "temporal_3D_denoiser.num_attention_heads": self.denoiser_heads,
            "temporal_3D_denoiser.cross_attention_dim": self.dino_hidden,
            "temporal_3D_denoiser.inflated_layers": list(
                range(self.denoiser_layers)
            ),
            "temporal_3D_denoiser.temporal_context_size": self.window,
            "temporal_3D_vae.latent_channels": self.latent_channels,
            "temporal_3D_vae.width": self.decoder_width,
            "temporal_3D_vae.num_layers": self.decoder_layers,
            "temporal_3D_vae.num_attention_heads": self.decoder_heads,
            "temporal_3D_vae.temporal_context_size": self.window,
            "sliding_window_denoiser": self.window - 1,
            "sliding_window_autoencoder": self.window - 1,
            "scheduler.num_inference_steps": self.num_inference_steps,
            "cf_guidance.guidance_scales": [self.guidance_scale],
            "attn_impl": self.attn_impl,
            "compute_dtype": self.compute_dtype,
        }

    def denoiser_config(self):
        from actionmesh_tpu.models.denoiser import DenoiserConfig

        return DenoiserConfig(
            num_tokens_nominal=self.latent_tokens,
            temporal_context_size=self.window,
            in_channels=self.latent_channels,
            num_layers=self.denoiser_layers,
            num_attention_heads=self.denoiser_heads,
            width=self.denoiser_width,
            cross_attention_dim=self.dino_hidden,
            inflated_layers=tuple(range(self.denoiser_layers)),
        )

    def autoencoder_config(self):
        from actionmesh_tpu.models.autoencoder import AutoencoderConfig

        return AutoencoderConfig(
            temporal_context_size=self.window,
            latent_channels=self.latent_channels,
            width=self.decoder_width,
            num_layers=self.decoder_layers,
            num_attention_heads=self.decoder_heads,
        )

    def stage0_dit_config(self):
        """Single-shape DiT (models/triposg/dit.py: the denoiser at T=1)."""
        from actionmesh_tpu.models.triposg.dit import triposg_dit_config

        return triposg_dit_config(
            num_tokens=self.latent_tokens,
            in_channels=self.latent_channels,
            num_layers=self.stage0_layers,
            width=self.stage0_width,
            num_attention_heads=self.stage0_heads,
            cross_attention_dim=self.dino_hidden,
        )

    def dino_config(self):
        from actionmesh_tpu.models.dinov2 import DinoV2Config

        return DinoV2Config(
            hidden_size=self.dino_hidden,
            num_layers=self.dino_layers,
            num_heads=self.dino_heads,
            patch_size=14,
            image_size=70,
        )

    def vae_config(self):
        from actionmesh_tpu.models.triposg.vae import TripoSGVAEConfig

        return TripoSGVAEConfig(
            latent_channels=self.latent_channels,
            num_tokens=self.latent_tokens,
            encoder_width=self.vae_width,
            encoder_layers=self.vae_layers,
            encoder_heads=4,
            decoder_width=self.vae_width,
            decoder_layers=self.vae_layers,
            decoder_heads=4,
        )

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(dataclasses.asdict(self), indent=2))

    @classmethod
    def load(cls, path: str | Path) -> "CascadeSpec":
        return cls(**json.loads(Path(path).read_text()))


# ---------------------------------------------------------------------------
# Scene family
# ---------------------------------------------------------------------------


def make_scene(seed: int, spec: CascadeSpec) -> list[Mesh]:
    """Deforming ellipsoid scene: per-axis breathing + bend + translation.

    Frame 0 is the anchor (identity deformation). Motion amplitudes are
    seed-dependent; a final bisection shrinks per-frame deviations from the
    anchor so that — under the anchor's own [-1,1]^3 normalization
    (preprocessing/mesh.normalize_mesh, the transform the inference
    pipeline applies) — every frame stays within ``_NORM_BOUND``, keeping
    targets strictly inside the decoder's sigmoid range.
    """
    rng = np.random.default_rng(seed)
    base = make_uv_sphere(radius=1.0, n_lat=spec.n_lat, n_lon=spec.n_lon)
    radii = 0.5 + 0.45 * rng.random(3)
    v0 = base.vertices * radii

    amp = 0.10 + 0.18 * rng.random(3)  # breathing amplitude per axis
    freq = rng.integers(1, 3, 3).astype(np.float64)  # cycles per clip
    phase = rng.random(3) * 2 * np.pi
    bend = 0.5 * rng.standard_normal()
    tdir = rng.normal(size=3)
    tdir /= np.linalg.norm(tdir)
    tamp = 0.05 + 0.08 * rng.random()

    def deform(a: float) -> np.ndarray:
        # shrink-only breathing: s(0) = 1 (anchor is the largest extent)
        s = 1.0 - amp * (1.0 - np.cos(2 * np.pi * freq * a + 0 * phase)) / 2.0
        v = v0 * s
        ang = bend * a * v[:, 0]
        ca, sa = np.cos(ang), np.sin(ang)
        v = np.stack(
            [v[:, 0], ca * v[:, 1] - sa * v[:, 2], sa * v[:, 1] + ca * v[:, 2]],
            axis=1,
        )
        return v + tdir * (tamp * np.sin(np.pi * a + phase[0]) ** 2)

    T = spec.n_frames
    frames = [deform(t / (T - 1)) for t in range(T)]

    # anchor normalization (exactly normalize_mesh's transform). The anchor
    # itself touches +-1 on its longest axis by construction, so the motion
    # budget is "never exceed the anchor's own envelope": later frames'
    # deviations shrink (bisection on lambda) until they fit back inside it.
    lo, hi = frames[0].min(0), frames[0].max(0)
    center = (lo + hi) / 2.0
    factor = 2.0 / max(float(np.max(hi - lo)), 1e-12)
    # 3% overshoot tolerance: without it, any outward motion component at
    # an anchor-extreme vertex (which sits at exactly +-1) would force the
    # bisection to zero motion. Training tracks clip the sliver to [-1, 1]
    # (build_dataset); eval ground truth lives in raw space, unaffected.
    bound = 1.03 * float(np.abs((frames[0] - center) * factor).max())

    def max_norm(lam: float) -> float:
        worst = 0.0
        for v in frames[1:]:
            shrunk = frames[0] + lam * (v - frames[0])
            worst = max(worst, float(np.abs((shrunk - center) * factor).max()))
        return worst

    lam = 1.0
    if max_norm(1.0) > bound:
        lo_l, hi_l = 0.0, 1.0
        for _ in range(30):
            mid = (lo_l + hi_l) / 2.0
            if max_norm(mid) > bound:
                hi_l = mid
            else:
                lo_l = mid
        lam = lo_l
    out = [Mesh(frames[0].copy(), base.faces.copy())]
    for v in frames[1:]:
        out.append(Mesh(frames[0] + lam * (v - frames[0]), base.faces.copy()))
    return out


def tracked_points(meshes: list[Mesh], n_pts: int, seed: int) -> np.ndarray:
    """(T, n_pts, 6) tracked surface points: frame-0 barycentrics replayed
    on every frame (the ActionBench GT layout — correspondence-preserving,
    ref:actionbench/sample_mesh.py:151-184)."""
    rng = np.random.default_rng(seed)
    m0 = meshes[0]
    _, areas = m0.face_normals_and_areas()
    cdf = np.cumsum(areas) / areas.sum()
    face_ids = np.searchsorted(cdf, rng.random(n_pts))
    u, v = rng.random(n_pts), rng.random(n_pts)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    w = 1 - u - v
    out = []
    for m in meshes:
        tri = m.vertices[m.faces[face_ids]]
        pts = u[:, None] * tri[:, 0] + v[:, None] * tri[:, 1] + w[:, None] * tri[:, 2]
        nrm, _ = m.face_normals_and_areas()
        out.append(np.concatenate([pts, nrm[face_ids]], axis=1))
    return np.stack(out).astype(np.float32)


def render_frames(meshes: list[Mesh], spec: CascadeSpec) -> list:
    """RGBA PIL frames of the (normalized-space) scene from a fixed camera."""
    from PIL import Image

    from actionmesh_tpu.render.cameras import get_uniform_cameras
    from actionmesh_tpu.render.renderer import Renderer

    cam = get_uniform_cameras(n_views=1)[0]
    renderer = Renderer(image_size=spec.image_size, mode="shaded")
    return [
        Image.fromarray(renderer.render(m, cam, return_alpha=True), "RGBA")
        for m in meshes
    ]


# ---------------------------------------------------------------------------
# Frozen conditioning stack (shared by data generation and inference)
# ---------------------------------------------------------------------------


class MeanEncodeVAE:
    """Wrap a TripoSG pipeline so ``encode_to_latent`` always returns the
    deterministic posterior MEAN (seed ignored) — the latent definition the
    closed loop trains against must match the one inference conditions on."""

    def __init__(self, inner):
        self._inner = inner

    def encode_to_latent(self, surface, seed=None):
        del seed
        return self._inner.encode_to_latent(surface, seed=None)


def make_conditioning_stack(spec: CascadeSpec):
    """(image_encoder, vae) — frozen, deterministic random init by spec seeds."""
    import jax.numpy as jnp

    from actionmesh_tpu.models.image_encoder import ImageEncoder
    from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline

    image_encoder = ImageEncoder(
        weights_dir=None,
        dtype=jnp.float32,
        config=spec.dino_config(),
        init_seed=spec.dino_seed,
    )
    from actionmesh_tpu.models.denoiser import DenoiserConfig

    tiny_dit = DenoiserConfig(
        num_tokens_nominal=spec.latent_tokens,
        temporal_context_size=1,
        in_channels=spec.latent_channels,
        num_layers=1,
        num_attention_heads=2,
        width=32,
        cross_attention_dim=spec.dino_hidden,
        inflated_layers=(),
    )
    vae = MeanEncodeVAE(
        TripoSGPipeline.from_random(
            seed=spec.vae_seed,
            dtype=jnp.float32,
            dit_cfg=tiny_dit,
            vae_cfg=spec.vae_config(),
            image_encoder=image_encoder,
            attn_impl="chunked",
        )
    )
    return image_encoder, vae


# ---------------------------------------------------------------------------
# Dataset build
# ---------------------------------------------------------------------------


def build_dataset(
    root: str | Path,
    spec: CascadeSpec,
    n_train: int = 48,
    n_eval: int = 8,
    seed: int = 0,
) -> dict:
    """Generate scenes + renders + GT + training clips/tracks under ``root``.

    Layout:
      root/spec.json                 the CascadeSpec (single source of truth)
      root/split.json                {"train": [...uids], "eval": [...uids]}
      root/frames/{uid}/frame_%02d.png   RGBA video frames (normalized space)
      root/anchor/{uid}.glb          raw anchor mesh (pipeline 3D input)
      root/gt/{uid}/surfaces.npy     (T, gt_points, 6) raw-space tracked GT
      root/tracks/{uid}/surfaces.npy (T, track_points, 6) normalized tracks
      root/clips_train/{uid}.npz     Stage-I training clips (training/data.py)
      root/clips_eval/{uid}.npz      held-out clips (eval loss only)
    """
    from actionmesh_tpu.preprocessing.image import ImagePreprocessor
    from actionmesh_tpu.preprocessing.mesh import normalize_mesh, sample_surface
    from actionmesh_tpu.training.data import write_clip

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    spec.save(root / "spec.json")
    image_encoder, vae = make_conditioning_stack(spec)
    preproc = ImagePreprocessor()

    uids = {"train": [], "eval": []}
    for i in range(n_train + n_eval):
        split = "train" if i < n_train else "eval"
        uid = f"scene_{i:04d}"
        scene_seed = seed * 100_003 + i
        meshes = make_scene(scene_seed, spec)

        # normalized-space sequence (the anchor transform inference applies)
        _, center, factor = normalize_mesh(meshes[0])
        normed = [
            Mesh((m.vertices - center) * factor, m.faces) for m in meshes
        ]

        # ground truth (raw space) + decoder tracks (normalized space)
        gt_dir = root / "gt" / uid
        gt_dir.mkdir(parents=True, exist_ok=True)
        np.save(
            gt_dir / "surfaces.npy",
            tracked_points(meshes, spec.gt_points, seed=scene_seed + 7),
        )
        tr_dir = root / "tracks" / uid
        tr_dir.mkdir(parents=True, exist_ok=True)
        tracks = tracked_points(normed, spec.track_points, seed=scene_seed + 11)
        assert np.abs(tracks[..., :3]).max() <= 1.031, uid
        tracks[..., :3] = np.clip(tracks[..., :3], -1.0, 1.0)
        np.save(tr_dir / "surfaces.npy", tracks)

        # anchor mesh (raw) — the pipeline's 3D input
        (root / "anchor").mkdir(exist_ok=True)
        meshes[0].export(root / "anchor" / f"{uid}.glb")

        # RGBA video frames (rendered in normalized space)
        frames = render_frames(normed, spec)
        f_dir = root / "frames" / uid
        f_dir.mkdir(parents=True, exist_ok=True)
        for t, fr in enumerate(frames):
            fr.save(f_dir / f"frame_{t:02d}.png")

        # Stage-I clip: frozen-DINOv2 context of PREPROCESSED frames +
        # frozen-VAE mean latents of per-frame surfaces — the identical
        # conditioning construction the pipeline performs at inference.
        pre = preproc.process_images(list(frames))
        context = np.asarray(image_encoder.encode_images(pre), np.float32)
        surf = np.stack(
            [
                sample_surface(
                    m,
                    n_points=spec.surface_samples,
                    seed=scene_seed + 101 + t,
                    with_normals=True,
                )
                for t, m in enumerate(normed)
            ]
        )
        latents = np.asarray(vae.encode_to_latent(surf), np.float32)
        clip_dir = root / ("clips_train" if split == "train" else "clips_eval")
        clip_dir.mkdir(exist_ok=True)
        write_clip(
            clip_dir / f"{uid}.npz",
            latents=latents,
            context=context,
            framestep=np.arange(spec.n_frames, dtype=np.float32),
        )
        uids[split].append(uid)
        logger.info("built %s (%s): lam-bounded, |latents| std %.3f",
                    uid, split, latents.std())

    (root / "split.json").write_text(json.dumps(uids, indent=2))
    return uids


# ---------------------------------------------------------------------------
# Stage-0 training data (SDF ground truth + anchor clips)
# ---------------------------------------------------------------------------


def scene_surfaces(
    normed: list[Mesh], spec: CascadeSpec, scene_seed: int
) -> np.ndarray:
    """(T, N, 6) per-frame surface samples of the normalized scene — the
    SAME seeded draw build_dataset encodes clips from and the inference
    pipeline's surface sampling conventions use; keep the two callers'
    seeds in lockstep."""
    from actionmesh_tpu.preprocessing.mesh import sample_surface

    return np.stack(
        [
            sample_surface(
                m,
                n_points=spec.surface_samples,
                seed=scene_seed + 101 + t,
                with_normals=True,
            )
            for t, m in enumerate(normed)
        ]
    )


def build_sdf_dataset(
    root: str | Path,
    spec: CascadeSpec,
    uids: list[str],
    build_seed: int = 0,
    n_near: int = 3072,
    n_uniform: int = 1024,
    tsdf_clamp: float = 0.25,
) -> None:
    """Write VAE supervision per scene: root/sdf/{uid}.npz with the anchor's
    surface samples, a near-surface + uniform query pool, and the EXACT
    truncated signed distance (preprocessing/sdf) in normalized space."""
    from actionmesh_tpu.preprocessing.mesh import normalize_mesh
    from actionmesh_tpu.preprocessing.sdf import mesh_tsdf, sample_sdf_queries

    root = Path(root)
    out_dir = root / "sdf"
    out_dir.mkdir(parents=True, exist_ok=True)
    for uid in uids:
        idx = int(uid.rsplit("_", 1)[1])
        scene_seed = build_seed * 100_003 + idx
        meshes = make_scene(scene_seed, spec)
        anchor_n, _, _ = normalize_mesh(meshes[0])
        pool = sample_sdf_queries(
            anchor_n, n_near, n_uniform, seed=scene_seed + 31
        )
        tsdf = mesh_tsdf(pool, anchor_n, clamp=tsdf_clamp)
        surface = scene_surfaces(
            [anchor_n], spec, scene_seed
        )[0]  # anchor frame only, same seeded draw as the clip encode
        np.savez(
            out_dir / f"{uid}.npz", surface=surface, points=pool, tsdf=tsdf
        )
        logger.info(
            "sdf %s: inside frac %.2f, |tsdf| mean %.3f",
            uid, float((tsdf < 0).mean()), float(np.abs(tsdf).mean()),
        )


def load_sdf_dataset(root: str | Path, uids: list[str]) -> list[dict]:
    """Materialize SDF scene dicts for training/vae_train.sdf_batches."""
    out = []
    for uid in uids:
        with np.load(Path(root) / "sdf" / f"{uid}.npz") as z:
            out.append({k: z[k] for k in ("surface", "points", "tsdf")})
    return out


def reencode_clips(
    root: str | Path, spec: CascadeSpec, vae, build_seed: int = 0
) -> None:
    """Rewrite clips_train/clips_eval latents through a (re)trained VAE.

    The Stage-0 extension changes the latent definition from the frozen
    random VAE to the trained one, so Stage I/II must retrain on
    re-encoded clips. Context/framestep are reused from the existing clip
    files (the frozen DINOv2 is unchanged); surfaces regenerate from the
    scene seeds exactly as build_dataset drew them (scene_surfaces).
    """
    from actionmesh_tpu.preprocessing.mesh import normalize_mesh

    root = Path(root)
    split = json.loads((root / "split.json").read_text())
    for split_name, clip_sub in (("train", "clips_train"), ("eval", "clips_eval")):
        for uid in split[split_name]:
            idx = int(uid.rsplit("_", 1)[1])
            scene_seed = build_seed * 100_003 + idx
            meshes = make_scene(scene_seed, spec)
            _, center, factor = normalize_mesh(meshes[0])
            normed = [
                Mesh((m.vertices - center) * factor, m.faces) for m in meshes
            ]
            surf = scene_surfaces(normed, spec, scene_seed)
            latents = np.asarray(vae.encode_to_latent(surf), np.float32)
            path = root / clip_sub / f"{uid}.npz"
            with np.load(path) as z:
                context, framestep = z["context"], z["framestep"]
            from actionmesh_tpu.training.data import write_clip

            write_clip(path, latents=latents, context=context, framestep=framestep)
            logger.info("re-encoded %s (%s)", uid, split_name)


def write_stage0_clips(
    root: str | Path, spec: CascadeSpec, vae, uids: list[str]
) -> None:
    """Anchor-only (T=1) clips for Stage-0 DiT flow training: latent =
    trained-VAE posterior MEAN of the anchor surface, context = the
    anchor frame's stored DINOv2 features (bitwise the conditioning the
    inference DiT receives — pipeline preprocesses before Stage 0)."""
    from actionmesh_tpu.training.data import write_clip

    root = Path(root)
    out_dir = root / "clips_stage0"
    out_dir.mkdir(exist_ok=True)
    for uid in uids:
        with np.load(root / "sdf" / f"{uid}.npz") as z:
            surface = z["surface"]
        clip = root / "clips_train" / f"{uid}.npz"
        if not clip.exists():
            clip = root / "clips_eval" / f"{uid}.npz"
        with np.load(clip) as z:
            context = z["context"][:1]
        latent = np.asarray(
            vae.encode_to_latent(surface[None]), np.float32
        )  # (1, K, C): posterior mean (MeanEncodeVAE)
        write_clip(
            out_dir / f"{uid}.npz",
            latents=latent,
            context=context,
            framestep=np.zeros((1,), np.float32),
        )


# ---------------------------------------------------------------------------
# Inference pipeline assembly
# ---------------------------------------------------------------------------


class Stage0Adapter:
    """ImageTo3D adapter over a trained TripoSGPipeline with pinned
    extraction depths (the pipeline's stage_0 config carries steps and
    guidance; depth stays a spec choice at this scale)."""

    def __init__(self, pipeline, dense_depth: int, hier_depth: int):
        self.pipeline = pipeline
        self.dense_depth = dense_depth
        self.hier_depth = hier_depth

    def __call__(self, image, seed=44, num_inference_steps=16,
                 guidance_scale=2.0, **decode_kwargs):
        return self.pipeline(
            image,
            seed=seed,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            dense_octree_depth=self.dense_depth,
            hierarchical_octree_depth=self.hier_depth,
            **decode_kwargs,
        )


def make_trained_stage0(
    spec: CascadeSpec, stage0_dir: str | Path, image_encoder=None
):
    """Trained TripoSGPipeline (dit.npz + vae.npz from the stage0 phase)."""
    import jax.numpy as jnp

    from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline
    from actionmesh_tpu.utils.weights import load_params

    stage0_dir = Path(stage0_dir)
    if image_encoder is None:
        image_encoder, _ = make_conditioning_stack(spec)
    return TripoSGPipeline(
        dit_params=load_params(stage0_dir / "dit.npz"),
        vae_params=load_params(stage0_dir / "vae.npz"),
        image_encoder=image_encoder,
        dit_cfg=spec.stage0_dit_config(),
        vae_cfg=spec.vae_config(),
        dtype=jnp.float32,
        attn_impl="chunked",
    )


def make_pipeline(
    spec: CascadeSpec,
    ckpt_dir: Optional[str | Path] = None,
    extra_updates: Optional[dict] = None,
    stage0_dir: Optional[str | Path] = None,
    video_mode: bool = False,
):
    """Build the REAL pipeline at the spec's tiny scale.

    Default: the {video+3D} pipeline with the frozen conditioning stack
    (tiny DINOv2 + mean-encode random VAE) — Stage I/II params random
    unless ``ckpt_dir`` points at exported native checkpoints.

    ``stage0_dir``: use the TRAINED Stage-0 stack instead of the frozen
    one — the trained VAE becomes the encode path (mean) and, with
    ``video_mode=True``, the plain video->4D ActionMeshPipeline is built
    with the trained TripoSGPipeline as its image_to_3d backend (the
    reference's MAIN entry, ref:inference/video_to_animated_mesh.py).
    """
    import jax.numpy as jnp

    from actionmesh_tpu.models.stage0 import StubImageTo3D
    from actionmesh_tpu.pipeline import ActionMeshPipeline
    from actionmesh_tpu.pipeline_with_3d import ActionMeshPipelineWithMeshInput

    updates = spec.pipeline_updates()
    if stage0_dir is not None:
        updates["stage_0.num_inference_steps"] = spec.stage0_steps
        updates["stage_0.guidance_scale"] = spec.stage0_guidance
    if extra_updates:
        updates.update(extra_updates)
    common = dict(
        config_name="actionmesh",
        weights_dir=None,
        config_updates=updates,
        dtype=jnp.float32,
        device_mesh=None,
    )
    if video_mode:
        pipe = ActionMeshPipeline(**common)
    else:
        pipe = ActionMeshPipelineWithMeshInput(
            surface_samples=spec.surface_samples, **common
        )
    image_encoder, vae = make_conditioning_stack(spec)
    pipe.image_encoder = image_encoder
    if stage0_dir is not None:
        trained = make_trained_stage0(spec, stage0_dir, image_encoder)
        pipe.vae = MeanEncodeVAE(trained)
        pipe.image_to_3d = Stage0Adapter(
            trained, spec.stage0_dense_depth, spec.stage0_hier_depth
        )
    else:
        pipe.vae = vae
        pipe.image_to_3d = StubImageTo3D(
            latent_shape=(spec.latent_tokens, spec.latent_channels)
        )
    if ckpt_dir is not None:
        pipe.load_native(ckpt_dir)
    return pipe


def load_video(root: Path, uid: str, spec: CascadeSpec):
    """ActionMeshInput over the scene's saved RGBA frames."""
    from PIL import Image

    from actionmesh_tpu.io.video_input import ActionMeshInput

    frames = [
        Image.open(root / "frames" / uid / f"frame_{t:02d}.png")
        for t in range(spec.n_frames)
    ]
    return ActionMeshInput(
        frames=frames, timesteps=np.arange(spec.n_frames, dtype=np.float32)
    )


def run_inference(
    root: str | Path,
    pipe,
    uids: list[str],
    out_dir: str | Path,
    spec: CascadeSpec,
    seed: int = 44,
) -> None:
    """Drive the full pipeline on each held-out scene; save pred meshes."""
    root, out_dir = Path(root), Path(out_dir)
    for uid in uids:
        video = load_video(root, uid, spec)
        anchor = load_glb(root / "anchor" / f"{uid}.glb")
        meshes = pipe(video, anchor_mesh=anchor, seed=seed)
        pred = out_dir / uid
        pred.mkdir(parents=True, exist_ok=True)
        for t, m in enumerate(meshes):
            m.export(pred / f"mesh_{t:02d}.glb")
        logger.info("inferred %s: %d meshes", uid, len(meshes))


def run_inference_video(
    root: str | Path,
    pipe,
    uids: list[str],
    out_dir: str | Path,
    spec: CascadeSpec,
    seed: int = 44,
) -> None:
    """Drive the MAIN video->4D entry on each held-out scene: Stage 0
    generates the anchor mesh + latent from the anchor frame alone (no
    ground-truth 3D input anywhere). Outputs live in the pipeline's
    normalized space; ActionBench's rigid+scale ICP absorbs the frame
    difference (ref:actionbench/icp.py:52-112)."""
    root, out_dir = Path(root), Path(out_dir)
    for uid in uids:
        video = load_video(root, uid, spec)
        # A weakly trained Stage 0 can emit a degenerate anchor isosurface
        # for an individual scene; skip it (the harness scores the rest and
        # reports the miss) instead of aborting the variant.
        try:
            meshes = pipe(video, seed=seed)
        except Exception:
            logger.exception("video->4D failed on %s — skipped", uid)
            continue
        pred = out_dir / uid
        pred.mkdir(parents=True, exist_ok=True)
        for t, m in enumerate(meshes):
            m.export(pred / f"mesh_{t:02d}.glb")
        logger.info(
            "video->4D inferred %s: %d meshes, anchor %d verts",
            uid, len(meshes), len(meshes[0].vertices),
        )


def evaluate_predictions(
    root: str | Path,
    pred_dir: str | Path,
    csv_path: str | Path,
    icp_iters: int = 200,
    n_pts_icp: int = 5_000,
    n_pts_chamfer: int = 20_000,
) -> dict:
    """Score pipeline outputs with the full ActionBench harness."""
    from actionbench.evaluate_dataset import evaluate_dataset

    results = evaluate_dataset(
        gt_root=str(Path(root) / "gt"),
        pred_root=str(pred_dir),
        output_csv=str(csv_path),
        icp_iters=icp_iters,
        n_pts_icp=n_pts_icp,
        n_pts_chamfer=n_pts_chamfer,
    )
    df = results.to_dataframe()
    ok = df[df["status"] == "success"]
    return {
        "n_samples": int(len(df)),
        "n_success": int(len(ok)),
        "cd_3d": float(ok["cd_3d"].mean()) if len(ok) else float("nan"),
        "cd_4d": float(ok["cd_4d"].mean()) if len(ok) else float("nan"),
        "cd_motion": float(ok["cd_motion"].mean()) if len(ok) else float("nan"),
    }


def run_inference_oracle(
    root: str | Path,
    pipe,
    uids: list[str],
    out_dir: str | Path,
    spec: CascadeSpec,
    build_seed: int = 0,
    seed: int = 44,
) -> None:
    """Stage-II-only ablation: feed GROUND-TRUTH latents to the decoder.

    Replaces Stage I's generated latents with the frozen VAE's mean encode
    of every frame's true surface (the same construction the training
    clips used), then runs the real Stage-II decode + denormalize +
    re-expansion. Scoring this variant separates decoder error from
    denoiser error in the closed-loop CD table: (oracle - identity) is
    what Stage II loses, (trained - oracle) is what Stage I loses.
    """
    from actionmesh_tpu.preprocessing.mesh import (
        denormalize_mesh,
        normalize_mesh,
        sample_surface,
    )

    root, out_dir = Path(root), Path(out_dir)
    for uid in uids:
        idx = int(uid.rsplit("_", 1)[1])
        scene_seed = build_seed * 100_003 + idx
        meshes_gt = make_scene(scene_seed, spec)
        video = load_video(root, uid, spec)
        anchor = load_glb(root / "anchor" / f"{uid}.glb")

        (
            latent_bank,
            mesh_bank,
            (center, factor),
            vertex_merge_map,
            pre_merge_faces,
        ) = pipe.init_banks_from_anchor(video, anchor, seed)

        normed = [
            Mesh((m.vertices - center) * factor, m.faces) for m in meshes_gt
        ]
        surf = np.stack(
            [
                sample_surface(
                    m, n_points=spec.surface_samples,
                    seed=scene_seed + 101 + t, with_normals=True,
                )
                for t, m in enumerate(normed)
            ]
        )
        latents = pipe.vae.encode_to_latent(surf)  # (T, K, C) mean encode
        latent_bank.update(
            timesteps=video.timesteps[1:], latents=latents[1:]
        )
        mesh_bank = pipe.generate_mesh_animation(
            latent_bank=latent_bank, mesh_bank=mesh_bank
        )
        out = [denormalize_mesh(m, center, factor) for m in mesh_bank.get_ordered()[0]]
        pred = out_dir / uid
        pred.mkdir(parents=True, exist_ok=True)
        for t, m in enumerate(out):
            Mesh(
                vertices=m.vertices[vertex_merge_map],
                faces=pre_merge_faces,
            ).export(pred / f"mesh_{t:02d}.glb")
        logger.info("oracle-decoded %s: %d meshes", uid, len(out))
