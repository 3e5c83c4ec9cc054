"""{Video + 3D mesh} -> 4D pipeline: animate a user-supplied mesh.

TPU-native counterpart of the reference variant
(reference: actionmesh/pipeline_with_3d.py:27-241). Replaces Stage 0: the
anchor latent comes from encoding the user's mesh surface through the
TripoSG VAE instead of generating one from the anchor frame. After Stage
II, output vertices are re-expanded through the vertex merge map onto the
pre-merge faces so UV/texture topology survives.
"""

from __future__ import annotations

import logging
from typing import Optional

from actionmesh_tpu.io.mesh import Mesh
from actionmesh_tpu.io.video_input import ActionMeshInput
from actionmesh_tpu.pipeline import ActionMeshPipeline
from actionmesh_tpu.preprocessing.mesh import (
    denormalize_mesh,
    merge_and_clean_mesh,
    normalize_mesh,
    sample_surface,
)
from actionmesh_tpu.utils.banks import LatentBank, MeshBank

logger = logging.getLogger(__name__)


class ActionMeshPipelineWithMeshInput(ActionMeshPipeline):
    """Pipeline variant: user anchor mesh encoded via VAE (topology kept)."""

    def __init__(self, *args, surface_samples: int = 16384, **kwargs):
        super().__init__(*args, **kwargs)
        self.surface_samples = surface_samples
        self.vae = None
        self._load_vae()

    def _load_vae(self) -> None:
        """Attach the TripoSG VAE encode path (shared with Stage 0 backend)."""
        from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline

        if hasattr(self.image_to_3d, "encode_to_latent"):
            # TripoSGPipeline or the lazy dev wrapper (stage0.DevTripoSG) —
            # either way the Stage-0 backend's VAE is reused, lazily.
            self.vae = self.image_to_3d
        else:
            # Stub backend: random-init VAE still exercises the full encode
            # path deterministically.
            self.vae = TripoSGPipeline.from_random(
                seed=0, dtype=self._dtype, image_encoder=self.image_encoder
            )

    def init_banks_from_anchor(
        self,
        input: ActionMeshInput,
        anchor_mesh: Mesh,
        seed: int = 44,
    ):
        """Encode the user mesh: merge map -> normalize -> sample -> VAE.

        Returns (latent_bank, mesh_bank, (center, factor), vertex_merge_map,
        pre_merge_faces).
        """
        merged, vertex_merge_map, pre_merge_faces = merge_and_clean_mesh(
            anchor_mesh
        )
        normalized, center, factor = normalize_mesh(merged)
        surface = sample_surface(
            normalized, n_points=self.surface_samples, seed=seed,
            with_normals=True,
        )
        anchor_latent = self.vae.encode_to_latent(surface[None], seed=seed)

        latent_bank = LatentBank(
            empty_dims=self._denoiser_latent_shape, verbose=True
        )
        mesh_bank = MeshBank(verbose=True)
        anchor_timestep = input.timesteps[[self.cfg.anchor_idx]]
        latent_bank.update(timesteps=anchor_timestep, latents=anchor_latent)
        mesh_bank.update(meshes=[normalized], timesteps=anchor_timestep)
        return (
            latent_bank,
            mesh_bank,
            (center, factor),
            vertex_merge_map,
            pre_merge_faces,
        )

    def __call__(
        self,
        input: ActionMeshInput,
        anchor_mesh: Mesh,
        seed: int = 44,
        stage_0_steps: Optional[int] = None,
        face_decimation: Optional[int] = None,
        floaters_threshold: Optional[float] = None,
        stage_1_steps: Optional[int] = None,
        guidance_scales: Optional[list[float]] = None,
        anchor_idx: Optional[int] = None,
    ) -> list[Mesh]:
        """Run {video + 3D} -> 4D. Output meshes keep the input topology."""
        if stage_0_steps is not None:
            self.cfg.stage_0.num_inference_steps = stage_0_steps
        if stage_1_steps is not None:
            self.cfg.scheduler.num_inference_steps = stage_1_steps
        if guidance_scales is not None:
            self.cfg.cf_guidance.guidance_scales = guidance_scales
        if face_decimation is not None:
            self.mesh_process.face_decimation = face_decimation
        if floaters_threshold is not None:
            self.mesh_process.floaters_threshold = floaters_threshold
        if anchor_idx is not None:
            self.cfg.anchor_idx = anchor_idx

        # Shallow-copy so repeated calls stay idempotent (see pipeline.py).
        input = ActionMeshInput(
            frames=list(input.frames), timesteps=input.timesteps.copy()
        )
        input.frames = self.background_removal.process_images(input.frames)
        input.frames = self.image_process.process_images(input.frames)

        (
            latent_bank,
            mesh_bank,
            (center, factor),
            vertex_merge_map,
            pre_merge_faces,
        ) = self.init_banks_from_anchor(input, anchor_mesh, seed)

        context = self.encode_all_frames(input)
        latent_bank = self.generate_3d_latents(
            input, context=context, latent_bank=latent_bank, seed=seed
        )
        mesh_bank = self.generate_mesh_animation(
            latent_bank=latent_bank, mesh_bank=mesh_bank
        )
        meshes = mesh_bank.get_ordered()[0]

        # -- Undo normalization and re-expand to the pre-merge topology
        meshes = [denormalize_mesh(m, center, factor) for m in meshes]
        return [
            Mesh(
                vertices=m.vertices[vertex_merge_map],
                faces=pre_merge_faces,
                uv=anchor_mesh.uv,
                visual=anchor_mesh.visual,
            )
            for m in meshes
        ]
