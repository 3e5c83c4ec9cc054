"""TripoSG image->3D pipeline: DiT flow sampling + VAE decode + extraction.

TPU-native counterpart of the reference's TripoSGPipelinePlus adapter
(reference: actionmesh/external/triposg.py:26-205). Contract: ``__call__``
returns (latents (1, 2048, 64), mesh); ``encode_to_latent`` maps a surface
(B, 16384, 6) to a posterior sample; ``decode_latents`` extracts meshes via
hierarchical SDF-grid evaluation (TPU) + marching triangulation (host).

Sampling: rectified-flow Euler loop as one jitted ``lax.scan`` with
2-branch classifier-free guidance (uncond = zeroed image context), matching
the reference defaults (guidance 7.0 default / 7.5 from config, 2048
tokens, bounds +-1.005, dense depth 8 / hierarchical depth 9).
"""

from __future__ import annotations

import functools
import logging
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from actionmesh_tpu.io.mesh import Mesh
from actionmesh_tpu.models.denoiser import DenoiserConfig
from actionmesh_tpu.models.image_encoder import ImageEncoder
from actionmesh_tpu.models.triposg.dit import (
    init_triposg_dit,
    triposg_dit_config,
    triposg_dit_forward,
)
from actionmesh_tpu.models.triposg.vae import (
    TripoSGVAEConfig,
    decode_kv,
    encode_surface,
    init_triposg_vae,
    query_sdf,
    query_sdf_at_ids,
    query_sdf_grid_inside,
)
from actionmesh_tpu.ops.isosurface import hierarchical_extract_geometry
from actionmesh_tpu.sampling.flow_schedule import get_schedule
from actionmesh_tpu.utils import device_sync

logger = logging.getLogger(__name__)

DEFAULT_BOUNDS = (-1.005, -1.005, -1.005, 1.005, 1.005, 1.005)


@functools.partial(
    jax.jit, static_argnames=("dit_cfg", "guidance_scale", "attn_impl", "mesh")
)
def _flow_sample(
    dit_params,
    dit_cfg: DenoiserConfig,
    init_noise: jnp.ndarray,
    context: jnp.ndarray,
    timesteps: jnp.ndarray,
    distances: jnp.ndarray,
    guidance_scale: float,
    attn_impl: str = "auto",
    mesh=None,
) -> jnp.ndarray:
    """Euler rectified-flow loop with CFG, as one compiled scan.

    Under a device mesh, the CFG pair rides the dp axis and attention
    heads shard over tp (same scheme as Stage I's denoise_window).

    ``guidance_scale=None`` (static) selects the guidance-free path for
    distilled checkpoints: ONE conditional forward per Euler step — the
    CFG batch pair disappears, exactly mirroring Stage I's distilled
    ``guidance_at_inference [[1, 1]]`` sampling (training/distill.py).
    """
    B = init_noise.shape[0]
    if guidance_scale is None:
        # Guidance-free path: batch is 1 (no CFG pair), so the dp axis is
        # deliberately idle — only tp head sharding inside
        # triposg_dit_forward applies under a mesh. Replicate explicitly so
        # GSPMD doesn't infer a degenerate batch partition; the turbo
        # preset's multichip speedup comes from sharded SDF grid decode,
        # not DiT data parallelism (BENCH_NOTES r4l).
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            init_noise = jax.lax.with_sharding_constraint(
                init_noise, NamedSharding(mesh, P())
            )

        def step(latents, inputs):
            t, dist = inputs
            dt = jnp.full((B,), t, jnp.float32)
            v = triposg_dit_forward(
                dit_params, dit_cfg, latents, context, dt,
                attn_impl=attn_impl, mesh=mesh,
            )
            # fp32 Euler step, rounded once on storage (see denoise_loop)
            stepped = latents.astype(jnp.float32) + dist * v.astype(jnp.float32)
            return stepped.astype(latents.dtype), None

        final, _ = jax.lax.scan(
            step,
            init_noise,
            # schedule stays fp32 (bf16 would quantize t by up to 4 near
            # t=1000 before the fp32 embedding sees it)
            (
                timesteps[:-1].astype(jnp.float32),
                distances.astype(jnp.float32),
            ),
        )
        return final

    context_g = jnp.concatenate([jnp.zeros_like(context), context], axis=0)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        context_g = jax.lax.with_sharding_constraint(
            context_g, NamedSharding(mesh, P("dp"))
        )

    def step(latents, inputs):
        t, dist = inputs
        hidden = jnp.concatenate([latents] * 2, axis=0)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            hidden = jax.lax.with_sharding_constraint(
                hidden, NamedSharding(mesh, P("dp"))
            )
        dt = jnp.full((2 * B,), t, jnp.float32)
        pred = triposg_dit_forward(
            dit_params, dit_cfg, hidden, context_g, dt, attn_impl=attn_impl,
            mesh=mesh, uncond_batch=B,
        )
        uncond, cond = jnp.split(pred.astype(jnp.float32), 2, axis=0)
        v = uncond + guidance_scale * (cond - uncond)
        stepped = latents.astype(jnp.float32) + dist * v
        return stepped.astype(latents.dtype), None

    final, _ = jax.lax.scan(
        step,
        init_noise,
        (
            timesteps[:-1].astype(jnp.float32),
            distances.astype(jnp.float32),
        ),
    )
    return final


class TripoSGPipeline:
    """Image -> (3D latent, mesh) backend for Stage 0."""

    def __init__(
        self,
        dit_params,
        vae_params,
        image_encoder: ImageEncoder,
        dit_cfg: Optional[DenoiserConfig] = None,
        vae_cfg: Optional[TripoSGVAEConfig] = None,
        dtype: jnp.dtype = jnp.bfloat16,
        num_train_timesteps: int = 1000,
        shift: float = 3.0,
        attn_impl: str = "auto",
        device_mesh=None,
    ):
        self.dit_cfg = dit_cfg or triposg_dit_config()
        self.vae_cfg = vae_cfg or TripoSGVAEConfig()
        self.dit_params = dit_params
        self.vae_params = vae_params
        self.image_encoder = image_encoder
        self._dtype = dtype
        self._num_train_timesteps = num_train_timesteps
        self._shift = shift
        self._attn_impl = attn_impl
        self.device_mesh = device_mesh
        if device_mesh is not None:
            # The DiT shares the denoiser block structure, so the Megatron
            # col->row sharding tree applies directly; the (small) VAE stays
            # replicated under GSPMD.
            from actionmesh_tpu.parallel.mesh import (
                denoiser_param_shardings,
                shard_params,
            )

            self.dit_params = shard_params(
                self.dit_params,
                denoiser_param_shardings(self.dit_params, device_mesh),
            )

    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        path: Path,
        dtype=jnp.bfloat16,
        image_encoder: Optional[ImageEncoder] = None,
        device_mesh=None,
        allow_unknown_config_keys: bool = False,
    ) -> "TripoSGPipeline":
        """Load a VAST-AI/TripoSG checkpoint (transformer/ + vae/ subfolders).

        Architecture hyperparameters come from each subfolder's config.json.
        FAIL-FAST contract (round-2 verdict): any config.json key this
        mapping does not recognize raises — a silently-defaulted
        hyperparameter would build a wrong model that converts cleanly and
        produces garbage. Pass ``allow_unknown_config_keys=True`` (after
        reading the raised report) to proceed with defaults for keys that
        are genuinely irrelevant. Weight-structure mismatches additionally
        raise from the converters with a full state-dict report, and the
        converted tree is shape-verified against the configured architecture
        (utils/weights.verify_converted).
        """
        import json

        from actionmesh_tpu.models.triposg.dit import triposg_dit_config
        from actionmesh_tpu.utils import weights as weights_util

        path = Path(path)

        def read_config(sub: str) -> dict:
            cfg_path = path / sub / "config.json"
            return json.loads(cfg_path.read_text()) if cfg_path.exists() else {}

        dit_raw = read_config("transformer")
        vae_raw = read_config("vae")

        # HF/diffusers metadata keys that carry no architecture information.
        _META = {
            "_class_name", "_name_or_path", "_diffusers_version",
            "transformers_version", "architectures", "model_type",
            "torch_dtype", "dtype", "_commit_hash", "use_cache",
        }

        def make_picker(raw: dict, which: str):
            recognized: set = set()

            def pick(default, *keys):
                recognized.update(keys)
                for k in keys:
                    if k in raw:
                        return raw[k]
                return default

            def finish():
                unknown = sorted(set(raw) - recognized - _META)
                if unknown and not allow_unknown_config_keys:
                    known = {k: raw[k] for k in sorted(set(raw) & recognized)}
                    raise ValueError(
                        f"TripoSG {which} config.json has keys this mapping "
                        f"does not recognize: {unknown}.\nRecognized keys "
                        f"found: {known}.\nRefusing to silently default — a "
                        "wrong-hyperparameter model would convert cleanly "
                        "and fail only as bad output. Extend the mapping in "
                        "TripoSGPipeline.from_pretrained, or pass "
                        "allow_unknown_config_keys=True if these keys are "
                        "irrelevant to the architecture."
                    )
                elif unknown:
                    logger.warning(
                        "TripoSG %s config: ignoring unknown keys %s",
                        which, unknown,
                    )

            return pick, finish

        pick, dit_finish = make_picker(dit_raw, "transformer")
        dit_cfg = triposg_dit_config(
            num_tokens=pick(2048, "num_tokens", "width_latent"),
            in_channels=pick(64, "in_channels", "latent_channels"),
            num_layers=pick(21, "num_layers", "num_hidden_layers", "num_attention_layers"),
            width=pick(2048, "width", "hidden_size", "inner_dim"),
            num_attention_heads=pick(16, "num_attention_heads", "num_heads"),
            cross_attention_dim=pick(
                1024, "cross_attention_dim", "context_dim", "encoder_hid_dim"
            ),
        )
        pick(64, "out_channels")  # == in_channels for a flow model
        dit_finish()

        pick, vae_finish = make_picker(vae_raw, "vae")
        vae_cfg = TripoSGVAEConfig(
            latent_channels=pick(64, "latent_channels", "embed_dim"),
            num_tokens=pick(2048, "num_tokens", "num_latents"),
            embed_frequency=pick(8, "embed_frequency", "num_freqs"),
            encoder_width=pick(512, "width_encoder", "encoder_width"),
            encoder_layers=pick(8, "num_layers_encoder", "encoder_layers"),
            decoder_width=pick(1024, "width_decoder", "decoder_width", "width"),
            decoder_layers=pick(16, "num_layers_decoder", "decoder_layers", "num_layers"),
        )
        vae_finish()

        dit_state = weights_util.load_safetensors_dir(path / "transformer")
        vae_state = weights_util.load_safetensors_dir(path / "vae")
        dit_params = weights_util.convert_triposg_dit(dit_state, dit_cfg, dtype)
        vae_params = weights_util.convert_triposg_vae(vae_state, vae_cfg, dtype)
        return cls(
            dit_params=dit_params,
            vae_params=vae_params,
            image_encoder=image_encoder
            or ImageEncoder(weights_dir=path.parent / "dinov2", dtype=dtype),
            dit_cfg=dit_cfg,
            vae_cfg=vae_cfg,
            dtype=dtype,
            device_mesh=device_mesh,
        )

    @classmethod
    def from_random(
        cls,
        seed: int = 0,
        dtype=jnp.bfloat16,
        dit_cfg: Optional[DenoiserConfig] = None,
        vae_cfg: Optional[TripoSGVAEConfig] = None,
        image_encoder: Optional[ImageEncoder] = None,
        attn_impl: str = "auto",
        device_mesh=None,
    ) -> "TripoSGPipeline":
        dit_cfg = dit_cfg or triposg_dit_config()
        vae_cfg = vae_cfg or TripoSGVAEConfig()
        kd, kv = jax.random.split(jax.random.PRNGKey(seed))
        return cls(
            dit_params=init_triposg_dit(kd, dit_cfg, dtype=dtype),
            vae_params=init_triposg_vae(kv, vae_cfg, dtype=dtype),
            image_encoder=image_encoder
            or ImageEncoder(weights_dir=None, dtype=dtype),
            dit_cfg=dit_cfg,
            vae_cfg=vae_cfg,
            dtype=dtype,
            attn_impl=attn_impl,
            device_mesh=device_mesh,
        )

    # ------------------------------------------------------------------

    def __call__(
        self,
        image,
        seed: int = 44,
        num_inference_steps: int = 100,
        guidance_scale: float = 7.5,
        bounds=DEFAULT_BOUNDS,
        dense_octree_depth: int = 8,
        hierarchical_octree_depth: int = 9,
        prefilter_octree_depth: Optional[int] = None,
        coarse_decode_dtype: Optional[str] = None,
    ) -> tuple[jnp.ndarray, Mesh]:
        """Generate (latents (1, K, C), mesh) from one image.

        ``guidance_scale <= 0`` selects guidance-free sampling (one
        conditional forward per step) — the serving mode for a
        guidance-distilled Stage-0 checkpoint (config knob
        ``stage_0.guidance_scale: 0``).
        """
        t0 = time.perf_counter()
        context = self.image_encoder.encode_images([image])  # (1, S, Dc)
        t1 = time.perf_counter()
        logger.info("stage0 encode_image: %.2fs", t1 - t0)
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(
            key,
            (1, self.vae_cfg.num_tokens, self.vae_cfg.latent_channels),
            self._dtype,
        )
        ts, dist = get_schedule(
            num_inference_steps, self._num_train_timesteps, self._shift
        )
        # Segmented launches: bounds per-program device time and shares one
        # compiled program across different total step counts (see
        # sampling/denoise_loop.denoise_window_segmented for rationale).
        latents = noise
        steps_per_launch = 25
        done = 0
        while done < num_inference_steps:
            seg = min(steps_per_launch, num_inference_steps - done)
            latents = _flow_sample(
                self.dit_params,
                self.dit_cfg,
                latents,
                context.astype(self._dtype),
                jnp.asarray(ts[done : done + seg + 1]),
                jnp.asarray(dist[done : done + seg]),
                guidance_scale=(
                    None if guidance_scale <= 0 else float(guidance_scale)
                ),
                attn_impl=self._attn_impl,
                mesh=self.device_mesh,
            )
            done += seg
        # block_until_ready does not synchronize through the axon tunnel;
        # force a device->host transfer so the phase split is real
        device_sync(latents)
        t2 = time.perf_counter()
        logger.info(
            "stage0 dit_sample (%d steps): %.2fs", num_inference_steps, t2 - t1
        )
        meshes = self.decode_latents(
            latents,
            bounds=bounds,
            dense_octree_depth=dense_octree_depth,
            hierarchical_octree_depth=hierarchical_octree_depth,
            prefilter_octree_depth=prefilter_octree_depth,
            coarse_decode_dtype=coarse_decode_dtype,
        )
        logger.info("stage0 decode_latents: %.2fs", time.perf_counter() - t2)
        return latents.astype(jnp.float32), meshes[0]

    # ------------------------------------------------------------------

    def encode_to_latent(
        self, surface: jnp.ndarray, seed: Optional[int] = None
    ) -> jnp.ndarray:
        """surface (B, N, 6) -> latent posterior sample (B, K, C)."""
        fps_key = noise_key = None
        if seed is not None:
            fps_key, noise_key = jax.random.split(jax.random.PRNGKey(seed))
        return encode_surface(
            self.vae_params,
            self.vae_cfg,
            jnp.asarray(surface),
            fps_key=fps_key,
            noise_key=noise_key,
            attn_impl=self._attn_impl,
        ).astype(jnp.float32)

    def decode_latents(
        self,
        latents: jnp.ndarray,
        bounds=DEFAULT_BOUNDS,
        dense_octree_depth: int = 8,
        hierarchical_octree_depth: int = 9,
        prefilter_octree_depth: Optional[int] = None,
        coarse_decode_dtype: Optional[str] = None,
    ) -> list[Mesh]:
        """Latents -> meshes via hierarchical SDF extraction.

        Speed knobs (both opt-in, preset-controlled):
          * ``prefilter_octree_depth``: two-level coarse pass
            (ops/isosurface.py) — dense-lattice queries drop to the
            surface band;
          * ``coarse_decode_dtype`` ("bfloat16"): coarse sign queries in
            bf16 (fine pass stays fp32; upstream runs its whole decode in
            fp16, so this is strictly more accurate than the reference).
        """
        latents = jnp.asarray(latents, self._dtype)
        coarse_cd = (
            jnp.dtype(coarse_decode_dtype) if coarse_decode_dtype else None
        )
        meshes = []
        for b in range(latents.shape[0]):
            kv = decode_kv(
                self.vae_params, self.vae_cfg, latents[b : b + 1],
                attn_impl=self._attn_impl,
            )

            def sdf_fn(pts: np.ndarray) -> np.ndarray:
                vals = query_sdf(
                    self.vae_params,
                    self.vae_cfg,
                    kv,
                    jnp.asarray(pts, jnp.float32)[None],
                    attn_impl=self._attn_impl,
                )
                out = np.asarray(vals[0], np.float32)
                reg = getattr(self, "sdf_regularizer", None)
                if reg is not None:
                    # dev-mode only (models/stage0.DevTripoSG): tame the
                    # random-weight noise field; never set for real weights
                    out = reg(pts, out)
                return out

            # Device fast paths: on-device lattice-point generation, all
            # chunks in one lax.scan dispatch, sign-only coarse download
            # (~3x faster through the TPU tunnel, BENCH_NOTES r3g). Only
            # usable when there is no host-side regularizer or its jax
            # mirror is provided (dev mode sets both).
            reg_host = getattr(self, "sdf_regularizer", None)
            reg_jax = getattr(self, "sdf_regularizer_jax", None)
            grid_inside_fn = ids_val_fn = None
            if reg_host is None or reg_jax is not None:

                def grid_inside_fn(lo, step, Rc, level):
                    return np.asarray(
                        query_sdf_grid_inside(
                            self.vae_params, self.vae_cfg, kv,
                            jnp.asarray(lo), jnp.asarray(step),
                            jnp.float32(level), Rc=Rc,
                            attn_impl=self._attn_impl, regularizer=reg_jax,
                            mesh=self.device_mesh,
                            compute_dtype=coarse_cd,
                        )
                    )

                def ids_val_fn(ijk, lo, fine_step):
                    return np.asarray(
                        query_sdf_at_ids(
                            self.vae_params, self.vae_cfg, kv,
                            jnp.asarray(ijk), jnp.asarray(lo),
                            jnp.asarray(fine_step),
                            attn_impl=self._attn_impl, regularizer=reg_jax,
                            mesh=self.device_mesh,
                        )
                    )

            # sign-only variant for the prefilter coarse/band passes —
            # without this the bf16 knob would only touch the 65^3
            # prefilter grid, not the ~1M band sign queries (r5 review)
            ids_val_coarse_fn = None
            if ids_val_fn is not None and coarse_cd is not None:

                def ids_val_coarse_fn(ijk, lo, fine_step):
                    return np.asarray(
                        query_sdf_at_ids(
                            self.vae_params, self.vae_cfg, kv,
                            jnp.asarray(ijk), jnp.asarray(lo),
                            jnp.asarray(fine_step),
                            attn_impl=self._attn_impl, regularizer=reg_jax,
                            mesh=self.device_mesh, compute_dtype=coarse_cd,
                        )
                    )

            v, f = hierarchical_extract_geometry(
                sdf_fn,
                bounds=bounds,
                dense_octree_depth=dense_octree_depth,
                hierarchical_octree_depth=hierarchical_octree_depth,
                grid_inside_fn=grid_inside_fn,
                ids_val_fn=ids_val_fn,
                prefilter_octree_depth=prefilter_octree_depth,
                ids_val_coarse_fn=ids_val_coarse_fn,
            )
            if len(f) == 0:
                logger.warning(
                    "SDF field has no zero crossing in bounds — returning an "
                    "empty mesh (latent %d).", b,
                )
            meshes.append(Mesh(vertices=v, faces=f))
        return meshes
