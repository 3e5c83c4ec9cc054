"""Image conditioning encoder: DINOv2-L features per frame.

TPU-native counterpart of reference ImageEncoder
(reference: actionmesh/model/image_encoder.py:17-55). Preprocessing follows
HF BitImageProcessor for dinov2: resize shortest edge 256 (bicubic), center
crop 224, ImageNet normalize -> 257 tokens x 1024 per frame. All T frames
encode in one batched jitted forward.
"""

from __future__ import annotations

import functools
import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from actionmesh_tpu.models.dinov2 import (
    DinoV2Config,
    dinov2_forward,
    init_dinov2,
)

logger = logging.getLogger(__name__)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def preprocess_for_dino(
    frames: list[Image.Image],
    resize_shortest: int = 256,
    crop_size: int = 224,
) -> np.ndarray:
    """BitImageProcessor-equivalent: resize/crop/normalize -> (T, H, W, 3)."""
    out = []
    for frame in frames:
        img = frame.convert("RGB")
        w, h = img.size
        scale = resize_shortest / min(w, h)
        new_w, new_h = round(w * scale), round(h * scale)
        img = img.resize((new_w, new_h), Image.BICUBIC)
        left = (new_w - crop_size) // 2
        top = (new_h - crop_size) // 2
        img = img.crop((left, top, left + crop_size, top + crop_size))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
        out.append(arr)
    return np.stack(out)


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"))
def _encode_batch(params, cfg, pixels, attn_impl="auto"):
    return dinov2_forward(params, cfg, pixels, attn_impl=attn_impl)


class ImageEncoder:
    """DINOv2-large wrapper producing (T, S, 1024) context embeddings."""

    def __init__(
        self,
        weights_dir: Optional[Path] = None,
        dtype: jnp.dtype = jnp.bfloat16,
        config: Optional[DinoV2Config] = None,
        init_seed: int = 1,
    ):
        self.config = config or DinoV2Config()
        self._dtype = dtype
        if weights_dir is not None and Path(weights_dir).exists():
            from actionmesh_tpu.utils import weights as weights_util

            logger.info("Loading DINOv2 weights from %s", weights_dir)
            self.params = weights_util.load_dinov2(
                Path(weights_dir), self.config, dtype=dtype
            )
        else:
            logger.warning(
                "DINOv2 weights not found (%s) — using deterministic random "
                "initialization (development mode).",
                weights_dir,
            )
            self.params = init_dinov2(
                jax.random.PRNGKey(init_seed), self.config, dtype=dtype
            )

    def encode_images(self, images: list[Image.Image]) -> jnp.ndarray:
        pixels = jnp.asarray(preprocess_for_dino(images), dtype=self._dtype)
        return _encode_batch(self.params, self.config, pixels)
