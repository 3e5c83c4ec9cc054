"""Background removal: RMBG-1.4 matting + mask refinement.

TPU-native counterpart of the reference background remover
(reference: actionmesh/preprocessing/background_removal.py:41-148).
Frames that already carry a valid binary alpha (e.g. the bundled example
assets or *_mask.png pairs) skip matting entirely, exactly as the
reference does (background_removal.py:114-145).

The matting model (BriaRMBG / U2-Net family) runs batched on device when
weights are present (models/rmbg.py); mask refinement (Otsu threshold +
small-component removal) is host numpy/scipy.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np
from PIL import Image

from actionmesh_tpu.preprocessing.image import is_valid_alpha

logger = logging.getLogger(__name__)


def otsu_threshold(gray: np.ndarray) -> float:
    """Otsu's threshold on a uint8 image (replaces cv2.threshold OTSU)."""
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
    total = gray.size
    sum_total = (np.arange(256) * hist).sum()
    sum_b, w_b, best_t, best_var = 0.0, 0.0, 0, -1.0
    for t in range(256):
        w_b += hist[t]
        if w_b == 0:
            continue
        w_f = total - w_b
        if w_f == 0:
            break
        sum_b += t * hist[t]
        m_b = sum_b / w_b
        m_f = (sum_total - sum_b) / w_f
        var_between = w_b * w_f * (m_b - m_f) ** 2
        if var_between > best_var:
            best_var, best_t = var_between, t
    return float(best_t)


def remove_small_components(mask: np.ndarray, min_size: int) -> np.ndarray:
    """Drop connected components below min_size pixels (replaces skimage)."""
    from scipy import ndimage

    labels, n = ndimage.label(mask)
    if n == 0:
        return mask
    sizes = ndimage.sum_labels(mask, labels, index=np.arange(1, n + 1))
    keep = np.zeros(n + 1, dtype=bool)
    keep[1:] = sizes >= min_size
    return keep[labels]


def refine_mask(mask: np.ndarray, min_size_ratio: float = 0.001) -> np.ndarray:
    """Otsu threshold + remove small components -> binary uint8 mask."""
    t = otsu_threshold(mask)
    binary = mask > t
    binary = remove_small_components(binary, int(binary.size * min_size_ratio))
    return (binary * 255).astype(np.uint8)


class BackgroundRemover:
    """RMBG-1.4 matting with alpha-validity gating."""

    def __init__(self, weights_dir: Optional[Path] = None):
        self._model = None
        self._weights_dir = weights_dir
        if weights_dir is not None and Path(weights_dir).exists():
            from actionmesh_tpu.models.rmbg import RMBGModel

            logger.info("Loading RMBG weights from %s", weights_dir)
            self._model = RMBGModel.from_pretrained(Path(weights_dir))

    def _has_valid_alpha(self, frame: Image.Image) -> bool:
        if frame.mode != "RGBA":
            return False
        alpha = np.asarray(frame)[..., 3]
        return is_valid_alpha(alpha)

    def process_images(self, frames: list[Image.Image]) -> list[Image.Image]:
        needs_matting = [not self._has_valid_alpha(f) for f in frames]
        if not any(needs_matting):
            logger.info("All frames carry valid alpha — skipping matting")
            return frames
        if self._model is None:
            raise RuntimeError(
                "Frames lack valid alpha masks and RMBG weights are not "
                "available. Provide RGBA inputs / *_mask.png pairs, or place "
                "RMBG-1.4 weights under pretrained_weights/RMBG."
            )
        out = []
        for frame, matting in zip(frames, needs_matting):
            if not matting:
                out.append(frame)
                continue
            alpha = self._model.predict_alpha(frame)  # (H, W) uint8
            alpha = refine_mask(alpha)
            rgba = frame.convert("RGB").copy()
            rgba.putalpha(Image.fromarray(alpha))
            out.append(rgba)
        return out
