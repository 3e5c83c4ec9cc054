"""RMBG-1.4 background matting model (BriaRMBG, U2-Net ISNet family).

TPU-native replacement for the reference's HF trust_remote_code RMBG wrapper
(reference: actionmesh/preprocessing/background_removal.py:41-148). The
architecture is ISNet: a U2-Net-style encoder-decoder of RSU (ReSidual
U-blocks) predicting a 1-channel matte at 1024x1024.

Weight conversion consumes the briaai/RMBG-1.4 torch checkpoint. Until the
full RSU stack lands, `from_pretrained` raises a clear error if invoked
without weights; frames with valid alpha bypass matting entirely upstream.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


class RMBGModel:
    """Placeholder interface for the JAX ISNet port (full port tracked in
    the build plan; the bundled example assets all ship alpha masks, which
    skip matting upstream)."""

    @classmethod
    def from_pretrained(cls, path: Path) -> "RMBGModel":
        raise NotImplementedError(
            "RMBG-1.4 JAX port: weight conversion requires the ISNet RSU "
            "stack which is not yet implemented. Provide RGBA inputs or "
            "*_mask.png pairs in the meantime."
        )

    def predict_alpha(self, frame: Image.Image) -> np.ndarray:
        raise NotImplementedError
