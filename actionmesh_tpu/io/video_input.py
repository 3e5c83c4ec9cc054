"""Video/image-sequence input loading.

TPU-native counterpart of the reference loaders
(reference: actionmesh/io/video_input.py:27-262). Frames stay host-side PIL
images through preprocessing; timesteps are float32 numpy.
"""

from __future__ import annotations

import dataclasses
import logging
import re
from pathlib import Path
from typing import Optional, Sequence

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)

VIDEO_EXTENSIONS = {".mp4", ".avi", ".mov"}
IMAGE_EXTENSIONS = {".png", ".jpg", ".jpeg", ".webp"}

MIN_FRAMES = 16


def natsorted(paths: Sequence) -> list:
    """Natural sort (numeric-aware), replacing the natsort dependency."""

    def key(p):
        return [
            int(tok) if tok.isdigit() else tok.lower()
            for tok in re.split(r"(\d+)", str(p))
        ]

    return sorted(paths, key=key)


@dataclasses.dataclass
class ActionMeshInput:
    """Frames (list of PIL RGB(A)) + timesteps (N,) float32."""

    frames: list[Image.Image]
    timesteps: np.ndarray

    def __post_init__(self) -> None:
        # user-input contract: ValueError (not assert) so validation
        # survives python -O and maps to a 400 at the serving layer
        self.timesteps = np.asarray(self.timesteps, dtype=np.float32)
        if len(self.frames) < MIN_FRAMES:
            raise ValueError(
                f"At least {MIN_FRAMES} frames are required, "
                f"got {len(self.frames)}"
            )
        if self.timesteps.ndim != 1:
            raise ValueError("Expected 1D timesteps")
        if len(self.frames) != self.timesteps.shape[0]:
            raise ValueError(
                f"Number of frames ({len(self.frames)}) must match "
                f"timesteps ({self.timesteps.shape[0]})"
            )
        # Stage II's subdivision count is int(t_max - t_min + 1)
        # (reference embeddings.py:244-249): non-unit-spaced timesteps
        # yield interpolated output timesteps that coincide with no input
        # frame, so the animation's frame<->mesh correspondence breaks.
        # The reference only ever feeds frame indices; warn, don't reject.
        if self.timesteps.shape[0] > 1:
            gaps = np.diff(self.timesteps)
            if not np.allclose(gaps, 1.0, atol=1e-6):
                logger.warning(
                    "Timesteps are not unit-spaced frame indices (gaps "
                    "%.3g..%.3g): Stage II interpolates int(span+1) output "
                    "timesteps from min to max, which will not coincide "
                    "with your input frames.",
                    float(gaps.min()), float(gaps.max()),
                )

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    def get(self, indices) -> "ActionMeshInput":
        """Window-select a subset (bypasses the MIN_FRAMES invariant)."""
        indices_list = list(np.asarray(indices).reshape(-1))
        out = object.__new__(ActionMeshInput)
        out.frames = [self.frames[int(i)] for i in indices_list]
        out.timesteps = self.timesteps[np.asarray(indices_list, dtype=np.int64)]
        return out


def load_from_image_mask_pairs(
    directory: str | Path, max_frames: Optional[int] = None, stride: int = 1
) -> ActionMeshInput:
    """Load *_image.png + *_mask.png pairs as RGBA frames."""
    directory = Path(directory)
    image_files = sorted(directory.glob("*_image.png"))
    if not image_files:
        raise ValueError(f"No *_image.png files found in '{directory}'")
    image_files = image_files[::stride]
    if max_frames is not None:
        image_files = image_files[:max_frames]

    frames = []
    for image_file in image_files:
        prefix = image_file.stem.replace("_image", "")
        mask_file = directory / f"{prefix}_mask.png"
        if not mask_file.exists():
            raise ValueError(f"No mask found for {image_file.name}: {mask_file}")
        image = Image.open(image_file).convert("RGB")
        mask = Image.open(mask_file).convert("L")
        if image.size != mask.size:
            mask = mask.resize(image.size, Image.LANCZOS)
        rgba = image.copy()
        rgba.putalpha(mask)
        frames.append(rgba)

    logger.info("Loaded %d frames from image+mask pairs: %s", len(frames), directory)
    return ActionMeshInput(
        frames=frames, timesteps=np.arange(len(frames), dtype=np.float32)
    )


def load_from_image_dir(
    path_pattern: str | Path, max_frames: Optional[int] = None, stride: int = 1
) -> ActionMeshInput:
    path_pattern = Path(path_pattern)
    image_paths = natsorted(path_pattern.parent.glob(path_pattern.name))
    if not image_paths:
        raise ValueError(f"No images found matching '{path_pattern}'")
    image_paths = image_paths[::stride]
    if max_frames is not None:
        image_paths = image_paths[:max_frames]
    frames = [Image.open(p).convert("RGBA") for p in image_paths]
    logger.info(
        "Loaded %d frames from image folder: %s", len(frames), path_pattern.parent
    )
    return ActionMeshInput(
        frames=frames, timesteps=np.arange(len(frames), dtype=np.float32)
    )


def load_from_video(
    video_path: str | Path, max_frames: Optional[int] = None, stride: int = 1
) -> ActionMeshInput:
    import cv2

    video_path = Path(video_path)
    if not video_path.exists():
        raise FileNotFoundError(f"Video file not found: {video_path}")
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise RuntimeError(f"Failed to open video: {video_path}")
    try:
        frames = []
        frame_idx = 0
        while True:
            if max_frames is not None and len(frames) >= max_frames:
                break
            ret, frame = cap.read()
            if not ret:
                break
            if frame_idx % stride == 0:
                frame_rgba = cv2.cvtColor(frame, cv2.COLOR_BGR2RGBA)
                frames.append(Image.fromarray(frame_rgba))
            frame_idx += 1
    finally:
        cap.release()
    if not frames:
        raise ValueError(f"No frames could be read from video: {video_path}")
    logger.info("Loaded %d frames from video: %s", len(frames), video_path)
    return ActionMeshInput(
        frames=frames, timesteps=np.arange(len(frames), dtype=np.float32)
    )


def load_frames(
    path: str | Path, max_frames: Optional[int] = None, stride: int = 1
) -> ActionMeshInput:
    """Auto-dispatch: video file / glob pattern / image dir / mask pairs."""
    path = Path(path)
    path_str = str(path)
    if "*" in path_str or "?" in path_str:
        return load_from_image_dir(path, max_frames=max_frames, stride=stride)
    if path.suffix.lower() in VIDEO_EXTENSIONS:
        return load_from_video(path, max_frames=max_frames, stride=stride)
    if path.is_dir():
        if list(path.glob("*_mask.png")):
            return load_from_image_mask_pairs(path, max_frames=max_frames, stride=stride)
        for ext in IMAGE_EXTENSIONS:
            try:
                return load_from_image_dir(
                    path / f"*{ext}", max_frames=max_frames, stride=stride
                )
            except ValueError:
                continue
        raise ValueError(f"No images found in directory: {path}")
    raise ValueError(
        f"Unsupported input: {path}. Expected video file, image pattern, or directory."
    )
