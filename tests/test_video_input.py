"""Video/image input loader tests (all three loaders + dispatch)."""

import numpy as np
import pytest
from PIL import Image

from actionmesh_tpu.io.video_input import (
    ActionMeshInput,
    load_frames,
    natsorted,
)


def _write_frames(d, n=18, size=(32, 24), prefix="", suffix=".png", mode="RGBA"):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, size=(size[1], size[0], 4), dtype=np.uint8)
        img = Image.fromarray(arr, "RGBA")
        if mode == "RGB":
            img = img.convert("RGB")
        img.save(d / f"{prefix}{i:03d}{suffix}")


def test_natsorted():
    names = ["f10.png", "f2.png", "f1.png"]
    assert natsorted(names) == ["f1.png", "f2.png", "f10.png"]


def test_load_image_dir(tmp_path):
    _write_frames(tmp_path, n=18)
    inp = load_frames(tmp_path)
    assert inp.n_frames == 18
    assert inp.frames[0].mode == "RGBA"
    np.testing.assert_array_equal(inp.timesteps, np.arange(18, dtype=np.float32))


def test_load_with_stride_and_max(tmp_path):
    _write_frames(tmp_path, n=40)
    inp = load_frames(tmp_path, max_frames=16, stride=2)
    assert inp.n_frames == 16


def test_load_image_mask_pairs(tmp_path):
    rng = np.random.default_rng(1)
    tmp_path.mkdir(exist_ok=True)
    for i in range(16):
        img = Image.fromarray(
            rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        )
        img.save(tmp_path / f"{i:03d}_image.png")
        mask = Image.fromarray(
            (rng.random((24, 32)) > 0.5).astype(np.uint8) * 255
        )
        mask.save(tmp_path / f"{i:03d}_mask.png")
    inp = load_frames(tmp_path)
    assert inp.n_frames == 16
    assert inp.frames[0].mode == "RGBA"


def test_load_video_mp4(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 8, (32, 24)
    )
    if not writer.isOpened():
        pytest.skip("no mp4 encoder available")
    rng = np.random.default_rng(2)
    for _ in range(20):
        writer.write(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8))
    writer.release()
    inp = load_frames(path, max_frames=16)
    assert inp.n_frames == 16
    assert inp.frames[0].size == (32, 24)


def test_window_select_bypasses_min_frames():
    frames = [Image.new("RGBA", (8, 8))] * 16
    inp = ActionMeshInput(frames=frames, timesteps=np.arange(16, dtype=np.float32))
    sub = inp.get([3, 1, 2])
    assert sub.n_frames == 3
    np.testing.assert_array_equal(sub.timesteps, [3.0, 1.0, 2.0])


def test_glob_pattern_dispatch(tmp_path):
    _write_frames(tmp_path, n=16)
    inp = load_frames(str(tmp_path / "*.png"))
    assert inp.n_frames == 16
