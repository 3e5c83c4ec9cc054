"""Runtime-invariant / error-path contract tests.

The reference guards its contracts with asserts rather than tests
(SURVEY.md §4 item 3: input contract video_input.py:40-55, CFG config
consistency guidance.py:26, deformation topology equality mesh_io.py:71-84).
These tests pin the same failure behavior on our side so refactors cannot
silently drop a guard.
"""

import numpy as np
import pytest
from PIL import Image

from actionmesh_tpu.io.mesh import Mesh
from actionmesh_tpu.io.mesh_io import save_deformation
from actionmesh_tpu.io.video_input import ActionMeshInput, load_frames
from actionmesh_tpu.sampling.guidance import make_guidance


def _frames(n):
    return [Image.new("RGBA", (32, 32), (255, 0, 0, 255)) for _ in range(n)]


class TestInputContract:
    def test_min_frames_enforced(self):
        with pytest.raises(ValueError, match="At least 16 frames"):
            ActionMeshInput(
                frames=_frames(8), timesteps=np.arange(8, dtype=np.float32)
            )

    def test_frame_timestep_length_mismatch(self):
        with pytest.raises(ValueError, match="must match timesteps"):
            ActionMeshInput(
                frames=_frames(16), timesteps=np.arange(17, dtype=np.float32)
            )

    def test_timesteps_must_be_1d(self):
        with pytest.raises(ValueError, match="1D timesteps"):
            ActionMeshInput(
                frames=_frames(16),
                timesteps=np.zeros((16, 1), dtype=np.float32),
            )

    def test_load_frames_missing_dir(self, tmp_path):
        with pytest.raises((ValueError, FileNotFoundError)):
            load_frames(tmp_path / "does_not_exist")

    def test_load_frames_empty_dir(self, tmp_path):
        with pytest.raises(ValueError, match="No images"):
            load_frames(tmp_path)


class TestGuidanceContract:
    def test_branch_count_must_exceed_scales_by_one(self):
        # reference guidance.py:26: len(branches) == len(scales) + 1
        with pytest.raises(AssertionError):
            make_guidance([[0, 1], [1, 1]], [7.5, 3.0])

    def test_valid_config_accepted(self):
        g = make_guidance([[0, 1], [1, 1]], [7.5])
        assert len(g.guidance_at_inference) == 2


class TestDeformationExport:
    def test_empty_mesh_list_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="empty mesh list"):
            save_deformation([], tmp_path / "out.glb")

    def test_topology_mismatch_rejected(self, tmp_path):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
        f = np.array([[0, 1, 2]])
        a = Mesh(v, f)
        b = Mesh(np.vstack([v, [[0, 0, 1]]]), np.array([[0, 1, 3]]))
        with pytest.raises(ValueError, match="vertices|topology"):
            save_deformation([a, b], tmp_path / "out.glb")


class TestChunkingContract:
    def test_window_larger_than_sequence_raises(self):
        # reference clamps go negative for total < size and torch/numpy
        # indexing would silently wrap to the LAST frames; unreachable in
        # reference usage, so we fail fast instead (r5 review)
        from actionmesh_tpu.ops.chunking import chunk_from

        with pytest.raises(ValueError, match="exceeds the sequence length"):
            chunk_from(4, 8, 16, 15)
        with pytest.raises(ValueError, match="exceeds the sequence length"):
            chunk_from(3, 5, 6, 2)

    def test_non_unit_timesteps_warn(self, caplog):
        import logging as _logging

        with caplog.at_level(_logging.WARNING,
                             logger="actionmesh_tpu.io.video_input"):
            ActionMeshInput(
                frames=_frames(16),
                timesteps=np.arange(16, dtype=np.float32) * 0.5,
            )
        assert any("not unit-spaced" in r.message for r in caplog.records)

    def test_unit_timesteps_do_not_warn(self, caplog):
        import logging as _logging

        with caplog.at_level(_logging.WARNING,
                             logger="actionmesh_tpu.io.video_input"):
            ActionMeshInput(
                frames=_frames(16), timesteps=np.arange(16, dtype=np.float32)
            )
        assert not [r for r in caplog.records if "not unit-spaced" in r.message]
