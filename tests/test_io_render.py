"""IO + render tests: deformation export, animated GLB, visualizer, w3d pipeline."""

import numpy as np
import pytest
from PIL import Image

from actionmesh_tpu.io.animated_glb import create_animated_glb_native
from actionmesh_tpu.io.mesh import Mesh, load_glb
from actionmesh_tpu.io.mesh_io import save_deformation, save_meshes
from actionmesh_tpu.models.stage0 import make_uv_sphere


def _mesh_seq(n=3):
    meshes = []
    base = make_uv_sphere(n_lat=6, n_lon=8)
    for i in range(n):
        m = base.copy()
        m.vertices = m.vertices + np.array([0.1 * i, 0, 0])
        meshes.append(m)
    return meshes


class TestMeshIO:
    def test_save_deformation_axis_remap(self, tmp_path):
        meshes = _mesh_seq(3)
        vp, fp = save_deformation(meshes, tmp_path / "def")
        verts = np.load(vp)
        faces = np.load(fp)
        assert verts.shape == (3, meshes[0].n_vertices, 3)
        assert faces.shape == (meshes[0].n_faces, 3)
        # remap: out = [-z, x, y]
        orig = meshes[0].vertices
        np.testing.assert_allclose(verts[0, :, 0], -orig[:, 2], atol=1e-6)
        np.testing.assert_allclose(verts[0, :, 1], orig[:, 0], atol=1e-6)
        np.testing.assert_allclose(verts[0, :, 2], orig[:, 1], atol=1e-6)

    def test_save_deformation_rejects_mismatched_topology(self, tmp_path):
        meshes = _mesh_seq(2)
        meshes[1].faces = meshes[1].faces[:-1]
        with pytest.raises(ValueError, match="different face topology"):
            save_deformation(meshes, tmp_path / "def")

    def test_save_meshes(self, tmp_path):
        save_meshes(_mesh_seq(2), str(tmp_path))
        assert (tmp_path / "mesh_00.glb").exists()
        assert (tmp_path / "mesh_01.glb").exists()


class TestAnimatedGLB:
    def test_native_writer_roundtrips_base_mesh(self, tmp_path):
        meshes = _mesh_seq(4)
        verts = np.stack([m.vertices for m in meshes]).astype(np.float32)
        out = tmp_path / "anim.glb"
        create_animated_glb_native(verts, meshes[0].faces, out, fps=8)
        assert out.exists()
        re = load_glb(out)
        assert re.n_vertices == meshes[0].n_vertices
        np.testing.assert_allclose(re.vertices, meshes[0].vertices, atol=1e-6)
        # check morph targets + animation present in the JSON
        import json, struct

        raw = out.read_bytes()
        jlen = struct.unpack_from("<I", raw, 12)[0]
        gltf = json.loads(raw[20 : 20 + jlen])
        assert len(gltf["meshes"][0]["primitives"][0]["targets"]) == 4
        assert len(gltf["animations"]) == 1


class TestRenderer:
    @staticmethod
    def _quad(center, u, v):
        c, u, v = (np.asarray(a, float) for a in (center, u, v))
        verts = np.array([c - u - v, c + u - v, c + u + v, c - u + v])
        return verts, np.array([[0, 1, 2], [0, 2, 3]])

    def test_zbuffer_resolves_intersecting_planes(self):
        """Two planes crossing in an X: each side must show the nearer one.

        Painter's algorithm (sorting whole faces by mean depth) gets this
        wrong; a per-pixel z-buffer gets it right.
        """
        from actionmesh_tpu.render.cameras import get_uniform_cameras
        from actionmesh_tpu.render.renderer import Renderer

        cam = get_uniform_cameras(1)[0]
        R, t = cam["R"], cam["t"]
        cam_loc = -R.T @ t
        fwd = -cam_loc / np.linalg.norm(cam_loc)
        right, up = R[0], R[1]

        va, fa = self._quad([0, 0, 0], right * 0.8 - fwd * 0.5, up * 0.8)
        vb, fb = self._quad([0, 0, 0], right * 0.8 + fwd * 0.5, up * 0.8)
        merged = Mesh(np.vstack([va, vb]), np.vstack([fa, fb + 4]))

        r = Renderer(image_size=128, mode="normal")
        img = r.render(merged, cam).astype(int)
        ra = r.render(Mesh(va, fa), cam).astype(int)
        rb = r.render(Mesh(vb, fb), cam).astype(int)

        left = (slice(40, 88), slice(16, 48))
        rgt = (slice(40, 88), slice(80, 112))
        dl_a = np.abs(img[left] - ra[left]).mean()
        dl_b = np.abs(img[left] - rb[left]).mean()
        dr_a = np.abs(img[rgt] - ra[rgt]).mean()
        dr_b = np.abs(img[rgt] - rb[rgt]).mean()
        assert (dl_a < 2 and dr_b < 2) or (dl_b < 2 and dr_a < 2)

    def test_normal_mode_white_background_and_smooth_interior(self):
        from actionmesh_tpu.render.cameras import get_uniform_cameras
        from actionmesh_tpu.render.renderer import Renderer

        cam = get_uniform_cameras(1)[0]
        sphere = make_uv_sphere(n_lat=24, n_lon=32)
        img = Renderer(image_size=128, mode="normal").render(sphere, cam)
        assert img.shape == (128, 128, 3)
        assert (img[0, 0] == 255).all()
        assert img[40:90, 40:90].std() > 8  # smooth normal gradient

    def test_shaded_mode_runs(self):
        from actionmesh_tpu.render.cameras import get_uniform_cameras
        from actionmesh_tpu.render.renderer import Renderer

        cam = get_uniform_cameras(1)[0]
        sphere = make_uv_sphere(n_lat=12, n_lon=16)
        img = Renderer(image_size=64, mode="shaded").render(sphere, cam)
        assert img.shape == (64, 64, 3)
        assert img.min() < 250  # something was drawn


class TestVisualizer:
    def test_renders_grid_mp4(self, tmp_path):
        from actionmesh_tpu.render.visualizer import ActionMeshVisualizer

        meshes = _mesh_seq(2)
        frames = [Image.new("RGBA", (64, 64), (255, 0, 0, 255))] * 2
        vis = ActionMeshVisualizer(image_size=64)
        out = vis.render(meshes, output_dir=tmp_path, input_frames=frames)
        assert out.exists() or out.with_suffix(".gif").exists()


class TestPipelineWith3D:
    @pytest.mark.slow
    def test_video_and_mesh_to_4d(self, tmp_path):
        """{video+3D} mode on tiny config: topology must be preserved."""
        import jax.numpy as jnp

        from actionmesh_tpu.models.image_encoder import ImageEncoder
        from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline
        from actionmesh_tpu.models.triposg.vae import TripoSGVAEConfig
        from actionmesh_tpu.io.video_input import ActionMeshInput
        from actionmesh_tpu.pipeline_with_3d import ActionMeshPipelineWithMeshInput
        from tests.test_pipeline import TINY_DINO, TINY_UPDATES, make_frames

        pipe = ActionMeshPipelineWithMeshInput(
            config_name="actionmesh",
            weights_dir=None,
            config_updates=dict(TINY_UPDATES),
            dtype=jnp.float32,
            surface_samples=512,
        )
        pipe.image_encoder = ImageEncoder(
            weights_dir=None, dtype=jnp.float32, config=TINY_DINO
        )
        tiny_vae = TripoSGVAEConfig(
            latent_channels=8, num_tokens=16,
            encoder_width=32, encoder_layers=1, encoder_heads=2,
            decoder_width=32, decoder_layers=1, decoder_heads=2,
        )
        pipe.vae = TripoSGPipeline.from_random(
            seed=0, dtype=jnp.float32, vae_cfg=tiny_vae,
            image_encoder=pipe.image_encoder, attn_impl="naive",
        )

        anchor = make_uv_sphere(n_lat=6, n_lon=8)
        anchor.vertices = anchor.vertices * 2.0 + 5.0  # off-center, unnormalized
        orig_faces = anchor.faces.copy()
        orig_n_verts = anchor.n_vertices

        frames = make_frames(16)
        inp = ActionMeshInput(
            frames=frames, timesteps=np.arange(16, dtype=np.float32)
        )
        meshes = pipe(inp, anchor_mesh=anchor, seed=3)
        assert len(meshes) == 16
        for m in meshes:
            assert np.array_equal(m.faces, orig_faces)
            assert m.n_vertices == orig_n_verts
            assert np.isfinite(m.vertices).all()


def test_native_rasterizer_matches_numpy_path():
    """C++ rasterize_zbuffer visibility == the numpy bucket rasterizer.

    Renders a sphere (smooth normals, curved silhouette) plus an
    intersecting plane both ways; images must agree to the last bit
    (identical inside test / depth semantics by construction).
    """
    import numpy as np

    from actionmesh_tpu.io.mesh import Mesh
    from actionmesh_tpu.models.stage0 import make_uv_sphere
    from actionmesh_tpu.render.cameras import get_uniform_cameras
    from actionmesh_tpu.render.renderer import Renderer

    sph = make_uv_sphere(radius=0.6, n_lat=16, n_lon=24)
    plane_v = np.array(
        [[-0.9, 0.0, -0.9], [0.9, 0.1, -0.9], [0.9, 0.1, 0.9], [-0.9, 0.0, 0.9]],
        np.float64,
    )
    plane_f = np.array([[0, 1, 2], [0, 2, 3]])
    mesh = Mesh(
        np.vstack([sph.vertices, plane_v]),
        np.vstack([sph.faces, plane_f + len(sph.vertices)]),
    )

    cam = get_uniform_cameras(2)[1]
    r = Renderer(image_size=96, mode="normal")
    img_native = r.render(mesh, cam)

    def numpy_vis(px, py, z, faces, size):
        samples = r._raster_samples(px, py, z, faces, size)
        if samples is None:
            return None
        flat_idx, depth, bary, fid = samples
        win = r._depth_test(flat_idx, depth)
        return flat_idx[win], bary[win], fid[win]

    r._visibility = numpy_vis
    img_numpy = r.render(mesh, cam)

    diff = np.abs(img_native.astype(int) - img_numpy.astype(int))
    assert (diff.max(axis=-1) <= 1).mean() > 0.999, diff.max()


def test_rasterizer_survives_near_plane_grazing_vertex():
    """A vertex at z ~= near projects to ~1e7 screen coords; the C++ bbox
    clamp must clip in float before the int cast (int32 overflow is UB)."""
    import numpy as np

    from actionmesh_tpu.io.mesh import Mesh
    from actionmesh_tpu.render.cameras import get_uniform_cameras
    from actionmesh_tpu.render.renderer import Renderer

    cam = get_uniform_cameras(1)[0]
    R, t = np.asarray(cam["R"]), np.asarray(cam["t"])
    cam_loc = -R.T @ t
    fwd = -cam_loc / np.linalg.norm(cam_loc)
    v = np.stack([
        cam_loc + fwd * 2e-4,
        cam_loc + fwd * 2.0 + R[0] * 0.5,
        cam_loc + fwd * 2.0 - R[0] * 0.5,
    ])
    img = Renderer(image_size=64).render(Mesh(v, np.array([[0, 1, 2]])), cam)
    assert img.shape == (64, 64, 3)
