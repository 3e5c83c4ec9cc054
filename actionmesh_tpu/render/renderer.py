"""Software z-buffer mesh rasterizer (vectorized numpy, host-side).

Counterpart of reference actionmesh/render/renderer.py:43-185 (pytorch3d
CUDA rasterizer + HardPhong / soft vertex-normal shading + 2x supersampling
with avg-pool downsample). Matches that fidelity on the preview path:

- per-pixel depth test (z-buffer), so intersecting/overlapping geometry
  renders correctly (the round-1 painter's algorithm did not);
- perspective-correct barycentric interpolation of vertex attributes;
- ``mode="normal"``: smooth vertex-normal shading mapped to RGB exactly as
  the reference's ``soft_normal_shading`` (view-transform with half
  translation, normalize, (n+1)/2) composited on white — this is what
  ``grid_normal.mp4`` shows;
- ``mode="shaded"``: two-sided Phong (ambient + diffuse + specular) with
  interpolated normals;
- 2x supersampling + 2x2 box downsample (reference: avg_pool2d k=2 s=2).

Pure numpy, no Python-per-face loop: faces are bucketed by screen bbox
size and rasterized as (faces, P, P) broadcast grids; the depth test is a
sort-based first-hit reduction over all candidate samples. Host-only by
design — previews are not on the TPU compute path.
"""

from __future__ import annotations

import numpy as np

from actionmesh_tpu.io.mesh import Mesh

_NEAR = 1e-4  # camera-space near plane; mesh is unit-box, cameras at d=3


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals, (V, 3) unit vectors."""
    v0, v1, v2 = (vertices[faces[:, i]] for i in range(3))
    fn = np.cross(v1 - v0, v2 - v0)  # length = 2*area -> area weighting
    vn = np.zeros_like(vertices)
    for i in range(3):
        np.add.at(vn, faces[:, i], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(norm, 1e-12)


class Renderer:
    def __init__(
        self,
        image_size: int = 256,
        supersample: int = 2,
        background: tuple[float, float, float] = (1.0, 1.0, 1.0),
        base_color: tuple[float, float, float] = (0.55, 0.65, 0.9),
        mode: str = "normal",
        max_samples_per_chunk: int = 4_000_000,
    ):
        assert mode in ("normal", "shaded")
        self.image_size = image_size
        self.supersample = max(1, int(supersample))
        self.background = np.asarray(background, np.float32)
        self.base_color = np.asarray(base_color, np.float32)
        self.mode = mode
        self.max_samples_per_chunk = max_samples_per_chunk

    # -- rasterization core -------------------------------------------------

    def _raster_samples(self, px, py, z_cam, faces, size):
        """All candidate (pixel, face) samples that pass the inside test.

        Returns (flat_idx, depth, bary, face_id); bary is perspective-correct
        normalized weights (M, 3).
        """
        tri_x = px[faces]  # (F, 3)
        tri_y = py[faces]
        tri_z = z_cam[faces]

        # screen bbox per face, clipped to the image
        x0 = np.clip(np.floor(tri_x.min(1)), 0, size - 1).astype(np.int32)
        x1 = np.clip(np.ceil(tri_x.max(1)), 0, size - 1).astype(np.int32)
        y0 = np.clip(np.floor(tri_y.min(1)), 0, size - 1).astype(np.int32)
        y1 = np.clip(np.ceil(tri_y.max(1)), 0, size - 1).astype(np.int32)
        bw = x1 - x0 + 1
        bh = y1 - y0 + 1

        # cull: offscreen, behind camera, degenerate in screen space
        area2 = (tri_x[:, 1] - tri_x[:, 0]) * (tri_y[:, 2] - tri_y[:, 0]) - (
            tri_x[:, 2] - tri_x[:, 0]
        ) * (tri_y[:, 1] - tri_y[:, 0])
        keep = (
            (tri_x.max(1) >= 0)
            & (tri_x.min(1) < size)
            & (tri_y.max(1) >= 0)
            & (tri_y.min(1) < size)
            & (tri_z.min(1) > _NEAR)
            & (np.abs(area2) > 1e-12)
        )

        out_idx, out_z, out_bary, out_fid = [], [], [], []
        max_dim = np.maximum(bw, bh)
        all_fids = np.arange(len(faces), dtype=np.int32)
        # bucket faces by bbox size so each bucket broadcasts a fixed grid
        bounds = [1]
        while bounds[-1] < size:
            bounds.append(min(bounds[-1] * 4, size))
        lo = 0
        for hi in bounds:
            sel = keep & (max_dim > lo) & (max_dim <= hi)
            lo = hi
            if not sel.any():
                continue
            fids = all_fids[sel]
            per_face = hi * hi
            chunk = max(1, self.max_samples_per_chunk // per_face)
            for s in range(0, len(fids), chunk):
                f = fids[s : s + chunk]
                r = self._raster_bucket(
                    tri_x[f], tri_y[f], tri_z[f], x0[f], y0[f], hi, f, size
                )
                if r is not None:
                    out_idx.append(r[0])
                    out_z.append(r[1])
                    out_bary.append(r[2])
                    out_fid.append(r[3])
        if not out_idx:
            return None
        return (
            np.concatenate(out_idx),
            np.concatenate(out_z),
            np.concatenate(out_bary),
            np.concatenate(out_fid),
        )

    @staticmethod
    def _raster_bucket(tx, ty, tz, x0, y0, P, fids, size):
        """Rasterize one bucket of faces over local (P, P) pixel grids."""
        F = len(fids)
        gx = x0[:, None, None] + np.arange(P, dtype=np.int32)[None, None, :]
        gy = y0[:, None, None] + np.arange(P, dtype=np.int32)[None, :, None]
        cx = gx.astype(np.float32) + 0.5  # pixel centers
        cy = gy.astype(np.float32) + 0.5

        # edge functions -> screen-space barycentrics
        ax, ay = tx[:, 0, None, None], ty[:, 0, None, None]
        bx, by = tx[:, 1, None, None], ty[:, 1, None, None]
        qx, qy = tx[:, 2, None, None], ty[:, 2, None, None]
        den = (by - qy) * (ax - qx) + (qx - bx) * (ay - qy)
        den = np.where(np.abs(den) < 1e-12, 1e-12, den)
        w0 = ((by - qy) * (cx - qx) + (qx - bx) * (cy - qy)) / den
        w1 = ((qy - ay) * (cx - qx) + (ax - qx) * (cy - qy)) / den
        w2 = 1.0 - w0 - w1

        eps = -1e-6
        inside = (
            (w0 >= eps)
            & (w1 >= eps)
            & (w2 >= eps)
            & (gx >= 0)
            & (gx < size)
            & (gy >= 0)
            & (gy < size)
        )
        if not inside.any():
            return None

        # perspective-correct weights: b_i/z_i, renormalized
        inv_z = 1.0 / tz.astype(np.float32)  # (F, 3)
        pw0 = w0 * inv_z[:, 0, None, None]
        pw1 = w1 * inv_z[:, 1, None, None]
        pw2 = w2 * inv_z[:, 2, None, None]
        wsum = pw0 + pw1 + pw2  # = interpolated 1/z
        depth = 1.0 / np.maximum(wsum, 1e-12)

        m = inside
        flat_idx = (gy * size + gx)[m].astype(np.int64)
        bary = np.stack([pw0[m], pw1[m], pw2[m]], axis=-1) / wsum[m][:, None]
        fid = np.broadcast_to(fids[:, None, None], (F, P, P))[m]
        return flat_idx, depth[m], bary.astype(np.float32), fid

    @staticmethod
    def _depth_test(flat_idx, depth):
        """Sort-based first-hit: index of the nearest sample per pixel."""
        order = np.lexsort((depth, flat_idx))
        sorted_idx = flat_idx[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = sorted_idx[1:] != sorted_idx[:-1]
        return order[first]

    def _visibility(self, px, py, z, faces, size):
        """Winning (flat_idx, bary, fid) per covered pixel.

        Prefers the C++ z-buffer scan (native/actionmesh_native.cpp
        rasterize_zbuffer — the counterpart of the reference's pytorch3d
        CUDA rasterizer, ~2 orders faster than the numpy path on this
        single-core host); falls back to the vectorized numpy bucket
        rasterizer + sort-based depth test when the native library is
        unavailable.
        """
        try:
            from actionmesh_tpu.utils.native import rasterize_zbuffer

            win_fid, win_bary = rasterize_zbuffer(
                px, py, z, faces, size, near=_NEAR
            )
            covered = win_fid >= 0
            if not covered.any():
                return None
            flat_idx = np.nonzero(covered)[0]
            return flat_idx, win_bary[covered], win_fid[covered].astype(np.int64)
        except Exception:  # pragma: no cover - toolchain-less hosts
            samples = self._raster_samples(px, py, z, faces, size)
            if samples is None:
                return None
            flat_idx, depth, bary, fid = samples
            win = self._depth_test(flat_idx, depth)
            return flat_idx[win], bary[win], fid[win]

    # -- public API ---------------------------------------------------------

    def render(
        self, mesh: Mesh, camera: dict, return_alpha: bool = False
    ) -> np.ndarray:
        """Render one mesh with one camera -> (H, W, 3) uint8.

        With ``return_alpha=True`` returns (H, W, 4) uint8 where the alpha
        channel is the supersampled pixel-coverage fraction — valid matting
        input for the pipeline's alpha-gated preprocessing
        (preprocessing/image.is_valid_alpha), used to synthesize video
        frames for the closed-loop training experiments.
        """
        size = self.image_size * self.supersample
        R = np.asarray(camera["R"], np.float64)
        t = np.asarray(camera["t"], np.float64)
        focal = float(camera["focal"])

        cam_pts = mesh.vertices @ R.T + t  # (V, 3), z = view depth
        z = np.maximum(cam_pts[:, 2], _NEAR)
        px = (focal * cam_pts[:, 0] / z * 0.5 + 0.5) * size
        py = (0.5 - focal * cam_pts[:, 1] / z * 0.5) * size

        vn = vertex_normals(mesh.vertices, mesh.faces)

        img = np.tile(self.background, (size * size, 1)).astype(np.float32)
        alpha = np.zeros((size * size,), np.float32)
        samples = self._visibility(
            px.astype(np.float32), py.astype(np.float32), z, mesh.faces, size
        )
        if samples is not None:
            flat_idx, bary, fid = samples

            # interpolate vertex normals at the winning samples
            n_tri = vn[mesh.faces[fid]]  # (M, 3, 3)
            n = np.einsum("mi,mij->mj", bary, n_tri)

            if self.mode == "normal":
                # reference soft_normal_shading: world->view transform of the
                # normal as a *point* with half the camera translation, then
                # normalize and map to [0,1] (ref renderer.py:143-171)
                n_view = n @ R.T + 0.5 * t
                n_view /= np.maximum(
                    np.linalg.norm(n_view, axis=1, keepdims=True), 1e-12
                )
                color = (n_view + 1.0) * 0.5
            else:
                pos_tri = cam_pts[mesh.faces[fid]]
                pos = np.einsum("mi,mij->mj", bary, pos_tri)  # view space
                n_view = n @ R.T
                n_view /= np.maximum(
                    np.linalg.norm(n_view, axis=1, keepdims=True), 1e-12
                )
                view_dir = -pos / np.maximum(
                    np.linalg.norm(pos, axis=1, keepdims=True), 1e-12
                )
                # two-sided lighting: flip normals away from the camera
                facing = np.sign(np.sum(n_view * view_dir, axis=1, keepdims=True))
                n_view = n_view * np.where(facing == 0, 1.0, facing)
                light = np.array([0.3, 0.4, -0.85], np.float32)
                light /= np.linalg.norm(light)
                diffuse = np.clip(-(n_view @ light), 0.0, 1.0)[:, None]
                half = view_dir - light
                half /= np.maximum(
                    np.linalg.norm(half, axis=1, keepdims=True), 1e-12
                )
                spec = np.clip(np.sum(n_view * half, axis=1), 0.0, 1.0) ** 32
                color = np.clip(
                    (0.30 + 0.65 * diffuse) * self.base_color
                    + 0.25 * spec[:, None],
                    0.0,
                    1.0,
                )
            img[flat_idx] = color
            alpha[flat_idx] = 1.0

        img = img.reshape(size, size, 3)
        alpha = alpha.reshape(size, size, 1)
        if self.supersample > 1:
            s = self.supersample
            img = img.reshape(
                self.image_size, s, self.image_size, s, 3
            ).mean(axis=(1, 3))
            alpha = alpha.reshape(
                self.image_size, s, self.image_size, s, 1
            ).mean(axis=(1, 3))
        if return_alpha:
            img = np.concatenate([img, alpha], axis=-1)
        return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
