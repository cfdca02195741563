"""Synthetic aerial-survey loader: N-camera serpentine capture of a textured
terrain, rendered on demand with exact GT poses.

Fills the role of the reference's large CI benchmark scenes
(.github/workflows/benchmark.yml:12-28 — palace-fine-arts-281,
gerrard-hall-100, south-building-128) in an environment where only the
12-image door is mounted: a deterministic >=100-image sequential scene that
exercises retrieval windows, the full SIFT front-end, cycle filtering,
averaging, and the camera-banded BA path at scale, with ground truth for
pose-error evaluation.

Geometry: cameras at altitude above a smooth random height-field
z = h(x, y), looking near-nadir with small random tilts, following a
serpentine (boustrophedon) survey path with ~75% along-track overlap.
Rendering is exact ray casting: for each pixel the ray/terrain intersection
is found by fixed-point iteration (terrain slope << 1 guarantees
contraction), then a smooth random albedo texture is sampled. Everything is
seeded — two loaders with the same parameters produce identical datasets.
"""

from __future__ import annotations

import numpy as np

from gtsfm_tpu.common.image import Image
from gtsfm_tpu.loader.base import LoaderBase


def _smooth_grid(rng: np.random.Generator, n: int, sigma: float) -> np.ndarray:
    from scipy.ndimage import gaussian_filter

    g = gaussian_filter(rng.standard_normal((n, n)), sigma, mode="wrap")
    g -= g.min()
    g /= max(g.max(), 1e-9)
    return g.astype(np.float32)


class SyntheticAerialLoader(LoaderBase):
    def __init__(
        self,
        num_images: int = 200,
        height: int = 384,
        width: int = 512,
        rows: int = 8,
        altitude: float = 10.0,
        terrain_relief: float = 1.5,
        focal: float = 500.0,
        seed: int = 0,
        max_resolution: int = 760,
    ):
        super().__init__(max_resolution=max_resolution)
        self._n = int(num_images)
        self._h, self._w = int(height), int(width)
        self._f = float(focal)
        rng = np.random.default_rng(seed)

        # Terrain field over [0, S] x [0, S] world units (S set below).
        self._grid_n = 512
        self._terrain = _smooth_grid(rng, self._grid_n, 12.0) * terrain_relief
        self._tex_rng = rng

        # Serpentine path with survey-style overlap: ~75% along-track
        # (0.25-footprint spacing) and ~50% sidelap (0.5-footprint row
        # spacing) so the pair graph is CONNECTED across rows. Footprint
        # ~ altitude * width / focal.
        cols = (self._n + rows - 1) // rows
        foot = altitude * self._w / self._f
        x_span = (cols - 1) * foot * 0.25
        y_span = (rows - 1) * foot * 0.5
        self._world_size = max(x_span, y_span) + 2.0 * foot
        xs = foot + np.linspace(0.0, x_span, cols)
        ys = foot + np.linspace(0.0, y_span, max(rows, 1)) if rows > 1 else np.asarray([foot])
        centers, rots = [], []
        for r in range(rows):
            order = xs if r % 2 == 0 else xs[::-1]
            for x in order:
                if len(centers) >= self._n:
                    break
                c = np.asarray(
                    [x, ys[r], altitude + rng.normal() * 0.1], np.float32
                )
                # Near-nadir: camera +z looks DOWN (world -z) with small tilt.
                ax = rng.normal(size=3) * 0.03
                Rt = _small_rotation(ax) @ np.diag([1.0, -1.0, -1.0]).astype(np.float32)
                centers.append(c)
                rots.append(Rt.astype(np.float32))
        self._wti = np.stack(centers)
        self._wRi = np.stack(rots)

        # Multi-octave albedo texture, band-limited IN PIXELS regardless of
        # world size: octave k samples an independent smooth 512-grid at
        # frequency 2^k (wrap). The octave count is chosen so the finest
        # octave has ~3 px features at the render resolution — keypoint
        # density then stays constant as the survey area (world_size) grows
        # with the image count. Aliased or too-smooth texture collapses SIFT
        # keypoint counts and with them the whole pair graph.
        px_world = altitude / self._f  # world units per pixel at nadir
        feat_world_base = self._world_size * (8.0 / 512.0)  # octave-0 feature
        n_oct = max(
            2,
            int(np.ceil(np.log2(max(feat_world_base / (3.0 * px_world), 2.0)))) + 1,
        )
        self._tex_octaves = [
            _smooth_grid(self._tex_rng, 512, 8.0) for _ in range(n_oct)
        ]
        self._cache: dict[int, Image] = {}

    # ------------------------------------------------------------ LoaderBase

    def __len__(self) -> int:
        return self._n

    def get_camera_intrinsics_full_res(self, index: int) -> np.ndarray:
        return np.asarray(
            [self._f, 0.0, 0.0, self._w / 2.0, self._h / 2.0], np.float32
        )

    def get_camera_pose(self, index: int):
        return self._wRi[index], self._wti[index]

    def _field(self, grid: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Bilinear sample of a wrap-mode field over [0, world_size]^2."""
        n = grid.shape[0]
        u = (x / self._world_size) * n
        v = (y / self._world_size) * n
        u0 = np.floor(u).astype(np.int64)
        v0 = np.floor(v).astype(np.int64)
        fu = (u - u0).astype(np.float32)
        fv = (v - v0).astype(np.float32)
        u0 %= n
        v0 %= n
        u1 = (u0 + 1) % n
        v1 = (v0 + 1) % n
        return (
            grid[v0, u0] * (1 - fv) * (1 - fu)
            + grid[v0, u1] * (1 - fv) * fu
            + grid[v1, u0] * fv * (1 - fu)
            + grid[v1, u1] * fv * fu
        )

    def get_image_full_res(self, index: int) -> Image:
        if index in self._cache:
            return self._cache[index]
        H, W, f = self._h, self._w, self._f
        R = self._wRi[index]
        c = self._wti[index]
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        d_cam = np.stack(
            [(xs - W / 2.0) / f, (ys - H / 2.0) / f, np.ones_like(xs, np.float64)], -1
        )
        d_world = d_cam @ R.T  # (H, W, 3), z-component negative (downward)
        dz = d_world[..., 2]
        # Fixed-point iteration on the ray/terrain intersection: t s.t.
        # c_z + t dz = h(c_xy + t d_xy). Contraction because |grad h| << |dz|.
        t = (0.0 - c[2]) / dz
        for _ in range(6):
            px = c[0] + t * d_world[..., 0]
            py = c[1] + t * d_world[..., 1]
            hh = self._field(self._terrain, px, py)
            t = (hh - c[2]) / dz
        px = c[0] + t * d_world[..., 0]
        py = c[1] + t * d_world[..., 1]
        albedo = np.zeros_like(px, dtype=np.float32)
        for k, g in enumerate(self._tex_octaves):
            albedo += 0.9**k * self._field(g, px * (2.0**k), py * (2.0**k))
        # Contrast-normalize the octave mix: averaging independent fields
        # shrinks the dynamic range and SIFT's contrast threshold would
        # reject everything.
        albedo = (albedo - albedo.mean()) / max(float(albedo.std()), 1e-6)
        albedo = np.clip(albedo * 0.22 + 0.55, 0.0, 1.0)
        # Mild shading from height (adds low-frequency structure).
        shade = 0.75 + 0.25 * self._field(self._terrain, px, py) / max(
            float(self._terrain.max()), 1e-9
        )
        img8 = np.clip(albedo * shade * 255.0, 0, 255).astype(np.uint8)
        img = Image(value_array=img8)
        self._cache[index] = img
        return img


def _small_rotation(axis_angle: np.ndarray) -> np.ndarray:
    theta = float(np.linalg.norm(axis_angle))
    if theta < 1e-12:
        return np.eye(3, dtype=np.float32)
    k = axis_angle / theta
    Kx = np.asarray(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], np.float64
    )
    return (np.eye(3) + np.sin(theta) * Kx + (1 - np.cos(theta)) * Kx @ Kx).astype(
        np.float32
    )
