"""Plane-sweep MVS tests on a synthetic textured plane scene with exact GT
depth (reference tests/densify strategy)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from gtsfm_tpu.common import scene as scene_mod
from gtsfm_tpu.densify import plane_sweep
from gtsfm_tpu.geometry import cameras


def make_plane_scene(rng, n_cams=4, H=96, W=128, plane_z=5.0):
    """Cameras translated along x viewing a textured fronto-parallel plane."""
    f = 120.0
    cal = np.tile(np.asarray([f, 0, 0, W / 2, H / 2], np.float32), (n_cams, 1))
    wR = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    wt = np.stack([np.asarray([0.3 * i, 0.0, 0.0], np.float32) for i in range(n_cams)])

    # World texture on the plane z = plane_z: smooth random function T(x, y).
    tex = gaussian_filter(rng.standard_normal((512, 512)), 2.0).astype(np.float32)
    tex = (tex - tex.min()) / (tex.max() - tex.min())

    def render(cam_i):
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        x_n = (xs - W / 2) / f
        y_n = (ys - H / 2) / f
        # Ray from camera center through pixel hits plane at depth plane_z.
        Xw_x = x_n * plane_z + wt[cam_i, 0]
        Xw_y = y_n * plane_z + wt[cam_i, 1]
        # Texture lookup (world coords -> texture grid, 50 px per unit).
        ui = np.clip(((Xw_x + 3) * 80).astype(int), 0, 511)
        vi = np.clip(((Xw_y + 3) * 80).astype(int), 0, 511)
        return tex[vi, ui]

    images = [render(i) for i in range(n_cams)]

    # Sparse scene for depth-range estimation: a handful of plane points.
    pts = np.stack(
        [rng.uniform(-1, 1, 20), rng.uniform(-1, 1, 20), np.full(20, plane_z)], -1
    ).astype(np.float32)
    tracks = []
    for j in range(20):
        tr = []
        for i in range(n_cams):
            uv, d = cameras.project_bundler(
                jnp.asarray(wR[i]), jnp.asarray(wt[i]), jnp.asarray(cal[i]), jnp.asarray(pts[j])
            )
            tr.append((i, np.asarray(uv)))
        tracks.append(tr)
    sc = scene_mod.make_scene(wR, wt, cal, tracks)
    sc = dataclasses.replace(sc, points=sc.points.at[:20].set(jnp.asarray(pts)))
    return images, sc, plane_z


def test_view_selection(rng):
    _, sc, _ = make_plane_scene(rng)
    table = plane_sweep.select_source_views(sc, num_views=2)
    assert np.all(table[:4] >= 0)  # every camera shares tracks with others
    assert np.all(table[np.arange(4), 0] != np.arange(4))  # no self


def test_depth_range(rng):
    _, sc, z = make_plane_scene(rng)
    lo, hi = plane_sweep.depth_range_from_scene(sc, 0)
    assert lo < z < hi


def test_plane_sweep_recovers_depth(rng):
    images, sc, z_gt = make_plane_scene(rng)
    K = np.asarray([[120.0, 0, 64], [0, 120, 48], [0, 0, 1]], np.float32)
    srcs = [1, 2, 3]
    wR = np.asarray(sc.wRi)
    wt = np.asarray(sc.wti)
    sRr = np.stack([wR[s].T @ wR[0] for s in srcs]).astype(np.float32)
    str_ = np.stack([wR[s].T @ (wt[0] - wt[s]) for s in srcs]).astype(np.float32)
    depth, conf = plane_sweep.plane_sweep_depth(
        jnp.asarray(images[0]), jnp.asarray(np.stack([images[s] for s in srcs])),
        jnp.asarray(K), jnp.asarray(np.tile(K, (3, 1, 1))),
        jnp.asarray(sRr), jnp.asarray(str_),
        jnp.asarray(2.0), jnp.asarray(10.0), num_depths=48,
    )
    depth = np.asarray(depth)
    conf = np.asarray(conf)
    # Central region (texture-rich, fully overlapped): depth ~ plane_z.
    core = depth[20:-20, 30:-30]
    rel_err = np.abs(core - z_gt) / z_gt
    assert np.median(rel_err) < 0.02
    assert np.median(conf[20:-20, 30:-30]) > 0.8


def test_full_densify(rng):
    images, sc, z_gt = make_plane_scene(rng)
    result = plane_sweep.densify(images, sc, num_depths=48, num_src_views=3)
    assert result.points.shape[0] > 2000
    z = result.points[:, 2]
    assert np.abs(np.median(z) - z_gt) / z_gt < 0.02
    assert result.rgb.shape == result.points.shape
    assert result.metrics["num_dense_points"] == result.points.shape[0]
