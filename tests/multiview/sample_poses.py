"""Synthetic pose-graph fixtures (mirrors reference tests/data/sample_poses.py:
closed-form pose graphs + exact relative measurements, no mocks)."""

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import lie


def circle_poses(n=8, radius=5.0):
    """Cameras on a circle, looking inward."""
    wRi, wti = [], []
    for k in range(n):
        a = 2 * np.pi * k / n
        c = np.asarray([radius * np.cos(a), 0.0, radius * np.sin(a)], np.float32)
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        wRi.append(np.stack([x, y, z], -1).astype(np.float32))
        wti.append(c)
    return np.stack(wRi), np.stack(wti)


def line_poses(n=6, spacing=1.0):
    wRi = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    wti = np.stack([np.asarray([k * spacing, 0, 0], np.float32) for k in range(n)])
    return wRi, wti


def relative_measurements(wRi, wti, edges, rot_noise_deg=0.0, dir_noise_deg=0.0, rng=None):
    """Exact (or noised) relative rotations i2Ri1 and directions i2Ui1."""
    rng = rng or np.random.default_rng(0)
    i2Ri1, i2Ui1 = [], []
    for a, b in edges:
        R, t = lie.relative_pose(
            jnp.asarray(wRi[a]), jnp.asarray(wti[a]), jnp.asarray(wRi[b]), jnp.asarray(wti[b])
        )
        R = np.asarray(R)
        t = np.asarray(t)
        if rot_noise_deg > 0:
            w = rng.normal(size=3); w /= np.linalg.norm(w)
            w *= np.deg2rad(rng.uniform(0, rot_noise_deg))
            R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32))) @ R
        u = t / max(np.linalg.norm(t), 1e-9)
        if dir_noise_deg > 0:
            w = rng.normal(size=3); w /= np.linalg.norm(w)
            w *= np.deg2rad(rng.uniform(0, dir_noise_deg))
            u = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32))) @ u
        i2Ri1.append(R)
        i2Ui1.append(u.astype(np.float32))
    return np.stack(i2Ri1), np.stack(i2Ui1)


def all_pairs_edges(n, max_gap=None):
    edges = []
    for a in range(n):
        for b in range(a + 1, n):
            if max_gap is None or b - a <= max_gap:
                edges.append((a, b))
    return np.asarray(edges, np.int64)
