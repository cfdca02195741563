"""Two-view BA tests: noisy relative poses must be refined toward GT
(reference tests/test_two_view_estimator.py strategy)."""

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import lie
from gtsfm_tpu.twoview import estimator
from tests.geometry.test_epipolar import make_two_view_scene


def perturb_pose(rng, R, t, rot_deg, dir_deg):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * np.deg2rad(rot_deg)
    Rp = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32))) @ np.asarray(R)
    w2 = rng.normal(size=3)
    w2 = w2 / np.linalg.norm(w2) * np.deg2rad(dir_deg)
    tp = np.asarray(lie.so3_exp(jnp.asarray(w2, jnp.float32))) @ np.asarray(t)
    return jnp.asarray(Rp), jnp.asarray(tp / np.linalg.norm(tp))


def test_triangulate_two_view(rng):
    x1, x2, R, t = make_two_view_scene(rng, n_pts=50)
    X, z1, z2 = estimator.triangulate_two_view(R, t, x1, x2)
    assert np.all(np.asarray(z1) > 0)
    r1, r2, _, _ = estimator._residuals(R, t, X, x1, x2)
    assert float(jnp.max(jnp.linalg.norm(r1, axis=-1))) < 1e-4
    assert float(jnp.max(jnp.linalg.norm(r2, axis=-1))) < 1e-4


def test_two_view_ba_refines_pose(rng):
    P, N = 4, 120
    R0s, t0s, x1s, x2s, Rgt, tgt = [], [], [], [], [], []
    for _ in range(P):
        x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=3e-4)
        Rp, tp = perturb_pose(rng, R, t, rot_deg=2.0, dir_deg=5.0)
        R0s.append(Rp); t0s.append(tp); x1s.append(x1); x2s.append(x2)
        Rgt.append(R); tgt.append(t)
    res = estimator.two_view_ba_batched(
        jnp.stack(R0s), jnp.stack(t0s), jnp.stack(x1s), jnp.stack(x2s),
        jnp.ones((P, N)), jnp.full((P,), 2e-3),
    )
    for p in range(P):
        rot_err0 = float(jnp.degrees(lie.rotation_angular_distance(R0s[p], Rgt[p])))
        rot_err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[p], Rgt[p])))
        assert rot_err < 0.3, (rot_err0, rot_err)
        dir_err = np.degrees(
            np.arccos(np.clip(float(jnp.dot(res.i2Ui1[p], jnp.asarray(tgt[p]))), -1, 1))
        )
        assert dir_err < 1.0
        assert float(res.inlier_mask[p].mean()) > 0.9


def test_two_view_ba_with_outliers(rng):
    N = 150
    x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=3e-4)
    x2 = np.asarray(x2).copy()
    bad = rng.choice(N, 30, replace=False)
    x2[bad] += 0.1
    Rp, tp = perturb_pose(rng, R, t, rot_deg=1.5, dir_deg=4.0)
    w = np.ones(N, np.float32)  # pretend RANSAC missed the outliers
    res = estimator.two_view_ba_batched(
        Rp[None], tp[None], x1[None], jnp.asarray(x2)[None],
        jnp.asarray(w)[None], jnp.full((1,), 2e-3),
    )
    rot_err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], R)))
    assert rot_err < 0.5  # Huber keeps the outliers from wrecking it
    # Outliers excluded by the reprojection filter.
    assert np.asarray(res.inlier_mask[0])[bad].mean() < 0.2


def test_padding_inert(rng):
    N = 80
    x1, x2, R, t = make_two_view_scene(rng, n_pts=N, noise=3e-4)
    Rp, tp = perturb_pose(rng, R, t, 2.0, 4.0)
    pad = 40
    x1p = jnp.concatenate([x1, jnp.asarray(rng.normal(size=(pad, 2)), jnp.float32)])
    x2p = jnp.concatenate([x2, jnp.asarray(rng.normal(size=(pad, 2)), jnp.float32)])
    w = jnp.concatenate([jnp.ones(N), jnp.zeros(pad)])
    res = estimator.two_view_ba_batched(
        Rp[None], tp[None], x1p[None], x2p[None], w[None], jnp.full((1,), 2e-3)
    )
    res_ref = estimator.two_view_ba_batched(
        Rp[None], tp[None], x1[None], x2[None], jnp.ones((1, N)), jnp.full((1,), 2e-3)
    )
    err = float(jnp.degrees(lie.rotation_angular_distance(res.i2Ri1[0], res_ref.i2Ri1[0])))
    assert err < 0.05
    assert float(jnp.sum(res.inlier_mask[0, N:])) == 0.0
