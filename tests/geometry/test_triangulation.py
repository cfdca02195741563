import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import cameras, lie, triangulation


def make_scene(rng, n_cams=4, n_tracks=30, noise=0.0):
    """Cameras on an arc looking at points near origin; full observation."""
    cal = np.tile(np.asarray([400.0, 0.0, 0.0, 320.0, 240.0], np.float32), (n_cams, 1))
    angles = np.linspace(-0.4, 0.4, n_cams)
    wRi, wti = [], []
    for a in angles:
        # camera at radius 10 on a circle in the xz plane, looking at origin
        c = np.asarray([10 * np.sin(a), 0.0, -10 * np.cos(a)], np.float32)
        # rotation: camera z-axis points from c to origin
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=-1).astype(np.float32)
        wRi.append(R)
        wti.append(c)
    wRi = np.stack(wRi)
    wti = np.stack(wti)
    X = rng.uniform(-2, 2, size=(n_tracks, 3)).astype(np.float32)
    # Build per-track measurement tensors (T, L=n_cams, ...)
    wRi_t = np.tile(wRi[None], (n_tracks, 1, 1, 1))
    wti_t = np.tile(wti[None], (n_tracks, 1, 1))
    cal_t = np.tile(cal[None], (n_tracks, 1, 1))
    uv, depth = cameras.project_bundler(
        jnp.asarray(wRi_t), jnp.asarray(wti_t), jnp.asarray(cal_t), jnp.asarray(X)[:, None, :]
    )
    uv = np.asarray(uv) + noise * rng.normal(size=uv.shape).astype(np.float32)
    assert np.all(np.asarray(depth) > 0)
    return (
        jnp.asarray(wRi_t),
        jnp.asarray(wti_t),
        jnp.asarray(cal_t),
        jnp.asarray(uv),
        jnp.asarray(X),
    )


def test_dlt_exact(rng):
    wRi, wti, cal, uv, X = make_scene(rng)
    K = cameras.K_from_bundler(cal)
    P = triangulation.projection_matrix(wRi, wti, K)
    mask = jnp.ones(uv.shape[:2])
    X_est = triangulation.triangulate_tracks_dlt(P, uv, mask)
    np.testing.assert_allclose(np.asarray(X_est), np.asarray(X), atol=1e-2)


def test_dlt_masked(rng):
    """Masked-out garbage measurements must not affect the result."""
    wRi, wti, cal, uv, X = make_scene(rng)
    K = cameras.K_from_bundler(cal)
    P = triangulation.projection_matrix(wRi, wti, K)
    uv_bad = uv.at[:, 3].set(jnp.asarray(rng.normal(size=(uv.shape[0], 2)) * 1000, jnp.float32))
    mask = jnp.ones(uv.shape[:2]).at[:, 3].set(0.0)
    X_est = triangulation.triangulate_tracks_dlt(P, uv_bad, mask)
    np.testing.assert_allclose(np.asarray(X_est), np.asarray(X), atol=5e-2)


def test_gn_refinement_improves(rng):
    wRi, wti, cal, uv, X = make_scene(rng, noise=0.5)
    K = cameras.K_from_bundler(cal)
    P = triangulation.projection_matrix(wRi, wti, K)
    mask = jnp.ones(uv.shape[:2])
    X0 = triangulation.triangulate_tracks_dlt(P, uv, mask)
    X_ref = triangulation.refine_tracks_gn(wRi, wti, cal, uv, mask, X0)
    err0, _ = triangulation.reprojection_errors(wRi, wti, cal, uv, X0)
    err1, _ = triangulation.reprojection_errors(wRi, wti, cal, uv, X_ref)
    assert float(jnp.mean(err1)) <= float(jnp.mean(err0)) + 1e-4
    # refined points should be close to GT
    assert float(jnp.max(jnp.linalg.norm(X_ref - X, axis=-1))) < 0.1


def test_reprojection_errors_zero_at_gt(rng):
    wRi, wti, cal, uv, X = make_scene(rng)
    err, depth = triangulation.reprojection_errors(wRi, wti, cal, uv, X)
    assert float(jnp.max(err)) < 1e-2
    assert np.all(np.asarray(depth) > 0)


def test_triangulation_angles(rng):
    wRi, wti, cal, uv, X = make_scene(rng)
    mask = jnp.ones(uv.shape[:2])
    ang = triangulation.triangulation_angles(wti, X, mask)
    # Cameras span ~0.8 rad on a radius-10 arc viewing points near origin.
    assert np.all(np.asarray(ang) > 10.0)
    assert np.all(np.asarray(ang) < 90.0)
