import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import cameras, lie


def test_bundler_calibrate_roundtrip(rng):
    cal = cameras.bundler_params(500.0, -0.1, 0.02, 320.0, 240.0)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, size=(100, 2)), jnp.float32)
    uv = cameras.bundler_uncalibrate(cal, p)
    p2 = cameras.bundler_calibrate(cal, uv)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p2), atol=1e-5)


def test_project_identity_camera():
    cal = cameras.bundler_params(100.0, 0.0, 0.0, 50.0, 60.0)
    wRi = jnp.eye(3)
    wti = jnp.zeros(3)
    X = jnp.asarray([0.1, 0.2, 2.0])
    uv, depth = cameras.project_bundler(wRi, wti, cal, X)
    np.testing.assert_allclose(np.asarray(depth), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(uv), [100 * 0.05 + 50, 100 * 0.1 + 60], atol=1e-4)


def test_project_behind_camera_flags_negative_depth():
    cal = cameras.bundler_params(100.0)
    uv, depth = cameras.project_bundler(jnp.eye(3), jnp.zeros(3), cal, jnp.asarray([0.0, 0.0, -1.0]))
    assert float(depth) < 0


def test_project_posed_camera(rng):
    """Project with a nontrivial pose and verify via backprojection."""
    w = jnp.asarray([0.2, -0.1, 0.3])
    wRi = lie.so3_exp(w)
    wti = jnp.asarray([1.0, -2.0, 0.5])
    cal = cameras.bundler_params(400.0, -0.05, 0.01, 300.0, 200.0)
    X = jnp.asarray(rng.uniform(-1, 1, size=(20, 3)), jnp.float32) + jnp.asarray([1.0, -2.0, 0.5]) + lie.so3_exp(w) @ jnp.asarray([0.0, 0.0, 4.0])
    uv, depth = cameras.project_bundler(wRi, wti, cal, X)
    assert np.all(np.asarray(depth) > 0)
    X2 = cameras.backproject_bundler(wRi, wti, cal, uv, depth)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X2), atol=1e-3)


def test_K_roundtrip():
    K = jnp.asarray([[500.0, 0, 320], [0, 510, 240], [0, 0, 1]])
    cal = cameras.bundler_from_K(K)
    K2 = cameras.K_from_bundler(cal)
    np.testing.assert_allclose(float(K2[0, 0]), 505.0)
    np.testing.assert_allclose(float(K2[0, 2]), 320.0)


def test_normalize_keypoints():
    K = jnp.asarray([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    uv = jnp.asarray([[320.0, 240.0], [820.0, 740.0]])
    xn = cameras.normalize_keypoints(K, uv)
    np.testing.assert_allclose(np.asarray(xn), [[0, 0], [1, 1]], atol=1e-6)


def test_fisheye_pinhole_limit():
    """With zero distortion the fisheye model ~ pinhole for small angles."""
    cal = cameras.fisheye_params(400.0, 400.0, 0.0, 320.0, 240.0)
    p = jnp.asarray([[0.01, -0.02]])
    uv = cameras.fisheye_uncalibrate(cal, p)
    # theta ~ r for small r, so equidistant ~ pinhole
    np.testing.assert_allclose(np.asarray(uv), [[320 + 4.0, 240 - 8.0]], atol=0.01)


def test_fisheye_calibrate_roundtrip(rng):
    from gtsfm_tpu.geometry import cameras as cam

    cal = cam.fisheye_params(600.0, 610.0, 0.0, 640.0, 480.0, -0.04, -0.008, 0.009, -0.003)
    p = jnp.asarray(rng.uniform(-0.8, 0.8, size=(200, 2)), jnp.float32)
    uv = cam.fisheye_uncalibrate(cal, p)
    p2 = cam.fisheye_calibrate(cal, uv)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=2e-4)


def test_fisheye_virtual_pinhole(rng):
    """Undistorted pixels must be an exact pinhole projection of the same rays."""
    from gtsfm_tpu.geometry import cameras as cam

    cal9 = cam.fisheye_params(600.0, 600.0, 0.0, 640.0, 480.0, -0.04, -0.008, 0.009, -0.003)
    p = jnp.asarray(rng.uniform(-0.6, 0.6, size=(50, 2)), jnp.float32)
    uv_fish = cam.fisheye_uncalibrate(cal9, p)
    uv_pin, cal5 = cam.fisheye_to_virtual_pinhole(cal9, uv_fish)
    expected = p * 600.0 + jnp.asarray([640.0, 480.0])
    np.testing.assert_allclose(np.asarray(uv_pin), np.asarray(expected), atol=0.2)
    np.testing.assert_allclose(np.asarray(cal5), [600, 0, 0, 640, 480], atol=1e-4)
