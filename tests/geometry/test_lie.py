"""Unit tests for SO(3)/SE(3) ops (mirrors reference tests/utils coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.geometry import lie


def random_rotations(rng, n):
    w = rng.normal(size=(n, 3)).astype(np.float32)
    return np.asarray(lie.so3_exp(jnp.asarray(w)))


def test_exp_log_roundtrip(rng):
    # |w| must stay below pi: log returns the principal axis-angle, so larger
    # inputs legitimately round-trip to their wrapped equivalent.
    axis = rng.normal(size=(64, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    mag = rng.uniform(0.0, 3.1, size=(64, 1))
    w = jnp.asarray(axis * mag, jnp.float32)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=2e-5)


def test_exp_small_angle():
    w = jnp.asarray([[1e-9, 0, 0], [0.0, 0.0, 0.0]], jnp.float32)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
    w2 = lie.so3_log(R)
    assert np.all(np.isfinite(np.asarray(w2)))


def test_log_near_pi(rng):
    # Rotations with angle close to pi are the classic instability.
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angles = np.pi - rng.uniform(0.0, 1e-4, size=(32, 1))
    w = jnp.asarray(axis * angles, jnp.float32)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    # Compare rotations, not axis-angle (sign ambiguity exactly at pi).
    err = np.asarray(lie.rotation_angular_distance(R, R2))
    assert np.all(err < 1e-3)


def test_rotations_orthonormal(rng):
    R = jnp.asarray(random_rotations(rng, 16))
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_quat_roundtrip(rng):
    R = jnp.asarray(random_rotations(rng, 64))
    q = lie.quat_from_so3(R)
    R2 = lie.so3_from_quat(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
    assert np.all(np.asarray(q[:, 0]) >= 0.0)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.uniform(-1.0, 1.0, size=(32, 6)), jnp.float32)
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)


def test_se3_compose_inverse(rng):
    R1 = jnp.asarray(random_rotations(rng, 8))
    t1 = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    Rinv, tinv = lie.se3_inverse(R1, t1)
    Rc, tc = lie.se3_compose(R1, t1, Rinv, tinv)
    np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)


def test_relative_pose_consistency(rng):
    """i2Ti1 composed with wTi1 gives points consistent with wTi2 frame."""
    R = jnp.asarray(random_rotations(rng, 2))
    t = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
    p_w = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    # p in frame 1 / frame 2:
    R1i, t1i = lie.se3_inverse(R[0], t[0])
    R2i, t2i = lie.se3_inverse(R[1], t[1])
    p1 = lie.se3_transform(R1i, t1i, p_w)
    p2 = lie.se3_transform(R2i, t2i, p_w)
    i2Ri1, i2ti1 = lie.relative_pose(R[0], t[0], R[1], t[1])
    p2_pred = lie.se3_transform(i2Ri1, i2ti1, p1)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p2_pred), atol=1e-4)


def test_project_to_so3(rng):
    M = jnp.asarray(rng.normal(size=(8, 3, 3)), jnp.float32)
    R = lie.project_to_so3(M)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-4)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (8, 1, 1)), atol=1e-4)


def test_jit_and_grad():
    """Everything must be jit- and grad-safe (no NaN from where-branches)."""
    f = jax.jit(lambda w: jnp.sum(lie.so3_exp(w)))
    g = jax.grad(f)(jnp.asarray([0.1, -0.2, 0.3]))
    assert np.all(np.isfinite(np.asarray(g)))
    g0 = jax.grad(f)(jnp.zeros(3))  # at identity: notorious NaN spot
    assert np.all(np.isfinite(np.asarray(g0)))
