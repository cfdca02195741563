import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import alignment, lie


def random_poses(rng, n):
    w = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = rng.normal(size=(n, 3)).astype(np.float32) * 5.0
    return jnp.asarray(R), jnp.asarray(t)


def test_umeyama_exact(rng):
    src = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    s_gt = 2.5
    R_gt = lie.so3_exp(jnp.asarray([0.3, -0.2, 0.1]))
    t_gt = jnp.asarray([1.0, 2.0, -3.0])
    dst = s_gt * src @ R_gt.T + t_gt
    s, R, t = alignment.umeyama_sim3(src, dst)
    np.testing.assert_allclose(float(s), s_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-3)


def test_umeyama_reflection_guard(rng):
    """Near-planar point sets must still produce det(R)=+1."""
    src = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32) * jnp.asarray([1.0, 1.0, 1e-6])
    dst = src @ lie.so3_exp(jnp.asarray([0.0, 0.0, 1.0])).T
    s, R, t = alignment.umeyama_sim3(src, dst)
    assert float(jnp.linalg.det(R)) > 0.99


def test_align_poses_sim3_recovers_gauge(rng):
    wRi, wti = random_poses(rng, 10)
    s = 3.0
    aRb = lie.so3_exp(jnp.asarray([0.1, 0.5, -0.2]))
    atb = jnp.asarray([4.0, -1.0, 2.0])
    # transformed pose set
    wRi2 = jnp.einsum("ij,njk->nik", aRb, wRi)
    wti2 = s * jnp.einsum("ij,nj->ni", aRb, wti) + atb
    (Ra, ta), (s_e, R_e, t_e) = alignment.align_poses_sim3(wRi, wti, wRi2, wti2)
    np.testing.assert_allclose(np.asarray(Ra), np.asarray(wRi2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ta), np.asarray(wti2), atol=1e-3)
    np.testing.assert_allclose(float(s_e), s, atol=1e-4)


def test_align_panorama_fallback(rng):
    """All-coincident centers (panorama): rotation comes from consensus."""
    wRi, _ = random_poses(rng, 6)
    wti = jnp.zeros((6, 3))
    aRb = lie.so3_exp(jnp.asarray([0.2, -0.3, 0.15]))
    wRi2 = jnp.einsum("ij,njk->nik", aRb, wRi)
    (Ra, ta), _ = alignment.align_poses_sim3(wRi, wti, wRi2, wti)
    err = np.asarray(alignment.rotation_errors_deg(Ra, wRi2))
    assert np.max(err) < 0.1


def test_compare_global_poses(rng):
    wRi, wti = random_poses(rng, 8)
    aRb = lie.so3_exp(jnp.asarray([0.3, 0.3, 0.0]))
    wRi2 = jnp.einsum("ij,njk->nik", aRb, wRi)
    wti2 = 2.0 * jnp.einsum("ij,nj->ni", aRb, wti) + jnp.asarray([1.0, 0, 0])
    assert alignment.compare_global_poses(wRi, wti, wRi2, wti2)
    # Corrupt one rotation beyond threshold:
    wRi_bad = wRi.at[0].set(lie.so3_exp(jnp.asarray([1.0, 0, 0])) @ wRi[0])
    assert not alignment.compare_global_poses(wRi_bad, wti, wRi2, wti2)


def test_cyclic_rotation_error(rng):
    R0, _ = random_poses(rng, 3)
    i1Ri0 = R0[1] @ R0[0].T
    i2Ri1 = R0[2] @ R0[1].T
    i2Ri0 = R0[2] @ R0[0].T
    err = alignment.compute_cyclic_rotation_error(i1Ri0, i2Ri1, i2Ri0)
    assert float(err) < 0.01
    # Perturbed edge yields error ~ the perturbation magnitude.
    pert = lie.so3_exp(jnp.asarray([0.0, 0.0, np.deg2rad(10.0)]))
    err2 = alignment.compute_cyclic_rotation_error(i1Ri0, pert @ i2Ri1, i2Ri0)
    np.testing.assert_allclose(float(err2), 10.0, atol=0.2)
