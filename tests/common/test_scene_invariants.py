"""SceneData invariant suite — the TPU analog of the reference's 920-LoC
tests/common/test_gtsfm_data.py: non-contiguous camera indices, camera
subset selection, largest-connected-component selection, track filtering
edge cases, and Sim(3) alignment including its degenerate (panorama)
fallback. SceneData is mask-based (padded arrays, stable indices), so
"non-contiguous indices" means holes in camera_mask rather than dict keys."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.common import scene as scene_mod
from gtsfm_tpu.geometry import alignment, cameras, lie


def _project(wRi, wti, cal, X):
    uv, depth = cameras.project_bundler(
        jnp.asarray(wRi), jnp.asarray(wti), jnp.asarray(cal), jnp.asarray(X)
    )
    return np.asarray(uv), float(depth)


def build_scene(rng, n_cams=5, n_tracks=12, cam_of_track=None):
    """Exact synthetic scene; cam_of_track[j] optionally restricts which
    cameras observe track j (for connectivity-shaped fixtures)."""
    wRi = np.asarray(
        lie.so3_exp(jnp.asarray(rng.normal(size=(n_cams, 3)) * 0.1, jnp.float32))
    )
    wti = np.asarray([[i * 1.0, 0.0, -10.0] for i in range(n_cams)], np.float32)
    cal = np.tile(np.asarray([300.0, 0, 0, 320, 240], np.float32), (n_cams, 1))
    X = rng.uniform(-2, 2, size=(n_tracks, 3)).astype(np.float32)
    tracks = []
    for j in range(n_tracks):
        obs_cams = range(n_cams) if cam_of_track is None else cam_of_track[j]
        tr = []
        for i in obs_cams:
            uv, depth = _project(wRi[i], wti[i], cal[i], X[j])
            assert depth > 0
            tr.append((i, uv))
        tracks.append(tr)
    sc = scene_mod.make_scene(wRi, wti, cal, tracks)
    pts = np.zeros((sc.num_tracks_padded, 3), np.float32)
    pts[:n_tracks] = X
    return dataclasses.replace(sc, points=jnp.asarray(pts)), X


# ------------------------------------------------- non-contiguous cameras


def test_noncontiguous_camera_mask(rng):
    """Cameras {0, 2, 4} live (holes at 1, 3): counts, reprojection and
    filtering must all respect the mask — reference
    test_get_valid_camera_indices_on_nonconsecutive_indices."""
    sc, _ = build_scene(rng, n_cams=5, n_tracks=6)
    keep = np.asarray([1, 0, 1, 0, 1], np.float32)
    sub = sc.select_cameras(keep)
    assert sub.num_cameras() == 3
    live_cams = np.nonzero(np.asarray(sub.camera_mask) > 0)[0]
    np.testing.assert_array_equal(live_cams, [0, 2, 4])
    # All surviving measurements reference live cameras only.
    mm = np.asarray(sub.meas_mask) > 0
    assert set(np.asarray(sub.meas_cam)[mm]) <= {0, 2, 4}
    # Tracks observed 3x (>=2) all survive; reprojection still exact.
    assert sub.num_tracks() == 6
    err, _ = sub.reprojection_errors()
    assert float(jnp.max(err)) < 1e-2


def test_garbage_in_dead_cameras_is_inert(rng):
    """Poses of masked cameras are free storage — metrics must not read
    them (the padded-arrays analog of 'nonexistent camera id')."""
    sc, _ = build_scene(rng, n_cams=5, n_tracks=6)
    sub = sc.select_cameras(np.asarray([1, 1, 1, 0, 0], np.float32))
    trashed = dataclasses.replace(
        sub,
        wti=sub.wti.at[3:].set(1e6),
        wRi=sub.wRi.at[3:].set(jnp.eye(3) * 7.0),
    )
    np.testing.assert_allclose(
        float(sub.mean_reprojection_error()),
        float(trashed.mean_reprojection_error()),
        atol=1e-6,
    )


def test_make_scene_rejects_out_of_range_camera(rng):
    """Reference GtsfmData.add_track refuses tracks referencing cameras
    that don't exist."""
    wRi = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    wti = np.zeros((2, 3), np.float32)
    cal = np.tile(np.asarray([300.0, 0, 0, 0, 0], np.float32), (2, 1))
    bad_tracks = [[(0, np.zeros(2)), (5, np.zeros(2))]]
    with pytest.raises(ValueError, match="camera 5"):
        scene_mod.make_scene(wRi, wti, cal, bad_tracks)


# ------------------------------------------------- camera selection


def test_select_cameras_drops_short_tracks(rng):
    """A track seen by only one surviving camera must die (min length 2)."""
    # Track 0 seen only by cams {0, 1}; track 1 by {2, 3, 4}; track 2 by all.
    sc, _ = build_scene(
        rng, n_cams=5, n_tracks=3,
        cam_of_track=[[0, 1], [2, 3, 4], [0, 1, 2, 3, 4]],
    )
    sub = sc.select_cameras(np.asarray([1, 0, 1, 1, 1], np.float32))
    # Track 0 has 1 live measurement -> dead; tracks 1, 2 live.
    tm = np.asarray(sub.track_mask)
    assert tm[0] == 0 and tm[1] == 1 and tm[2] == 1
    assert sub.num_tracks() == 2
    # Its surviving measurement is masked with it.
    mm = np.asarray(sub.meas_mask) > 0
    assert not np.any(np.asarray(sub.meas_track)[mm] == 0)


def test_select_cameras_empty(rng):
    sc, _ = build_scene(rng, n_cams=3, n_tracks=4)
    sub = sc.select_cameras(np.zeros(sc.num_cameras_padded, np.float32))
    assert sub.num_cameras() == 0
    assert sub.num_tracks() == 0
    assert sub.num_measurements() == 0


# ------------------------------------------------- largest CC


def test_select_largest_connected_component(rng):
    """Two camera islands bridged by nothing: {0,1,2} (6 tracks) and {3,4}
    (2 tracks) — selection keeps the larger island, reference
    test_select_largest_connected_component."""
    cam_of_track = [[0, 1, 2]] * 6 + [[3, 4]] * 2
    sc, _ = build_scene(rng, n_cams=5, n_tracks=8, cam_of_track=cam_of_track)
    cc = sc.select_largest_connected_component()
    live = np.nonzero(np.asarray(cc.camera_mask) > 0)[0]
    np.testing.assert_array_equal(live, [0, 1, 2])
    assert cc.num_tracks() == 6


def test_select_largest_cc_empty_scene(rng):
    sc, _ = build_scene(rng, n_cams=3, n_tracks=4)
    empty = dataclasses.replace(
        sc, meas_mask=jnp.zeros_like(sc.meas_mask)
    )
    cc = empty.select_largest_connected_component()
    assert cc.num_cameras() == 0


# ------------------------------------------------- filter_landmarks edges


def test_filter_landmarks_all_pass_and_all_fail(rng):
    sc, _ = build_scene(rng, n_cams=3, n_tracks=5)
    same = sc.filter_landmarks(reproj_thresh_px=1e9)
    assert same.num_measurements() == sc.num_measurements()
    assert same.num_tracks() == sc.num_tracks()
    none = dataclasses.replace(
        sc, points=sc.points + 100.0  # every reprojection now far off
    ).filter_landmarks(reproj_thresh_px=0.5)
    assert none.num_tracks() == 0
    assert none.num_measurements() == 0


def test_filter_landmarks_behind_camera(rng):
    """A point moved BEHIND its cameras must be filtered regardless of the
    pixel threshold (cheirality, reference filter semantics)."""
    sc, X = build_scene(rng, n_cams=3, n_tracks=5)
    pts = np.asarray(sc.points).copy()
    pts[0, 2] = -100.0  # cameras sit at z=-10 looking toward +z
    moved = dataclasses.replace(sc, points=jnp.asarray(pts))
    f = moved.filter_landmarks(reproj_thresh_px=1e9)
    assert np.asarray(f.track_mask)[0] == 0
    assert f.num_tracks() == 4


def test_filter_landmarks_idempotent(rng):
    sc, _ = build_scene(rng, n_cams=3, n_tracks=5)
    f1 = sc.filter_landmarks(3.0)
    f2 = f1.filter_landmarks(3.0)
    np.testing.assert_array_equal(np.asarray(f1.meas_mask), np.asarray(f2.meas_mask))
    np.testing.assert_array_equal(np.asarray(f1.track_mask), np.asarray(f2.track_mask))


# ------------------------------------------------- track statistics


def test_track_length_statistics(rng):
    """Reference testGetTrackLengthStatistics: mean/median over live tracks."""
    cam_of_track = [[0, 1], [0, 1, 2], [0, 1, 2, 3], [0, 1, 2, 3, 4]]
    sc, _ = build_scene(rng, n_cams=5, n_tracks=4, cam_of_track=cam_of_track)
    lens = np.asarray(sc.track_lengths())
    live = np.asarray(sc.track_mask) > 0
    assert sorted(lens[live].tolist()) == [2, 3, 4, 5]
    assert float(np.mean(lens[live])) == 3.5
    assert float(np.median(lens[live])) == 3.5


# ------------------------------------------------- Sim(3) alignment


def _random_rotation(rng, scale=1.0):
    return np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * scale,
                                              jnp.float32)))


def test_align_sim3_exact_recovery(rng):
    """Poses mapped through a known Sim(3) align back exactly — reference
    test_align_via_Sim3_to_poses. Camera centers must be NON-collinear or
    the Umeyama rotation has a free axis (centers-only fit, same as the
    reference's gtsam Similarity3.Align)."""
    n = 6
    wRi = np.stack([_random_rotation(rng, 0.1) for _ in range(n)])
    wti = rng.normal(size=(n, 3)).astype(np.float32) * 4.0
    s_gt, R_gt = 2.5, _random_rotation(rng)
    t_gt = np.asarray([3.0, -1.0, 7.0], np.float32)
    src_R = np.einsum("ij,njk->nik", R_gt.T, wRi)  # inverse-transformed copy
    src_t = np.einsum("ij,nj->ni", R_gt.T, (wti - t_gt)) / s_gt
    (aR, at), (s, R, t) = alignment.align_poses_sim3(
        jnp.asarray(src_R), jnp.asarray(src_t), jnp.asarray(wRi), jnp.asarray(wti)
    )
    assert abs(float(s) - s_gt) < 1e-3
    np.testing.assert_allclose(np.asarray(aR), wRi, atol=1e-4)
    np.testing.assert_allclose(np.asarray(at), wti, atol=1e-3)


def test_align_sim3_ignores_invalid(rng):
    """Invalid (masked) poses may hold garbage without perturbing the fit —
    reference align_poses_sim3_ignore_missing."""
    n = 6
    wRi = np.stack([_random_rotation(rng, 0.1) for _ in range(n)])
    wti = rng.normal(size=(n, 3)).astype(np.float32) * 4.0
    src_R, src_t = wRi.copy(), wti.copy()
    src_t[5] = (1e5, -1e5, 1e5)  # garbage in the masked slot
    valid = np.asarray([1, 1, 1, 1, 1, 0], np.float32)
    (aR, at), (s, R, t) = alignment.align_poses_sim3(
        jnp.asarray(src_R), jnp.asarray(src_t),
        jnp.asarray(wRi), jnp.asarray(wti), valid=jnp.asarray(valid),
    )
    np.testing.assert_allclose(np.asarray(at)[:5], wti[:5], atol=1e-3)
    assert abs(float(s) - 1.0) < 1e-4


def test_align_sim3_panorama_fallback(rng):
    """All camera centers coincident (pure-rotation panorama): Umeyama's
    rotation is undefined; the chordal-consensus fallback must still
    recover the relative rotation — reference geometry_comparisons.py:116-130."""
    n = 4
    base_R = np.stack([_random_rotation(rng) for _ in range(n)])
    centers = np.zeros((n, 3), np.float32)
    R_gt = _random_rotation(rng, 0.5)
    src_R = np.einsum("ij,njk->nik", R_gt.T, base_R)
    (aR, at), (s, R, t) = alignment.align_poses_sim3(
        jnp.asarray(src_R, jnp.float32), jnp.asarray(centers),
        jnp.asarray(base_R, jnp.float32), jnp.asarray(centers),
    )
    np.testing.assert_allclose(np.asarray(aR), base_R, atol=1e-3)
    assert abs(float(s) - 1.0) < 1e-5
    np.testing.assert_allclose(np.asarray(t), np.zeros(3), atol=1e-5)


def test_align_sim3_reflection_guard(rng):
    """A near-planar camera layout must still produce det(R)=+1 (the
    Umeyama D-matrix sign fix)."""
    n = 8
    wti = np.zeros((n, 3), np.float32)
    wti[:, 0] = np.arange(n)
    wti[:, 1] = rng.normal(size=n) * 0.01  # almost collinear
    wRi = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    R_gt = _random_rotation(rng)
    src_t = np.einsum("ij,nj->ni", R_gt.T, wti)
    src_R = np.einsum("ij,njk->nik", R_gt.T, wRi)
    (_, at), (s, R, t) = alignment.align_poses_sim3(
        jnp.asarray(src_R), jnp.asarray(src_t), jnp.asarray(wRi), jnp.asarray(wti)
    )
    assert float(jnp.linalg.det(R)) > 0.9
    np.testing.assert_allclose(np.asarray(at), wti, atol=1e-3)
