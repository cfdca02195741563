"""BAL ("Bundle Adjustment in the Large") and Bundler file I/O.

Feature parity with reference gtsfm/utils/io.py:133-149 (read_bal /
read_bundler), which delegate to gtsam.readBal / gtsam.SfmData.
FromBundlerFile; here the parsing and the coordinate-convention conversion
are implemented directly against SceneData.

Both formats use the Noah Snavely camera convention
(grail.cs.washington.edu/projects/bal): P = R·X + t maps world to camera
with the camera looking down the NEGATIVE z-axis, the projection is
p = -P / P.z, and pixels are f·(1 + k1·|p|² + k2·|p|⁴)·p with the origin at
the image center and y pointing UP. SceneData uses the +z-forward,
y-down convention (project_bundler, geometry/cameras.py:153), so at this
boundary:

    wRi = (M·R)ᵀ = Rᵀ·M,  wti = -Rᵀ·t,  with M = diag(1, -1, -1)
    uv  = (u, -v)          (y flip; principal point stays (0, 0))

M has det +1, so wRi is a proper rotation; the identity
(M·R)·X + M·t = M·P gives (Q.x/Q.z, Q.y/Q.z) = (u, -v)/f exactly — i.e.
project_bundler on the converted scene reproduces the converted
measurements with zero error. write_bal inverts the same map, so
read_bal(write_bal(s)) round-trips.
"""

from __future__ import annotations

import numpy as np

from gtsfm_tpu.common.scene import SceneData, make_scene

_M_DIAG = np.diag([1.0, -1.0, -1.0]).astype(np.float64)


def _rodrigues_to_R(w: np.ndarray) -> np.ndarray:
    """SO(3) exp in float64 numpy. BAL is a double-precision text format;
    routing through the (float32) JAX lie library would perturb loaded
    rotations by ~1e-7 before BA even starts (r3 ADVICE.md), so this IO
    boundary keeps full precision."""
    w = np.asarray(w, np.float64)
    th = float(np.linalg.norm(w))
    K = np.array(
        [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]],
        np.float64,
    )
    if th < 1e-8:  # 2nd-order Taylor; exact to double precision here
        return np.eye(3) + K + 0.5 * (K @ K)
    a = np.sin(th) / th
    b = (1.0 - np.cos(th)) / (th * th)
    return np.eye(3) + a * K + b * (K @ K)


def _R_to_rodrigues(R: np.ndarray) -> np.ndarray:
    """SO(3) log in float64 numpy (robust at theta -> 0 and near pi)."""
    R = np.asarray(R, np.float64)
    c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = float(np.arccos(c))
    v = np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]], np.float64
    )
    if th < 1e-8:
        return 0.5 * v
    if th > np.pi - 1e-6:
        # Near the antipode sin(th) ~ 0: recover the axis from the symmetric
        # part (R + I)/2 = nn^T + O(pi - th); exp(pi n) == exp(-pi n) so the
        # sign choice below is a convention, tie-broken toward vee(R - R^T).
        A = (R + np.eye(3)) / 2.0
        d = np.sqrt(np.maximum(np.diag(A), 0.0))
        k = int(np.argmax(d))
        n = A[k] / max(d[k], 1e-12)
        n[k] = d[k]
        if np.dot(n, v) < 0:
            n = -n
        n /= max(np.linalg.norm(n), 1e-12)
        return th * n
    return (th / (2.0 * np.sin(th))) * v


def _snavely_to_scene_pose(R: np.ndarray, t: np.ndarray):
    wRi = R.T @ _M_DIAG
    wti = -R.T @ t
    return wRi, wti


def _scene_to_snavely_pose(wRi: np.ndarray, wti: np.ndarray):
    R = _M_DIAG @ wRi.T
    t = -R @ wti
    return R, t


def read_bal(path: str) -> SceneData:
    """Parse a BAL problem file into a SceneData (reference io.py:133)."""
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)

    def nxt() -> float:
        return float(next(it))

    n_cam, n_pt, n_obs = int(nxt()), int(nxt()), int(nxt())
    obs_cam = np.zeros(n_obs, np.int64)
    obs_pt = np.zeros(n_obs, np.int64)
    obs_uv = np.zeros((n_obs, 2), np.float64)
    for k in range(n_obs):
        obs_cam[k] = int(nxt())
        obs_pt[k] = int(nxt())
        u, v = nxt(), nxt()
        obs_uv[k] = (u, -v)  # y flip (module docstring)
    wRi = np.zeros((n_cam, 3, 3))
    wti = np.zeros((n_cam, 3))
    cal = np.zeros((n_cam, 5))
    for i in range(n_cam):
        w = np.asarray([nxt(), nxt(), nxt()])
        t = np.asarray([nxt(), nxt(), nxt()])
        f_, k1, k2 = nxt(), nxt(), nxt()
        wRi[i], wti[i] = _snavely_to_scene_pose(_rodrigues_to_R(w), t)
        cal[i] = (f_, k1, k2, 0.0, 0.0)
    points = np.zeros((n_pt, 3))
    for j in range(n_pt):
        points[j] = (nxt(), nxt(), nxt())

    tracks: list[list[tuple[int, np.ndarray]]] = [[] for _ in range(n_pt)]
    for k in range(n_obs):
        tracks[int(obs_pt[k])].append((int(obs_cam[k]), obs_uv[k]))
    scene = make_scene(
        wRi.astype(np.float32), wti.astype(np.float32), cal.astype(np.float32),
        tracks,
    )
    pts = np.zeros((scene.num_tracks_padded, 3), np.float32)
    pts[:n_pt] = points
    return _with_points(scene, pts)


def _with_points(scene: SceneData, pts: np.ndarray) -> SceneData:
    import dataclasses

    import jax.numpy as jnp

    return dataclasses.replace(scene, points=jnp.asarray(pts))


def write_bal(path: str, scene: SceneData) -> None:
    """Write a SceneData as a BAL problem file (masked entries dropped).

    Principal points are folded into the measurements (BAL has no u0/v0):
    u_bal = u - u0, v_bal = -(v - v0).
    """
    wRi = np.asarray(scene.wRi, np.float64)
    wti = np.asarray(scene.wti, np.float64)
    cal = np.asarray(scene.cal, np.float64)
    cam_mask = np.asarray(scene.camera_mask) > 0
    trk_mask = np.asarray(scene.track_mask) > 0
    m_mask = np.asarray(scene.meas_mask) > 0
    meas_cam = np.asarray(scene.meas_cam)[m_mask]
    meas_track = np.asarray(scene.meas_track)[m_mask]
    meas_uv = np.asarray(scene.meas_uv, np.float64)[m_mask]
    points = np.asarray(scene.points, np.float64)

    cam_ids = np.nonzero(cam_mask)[0]
    trk_ids = np.nonzero(trk_mask)[0]
    cam_re = -np.ones(scene.num_cameras_padded, np.int64)
    cam_re[cam_ids] = np.arange(len(cam_ids))
    trk_re = -np.ones(scene.num_tracks_padded, np.int64)
    trk_re[trk_ids] = np.arange(len(trk_ids))
    keep = (cam_re[meas_cam] >= 0) & (trk_re[meas_track] >= 0)
    meas_cam, meas_track, meas_uv = (
        meas_cam[keep], meas_track[keep], meas_uv[keep],
    )

    lines = [f"{len(cam_ids)} {len(trk_ids)} {len(meas_cam)}"]
    for c, j, uv in zip(meas_cam, meas_track, meas_uv):
        u0, v0 = cal[c, 3], cal[c, 4]
        lines.append(
            f"{cam_re[c]} {trk_re[j]} {uv[0] - u0:.17g} {-(uv[1] - v0):.17g}"
        )
    for i in cam_ids:
        R, t = _scene_to_snavely_pose(wRi[i], wti[i])
        w = _R_to_rodrigues(R)
        for val in (*w, *t, cal[i, 0], cal[i, 1], cal[i, 2]):
            lines.append(f"{val:.17g}")
    for j in trk_ids:
        for val in points[j]:
            lines.append(f"{val:.17g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_bundler(path: str) -> SceneData:
    """Parse a Bundler v0.3 file into a SceneData (reference io.py:149).

    Bundler stores R (3 rows) and t explicitly per camera, plus per-point
    color and a view list (camera_idx, key_idx, x, y) with the same Snavely
    projection convention as BAL.
    """
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if not ln.startswith("#")]
    tokens = " ".join(lines).split()
    it = iter(tokens)

    def nxt() -> float:
        return float(next(it))

    n_cam, n_pt = int(nxt()), int(nxt())
    wRi = np.zeros((n_cam, 3, 3))
    wti = np.zeros((n_cam, 3))
    cal = np.zeros((n_cam, 5))
    for i in range(n_cam):
        f_, k1, k2 = nxt(), nxt(), nxt()
        R = np.asarray([[nxt() for _ in range(3)] for _ in range(3)])
        t = np.asarray([nxt(), nxt(), nxt()])
        wRi[i], wti[i] = _snavely_to_scene_pose(R, t)
        cal[i] = (f_, k1, k2, 0.0, 0.0)
    points = np.zeros((n_pt, 3))
    tracks: list[list[tuple[int, np.ndarray]]] = []
    for j in range(n_pt):
        points[j] = (nxt(), nxt(), nxt())
        _rgb = (nxt(), nxt(), nxt())
        n_views = int(nxt())
        tr = []
        for _ in range(n_views):
            c = int(nxt())
            _key = nxt()
            u, v = nxt(), nxt()
            tr.append((c, np.asarray([u, -v])))  # y flip
        tracks.append(tr)
    scene = make_scene(
        wRi.astype(np.float32), wti.astype(np.float32), cal.astype(np.float32),
        tracks,
    )
    pts = np.zeros((scene.num_tracks_padded, 3), np.float32)
    pts[:n_pt] = points
    return _with_points(scene, pts)
