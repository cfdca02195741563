"""SceneData — the fixed-shape, array-of-structs scene container.

TPU-native redesign of the reference's ``GtsfmData`` (gtsfm/common/gtsfm_data.py:24),
which stores a dict of camera objects plus a list of C++ SfmTrack objects. Here
the whole scene is one pytree of padded arrays so every downstream stage
(triangulation, BA, export, metrics) is a single jitted program:

  * cameras:    ``wRi (N,3,3)``, ``wti (N,3)``, ``cal (N,5)`` (Cal3Bundler),
                ``camera_mask (N,)`` — supports non-contiguous camera indices
                exactly like the reference (missing cameras are masked out).
  * points:     ``points (T,3)``, ``track_mask (T,)``.
  * measurements, two synchronized views:
      - *flat* (BA view): ``meas_cam (M,)``, ``meas_track (M,)``,
        ``meas_uv (M,2)``, ``meas_mask (M,)`` — ideal for segment_sum
        Jacobian/Schur assembly.
      - the padded per-track view used by triangulation is materialized on
        demand via :func:`tracks_to_padded`.

Padding discipline: pad counts are static (bucketed) so XLA compiles once per
bucket. Masked entries are zeros and must never influence results (enforced in
tests).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneData:
    """Scene = cameras + 3D points + 2D measurements (all padded arrays)."""

    wRi: jnp.ndarray  # (N, 3, 3) camera-to-world rotations
    wti: jnp.ndarray  # (N, 3) camera centers (world)
    cal: jnp.ndarray  # (N, 5) Cal3Bundler params (f, k1, k2, u0, v0)
    camera_mask: jnp.ndarray  # (N,) 1.0 for live cameras
    points: jnp.ndarray  # (T, 3) triangulated 3D points
    track_mask: jnp.ndarray  # (T,) 1.0 for live tracks
    meas_cam: jnp.ndarray  # (M,) int32 camera index per measurement
    meas_track: jnp.ndarray  # (M,) int32 track index per measurement
    meas_uv: jnp.ndarray  # (M, 2) pixel measurements
    meas_mask: jnp.ndarray  # (M,) 1.0 for live measurements

    @property
    def num_cameras_padded(self) -> int:
        return self.wRi.shape[0]

    @property
    def num_tracks_padded(self) -> int:
        return self.points.shape[0]

    @property
    def num_measurements_padded(self) -> int:
        return self.meas_cam.shape[0]

    def num_cameras(self) -> int:
        return int(np.sum(np.asarray(self.camera_mask) > 0))

    def num_tracks(self) -> int:
        return int(np.sum(np.asarray(self.track_mask) > 0))

    def num_measurements(self) -> int:
        return int(np.sum(np.asarray(self.meas_mask) > 0))

    # ---------------------------------------------------------------- helpers

    def reprojection_errors(self) -> jnp.ndarray:
        """Per-measurement reprojection error in pixels (masked entries -> 0).

        Mirrors reference GtsfmData.get_scene_reprojection_errors
        (gtsfm/common/gtsfm_data.py) but as one gather + project.
        """
        from gtsfm_tpu.geometry import cameras as cam

        wRi_m = self.wRi[self.meas_cam]
        wti_m = self.wti[self.meas_cam]
        cal_m = self.cal[self.meas_cam]
        X_m = self.points[self.meas_track]
        uv_pred, depth = cam.project_camera(wRi_m, wti_m, cal_m, X_m)
        err = jnp.linalg.norm(uv_pred - self.meas_uv, axis=-1)
        return err * self.meas_mask, depth

    def track_lengths(self) -> jnp.ndarray:
        """Number of live measurements per track."""
        return jax.ops.segment_sum(
            self.meas_mask, self.meas_track, num_segments=self.num_tracks_padded
        )

    def filter_landmarks(self, reproj_thresh_px: float) -> "SceneData":
        """Drop measurements with reprojection error above threshold or behind
        camera, then drop tracks with < 2 remaining measurements.

        Jit-safe masked analog of reference GtsfmData.filter_landmarks +
        the per-stage filtering in bundle_adjustment.py:292-357.
        """
        err, depth = self.reprojection_errors()
        good = (err <= reproj_thresh_px) & (depth > 0) & (self.meas_mask > 0)
        meas_mask = good.astype(self.meas_mask.dtype)
        track_len = jax.ops.segment_sum(
            meas_mask, self.meas_track, num_segments=self.num_tracks_padded
        )
        track_mask = (track_len >= 2).astype(self.track_mask.dtype) * self.track_mask
        # Measurements of dead tracks die too.
        meas_mask = meas_mask * track_mask[self.meas_track]
        return dataclasses.replace(self, meas_mask=meas_mask, track_mask=track_mask)

    def mean_reprojection_error(self) -> jnp.ndarray:
        err, _ = self.reprojection_errors()
        n = jnp.maximum(jnp.sum(self.meas_mask), 1.0)
        return jnp.sum(err) / n

    def select_cameras(self, keep: np.ndarray) -> "SceneData":
        """Restrict the scene to a camera subset (reference
        GtsfmData.pick_cameras semantics, gtsfm/common/gtsfm_data.py):
        measurements of dropped cameras die, tracks with < 2 surviving
        measurements die with them. keep: (N,) bool/0-1 over the padded
        camera axis; indices stay stable (mask-based, no re-indexing)."""
        keep = jnp.asarray(keep, self.camera_mask.dtype)
        camera_mask = self.camera_mask * keep
        meas_mask = self.meas_mask * camera_mask[self.meas_cam]
        track_len = jax.ops.segment_sum(
            meas_mask, self.meas_track, num_segments=self.num_tracks_padded
        )
        track_mask = (track_len >= 2).astype(self.track_mask.dtype) * self.track_mask
        meas_mask = meas_mask * track_mask[self.meas_track]
        return dataclasses.replace(
            self, camera_mask=camera_mask, meas_mask=meas_mask,
            track_mask=track_mask,
        )

    def select_largest_connected_component(self) -> "SceneData":
        """Keep only cameras in the largest connected component of the
        track-covisibility graph (two cameras are connected when a live
        track is seen by both) — reference
        GtsfmData.select_largest_connected_component
        (gtsfm/common/gtsfm_data.py + utils/graph.py:42). Host-side graph
        op (runs once per scene, not inside jit)."""
        from gtsfm_tpu import native

        live = (np.asarray(self.meas_mask) > 0) & (
            np.asarray(self.track_mask)[np.asarray(self.meas_track)] > 0
        )
        cams = np.asarray(self.meas_cam)[live]
        trks = np.asarray(self.meas_track)[live]
        if cams.size == 0:
            return self.select_cameras(np.zeros(self.num_cameras_padded))
        # Covisibility edges: consecutive cameras of each track (sorted by
        # (track, cam)) — a chain connects the whole track, which is all
        # connectivity needs (no need for the full clique).
        order = np.lexsort((cams, trks))
        cams_s, trks_s = cams[order], trks[order]
        same_track = trks_s[1:] == trks_s[:-1]
        u = cams_s[:-1][same_track]
        v = cams_s[1:][same_track]
        if u.size == 0:
            return self.select_cameras(np.zeros(self.num_cameras_padded))
        cc = native.largest_connected_component(self.num_cameras_padded, u, v)
        return self.select_cameras(cc.astype(np.float32))


def make_scene(
    wRi: np.ndarray,
    wti: np.ndarray,
    cal: np.ndarray,
    tracks: Sequence[Sequence[tuple[int, np.ndarray]]],
    camera_mask: np.ndarray | None = None,
    pad_tracks_to: int | None = None,
    pad_meas_to: int | None = None,
) -> SceneData:
    """Host-side scene assembly from variable-length python tracks.

    ``tracks[j]`` is a list of ``(camera_index, uv)`` measurements. Points are
    initialized to zero (triangulate afterwards).
    """
    n = wRi.shape[0]
    t_real = len(tracks)
    m_real = sum(len(tr) for tr in tracks)
    T = pad_tracks_to or _next_bucket(t_real)
    M = pad_meas_to or _next_bucket(m_real)
    if T < t_real or M < m_real:
        raise ValueError(f"pad sizes too small: T={T}<{t_real} or M={M}<{m_real}")

    meas_cam = np.zeros(M, np.int32)
    meas_track = np.zeros(M, np.int32)
    meas_uv = np.zeros((M, 2), np.float32)
    meas_mask = np.zeros(M, np.float32)
    k = 0
    for j, tr in enumerate(tracks):
        for cam_idx, uv in tr:
            if not 0 <= cam_idx < n:
                # Reference GtsfmData.add_track refuses tracks whose
                # measurements reference nonexistent cameras.
                raise ValueError(
                    f"track {j}: measurement references camera {cam_idx} "
                    f"outside [0, {n})"
                )
            meas_cam[k] = cam_idx
            meas_track[k] = j
            meas_uv[k] = uv
            meas_mask[k] = 1.0
            k += 1
    track_mask = np.zeros(T, np.float32)
    track_mask[:t_real] = 1.0
    if camera_mask is None:
        camera_mask = np.ones(n, np.float32)
    return SceneData(
        wRi=jnp.asarray(wRi, jnp.float32),
        wti=jnp.asarray(wti, jnp.float32),
        cal=jnp.asarray(cal, jnp.float32),
        camera_mask=jnp.asarray(camera_mask, jnp.float32),
        points=jnp.zeros((T, 3), jnp.float32),
        track_mask=jnp.asarray(track_mask),
        meas_cam=jnp.asarray(meas_cam),
        meas_track=jnp.asarray(meas_track),
        meas_uv=jnp.asarray(meas_uv),
        meas_mask=jnp.asarray(meas_mask),
    )


def _next_bucket(n: int, granularity: int = 256) -> int:
    """Round up to a bucket size to bound recompilation across scenes."""
    return max(granularity, ((n + granularity - 1) // granularity) * granularity)


def tracks_to_padded(scene: SceneData, max_track_len: int):
    """Materialize the per-track padded view (host-side, numpy).

    Returns (cam_idx (T, L), uv (T, L, 2), mask (T, L)). Measurements beyond
    ``max_track_len`` per track are dropped (longest-first is not needed —
    triangulation only requires >= 2 views; BA uses the flat view and loses
    nothing).
    """
    T = scene.num_tracks_padded
    L = max_track_len
    cam_idx = np.zeros((T, L), np.int32)
    uv = np.zeros((T, L, 2), np.float32)
    mask = np.zeros((T, L), np.float32)
    fill = np.zeros(T, np.int32)
    mc = np.asarray(scene.meas_cam)
    mt = np.asarray(scene.meas_track)
    muv = np.asarray(scene.meas_uv)
    mm = np.asarray(scene.meas_mask)
    for k in range(mc.shape[0]):
        if mm[k] <= 0:
            continue
        j = mt[k]
        f = fill[j]
        if f >= L:
            continue
        cam_idx[j, f] = mc[k]
        uv[j, f] = muv[k]
        mask[j, f] = 1.0
        fill[j] = f + 1
    return cam_idx, uv, mask
