"""Core differential geometry: SO(3)/SE(3)/Sim(3), cameras, epipolar, triangulation.

TPU-native replacement for the GTSAM manifold types the reference leans on
(reference gtsfm/common/types.py:7-10 — Pose3/Rot3/Unit3/Cal3Bundler/Cal3Fisheye).
Everything here is pure-functional JAX, vmap-first, static-shape.
"""

from gtsfm_tpu.geometry import lie  # noqa: F401
from gtsfm_tpu.geometry import cameras  # noqa: F401
