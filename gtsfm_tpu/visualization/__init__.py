"""Visualization utilities (reference gtsfm/utils/viz.py +
visualization/view_scene.py): correspondence plots, pose trajectories,
scene scatter — matplotlib, saved to files (headless)."""

from gtsfm_tpu.visualization.plots import (  # noqa: F401
    plot_correspondences,
    plot_pose_graph,
    plot_scene_3d,
)
