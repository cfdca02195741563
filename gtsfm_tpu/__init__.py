"""gtsfm_tpu — a TPU-native global Structure-from-Motion engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GTSfM
(reference: alphonse-CHEN/gtsfm): retrieval -> feature front-end -> two-view
geometry -> view-graph filtering -> rotation/translation averaging -> track
formation + triangulation -> global bundle adjustment -> densification ->
COLMAP export.

Design stance (see SURVEY.md section 7): the reference's task-graph of Python
objects over Dask is replaced with SPMD arrays on a `jax.sharding.Mesh` —
fixed-shape batched tensors (pairs / keypoints / tracks padded to buckets),
one jitted program per stage, and XLA collectives instead of scatter/gather.
"""

import jax

# SfM geometry is accuracy-critical: TPU matmuls default to bf16-accumulate,
# which is far too coarse for epipolar / triangulation / BA linear algebra.
# Force full-precision f32 matmuls globally; deep front-end models opt into
# bf16 explicitly by casting their activations/weights.
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

