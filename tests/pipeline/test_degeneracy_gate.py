"""Two-view GRIC degeneracy gate (reference gric_verifier semantics):
planar / rotation-only pairs are rejected at the pipeline level."""

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import lie
from gtsfm_tpu.pipeline.config import PipelineConfig
from gtsfm_tpu.pipeline.scene_optimizer import SceneOptimizer

F_PX, C_PX = 800.0, 500.0
CAL = np.asarray([F_PX, 0.0, 0.0, C_PX, C_PX], np.float32)


def _project(X, R, t):
    Xc = X @ np.asarray(R).T + t
    x = Xc[:, :2] / Xc[:, 2:3]
    return (x * F_PX + C_PX).astype(np.float32)


def _make_pair(rng, planar: bool, n=200):
    R = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.02])))
    t = np.asarray([0.5, 0.12, 0.08], np.float32)
    if planar:
        z = np.full(n, 5.0)
    else:
        z = rng.uniform(3.0, 9.0, n)
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), z], -1).astype(np.float32)
    uv1 = _project(X, np.eye(3), np.zeros(3))
    uv2 = _project(X, R, t)
    return uv1, uv2


def test_gric_gate_rejects_planar_keeps_general(rng):
    uv1_p, uv2_p = _make_pair(rng, planar=True)
    uv1_g, uv2_g = _make_pair(rng, planar=False)
    x1 = jnp.asarray(np.stack([uv1_p, uv1_g]))
    x2 = jnp.asarray(np.stack([uv2_p, uv2_g]))
    cm = jnp.ones(x1.shape[:2])

    cfg = PipelineConfig(enable_cache=False)
    cfg.two_view.degeneracy_check = True
    cfg.two_view.ba_enabled = False
    opt = SceneOptimizer(cfg)
    pairs = [(0, 1), (0, 2)]
    cals = [CAL, CAL, CAL]
    res, _ = opt.run_two_view(
        None, cals, pairs, precomputed=(x1, x2, cm, None)
    )
    assert not bool(res.success[0])  # planar pair gated out
    assert bool(res.success[1])  # general scene survives
