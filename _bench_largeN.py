import time
import numpy as np
import jax, jax.numpy as jnp
from gtsfm_tpu.bundle import ba
from gtsfm_tpu.common import scene as scene_mod
from gtsfm_tpu.geometry import cameras

def build(n_cams=1024, n_tracks=131072, obs=8, seed=0):
    rng = np.random.default_rng(seed)
    cal = np.tile(np.asarray([500.0, -0.05, 0.01, 320.0, 240.0], np.float32), (n_cams, 1))
    angles = np.linspace(-2.8, 2.8, n_cams)
    wRi, wti = [], []
    for a in angles:
        c = np.asarray([30 * np.sin(a), 0.0, -30 * np.cos(a)], np.float32)
        z = -c / np.linalg.norm(c); x = np.cross([0.0, 1.0, 0.0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        wRi.append(np.stack([x, y, z], -1).astype(np.float32)); wti.append(c)
    wRi = np.stack(wRi); wti = np.stack(wti)
    start = rng.integers(0, n_cams - obs, size=n_tracks)
    ctr = wti[start + obs // 2]
    X = (ctr * 0.5 + rng.uniform(-3, 3, size=(n_tracks, 3))).astype(np.float32)
    M = n_tracks * obs
    meas_cam = (start[:, None] + np.arange(obs)[None, :]).reshape(-1).astype(np.int32)
    meas_track = np.repeat(np.arange(n_tracks, dtype=np.int32), obs)
    uv, _ = cameras.project_bundler(
        jnp.asarray(wRi)[meas_cam], jnp.asarray(wti)[meas_cam],
        jnp.asarray(cal)[meas_cam], jnp.asarray(X)[meas_track])
    uv = np.asarray(uv) + 0.5 * rng.normal(size=uv.shape).astype(np.float32)
    return scene_mod.SceneData(
        wRi=jnp.asarray(wRi), wti=jnp.asarray(wti), cal=jnp.asarray(cal),
        camera_mask=jnp.ones(n_cams),
        points=jnp.asarray(X + 0.05 * rng.normal(size=X.shape).astype(np.float32)),
        track_mask=jnp.ones(n_tracks),
        meas_cam=jnp.asarray(meas_cam), meas_track=jnp.asarray(meas_track),
        meas_uv=jnp.asarray(uv), meas_mask=jnp.ones(M))

sc = build()
L = ba.auto_bucket_l(sc)
band, plan = ba.auto_band(sc)
cfg = ba.BAConfig(max_iterations=20, pcg_iterations=20, bucket_l=L, band=band)
r = ba.lm_optimize(sc, cfg, band_plan=plan)
r.final_cost.block_until_ready()
t0 = time.time()
r = ba.lm_optimize(sc, cfg, band_plan=plan)
r.final_cost.block_until_ready()
dt = time.time() - t0
it = max(int(r.iterations), 1)
print("banded-winpcg iters", it, "cost %.0f -> %.0f" % (float(r.initial_cost), float(r.final_cost)), "iters/s", round(it/dt, 2))
