"""Per-stage throughput suite on the current JAX backend (one TPU chip in
production; CPU under tests). Produces the PERF.md measurement table.

Run:  python scripts/perf_suite.py [--json]

Every entry times the SECOND call of a jitted program (compile excluded),
host-synced with timing.sync (a host fetch — jax.block_until_ready is a
NO-OP through the axon remote-TPU tunnel; entries measured before this fix
timed dispatch latency, not compute). RTT is subtracted.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _timed(fn, *args, n=3):
    from gtsfm_tpu.common import timing

    r = fn(*args)
    timing.sync(r)
    rtt = timing.measure_rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        timing.sync(r)
    dt = max((time.perf_counter() - t0) / n - rtt, 1e-9)
    return dt, r


def bench_ba_dense_banded():
    import bench as bench_mod
    from gtsfm_tpu.bundle import ba

    scene = bench_mod.build_problem()
    band, plan = ba.auto_band(scene)
    cfg = ba.BAConfig(max_iterations=30, pcg_iterations=20,
                      bucket_l=ba.auto_bucket_l(scene), band=band)
    from gtsfm_tpu.common import timing

    r = ba.lm_optimize(scene, cfg, band_plan=plan)
    timing.sync(r.final_cost)
    rtt = timing.measure_rtt()
    t0 = time.perf_counter()
    r = ba.lm_optimize(scene, cfg, band_plan=plan)
    timing.sync(r.final_cost)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    return {"name": "BA LM (dense banded Schur), 128 cams / 131k meas",
            "value": round(int(r.iterations) / dt, 1), "unit": "LM iters/s"}


def bench_ba_banded_pcg(n_cams=1024, n_tracks=131072, obs=8):
    import jax.numpy as jnp

    from gtsfm_tpu.bundle import ba
    from gtsfm_tpu.common import scene as scene_mod
    from gtsfm_tpu.geometry import cameras

    rng = np.random.default_rng(0)
    cal = np.tile(np.asarray([500.0, -0.05, 0.01, 320.0, 240.0], np.float32), (n_cams, 1))
    angles = np.linspace(-2.8, 2.8, n_cams)
    wRi, wti = [], []
    for a in angles:
        c = np.asarray([30 * np.sin(a), 0.0, -30 * np.cos(a)], np.float32)
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        wRi.append(np.stack([x, y, z], -1).astype(np.float32))
        wti.append(c)
    wRi = np.stack(wRi)
    wti = np.stack(wti)
    start = rng.integers(0, n_cams - obs, size=n_tracks)
    X = (wti[start + obs // 2] * 0.5 + rng.uniform(-3, 3, size=(n_tracks, 3))).astype(np.float32)
    meas_cam = (start[:, None] + np.arange(obs)[None, :]).reshape(-1).astype(np.int32)
    meas_track = np.repeat(np.arange(n_tracks, dtype=np.int32), obs)
    uv, _ = cameras.project_bundler(
        jnp.asarray(wRi)[meas_cam], jnp.asarray(wti)[meas_cam],
        jnp.asarray(cal)[meas_cam], jnp.asarray(X)[meas_track])
    uv = np.asarray(uv) + 0.5 * rng.normal(size=uv.shape).astype(np.float32)
    sc = scene_mod.SceneData(
        wRi=jnp.asarray(wRi), wti=jnp.asarray(wti), cal=jnp.asarray(cal),
        camera_mask=jnp.ones(n_cams),
        points=jnp.asarray(X + 0.05 * rng.normal(size=X.shape).astype(np.float32)),
        track_mask=jnp.ones(n_tracks),
        meas_cam=jnp.asarray(meas_cam), meas_track=jnp.asarray(meas_track),
        meas_uv=jnp.asarray(uv), meas_mask=jnp.ones(n_tracks * obs))
    band, plan = ba.auto_band(sc)
    cfg = ba.BAConfig(max_iterations=20, pcg_iterations=20,
                      bucket_l=ba.auto_bucket_l(sc), band=band)
    from gtsfm_tpu.common import timing

    r = ba.lm_optimize(sc, cfg, band_plan=plan)
    timing.sync(r.final_cost)
    rtt = timing.measure_rtt()
    t0 = time.perf_counter()
    r = ba.lm_optimize(sc, cfg, band_plan=plan)
    timing.sync(r.final_cost)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    return {"name": "BA LM (banded window-block PCG), 1024 cams / 1.05M meas",
            "value": round(int(r.iterations) / dt, 1), "unit": "LM iters/s"}


def _circle_rotations(n, seed=0):
    from gtsfm_tpu.geometry import lie
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    w = rng.normal(scale=0.5, size=(n, 3)).astype(np.float32)
    return np.asarray(lie.so3_exp(jnp.asarray(w)))


def bench_rotation_averaging(n=512, lookahead=10):
    from gtsfm_tpu.multiview import rotation_averaging as rot

    R = _circle_rotations(n)
    edges = np.asarray([(i, j) for i in range(n)
                        for j in range(i + 1, min(i + 1 + lookahead, n))])
    i2Ri1 = np.einsum("eij,ekj->eik", R[edges[:, 1]], R[edges[:, 0]])
    rot.run_rotation_averaging(n, edges, i2Ri1)  # warmup (compile)
    t0 = time.perf_counter()
    wRi, info = rot.run_rotation_averaging(n, edges, i2Ri1)
    dt = time.perf_counter() - t0
    return {"name": f"Rotation averaging (staircase + certificate), {n} cams / {len(edges)} edges",
            "value": round(dt, 2), "unit": "s (warm)"}


def bench_rotation_averaging_sparse(n=10240, lookahead=10):
    """Matrix-free edge path at the 10k-image envelope (VERDICT r4 weak #5)."""
    from gtsfm_tpu.multiview import rotation_averaging as rot

    R = _circle_rotations(n)
    i = np.arange(n).repeat(lookahead)
    j = i + np.tile(np.arange(1, lookahead + 1), n)
    m = j < n
    edges = np.stack([i[m], j[m]], -1)
    i2Ri1 = np.einsum("eji,ejk->eik", R[edges[:, 1]], R[edges[:, 0]])
    rot.run_rotation_averaging(n, edges, i2Ri1, method="sparse")  # warmup
    t0 = time.perf_counter()
    wRi, info = rot.run_rotation_averaging(n, edges, i2Ri1, method="sparse")
    dt = time.perf_counter() - t0
    assert info["method"] == "sparse"
    return {"name": f"Rotation averaging SPARSE (CG chordal + edge staircase), {n} cams / {len(edges)} edges",
            "value": round(dt, 2), "unit": "s (warm)"}


def bench_translation_averaging(n=512, lookahead=10):
    from gtsfm_tpu.multiview import translation_averaging as ta

    R = _circle_rotations(n)
    rng = np.random.default_rng(0)
    t = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    edges = np.asarray([(i, j) for i in range(n)
                        for j in range(i + 1, min(i + 1 + lookahead, n))])
    d = np.einsum("eij,ej->ei", R[edges[:, 1]].transpose(0, 2, 1) * 0 +
                  np.swapaxes(R[edges[:, 1]], 1, 2), t[edges[:, 0]] - t[edges[:, 1]])
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
    ta.run_translation_averaging(n, edges, d.astype(np.float32), R)  # warmup
    t0 = time.perf_counter()
    res = ta.run_translation_averaging(n, edges, d.astype(np.float32), R)
    dt = time.perf_counter() - t0
    return {"name": f"Translation averaging (1dSFM: MFAS x512 + GN), {n} cams / {len(edges)} edges",
            "value": round(dt, 2), "unit": "s (warm)"}


def bench_triangulation(T=100_000, L=6, N=256):
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.geometry import cameras
    from gtsfm_tpu.multiview import data_association as da

    rng = np.random.default_rng(0)
    angles = np.linspace(-1.5, 1.5, N)
    wRi, wti = [], []
    for a in angles:
        c = np.asarray([15 * np.sin(a), 0.0, -15 * np.cos(a)], np.float32)
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        wRi.append(np.stack([x, np.cross(z, x), z], -1).astype(np.float32))
        wti.append(c)
    wRi = jnp.asarray(np.stack(wRi))
    wti = jnp.asarray(np.stack(wti))
    cal = jnp.asarray(np.tile(np.asarray([500.0, 0, 0, 320, 240], np.float32), (N, 1)))
    X = rng.uniform(-3, 3, size=(T, 3)).astype(np.float32)
    start = rng.integers(0, N - L, size=T)
    cam_idx = jnp.asarray((start[:, None] + np.arange(L)[None, :]).astype(np.int32))
    uv, _ = cameras.project_bundler(
        wRi[cam_idx.reshape(-1)], wti[cam_idx.reshape(-1)],
        cal[cam_idx.reshape(-1)], jnp.asarray(np.repeat(X, L, 0)))
    uv = uv.reshape(T, L, 2) + 0.5
    mask = jnp.ones((T, L))

    fn = jax.jit(lambda: da.triangulate_tracks_robust(wRi, wti, cal, cam_idx, uv, mask))
    dt, _ = _timed(lambda: fn(), n=3)
    return {"name": f"Robust triangulation (RANSAC pairs + GN), {T} tracks x {L} views",
            "value": round(T / dt / 1e6, 2), "unit": "M tracks/s"}


def bench_ransac(P=256, M=2048, H=512):
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.geometry import lie
    from gtsfm_tpu.ops import ransac

    rng = np.random.default_rng(0)
    x1 = np.zeros((P, M, 2), np.float32)
    x2 = np.zeros((P, M, 2), np.float32)
    for p in range(P):
        R = np.asarray(lie.so3_exp(jnp.asarray(rng.uniform(-0.2, 0.2, 3).astype(np.float32))))
        t = rng.normal(size=3).astype(np.float32)
        t /= np.linalg.norm(t)
        X = np.stack([rng.uniform(-1, 1, M), rng.uniform(-1, 1, M), rng.uniform(4, 8, M)], -1).astype(np.float32)
        Y = X @ R.T + t
        x1[p] = X[:, :2] / X[:, 2:3]
        x2[p] = Y[:, :2] / Y[:, 2:3]
    key = jax.random.PRNGKey(0)
    mask = jnp.ones((P, M))
    thr = jnp.full((P,), 4.0 / 500.0)
    fn = jax.jit(lambda k: ransac.verify_essential_batched(
        k, jnp.asarray(x1), jnp.asarray(x2), mask, thr, num_hypotheses=H))
    dt, _ = _timed(fn, key, n=3)
    return {"name": f"Two-view RANSAC (5-pt, {H} hyp, LO), {P} pairs x {M} corrs",
            "value": round(P / dt, 1), "unit": "pairs/s"}


def bench_matching(P=128, K=4096, D=128):
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.ops import matching

    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.normal(size=(P, K, D)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(size=(P, K, D)).astype(np.float32))
    m = jnp.ones((P, K))
    fn = jax.jit(lambda a, b: matching.mutual_nearest_matching(a, b, m, m, ratio_test=0.8))
    dt, _ = _timed(fn, d1, d2, n=3)
    return {"name": f"Mutual-NN matching (+ratio), {P} pairs x {K} kpts x {D}d",
            "value": round(P / dt, 1), "unit": "pairs/s"}


def bench_sift(h=1088, w=736, n=32):
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.frontend import sift

    from gtsfm_tpu.common import timing

    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.uniform(0, 1, size=(h, w)).astype(np.float32))
            for _ in range(n)]
    # Jitted ONE program per image (the pipeline runs it jitted+vmapped,
    # scene_optimizer detect_batch); eager would pay one tunnel RTT per op.
    fn = jax.jit(lambda im: sift.detect_and_describe(im, max_keypoints=4096))
    out = fn(imgs[0])
    timing.sync(out)
    rtt = timing.measure_rtt()
    # Per-image sync + output checksum: rules out the measurement artifact of
    # timing only dispatch (round-1 review flagged the dispatch-pipelined
    # number as implausible vs the bandwidth roofline).
    checksum = 0.0
    t0 = time.perf_counter()
    for im in imgs:
        out = fn(im)
        timing.sync(out.response)
        checksum += float(out.response[0])
    dt = max((time.perf_counter() - t0) / n - 2 * rtt, 1e-9)
    return {"name": f"SIFT detect+describe ({h}x{w}, 4096 kpts, per-image sync, "
                    f"checksum {checksum:.3e})",
            "value": round(1.0 / dt, 1), "unit": "images/s"}


def bench_plane_sweep(H=480, W=640, S=4, D=64, n=8):
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.densify import plane_sweep as ps

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    srcs = jnp.asarray(rng.uniform(0, 1, (S, H, W)).astype(np.float32))
    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    Ks = jnp.broadcast_to(K, (S, 3, 3))
    Rs = jnp.broadcast_to(jnp.eye(3), (S, 3, 3))
    ts = jnp.asarray(rng.normal(scale=0.2, size=(S, 3)).astype(np.float32))
    args = (ref, srcs, K, Ks, Rs, ts, jnp.float32(2.0), jnp.float32(10.0))
    fn = jax.jit(lambda *a: ps.plane_sweep_depth(*a, num_depths=D))
    from gtsfm_tpu.common import timing

    dt = timing.time_fn(fn, *args, n=n)
    return {"name": f"Plane-sweep MVS depth ({H}x{W}, {S} src views, {D} depths)",
            "value": round(1.0 / dt, 1), "unit": "depth maps/s"}


def bench_translation_averaging_1024():
    return bench_translation_averaging(n=1024, lookahead=10)


def bench_translation_averaging_2048():
    # 1dsfm-scale camera count with realistic (sparse, ~10 edges/cam) density
    # (VERDICT r3 item 7: measure TA beyond 512 cams or shard it).
    return bench_translation_averaging(n=2048, lookahead=10)


ALL = [
    bench_ba_dense_banded,
    bench_ba_banded_pcg,
    bench_rotation_averaging,
    bench_rotation_averaging_sparse,
    bench_translation_averaging,
    bench_translation_averaging_1024,
    bench_translation_averaging_2048,
    bench_triangulation,
    bench_ransac,
    bench_matching,
    bench_sift,
    bench_plane_sweep,
]


def main():
    import os

    # Make the repo importable when invoked as scripts/perf_suite.py.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--only", default=None, help="substring filter")
    args = ap.parse_args()

    import jax

    # Persistent compile cache: repeat suite runs skip XLA compilation.
    jax.config.update("jax_compilation_cache_dir", "/tmp/gtsfm_perf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rows = []
    for fn in ALL:
        if args.only and args.only not in fn.__name__:
            continue
        try:
            r = fn()
        except Exception as e:  # keep going; report the failure
            r = {"name": fn.__name__, "value": None, "unit": f"FAILED: {e}"}
        rows.append(r)
        print(f"{r['name']}: {r['value']} {r['unit']}", flush=True)

    report = {"backend": jax.default_backend(),
              "device": str(jax.devices()[0]), "rows": rows}
    if args.json:
        print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
