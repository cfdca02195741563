"""BAL-format BA benchmark: initial -> final reprojection RMSE + iters/s.

Closes VERDICT r3 item 9 (the intent of r2 item 8): run bundle/ba.py on a
standard-SHAPED BAL problem through the interchange format itself. No real
BAL archives exist in this zero-egress environment, so the problem is
synthesized at the classic Ladybug problem-49-7776 size (49 cameras, 7,776
points, ~31k observations — the canonical first problem of the BAL suite),
round-tripped through write_bal/read_bal (Snavely-convention proof), then
perturbed and LM-optimized. The reference delegates BAL ingest to
gtsam.readBal and optimizes the same schedule through GTSAM LM
(gtsfm/utils/io.py:133, bundle_adjustment.py:269-278).

    python scripts/bal_bench.py [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_ladybug(n_cams=49, n_pts=7776, obs_per_pt=4, seed=0):
    """Ladybug-49-shaped ring capture: forward-facing rig driving a loop."""
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.common import scene as scene_mod
    from gtsfm_tpu.geometry import cameras

    rng = np.random.default_rng(seed)
    # Cameras on an arc, looking inward; BAL-style f ~ 1000 px, mild k1/k2.
    cal = np.tile(
        np.asarray([1000.0, -0.05, 0.01, 0.0, 0.0], np.float32), (n_cams, 1)
    )
    angles = np.linspace(-1.0, 1.0, n_cams)
    wRi, wti = [], []
    for a in angles:
        c = np.asarray([20 * np.sin(a), 0.0, -20 * np.cos(a)], np.float32)
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        wRi.append(np.stack([x, y, z], -1).astype(np.float32))
        wti.append(c)
    wRi, wti = np.stack(wRi), np.stack(wti)
    X = np.stack(
        [rng.uniform(-6, 6, n_pts), rng.uniform(-4, 4, n_pts),
         rng.uniform(-6, 6, n_pts)], -1
    ).astype(np.float32)
    start = rng.integers(0, n_cams - obs_per_pt, size=n_pts)
    cam_idx = (start[:, None] + np.arange(obs_per_pt)[None]).astype(np.int32)
    uv, _ = jax.vmap(
        lambda ci, Xj: cameras.project_bundler(
            jnp.asarray(wRi)[ci], jnp.asarray(wti)[ci], jnp.asarray(cal)[ci],
            jnp.broadcast_to(Xj, (obs_per_pt, 3)),
        )
    )(jnp.asarray(cam_idx), jnp.asarray(X))
    uv = np.asarray(uv) + 0.5 * rng.normal(size=uv.shape).astype(np.float32)
    tracks = [
        [(int(cam_idx[j, k]), uv[j, k]) for k in range(obs_per_pt)]
        for j in range(n_pts)
    ]
    sc = scene_mod.make_scene(wRi, wti, cal, tracks)
    pts = np.array(sc.points)
    pts[:n_pts] = X
    return dataclasses.replace(sc, points=jnp.asarray(pts)), n_pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gtsfm_tpu.common.cache_dirs import compile_cache_dir

    jax.config.update("jax_compilation_cache_dir", compile_cache_dir())

    import jax.numpy as jnp

    from gtsfm_tpu.bundle import ba
    from gtsfm_tpu.io import bal as bal_io

    scene, n_pts = synth_ladybug()

    # Round-trip through the BAL interchange format (the benchmark's input
    # is what a BAL file delivers, conversion losses included).
    path = os.path.join(tempfile.mkdtemp(), "problem-49-7776.bal")
    bal_io.write_bal(path, scene)
    loaded = bal_io.read_bal(path)

    # Perturb poses + points: the standard BAL task starts from noisy SfM.
    rng = np.random.default_rng(1)
    from gtsfm_tpu.geometry import lie

    dw = jnp.asarray(rng.normal(size=(loaded.num_cameras_padded, 3)) * 0.01,
                     jnp.float32)
    wRi_p = jax.vmap(lambda R, w: R @ lie.so3_exp(w))(loaded.wRi, dw)
    noisy = dataclasses.replace(
        loaded,
        wRi=wRi_p,
        wti=loaded.wti + jnp.asarray(
            rng.normal(size=loaded.wti.shape) * 0.05, jnp.float32),
        points=loaded.points + jnp.asarray(
            rng.normal(size=loaded.points.shape) * 0.05, jnp.float32),
    )

    def rmse(sc):
        err, _ = sc.reprojection_errors()
        live = np.asarray(sc.meas_mask) > 0
        return float(np.sqrt(np.mean(np.asarray(err)[live] ** 2)))

    r0 = rmse(noisy)
    cfg = ba.BAConfig(max_iterations=30, bucket_l=ba.auto_bucket_l(noisy))
    t0 = time.perf_counter()
    final, stats = ba.run_ba_with_filtering(noisy, (10.0, 5.0, 3.0), cfg)
    wall = time.perf_counter() - t0
    r1 = rmse(final)
    iters = sum(s["iterations"] for s in stats)
    print(f"problem-49-7776 (synth, BAL round-trip): "
          f"{noisy.num_cameras()} cams / {n_pts} pts / "
          f"{noisy.num_measurements()} obs")
    print(f"reproj RMSE: {r0:.3f} -> {r1:.3f} px")
    print(f"LM: {iters} iters in {wall:.2f} s = {iters/wall:.1f} iters/s "
          f"(3-stage [10,5,3] px filtering)")
    for s in stats:
        print(f"  stage thresh={s['threshold']}: {s['iterations']} iters, "
              f"cost {s['initial_cost']:.0f} -> {s['final_cost']:.0f}, "
              f"lm {s['wall_lm_sec']:.2f}s prep {s['wall_prep_sec']:.2f}s")


if __name__ == "__main__":
    main()
