"""Pallas Schur kernel vs XLA one-hot MXU path (VERDICT r2 item 7).

Times one full banded/bucketed LM iteration of bundle adjustment with the
S_red reduction assembled (a) by the XLA one-hot bf16 matmul path and
(b) by the Pallas B^T B kernel (ops/pallas_kernels/schur.py), at three
problem sizes the kernel supports (N=128 cameras — its ND<=1280 VMEM
budget pins N; T varies). Decides the kernel's fate: default whichever
wins, delete/document the loser (PERF.md).

    python scripts/schur_bench.py            # on the real TPU
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_problem(rng, n_cams, n_tracks, obs=8):
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.common import scene as scene_mod
    from gtsfm_tpu.geometry import cameras

    cal = np.tile(np.asarray([500.0, -0.05, 0.01, 320.0, 240.0], np.float32),
                  (n_cams, 1))
    wRi = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    wti = np.stack([np.asarray([0.3 * i, 0, 0], np.float32) for i in range(n_cams)])
    X = np.stack([rng.uniform(0, 0.3 * n_cams, n_tracks),
                  rng.uniform(-2, 2, n_tracks),
                  rng.uniform(4, 8, n_tracks)], -1).astype(np.float32)
    start = rng.integers(0, n_cams - obs, n_tracks)
    cam_idx = (start[:, None] + np.arange(obs)[None]).astype(np.int32)
    uv, _ = jax.vmap(
        lambda ci, Xj: cameras.project_bundler(
            jnp.asarray(wRi)[ci], jnp.asarray(wti)[ci], jnp.asarray(cal)[ci],
            jnp.broadcast_to(Xj, (obs, 3)),
        )
    )(jnp.asarray(cam_idx), jnp.asarray(X))
    tracks = [
        [(int(cam_idx[j, k]), np.asarray(uv[j, k])) for k in range(obs)]
        for j in range(n_tracks)
    ]
    sc = scene_mod.make_scene(wRi, wti, cal, tracks)
    return dataclasses.replace(sc, points=sc.points.at[:n_tracks].set(jnp.asarray(X)))


def time_variant(sc, pallas: bool, iters=5):
    import jax

    from gtsfm_tpu.bundle import ba
    from gtsfm_tpu.ops.pallas_kernels import schur as schur_kernel

    os.environ["GTSFM_TPU_PALLAS_SCHUR"] = "1" if pallas else "0"
    jax.clear_caches()  # supported() is read at trace time — force retrace
    cfg = ba.BAConfig(max_iterations=1, bucket_l=ba.auto_bucket_l(sc))
    T = sc.num_tracks_padded
    if pallas and not schur_kernel.supported(
        T, cfg.bucket_l, sc.num_cameras_padded
    ):
        return None
    out = ba.lm_optimize(sc, cfg)
    jax.block_until_ready(out.scene.points)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = ba.lm_optimize(sc, cfg)
        jax.block_until_ready(out.scene.points)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        __import__("gtsfm_tpu.common.cache_dirs",
                   fromlist=["compile_cache_dir"]).compile_cache_dir(),
    )
    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0].device_kind})")
    rng = np.random.default_rng(0)
    print("| N cams | T tracks | XLA one-hot ms | Pallas B^T B ms | winner |")
    print("|---|---|---|---|---|")
    for n_cams, n_tracks in ((128, 8192), (128, 16384), (128, 32768)):
        sc = make_problem(rng, n_cams, n_tracks)
        t_xla = time_variant(sc, pallas=False)
        t_pal = time_variant(sc, pallas=True)
        pal_str = f"{t_pal * 1e3:.2f}" if t_pal else "unsupported"
        win = "-" if t_pal is None else ("pallas" if t_pal < t_xla else "xla")
        print(f"| {n_cams} | {n_tracks} | {t_xla * 1e3:.2f} | {pal_str} | {win} |",
              flush=True)


if __name__ == "__main__":
    main()
