"""Worker for the 2-process FULL-PIPELINE multihost test (VERDICT r2 item 5).

Each process: join the multi-controller runtime (2 processes x 4 virtual CPU
devices = one 8-device global mesh), run the ENTIRE SceneOptimizer pipeline
(features -> two-view with pair-axis shard_inputs -> averaging -> DA ->
distributed BA) on the same 8-image synthetic aerial scene, and dump the
reconstruction for the parent to compare. This is the analog of the
reference's full-pipeline LocalCluster integration test
(tests/test_gtsfm_runner_olssonloader.py:20-39) for the SPMD runtime."""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    __import__(
        "gtsfm_tpu.common.cache_dirs", fromlist=["compile_cache_dir"]
    ).compile_cache_dir(),
)


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from gtsfm_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 8

    import numpy as np

    from gtsfm_tpu.loader.synthetic import SyntheticAerialLoader
    from gtsfm_tpu.pipeline.config import PipelineConfig
    from gtsfm_tpu.pipeline.scene_optimizer import SceneOptimizer

    loader = SyntheticAerialLoader(
        num_images=8, rows=2, height=288, width=384, max_resolution=384
    )
    cfg = PipelineConfig(
        enable_cache=False, compile_cache=False, max_resolution=384,
        output_root=os.path.join(os.path.dirname(out_path), f"out{pid}"),
    )
    cfg.frontend.max_keypoints = 512
    opt = SceneOptimizer(cfg)
    result = opt.run(loader, save_outputs=False)
    scene = result.scene

    wRi_gt, wti_gt, _ = loader.get_all_poses()
    np.savez(
        out_path,
        wti=np.asarray(scene.wti),
        camera_mask=np.asarray(scene.camera_mask),
        num_tracks=scene.num_tracks(),
        mean_reproj=float(scene.mean_reprojection_error()),
        process_count=jax.process_count(),
    )
    print(f"worker {pid}: cams={scene.num_cameras()} "
          f"tracks={scene.num_tracks()} "
          f"reproj={float(scene.mean_reprojection_error()):.3f}px", flush=True)


if __name__ == "__main__":
    main()
