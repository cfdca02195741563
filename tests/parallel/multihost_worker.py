"""Worker process for the 2-process multihost test (launched by
test_multihost.py). Each process: initialize the multi-controller runtime,
build the IDENTICAL synthetic BA problem, run distributed LM over the GLOBAL
mesh (2 processes x 4 virtual devices), dump results for the parent to
compare. Mirrors a 2-host TPU pod-slice launch (CLUSTER.md)."""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", __import__("gtsfm_tpu.common.cache_dirs", fromlist=["compile_cache_dir"]).compile_cache_dir())


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from gtsfm_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 8

    import numpy as np

    from gtsfm_tpu.bundle import ba
    from gtsfm_tpu.parallel import distributed
    from tests.bundle.test_ba import make_ba_problem, perturb

    rng = np.random.default_rng(0)
    sc_gt, _ = make_ba_problem(rng, n_cams=4, n_tracks=40, pixel_noise=0.0)
    sc0 = perturb(rng, sc_gt, rot_deg=1.5, trans=0.08, pt=0.08)

    mesh = multihost.global_mesh()
    cfg = ba.BAConfig(max_iterations=10, bucket_l=ba.auto_bucket_l(sc0),
                      schur_bf16=False)
    sc1, stats = distributed.distributed_lm_optimize(mesh, sc0, cfg)

    np.savez(
        out_path,
        wti=np.asarray(sc1.wti),
        final_cost=stats["final_cost"],
        initial_cost=stats["initial_cost"],
        process_count=jax.process_count(),
    )
    print(f"worker {pid}: final_cost={stats['final_cost']:.4f}", flush=True)


if __name__ == "__main__":
    main()
