"""Multi-host (multi-process) runtime test: TWO separate processes, each with
4 virtual devices, joined by jax.distributed.initialize into one 8-device
global mesh running distributed BA — the localhost stand-in for an N-host
TPU pod slice (reference equivalent: SSHCluster multi-machine deployment,
gtsfm_runner_base.py:244-273 + CLUSTER.md)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
WORKER = os.path.join(REPO, "tests", "parallel", "multihost_worker.py")
PIPELINE_WORKER = os.path.join(
    REPO, "tests", "parallel", "multihost_pipeline_worker.py"
)


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "29531", str(i), outs[i]],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        logs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    r0 = np.load(outs[0])
    r1 = np.load(outs[1])
    assert int(r0["process_count"]) == 2
    # Both controllers computed the identical SPMD program: results agree.
    np.testing.assert_allclose(r0["wti"], r1["wti"], atol=1e-6)
    assert float(r0["final_cost"]) == pytest.approx(float(r1["final_cost"]), rel=1e-6)

    # Quality: matches the single-process result of the same problem.
    import jax

    from gtsfm_tpu.bundle import ba
    from gtsfm_tpu.parallel import distributed
    from tests.bundle.test_ba import make_ba_problem, perturb

    rng = np.random.default_rng(0)
    sc_gt, _ = make_ba_problem(rng, n_cams=4, n_tracks=40, pixel_noise=0.0)
    sc0 = perturb(rng, sc_gt, rot_deg=1.5, trans=0.08, pt=0.08)
    cfg = ba.BAConfig(max_iterations=10, bucket_l=ba.auto_bucket_l(sc0),
                      schur_bf16=False)
    _, stats = distributed.distributed_lm_optimize(
        distributed.make_mesh(), sc0, cfg
    )
    assert float(r0["final_cost"]) == pytest.approx(stats["final_cost"], rel=1e-3)


@pytest.mark.slow
def test_two_process_full_pipeline(tmp_path):
    """SceneOptimizer.run() end-to-end in BOTH processes of a 2-process
    multi-controller launch: pair-axis shard_inputs/gather_outputs AND
    distributed BA exercised together (VERDICT r2 item 5; reference analog
    is the full-pipeline LocalCluster test,
    tests/test_gtsfm_runner_olssonloader.py:20-39)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    outs = [str(tmp_path / f"pipe{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, PIPELINE_WORKER, "29537", str(i), outs[i]],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        logs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    r0 = np.load(outs[0])
    r1 = np.load(outs[1])
    assert int(r0["process_count"]) == 2
    # Identical SPMD program on both controllers => identical reconstruction.
    np.testing.assert_allclose(r0["wti"], r1["wti"], atol=1e-6)
    np.testing.assert_array_equal(r0["camera_mask"], r1["camera_mask"])
    assert int(r0["num_tracks"]) == int(r1["num_tracks"])
    # Quality: a clean synthetic scene must reconstruct (not degrade empty).
    assert r0["camera_mask"].sum() >= 6
    assert int(r0["num_tracks"]) > 50
    assert float(r0["mean_reproj"]) < 2.0
