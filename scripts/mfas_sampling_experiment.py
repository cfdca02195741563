"""1dSFM projection-sampling fidelity experiment (VERDICT round-1 item 8).

Question: is the pipeline default (512 uniform-random projection directions)
as good at MFAS outlier classification as the reference's 2000 directions
with the fancier sampling schemes (averaging_1dsfm.py:105-130)?

Protocol: synthetic translation-averaging problems with known outlier edges
(random direction replaced), sweep {method} x {num_projections}, score
outlier-classification precision/recall at the 0.125 threshold plus final
position error after the full recovery. Results land in PERF.md.

    python scripts/mfas_sampling_experiment.py
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", __import__("gtsfm_tpu.common.cache_dirs", fromlist=["compile_cache_dir"]).compile_cache_dir())

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gtsfm_tpu.multiview import translation_averaging as ta


def make_problem(rng, n=60, edge_prob=0.35, outlier_frac=0.15):
    t_gt = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    edges, dirs, is_outlier = [], [], []
    for a in range(n):
        for b in range(a + 1, n):
            if rng.random() > edge_prob:
                continue
            d = t_gt[a] - t_gt[b]  # w direction from b toward a (w_i2Ui1)
            d = d / np.linalg.norm(d)
            if rng.random() < outlier_frac:
                d = rng.normal(size=3)
                d /= np.linalg.norm(d)
                is_outlier.append(True)
            else:
                is_outlier.append(False)
            edges.append((a, b))
            dirs.append(d)
    return (np.asarray(edges, np.int64), np.stack(dirs).astype(np.float32),
            np.asarray(is_outlier), t_gt)


def score(edges, w_dirs, is_outlier, n, num_proj, method, seed):
    t0 = time.time()
    ow = ta.mfas_outlier_weights(
        edges, w_dirs, n, num_projections=num_proj, seed=seed,
        sampling_method=method,
    )
    dt = time.time() - t0
    pred_out = ow >= ta.OUTLIER_WEIGHT_THRESHOLD
    tp = int(np.sum(pred_out & is_outlier))
    fp = int(np.sum(pred_out & ~is_outlier))
    fn = int(np.sum(~pred_out & is_outlier))
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec, dt


def main():
    configs = [
        ("uniform", 512), ("uniform", 2000),
        ("measurements", 512), ("measurements", 2000),
        ("kde", 512), ("kde", 2000),
        ("mixed", 512), ("mixed", 2000),
    ]
    trials = 5
    results = {}
    for method, nproj in configs:
        ps, rs, ts = [], [], []
        for t in range(trials):
            rng = np.random.default_rng(100 + t)
            edges, w_dirs, is_out, t_gt = make_problem(rng)
            n = int(edges.max()) + 1
            p, r, dt = score(edges, w_dirs, is_out, n, nproj, method, seed=t)
            ps.append(p); rs.append(r); ts.append(dt)
        results[f"{method}-{nproj}"] = {
            "precision": float(np.mean(ps)),
            "recall": float(np.mean(rs)),
            "f1": float(np.mean([2 * p * r / max(p + r, 1e-9)
                                 for p, r in zip(ps, rs)])),
            "sec": float(np.mean(ts[1:]) if len(ts) > 1 else ts[0]),
        }
        print(f"{method}-{nproj}: {results[f'{method}-{nproj}']}", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
