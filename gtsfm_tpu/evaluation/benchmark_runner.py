"""Benchmark matrix runner — the CI regression harness.

Equivalent of the reference's benchmark workflow
(.github/workflows/benchmark.yml matrix + scripts/benchmark_wildcat.sh +
scripts/collect_results.py): runs the full pipeline over a (dataset x
front-end) matrix and writes one result directory per combo, laid out for
evaluation/dashboard.py:

  <out_root>/<dataset>-<frontend>/result_metrics/summary.json
  <out_root>/<dataset>-<frontend>/ba_output/...

Compare two runs (e.g. two branches) with:
  python -m gtsfm_tpu.evaluation.dashboard --master_root A --branch_root B
"""

from __future__ import annotations

import argparse
import json
import os
import time


# (name, loader, dataset_path, extra overrides) — mirrors the reference's CI
# matrix restricted to the datasets bundled with the reference checkout.
DEFAULT_MATRIX = [
    ("door-12-sift", "olsson", "set1_lund_door", []),
    ("door-12-nointrinsics-sift", "olsson", "set2_lund_door_nointrinsics", []),
    ("door-12-orb", "olsson", "set1_lund_door",
     ["frontend.feature_type=orb", "frontend.max_keypoints=4096"]),
    ("hilti-rig-sift", "hilti", "hilti_exp4_small",
     ["retriever.regime=sequential_hilti"]),
    ("mobilebrick-sift", "mobilebrick", "mobilebrick", []),
    # 4-frame Vesta opnav fixture: ~5 deg FOV (f=10715 px) makes the global
    # geometry near-degenerate (bas-relief); tracked for regression, not for
    # absolute pose accuracy (the reference asserts none on it either).
    ("astrovision-vesta-sift", "astrovision", "astrovision/test_2011212_opnav_022", []),
    # 4 internet photos (1dsfm regime, reference one_d_sfm_loader.py): no GT;
    # intrinsics come from EXIF + the sensor-width DB; exercises the
    # high-outlier unordered-pairs path (VERDICT r3 item 10). Tracked for
    # regression (track/inlier counts + runtime), not pose accuracy.
    ("1dsfm-internet-sift", "onedsfm", "1dsfm",
     ["retriever.regime=exhaustive"]),
]


def run_benchmark(
    data_root: str,
    out_root: str,
    matrix=None,
    cache_root: str = "cache_bench",
    max_resolution: int = 512,
) -> dict:
    """Run every matrix entry; returns {name: summary dict or error string}."""
    from gtsfm_tpu.runner.__main__ import main as runner_main

    results = {}
    for name, loader, rel_path, overrides in (matrix or DEFAULT_MATRIX):
        dataset = os.path.join(data_root, rel_path)
        if not os.path.isdir(dataset):
            results[name] = f"skipped (missing {dataset})"
            continue
        out_dir = os.path.join(out_root, name)
        args = [
            "--dataset_root", dataset,
            "--loader", loader,
            "--output_root", out_dir,
            "--cache_dir", os.path.join(cache_root, name),
            "--max_resolution", str(max_resolution),
        ]
        for ov in overrides:
            args += ["--override", ov]
        t0 = time.time()
        try:
            runner_main(args)
            summary_path = os.path.join(out_dir, "result_metrics", "summary.json")
            with open(summary_path) as f:
                results[name] = json.load(f)
            results[name].setdefault("benchmark_runner", {})[
                "total_runtime_sec"
            ] = round(time.time() - t0, 1)
            with open(summary_path, "w") as f:
                json.dump(results[name], f, indent=2)
        except Exception as exc:  # keep the matrix going (CI semantics)
            results[name] = f"FAILED: {exc}"
    return results


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True,
                   help="directory holding the benchmark datasets")
    p.add_argument("--out_root", required=True)
    p.add_argument("--cache_root", default="cache_bench")
    p.add_argument("--max_resolution", type=int, default=512)
    p.add_argument("--only", default=None,
                   help="comma-separated benchmark names to run")
    a = p.parse_args(argv)
    matrix = DEFAULT_MATRIX
    if a.only:
        keep = set(a.only.split(","))
        matrix = [m for m in DEFAULT_MATRIX if m[0] in keep]
    results = run_benchmark(
        a.data_root, a.out_root, matrix, a.cache_root, a.max_resolution
    )
    for name, res in results.items():
        status = res if isinstance(res, str) else "ok"
        print(f"{name}: {status}")


if __name__ == "__main__":
    main()
