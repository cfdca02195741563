"""Main CLI: python -m gtsfm_tpu.runner --dataset_root <dir> [--loader olsson]

Replaces the reference's per-dataset runner scripts + GtsfmRunnerBase
(gtsfm/runner/gtsfm_runner_base.py:41-457): same flags where they make sense
(max_resolution, max_frame_lookahead, config overrides), no cluster flags —
device topology comes from JAX (mesh), not SSH bootstrap.
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="gtsfm_tpu reconstruction runner")
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--loader", default="olsson", choices=["olsson", "colmap", "hilti", "mobilebrick", "astrovision", "onedsfm", "yfcc", "argoverse"])
    p.add_argument("--images_dir", default=None, help="for colmap loader")
    p.add_argument("--max_resolution", type=int, default=760)
    p.add_argument("--max_frame_lookahead", type=int, default=10)
    p.add_argument("--retriever", default="exhaustive", choices=["exhaustive", "sequential"])
    p.add_argument("--output_root", default="results")
    p.add_argument("--cache_dir", default="cache")
    p.add_argument("--no_cache", action="store_true")
    p.add_argument(
        "--config", default=None,
        help="YAML config file (preset name from gtsfm_tpu/configs/ — e.g. "
        "sift_front_end, deep_front_end, unified — or a path); --override "
        "flags are applied on top",
    )
    p.add_argument(
        "--override", action="append", default=[],
        help="config override a.b=c (repeatable)",
    )
    # Multi-host (multi-controller SPMD) launch — the reference's SSHCluster
    # flags (gtsfm_runner_base.py:244-273) become jax.distributed wiring; see
    # CLUSTER.md. On TPU pod slices --multihost alone auto-detects everything.
    p.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize before any device use "
        "(auto-detected coordinator on TPU pods)",
    )
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (non-TPU clusters)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def resolve_config_path(name_or_path: str) -> str:
    """A preset name resolves against the bundled gtsfm_tpu/configs/."""
    import os

    if os.path.isfile(name_or_path):
        return name_or_path
    bundled = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", name_or_path + (".yaml" if not name_or_path.endswith(".yaml") else ""),
    )
    if os.path.isfile(bundled):
        return bundled
    raise FileNotFoundError(f"config not found: {name_or_path} (nor {bundled})")


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    args = build_parser().parse_args(argv)

    if args.multihost or args.coordinator_address is not None:
        # Must precede every jax backend touch (PipelineConfig is safe).
        from gtsfm_tpu.parallel import multihost

        multihost.initialize(
            args.coordinator_address, args.num_processes, args.process_id
        )

    from gtsfm_tpu.pipeline.config import PipelineConfig
    from gtsfm_tpu.pipeline.scene_optimizer import SceneOptimizer

    cfg = PipelineConfig(
        max_resolution=args.max_resolution,
        output_root=args.output_root,
        cache_dir=args.cache_dir,
        enable_cache=not args.no_cache,
    )
    cfg.retriever.regime = args.retriever
    cfg.retriever.max_frame_lookahead = args.max_frame_lookahead
    if args.config is not None:
        cfg.apply_yaml(resolve_config_path(args.config))
    cfg.apply_overrides(args.override)

    if args.loader == "olsson":
        from gtsfm_tpu.loader.olsson import OlssonLoader

        loader = OlssonLoader(
            args.dataset_root,
            max_frame_lookahead=args.max_frame_lookahead,
            max_resolution=args.max_resolution,
        )
    elif args.loader == "colmap":
        from gtsfm_tpu.loader.colmap import ColmapLoader

        loader = ColmapLoader(
            args.dataset_root, images_dir=args.images_dir,
            max_frame_lookahead=args.max_frame_lookahead,
            max_resolution=args.max_resolution,
        )
    elif args.loader == "hilti":
        from gtsfm_tpu.loader.hilti import HiltiLoader

        loader = HiltiLoader(args.dataset_root, max_resolution=args.max_resolution)
    elif args.loader == "mobilebrick":
        from gtsfm_tpu.loader.mobilebrick import MobilebrickLoader

        loader = MobilebrickLoader(
            args.dataset_root, max_frame_lookahead=args.max_frame_lookahead,
            max_resolution=args.max_resolution,
        )
    elif args.loader == "astrovision":
        from gtsfm_tpu.loader.astrovision import AstrovisionLoader

        loader = AstrovisionLoader(
            args.dataset_root, max_frame_lookahead=args.max_frame_lookahead,
            max_resolution=args.max_resolution,
        )
    elif args.loader == "argoverse":
        from gtsfm_tpu.loader.argoverse import ArgoverseLoader

        loader = ArgoverseLoader(args.dataset_root, max_resolution=args.max_resolution)
    elif args.loader == "onedsfm":
        from gtsfm_tpu.loader.one_d_sfm import OneDSFMLoader

        loader = OneDSFMLoader(args.dataset_root, max_resolution=args.max_resolution)
    else:
        from gtsfm_tpu.loader.yfcc_imb import YfccImbLoader

        loader = YfccImbLoader(args.dataset_root, max_resolution=args.max_resolution)

    result = SceneOptimizer(cfg).run(loader)
    err, _ = result.scene.reprojection_errors()
    import numpy as np

    live = np.asarray(result.scene.meas_mask) > 0
    print(
        f"DONE: {result.scene.num_cameras()} cameras, {result.scene.num_tracks()} tracks, "
        f"mean reproj {float(np.asarray(err)[live].mean()):.3f}px -> {cfg.output_root}/"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
