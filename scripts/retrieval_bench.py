"""Retrieval at the 10,000-image envelope (VERDICT r4 item 7).

The reference enforces MAX_NUM_IMAGES = 10000 and documents a 50x50-block /
16 GB similarity design (netvlad_retriever.py:21,34,77-107). This measures
our blocked path at exactly that envelope: 10k random unit NetVLAD-dim
descriptors -> blocked similarity matrix -> top-K retrieval -> joint
sequential+retrieval union, with wall seconds and peak RSS.

Usage: python scripts/retrieval_bench.py [--n 10000] [--dim 4096] [--cpu]
"""

from __future__ import annotations

import argparse
import resource
import sys
import time

import jax

sys.path.insert(0, ".")


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from gtsfm_tpu.retriever import similarity

    rng = np.random.default_rng(0)
    d = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    descs = jnp.asarray(d)
    print(f"# {args.n} images x {args.dim}-dim descriptors "
          f"({d.nbytes/1e9:.2f} GB), start RSS {rss_gb():.2f} GB")

    t0 = time.perf_counter()
    sim = similarity.similarity_matrix(descs)
    t_sim = time.perf_counter() - t0
    print(f"similarity_matrix: {t_sim:.2f} s "
          f"({args.n**2*args.dim*2/t_sim/1e12:.2f} TFLOP/s), "
          f"sim {sim.nbytes/1e9:.2f} GB, RSS {rss_gb():.2f} GB")

    t0 = time.perf_counter()
    pairs = similarity.retrieve_pairs(sim, num_matched=5, min_score=-1.0)
    t_ret = time.perf_counter() - t0
    print(f"retrieve_pairs(top-5): {t_ret:.2f} s, {len(pairs)} pairs, "
          f"RSS {rss_gb():.2f} GB")

    t0 = time.perf_counter()
    joint = similarity.joint_sequential_retrieval_pairs(
        sim, max_frame_lookahead=10, num_matched=5, min_score=-1.0
    )
    t_joint = time.perf_counter() - t0
    print(f"joint_sequential_retrieval: {t_joint:.2f} s, {len(joint)} pairs, "
          f"RSS {rss_gb():.2f} GB")
    print(f"TOTAL (dense-sim path) {t_sim + t_ret + t_joint:.2f} s, "
          f"peak RSS {rss_gb():.2f} GB (reference budget: 16 GB)")

    # Device-side top-K path (what the pipeline uses): fetches (N, K), not
    # the (N, N) matrix. Warm up once (XLA compile through the remote
    # tunnel is tens of seconds and amortizes over a session).
    similarity.retrieve_pairs_topk(descs, num_matched=5, min_score=-1.0)
    t0 = time.perf_counter()
    pairs_tk = similarity.retrieve_pairs_topk(descs, num_matched=5,
                                              min_score=-1.0)
    t_tk = time.perf_counter() - t0
    print(f"retrieve_pairs_topk (device top-K): {t_tk:.2f} s, "
          f"{len(pairs_tk)} pairs, RSS {rss_gb():.2f} GB")
    assert pairs_tk == pairs, "top-K path must match the dense-sim path"


if __name__ == "__main__":
    main()
