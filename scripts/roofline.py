"""Roofline / MFU accounting for the hot kernels (VERDICT r1 item 7).

For each kernel at 2-3 problem sizes: measured wall time vs the roofline
bound max(FLOPs/peak_flops, bytes/peak_bw), where FLOPs and HBM bytes come
from XLA's own cost model (compiled.cost_analysis()) — no hand-counting, so
the numbers are falsifiable against the actual compiled HLO. Prints a
markdown table for PERF.md.

    python scripts/roofline.py --cost   # pass 1: CPU-process cost model
    python scripts/roofline.py          # pass 2: time on the real TPU
    python scripts/roofline.py --cpu    # smoke only (peaks are TPU's)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (lite) peaks: 197 TFLOP/s bf16 MXU (f32-accumulate), ~0.5x for
# f32-in matmuls; 819 GB/s HBM.
PEAK_FLOPS_BF16 = 197e12
PEAK_FLOPS_F32 = 98.5e12
PEAK_BW = 819e9


def _timed(fn, *args, n=5):
    from gtsfm_tpu.common import timing

    return timing.time_fn(fn, *args, n=n)


_COST_CACHE: dict = {}  # name -> (flops, bytes); loaded in --time mode
_MODE = "time"
_ONLY = None  # substring filter over kernel-section names (--only)


def want(section: str) -> bool:
    return _ONLY is None or _ONLY in section


def analyze(name, fn, args, f32=True, cost=None):
    """Two modes (module global _MODE):

    'cost': compile fn for the CPU backend and record XLA's flop/byte
      model — run in a PURE-CPU process (`--cost`); a mixed axon+cpu
      process deadlocks in the compile path (observed r3), and
      compiled.cost_analysis() through the axon plugin hangs outright.
    'time': measure wall time on the real device (honest host-fetch
      barrier), joining the cost table produced by the cost pass.
    """
    import jax

    if _MODE == "cost":
        if cost is not None:
            flops, raw_bytes = cost  # analytic override (Pallas kernels
            # can't lower for CPU)
        else:
            ca = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            raw_bytes = float(ca.get("bytes accessed", 0.0))
        return {"name": name, "flops": flops, "bytes": raw_bytes}

    if cost is not None:
        flops, raw_bytes = cost
    else:
        flops, raw_bytes = _COST_CACHE.get(name, (0.0, 0.0))
    jfn = jax.jit(fn)
    dt = _timed(jfn, *args)
    peak = PEAK_FLOPS_F32 if f32 else PEAK_FLOPS_BF16
    t_flops = flops / peak
    t_bytes = raw_bytes / PEAK_BW
    bound = max(t_flops, t_bytes)
    frac = bound / dt if dt > 0 else 0.0
    limiter = "MXU" if t_flops >= t_bytes else "HBM"
    row = {
        "name": name,
        "ms": dt * 1e3,
        "gflops": flops / 1e9,
        "gbytes": raw_bytes / 1e9,
        "mfu_pct": 100.0 * flops / peak / dt,
        "roofline_pct": 100.0 * frac,
        "limiter": limiter,
    }
    # Stream each row as it completes (rows() builds the full list before
    # main's print loop runs — without this nothing prints for an hour).
    print(
        f"| {row['name']} | {row['ms']:.2f} | {row['gflops']:.1f} | "
        f"{row['gbytes']:.2f} | {row['mfu_pct']:.1f} | {row['roofline_pct']:.0f} "
        f"| {row['limiter']} |",
        flush=True,
    )
    return row


def rows(small=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    out = []
    rng = np.random.default_rng(0)

    # ---- Mutual-NN matching (pure MXU matmul) at two sizes.
    from gtsfm_tpu.ops import matching

    match_sizes = ((8, 256),) if small else ((64, 2048), (128, 4096))
    for P, K in (match_sizes if want("matching") else ()):
        D = 128
        d1 = jnp.asarray(rng.normal(size=(P, K, D)).astype(np.float32))
        d2 = jnp.asarray(rng.normal(size=(P, K, D)).astype(np.float32))
        m = jnp.ones((P, K))
        out.append(analyze(
            f"matching {P}x{K}x{D}",
            lambda a, b, m1, m2: matching.mutual_nearest_matching(a, b, m1, m2, ratio_test=0.8),
            (d1, d2, m, m),
        ))

    # ---- Two-view RANSAC.
    from gtsfm_tpu.ops import ransac

    ransac_sizes = ((8, 128, 64),) if small else ((64, 1024, 512), (256, 2048, 512))
    for P, M, H in (ransac_sizes if want("ransac") else ()):
        x1 = jnp.asarray(rng.normal(size=(P, M, 2)).astype(np.float32) * 0.3)
        x2 = jnp.asarray(rng.normal(size=(P, M, 2)).astype(np.float32) * 0.3)
        cm = jnp.ones((P, M))
        key = jax.random.PRNGKey(0)
        thr = jnp.full((P,), 4e-3)
        out.append(analyze(
            f"ransac {P}p x {M}c x {H}h",
            lambda k, a, b, c, t: ransac.verify_essential_batched(
                k, a, b, c, t, num_hypotheses=H
            ),
            (key, x1, x2, cm, thr),
        ))

    # ---- SIFT detect+describe (per-image sync + checksum).
    from gtsfm_tpu.frontend import sift

    sift_sizes = ((128, 96),) if small else ((760, 512), (1088, 736))
    for h, w in (sift_sizes if want("sift") else ()):
        img = jnp.asarray(rng.uniform(0, 1, size=(h, w)).astype(np.float32))
        out.append(analyze(f"sift {h}x{w}", lambda im: sift.detect_and_describe(im, max_keypoints=4096), (img,)))
        if _MODE == "time":
            fn = jax.jit(lambda im: sift.detect_and_describe(im, max_keypoints=4096))
            feats = fn(img)
            checksum = float(jnp.sum(feats.response) + jnp.sum(jnp.abs(feats.descriptor)))
            out[-1]["name"] += f" (checksum {checksum:.3e})"

    # ---- Banded BA GN step (the LM inner loop).
    import dataclasses

    from gtsfm_tpu.bundle import ba
    from gtsfm_tpu.common import scene as scene_mod
    from gtsfm_tpu.geometry import cameras, lie

    def banded_problem(n_cams, n_tracks, obs=8):
        cal = np.tile(np.asarray([500.0, -0.05, 0.01, 320.0, 240.0], np.float32),
                      (n_cams, 1))
        wRi = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
        wti = np.stack([np.asarray([0.3 * i, 0, 0], np.float32) for i in range(n_cams)])
        X = np.stack([rng.uniform(0, 0.3 * n_cams, n_tracks),
                      rng.uniform(-2, 2, n_tracks),
                      rng.uniform(4, 8, n_tracks)], -1).astype(np.float32)
        start = rng.integers(0, n_cams - obs, n_tracks)
        cam_idx = (start[:, None] + np.arange(obs)[None]).astype(np.int32)
        import jax

        uv, _ = jax.vmap(
            lambda ci, Xj: cameras.project_bundler(
                jnp.asarray(wRi)[ci], jnp.asarray(wti)[ci], jnp.asarray(cal)[ci],
                jnp.broadcast_to(Xj, (obs, 3)),
            )
        )(jnp.asarray(cam_idx), jnp.asarray(X))
        # ONE bulk device->host fetch: per-element uv[j, k] indexing issues
        # n_tracks*obs separate ~24 ms tunnel round-trips (54 minutes at
        # 16k tracks — the "hung roofline" of r3).
        uv_np = np.asarray(uv)
        tracks = [
            [(int(cam_idx[j, k]), uv_np[j, k]) for k in range(obs)]
            for j in range(n_tracks)
        ]
        sc = scene_mod.make_scene(wRi, wti, cal, tracks)
        return dataclasses.replace(sc, points=sc.points.at[:n_tracks].set(jnp.asarray(X)))

    ba_sizes = ((96, 512),) if small else ((256, 16384), (1024, 65536))
    for n_cams, n_tracks in (ba_sizes if want("BA") else ()):
        sc = banded_problem(n_cams, n_tracks)
        band, plan = ba.auto_band(sc)
        cfg = ba.BAConfig(max_iterations=1, bucket_l=ba.auto_bucket_l(sc),
                          band=band)
        out.append(analyze(
            f"BA banded LM iter {n_cams}cams/{n_tracks}trk",
            lambda s: ba.lm_optimize(s, cfg, band_plan=plan),
            (sc,),
            f32=False if cfg.schur_bf16 else True,
        ))

    # ---- Flash attention (SuperGlue/LightGlue long-context path).
    from gtsfm_tpu.ops.pallas_kernels import attention as attn

    attn_sizes = ((4, 256, 64),) if small else ((8, 4096, 64), (8, 16384, 64))
    for BH, K, Dh in (attn_sizes if want("attention") else ()):
        q = jnp.asarray(rng.normal(size=(BH, K, Dh)).astype(np.float32))
        kk = jnp.asarray(rng.normal(size=(BH, K, Dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(BH, K, Dh)).astype(np.float32))
        km = jnp.ones((BH, K))
        use_pallas = jax.default_backend() == "tpu" and not small
        out.append(analyze(
            f"{'flash' if use_pallas else 'einsum'}_attention {BH}x{K}x{Dh}",
            lambda a, b, c, m: attn.masked_attention(a, b, c, m,
                                                     use_pallas=use_pallas),
            (q, kk, v, km),
            cost=(2 * 2 * BH * K * K * Dh, 4 * BH * K * Dh * 4 + BH * K * 4)
            if use_pallas else None,
        ))

    # ---- Plane-sweep MVS depth.
    from gtsfm_tpu.densify import plane_sweep as ps

    if not want("plane_sweep"):
        return out
    H_, W_, S, D_ = (96, 128, 2, 16) if small else (480, 640, 4, 64)
    gray = jnp.asarray(rng.uniform(0, 1, size=(H_, W_)).astype(np.float32))
    srcs = jnp.asarray(rng.uniform(0, 1, size=(S, H_, W_)).astype(np.float32))
    K = jnp.asarray([[500.0, 0, W_ / 2], [0, 500.0, H_ / 2], [0, 0, 1]])
    Ks = jnp.tile(K, (S, 1, 1))
    sRr = jnp.tile(jnp.eye(3), (S, 1, 1))
    str_ = jnp.asarray(rng.normal(size=(S, 3)).astype(np.float32) * 0.1)
    out.append(analyze(
        f"plane_sweep {H_}x{W_} D{D_} S{S}",
        lambda *a: ps.plane_sweep_depth(*a, num_depths=D_),
        (gray, srcs, K, Ks, sRr, str_, jnp.asarray(3.0), jnp.asarray(9.0)),
    ))
    return out


COST_JSON = "/tmp/roofline_cost.json"


def main():
    global _MODE
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cost", action="store_true",
                    help="pure-CPU cost-model pass; writes " + COST_JSON)
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter: run only matching kernel sections")
    args = ap.parse_args()
    global _ONLY
    _ONLY = args.only
    import json

    import jax

    if args.cpu or args.cost:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", __import__("gtsfm_tpu.common.cache_dirs", fromlist=["compile_cache_dir"]).compile_cache_dir())
    if args.cost:
        _MODE = "cost"
        table = {}
        for r in rows(small=args.small):
            table[r["name"]] = (r["flops"], r["bytes"])
            print(f"cost: {r['name']}: {r['flops']/1e9:.1f} GFLOP "
                  f"{r['bytes']/1e9:.2f} GB", flush=True)
        if os.path.exists(COST_JSON):
            with open(COST_JSON) as f:
                old = json.load(f)
            old.update(table)
            table = old
        with open(COST_JSON, "w") as f:
            json.dump(table, f)
        return
    if os.path.exists(COST_JSON):
        with open(COST_JSON) as f:
            _COST_CACHE.update({k: tuple(v) for k, v in json.load(f).items()})
    print(f"platform: {jax.devices()[0].platform}")
    print("| kernel | ms | GFLOP | GB | MFU % | % of roofline | limiter |")
    print("|---|---|---|---|---|---|---|", flush=True)
    rows(small=args.small)  # analyze() streams each row as it completes


if __name__ == "__main__":
    main()
