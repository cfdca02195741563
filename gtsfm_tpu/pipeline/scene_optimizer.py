"""SceneOptimizer — end-to-end reconstruction orchestration.

TPU-native equivalent of the reference's SceneOptimizer + MultiViewOptimizer
(gtsfm/scene_optimizer.py:59, gtsfm/multi_view_optimizer.py:29) and the
4-phase runner loop (runner/gtsfm_runner_base.py:275-413). Where the reference
builds a Dask task graph (futures for the front-end, delayed graph for the
back-end), every stage here is a batched jitted program over fixed-shape
arrays; the only host work is ragged bookkeeping (tracks, exports).

Stages (same contract as the reference, SURVEY.md section 7 "design stance"):
  1. retrieval -> pair list
  2. features (SIFT / SuperPoint)        [cached by content hash]
  3. batched matching + batched RANSAC two-view estimation
  4. cycle-consistency view-graph filter
  5. rotation averaging (certifiable staircase)
  6. 1dSFM translation averaging (batched MFAS + robust recovery)
  7. DSF tracks -> batched DLT triangulation
  8. multi-stage global BA with landmark filtering
  9. COLMAP export + metrics JSON
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.bundle import ba
from gtsfm_tpu.common import scene as scene_mod
from gtsfm_tpu.common.image import to_grayscale
from gtsfm_tpu.evaluation.metrics import MetricsGroup, save_metrics_reports
from gtsfm_tpu.frontend import sift
from gtsfm_tpu.frontend.cacher import FeatureCache
from gtsfm_tpu.geometry import alignment, cameras, triangulation
from gtsfm_tpu.io import colmap_io
from gtsfm_tpu.loader.base import LoaderBase
from gtsfm_tpu.multiview import (
    data_association,
    rotation_averaging as ra,
    tracks as tracks_mod,
    translation_averaging as ta,
    viewgraph,
)
from gtsfm_tpu.ops import matching, ransac
from gtsfm_tpu.pipeline.config import PipelineConfig
from gtsfm_tpu.retriever import exhaustive_pairs, sequential_pairs

logger = logging.getLogger("gtsfm_tpu")


@dataclasses.dataclass
class ReconstructionResult:
    scene: scene_mod.SceneData
    metrics: list[MetricsGroup]
    wRi_pre_ba: np.ndarray | None = None
    wti_pre_ba: np.ndarray | None = None


class SceneOptimizer:
    def __init__(self, config: PipelineConfig | None = None):
        self.config = config or PipelineConfig()
        if self.config.compile_cache:
            # Persistent XLA compile cache next to the feature/two-view caches:
            # repeat runs skip recompilation (the dominant cold-start cost on
            # TPU — the analog of the reference's front-end cache making CI
            # reruns cheap, benchmark.yml:41-48). Independent of enable_cache:
            # disabling RESULT reuse should not force recompilation. The dir
            # is keyed by machine identity (cache_dirs.compile_cache_dir) so
            # a cache/ directory copied from another host — whose AOT machine
            # code could SIGILL here — is never loaded.
            try:
                from gtsfm_tpu.common.cache_dirs import compile_cache_dir

                jax.config.update(
                    "jax_compilation_cache_dir",
                    compile_cache_dir(
                        os.path.join(os.path.abspath(self.config.cache_dir), "xla")
                    ),
                )
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            except Exception:  # pragma: no cover — config already finalized
                pass

    # ------------------------------------------------------------ stages

    def generate_pairs(self, loader: LoaderBase) -> list[tuple[int, int]]:
        cfg = self.config.retriever
        n = len(loader)
        if cfg.regime == "exhaustive":
            pairs = exhaustive_pairs(n)
        elif cfg.regime in ("retrieval", "sequential_with_retrieval"):
            pairs = self._retrieval_pairs(loader)
        elif cfg.regime == "sequential_hilti":
            # Rig sliding window over FOV-overlapping camera combinations
            # (reference ImageMatchingRegime.SEQUENTIAL_HILTI);
            # max_frame_lookahead counts RIG stations here.
            from gtsfm_tpu.retriever import sequential_hilti_pairs

            pairs = sequential_hilti_pairs(
                n, max_rig_lookahead=min(cfg.max_frame_lookahead, 3)
            )
        else:
            pairs = sequential_pairs(n, cfg.max_frame_lookahead)
        return [p for p in pairs if loader.is_valid_pair(*p)]

    def _retrieval_pairs(self, loader: LoaderBase) -> list[tuple[int, int]]:
        """NetVLAD global-descriptor retrieval (reference ImagePairsGenerator
        + NetVLADRetriever / JointNetVLADSequentialRetriever): one descriptor
        per image, blocked cosine-similarity matrix, top-K per query above
        min_score; the joint regime unions the sliding window in."""
        from gtsfm_tpu.frontend.deep.netvlad import NetVLAD
        from gtsfm_tpu.retriever import similarity

        cfg = self.config.retriever
        model = NetVLAD(checkpoint_path=cfg.netvlad_checkpoint)
        if model.params is None:
            if not cfg.allow_random_weights:
                raise ValueError(
                    "retrieval regime needs retriever.netvlad_checkpoint "
                    "(or allow_random_weights for tests)"
                )
            model.init_random()
        descs = []
        for i in range(len(loader)):
            img, _ = loader.get_image(i)
            rgb = np.asarray(img.value_array, np.float32)
            if rgb.max() > 1.5:
                rgb = rgb / 255.0
            if rgb.ndim == 2:
                rgb = np.stack([rgb] * 3, -1)
            descs.append(np.asarray(model(jnp.asarray(rgb)[None]))[0])
        descs = jnp.asarray(np.stack(descs))
        # Device-side top-K: fetches (N, K) instead of the dense (N, N)
        # similarity matrix (similarity.retrieve_pairs_topk).
        pairs = similarity.retrieve_pairs_topk(
            descs, cfg.num_matched, cfg.min_score
        )
        if cfg.regime == "sequential_with_retrieval":
            return similarity.union_with_window(
                pairs, len(loader), cfg.max_frame_lookahead
            )
        return pairs

    def _make_detector(self):
        """Returns detect(gray_image) -> features with (uv, response,
        descriptor, mask) fields, per the configured feature type."""
        cfg = self.config.frontend
        if cfg.feature_type == "sift":
            return lambda gray: sift.detect_and_describe(
                jnp.asarray(gray), max_keypoints=cfg.max_keypoints
            )
        if cfg.feature_type == "superpoint":
            from gtsfm_tpu.frontend.deep import superpoint as sp_mod

            sp = sp_mod.SuperPoint(
                max_keypoints=cfg.max_keypoints,
                checkpoint_path=cfg.superpoint_checkpoint,
            )
            if sp.params is None:
                if not cfg.allow_random_weights:
                    raise ValueError(
                        "superpoint requires a checkpoint "
                        "(frontend.superpoint_checkpoint) or allow_random_weights"
                    )
                sp.init_random()

            def detect(gray):
                h8 = (gray.shape[0] // 8) * 8
                w8 = (gray.shape[1] // 8) * 8
                return sp(jnp.asarray(gray[:h8, :w8]))

            return detect
        if cfg.feature_type == "kaze":
            from gtsfm_tpu.frontend import kaze

            return lambda gray: kaze.detect_and_describe(
                jnp.asarray(gray), max_keypoints=cfg.max_keypoints
            )
        if cfg.feature_type in ("orb", "brisk"):
            from gtsfm_tpu.frontend import classical

            fn = (classical.orb_detect_and_describe if cfg.feature_type == "orb"
                  else classical.brisk_detect_and_describe)
            return lambda gray: fn(jnp.asarray(gray), max_keypoints=cfg.max_keypoints)
        if cfg.feature_type in ("d2net", "disk"):
            if cfg.feature_type == "d2net":
                from gtsfm_tpu.frontend.deep import d2net as mod

                model = mod.D2Net(max_keypoints=cfg.max_keypoints,
                                  checkpoint_path=cfg.d2net_checkpoint)
                div = 4
            else:
                from gtsfm_tpu.frontend.deep import disk as mod

                model = mod.Disk(max_keypoints=cfg.max_keypoints,
                                 checkpoint_path=cfg.disk_checkpoint)
                div = 16
            if model.params is None:
                if not cfg.allow_random_weights:
                    raise ValueError(
                        f"{cfg.feature_type} requires a checkpoint or "
                        "allow_random_weights"
                    )
                model.init_random()

            def detect(gray):
                h = (gray.shape[0] // div) * div
                w = (gray.shape[1] // div) * div
                rgb = jnp.repeat(jnp.asarray(gray[:h, :w])[..., None], 3, axis=-1)
                return model(rgb)

            return detect
        raise ValueError(f"unknown feature_type {cfg.feature_type}")

    def compute_features(self, loader: LoaderBase):
        cfg = self.config.frontend
        cache = FeatureCache(
            os.path.join(self.config.cache_dir, "features"), self.config.enable_cache
        )
        detect = self._make_detector()
        feats, cals, sizes = [], [], []
        tag = f"{cfg.feature_type}-{cfg.max_keypoints}-{self.config.max_resolution}"
        # Pass 1 (host): load + grayscale + cache probe. Misses are grouped by
        # image shape so pass 2 can run ONE vmapped program per chunk of B
        # images instead of one dispatch per image — a 200-image scene costs
        # ~13 device round-trips rather than 200 (the reference fans out one
        # Dask task per image, det_desc_correspondence_generator.py:68; here
        # the batch axis is the parallelism).
        grays, misses = [], {}
        for i in range(len(loader)):
            img, cal = loader.get_image(i)
            gray = to_grayscale(img.value_array)
            key = cache.key(gray, tag)
            hit = cache.load(key)
            if hit is not None:
                f = sift.SiftFeatures(
                    uv=hit["uv"], scale=hit["scale"], response=hit["response"],
                    descriptor=hit["descriptor"], mask=hit["mask"],
                )
            else:
                f = None
                misses.setdefault(gray.shape, []).append(i)
            grays.append((gray, key))
            feats.append(f)
            cals.append(cal)
            sizes.append((img.width, img.height))
        # Pass 2 (device): batched detection over shape-uniform chunks.
        def store(i, raw):
            # Host-side numpy copies: downstream per-pair stacking then
            # costs zero device round-trips (a 2000-pair scene otherwise
            # issues thousands of tiny device ops — latency-bound through
            # a remote-TPU tunnel).
            f = sift.SiftFeatures(
                uv=np.asarray(raw.uv),
                scale=np.asarray(getattr(raw, "scale",
                                         np.zeros_like(raw.response))),
                response=np.asarray(raw.response),
                descriptor=np.asarray(raw.descriptor),
                mask=np.asarray(raw.mask),
            )
            cache.save(
                grays[i][1],
                dict(uv=f.uv, scale=f.scale, response=f.response,
                     descriptor=f.descriptor, mask=f.mask),
            )
            feats[i] = f

        n_dev = jax.device_count()
        shard = cfg.detect_sharded if cfg.detect_sharded is not None \
            else n_dev > 1
        if shard and n_dev > 1:
            # Mesh-sharded detection (VERDICT r3 item 4): the image batch is
            # sharded over the device axis; each device runs the un-vmapped
            # per-image program sequentially (lax.map). Replaces the
            # reference's per-image Dask fan-out
            # (det_desc_correspondence_generator.py:68).
            from gtsfm_tpu.parallel import distributed

            mesh = distributed.make_mesh()
            for shape, idxs in misses.items():
                pad_n = (-len(idxs)) % n_dev
                stack = np.stack(
                    [grays[i][0] for i in idxs]
                    + [grays[idxs[0]][0]] * pad_n
                )
                raw = distributed.image_sharded_detect(
                    mesh, detect, jnp.asarray(stack)
                )
                raws = jax.device_get(
                    [jax.tree.map(lambda a, k=k: a[k], raw)
                     for k in range(len(idxs))]
                )
                for i, r in zip(idxs, raws):
                    store(i, r)
                logger.info(
                    "features: %d images at shape %s done (%d-device mesh)",
                    len(idxs), shape, n_dev,
                )
            return feats, np.stack(cals), sizes

        if cfg.detect_batch is None:
            # Auto-tune (r3, measured): vmapping the gather-heavy SIFT
            # sampler pessimizes it on TPU (vmap x8 = 39.7 ms/img vs 19.8
            # single at 760x512 — batched gathers lower to a slower general
            # gather), while CPU prefers the batch for core utilization.
            B = 1 if jax.default_backend() == "tpu" else 8
        else:
            B = max(1, int(cfg.detect_batch))
        batched = jax.jit(jax.vmap(detect)) if B > 1 else None
        detect_1 = jax.jit(detect) if B == 1 else None
        for shape, idxs in misses.items():
            # Dispatch EVERY image of the shape group asynchronously, then
            # ONE bulk device->host fetch: fetching per image forces a sync
            # per dispatch, serializing detection against the tunnel RTT
            # (200 images = 200 round trips) where async dispatch overlaps
            # the next image's dispatch with the current one's compute.
            outs = []
            for s in range(0, len(idxs), B):
                chunk = idxs[s : s + B]
                if B > 1:
                    stack = np.stack([grays[i][0] for i in chunk])
                    if len(chunk) < B:  # pad to the compiled batch shape
                        pad = np.repeat(stack[:1], B - len(chunk), axis=0)
                        stack = np.concatenate([stack, pad], axis=0)
                    raw = batched(stack)
                    outs.extend(
                        jax.tree.map(lambda a, k=k: a[k], raw)
                        for k in range(len(chunk))
                    )
                else:
                    outs.append(detect_1(grays[chunk[0]][0]))
            raws = jax.device_get(outs)
            for i, raw in zip(idxs, raws):
                store(i, raw)
            logger.info("features: %d images at shape %s done", len(idxs), shape)
        return feats, np.stack(cals), sizes

    def _deep_match(self, feats, pairs, d1, d2, k1, k2, m1, m2):
        """SuperGlue / LightGlue batched matching (superpoint features)."""
        fe = self.config.frontend
        s1 = jnp.stack([feats[a].response for a, b in pairs])
        s2 = jnp.stack([feats[b].response for a, b in pairs])
        # Image shapes: derive from keypoint extents is fragile; the matchers
        # only use shape for coordinate normalization, so the max_resolution
        # bound is adequate.
        shape = (self.config.max_resolution, self.config.max_resolution)
        if fe.matcher_type == "superglue":
            from gtsfm_tpu.frontend.deep import superglue as sg_mod

            sg = sg_mod.SuperGlue(checkpoint_path=fe.superglue_checkpoint)
            if sg.params is None:
                if not fe.allow_random_weights:
                    raise ValueError(
                        "superglue requires a checkpoint or allow_random_weights"
                    )
                sg.init_random(k=d1.shape[1])
            return sg(d1, d2, k1, k2, s1, s2, m1, m2, shape, shape)
        from gtsfm_tpu.frontend.deep import lightglue as lg_mod

        lg = lg_mod.LightGlue(
            checkpoint_path=fe.lightglue_checkpoint,
            depth_confidence=fe.lightglue_depth_confidence,
            width_confidence=fe.lightglue_width_confidence,
        )
        if lg.params is None:
            if not fe.allow_random_weights:
                raise ValueError(
                    "lightglue requires a checkpoint or allow_random_weights"
                )
            lg.init_random(k=d1.shape[1])
        return lg(d1, d2, k1, k2, m1, m2, shape, shape)

    def run_image_correspondences(self, loader: LoaderBase, pairs):
        """Direct image-pair matching (LoFTR) + dedup aggregation — the
        reference's ImageCorrespondenceGenerator path
        (image_correspondence_generator.py:26 + keypoint_aggregator_dedup).

        Returns (per-image padded keypoints feats-like list, cals, sizes,
        correspondence arrays x1/x2/cm, match_idx) shaped like run_two_view's
        inputs/outputs so the rest of the pipeline is unchanged.
        """
        from gtsfm_tpu.frontend import aggregator
        from gtsfm_tpu.frontend.deep import loftr as loftr_mod

        fe = self.config.frontend
        n = len(loader)
        model = loftr_mod.LoFTR(max_matches=fe.max_keypoints)
        if model.params is None:
            if not fe.allow_random_weights:
                raise ValueError("loftr requires a checkpoint or allow_random_weights")
            img0, _ = loader.get_image(0)
            g0 = to_grayscale(img0.value_array)
            h8, w8 = (g0.shape[0] // 8) * 8, (g0.shape[1] // 8) * 8
            model.init_random(h=h8, w=w8)

        grays, cals, sizes = [], [], []
        for i in range(n):
            img, cal = loader.get_image(i)
            g = to_grayscale(img.value_array)
            h8, w8 = (g.shape[0] // 8) * 8, (g.shape[1] // 8) * 8
            grays.append(jnp.asarray(g[:h8, :w8]))
            cals.append(cal)
            sizes.append((img.width, img.height))

        pair_kpts = {}
        for (a, b) in pairs:
            out = model(grays[a], grays[b])
            live = np.asarray(out.mask) > 0
            pair_kpts[(a, b)] = (
                np.asarray(out.kpts0)[live], np.asarray(out.kpts1)[live]
            )
        kpts_per_image, match_indices = aggregator.aggregate_dedup(pair_kpts, n)

        # Build feats-like per-image padded keypoint tables (no descriptors).
        K = max(max((k.shape[0] for k in kpts_per_image), default=1), 1)
        feats = []
        for i in range(n):
            k = kpts_per_image[i]
            uv = np.zeros((K, 2), np.float32)
            m = np.zeros(K, np.float32)
            uv[: k.shape[0]] = k
            m[: k.shape[0]] = 1.0
            feats.append(
                sift.SiftFeatures(
                    uv=jnp.asarray(uv), scale=jnp.zeros(K), response=jnp.asarray(m),
                    descriptor=jnp.zeros((K, 1)), mask=jnp.asarray(m),
                )
            )

        # Correspondence arrays (P, Kp): per pair, padded.
        P = len(pairs)
        # Floor of 16: the RANSAC engine samples 8-point minimal sets.
        Kp = max(max((m.shape[0] for m in match_indices.values()), default=1), 16)
        x1 = np.zeros((P, Kp, 2), np.float32)
        x2 = np.zeros((P, Kp, 2), np.float32)
        cm = np.zeros((P, Kp), np.float32)
        midx = np.full((P, K), -1, np.int32)
        for k_p, (a, b) in enumerate(pairs):
            m = match_indices[(a, b)]
            x1[k_p, : m.shape[0]] = kpts_per_image[a][m[:, 0]]
            x2[k_p, : m.shape[0]] = kpts_per_image[b][m[:, 1]]
            cm[k_p, : m.shape[0]] = 1.0
            midx[k_p, m[:, 0]] = m[:, 1]
        return feats, np.stack(cals), sizes, (
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(cm), jnp.asarray(midx)
        )

    def run_two_view(self, feats, cals, pairs, precomputed=None,
                     return_stages: bool = False):
        """Batched matching + batched RANSAC over all pairs.

        Large pair lists are processed in fixed-size chunks
        (two_view.chunk_size) so HBM stays bounded at any scene scale while
        each chunk is still one big batched program (the reference streams
        per-pair Dask futures, two_view_estimator.py:569-584; here the unit
        of work is a chunk of pairs, not one pair). The last chunk is padded
        by repeating pairs, so exactly one program shape compiles.

        precomputed: optional (x1, x2, cm, idx) from the image-correspondence
        path (LoFTR), bypassing descriptor matching.
        return_stages: also return {tag: TwoViewResult} snapshots at the
        reference's report points (PRE_BA / POST_BA / POST_ISP,
        two_view_estimator.py:38-41)."""
        chunk = int(self.config.two_view.chunk_size)
        P_all = len(pairs)
        # Device-resident per-image feature stacks (classical det/desc path):
        # each image's descriptors are uploaded ONCE and pairs gather them
        # on-device. The previous layout re-stacked + re-transferred every
        # image's (K, 128) block once per PAIR — at 200 images / 1385 pairs
        # that is ~14x redundant host->device traffic through the tunnel
        # (~0.5 GB per 512-pair chunk), which dominated the two-view stage
        # wall (~39 of 42 s; device compute is ~1 s/chunk, PERF.md r4).
        dev_stacks = None
        if precomputed is None and self.config.frontend.matcher_type == "mutual_nn":
            dev_stacks = dict(
                desc=jnp.asarray(np.stack([np.asarray(f.descriptor) for f in feats])),
                mask=jnp.asarray(np.stack([np.asarray(f.mask) for f in feats])),
                uv=jnp.asarray(np.stack([np.asarray(f.uv) for f in feats])),
                cal=jnp.asarray(np.stack([np.asarray(c) for c in cals])),
            )
        if P_all <= chunk:
            return self._run_two_view_chunk(
                feats, cals, pairs, precomputed, return_stages, dev_stacks
            )

        results, idxs, stage_accum = [], [], {}
        for s in range(0, P_all, chunk):
            sub = list(pairs[s : s + chunk])
            n_real = len(sub)
            while len(sub) < chunk:  # repeat-pad: one compiled shape
                sub.append(sub[-1])
            pre_sub = None
            if precomputed is not None:
                x1, x2, cm, idx = precomputed
                pad = chunk - n_real
                sl = lambda t: jnp.concatenate(
                    [t[s : s + n_real]]
                    + ([jnp.repeat(t[s + n_real - 1 : s + n_real], pad, 0)] if pad else []),
                )
                pre_sub = (sl(x1), sl(x2), sl(cm),
                           None if idx is None else sl(idx))
            out = self._run_two_view_chunk(
                feats, cals, sub, pre_sub, return_stages, dev_stacks
            )
            res_c, idx_c = out[0], out[1]
            trim = lambda t: t[:n_real]
            results.append(jax.tree_util.tree_map(trim, res_c))
            idxs.append(idx_c[:n_real] if idx_c is not None else None)
            if return_stages:
                for tag, st in out[2].items():
                    stage_accum.setdefault(tag, []).append(
                        jax.tree_util.tree_map(trim, st)
                    )
            logger.info("two-view chunk %d-%d / %d done", s, s + n_real, P_all)

        cat = lambda parts: jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *parts
        )
        res = cat(results)
        match_idx = None if idxs[0] is None else jnp.concatenate(idxs)
        if return_stages:
            stages = {tag: cat(parts) for tag, parts in stage_accum.items()}
            return res, match_idx, stages
        return res, match_idx

    @staticmethod
    def _tv_probe(t_prev, label, tree):
        """Opt-in two-view stage timing (GTSFM_TWOVIEW_TIMING=1): host-fetch
        barrier + per-section log, for reconciling the two-view wall against
        kernel rates (VERDICT r4 item 4). No-op (and no device sync —
        dispatch stays async) when unset."""
        if not os.environ.get("GTSFM_TWOVIEW_TIMING"):
            return None
        import time as _time

        from gtsfm_tpu.common import timing as _timing

        _timing.sync(tree)
        now = _time.perf_counter()
        if t_prev is not None and label:
            logger.info("two-view timing: %-14s %7.3f s", label, now - t_prev)
        return now

    def _run_two_view_chunk(self, feats, cals, pairs, precomputed=None,
                            return_stages: bool = False, dev_stacks=None):
        fe = self.config.frontend
        tv = self.config.two_view
        t_p = self._tv_probe(None, "", None)
        if precomputed is not None:
            x1, x2, cm, idx = precomputed
        elif dev_stacks is not None:
            # On-device pair gather from the once-uploaded per-image stacks.
            pa = jnp.asarray([a for a, b in pairs], jnp.int32)
            pb = jnp.asarray([b for a, b in pairs], jnp.int32)
            d1, d2 = dev_stacks["desc"][pa], dev_stacks["desc"][pb]
            m1, m2 = dev_stacks["mask"][pa], dev_stacks["mask"][pb]
            k1, k2 = dev_stacks["uv"][pa], dev_stacks["uv"][pb]
            if fe.feature_type in ("orb", "brisk"):
                idx, mm = matching.match_hamming(
                    d1, d2, m1, m2, ratio_test=fe.ratio_test
                )
            else:
                idx, mm = matching.mutual_nearest_matching(
                    d1, d2, m1, m2, ratio_test=fe.ratio_test
                )
            x1, x2, cm = matching.matches_to_correspondences(idx, mm, k1, k2)
        else:
            npst = lambda xs: jnp.asarray(np.stack([np.asarray(x) for x in xs]))
            d1 = npst([feats[a].descriptor for a, b in pairs])
            d2 = npst([feats[b].descriptor for a, b in pairs])
            m1 = npst([feats[a].mask for a, b in pairs])
            m2 = npst([feats[b].mask for a, b in pairs])
            k1 = npst([feats[a].uv for a, b in pairs])
            k2 = npst([feats[b].uv for a, b in pairs])
            if fe.matcher_type == "mutual_nn":
                if fe.feature_type in ("orb", "brisk"):
                    # Binary descriptors -> Hamming matching (cv2 NORM_HAMMING
                    # equivalent, one MXU matmul for all pairs).
                    idx, mm = matching.match_hamming(
                        d1, d2, m1, m2, ratio_test=fe.ratio_test
                    )
                else:
                    idx, mm = matching.mutual_nearest_matching(
                        d1, d2, m1, m2, ratio_test=fe.ratio_test
                    )
            elif fe.matcher_type in ("superglue", "lightglue"):
                idx, mm = self._deep_match(feats, pairs, d1, d2, k1, k2, m1, m2)
            else:
                raise ValueError(f"unknown matcher_type {fe.matcher_type}")
            x1, x2, cm = matching.matches_to_correspondences(idx, mm, k1, k2)
        t_p = self._tv_probe(t_p, "match+corr", (x1, x2, cm))

        if dev_stacks is not None:
            cal_a = dev_stacks["cal"][pa]
            cal_b = dev_stacks["cal"][pb]
        else:
            cal_a = jnp.asarray(np.stack([np.asarray(cals[a]) for a, b in pairs]))
            cal_b = jnp.asarray(np.stack([np.asarray(cals[b]) for a, b in pairs]))
        K1 = jax.vmap(cameras.K_from_bundler)(cal_a)
        K2 = jax.vmap(cameras.K_from_bundler)(cal_b)
        x1n = cameras.normalize_keypoints(K1[:, None], x1)
        x2n = cameras.normalize_keypoints(K2[:, None], x2)
        f_mean = (cal_a[:, 0] + cal_b[:, 0]) / 2.0
        n_dev = jax.device_count()
        if n_dev > 1 and len(pairs) >= n_dev:
            # Multi-chip: shard the pairs axis over the device mesh (the
            # reference's per-pair Dask fan-out, as SPMD). Pad to mesh size.
            from gtsfm_tpu.parallel import distributed, make_mesh

            P_real = x1n.shape[0]
            P_pad = ((P_real + n_dev - 1) // n_dev) * n_dev
            pad = P_pad - P_real

            def padp(t):
                return jnp.concatenate([t, jnp.zeros((pad,) + t.shape[1:], t.dtype)])

            mesh = make_mesh()
            res = distributed.pair_sharded_verify(
                mesh, jax.random.PRNGKey(self.config.seed),
                padp(x1n), padp(x2n), padp(cm),
                padp(tv.estimation_threshold_px / f_mean),
                num_hypotheses=tv.num_hypotheses,
            )
            res = jax.tree_util.tree_map(lambda t: t[:P_real], res)
            logger.info("two-view sharded over %d devices", n_dev)
        else:
            res = ransac.verify_essential_batched(
                jax.random.PRNGKey(self.config.seed), x1n, x2n, cm,
                threshold=tv.estimation_threshold_px / f_mean,
                num_hypotheses=tv.num_hypotheses,
                min_inliers=tv.min_inliers,
                min_inlier_ratio=tv.min_inlier_ratio,
            )
        t_p = self._tv_probe(t_p, "ransac-verify", res)

        stages = {}
        if tv.degeneracy_check:
            # GRIC H-vs-E selection on normalized coordinates (E acts as the
            # F of the normalized camera; sigma scales by the mean focal).
            from gtsfm_tpu.geometry import lie
            from gtsfm_tpu.ops import verifiers

            E = lie.hat(res.i2Ui1) @ res.i2Ri1
            g = verifiers.gric_select_batched(
                jax.random.PRNGKey(self.config.seed + 1), x1n, x2n, cm, E,
                sigma_px=float(tv.gric_sigma_px) / float(jnp.mean(f_mean)),
            )
            res = res._replace(success=res.success & g.prefer_fundamental)
            t_p = self._tv_probe(t_p, "gric-gate", res)
            logger.info(
                "GRIC degeneracy gate: %d/%d pairs kept",
                int(jnp.sum(res.success)), len(pairs),
            )

        stages["PRE_BA"] = res
        if tv.ba_enabled:
            from gtsfm_tpu.twoview import estimator as tv_est

            refined = tv_est.two_view_ba_batched(
                res.i2Ri1, res.i2Ui1, x1n, x2n, res.inlier_mask,
                tv.ba_reproj_thresh_px / f_mean,
                iterations=tv.ba_iterations,
            )
            num_inl = jnp.sum(refined.inlier_mask, axis=-1)
            n_corr = jnp.maximum(jnp.sum(cm, axis=-1), 1.0)
            stages["POST_BA"] = ransac.TwoViewResult(
                i2Ri1=refined.i2Ri1,
                i2Ui1=refined.i2Ui1,
                inlier_mask=refined.inlier_mask,
                num_inliers=num_inl,
                inlier_ratio=num_inl / n_corr,
                success=res.success,
            )
            # Inlier-support gate (reference InlierSupportProcessor).
            res = stages["POST_BA"]._replace(
                success=res.success & (num_inl >= tv.min_inliers)
            )
            t_p = self._tv_probe(t_p, "two-view-ba", res)
        stages["POST_ISP"] = res
        if return_stages:
            return res, idx, stages
        return res, idx

    def _empty_result(
        self, loader, cals, metrics, frontend_reports, save_outputs,
        reason: str, t0: float, sizes,
        wRi: np.ndarray | None = None,
        camera_mask: np.ndarray | None = None,
    ) -> ReconstructionResult:
        """Graceful degradation: an empty/partial stage still produces a
        result object, metrics JSON/HTML and reports — mirrors the reference's
        keep-running-and-report semantics (verifier_base.py:56 returning None
        poses; bundle_adjustment.py:319-324 aborting BA but still emitting
        metrics) instead of raising."""
        n = len(loader)
        if wRi is None:
            wRi = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
        if camera_mask is None:
            camera_mask = np.zeros(n, np.float32)
        sc = scene_mod.make_scene(
            wRi, np.zeros((n, 3), np.float32), cals, [], camera_mask=camera_mask
        )
        g = MetricsGroup("total_summary_metrics")
        g.add("total_runtime_sec", time.time() - t0)
        g.add("degraded_reason", reason)
        metrics = list(metrics) + [g]
        if save_outputs:
            from gtsfm_tpu.evaluation import pose_metrics as _pm2
            from gtsfm_tpu.evaluation.report import generate_metrics_report_html

            out = self.config.output_root
            os.makedirs(out, exist_ok=True)
            save_metrics_reports(metrics, os.path.join(out, "result_metrics"))
            for tag, reps in frontend_reports.items():
                _pm2.save_two_view_reports(
                    reps,
                    os.path.join(out, "result_metrics",
                                 f"two_view_report_{tag}.json"),
                )
            generate_metrics_report_html(
                metrics,
                os.path.join(out, "result_metrics", "gtsfm_metrics_report.html"),
            )
        return ReconstructionResult(scene=sc, metrics=metrics)

    def run(self, loader: LoaderBase, save_outputs: bool = True) -> ReconstructionResult:
        if self.config.profile_dir:
            import contextlib

            with contextlib.ExitStack() as stack:
                stack.enter_context(jax.profiler.trace(self.config.profile_dir))
                return self._run_impl(loader, save_outputs)
        return self._run_impl(loader, save_outputs)

    def _run_impl(self, loader: LoaderBase, save_outputs: bool = True) -> ReconstructionResult:
        cfg = self.config
        if jax.process_count() > 1:
            # Multi-controller SPMD: every host computes the identical
            # pipeline; only process 0 writes artifacts (CLUSTER.md).
            save_outputs = save_outputs and jax.process_index() == 0
        t0 = time.time()
        metrics: list[MetricsGroup] = []
        n = len(loader)

        pairs = self.generate_pairs(loader)
        g = MetricsGroup("retriever_metrics")
        g.add("num_input_images", n)
        g.add("num_retrieved_image_pairs", len(pairs))
        metrics.append(g)
        logger.info("pairs: %d", len(pairs))

        if cfg.frontend.feature_type == "loftr":
            feats, cals, sizes, precomputed = self.run_image_correspondences(loader, pairs)
        else:
            feats, cals, sizes = self.compute_features(loader)
            precomputed = None

        # Fisheye rigs (Hilti): undistort keypoints into a virtual pinhole so
        # the Cal3Bundler pipeline stays valid (reference handles this via
        # Cal3Fisheye inside GTSAM; here the undistortion happens once).
        fisheye_orig = None
        if hasattr(loader, "get_fisheye_calibration"):
            scale = cals[0][0] / loader.get_camera_intrinsics_full_res(0)[0]
            new_feats = []
            orig_kp, cal9_list = [], []
            for i, f in enumerate(feats):
                cal9 = np.asarray(loader.get_fisheye_calibration(i), np.float32).copy()
                cal9[[0, 1, 3, 4]] *= scale  # match the rescaled resolution
                uv_pin, cal5 = cameras.fisheye_to_virtual_pinhole(
                    jnp.asarray(cal9), f.uv
                )
                uv_pin = uv_pin * f.mask[:, None]
                orig_kp.append(np.asarray(f.uv))
                cal9_list.append(cal9)
                new_feats.append(f._replace(uv=uv_pin))
                cals[i] = np.asarray(cal5)
            feats = new_feats
            # Original distorted keypoints + Cal3Fisheye params: the final BA
            # stage re-optimizes natively on these (fisheye inside BA, like
            # the reference's GeneralSFMFactor2Cal3Fisheye path) instead of
            # trusting the one-time undistortion.
            fisheye_orig = (orig_kp, np.stack(cal9_list))
            logger.info("fisheye keypoints undistorted to virtual pinhole "
                        "(native fisheye BA refinement runs after global BA)")
        t_feat = time.time()
        g = MetricsGroup("correspondence_metrics")
        g.add("num_keypoints_per_image", np.asarray([float(f.mask.sum()) for f in feats]))
        g.add("duration_sec", t_feat - t0)
        metrics.append(g)

        # Two-view cache (reference TwoViewEstimatorCacher,
        # two_view_estimator_cacher.py:36 — key from the first keypoints +
        # config; functions as front-end checkpoint/resume).
        tv_cache = FeatureCache(
            os.path.join(cfg.cache_dir, "two_view"), cfg.enable_cache
        )
        key_payload = np.concatenate(
            [np.asarray(feats[0].uv[:10]).ravel(), np.asarray(feats[-1].uv[:10]).ravel()]
        )
        tv_key = tv_cache.key(
            key_payload,
            f"{len(pairs)}-{cfg.two_view.num_hypotheses}-"
            f"{cfg.two_view.estimation_threshold_px}-{cfg.two_view.ba_enabled}-{cfg.seed}-"
            # Front-end config joins the key: the first-10-keypoints payload
            # (reference two_view_estimator_cacher.py:19-23) collides when a
            # config change alters matches but not the top-10 detections.
            f"{cfg.frontend.feature_type}-{cfg.frontend.max_keypoints}-"
            f"{cfg.frontend.matcher_type}-{cfg.frontend.ratio_test}",
        )
        hit = tv_cache.load(tv_key)
        if hit is not None:
            res = ransac.TwoViewResult(
                i2Ri1=jnp.asarray(hit["i2Ri1"]), i2Ui1=jnp.asarray(hit["i2Ui1"]),
                inlier_mask=jnp.asarray(hit["inlier_mask"]),
                num_inliers=jnp.asarray(hit["num_inliers"]),
                inlier_ratio=jnp.asarray(hit["inlier_ratio"]),
                success=jnp.asarray(hit["success"]),
            )
            match_idx = jnp.asarray(hit["match_idx"])
            tv_stages = {"POST_ISP": res}  # earlier stages not cached
            logger.info("two-view results loaded from cache")
        else:
            res, match_idx, tv_stages = self.run_two_view(
                feats, cals, pairs, precomputed=precomputed, return_stages=True
            )
            tv_cache.save(
                tv_key,
                dict(
                    i2Ri1=np.asarray(res.i2Ri1), i2Ui1=np.asarray(res.i2Ui1),
                    inlier_mask=np.asarray(res.inlier_mask),
                    num_inliers=np.asarray(res.num_inliers),
                    inlier_ratio=np.asarray(res.inlier_ratio),
                    success=np.asarray(res.success), match_idx=np.asarray(match_idx),
                ),
            )
        t_2view = time.time()
        ok = np.asarray(res.success)
        g = MetricsGroup("two_view_metrics")
        g.add("num_verified_pairs", int(ok.sum()))
        g.add("inlier_ratios", np.asarray(res.inlier_ratio))
        g.add("num_inliers", np.asarray(res.num_inliers))
        g.add("duration_sec", t_2view - t_feat)
        # Per-pair reports vs GT (reference TwoViewEstimationReport + the
        # pose_angular_error_thresh < 5 deg success criterion).
        wRi_gt0, wti_gt0, gt_valid0 = loader.get_all_poses()
        if gt_valid0.sum() >= 2:
            from gtsfm_tpu.evaluation import pose_metrics

            num_matches = np.asarray(jnp.sum(match_idx >= 0, axis=-1))
            reports = pose_metrics.two_view_reports_from_results(
                pairs, res, num_matches, wRi_gt0, wti_gt0, gt_valid0
            )
            r_errs = np.asarray(
                [r.R_error_deg for r in reports.values() if r.R_error_deg is not None]
            )
            u_errs = np.asarray(
                [r.U_error_deg for r in reports.values() if r.U_error_deg is not None]
            )
            if r_errs.size:
                g.add("rotation_angular_errors_deg", r_errs)
                g.add("translation_angular_errors_deg", u_errs)
                success = (np.maximum(r_errs, u_errs) < 5.0).mean()
                g.add("pose_success_rate_5deg", float(success))
                for k, v in pose_metrics.pose_auc(r_errs).items():
                    g.add(f"rotation_{k}", v)
        metrics.append(g)
        logger.info("two-view: %d/%d verified", int(ok.sum()), len(pairs))

        # Per-pair frontend reports at every pipeline point (reference
        # save_full_frontend_metrics tags PRE_BA/POST_BA/POST_ISP + VIEWGRAPH,
        # scene_optimizer.py:418, two_view_estimator.py:38-41).
        from gtsfm_tpu.evaluation import pose_metrics as _pm

        num_matches_all = np.asarray(jnp.sum(match_idx >= 0, axis=-1))
        frontend_reports = {
            tag: _pm.two_view_reports_from_results(
                pairs, st, num_matches_all, wRi_gt0, wti_gt0, gt_valid0
            )
            for tag, st in tv_stages.items()
        }
        # GT-epipolar classification of the verified correspondences
        # (reference utils/metrics.py:99-131) on the final (POST_ISP) stage.
        if gt_valid0.sum() >= 2 and "POST_ISP" in frontend_reports:
            _pm.add_gt_correspondence_metrics(
                frontend_reports["POST_ISP"], pairs,
                [np.asarray(f.uv) for f in feats], match_idx,
                np.asarray(res.inlier_mask), cals, wRi_gt0, wti_gt0, gt_valid0,
                dist_threshold_px=cfg.two_view.estimation_threshold_px,
                # Astrovision ships a GT surface mesh: classification then
                # ray-casts against it instead of the epipolar check
                # (reference utils/metrics.py:69-96 prefers the mesh).
                gt_mesh=loader.get_gt_scene_mesh(),
            )
            gt_ratios = [
                r.inlier_ratio_gt_model
                for r in frontend_reports["POST_ISP"].values()
                if r.inlier_ratio_gt_model is not None
            ]
            if gt_ratios:
                metrics[-1].add(
                    "inlier_ratio_wrt_gt_model", np.asarray(gt_ratios, np.float64)
                )

        edges = np.asarray(
            [p for k, p in enumerate(pairs) if ok[k]], np.int64
        ).reshape(-1, 2)
        i2Ri1 = np.asarray(res.i2Ri1)[ok]
        i2Ui1 = np.asarray(res.i2Ui1)[ok]

        logger.info("view-graph cycle filtering: %d edges", len(edges))
        keep, vg_info = viewgraph.filter_cycle_consistent_edges(
            edges, i2Ri1, cfg.multi_view.cycle_error_threshold_deg
        )
        g = MetricsGroup("view_graph_metrics")
        g.add("num_input_edges", len(edges))
        g.add("num_retained_edges", int(keep.sum()))
        g.add("num_triplets", vg_info.get("num_triplets", 0))
        metrics.append(g)
        kept_pairs = {tuple(e) for e in edges[keep].tolist()}
        frontend_reports["VIEWGRAPH"] = {
            pr: rep for pr, rep in frontend_reports["POST_ISP"].items()
            if pr in kept_pairs
        }
        edges, i2Ri1, i2Ui1 = edges[keep], i2Ri1[keep], i2Ui1[keep]

        # Rig/lidar prior edges join the averaging graph directly (they are
        # calibrated/odometry-derived, not subject to cycle filtering) —
        # reference rig averaging variants (rig_1dsfm.py:25).
        if hasattr(loader, "get_relative_pose_priors"):
            prior_map = loader.get_relative_pose_priors()
            existing = {tuple(e) for e in edges.tolist()}
            add_e, add_R, add_U = [], [], []
            for (a, b), p in prior_map.items():
                if (a, b) in existing:
                    continue
                bRa = p.wRi.T  # prior stores aRb; edge (i1=a, i2=b) wants i2Ri1
                bta = -p.wRi.T @ p.wti
                nrm = np.linalg.norm(bta)
                if nrm < 1e-9:
                    continue
                add_e.append((a, b))
                add_R.append(bRa)
                add_U.append(bta / nrm)
            if add_e:
                edges = np.concatenate([edges, np.asarray(add_e, np.int64)])
                i2Ri1 = np.concatenate([i2Ri1, np.asarray(add_R, np.float32)])
                i2Ui1 = np.concatenate([i2Ui1, np.asarray(add_U, np.float32)])
                logger.info("added %d prior edges to the averaging graph", len(add_e))

        if len(edges) == 0:
            # Graceful degradation (reference keeps running and emits metrics
            # when stages produce nothing — verifier_base.py:56 semantics,
            # BA abort at bundle_adjustment.py:319-324).
            logger.warning("view graph empty after cycle filtering — emitting "
                           "empty result with metrics")
            return self._empty_result(
                loader, cals, metrics, frontend_reports, save_outputs,
                reason="empty_view_graph", t0=t0, sizes=sizes,
            )

        # Prune to the largest connected component before rotation averaging
        # (reference multi_view_optimizer.py:123 -> utils/graph.py:42): with a
        # disconnected pair graph the dense connection-Laplacian would give
        # each component an arbitrary relative gauge and silently corrupt the
        # reconstruction. Native C++ union-find (gtsfm_tpu/native/dsf.cpp).
        num_edges_pre_cc = len(edges)
        edges, (i2Ri1, i2Ui1), cc_mask = (
            viewgraph.prune_to_largest_connected_component(n, edges, i2Ri1, i2Ui1)
        )
        if len(edges) < num_edges_pre_cc:
            logger.info(
                "largest-CC pruning: kept %d/%d cameras, %d/%d edges",
                int(cc_mask.sum()), n, len(edges), num_edges_pre_cc,
            )
        metrics[-1].add("num_cameras_in_largest_cc", int(cc_mask.sum()))
        camera_cc_mask = cc_mask.astype(np.float32)
        kept_edge_set = {tuple(e) for e in edges.tolist()}

        # GT precision/recall of the kept edges (reference
        # view_graph_estimator_base.py:238-249: R_precision/R_recall etc. at
        # the 5-degree inlier criterion) + per-partition error distributions.
        post_isp = frontend_reports.get("POST_ISP", {})
        if post_isp and gt_valid0.sum() >= 2:
            inl_R = [r.R_error_deg for pr, r in post_isp.items() if pr in kept_edge_set]
            out_R = [r.R_error_deg for pr, r in post_isp.items() if pr not in kept_edge_set]
            inl_U = [r.U_error_deg for pr, r in post_isp.items() if pr in kept_edge_set]
            out_U = [r.U_error_deg for pr, r in post_isp.items() if pr not in kept_edge_set]
            from gtsfm_tpu.evaluation.pose_metrics import (
                get_precision_recall_from_errors,
            )

            g = metrics[-1]
            for name, (inl, out) in (("R", (inl_R, out_R)), ("U", (inl_U, out_U))):
                prec, rec = get_precision_recall_from_errors(inl, out, 5.0)
                g.add(f"{name}_precision", prec)
                g.add(f"{name}_recall", rec)
                live_in = [e for e in inl if e is not None]
                live_out = [e for e in out if e is not None]
                if live_in:
                    g.add(f"inlier_{name}_angular_errors_deg",
                          np.asarray(live_in, np.float64))
                if live_out:
                    g.add(f"outlier_{name}_angular_errors_deg",
                          np.asarray(live_out, np.float64))

        logger.info("rotation averaging: %d cams, %d edges", n, len(edges))
        wRi_est, ra_info = ra.run_rotation_averaging(n, edges, i2Ri1)
        g = MetricsGroup("rotation_averaging_metrics")
        for k, v in ra_info.items():
            g.add(k, v)
        g.add(
            "relative_rotation_consistency_deg",
            ra.relative_rotation_errors_deg(wRi_est, edges, i2Ri1),
        )
        metrics.append(g)

        # Tracks from verified inlier matches (kept view-graph edges only) —
        # formed BEFORE translation averaging so selected tracks contribute
        # camera->landmark direction measurements (reference
        # multi_view_optimizer.py:130 stage order).
        match_dict = {}
        pair_ok = [p for k, p in enumerate(pairs) if ok[k]]
        inlier_masks = np.asarray(res.inlier_mask)[ok]
        match_idx_ok = np.asarray(match_idx)[ok]
        for kk, (a, b) in enumerate(pair_ok):
            if (a, b) not in kept_edge_set:
                continue
            inl = inlier_masks[kk] > 0
            ia = np.nonzero(inl)[0]
            ib = match_idx_ok[kk][ia]
            match_dict[(a, b)] = np.stack([ia, ib], -1)
        max_kpts = feats[0].uv.shape[0]
        trks = tracks_mod.tracks_from_matches(
            n, max_kpts, match_dict, min_track_len=cfg.multi_view.min_track_len
        )
        kp = np.stack([np.asarray(f.uv) for f in feats])
        meas_tracks = tracks_mod.tracks_to_measurements(trks, kp)
        g = MetricsGroup("data_association_metrics")
        g.add("num_tracks", len(trks))
        g.add("track_lengths", np.asarray([len(t) for t in trks], np.float64))
        metrics.append(g)
        if not trks:
            logger.warning("no tracks formed — emitting empty result with metrics")
            return self._empty_result(
                loader, cals, metrics, frontend_reports, save_outputs,
                reason="no_tracks", t0=t0, sizes=sizes,
                wRi=np.asarray(wRi_est), camera_mask=camera_cc_mask,
            )

        # Padded per-track arrays + camera-frame unit rays for 1dSFM.
        max_len = max(len(t) for t in trks)
        T_n = len(trks)
        tr_cam = np.zeros((T_n, max_len), np.int64)
        tr_uv = np.zeros((T_n, max_len, 2), np.float32)
        tr_mask = np.zeros((T_n, max_len), np.float32)
        for j, tr in enumerate(meas_tracks):
            for l, (ci, uv_) in enumerate(tr[:max_len]):
                tr_cam[j, l] = ci
                tr_uv[j, l] = uv_
                tr_mask[j, l] = 1.0
        cal_per = cals[tr_cam.reshape(-1)].reshape(T_n, max_len, 5)
        xn = np.asarray(
            cameras.bundler_calibrate(jnp.asarray(cal_per), jnp.asarray(tr_uv))
        )
        rays = np.concatenate([xn, np.ones((T_n, max_len, 1), np.float32)], -1)
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True)

        ta_kwargs = dict(
            num_projections=cfg.multi_view.num_mfas_projections, seed=cfg.seed,
            sampling_method=cfg.multi_view.mfas_sampling_method,
            track_cam_idx=tr_cam, track_rays=rays, track_mask=tr_mask,
        )
        if hasattr(loader, "rig_from_image") and hasattr(loader, "get_relative_pose_priors"):
            # Rig datasets: relative pose priors become metric Point3 priors
            # (reference RigTranslationAveraging1DSFM, rig_1dsfm.py:25).
            res_t = ta.run_rig_translation_averaging(
                n, edges, i2Ui1, wRi_est, loader.get_relative_pose_priors(),
                **ta_kwargs,
            )
        else:
            logger.info("translation averaging: %d edges, %d tracks", len(edges), T_n)
            res_t = ta.run_translation_averaging(n, edges, i2Ui1, wRi_est, **ta_kwargs)
        wti_est = res_t.wti.astype(np.float32)
        g = MetricsGroup("translation_averaging_metrics")
        g.add("num_inlier_edges", int(res_t.inlier_edges.sum()))
        g.add("num_total_edges", len(edges))
        metrics.append(g)

        # Triangulate with averaged poses (RANSAC over measurement pairs +
        # exit codes, reference point3d_initializer semantics).
        sc = scene_mod.make_scene(
            np.asarray(wRi_est), wti_est, cals, meas_tracks,
            camera_mask=camera_cc_mask,
        )
        T_pad = sc.num_tracks_padded
        pad_rows = T_pad - tr_cam.shape[0]
        cam_idx = np.pad(tr_cam, ((0, pad_rows), (0, 0))).astype(np.int32)
        uv_t = np.pad(tr_uv, ((0, pad_rows), (0, 0), (0, 0)))
        mask_t = np.pad(tr_mask, ((0, pad_rows), (0, 0)))
        logger.info("triangulating %d tracks (padded %d)", T_n, T_pad)
        tri = data_association.triangulate_tracks_robust(
            jnp.asarray(np.asarray(wRi_est)), jnp.asarray(wti_est), jnp.asarray(cals),
            jnp.asarray(cam_idx), jnp.asarray(uv_t), jnp.asarray(mask_t),
            reproj_thresh_px=cfg.multi_view.triangulation_reproj_thresh_px,
        )
        sc = dataclasses.replace(sc, points=tri.points)
        codes = np.asarray(tri.exit_codes)
        g = metrics[-1]  # data_association_metrics group appended above
        for name, count in data_association.exit_code_histogram(codes).items():
            g.add(f"exit_{name}", count)
        sc = sc.filter_landmarks(cfg.multi_view.triangulation_reproj_thresh_px)
        wRi_pre_ba, wti_pre_ba = np.asarray(sc.wRi), np.asarray(sc.wti)

        # Global BA (+ rig/lidar relative-pose priors if the loader has them,
        # reference rig_bundle_adjustment.py).
        bucket_l = ba.auto_bucket_l(sc)
        if bucket_l > 64:
            # A handful of DSF-chained mega-tracks can push the max track
            # length into the hundreds at large scales; the bucketed layouts
            # unroll a per-slot loop, so an unbounded L explodes the compiled
            # program. Cap at 64 slots (the tail measurements of longer
            # tracks are dropped from BA — a vanishing fraction of the
            # problem; the reference's COLMAP exports cap track elements the
            # same way in practice).
            logger.info("capping BA bucket_l %d -> 64", bucket_l)
            bucket_l = 64
        logger.info("BA bucket_l=%d", bucket_l)
        ba_cfg = ba.BAConfig(
            max_iterations=cfg.multi_view.ba_max_iterations,
            optimize_calibration=cfg.multi_view.optimize_calibration,
            # Scatter-free bucketed Schur path (filtering between stages only
            # shrinks tracks, so the initial max stays valid).
            bucket_l=bucket_l,
        )
        ba_priors = None
        if hasattr(loader, "get_relative_pose_priors"):
            prior_map = loader.get_relative_pose_priors()
            if prior_map:
                ea = np.asarray([a for (a, b) in prior_map], np.int32)
                eb = np.asarray([b for (a, b) in prior_map], np.int32)
                aRb = np.stack([p.wRi for p in prior_map.values()]).astype(np.float32)
                atb = np.stack([p.wti for p in prior_map.values()]).astype(np.float32)
                # sqrt-information from the covariance trace (isotropic approx).
                wgt = np.asarray(
                    [1.0 / max(np.sqrt(np.trace(p.covariance) / 6.0), 1e-3)
                     for p in prior_map.values()], np.float32,
                )
                ba_priors = ba.RelativePosePriors(
                    edges_a=jnp.asarray(ea), edges_b=jnp.asarray(eb),
                    aRb=jnp.asarray(aRb), atb=jnp.asarray(atb),
                    weight=jnp.asarray(wgt),
                )
                logger.info("BA with %d relative-pose priors", len(ea))
        n_dev_ba = jax.device_count()
        logger.info(
            "global BA: %d cams, %d tracks, %d meas",
            int(np.asarray(sc.camera_mask).sum()), sc.num_tracks(),
            int(np.asarray(sc.meas_mask).sum()),
        )
        use_dist_ba = cfg.multi_view.distributed_ba == "on" or (
            cfg.multi_view.distributed_ba == "auto" and n_dev_ba > 1
        )
        if use_dist_ba:
            # Whole back-end on the mesh (the reference runs BA on the Dask
            # cluster, gtsfm_runner_base.py:379-396; here the Schur reduction
            # psums over ICI) — same multi-stage filtering semantics.
            from gtsfm_tpu.parallel import distributed, make_mesh

            final, ba_stats = distributed.run_ba_with_filtering_distributed(
                make_mesh(), sc, cfg.multi_view.ba_reproj_thresholds_px,
                ba_cfg, priors=ba_priors,
            )
            logger.info("global BA distributed over %d devices", n_dev_ba)
        else:
            final, ba_stats = ba.run_ba_with_filtering(
                sc, cfg.multi_view.ba_reproj_thresholds_px, ba_cfg, priors=ba_priors
            )
        if fisheye_orig is not None:
            # Native Cal3Fisheye refinement on the ORIGINAL distorted
            # measurements (reference optimizes fisheye cameras inside BA,
            # bundle_adjustment.py:106 + common/types.py:9-13): rebuild the
            # surviving tracks' measurements with the raw keypoints, seed
            # poses/points from the pinhole solution, one LM stage + filter.
            orig_kp_list, cal9_all = fisheye_orig
            meas_tracks_fish = tracks_mod.tracks_to_measurements(
                trks, np.stack(orig_kp_list)
            )
            sc_fish = scene_mod.make_scene(
                np.asarray(final.wRi), np.asarray(final.wti), cal9_all,
                meas_tracks_fish, camera_mask=camera_cc_mask,
                pad_tracks_to=final.num_tracks_padded,
            )
            sc_fish = dataclasses.replace(
                sc_fish,
                points=final.points,
                track_mask=sc_fish.track_mask * final.track_mask,
            )
            fish_cfg = ba.BAConfig(
                max_iterations=cfg.multi_view.ba_max_iterations,
                optimize_calibration=cfg.multi_view.optimize_calibration,
                bucket_l=ba.auto_bucket_l(sc_fish),
            )
            fish_res = ba.lm_optimize(sc_fish, fish_cfg, priors=ba_priors)
            final_fish = fish_res.scene.filter_landmarks(
                cfg.multi_view.ba_reproj_thresholds_px[-1]
            )
            ba_stats.append(
                dict(
                    threshold=float(cfg.multi_view.ba_reproj_thresholds_px[-1]),
                    initial_cost=float(fish_res.initial_cost),
                    final_cost=float(fish_res.final_cost),
                    iterations=int(fish_res.iterations),
                    tracks=final_fish.num_tracks(),
                    measurements=final_fish.num_measurements(),
                    stage="fisheye_native",
                )
            )
            logger.info(
                "native fisheye BA: cost %.1f -> %.1f (%d iters)",
                float(fish_res.initial_cost), float(fish_res.final_cost),
                int(fish_res.iterations),
            )
            # Keep the refined poses/points; exports stay on the pinhole
            # scene's calibration width except COLMAP cameras, which write
            # OPENCV_FISHEYE when the final scene is fisheye.
            final = final_fish
        t_ba = time.time()
        err, _ = final.reprojection_errors()
        live = np.asarray(final.meas_mask) > 0
        g = MetricsGroup("bundle_adjustment_metrics")
        g.add("number_cameras", final.num_cameras())
        g.add("number_tracks_filtered", final.num_tracks())
        g.add("number_measurements", int(live.sum()))
        g.add("reprojection_errors_px", np.asarray(err)[live])
        for si, s in enumerate(ba_stats):
            g.add(f"stage{si}_final_cost", s["final_cost"])
            g.add(f"stage{si}_iterations", s["iterations"])
            # Per-stage wall breakdown (VERDICT r3 item 2): prep = band
            # detect + layout, lm = the LM loop (includes first-shape
            # compile), filter = landmark filter + re-pad.
            for key in ("wall_prep_sec", "wall_lm_sec", "wall_filter_sec",
                        "lm_iters_per_sec"):
                if key in s:
                    g.add(f"stage{si}_{key}", s[key])
        g.add("duration_sec", t_ba - t_2view)
        metrics.append(g)

        # GT comparison if the loader has poses.
        wRi_gt, wti_gt, gt_valid = loader.get_all_poses()
        est_valid = (np.asarray(gt_valid) > 0) & (np.asarray(final.camera_mask) > 0)
        if est_valid.sum() >= 3:
            (Rb, tb), _ = alignment.align_poses_sim3(
                final.wRi, final.wti, jnp.asarray(wRi_gt), jnp.asarray(wti_gt),
                valid=jnp.asarray(est_valid),
            )
            rot_errs = np.asarray(
                alignment.rotation_errors_deg(Rb, jnp.asarray(wRi_gt))
            )[est_valid]
            tr_errs = np.linalg.norm(np.asarray(tb) - wti_gt, axis=-1)[est_valid]
            g = MetricsGroup("ba_pose_error_metrics")
            g.add("rotation_angle_error_deg", rot_errs)
            g.add("translation_error_distance", tr_errs)
            metrics.append(g)
            logger.info(
                "vs GT: rot max %.3f deg, trans max %.4f", rot_errs.max(), tr_errs.max()
            )

        g = MetricsGroup("total_summary_metrics")
        g.add("total_runtime_sec", time.time() - t0)
        metrics.append(g)

        # Ortho-axis (PCA) alignment of the scene used for densify + all
        # exports (reference scene_optimizer.py:218 aligns ba_output BEFORE
        # the densify graph consumes it; utils/ellipsoid.py). Rigid, so pose
        # comparisons (which Sim3-align) are unaffected.
        from gtsfm_tpu.geometry.ellipsoid import align_scene_to_ortho_axes

        export_scene, _ = align_scene_to_ortho_axes(final)

        if cfg.densify.enabled:
            from gtsfm_tpu.common.image import rescale_image
            from gtsfm_tpu.densify import plane_sweep

            small_imgs = []
            for i in range(n):
                img, _ = loader.get_image(i)
                img_s, sc_factor = rescale_image(img, cfg.densify.max_resolution)
                small_imgs.append(img_s.value_array)
            # Scale scene intrinsics to the MVS resolution.
            mvs_scale = min(small_imgs[0].shape[:2]) / min(
                loader.get_image(0)[0].value_array.shape[:2]
            )
            mvs_cal = np.asarray(export_scene.cal).copy()
            if mvs_cal.shape[-1] == 9:
                # Fisheye final scene: approximate pinhole K for the MVS
                # engines (plane sweep assumes undistorted images; fisheye
                # distortion at MVS resolution is secondary).
                logger.warning("densify on fisheye scene uses virtual-pinhole K")
                f_avg = 0.5 * (mvs_cal[:, 0] + mvs_cal[:, 1])
                mvs_cal = np.stack(
                    [f_avg, np.zeros_like(f_avg), np.zeros_like(f_avg),
                     mvs_cal[:, 3], mvs_cal[:, 4]], -1,
                )
            mvs_cal[:, [0, 3, 4]] *= mvs_scale
            mvs_scene = dataclasses.replace(export_scene, cal=jnp.asarray(mvs_cal))
            if cfg.densify.engine == "patchmatchnet":
                from gtsfm_tpu.densify import patchmatchnet as pmn

                dense = pmn.densify_patchmatchnet(
                    small_imgs, mvs_scene,
                    checkpoint_path=cfg.densify.patchmatchnet_checkpoint,
                    allow_random_weights=cfg.densify.allow_random_weights,
                    num_src_views=cfg.densify.num_src_views,
                )
            else:
                dense = plane_sweep.densify(
                    small_imgs, mvs_scene,
                    num_depths=cfg.densify.num_depths,
                    num_src_views=cfg.densify.num_src_views,
                )
            g = MetricsGroup("densify_metrics")
            for k, v in dense.metrics.items():
                g.add(k, v)
            metrics.append(g)
            # Voxel downsampling of the fused cloud + PSNR metrics (reference
            # densify/mvs_base.py:80-91): the saved cloud is the downsampled one.
            from gtsfm_tpu.densify import mvs_utils

            dense_pts, dense_rgb = np.asarray(dense.points), np.asarray(dense.rgb)
            if dense_pts.shape[0] >= 2:
                voxel_size = mvs_utils.estimate_minimum_voxel_size(dense_pts)
                sampled_pts, sampled_rgb = mvs_utils.downsample_point_cloud(
                    dense_pts, dense_rgb, voxel_size
                )
                metrics.append(
                    mvs_utils.get_voxel_downsampling_metrics(
                        voxel_size, dense_pts, sampled_pts
                    )
                )
            else:
                sampled_pts, sampled_rgb = dense_pts, dense_rgb
            if save_outputs:
                os.makedirs(cfg.output_root, exist_ok=True)
                colmap_io.write_ply(
                    os.path.join(cfg.output_root, "dense_point_cloud.ply"),
                    sampled_pts, sampled_rgb,
                )

        if save_outputs:
            from gtsfm_tpu.evaluation.report import generate_metrics_report_html
            from gtsfm_tpu.ui.process_graph import save_process_graph

            out = cfg.output_root
            os.makedirs(out, exist_ok=True)
            colmap_io.export_scene_as_colmap_text(
                export_scene, os.path.join(out, "ba_output"),
                file_names=loader.image_filenames(), image_sizes=sizes,
            )
            save_metrics_reports(metrics, os.path.join(out, "result_metrics"))
            from gtsfm_tpu.evaluation import pose_metrics as _pm2

            for tag, reps in frontend_reports.items():
                _pm2.save_two_view_reports(
                    reps,
                    os.path.join(out, "result_metrics",
                                 f"two_view_report_{tag}.json"),
                )
            generate_metrics_report_html(
                metrics, os.path.join(out, "result_metrics", "gtsfm_metrics_report.html")
            )
            save_process_graph(cfg, os.path.join(out, "plots"))
            if cfg.save_plots:
                # Per-pair correspondence plots + view-graph/pose plots
                # (reference scene_optimizer.py:366-418 saves under plots/).
                from gtsfm_tpu.visualization import plots as viz_plots

                plots_dir = os.path.join(out, "plots")
                os.makedirs(plots_dir, exist_ok=True)
                try:
                    order = np.argsort(-np.asarray(res.num_inliers))
                    mi_np = np.asarray(match_idx)
                    inl_np = np.asarray(res.inlier_mask)
                    for k in order[: cfg.max_correspondence_plots]:
                        a, b = pairs[int(k)]
                        if not bool(np.asarray(res.success)[k]):
                            continue
                        ia = np.nonzero(mi_np[k] >= 0)[0]
                        if ia.size == 0 or inl_np[k].shape[0] != np.asarray(feats[a].uv).shape[0]:
                            continue
                        ib = mi_np[k][ia]
                        img_a, _ = loader.get_image(a)
                        img_b, _ = loader.get_image(b)
                        viz_plots.plot_correspondences(
                            img_a.value_array, img_b.value_array,
                            np.asarray(feats[a].uv)[ia], np.asarray(feats[b].uv)[ib],
                            inlier_mask=inl_np[k][ia] > 0,
                            save_path=os.path.join(
                                plots_dir, f"correspondences_{a:04d}_{b:04d}.png"
                            ),
                        )
                    viz_plots.plot_pose_graph(
                        np.asarray(final.wti), edges=edges,
                        wti_gt=wti_gt if gt_valid.sum() >= 3 else None,
                        save_path=os.path.join(plots_dir, "view_graph_topology.png"),
                    )
                    from gtsfm_tpu.visualization.plots import plot_scene_3d

                    plot_scene_3d(
                        np.asarray(final.points)[np.asarray(final.track_mask) > 0],
                        np.asarray(final.wti)[np.asarray(final.camera_mask) > 0],
                        save_path=os.path.join(plots_dir, "scene_3d.png"),
                    )
                except Exception as e:  # diagnostics must never kill the run
                    logger.warning("plot saving failed: %s", e)
            # Interactive 3D web viewer (reference rtf_vis_tool equivalent;
            # the reference duplicates results into the React app's public
            # dir, scene_optimizer.py:47-48 — here one standalone HTML).
            from gtsfm_tpu.visualization.web_viewer import export_web_viewer

            export_web_viewer(
                os.path.join(out, "ba_output"),
                os.path.join(out, "viewer.html"),
                metrics_dir=os.path.join(out, "result_metrics"),
            )

        return ReconstructionResult(
            scene=final, metrics=metrics, wRi_pre_ba=wRi_pre_ba, wti_pre_ba=wti_pre_ba
        )
