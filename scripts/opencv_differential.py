"""Differential validation against OpenCV — the reference's actual engines.

The reference's verifier IS `cv2.findEssentialMat(USAC_ACCURATE,
prob=0.999999)` + `cv2.recoverPose` (gtsfm/frontend/verifier/ransac.py:74-81,
gtsfm/utils/verification.py:81) and its SIFT IS `cv2.SIFT_create`
(gtsfm/frontend/detector_descriptor/sift.py:24). cv2 5.0 is installed in this
environment, so instead of self-referential "matches USAC" claims this script
runs BOTH engines on IDENTICAL inputs and prints the agreement tables that
PERF.md cites (VERDICT r4 item 1). `tests/differential/` asserts floors taken
from these measurements.

Usage:
  python scripts/opencv_differential.py verifier   # synthetic eps-sweep table
  python scripts/opencv_differential.py door       # real door-12 verifier diff
  python scripts/opencv_differential.py sift       # real door-12 SIFT diff
  python scripts/opencv_differential.py all
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import cv2
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gtsfm_tpu.geometry import lie
from gtsfm_tpu.ops import ransac

DOOR = "/root/reference/tests/data/set1_lund_door"
RANSAC_SUCCESS_PROB = 0.999999  # reference gtsfm/frontend/verifier/ransac.py:33
THRESH = 4e-3  # normalized threshold; reference: 4 px / fx (~1000) on door


def make_pairs(rng, P, N, noise=3e-4, out_frac=0.3):
    """Synthetic calibrated pairs with exact GT (same generator as
    scripts/ransac_sweep.py)."""
    x1 = np.zeros((P, N, 2), np.float32)
    x2 = np.zeros((P, N, 2), np.float32)
    Rg = np.zeros((P, 3, 3), np.float32)
    tg = np.zeros((P, 3), np.float32)
    n_out = int(N * out_frac)
    for p in range(P):
        aa = (rng.normal(size=3) * 0.3).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(aa)))
        t = rng.normal(size=3).astype(np.float32)
        t /= np.linalg.norm(t)
        X = np.stack(
            [rng.uniform(-1.5, 1.5, N), rng.uniform(-1.5, 1.5, N),
             rng.uniform(4.0, 8.0, N)], -1
        ).astype(np.float32)
        X2 = X @ R.T + t
        a = X[:, :2] / X[:, 2:] + noise * rng.normal(size=(N, 2))
        b = X2[:, :2] / X2[:, 2:] + noise * rng.normal(size=(N, 2))
        idx = rng.choice(N, n_out, replace=False)
        b[idx] = rng.uniform(-0.6, 0.6, size=(n_out, 2))
        x1[p], x2[p], Rg[p], tg[p] = a, b, R, t
    return x1, x2, Rg, tg


def cv2_verify(x1, x2, threshold=THRESH):
    """The reference's exact verifier call on normalized coords."""
    E, mask = cv2.findEssentialMat(
        x1.astype(np.float64), x2.astype(np.float64), np.eye(3),
        method=cv2.USAC_ACCURATE, threshold=threshold,
        prob=RANSAC_SUCCESS_PROB,
    )
    if E is None or E.shape != (3, 3):
        return None, None, None, np.zeros(len(x1), bool)
    inl = mask.ravel().astype(bool)
    # recoverPose on the verified (inlier) correspondences, reference
    # verification.py:81-86.
    _, R, t, _ = cv2.recoverPose(
        E, x1[inl].astype(np.float64), x2[inl].astype(np.float64)
    )
    return E, R, t.ravel(), inl


def ours_verify(x1, x2, budget=512, threshold=THRESH, key=42):
    P, N, _ = x1.shape
    return ransac.verify_essential_batched(
        jax.random.PRNGKey(key), jnp.asarray(x1), jnp.asarray(x2),
        jnp.ones((P, N)), threshold=threshold, num_hypotheses=budget,
    )


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def dir_err_deg(ua, ub):
    c = abs(float(np.dot(ua, ub)) / (np.linalg.norm(ua) * np.linalg.norm(ub)))
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def verifier_sweep(pairs=64, corrs=1024):
    """Ours vs cv2-USAC on identical synthetic pairs across outlier levels."""
    rng = np.random.default_rng(0)
    print(f"# verifier differential: {pairs} pairs x {corrs} corrs, "
          f"threshold {THRESH}, budget 512 vs cv2 USAC_ACCURATE p=0.999999")
    print("| outlier frac | ours succ | cv2 succ | ours med rot | cv2 med rot"
          " | med R-agree | med inlier IoU | ours s | cv2 s |")
    print("|---|---|---|---|---|---|---|---|---|")
    rows = []
    for out_frac, budget in ((0.3, 512), (0.4, 512), (0.5, 512), (0.6, 512),
                             (0.7, 512), (0.7, 4096)):
        x1, x2, Rg, tg = make_pairs(rng, pairs, corrs, out_frac=out_frac)
        t0 = time.perf_counter()
        res = jax.tree_util.tree_map(np.asarray, ours_verify(x1, x2, budget=budget))
        t_ours = time.perf_counter() - t0
        t0 = time.perf_counter()
        cv = [cv2_verify(x1[p], x2[p]) for p in range(pairs)]
        t_cv = time.perf_counter() - t0
        s_o, s_c, r_o, r_c, agree, iou = [], [], [], [], [], []
        for p in range(pairs):
            ro = rot_err_deg(res.i2Ri1[p], Rg[p])
            do = dir_err_deg(res.i2Ui1[p], tg[p])
            s_o.append(bool(res.success[p]) and ro < 2 and do < 5)
            r_o.append(ro)
            _, Rc, tc, inl_c = cv[p]
            if Rc is None:
                s_c.append(False)
                continue
            rc = rot_err_deg(Rc, Rg[p])
            dc = dir_err_deg(tc, tg[p])
            s_c.append(rc < 2 and dc < 5)
            r_c.append(rc)
            agree.append(rot_err_deg(res.i2Ri1[p], Rc))
            inl_o = res.inlier_mask[p] > 0
            iou.append((inl_o & inl_c).sum() / max((inl_o | inl_c).sum(), 1))
        row = dict(
            out_frac=out_frac, ours_succ=float(np.mean(s_o)),
            cv2_succ=float(np.mean(s_c)),
            ours_rot=float(np.median(r_o)),
            cv2_rot=float(np.median(r_c)) if r_c else float("nan"),
            agree=float(np.median(agree)) if agree else float("nan"),
            iou=float(np.median(iou)) if iou else float("nan"),
        )
        row["budget"] = budget
        rows.append(row)
        print(f"| {out_frac:.1f} (B={budget}) | {row['ours_succ']*100:.0f}% | "
              f"{row['cv2_succ']*100:.0f}% | {row['ours_rot']:.3f} | "
              f"{row['cv2_rot']:.3f} | {row['agree']:.3f} | "
              f"{row['iou']:.3f} | {t_ours:.1f} | {t_cv:.1f} |")
    return rows


# ---------------------------------------------------------------------------
# Real door-12 data
# ---------------------------------------------------------------------------


def door_correspondences(i, j, max_kpts=4096, resolution=760):
    """Our SIFT + mutual-NN matches on a real door pair -> normalized coords
    + GT relative pose."""
    from gtsfm_tpu.loader.olsson import OlssonLoader
    from gtsfm_tpu.frontend import sift
    from gtsfm_tpu.ops import matching
    from gtsfm_tpu.common.image import to_grayscale

    loader = OlssonLoader(DOOR, max_resolution=resolution)
    feats = []
    Ks = []
    for idx in (i, j):
        img, K = loader.get_image(idx)
        g = jnp.asarray(to_grayscale(img.value_array))
        feats.append(sift.detect_and_describe(g, max_keypoints=max_kpts))
        Ks.append(np.asarray(K))
    f1, f2 = feats
    midx, mmask = matching.mutual_nearest_matching(
        f1.descriptor[None], f2.descriptor[None],
        f1.mask[None], f2.mask[None],
    )
    midx, mmask = np.asarray(midx[0]), np.asarray(mmask[0])
    sel = np.nonzero(mmask > 0)[0]
    uv1 = np.asarray(f1.uv)[sel]
    uv2 = np.asarray(f2.uv)[midx[sel]]

    def norm(uv, K):
        # K is a Cal3Bundler param vector (f, k1, k2, u0, v0).
        return (uv - K[3:5]) / K[0]

    x1, x2 = norm(uv1, Ks[0]), norm(uv2, Ks[1])
    # GT relative pose: loader poses are cam-to-world (wRi, wti).
    wR1, wt1 = loader.get_camera_pose(i)
    wR2, wt2 = loader.get_camera_pose(j)
    Rg = wR2.T @ wR1
    tg = wR2.T @ (wt1 - wt2)
    tg = tg / np.linalg.norm(tg)
    fx = float(Ks[0][0])
    return x1.astype(np.float32), x2.astype(np.float32), Rg, tg, fx


def door_verifier_diff(pairs=((0, 1), (1, 2), (2, 3), (0, 2), (5, 6), (9, 10))):
    print("# door-12 verifier differential (our SIFT correspondences, both "
          "verifiers on IDENTICAL inputs, threshold 4px/fx)")
    print("| pair | #corrs | ours rot/dir err | cv2 rot/dir err | R-agree | "
          "dir-agree | inlier IoU |")
    print("|---|---|---|---|---|---|---|")
    out = []
    for (i, j) in pairs:
        x1, x2, Rg, tg, fx = door_correspondences(i, j)
        thr = 4.0 / fx
        res = jax.tree_util.tree_map(
            np.asarray, ours_verify(x1[None], x2[None], threshold=thr)
        )
        _, Rc, tc, inl_c = cv2_verify(x1, x2, threshold=thr)
        ro, do = rot_err_deg(res.i2Ri1[0], Rg), dir_err_deg(res.i2Ui1[0], tg)
        rc, dc = rot_err_deg(Rc, Rg), dir_err_deg(tc, tg)
        ragree = rot_err_deg(res.i2Ri1[0], Rc)
        dagree = dir_err_deg(res.i2Ui1[0], tc)
        inl_o = res.inlier_mask[0] > 0
        iou = (inl_o & inl_c).sum() / max((inl_o | inl_c).sum(), 1)
        out.append(dict(pair=(i, j), n=len(x1), ours=(ro, do), cv2=(rc, dc),
                        ragree=ragree, dagree=dagree, iou=float(iou)))
        print(f"| {i}-{j} | {len(x1)} | {ro:.3f} / {do:.3f} | "
              f"{rc:.3f} / {dc:.3f} | {ragree:.3f} | {dagree:.3f} | "
              f"{iou:.3f} |")
    return out


def door_sift_diff(image_pairs=((0, 1), (5, 6)), contrast_thresh=0.015):
    """Our SIFT vs cv2.SIFT on real door images: keypoint repeatability +
    match quality measured against GT epipolar geometry."""
    from gtsfm_tpu.loader.olsson import OlssonLoader
    from gtsfm_tpu.frontend import sift
    from gtsfm_tpu.ops import matching
    from gtsfm_tpu.geometry import epipolar
    from gtsfm_tpu.common.image import to_grayscale

    loader = OlssonLoader(DOOR, max_resolution=760)
    cv_sift = cv2.SIFT_create(nfeatures=4096)
    print("# door-12 SIFT differential vs cv2.SIFT_create (760px)")
    print("| pair | ours #kp | cv2 #kp | kp recall ours->cv2@3px | "
          "cv2->ours@3px | ours #matches | cv2 #matches | ours epi-inlier% | "
          "cv2 epi-inlier% | match agree% |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    out = []
    for (i, j) in image_pairs:
        ours_f, cv_kp, cv_desc, Ks = [], [], [], []
        for idx in (i, j):
            img, K = loader.get_image(idx)
            g = to_grayscale(img.value_array)
            ours_f.append(sift.detect_and_describe(
                jnp.asarray(g), max_keypoints=4096,
                contrast_thresh=contrast_thresh))
            g8 = np.clip(g * 255.0, 0, 255).astype(np.uint8)
            kp, desc = cv_sift.detectAndCompute(g8, None)
            cv_kp.append(np.array([k.pt for k in kp], np.float32))
            desc = desc.astype(np.float32)
            # rootSIFT to match our descriptor space (reference uses plain
            # SIFT + NORM_L2; rootSIFT only changes the metric, not the
            # correspondences' identity — we compare geometric match sets).
            desc /= np.maximum(desc.sum(-1, keepdims=True), 1e-7)
            desc = np.sqrt(desc)
            cv_desc.append(desc)
            Ks.append(np.asarray(K))

        def recall(a, b, r=3.0):
            # fraction of a-points with a b-point within r px
            d = np.linalg.norm(a[:, None] - b[None], axis=-1)
            return float((d.min(1) < r).mean())

        uv_o = [np.asarray(f.uv)[np.asarray(f.mask) > 0] for f in ours_f]
        rec_oc = recall(uv_o[0], cv_kp[0])
        rec_co = recall(cv_kp[0], uv_o[0])

        # our matches
        f1, f2 = ours_f
        midx, mmask = matching.mutual_nearest_matching(
            f1.descriptor[None], f2.descriptor[None],
            f1.mask[None], f2.mask[None],
        )
        midx, mmask = np.asarray(midx[0]), np.asarray(mmask[0])
        sel = np.nonzero(mmask > 0)[0]
        m_ours = (np.asarray(f1.uv)[sel], np.asarray(f2.uv)[midx[sel]])

        # cv2 matches: BFMatcher mutual crossCheck + same ratio is not
        # supported together; use knn + ratio + mutual like the reference's
        # TwoWayMatcher (twoway_matcher.py: ratio test 0.8 + cross-check).
        bf = cv2.BFMatcher(cv2.NORM_L2)
        kn12 = bf.knnMatch(cv_desc[0], cv_desc[1], k=2)
        good12 = {m.queryIdx: m.trainIdx for m, n in kn12
                  if m.distance < 0.8 * n.distance}
        kn21 = bf.knnMatch(cv_desc[1], cv_desc[0], k=2)
        good21 = {m.queryIdx: m.trainIdx for m, n in kn21
                  if m.distance < 0.8 * n.distance}
        mc = [(q, t) for q, t in good12.items() if good21.get(t) == q]
        m_cv = (cv_kp[0][[q for q, _ in mc]], cv_kp[1][[t for _, t in mc]])

        # GT epipolar consistency of each match set
        wR1, wt1 = loader.get_camera_pose(i)
        wR2, wt2 = loader.get_camera_pose(j)
        Rg = wR2.T @ wR1
        tg = wR2.T @ (wt1 - wt2)
        tg = tg / np.linalg.norm(tg)
        Eg = lie.hat(jnp.asarray(tg)) @ jnp.asarray(Rg)

        def epi_inlier_frac(uv1, uv2, thr_px=4.0):
            if len(uv1) == 0:
                return 0.0
            x1 = (uv1 - Ks[0][3:5]) / Ks[0][0]
            x2 = (uv2 - Ks[1][3:5]) / Ks[1][0]
            d = np.asarray(epipolar.sampson_distance_sq(
                Eg[None], jnp.asarray(x1, jnp.float32)[None],
                jnp.asarray(x2, jnp.float32)[None])[0])
            return float((np.sqrt(d) < thr_px / Ks[0][0]).mean())

        ei_o = epi_inlier_frac(*m_ours)
        ei_c = epi_inlier_frac(*m_cv)

        # match agreement: ours whose both endpoints are within 3 px of a
        # cv2 match's endpoints
        if len(m_cv[0]) and len(m_ours[0]):
            d1 = np.linalg.norm(m_ours[0][:, None] - m_cv[0][None], axis=-1)
            d2 = np.linalg.norm(m_ours[1][:, None] - m_cv[1][None], axis=-1)
            agree = float(((d1 < 3) & (d2 < 3)).any(1).mean())
        else:
            agree = 0.0
        out.append(dict(pair=(i, j), rec_oc=rec_oc, rec_co=rec_co,
                        n_ours=len(m_ours[0]), n_cv=len(m_cv[0]),
                        ei_ours=ei_o, ei_cv=ei_c, agree=agree))
        print(f"| {i}-{j} | {len(uv_o[0])} | {len(cv_kp[0])} | "
              f"{rec_oc*100:.0f}% | {rec_co*100:.0f}% | {len(m_ours[0])} | "
              f"{len(m_cv[0])} | {ei_o*100:.1f}% | {ei_c*100:.1f}% | "
              f"{agree*100:.0f}% |")
    return out


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("verifier", "all"):
        verifier_sweep()
    if what in ("door", "all"):
        door_verifier_diff()
    if what in ("sift", "all"):
        door_sift_diff()
        print("# same, detector contrast_thresh=0.006 (cv2's effective interim"
              " threshold is 0.04/3 ~ 0.013 AND it truncates a larger pool to"
              " nfeatures — the count gap is threshold policy, not missed"
              " structure):")
        door_sift_diff(contrast_thresh=0.006)
