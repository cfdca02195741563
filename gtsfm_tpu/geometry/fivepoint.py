"""Batched Nistér five-point essential-matrix solver — TPU-native.

Replaces the minimal solver inside ``cv2.findEssentialMat`` (reference
gtsfm/frontend/verifier/ransac.py:74 runs USAC over 5-point Nistér samples;
SURVEY.md §2.14 row 9 plans exactly this solver). One call solves EVERY
minimal sample of EVERY pair in one fixed-shape XLA program: a (..., 5, 2)
batch of samples maps to a (..., 10, 3, 3) batch of essential-matrix
candidates plus a validity mask (a 5-point problem has up to 10 real
solutions).

Why this decomposition (and not a translation of the usual CPU/CUDA code):

* The textbook pipeline needs a 5x9 nullspace (SVD) and the eigenvalues of a
  10x10 companion/action matrix (`eig`). Batched SVD serializes on TPU and
  `jax.numpy.linalg.eig` does not exist on TPU at all. Both are replaced by
  closed-form, branch-free kernels:
  - nullspace: the orthogonal projector P = I - A^T (A A^T)^-1 A (unrolled
    5x5 Cholesky) applied to a fixed probe matrix, then modified
    Gram-Schmidt — matmuls and elementwise ops only;
  - root-finding: the degree-10 determinant polynomial is evaluated in
    HOMOGENEOUS form q(theta) = sum_k c_k sin^k(theta) cos^(10-k)(theta)
    on a fixed theta grid covering the whole real projective line (so
    near-infinite roots cost nothing extra), followed by fixed-count
    bisection on each sign-change interval. No data-dependent control flow.
* The ten cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0) are
  expanded at TRACE time by a tiny polynomial-arithmetic helper operating on
  monomial dicts whose coefficients are batched arrays — the generated XLA
  program is pure fused elementwise math, and there is no hand-transcribed
  1000-term coefficient table to get wrong.
* The 10x20 elimination is an unrolled batched Gauss-Jordan with row
  pivoting via argmax + take_along_axis (branch-free swaps).

Degenerate samples (coplanar points, repeated points) surface as tiny
pivots / no real roots and are reported through the validity mask; the
RANSAC engine poisons their scores instead of branching.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# Fixed probe for extracting a nullspace basis from the projector (any fixed
# generic 9x4 works; failure would need null(A) orthogonal to a probe column,
# a measure-zero event handled by the validity mask).
_PROBE = np.array(
    [
        [0.347, -0.912, 0.511, 0.206],
        [-0.781, 0.254, 0.863, -0.442],
        [0.529, 0.678, -0.190, 0.935],
        [0.114, -0.365, -0.742, 0.587],
        [-0.636, 0.481, 0.297, -0.158],
        [0.842, 0.129, -0.554, 0.371],
        [-0.263, -0.797, 0.408, 0.664],
        [0.591, 0.336, 0.925, -0.273],
        [-0.458, 0.703, -0.081, 0.812],
    ],
    dtype=np.float32,
)

# Nistér monomial ordering for the 10x20 system (x, y, z exponents).
# First 10 columns are eliminated; trailing 10 are [xz^2, xz, x, yz^2, yz, y,
# z^3, z^2, z, 1].
_MONOMIALS = (
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
)

_GRID = 128  # theta intervals over the projective line
# (r4 ran a 12-round sequential bisection/golden refinement here; r5
# replaced it with one vectorized 64-point subdivision — see
# _real_roots_deg10 — because the sequential dependency chain, not
# arithmetic, bound the whole solver.)


def _chol5_solve(G: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (G + eps I) X = B for SPD 5x5 G, unrolled (no batched LAPACK).

    G: (..., 5, 5); B: (..., 5, k). Returns (..., 5, k).
    """
    n = 5
    eps = 1e-9 * jnp.trace(G, axis1=-2, axis2=-1)[..., None, None] + 1e-30
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = G[..., i, j] + (eps[..., 0, 0] if i == j else 0.0)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    # Forward/back substitution on each RHS column, vectorized over k.
    y = [None] * n
    for i in range(n):
        s = B[..., i, :]
        for k in range(i):
            s = s - L[i][k][..., None] * y[k]
        y[i] = s / L[i][i][..., None]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][..., None] * x[k]
        x[i] = s / L[i][i][..., None]
    return jnp.stack(x, axis=-2)


def _nullspace_basis(A: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal basis of null(A) for batched (..., 5, 9) A -> (..., 4, 9).

    P = I - A^T (A A^T)^{-1} A (projector onto the nullspace), applied to a
    fixed generic probe, then modified Gram-Schmidt.
    """
    G = A @ jnp.swapaxes(A, -1, -2)  # (..., 5, 5)
    At = jnp.swapaxes(A, -1, -2)
    V = jnp.broadcast_to(jnp.asarray(_PROBE, A.dtype), A.shape[:-2] + (9, 4))
    # Apply the projector three times: the Cholesky jitter biases a single
    # application by eps/(sigma_min^2 + eps) along row(A); each extra
    # application multiplies that residual down (P is idempotent), which is
    # what keeps ill-conditioned (near-degenerate) samples usable.
    for _ in range(3):
        V = V - At @ _chol5_solve(G, A @ V)
    # Modified Gram-Schmidt over the 4 columns, run twice (re-orthogonalize):
    # a nearly-dependent projected probe loses orthogonality in one pass.
    cols = [V[..., i] for i in range(4)]
    for _ in range(2):
        basis = []
        for i in range(4):
            v = cols[i]
            for u in basis:
                v = v - jnp.sum(v * u, axis=-1, keepdims=True) * u
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
            basis.append(v)
        cols = basis
    return jnp.stack(basis, axis=-2)  # (..., 4, 9)


def _pmul(p: dict, q: dict) -> dict:
    out: dict = {}
    for m1, c1 in p.items():
        for m2, c2 in q.items():
            m = (m1[0] + m2[0], m1[1] + m2[1], m1[2] + m2[2])
            out[m] = out[m] + c1 * c2 if m in out else c1 * c2
    return out


def _padd(p: dict, q: dict, scale=1.0) -> dict:
    out = dict(p)
    for m, c in q.items():
        out[m] = out[m] + scale * c if m in out else scale * c
    return out


def _constraint_matrix(basis: jnp.ndarray) -> jnp.ndarray:
    """Expand det(E)=0 and 2 E E^T E - tr(E E^T) E = 0 into the 10x20
    Nistér coefficient matrix.

    basis: (..., 4, 9) nullspace basis (E = x B0 + y B1 + z B2 + B3).
    Returns M: (..., 10, 20) over the `_MONOMIALS` ordering.
    """
    batch = basis.shape[:-2]
    B = basis.reshape(batch + (4, 3, 3))
    # E entry polynomials: degree-1 in (x, y, z) with constant term.
    mono1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
    Ep = [
        [{mono1[k]: B[..., k, i, j] for k in range(4)} for j in range(3)]
        for i in range(3)
    ]
    # EEt[i][j] = sum_k E[i][k] * E[j][k] (quadratic, symmetric).
    EEt = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i + 1):
            acc: dict = {}
            for k in range(3):
                acc = _padd(acc, _pmul(Ep[i][k], Ep[j][k]))
            EEt[i][j] = acc
            EEt[j][i] = acc
    trace = _padd(_padd(EEt[0][0], EEt[1][1]), EEt[2][2])
    eqs = []
    # det(E) = 0 (Sarrus).
    det = {}
    for (i, j, k, s) in ((0, 1, 2, 1.0), (1, 2, 0, 1.0), (2, 0, 1, 1.0),
                         (2, 1, 0, -1.0), (0, 2, 1, -1.0), (1, 0, 2, -1.0)):
        det = _padd(det, _pmul(_pmul(Ep[0][i], Ep[1][j]), Ep[2][k]), s)
    eqs.append(det)
    # 2 E E^T E - tr(E E^T) E = 0, scaled by 1/2 (same variety):
    # sum_k EEt[i][k] E[k][j] - 0.5 trace * E[i][j].
    for i in range(3):
        for j in range(3):
            acc = {}
            for k in range(3):
                acc = _padd(acc, _pmul(EEt[i][k], Ep[k][j]))
            acc = _padd(acc, _pmul(trace, Ep[i][j]), -0.5)
            eqs.append(acc)
    zeros = jnp.zeros(batch, basis.dtype)
    cols = [
        jnp.stack([eq.get(m, zeros) for m in _MONOMIALS], axis=-1)
        for eq in eqs
    ]
    return jnp.stack(cols, axis=-2)  # (..., 10, 20)


def _gauss_jordan_10x20(M: jnp.ndarray):
    """Batched branch-free Gauss-Jordan reduction of (..., 10, 20) to
    [I | A']. Returns (A' (..., 10, 10), valid (...,) bool).

    Swap-FREE partial pivoting: rows are never physically reordered during
    elimination (the per-round take_along_axis row swap was the dominant
    cost of the whole 5-point solver on TPU — 10 sequential gathers over
    the full (B, 10, 20) block). Instead each round picks its pivot row
    among the not-yet-used rows via a one-hot contraction, eliminates the
    column from every other row in place, and ONE final gather reorders
    rows into pivot-column order."""
    batch = M.shape[:-2]
    scale = jnp.max(jnp.abs(M), axis=(-2, -1))
    valid = jnp.ones(batch, bool)
    used = jnp.zeros(batch + (10,), M.dtype)
    row_of_col = []
    for j in range(10):
        col = jnp.abs(M[..., :, j]) + jnp.where(used > 0, -jnp.inf, 0.0)
        p = jnp.argmax(col, axis=-1)  # (...,)
        oh = jax.nn.one_hot(p, 10, dtype=M.dtype)  # (..., 10)
        piv_row = jnp.einsum("...i,...ik->...k", oh, M)  # (..., 20)
        piv = piv_row[..., j]
        valid = valid & (jnp.abs(piv) > 1e-12 * scale)
        piv = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        piv_row = piv_row / piv[..., None]
        fac = M[..., :, j] * (1.0 - oh)  # eliminate from all OTHER rows
        M = M - fac[..., None] * piv_row[..., None, :]
        # Write the normalized pivot row back in place.
        M = jnp.where(oh[..., None] > 0, piv_row[..., None, :], M)
        used = used + oh
        row_of_col.append(p)
    perm = jnp.stack(row_of_col, axis=-1)  # (..., 10) row index per column
    # One-hot permutation matmul instead of take_along_axis (the gather ran
    # index-rate-bound at ~15 GB/s — 2.9 ms of the composite RANSAC kernel,
    # r5 trace).
    Pm = jax.nn.one_hot(perm, 10, dtype=M.dtype)  # (..., 10, 10)
    M = jnp.einsum("...ij,...jk->...ik", Pm, M)
    return M[..., :, 10:], valid


def _polymul(a: list, b: list) -> list:
    out = [None] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            t = ai * bj
            out[i + j] = t if out[i + j] is None else out[i + j] + t
    return out


def _polysub(a: list, b: list) -> list:
    n = max(len(a), len(b))
    out = []
    for i in range(n):
        ai = a[i] if i < len(a) else None
        bi = b[i] if i < len(b) else None
        if ai is None:
            out.append(-bi)
        elif bi is None:
            out.append(ai)
        else:
            out.append(ai - bi)
    return out


def _det_polynomial(Ap: jnp.ndarray):
    """From the reduced trailing block A' build B(z) (3x3 of z-polynomials,
    rows <k>,<l>,<m> of Nistér) and its degree-10 determinant.

    Returns (coeffs (..., 11) low-to-high, Brows: list of 3 rows, each a
    list [px(4), py(4), p1(5)] of coefficient lists).
    """
    def row_pair(r1, r2):
        a = lambda r, c: Ap[..., r, c]
        px = [a(r1, 2), a(r1, 1) - a(r2, 2), a(r1, 0) - a(r2, 1), -a(r2, 0)]
        py = [a(r1, 5), a(r1, 4) - a(r2, 5), a(r1, 3) - a(r2, 4), -a(r2, 3)]
        p1 = [a(r1, 9), a(r1, 8) - a(r2, 9), a(r1, 7) - a(r2, 8),
              a(r1, 6) - a(r2, 7), -a(r2, 6)]
        return [px, py, p1]
    Brows = [row_pair(4, 5), row_pair(6, 7), row_pair(8, 9)]
    (k_x, k_y, k_1), (l_x, l_y, l_1), (m_x, m_y, m_1) = Brows
    det = _polymul(k_x, _polysub(_polymul(l_y, m_1), _polymul(l_1, m_y)))
    det = _polysub(det, _polymul(k_y, _polysub(_polymul(l_x, m_1), _polymul(l_1, m_x))))
    t3 = _polymul(k_1, _polysub(_polymul(l_x, m_y), _polymul(l_y, m_x)))
    n = max(len(det), len(t3))
    coeffs = []
    for i in range(n):
        d = det[i] if i < len(det) else None
        t = t3[i] if i < len(t3) else None
        coeffs.append(t if d is None else (d if t is None else d + t))
    return jnp.stack(coeffs, axis=-1), Brows  # (..., 11)


def _eval_homogeneous(coeffs: jnp.ndarray, s: jnp.ndarray, c: jnp.ndarray):
    """q = sum_k coeffs[..., k] s^k c^(10-k); s, c broadcastable to coeffs'
    batch + an extra trailing axis matching s/c."""
    sp = [jnp.ones_like(s)]
    cp = [jnp.ones_like(c)]
    for _ in range(10):
        sp.append(sp[-1] * s)
        cp.append(cp[-1] * c)
    q = None
    for k in range(11):
        t = coeffs[..., k, None] * sp[k] * cp[10 - k]
        q = t if q is None else q + t
    return q


def _real_roots_deg10(coeffs: jnp.ndarray):
    """All real roots of the degree-10 polynomial, batched.

    coeffs: (..., 11) low-to-high. Returns (z (..., 10), found (..., 10)).

    Tangent-parametrized: the homogeneous form q(theta) = sum c_k s^k c^(10-k)
    is sampled over the whole real projective line, so huge-|z| roots cost
    nothing extra. Fixed shapes throughout (no eig exists on TPU):

      1. Coarse grid (G intervals): candidate intervals are sign changes
         plus local minima of |q| that dip near zero.
      2. Each of the top-10 coarse brackets is re-sampled on a fine subgrid.
         This SPLITS near-double root pairs: the 5-point problem routinely
         produces two distinct solutions separated by less than a coarse
         cell (their sign flips cancel), and each member yields a genuinely
         different essential matrix, so both must be recovered.
      3. Fine candidates (sign changes -> bisection; |q| minima -> golden
         section on q^2, catching pairs that coefficient noise pushed just
         off the real axis) fill the 10 root slots, then guarded Newton
         polishes each to the f32 noise floor.
    """
    dtype = coeffs.dtype
    cmax = jnp.max(jnp.abs(coeffs), axis=-1, keepdims=True)
    cn = coeffs / jnp.maximum(cmax, 1e-30)

    def qeval(t):
        return _eval_homogeneous(cn, jnp.sin(t), jnp.cos(t))

    # --- Coarse pass.
    theta = jnp.linspace(-np.pi / 2, np.pi / 2, _GRID + 1).astype(dtype)
    q = qeval(theta)  # (..., G+1)
    aq = jnp.abs(q)
    qscale = jnp.max(aq, axis=-1)[..., None]
    sc = ((q[..., :-1] * q[..., 1:]) < 0.0).astype(dtype) * 2.0  # (..., G)
    lm = (aq[..., 1:-1] <= aq[..., :-2]) & (aq[..., 1:-1] <= aq[..., 2:])
    lm = lm & (aq[..., 1:-1] < 3e-2 * qscale)
    lm = lm.astype(dtype) / (1.0 + aq[..., 1:-1])  # (..., G-1), in (0, 1]
    # approx_max_k: lax.top_k lowers to a full per-row sort on TPU
    # (1.3 + 5.1 ms of the composite RANSAC kernel here and in the fine
    # pass, r5 trace); the bucketed selector is exact at recall 1.0.
    _, cidx = jax.lax.approx_max_k(
        jnp.concatenate([sc, lm], axis=-1), 10, recall_target=1.0
    )
    c_is_sc = cidx < _GRID
    h = np.pi / _GRID
    i_sc = cidx
    j_lm = cidx - _GRID + 1
    c_lo = jnp.where(c_is_sc, -np.pi / 2 + i_sc * h, -np.pi / 2 + (j_lm - 1) * h)
    c_hi = jnp.where(c_is_sc, -np.pi / 2 + (i_sc + 1) * h, -np.pi / 2 + (j_lm + 1) * h)

    # --- Fine pass: F subintervals inside each of the 10 coarse brackets.
    F = 32
    offs = jnp.linspace(0.0, 1.0, F + 1).astype(dtype)
    tf = c_lo[..., None] + (c_hi - c_lo)[..., None] * offs  # (..., 10, F+1)
    # Evaluate with an extra brackets axis (coeffs broadcast over it).
    qf = _eval_homogeneous(cn[..., None, :], jnp.sin(tf), jnp.cos(tf))
    aqf = jnp.abs(qf)
    f_sc = ((qf[..., :-1] * qf[..., 1:]) < 0.0).astype(dtype) * 2.0  # (..., 10, F)
    f_lm = (aqf[..., 1:-1] <= aqf[..., :-2]) & (aqf[..., 1:-1] <= aqf[..., 2:])
    f_lm = f_lm & (aqf[..., 1:-1] < 3e-2 * qscale[..., None])
    f_lm = f_lm.astype(dtype) / (1.0 + aqf[..., 1:-1])  # (..., 10, F-1)
    # Per-bracket TOP-2 (max + masked re-max — plain reductions) feeding a
    # 20-lane top-10. The r4 global top-10 over all 10*(2F-1) = 630 fine
    # candidates lowered to a FULL per-row sort (3.8 ms of the composite
    # RANSAC kernel, r5 trace). Two slots per coarse bracket preserve the
    # near-double-root splitting this pass exists for (>2 real roots inside
    # one coarse cell does not occur for these degree-10 polynomials).
    scores_b = jnp.concatenate([f_sc, f_lm], axis=-1)  # (..., 10, 2F-1)
    lane_f = jnp.arange(scores_b.shape[-1])
    s1 = jnp.max(scores_b, axis=-1)
    a1 = jnp.argmax(scores_b, axis=-1)
    m2 = jnp.where(lane_f == a1[..., None], -jnp.inf, scores_b)
    s2 = jnp.max(m2, axis=-1)
    a2 = jnp.argmax(m2, axis=-1)
    lead = scores_b.shape[:-2]
    cand_s = jnp.stack([s1, s2], -1).reshape(lead + (20,))
    cand_l = jnp.stack([a1, a2], -1).reshape(lead + (20,))
    top, sel = jax.lax.top_k(cand_s, 10)  # 20-lane sort — negligible
    found = top > 0.0
    selh = (sel[..., None] == jnp.arange(20)[None, :]).astype(dtype)
    local = jnp.sum(selh * cand_l[..., None, :].astype(dtype), axis=-1)
    local = local.astype(jnp.int32)
    bsel = sel // 2
    from_sc = local < F
    hf = (c_hi - c_lo) / F  # (..., 10) per-bracket fine step
    # One-hot contraction instead of take_along_axis: the per-slot gathers
    # ran at ~1 GB/s (index-rate-bound, 7.8 ms of the composite kernel, r5
    # trace); a 10-lane compare-mask reduce fuses into one pass.
    bh = (bsel[..., None] == jnp.arange(10)[None, :]).astype(dtype)
    lo0 = jnp.sum(bh * c_lo[..., None, :], axis=-1)
    hstep = jnp.sum(bh * hf[..., None, :], axis=-1)
    # Local index decode: sign-change cell s (= local) spans
    # [s, s+1]*hstep; an interior-minimum point j (local = F + j - 1)
    # spans [(j-1), (j+1)]*hstep around the grid point.
    lo = jnp.where(from_sc, lo0 + local * hstep, lo0 + (local - F) * hstep)
    hi = jnp.where(from_sc, lo0 + (local + 1) * hstep,
                   lo0 + (local - F + 2) * hstep)

    # --- Refinement: ONE vectorized 64-point subdivision of each candidate
    # cell localizes the root to hstep/64 ~ 1.2e-5 rad in a single kernel.
    # (r4 ran 12 sequential joint bisection/golden rounds here — each round
    # a full dependency-chained VPU pass; the chain, not bandwidth, bound
    # the whole 5-point solve at 23 of 85 ms. The Newton polish below plus
    # the _polish_xyz GN stage recover the same accuracy from the coarser
    # bracket — verified by the unchanged eps-sweep success table.)
    F2 = 64
    offs2 = jnp.linspace(0.0, 1.0, F2 + 1).astype(dtype)
    t2 = lo[..., None] + (hi - lo)[..., None] * offs2  # (..., 10, F2+1)
    q2 = _eval_homogeneous(cn[..., None, :], jnp.sin(t2), jnp.cos(t2))
    aq2 = jnp.abs(q2)
    sc2 = (q2[..., :-1] * q2[..., 1:]) < 0.0  # (..., 10, F2)
    any_sc = jnp.any(sc2, axis=-1)
    i_sc2 = jnp.argmax(sc2, axis=-1)  # first sign-change cell
    i_mn = jnp.argmin(aq2, axis=-1)  # |q| minimum grid point
    h2 = (hi - lo) / F2
    t_sc = lo + (i_sc2.astype(dtype) + 0.5) * h2
    t_mn = lo + i_mn.astype(dtype) * h2
    use_sc = from_sc & any_sc
    t_root = jnp.where(use_sc, t_sc, t_mn)

    # --- Guarded Newton polish (quadratic convergence at simple roots pulls
    # f32 results to the noise floor; steps that grow |q| are rejected).
    def qprime(t):
        s, c = jnp.sin(t), jnp.cos(t)
        sp = [jnp.ones_like(s)]
        cp = [jnp.ones_like(c)]
        for _ in range(11):
            sp.append(sp[-1] * s)
            cp.append(cp[-1] * c)
        dq = None
        for k in range(11):
            term = 0.0
            if k > 0:
                term = k * sp[k - 1] * cp[11 - k]
            if k < 10:
                term = term - (10 - k) * sp[k + 1] * cp[9 - k]
            t_k = cn[..., k, None] * term
            dq = t_k if dq is None else dq + t_k
        return dq

    q_cur = qeval(t_root)
    for _ in range(3):
        dq = qprime(t_root)
        step = q_cur / jnp.where(jnp.abs(dq) < 1e-30, 1e-30, dq)
        t_new = t_root - jnp.clip(step, -h, h)
        q_new = qeval(t_new)
        better = jnp.abs(q_new) < jnp.abs(q_cur)
        t_root = jnp.where(better, t_new, t_root)
        q_cur = jnp.where(better, q_new, q_cur)

    s, c = jnp.sin(t_root), jnp.cos(t_root)
    z = s / jnp.where(jnp.abs(c) < 1e-18, jnp.where(c < 0, -1e-18, 1e-18), c)
    z = jnp.clip(z, -1e6, 1e6)
    return z, found


def _polish_xyz(M: jnp.ndarray, x, y, z, iters: int = 2):
    """Guarded Gauss-Newton on the 10 cubic constraints directly.

    The Gauss-Jordan elimination amplifies f32 coefficient noise by the
    block's condition number, so roots of the eliminated polynomial carry
    ~1e-4 error in float32. The PRE-elimination matrix M (one product deep
    from the orthonormal basis) is accurate to ~1e-6; polishing (x, y, z)
    against it recovers that accuracy. 10 residuals, 3 unknowns, closed-form
    damped 3x3 normal solve per root slot — no linalg calls.

    M: (..., 10, 20); x, y, z: (..., R). Returns polished (x, y, z).
    """
    expo = np.array(_MONOMIALS, np.int64)  # (20, 3)

    def monos_and_grads(x, y, z):
        # Powers up to 3 for each variable.
        def pows(v):
            return [jnp.ones_like(v), v, v * v, v * v * v]
        px, py, pz = pows(x), pows(y), pows(z)
        vals, dxs, dys, dzs = [], [], [], []
        for (i, j, k) in expo:
            vals.append(px[i] * py[j] * pz[k])
            dxs.append(i * px[i - 1] * py[j] * pz[k] if i else jnp.zeros_like(x))
            dys.append(j * px[i] * py[j - 1] * pz[k] if j else jnp.zeros_like(x))
            dzs.append(k * px[i] * py[j] * pz[k - 1] if k else jnp.zeros_like(x))
        stack = lambda lst: jnp.stack(lst, axis=-1)  # (..., R, 20)
        return stack(vals), stack(dxs), stack(dys), stack(dzs)

    def residual_norm(r):
        return jnp.sum(r * r, axis=-1)

    for _ in range(iters):
        v, dx, dy, dz = monos_and_grads(x, y, z)
        r = jnp.einsum("...ec,...rc->...re", M, v)  # (..., R, 10)
        Jx = jnp.einsum("...ec,...rc->...re", M, dx)
        Jy = jnp.einsum("...ec,...rc->...re", M, dy)
        Jz = jnp.einsum("...ec,...rc->...re", M, dz)
        # Normal equations (3x3, damped) solved by adjugate.
        a = jnp.sum(Jx * Jx, -1)
        b = jnp.sum(Jx * Jy, -1)
        c = jnp.sum(Jx * Jz, -1)
        d = jnp.sum(Jy * Jy, -1)
        e = jnp.sum(Jy * Jz, -1)
        f = jnp.sum(Jz * Jz, -1)
        lam = 1e-8 * (a + d + f) + 1e-30
        a, d, f = a + lam, d + lam, f + lam
        g1 = jnp.sum(Jx * r, -1)
        g2 = jnp.sum(Jy * r, -1)
        g3 = jnp.sum(Jz * r, -1)
        det = a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        sx = ((d * f - e * e) * g1 + (c * e - b * f) * g2 + (b * e - c * d) * g3) / det
        sy = ((c * e - b * f) * g1 + (a * f - c * c) * g2 + (b * c - a * e) * g3) / det
        sz = ((b * e - c * d) * g1 + (b * c - a * e) * g2 + (a * d - b * b) * g3) / det
        xn, yn, zn = x - sx, y - sy, z - sz
        v2, _, _, _ = monos_and_grads(xn, yn, zn)
        r2 = jnp.einsum("...ec,...rc->...re", M, v2)
        better = residual_norm(r2) < residual_norm(r)
        x = jnp.where(better, xn, x)
        y = jnp.where(better, yn, y)
        z = jnp.where(better, zn, z)
    return x, y, z


def essential_from_five_point(x1: jnp.ndarray, x2: jnp.ndarray):
    """Nistér 5-point solver, batched over leading dims.

    Args:
      x1, x2: (..., 5, 2) NORMALIZED (calibrated) correspondences with
        ``x2h^T E x1h = 0`` (the i2Ei1 convention of geometry/epipolar.py).

    Returns:
      E: (..., 10, 3, 3) Frobenius-normalized candidates (up to 10 real
        solutions; unused slots hold garbage),
      valid: (..., 10) bool — slot holds a real solution from a
        non-degenerate elimination.
    """
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # (..., 5, 9)
    basis = _nullspace_basis(A)  # (..., 4, 9)
    M = _constraint_matrix(basis)  # (..., 10, 20)
    Ap, valid_elim = _gauss_jordan_10x20(M)
    coeffs, Brows = _det_polynomial(Ap)
    z, found = _real_roots_deg10(coeffs)  # (..., 10) each

    # Back-substitute x, y for each root: rows of B(z) are 3-vectors
    # (px(z), py(z), p1(z)); the solution [x, y, 1] is the cross product of
    # any two rows — take the pair whose cross has the largest |w| component.
    def eval_poly(p: list, zz: jnp.ndarray) -> jnp.ndarray:
        acc = jnp.zeros_like(zz)
        for c in reversed(p):
            acc = acc * zz + c[..., None]
        return acc
    rows = [
        jnp.stack([eval_poly(px, z), eval_poly(py, z), eval_poly(p1, z)], axis=-1)
        for (px, py, p1) in Brows
    ]  # 3 x (..., 10, 3)
    crosses = jnp.stack(
        [jnp.cross(rows[0], rows[1]), jnp.cross(rows[0], rows[2]),
         jnp.cross(rows[1], rows[2])], axis=-2
    )  # (..., 10, 3, 3)
    wmag = jnp.abs(crosses[..., 2])
    pick = jnp.argmax(wmag, axis=-1)  # (..., 10)
    # One-hot select over the 3 cross candidates (take_along_axis gathers
    # are index-rate-bound on TPU — 2.4 ms here in the r5 composite trace).
    ph = (pick[..., None] == jnp.arange(3)[None, :]).astype(crosses.dtype)
    v = jnp.sum(ph[..., :, None] * crosses, axis=-2)
    w = v[..., 2]
    w_safe = jnp.where(jnp.abs(w) < 1e-20, 1e-20, w)
    x = v[..., 0] / w_safe
    y = v[..., 1] / w_safe
    ok_xy = jnp.abs(w) > 1e-12 * jnp.linalg.norm(v, axis=-1)
    x, y, z = _polish_xyz(M, x, y, z)

    Bm = basis.reshape(basis.shape[:-2] + (4, 3, 3))  # (..., 4, 3, 3)
    E = (
        x[..., None, None] * Bm[..., None, 0, :, :]
        + y[..., None, None] * Bm[..., None, 1, :, :]
        + z[..., None, None] * Bm[..., None, 2, :, :]
        + Bm[..., None, 3, :, :]
    )  # (..., 10, 3, 3)
    norm = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True)
    E = E / jnp.maximum(norm, 1e-20)
    # det gate: a root that refined poorly (f32 coefficient noise) yields an
    # E off the essential variety; |det| of the unit-Frobenius E measures it
    # directly and closed-form. Loose candidates are dropped here rather
    # than left to waste scoring work downstream.
    det = (
        E[..., 0, 0] * (E[..., 1, 1] * E[..., 2, 2] - E[..., 1, 2] * E[..., 2, 1])
        - E[..., 0, 1] * (E[..., 1, 0] * E[..., 2, 2] - E[..., 1, 2] * E[..., 2, 0])
        + E[..., 0, 2] * (E[..., 1, 0] * E[..., 2, 1] - E[..., 1, 1] * E[..., 2, 0])
    )
    valid = (
        found
        & ok_xy
        & valid_elim[..., None]
        & jnp.all(jnp.isfinite(E), axis=(-2, -1))
        & (norm[..., 0, 0] > 1e-20)
        & (jnp.abs(det) < 3e-3)
    )
    return E, valid
