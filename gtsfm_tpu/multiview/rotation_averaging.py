"""Global rotation averaging: chordal init + Riemannian staircase + certificate.

TPU-native replacement for GTSAM ShonanAveraging3 (reference
gtsfm/averaging/rotation/shonan.py:38-199, p_min=5..p_max=30). Same
certifiable-optimality recipe, re-derived for batched dense linear algebra:

  1. Connection Laplacian L (3n x 3n dense — n <= ~1500 cameras fits easily;
     door is 36x36) built from relative rotation measurements.
  2. Chordal initialization: 3 smallest eigenvectors of L -> blocks projected
     to SO(3).
  3. Riemannian staircase at p in {3, 5, 7}: block-coordinate polar updates on
     the product Stiefel manifold St(p, 3)^n — each sweep is one (n*3, n*3) x
     (n*3, p) matmul + n batched 3x3 SVD polar projections (MXU-friendly),
     strictly cost-decreasing, no step size.
  4. Global optimality certificate: min eigenvalue of M = L - blockdiag(Λ)
     via shifted power iteration (Lanczos-lite); if negative, lift p
     (Shonan's staircase) and re-solve.
  5. Rank-3 rounding (top singular directions) + sign fix -> SO(3).

Convention: measurement for edge (i1, i2) is i2Ri1, satisfying
wRi1 = wRi2 @ i2Ri1 (reference's two-view output convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import lie


def build_connection_laplacian(
    num_nodes: int, edges: np.ndarray, i2Ri1: np.ndarray
) -> jnp.ndarray:
    """L (3n, 3n): L_ii = deg_i * I3; block (i1, i2) = -i2Ri1^T, (i2, i1) = -i2Ri1.

    Chordal cost: F(R) = sum_e || wRi1 - wRi2 @ i2Ri1 ||^2 = tr(Rall L Rall^T) + const
    with Rall = [wR1 ... wRn] (3 x 3n).
    """
    n = num_nodes
    L = np.zeros((3 * n, 3 * n), np.float32)
    deg = np.zeros(n, np.int64)
    for e in range(edges.shape[0]):
        a, b = int(edges[e, 0]), int(edges[e, 1])  # (i1, i2)
        R = np.asarray(i2Ri1[e], np.float32)  # wRi1 = wRi2 R
        deg[a] += 1
        deg[b] += 1
        L[3 * a : 3 * a + 3, 3 * a : 3 * a + 3] += np.eye(3, dtype=np.float32)
        L[3 * b : 3 * b + 3, 3 * b : 3 * b + 3] += np.eye(3, dtype=np.float32)
        # cross term: -2 tr(wRi1^T wRi2 R) -> blocks -R^T at (a, b), -R at (b, a)
        L[3 * a : 3 * a + 3, 3 * b : 3 * b + 3] += -R.T
        L[3 * b : 3 * b + 3, 3 * a : 3 * a + 3] += -R
    # Identity-regularize edgeless nodes (cameras pruned out of the largest
    # CC but still indexed): their all-zero rows otherwise contribute extra
    # zero modes that the chordal init's 3-smallest-eigenvector subspace
    # mixes into the real solution, wrecking the staircase's starting point.
    # On the Stiefel manifold tr(Y_i Y_i^T) = 3 is CONSTANT, so adding I3 to
    # an isolated diagonal block shifts the cost by a constant and changes
    # no minimizer — it only moves the spurious eigenvalues from 0 to 1.
    for i in np.nonzero(deg == 0)[0]:
        L[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] = np.eye(3, dtype=np.float32)
    return jnp.asarray(L)


@functools.partial(jax.jit, static_argnames=("p", "sweeps"))
def _staircase_solve(L: jnp.ndarray, Y0: jnp.ndarray, p: int, sweeps: int = 100):
    """Block-coordinate (Jacobi-damped) minimization of tr(Y^T L Y) over
    St(p, 3)^n. Y: (3n, p) with orthonormal 3-column blocks... stored as
    (3n, p) where rows 3i..3i+2 form Y_i^T (3 x p), Y_i in St(p, 3).

    Update: Y_i <- polar(-(sum_{j != i} L_ij Y_j)) — exact per-block minimizer
    given the others; simultaneous (Jacobi) updates damped 0.5 for stability.
    """
    n3 = L.shape[0]
    n = n3 // 3
    D = jnp.asarray(
        jnp.kron(jnp.eye(n), jnp.ones((3, 3))), L.dtype
    ) * L  # block-diagonal part of L
    W = L - D  # off-diagonal blocks

    def polar_blocks(A):
        """A: (3n, p) -> nearest orthonormal-row 3xp blocks, via Newton-Schulz
        (matmul-only: compiles and runs far faster than batched SVD in a loop).
        """
        Ab = A.reshape(n, 3, -1)
        # Scale so singular values < sqrt(3) (NS convergence region).
        scale = jnp.sqrt(jnp.sum(Ab * Ab, axis=(-2, -1), keepdims=True) / 3.0) * 1.2 + 1e-12
        X = Ab / scale

        def ns(X, _):
            XXt = X @ jnp.swapaxes(X, -1, -2)  # (n, 3, 3)
            return 1.5 * X - 0.5 * XXt @ X, None

        X, _ = jax.lax.scan(ns, X, None, length=10)
        return X.reshape(n3, -1)

    def sweep(Y, _):
        # Exact per-block minimizer given the others, Jacobi-applied with 0.5
        # damping (averaged with current iterate, re-orthonormalized).
        Y_new = polar_blocks(-(W @ Y))
        Y = polar_blocks(Y + Y_new)
        return Y, None

    Y, _ = jax.lax.scan(sweep, Y0, None, length=sweeps)
    return Y


@functools.partial(jax.jit, static_argnames=("iters",))
def _certificate_min_eig(L: jnp.ndarray, Y: jnp.ndarray, iters: int = 100):
    """Min eigenvalue of M = L - blockdiag(sym(Lambda_i)) via shifted power
    iteration, where Lambda_i = sym(Y_i^T (L Y)_i) (SE-Sync certificate)."""
    n3 = L.shape[0]
    n = n3 // 3
    LY = L @ Y  # (3n, p)
    Yb = Y.reshape(n, 3, -1)
    LYb = LY.reshape(n, 3, -1)
    Lam = jnp.einsum("nip,njp->nij", LYb, Yb)
    Lam = 0.5 * (Lam + jnp.swapaxes(Lam, -1, -2))
    # Build blockdiag(Lam) densely.
    BD = jnp.zeros_like(L)
    idx = jnp.arange(n)
    BD = BD.reshape(n, 3, n, 3)
    BD = BD.at[idx, :, idx, :].set(Lam)
    BD = BD.reshape(n3, n3)
    M = L - BD
    # Shift so the target (min) eigenvalue becomes the dominant one.
    sigma = jnp.linalg.norm(M, ord="fro") + 1.0
    A = sigma * jnp.eye(n3, dtype=L.dtype) - M
    v = jnp.ones((n3,), L.dtype) / jnp.sqrt(n3 * 1.0)

    def body(v, _):
        w = A @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-20), None

    v, _ = jax.lax.scan(body, v, None, length=iters)
    lam_max_A = v @ (A @ v)
    return sigma - lam_max_A  # min eig of M


def _round_to_so3(Y: jnp.ndarray) -> jnp.ndarray:
    """Rank-3 rounding: (3n, p) -> (n, 3, 3) rotations.

    Blocks of Y (rows 3i..3i+2) are R_i^T in the rank-3 subspace. A global
    reflection (improper gauge) is detected via the mean block determinant and
    removed by flipping the subspace sign (det(-A) = -det(A) for 3x3).
    """
    n3, p = Y.shape
    n = n3 // 3
    U, S, Vt = jnp.linalg.svd(Y, full_matrices=False)
    proj = Y @ Vt[:3].T  # (3n, 3)
    blocks_T = proj.reshape(n, 3, 3)  # R_i^T candidates
    mean_det = jnp.mean(jnp.linalg.det(blocks_T))
    blocks_T = jnp.where(mean_det < 0, -blocks_T, blocks_T)
    return lie.project_to_so3(jnp.swapaxes(blocks_T, -1, -2))


def run_rotation_averaging(
    num_images: int,
    edges: np.ndarray,  # (E, 2) int (i1, i2)
    i2Ri1: np.ndarray,  # (E, 3, 3)
    p_values: tuple[int, ...] = (3, 5),
    sweeps: int = 100,
    certificate_tol: float = -1e-3,
) -> tuple[np.ndarray, dict]:
    """Returns (wRi (n, 3, 3) with wR0 = I gauge, info dict).

    Nodes absent from all edges get identity (caller masks them, mirroring the
    reference's None entries in rotation_averaging_base.py).
    """
    L = build_connection_laplacian(num_images, edges, i2Ri1)
    n = num_images

    # Chordal init: 3 smallest eigenvectors.
    evals, evecs = jnp.linalg.eigh(L)
    Y = evecs[:, :3]  # (3n, 3)
    info = {"chordal_gap": float(evals[3] - evals[2])}

    min_eig = None
    for p in p_values:
        # Lift to St(p, 3): pad columns with zeros (still orthonormal).
        if Y.shape[1] < p:
            Y = jnp.concatenate([Y, jnp.zeros((3 * n, p - Y.shape[1]), Y.dtype)], axis=1)
        # Project blocks onto the Stiefel manifold.
        Yb = Y.reshape(n, 3, p)
        U, _, Vt = jnp.linalg.svd(Yb, full_matrices=False)
        Y = (U @ Vt).reshape(3 * n, p)
        Y = _staircase_solve(L, Y, p, sweeps)
        min_eig = float(_certificate_min_eig(L, Y))
        info[f"certificate_min_eig_p{p}"] = min_eig
        if min_eig > certificate_tol * (1.0 + float(jnp.linalg.norm(L))):
            break

    R = _round_to_so3(Y)
    # Gauge: express in frame of node 0 (wR0 = I).
    R0inv = jnp.swapaxes(R[0], -1, -2)
    R = jnp.einsum("ij,njk->nik", R0inv, R)

    # Check handedness: the rounding can produce the reflected solution
    # (R -> R * det flip is not possible per-block, but the *relative*
    # rotations can come out transposed if the subspace was mirrored).
    # Evaluate chordal cost of R and its transpose-gauge; keep the better.
    cost = _chordal_cost(R, edges, i2Ri1)
    R_alt = jnp.swapaxes(R, -1, -2)
    R_alt = jnp.einsum("ij,njk->nik", jnp.swapaxes(R_alt[0], -1, -2), R_alt)
    cost_alt = _chordal_cost(R_alt, edges, i2Ri1)
    if float(cost_alt) < float(cost):
        R = R_alt
        cost = cost_alt
    info["final_chordal_cost"] = float(cost)
    return np.asarray(R), info


def _chordal_cost(wRi: jnp.ndarray, edges: np.ndarray, i2Ri1: np.ndarray) -> jnp.ndarray:
    a = edges[:, 0]
    b = edges[:, 1]
    pred = jnp.einsum("eij,ejk->eik", jnp.swapaxes(wRi[b], -1, -2), wRi[a])
    return jnp.sum((pred - jnp.asarray(i2Ri1)) ** 2)


def relative_rotation_errors_deg(
    wRi: np.ndarray, edges: np.ndarray, i2Ri1: np.ndarray
) -> np.ndarray:
    """Per-edge consistency of the estimate with the measurements (metrics)."""
    a = edges[:, 0]
    b = edges[:, 1]
    pred = jnp.einsum("eij,ejk->eik", jnp.swapaxes(jnp.asarray(wRi)[b], -1, -2), jnp.asarray(wRi)[a])
    return np.asarray(jnp.degrees(lie.rotation_angular_distance(pred, jnp.asarray(i2Ri1))))
