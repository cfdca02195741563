"""Pallas TPU kernel for the BA Schur reduction S_red = B^T B.

B is the one-hot camera expansion of the square-root coupling blocks
A = chol(Hpp_inv)^T (Jp^T Jc): B[t*3 + i, cam(t,l)*9 + j] = sum_l A[t,l,i,j].
In the XLA path B (T*3, 9N) round-trips through HBM (hundreds of MB); here
each track block's B tile is materialized in VMEM only and immediately
consumed by the MXU accumulation — the kernel's HBM traffic is just A
(a few MB) plus one S_red write.

Grid: one step per track block; S_red accumulates in a VMEM scratch and is
written on the last step (standard reduction pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRACK_BLOCK = 256
_MAX_ND = 1280  # VMEM budget: out (ND^2, resident) + B (3*TB x ND) in f32


def supported(T: int, L: int, N: int, D: int = 9) -> bool:
    """Kernel applicability: TPU backend, lane-aligned reduced system, track
    count divisible by the block size.

    OFF by default (GTSFM_TPU_PALLAS_SCHUR=1 enables): on v5e the XLA
    symmetric-matmul path currently beats this kernel (~8 ms vs ~12 ms at
    T=16k/N=128) — the one-hot lane expansion is VPU-bound either way, and
    XLA's bf16 B materialization amortizes better. Kept for larger-N tuning.
    """
    import os

    if os.environ.get("GTSFM_TPU_PALLAS_SCHUR") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    nd = N * D
    return (
        nd % 128 == 0
        and nd <= _MAX_ND
        and T % TRACK_BLOCK == 0
        and L <= 32
    )


def _kernel(cam_ref, a_ref, rep_ref, out_ref, b_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    cam = cam_ref[:]  # (TB, L) int32
    A = a_ref[:]  # (TB, L, 3, D) f32
    R = rep_ref[:]  # (D, ND) constant: R[j, n*D + j'] = (j == j')
    TB, L = cam.shape
    ND = out_ref.shape[0]
    D = A.shape[-1]

    # Build the block's dense coupling B (TB, 3, ND) in the VMEM scratch:
    # lane n*D+j holds A[t, l, :, j] when cam[t, l] == n. Mosaic cannot
    # reshape trailing (N, D) -> N*D vectors, so the D-periodic lane pattern
    # comes from a matmul against the constant replication matrix R, then a
    # camera-lane mask selects the right block — two VMEM passes per slot.
    lane_cam = jax.lax.broadcasted_iota(jnp.int32, (TB, 1, ND), 2) // D
    b_ref[:] = jnp.zeros_like(b_ref)
    for l in range(L):  # static unroll; L is small
        a_pat = jax.lax.dot_general(
            A[:, l].reshape(TB * 3, D), R, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(TB, 3, ND)
        camsel = (lane_cam == cam[:, l][:, None, None]).astype(jnp.float32)
        b_ref[:] += camsel * a_pat
    Bm = b_ref[:].reshape(TB * 3, ND)
    # Constant out index map -> the block stays VMEM-resident across grid
    # steps; accumulate in place (standard reduction pattern).
    out_ref[:] += jax.lax.dot_general(
        Bm, Bm, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("n_cameras", "out_dtype"))
def sred_onehot_n(A: jnp.ndarray, cam_b: jnp.ndarray, n_cameras: int,
                  out_dtype=jnp.float32):
    """S_red = B^T B (see module docstring). A (T, L, 3, D) f32 with masked
    slots zeroed (their camera index is then irrelevant), cam_b (T, L)."""
    T, L, _, D = A.shape
    ND = n_cameras * D
    grid = (T // TRACK_BLOCK,)
    # Constant replication matrix: R[j, n*D + j'] = (j == j').
    rep = jnp.tile(jnp.eye(D, dtype=jnp.float32), (1, n_cameras))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TRACK_BLOCK, L), lambda i: (i, 0)),
            pl.BlockSpec((TRACK_BLOCK, L, 3, D), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((D, ND), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ND, ND), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ND, ND), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TRACK_BLOCK, 3, ND), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The resident (ND, ND) accumulator + its += temp exceed the
            # 16 MB default scoped budget; v5e has headroom above it.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * 3 * ND * ND,
            bytes_accessed=A.size * 4 + ND * ND * 4,
            transcendentals=0,
        ),
    )(cam_b.astype(jnp.int32), A.astype(jnp.float32), rep)
    return out.astype(out_dtype)
