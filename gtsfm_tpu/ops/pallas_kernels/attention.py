"""Masked flash attention as a Pallas TPU kernel.

The attention inside SuperGlue/LightGlue is quadratic over keypoint sets
(reference superglue.py:85-89 runs whole 5k x 5k attention on one GPU;
SURVEY.md section 5 flags blockwise attention as the needed long-context
design). This kernel computes softmax(q k^T / sqrt(d) + mask) v with the
online-softmax recurrence over a (batch*heads, q-block, kv-block) grid —
VMEM holds only one q/k/v tile + the running (m, l, acc) scratch, so the
(K x K) score matrix never exists and K scales past the einsum path's
HBM/VMEM limits.

Layout: q, k, v are (B*H, K, Dh); kv_mask is (B*H, K) with 0 = padded slot
(mapped to -inf scores). Returns (B*H, K, Dh) float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float):
    """Grid (bh, i, j): q-tile i against kv-tile j with running softmax."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0] * scale  # (BLK_Q, Dh)
    k = k_ref[0]  # (BLK_KV, Dh)
    v = v_ref[0]
    msk = mask_ref[0, 0]  # (BLK_KV,)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    s = jnp.where(msk[None, :] > 0, s, NEG)
    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * corr + jnp.dot(p, v, preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(j == nj - 1)
    def _():
        o_ref[...] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-20))[None]


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_kv", "interpret"))
def flash_attention(
    q: jnp.ndarray,  # (BH, K, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,  # (BH, K)
    blk_q: int = 256,
    blk_kv: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    BH, K, Dh = q.shape
    blk_q = min(blk_q, K)
    blk_kv = min(blk_kv, K)
    assert K % blk_q == 0 and K % blk_kv == 0, "pad K to the block size"
    scale = 1.0 / (Dh**0.5)

    grid = (BH, K // blk_q, K // blk_kv)
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, K, Dh), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, Dh), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, blk_kv, Dh), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, blk_kv, Dh), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, blk_kv), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, Dh), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),   # running max
            pltpu.VMEM((blk_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((blk_q, Dh), jnp.float32),  # accumulator
        ],
        # Cost model for XLA scheduling + roofline accounting (QK^T and PV
        # matmuls dominate; exp() once per score entry).
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * K * K * Dh,
            bytes_accessed=4 * BH * K * Dh * 4 + BH * K * 4,
            transcendentals=BH * K * K,
        ),
        interpret=interpret,
    )(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        kv_mask[:, None, :].astype(jnp.float32),
    )


def reference_attention(q, k, v, kv_mask):
    """Plain einsum attention (numerical reference + non-TPU fallback)."""
    Dh = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k) / (Dh**0.5)
    s = jnp.where(kv_mask[:, None, :] > 0, s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


def masked_attention(q, k, v, kv_mask, use_pallas: bool | None = None):
    """Dispatch: Pallas flash kernel on TPU for large keypoint sets (where
    the einsum path's materialized scores dominate HBM), einsum otherwise."""
    K, Dh = q.shape[-2], q.shape[-1]
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and K >= 2048
            and K % 256 == 0
            and Dh in (32, 64, 128)
        )
    if use_pallas:
        return flash_attention(q, k, v, kv_mask)
    return reference_attention(q, k, v, kv_mask)
