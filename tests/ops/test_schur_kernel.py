"""Pallas Schur-reduction kernel tests (TPU-only; opt-in via env)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsfm_tpu.ops.pallas_kernels import schur


def test_supported_gating(monkeypatch):
    monkeypatch.delenv("GTSFM_TPU_PALLAS_SCHUR", raising=False)
    assert not schur.supported(1024, 8, 128)
    monkeypatch.setenv("GTSFM_TPU_PALLAS_SCHUR", "1")
    if jax.default_backend() != "tpu":
        assert not schur.supported(1024, 8, 128)
    # Constraint checks are backend-independent logic: misaligned N rejected.
    assert schur._MAX_ND >= 1152


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel needs a TPU"
)
def test_kernel_matches_xla(rng):
    T, L, N, D = schur.TRACK_BLOCK * 4, 8, 128, 9
    A = jnp.asarray(rng.standard_normal((T, L, 3, D)).astype(np.float32) * 0.1)
    cam = jnp.asarray(rng.integers(0, N, (T, L)), jnp.int32)
    S_k = schur.sred_onehot_n(A, cam, N)
    oh = jax.nn.one_hot(cam, N)
    B = jnp.einsum("tln,tlij->tinj", oh, A).reshape(T * 3, N * D)
    S_x = jax.lax.dot_general(B, B, (((0,), (0,)), ((), ())))
    rel = float(jnp.abs(S_k - S_x).max()) / float(jnp.abs(S_x).max())
    assert rel < 1e-4
