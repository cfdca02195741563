"""Pallas Schur kernel vs XLA one-hot MXU path (VERDICT r2 item 7).

Micro-benchmarks exactly the computation that differs between the two
paths — the reduced-system assembly S_red from the per-measurement
coupling blocks:

  XLA path     G = onehot-expand(W);  C = Hpp_inv G;  S_red = G^T C
               (two bf16 MXU matmuls, G round-trips through HBM)
  Pallas path  A = chol(Hpp_inv)^T W;  S_red = B^T B with B the one-hot
               expansion of A materialized only in VMEM per track block

Everything around it (residual/Jacobian build, damping, reduced solve) is
identical, so the faster S_red assembly wins the LM iteration. Inputs are
random with the same shapes/dtypes the BA path produces.

    python scripts/schur_bench.py            # on the real TPU
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        __import__("gtsfm_tpu.common.cache_dirs",
                   fromlist=["compile_cache_dir"]).compile_cache_dir(),
    )
    from gtsfm_tpu.ops.pallas_kernels import schur as schur_kernel

    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0].device_kind})",
          flush=True)
    rng = np.random.default_rng(0)
    D = 9
    N = 128
    L = 8

    def xla_path(W, Hpp_inv, onehot):
        g_dtype = jnp.bfloat16
        G = jnp.einsum(
            "tln,tlij->tinj", onehot.astype(g_dtype), W.astype(g_dtype),
            preferred_element_type=g_dtype,
        ).reshape(W.shape[0], 3, N * D)
        C = jnp.einsum("tij,tjn->tin", Hpp_inv.astype(g_dtype), G)
        return jax.lax.dot_general(
            G.reshape(-1, N * D), C.reshape(-1, N * D),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    def chol3x3(M):
        from gtsfm_tpu.bundle.ba import _chol3x3

        return _chol3x3(M)

    def pallas_path(W, Hpp_inv, cam_b):
        U = chol3x3(Hpp_inv)
        u = lambda k, i: U[:, None, k, i, None]
        W0, W1, W2 = W[:, :, 0], W[:, :, 1], W[:, :, 2]
        A = jnp.stack(
            [
                u(0, 0) * W0 + u(1, 0) * W1 + u(2, 0) * W2,
                u(1, 1) * W1 + u(2, 1) * W2,
                u(2, 2) * W2,
            ],
            axis=2,
        )
        return schur_kernel.sred_onehot_n(A, cam_b, N, out_dtype=jnp.float32)

    REPS = 20

    def timed(fn, W, *rest):
        """Time REPS chained in-graph evaluations: a fori_loop feeds the
        accumulated scalar back into the input, so iterations can't be
        deduped/hoisted and remote-dispatch latency is amortized — per-call
        host timing through the network tunnel is meaningless at sub-ms
        kernel times."""

        def chained(W0, *r):
            def body(i, carry):
                acc, W_ = carry
                out = fn(W_, *r)
                # Non-linear reduction: sum/slice of a dot product gets
                # algebraically simplified by XLA (sum(A@B) -> O(n^2),
                # slice-of-dot -> one row) — max(|.|) has no shortcut, so
                # the full S_red must be computed every iteration.
                s = jnp.max(jnp.abs(out.astype(jnp.float32))) * 1e-30
                return acc + s, W0 + s
            acc, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0.0), W0))
            return acc

        jfn = jax.jit(chained)
        # float() fetches the scalar to the host — the only reliable
        # completion barrier through the axon tunnel (block_until_ready
        # returns before execution finishes there).
        float(jfn(W, *rest))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(W, *rest))
            best = min(best, time.perf_counter() - t0)
        return best / REPS

    print("| N | T tracks | L | XLA one-hot ms | Pallas B^T B ms | winner |")
    print("|---|---|---|---|---|---|", flush=True)
    for T in (8192, 16384, 32768):
        W = jnp.asarray(rng.normal(size=(T, L, 3, D)).astype(np.float32))
        Hpp = rng.normal(size=(T, 3, 3)).astype(np.float32)
        Hpp = np.einsum("tij,tkj->tik", Hpp, Hpp) + 3.0 * np.eye(3)
        Hpp_inv = jnp.asarray(np.linalg.inv(Hpp))
        cam_b = jnp.asarray(rng.integers(0, N, size=(T, L)).astype(np.int32))
        onehot = jax.nn.one_hot(cam_b, N, dtype=jnp.float32)
        t_xla = timed(xla_path, W, Hpp_inv, onehot)
        ok = schur_kernel.supported(T, L, N, D) or True  # kernel gate is env-driven
        os.environ["GTSFM_TPU_PALLAS_SCHUR"] = "1"
        try:
            t_pal = timed(pallas_path, W, Hpp_inv, cam_b)
            pal_str = f"{t_pal * 1e3:.2f}"
            win = "pallas" if t_pal < t_xla else "xla"
        except Exception as e:  # noqa: BLE001
            pal_str, win = f"error: {type(e).__name__}", "xla"
        print(f"| {N} | {T} | {L} | {t_xla * 1e3:.2f} | {pal_str} | {win} |",
              flush=True)


if __name__ == "__main__":
    main()
