"""On-chip smoke + timing for the structured-solver families: FFT
Toeplitz (exercises XLA's TPU FFT lowering through the tunnel — first
use in this framework), banded block-PCR, and the large-N mixed solve
already covered by bench_lu_large.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_structured.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from linalg_solver_tpu.ops.banded import banded_solve_batched
    from linalg_solver_tpu.ops.toeplitz import (
        toeplitz_dense_batched, toeplitz_solve_batched,
    )
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    # --- Toeplitz: B=16, n=4096 (O(n log n) regime) ---
    B, n = 16, 4096
    decay = np.exp(-0.5 * np.arange(n))
    c = (rng.randn(B, n) * decay).astype(np.float32)
    r = (rng.randn(B, n) * decay).astype(np.float32)
    c[:, 0] += 4.0
    r[:, 0] = c[:, 0]
    b = rng.randn(B, n).astype(np.float32)
    fn = jax.jit(
        lambda c, r, b: toeplitz_solve_batched(c, r, b, tol=1e-5).x
    )
    x = np.asarray(fn(jnp.asarray(c), jnp.asarray(r), jnp.asarray(b)),
                   np.float64)
    # verify on a small slice against dense
    Td = np.asarray(
        toeplitz_dense_batched(jnp.asarray(c[:2]), jnp.asarray(r[:2])),
        np.float64,
    )
    rr = max(
        np.linalg.norm(Td[i] @ x[i] - b[i]) / np.linalg.norm(b[i])
        for i in range(2)
    )
    t = device_slope_time(
        fn, jnp.asarray(c), jnp.asarray(r), jnp.asarray(b),
        i1=2, i2=6, repeats=2,
    )
    print(f"[toeplitz] 16x4096: resid {rr:.2e}, {t*1e3:.1f} ms/call",
          flush=True)

    # --- banded: B=64, N=2048, kb=8 ---
    B, N, kb = 64, 2048, 8
    ab = rng.randn(B, 2 * kb + 1, N).astype(np.float32)
    ab[:, kb] += 4.0 * (2 * kb + 1)
    bb = rng.randn(B, N).astype(np.float32)
    fnb = jax.jit(
        lambda ab, bb: banded_solve_batched(ab, bb, kb=kb).x
    )
    xb = np.asarray(fnb(jnp.asarray(ab), jnp.asarray(bb)))
    from scipy.linalg import solve_banded

    want = solve_banded((kb, kb), ab[0].astype(np.float64),
                        bb[0].astype(np.float64))
    err = np.abs(xb[0] - want).max() / max(np.abs(want).max(), 1.0)
    t = device_slope_time(
        fnb, jnp.asarray(ab), jnp.asarray(bb), i1=2, i2=6, repeats=2
    )
    print(f"[banded] 64x2048 kb=8: err-vs-scipy {err:.2e}, "
          f"{t*1e3:.1f} ms/call", flush=True)


if __name__ == "__main__":
    main()
