"""On-chip smoke + throughput for the round-1 additions: general
sqrtm/logm, Krylov (CG/BiCGSTAB/GMRES), LOBPCG.

The TPU backend has a history of loop-lowering miscompiles (see
STATUS.md): every new while_loop-heavy family gets an on-chip
correctness check against host f64 before its numbers go in the README.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_new_families.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from linalg_solver_tpu.ops.funm import logm_batched, sqrtm_batched
    from linalg_solver_tpu.ops.krylov import (
        bicgstab_batched, cg_batched, gmres_batched,
    )
    from linalg_solver_tpu.ops.lobpcg import lobpcg_batched
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    # --- general sqrtm / logm, B=32 n=128 ---
    B, n = 32, 128
    A = rng.randn(B, n, n) + 3.0 * np.sqrt(n) * np.eye(n)
    Aj = jnp.asarray(A, jnp.float32)
    r = sqrtm_batched(Aj)
    Y = np.asarray(r.Y, np.float64)
    resid = np.abs(np.einsum("bij,bjk->bik", Y, Y) - A).max() / np.abs(A).max()
    t = device_slope_time(
        jax.jit(lambda a: sqrtm_batched(a).Y), Aj, i1=3, i2=9, repeats=2
    )
    print(f"[sqrtm] 32x128: conv {int(np.asarray(r.converged).sum())}/32, "
          f"resid {resid:.2e}, {t*1e3:.1f} ms/call", flush=True)
    lr = logm_batched(Aj)
    from linalg_solver_tpu.ops.funm import expm_batched
    back = np.asarray(expm_batched(lr.L), np.float64)
    lresid = np.abs(back - A).max() / np.abs(A).max()
    t = device_slope_time(
        jax.jit(lambda a: logm_batched(a).L), Aj, i1=3, i2=9, repeats=2
    )
    print(f"[logm] 32x128: conv {int(np.asarray(lr.converged).sum())}/32, "
          f"expm-roundtrip {lresid:.2e}, {t*1e3:.1f} ms/call", flush=True)

    # --- Krylov on big well-conditioned systems, B=8 n=1024 ---
    B, n = 8, 1024
    G = rng.randn(B, n, n).astype(np.float32) / np.sqrt(n)
    S = np.einsum("bik,bjk->bij", G, G) + np.eye(n, dtype=np.float32)
    bb = rng.randn(B, n).astype(np.float32)
    Sj, bj = jnp.asarray(S), jnp.asarray(bb)
    res = cg_batched(Sj, bj, tol=1e-5)
    x = np.asarray(res.x, np.float64)
    rr = np.linalg.norm(
        np.einsum("bij,bj->bi", S.astype(np.float64), x) - bb
    ) / np.linalg.norm(bb)
    t = device_slope_time(
        jax.jit(lambda a, c: cg_batched(a, c, tol=1e-5).x), Sj, bj,
        i1=2, i2=6, repeats=2,
    )
    print(f"[cg] 8x1024 SPD: conv {int(np.asarray(res.converged).sum())}/8, "
          f"resid {rr:.2e}, {t*1e3:.1f} ms/call", flush=True)

    Gen = (rng.randn(B, n, n) / np.sqrt(n) + 4.0 * np.eye(n)).astype(
        np.float32
    )
    Gj = jnp.asarray(Gen)
    for name, fn in [
        ("bicgstab", lambda a, c: bicgstab_batched(a, c, tol=1e-5)),
        ("gmres", lambda a, c: gmres_batched(a, c, tol=1e-5, restart=32)),
    ]:
        res = fn(Gj, bj)
        x = np.asarray(res.x, np.float64)
        rr = np.linalg.norm(
            np.einsum("bij,bj->bi", Gen.astype(np.float64), x) - bb
        ) / np.linalg.norm(bb)
        t = device_slope_time(
            jax.jit(lambda a, c: fn(a, c).x), Gj, bj, i1=2, i2=6,
            repeats=2,
        )
        print(f"[{name}] 8x1024: conv {int(np.asarray(res.converged).sum())}/8, "
              f"resid {rr:.2e}, {t*1e3:.1f} ms/call", flush=True)

    # --- LOBPCG k=8 smallest of 16x(512x512) SPD ---
    B, n, k = 16, 512, 8
    G = rng.randn(B, n, n).astype(np.float32) / np.sqrt(n)
    S = np.einsum("bik,bjk->bij", G, G) + 0.1 * np.eye(n, dtype=np.float32)
    Sj = jnp.asarray(S)
    res = lobpcg_batched(Sj, k, tol=1e-4)
    w = np.asarray(res.w, np.float64)
    worst = 0.0
    for b in range(4):
        want = np.sort(np.linalg.eigvalsh(S[b].astype(np.float64)))[:k]
        worst = max(worst, np.abs(w[b] - want).max() / np.abs(want).max())
    t = device_slope_time(
        jax.jit(lambda a: lobpcg_batched(a, k, tol=1e-4).w), Sj,
        i1=2, i2=6, repeats=2,
    )
    print(f"[lobpcg] 16x512 k=8: conv {int(np.asarray(res.converged).sum())}/16, "
          f"rel-dev {worst:.2e}, {t*1e3:.1f} ms/call", flush=True)


if __name__ == "__main__":
    main()
