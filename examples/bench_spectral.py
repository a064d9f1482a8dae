"""Benchmark the spectral pipeline (BASELINE configs 4-5) on the chip.

Times the stages separately:
- eigvals_schur        (chunked host driver; the eigenvalue stage)
- spectral core        (multiplicities + diagonalize given eigenvalues —
                        the stage the distinct-compaction path rebuilt)
- jordan_analysis      (Weyr/Jordan structure, svd vs gj rank methods)

Run with the real TPU (default platform under the driver session).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def wall(fn, *args, reps=3, **kw):
    """Best-of wall time with host readback (tunnel-safe)."""
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args, **kw)
        jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "dtype") else x, out
        )
        best = min(best, time.time() - t0)
    return best, out


def main():
    from linalg_solver_tpu.models.jordan import jordan_analysis
    from linalg_solver_tpu.models.spectral import (
        _spectral_core,
        spectral_pipeline,
    )
    from linalg_solver_tpu.ops.generate import (
        diagonalizable_batch,
        jordan_batch,
    )
    from linalg_solver_tpu.ops.schur import eigvals_schur

    B, n = 32, 256
    key = jax.random.PRNGKey(0)

    # Config 4: with_eigenvalues batches (3 distinct eigenvalues).
    eigs = [1.0] * 86 + [2.0] * 85 + [5.0] * 85
    A4 = diagonalizable_batch(key, B, eigs, transform="orthogonal")
    A4 = jnp.asarray(np.asarray(A4))  # materialize

    t_schur, ev = wall(eigvals_schur, A4, reps=2)
    print(f"eigvals_schur      {B}x({n}x{n}): {t_schur*1e3:8.1f} ms")

    for md in (3, None):
        t_core, rep = wall(
            _spectral_core, A4, ev.real, ev.imag, 1e-2, md, reps=3
        )
        ok = np.asarray(rep.diagonalizable)
        print(
            f"spectral core (max_distinct={md}): {t_core*1e3:8.1f} ms  "
            f"diagonalizable: {int(ok.sum())}/{B}"
        )
        if not ok.all():
            geo = np.asarray(rep.geom_mult)
            alg = np.asarray(rep.alg_mult)
            lam = np.asarray(rep.eig_real)
            P64 = np.asarray(rep.P, np.float64)
            Pi64 = np.asarray(rep.P_inv, np.float64)
            for b in np.nonzero(~ok)[0][:4]:
                firsts = np.concatenate(
                    [[True], np.abs(np.diff(lam[b])) > 1e-2]
                )
                resid = np.abs(
                    P64[b] @ Pi64[b] - np.eye(P64.shape[-1])
                ).max()
                print(
                    f"   FAIL lane {b}: clusters={int(firsts.sum())} "
                    f"lam={np.round(lam[b][firsts][:6], 4)} "
                    f"geom={geo[b][firsts][:6]} alg={alg[b][firsts][:6]} "
                    f"PPinv_resid={resid:.2e}"
                )

    # Config 5: Jordan-block spectra.
    A5 = jordan_batch(
        jax.random.PRNGKey(1), B,
        tuple([(2.0, 3)] * 20 + [(2.0, 2)] * 20 + [(5.0, 2)] * 40
              + [(1.0, 1)] * 76),
        transform="orthogonal",
    )
    A5 = jnp.asarray(np.asarray(A5))
    evs = jnp.array([2.0, 5.0, 1.0])
    for method in ("svd", "gj"):
        t_j, repj = wall(
            jordan_analysis, A5, evs, k_max=4, method=method, reps=2
        )
        print(
            f"jordan_analysis ({method}):  {t_j*1e3:8.1f} ms  "
            f"alg[0]: {np.asarray(repj.alg_mult[0])} "
            f"geom[0]: {np.asarray(repj.geom_mult[0])}"
        )


if __name__ == "__main__":
    main()
