"""On-chip validation for the ordered-Schur family and the custom-VJP
differentiation layer (expm Fréchet adjoint, solve/lstsq adjoints).

The TPU backend has a history of loop-lowering miscompiles (STATUS.md):
every new loop-heavy family gets an on-chip correctness check against
host f64 before its numbers go in the README.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_ordschur_autodiff.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    import scipy.linalg

    from linalg_solver_tpu.ops import dispatch
    from linalg_solver_tpu.ops.funm import (
        expm_batched, expm_cond_batched, expm_frechet_batched,
    )
    from linalg_solver_tpu.ops.ordschur import (
        invariant_subspace_batched, schur_sort_batched,
    )
    from linalg_solver_tpu.ops.schur import real_schur_vectors
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    # --- ordered Schur: sort 16x(128x128) by |lambda| ---
    B, n = 16, 128
    A = rng.randn(B, n, n).astype(np.float32)
    sv = real_schur_vectors(jnp.asarray(A))
    conv = np.asarray(sv.converged)
    print(f"schur converged {conv.sum()}/{B}", flush=True)
    os = schur_sort_batched(sv.T, sv.Q, key="abs_desc")
    w = np.asarray(os.w_re, np.float64) + 1j * np.asarray(
        os.w_im, np.float64
    )
    T = np.asarray(os.t_re, np.float64) + 1j * np.asarray(
        os.t_im, np.float64
    )
    Q = np.asarray(os.q_re, np.float64) + 1j * np.asarray(
        os.q_im, np.float64
    )
    worst_recon = worst_eig = worst_unit = 0.0
    for b in range(B):
        mags = np.abs(w[b])
        assert (np.diff(mags) <= 1e-4 * mags[:-1] + 1e-5).all()
        Db = np.diag(np.asarray(sv.scale[b], np.float64))
        Dbi = np.diag(1 / np.asarray(sv.scale[b], np.float64))
        recon = np.abs(Q[b] @ T[b] @ Q[b].conj().T - Db @ A[b] @ Dbi
                       ).max() / np.abs(A[b]).max()
        unit = np.abs(Q[b].conj().T @ Q[b] - np.eye(n)).max()
        wa = np.linalg.eigvals(A[b].astype(np.float64))
        eigerr = max(np.abs(x - wa).min() for x in w[b]) / np.abs(
            wa
        ).max()
        worst_recon = max(worst_recon, recon)
        worst_eig = max(worst_eig, eigerr)
        worst_unit = max(worst_unit, unit)
    t = device_slope_time(
        lambda T_, Q_: schur_sort_batched(T_, Q_, key="abs_desc").t_re,
        sv.T, sv.Q,
    )
    print(
        f"schur_sort {B}x({n}x{n}): {t*1e3:.2f} ms/call  "
        f"recon {worst_recon:.2e} eig {worst_eig:.2e} "
        f"unitary {worst_unit:.2e}",
        flush=True,
    )

    # --- invariant subspace (stable eigenvalues), same batch ---
    res = invariant_subspace_batched(jnp.asarray(A), lambda re, im: re < 0)
    ok = np.asarray(res.ok)
    print(
        f"invariant_subspace: ok {ok.sum()}/{B}, "
        f"max resid {np.asarray(res.resid).max():.2e}, "
        f"m range [{np.asarray(res.m).min()}, {np.asarray(res.m).max()}]",
        flush=True,
    )
    assert ok.all()

    # --- expm Frechet derivative + condition, 32x(128x128) ---
    B2, n2 = 32, 128
    A2 = (rng.randn(B2, n2, n2) / np.sqrt(n2)).astype(np.float32)
    E2 = rng.randn(B2, n2, n2).astype(np.float32)
    fr = expm_frechet_batched(jnp.asarray(A2), jnp.asarray(E2))
    eA, L = scipy.linalg.expm_frechet(
        A2[0].astype(np.float64), E2[0].astype(np.float64)
    )
    lerr = np.abs(np.asarray(fr.L[0], np.float64) - L).max() / max(
        np.abs(L).max(), 1.0
    )
    eerr = np.abs(np.asarray(fr.expm[0], np.float64) - eA).max()
    t = device_slope_time(
        lambda a, e: expm_frechet_batched(a, e).L,
        jnp.asarray(A2), jnp.asarray(E2),
    )
    print(
        f"expm_frechet {B2}x({n2}x{n2}): {t*1e3:.2f} ms/call  "
        f"L err {lerr:.2e} expm err {eerr:.2e}",
        flush=True,
    )
    kap, _ = expm_cond_batched(jnp.asarray(A2[:4]), iters=8)
    want = scipy.linalg.expm_cond(A2[0].astype(np.float64))
    print(
        f"expm_cond lane0: {float(kap[0]):.3f} vs scipy {want:.3f}",
        flush=True,
    )

    # --- grad through the production solve at the bench shape ---
    B3, n3 = 256, 256
    A3 = (rng.randn(B3, n3, n3) + n3 * np.eye(n3, dtype=np.float32)
          ).astype(np.float32)
    b3 = rng.randn(B3, n3).astype(np.float32)

    def loss(a_, b_):
        x = dispatch.solve_batched(a_, b_)
        return jnp.sum(x * x)

    gfn = jax.jit(jax.grad(loss))
    ga = gfn(jnp.asarray(A3), jnp.asarray(b3))
    ga0 = np.asarray(ga[0], np.float64)
    A64 = A3[0].astype(np.float64)
    x = np.linalg.solve(A64, b3[0].astype(np.float64))
    y = np.linalg.solve(A64.T, 2 * x)
    gerr = np.abs(ga0 - (-np.outer(y, x))).max() / max(
        np.abs(np.outer(y, x)).max(), 1e-30
    )
    t_f = device_slope_time(
        lambda a, c: dispatch.solve_batched(a, c), jnp.asarray(A3),
        jnp.asarray(b3),
    )
    t_g = device_slope_time(gfn, jnp.asarray(A3), jnp.asarray(b3))
    print(
        f"solve grad {B3}x({n3}x{n3}): fwd {t_f*1e3:.2f} ms, "
        f"grad {t_g*1e3:.2f} ms ({t_g/t_f:.2f}x fwd)  "
        f"lane0 grad err {gerr:.2e}",
        flush=True,
    )
    print("chip_ordschur_autodiff: ALL OK", flush=True)


if __name__ == "__main__":
    main()
