"""On-chip validation of the session-7 families (run on the real TPU).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_session7.py
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def sect(name):
    print(f"\n=== {name} ===", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    rng = np.random.RandomState(0)

    # ---------------- MINRES on symmetric indefinite ------------------
    sect("minres 16x(512x512) indefinite")
    from linalg_solver_tpu.ops.krylov import lsqr_batched, minres_batched

    B, n = 16, 512
    Q, _ = np.linalg.qr(rng.randn(B, n, n))
    w = np.linspace(1.0, 9.0, n)
    w[::2] *= -1.0
    A = np.einsum("bik,k,bjk->bij", Q, w, Q).astype(np.float32)
    b = rng.randn(B, n).astype(np.float32)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)
    f = jax.jit(lambda a, b: minres_batched(a, b).x)
    x = np.asarray(f(Aj, bj), np.float64)
    t = device_slope_time(f, Aj, bj, i1=2, i2=6, repeats=2)
    r = np.einsum("bij,bj->bi", A.astype(np.float64), x) - b
    rel = (np.linalg.norm(r, axis=1) / np.linalg.norm(b, axis=1)).max()
    print(f"minres: {t*1e3:.2f} ms/call, f64 resid {rel:.2e}")

    # ---------------- LSQR tall least squares -------------------------
    sect("lsqr 32x(2048x256)")
    B, m, n = 32, 2048, 256
    A = (rng.randn(B, m, n) / np.sqrt(m)).astype(np.float32)
    b = rng.randn(B, m).astype(np.float32)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)
    f = jax.jit(lambda a, b: lsqr_batched(a, b).x)
    x = np.asarray(f(Aj, bj), np.float64)
    t = device_slope_time(f, Aj, bj, i1=2, i2=6, repeats=2)
    atr = np.einsum(
        "bij,bi->bj", A.astype(np.float64),
        np.einsum("bij,bj->bi", A.astype(np.float64), x) - b,
    )
    print(f"lsqr: {t*1e3:.2f} ms/call, max|A^T r| {np.abs(atr).max():.2e}")

    # ---------------- Sturm tridiagonal eigensolver -------------------
    sect("eigh_tridiagonal 256x4096")
    from linalg_solver_tpu.ops.sturm import (
        eigh_tridiagonal_batched,
        tridiag_eigenvectors_batched,
    )

    B, n = 256, 4096
    d = rng.randn(B, n).astype(np.float32)
    e = rng.randn(B, n - 1).astype(np.float32)
    dj, ej = jnp.asarray(d), jnp.asarray(e)
    f = jax.jit(lambda d, e: eigh_tridiagonal_batched(d, e).w)
    wj = f(dj, ej)
    t = device_slope_time(f, dj, ej, i1=2, i2=6, repeats=2)
    import scipy.linalg

    want = scipy.linalg.eigh_tridiagonal(
        d[0].astype(np.float64), e[0].astype(np.float64),
        eigvals_only=True,
    )
    err = np.abs(np.asarray(wj[0], np.float64) - want).max()
    print(f"sturm eigvals: {t*1e3:.2f} ms/call for {B}x{n}, "
          f"lane0 max err {err:.2e}")

    sect("twisted-factorization vectors 32x512")
    B, n = 32, 512
    d = rng.randn(B, n).astype(np.float32)
    e = rng.randn(B, n - 1).astype(np.float32)
    dj, ej = jnp.asarray(d), jnp.asarray(e)
    wj = eigh_tridiagonal_batched(dj, ej).w
    g = jax.jit(
        lambda d, e, w: tridiag_eigenvectors_batched(d, e, w).resid
    )
    resid = np.asarray(g(dj, ej, wj))
    t = device_slope_time(g, dj, ej, wj, i1=2, i2=6, repeats=2)
    print(f"getvec: {t*1e3:.2f} ms/call, resid max {resid.max():.2e} "
          f"p99 {np.percentile(resid, 99):.2e}")

    # ---------------- pseudospectra grid ------------------------------
    sect("pseudospectrum 8x(128x128) on a 32x32 grid")
    from linalg_solver_tpu.ops.pseudospectra import (
        pseudospectrum_grid_batched,
    )

    B, n = 8, 128
    A = rng.randn(B, n, n).astype(np.float32) / np.sqrt(n)
    import time

    t0 = time.time()
    res = pseudospectrum_grid_batched(
        jnp.asarray(A),
        jnp.linspace(-2, 2, 32, dtype=np.float32),
        jnp.linspace(-2, 2, 32, dtype=np.float32),
    )
    sig = np.asarray(res.sigmin)
    t1 = time.time()
    z = -0.5 + 0.25j
    want = np.linalg.svd(
        A[0].astype(np.float64) - z * np.eye(n), compute_uv=False
    )[-1]
    ii = np.argmin(np.abs(np.linspace(-2, 2, 32) - z.imag))
    jj = np.argmin(np.abs(np.linspace(-2, 2, 32) - z.real))
    print(f"grid wall {t1-t0:.1f}s (incl. Schur + compile), "
          f"spot vs f64 svd: {sig[0, ii, jj]:.5f} vs {want:.5f}")

    # ---------------- kron + kronsum ----------------------------------
    sect("kron_solve (256 (x) 256) and 2-D Laplacian kronsum")
    from linalg_solver_tpu.ops.kron import (
        kron_solve_batched,
        kronsum_solve_batched,
    )

    B, m = 4, 256
    A = (rng.randn(B, m, m) + m * np.eye(m)).astype(np.float32)
    Bm = (rng.randn(B, m, m) + m * np.eye(m)).astype(np.float32)
    c = rng.randn(B, m * m).astype(np.float32)
    f = jax.jit(kron_solve_batched)
    x = f(jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(c))
    t = device_slope_time(
        f, jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(c),
        i1=2, i2=6, repeats=2,
    )
    # residual via the kron matvec identity in f64
    X = np.asarray(x, np.float64).reshape(B, m, m)
    R = np.einsum("bij,bjk,blk->bil", A.astype(np.float64), X,
                  Bm.astype(np.float64)) - c.reshape(B, m, m)
    rel = np.abs(R).max() / np.abs(c).max()
    print(f"kron_solve 65536-dim system: {t*1e3:.2f} ms/call, "
          f"resid {rel:.2e}")

    def trid(n):
        return (2 * np.eye(n) - np.eye(n, k=1)
                - np.eye(n, k=-1)).astype(np.float32)

    m = 128
    T = trid(m)[None].repeat(4, 0)
    c = rng.randn(4, m * m).astype(np.float32)
    res = kronsum_solve_batched(
        jnp.asarray(T), jnp.asarray(T), jnp.asarray(c)
    )
    X = np.asarray(res.x, np.float64).reshape(4, m, m)
    T64 = T[0].astype(np.float64)
    R = (np.einsum("ij,bjk->bik", T64, X)
         + np.einsum("bik,jk->bij", X, T64)) - c.reshape(4, m, m)
    print(f"kronsum 2-D Laplacian (16384-dim): ok={np.asarray(res.ok)}, "
          f"resid {np.abs(R).max() / np.abs(c).max():.2e}")

    # ---------------- nearness ----------------------------------------
    sect("nearest_correlation 64x(128x128)")
    from linalg_solver_tpu.ops.nearness import (
        nearest_correlation_batched,
    )

    G = rng.randn(64, 128, 40).astype(np.float32)
    C = np.einsum("bij,bkj->bik", G, G)
    dd = np.sqrt(np.einsum("bii->bi", C))
    C = (C / (dd[:, :, None] * dd[:, None, :])).astype(np.float32)
    C = C + 0.3 * rng.randn(64, 128, 128).astype(np.float32)  # corrupt
    f = jax.jit(lambda a: nearest_correlation_batched(a).x)
    x = np.asarray(f(jnp.asarray(C)), np.float64)
    t = device_slope_time(f, jnp.asarray(C), i1=2, i2=6, repeats=2)
    wmin = min(np.linalg.eigvalsh(x[i]).min() for i in range(0, 64, 16))
    diag = np.abs(np.einsum("bii->bi", x) - 1).max()
    print(f"nearest_corr: {t*1e3:.2f} ms/call, min eig {wmin:.2e}, "
          f"diag defect {diag:.2e}")

    print("\nALL SESSION-7 FAMILIES VALIDATED ON CHIP", flush=True)


if __name__ == "__main__":
    main()
