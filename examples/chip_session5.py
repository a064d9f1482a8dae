"""On-chip validation of the session-5 families (run on the real TPU).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_session5.py
"""

import time

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

    # ---------------- circulant: exact FFT solve at scale ------------
    sect("circulant_solve 64x4096")
    from linalg_solver_tpu.ops.structured import (
        circulant_dense_batched,
        circulant_solve_batched,
        vandermonde_dense_batched,
        vandermonde_solve_batched,
    )

    rng = np.random.RandomState(0)
    B, n = 64, 4096
    c = (rng.randn(B, n) * np.exp(-0.002 * np.arange(n))).astype(
        np.float32
    )
    c[:, 0] += 5.0
    b = rng.randn(B, n).astype(np.float32)
    cj, bj = jnp.asarray(c), jnp.asarray(b)
    f = jax.jit(lambda c, b: circulant_solve_batched(c, b).x)
    x = np.asarray(f(cj, bj), np.float64)
    t = device_slope_time(f, cj, bj, i1=3, i2=13, repeats=2)
    # residual via the matvec identity in f64 on host
    Cf = np.fft.fft(c.astype(np.float64))
    r = np.fft.ifft(Cf * np.fft.fft(x)).real - b
    rel = np.linalg.norm(r) / np.linalg.norm(b)
    print(f"t={t*1e3:.3f} ms/call  resid={rel:.2e}")

    # ---------------- vandermonde BP at scale ------------------------
    sect("vandermonde_solve 256x12")
    # n is bounded by conditioning, not compute: the monomial-basis
    # coefficients grow exponentially in n (O(1) interp residuals by
    # n=24 — same on CPU, pure conditioning; f32 overflow past n≈30,
    # flagged ok=False and regression-tested).
    B, n = 256, 12
    base = np.cos(np.pi * (np.arange(n) + 0.5) / n)
    xs = np.sort(
        base[None] + 0.02 * rng.randn(B, n) / n, axis=1
    ).astype(np.float32)
    fs = rng.randn(B, n).astype(np.float32)
    xj, fj = jnp.asarray(xs), jnp.asarray(fs)
    g = jax.jit(lambda x, f: vandermonde_solve_batched(x, f).x)
    a = np.asarray(g(xj, fj), np.float64)
    t = device_slope_time(g, xj, fj, i1=3, i2=13, repeats=2)
    V = np.asarray(vandermonde_dense_batched(xj), np.float64)
    rel = (
        np.linalg.norm(np.einsum("bij,bj->bi", V, a) - fs)
        / np.linalg.norm(fs)
    )
    print(f"t={t*1e3:.3f} ms/call  interp resid={rel:.2e}")

    # ---------------- Arnoldi on chip --------------------------------
    sect("eigs_arnoldi 8x512 k=4 LM")
    from linalg_solver_tpu.ops.arnoldi import eigs_arnoldi_batched

    B, n = 8, 512
    lams = np.sort(rng.rand(B, n) * 10, axis=1)[:, ::-1].copy()
    lams[:, :4] += np.array([8.0, 6.0, 4.0, 2.0])
    Q, _ = np.linalg.qr(rng.randn(B, n, n))
    A = np.einsum("bij,bj,bkj->bik", Q, lams, Q).astype(np.float32)
    t0 = time.time()
    res = eigs_arnoldi_batched(jnp.asarray(A), 4, which="LM",
                               max_restarts=30)
    wall = time.time() - t0
    err = np.abs(np.asarray(res.real) - lams[:, :4]).max()
    print(
        f"wall={wall:.1f}s restarts={res.restarts} "
        f"conv={bool(np.asarray(res.converged).all())} "
        f"eig err={err:.2e} resid={np.asarray(res.resid).max():.2e}"
    )

    # ---------------- expm_multiply at scale -------------------------
    sect("expm_multiply 64x256")
    from linalg_solver_tpu.ops.funm import expm_multiply_batched

    B, n = 64, 256
    A = (rng.randn(B, n, n) / np.sqrt(n)).astype(np.float32)
    v = rng.randn(B, n).astype(np.float32)
    aj, vj = jnp.asarray(A), jnp.asarray(v)
    h = jax.jit(lambda a, v: expm_multiply_batched(a, v).x)
    x = np.asarray(h(aj, vj))
    t = device_slope_time(h, aj, vj, i1=3, i2=13, repeats=2)
    from scipy.linalg import expm as sexpm

    want = sexpm(A[0].astype(np.float64)) @ v[0]
    rel = np.linalg.norm(x[0] - want) / np.linalg.norm(want)
    print(f"t={t*1e3:.3f} ms/call  lane-0 resid={rel:.2e}")

    # ---------------- shifted pencil + quadeig -----------------------
    sect("quadeig 32x32 (singular mass)")
    from linalg_solver_tpu.ops.quadeig import quadeig_batched

    B, n = 32, 32
    mm = rng.rand(B, n).astype(np.float32) + 0.5
    mm[:, 0] = 0.0  # singular mass row per lane
    M = np.einsum("bi,ij->bij", mm, np.eye(n)).astype(np.float32)
    C = (rng.randn(B, n, n) * 0.1 + 2 * np.eye(n)).astype(np.float32)
    K = (rng.randn(B, n, n) * 0.1 + 4 * np.eye(n)).astype(np.float32)
    t0 = time.time()
    res = quadeig_batched(jnp.asarray(M), jnp.asarray(C),
                          jnp.asarray(K))
    wall = time.time() - t0
    fin = np.asarray(res.finite)
    print(
        f"wall={wall:.1f}s ok={bool(np.asarray(res.ok).all())} "
        f"finite/lane={fin.sum(axis=1).min()}–{fin.sum(axis=1).max()} "
        f"(want {2 * n - 1}) resid={np.asarray(res.resid).max():.2e}"
    )


if __name__ == "__main__":
    main()
