"""On-chip validation of the COMPLEX family (run on the real TPU).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_complex.py
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
    from linalg_solver_tpu.ops import complexlin as cx
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    rng = np.random.RandomState(0)

    # ------------- complex solve via the embedding, 64x(128x128) -----
    sect("solve_complex 64x(128x128)")
    B, n = 64, 128
    A = (rng.randn(B, n, n) + 1j * rng.randn(B, n, n)) / np.sqrt(n)
    A += 2 * np.eye(n)
    b = rng.randn(B, n) + 1j * rng.randn(B, n)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    br = jnp.asarray(b.real.astype(np.float32))
    bi = jnp.asarray(b.imag.astype(np.float32))
    t0 = time.time()
    xr, xi = jax.block_until_ready(
        cx.solve_complex_batched(Ar, Ai, br, bi)
    )
    print(f"first call (incl. compile): {time.time()-t0:.1f}s")
    x = np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64)
    res = np.abs(
        np.einsum("bij,bj->bi", A.astype(np.complex128), x) - b
    ).max() / np.abs(b).max()
    print("residual (f64-host):", res)
    dt = device_slope_time(
        lambda a1, a2: cx.solve_complex_batched(a1, a2, br, bi)[0],
        Ar, Ai,
    )
    print(f"per-call: {dt*1e3:.2f} ms")

    # ------------- complex eigh 32x(128x128) --------------------------
    sect("eigh_complex 32x(128x128)")
    B, n = 32, 128
    G = rng.randn(B, n, n) + 1j * rng.randn(B, n, n)
    H = (G + G.conj().transpose(0, 2, 1)) / 2
    Hr = jnp.asarray(H.real.astype(np.float32))
    Hi = jnp.asarray(H.imag.astype(np.float32))
    t0 = time.time()
    r = cx.eigh_complex_batched(Hr, Hi)
    jax.block_until_ready(r.w)
    print(f"first call: {time.time()-t0:.1f}s  ok: "
          f"{int(np.asarray(r.ok).sum())}/{B}")
    w = np.asarray(r.w, np.float64)
    V = (np.asarray(r.v_re, np.float64)
         + 1j * np.asarray(r.v_im, np.float64))
    errs = [
        np.abs(H[b] @ V[b] - V[b] * w[b][None, :]).max()
        / np.abs(w[b]).max()
        for b in range(B)
    ]
    dev = max(
        np.abs(w[b] - np.linalg.eigvalsh(H[b])).max() for b in range(B)
    )
    print("max rel eig-residual:", max(errs), " eig dev vs f64:", dev)
    t0 = time.time()
    r = cx.eigh_complex_batched(Hr, Hi)
    jax.block_until_ready(r.w)
    print(f"warm wall: {time.time()-t0:.2f}s")

    # ------------- complex general eig 16x(64x64) ---------------------
    sect("eig_complex 16x(64x64)")
    B, n = 16, 64
    A = (rng.randn(B, n, n) + 1j * rng.randn(B, n, n)) / np.sqrt(n)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    t0 = time.time()
    g = cx.eig_complex_batched(Ar, Ai)
    print(f"wall (incl. compile): {time.time()-t0:.1f}s  ok: "
          f"{int(np.asarray(g.ok).sum())}/{B}")
    lam = (np.asarray(g.real, np.float64)
           + 1j * np.asarray(g.imag, np.float64))
    dev = 0.0
    for b in range(B):
        want = list(np.linalg.eigvals(A[b].astype(np.complex128)))
        for l in lam[b]:
            j = int(np.argmin(np.abs(np.array(want) - l)))
            dev = max(dev, abs(want[j] - l))
            want.pop(j)
    print("eig dev vs f64 (nearest-match):", dev)

    # ------------- complex SVD 32x(128x64) ----------------------------
    sect("svd_complex 32x(128x64)")
    B, m, n = 32, 128, 64
    A = (rng.randn(B, m, n) + 1j * rng.randn(B, m, n)) / np.sqrt(n)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    t0 = time.time()
    s = cx.svd_complex_batched(Ar, Ai)
    print(f"wall (incl. compile): {time.time()-t0:.1f}s  ok: "
          f"{int(np.asarray(s.ok).sum())}/{B}")
    sv = np.asarray(s.s, np.float64)
    want = np.linalg.svd(A.astype(np.complex128), compute_uv=False)
    print("sigma dev:", np.abs(sv - want).max())
    U = (np.asarray(s.u_re, np.float64)
         + 1j * np.asarray(s.u_im, np.float64))
    V = (np.asarray(s.v_re, np.float64)
         + 1j * np.asarray(s.v_im, np.float64))
    recon = max(
        np.abs((U[b] * sv[b]) @ V[b].conj().T - A[b]).max()
        for b in range(B)
    )
    print("recon err:", recon)

    # ------------- complex expm 32x(128x128) --------------------------
    sect("expm_complex 32x(128x128)")
    B, n = 32, 128
    A = (rng.randn(B, n, n) + 1j * rng.randn(B, n, n)) / np.sqrt(n)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    t0 = time.time()
    er, ei, ok = cx.expm_complex_batched(Ar, Ai)
    jax.block_until_ready(er)
    print(f"first call: {time.time()-t0:.1f}s  ok: "
          f"{int(np.asarray(ok).sum())}/{B}")
    import scipy.linalg as sla

    E = np.asarray(er, np.float64) + 1j * np.asarray(ei, np.float64)
    err = max(np.abs(E[b] - sla.expm(A[b])).max() for b in range(4))
    print("expm err vs scipy (4 lanes):", err)
    dt = device_slope_time(
        lambda a1, a2: cx.expm_complex_batched(a1, a2)[0], Ar, Ai
    )
    print(f"per-call: {dt*1e3:.2f} ms")

    # ------------- complex QR + cholesky 64x(256x128) -----------------
    sect("qr_complex 64x(256x128)")
    B, m, n = 64, 256, 128
    A = (rng.randn(B, m, n) + 1j * rng.randn(B, m, n)) / np.sqrt(m)
    Ar = jnp.asarray(A.real.astype(np.float32))
    Ai = jnp.asarray(A.imag.astype(np.float32))
    t0 = time.time()
    q = cx.qr_complex_batched(Ar, Ai)
    jax.block_until_ready(q.q_re)
    print(f"first call: {time.time()-t0:.1f}s  ok: "
          f"{int(np.asarray(q.ok).sum())}/{B}")
    Q = (np.asarray(q.q_re, np.float64)
         + 1j * np.asarray(q.q_im, np.float64))
    R = (np.asarray(q.r_re, np.float64)
         + 1j * np.asarray(q.r_im, np.float64))
    orth = max(
        np.abs(Q[b].conj().T @ Q[b] - np.eye(n)).max() for b in range(B)
    )
    recon = max(np.abs(Q[b] @ R[b] - A[b]).max() for b in range(B))
    print("orth:", orth, " recon:", recon)
    dt = device_slope_time(
        lambda a1, a2: cx.qr_complex_batched(a1, a2)[0], Ar, Ai
    )
    print(f"per-call: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
