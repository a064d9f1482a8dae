"""Tour of the batched dense solver family (runs on CPU or TPU).

    PYTHONPATH=/root/repo python examples/solver_family.py

Every op is batched over the leading axis, jitted, and runs under the
framework's f32 matmul-precision contract; each section prints a
residual or cross-check so the output doubles as a smoke test.
"""

from __future__ import annotations

import sys

import numpy as np

import jax

if "--cpu" in sys.argv:
    # This image preimports jax with the TPU-tunnel platform; env vars
    # are too late — go through jax.config before first backend use.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main() -> None:
    from linalg_solver_tpu.ops import (
        cholesky_solve_batched,
        cond2_batched,
        eig_generalized_batched,
        eigh_batched,
        expm_batched,
        lstsq_batched,
        lyapunov_batched,
        pinv_batched,
        qr_batched,
        rcond_batched,
        svd_batched,
        tridiag_solve_batched,
    )
    from linalg_solver_tpu.ops.exact_int import crt_solve_batched

    rng = np.random.RandomState(0)
    B, n = 4, 32

    # --- square solves with a trust gate -------------------------------
    A = (rng.randn(B, n, n) + 3 * np.sqrt(n) * np.eye(n)).astype(
        np.float32
    )
    b = rng.randn(B, n).astype(np.float32)
    rc = np.asarray(rcond_batched(jnp.asarray(A)))
    print("rcond (1-norm):", np.round(rc, 4), "— all trustworthy")

    # --- least squares / QR / SVD / pinv ------------------------------
    At = rng.randn(B, 3 * n, n).astype(np.float32)
    bt = rng.randn(B, 3 * n).astype(np.float32)
    ls = lstsq_batched(jnp.asarray(At), jnp.asarray(bt))
    print("lstsq residual norms:", np.round(np.asarray(ls.resid), 3))
    qr = qr_batched(jnp.asarray(At))
    print(
        "QR reconstruction err:",
        float(
            jnp.max(
                jnp.abs(qr.Q @ qr.R - jnp.asarray(At))
            )
        ),
    )
    sv = svd_batched(jnp.asarray(A))
    print("cond_2:", np.round(np.asarray(cond2_batched(jnp.asarray(A))), 2))
    P = pinv_batched(jnp.asarray(At))
    print("pinv shape:", P.shape)
    del sv

    # --- SPD fast path -------------------------------------------------
    G = rng.randn(B, n, n).astype(np.float32)
    S = np.einsum("bik,bjk->bij", G, G) + np.eye(n, dtype=np.float32)
    x_spd, ok = cholesky_solve_batched(jnp.asarray(S), jnp.asarray(b))
    resid = np.abs(
        np.einsum("bij,bj->bi", S, np.asarray(x_spd)) - b
    ).max()
    print("SPD cholesky solve ok:", bool(np.asarray(ok).all()),
          "resid:", float(resid))
    w, V, _ = eigh_batched(jnp.asarray(S))
    print("eigh smallest eigenvalues:", np.round(np.asarray(w)[:, 0], 3))

    # --- tridiagonal (parallel cyclic reduction) -----------------------
    dl = rng.randn(B, n).astype(np.float32)
    du = rng.randn(B, n).astype(np.float32)
    d = (np.abs(dl) + np.abs(du) + 1).astype(np.float32)
    tri = tridiag_solve_batched(
        jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du), jnp.asarray(b)
    )
    print("tridiag ok:", bool(np.asarray(tri.ok).all()))

    # --- matrix equations / functions ----------------------------------
    stab = (rng.randn(B, n, n) - 3 * np.sqrt(n) * np.eye(n)).astype(
        np.float32
    )
    Q = S  # any symmetric RHS
    lyap = lyapunov_batched(jnp.asarray(stab), jnp.asarray(-Q))
    print("lyapunov ok:", bool(np.asarray(lyap.ok).all()))
    E = expm_batched(jnp.asarray(stab * 0.1))
    print("expm finite:", bool(np.isfinite(np.asarray(E)).all()))

    # --- generalized eigenproblem --------------------------------------
    ge = eig_generalized_batched(jnp.asarray(A), jnp.asarray(S))
    print("generalized eig ok:", bool(np.asarray(ge.ok).all()),
          "rcond(B):", np.round(np.asarray(ge.rcond_b), 4))

    # --- roots / randomized SVD / complex -------------------------------
    from linalg_solver_tpu.ops import (
        randomized_svd_batched,
        roots_batched,
        solve_complex_batched,
    )

    coeffs = np.array([[1.0, -6.0, 11.0, -6.0]], np.float32)
    rr = roots_batched(jnp.asarray(coeffs))
    print("roots of (x-1)(x-2)(x-3):",
          np.round(np.sort(np.asarray(rr.real)[0]), 4))
    low = (rng.randn(B, n, 4) @ rng.randn(B, 4, n)).astype(np.float32)
    rs = randomized_svd_batched(jnp.asarray(low), k=4)
    print("rsvd rank-4 resid_est:",
          float(np.asarray(rs.resid_est).max()))
    Zr = rng.randn(B, 8, 8).astype(np.float32) + 8 * np.eye(
        8, dtype=np.float32
    )
    Zi = rng.randn(B, 8, 8).astype(np.float32)
    br_ = rng.randn(B, 8).astype(np.float32)
    bi_ = rng.randn(B, 8).astype(np.float32)
    xr, xi = solve_complex_batched(
        jnp.asarray(Zr), jnp.asarray(Zi), jnp.asarray(br_),
        jnp.asarray(bi_),
    )
    Zc = Zr + 1j * Zi
    xc = np.asarray(xr) + 1j * np.asarray(xi)
    rc_ = np.abs(
        np.einsum("bij,bj->bi", Zc, xc) - (br_ + 1j * bi_)
    ).max()
    print("complex solve resid:", float(rc_))

    # --- general matrix functions (non-SPD) -----------------------------
    from linalg_solver_tpu.ops import logm_batched, sqrtm_batched

    Apos = (rng.randn(B, n, n) + 3 * np.sqrt(n) * np.eye(n)).astype(
        np.float32
    )
    sq = sqrtm_batched(jnp.asarray(Apos))
    sq_err = float(
        jnp.max(jnp.abs(sq.Y @ sq.Y - jnp.asarray(Apos)))
    )
    print("general sqrtm Y@Y err:", sq_err,
          "conv:", bool(np.asarray(sq.converged).all()))
    lg = logm_batched(jnp.asarray(Apos))
    print("general logm roots per lane:", np.asarray(lg.roots))

    # --- iterative family: CG / GMRES / LOBPCG / Toeplitz ---------------
    from linalg_solver_tpu.ops import (
        cg_batched,
        gmres_batched,
        lobpcg_batched,
        toeplitz_solve_batched,
    )

    cgr = cg_batched(jnp.asarray(S), jnp.asarray(b), tol=1e-5)
    print("CG converged:", bool(np.asarray(cgr.converged).all()),
          "resid:", float(np.asarray(cgr.resnorm).max()))
    gm = gmres_batched(jnp.asarray(A), jnp.asarray(b), tol=1e-5)
    print("GMRES converged:", bool(np.asarray(gm.converged).all()))
    lp = lobpcg_batched(jnp.asarray(S), k=3, tol=1e-4)
    print("LOBPCG smallest eigenvalues:",
          np.round(np.asarray(lp.w)[0], 3))
    decay = np.exp(-0.5 * np.arange(n)).astype(np.float32)
    ct = (rng.randn(B, n) * decay).astype(np.float32)
    rt = (rng.randn(B, n) * decay).astype(np.float32)
    ct[:, 0] += 4.0
    rt[:, 0] = ct[:, 0]
    tp = toeplitz_solve_batched(
        jnp.asarray(ct), jnp.asarray(rt), jnp.asarray(b), tol=1e-5
    )
    print("Toeplitz (FFT+GMRES) converged:",
          bool(np.asarray(tp.converged).all()))

    # --- banded (block cyclic reduction) --------------------------------
    from linalg_solver_tpu.ops import banded_solve_batched

    kb = 3
    ab = rng.randn(B, 2 * kb + 1, n).astype(np.float32)
    ab[:, kb] += 4.0 * (2 * kb + 1)
    bd = banded_solve_batched(jnp.asarray(ab), jnp.asarray(b), kb=kb)
    print("banded ok:", bool(np.asarray(bd.ok).all()))

    # --- numpy.linalg-shaped namespace ----------------------------------
    from linalg_solver_tpu import linalg as tla

    x_np = tla.solve(jnp.asarray(A), jnp.asarray(b))
    print("tla.solve shape:", x_np.shape,
          "det sign:", np.sign(np.asarray(tla.det(jnp.asarray(A)))))

    # --- exact rational solve (device residues + host CRT) -------------
    Ai = rng.randint(-9, 10, (2, 6, 6)).astype(np.int32)
    bi = rng.randint(-9, 10, (2, 6)).astype(np.int32)
    xs, dets = crt_solve_batched(Ai, bi)
    print("exact dets:", dets)
    print("exact x[0][0] =", xs[0][0] if xs[0] else None)


if __name__ == "__main__":
    main()
