"""Reverse-mode differentiation of the factorization family.

``eigh_batched`` / ``svd_batched`` / ``qr_batched`` /
``cholesky_batched`` carry custom VJPs with the classical adjoints
(the primals run QDWH / CholeskyQR2 / XLA eigh iterations that are
expensive or impossible to reverse-differentiate by unrolling):

- eigh:     ``Ā = sym(V (diag(w̄) + F ∘ (VᵀV̄)) Vᵀ)``,
            ``F_ij = 1/(w_j − w_i)``
- svd:      Townsend's thin-SVD adjoint (V square — no right
            null-space term; left term present for m > n)
- qr:       ``Ā = (Q̄ + Q·copyltu(R R̄ᵀ − Q̄ᵀQ)) R⁻ᵀ``
- cholesky: Murray's ``Ā = sym(L⁻ᵀ Φ(Lᵀ L̄) L⁻¹)``

Oracles: analytic formulas and central finite differences, both in
numpy float64 through numpy's own factorizations (sign-canonicalized
to match this framework's conventions where needed).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops import lstsq, spd, svd, symmetric


def _fd_grad(f, A, eps=1e-6):
    g = np.zeros_like(A)
    for idx in np.ndindex(*A.shape):
        Ap = A.copy(); Ap[idx] += eps
        Am = A.copy(); Am[idx] -= eps
        g[idx] = (f(Ap) - f(Am)) / (2 * eps)
    return g


class TestEighVJP:
    def test_eigenvalue_grad_analytic(self):
        """∂(Σ c_i w_i)/∂A = sym(V diag(c) Vᵀ)."""
        rng = np.random.RandomState(0)
        B, n = 3, 12
        M = rng.randn(B, n, n).astype(np.float32)
        A = M + np.swapaxes(M, 1, 2) + 3 * np.arange(n, dtype=np.float32) * np.eye(n, dtype=np.float32)
        c = rng.randn(B, n).astype(np.float32)

        def f(a_):
            r = symmetric.eigh_batched(a_)
            return jnp.sum(jnp.asarray(c) * r.w)

        ga = np.asarray(jax.grad(f)(jnp.asarray(A)), np.float64)
        for i in range(B):
            w, V = np.linalg.eigh(A[i].astype(np.float64))
            want = V @ np.diag(c[i].astype(np.float64)) @ V.T
            want = 0.5 * (want + want.T)
            np.testing.assert_allclose(ga[i], want, rtol=3e-4, atol=3e-5)

    def test_eigenvector_grad_fd(self):
        """Generic functional of (w, V) vs f64 finite differences."""
        rng = np.random.RandomState(1)
        n = 8
        M = rng.randn(n, n)
        A = (M + M.T + np.diag(4.0 * np.arange(n))).astype(np.float32)
        Gw = rng.randn(n).astype(np.float32)
        GV = rng.randn(n, n).astype(np.float32)

        def canon(V):
            s = np.sign(V[np.argmax(np.abs(V), axis=0), np.arange(n)])
            return V * np.where(s == 0, 1.0, s)[None, :]

        def f64(A_):
            w, V = np.linalg.eigh((A_ + A_.T) / 2)
            return float(Gw.astype(np.float64) @ w
                         + (GV.astype(np.float64) * canon(V)).sum())

        def f32(a_):
            r = symmetric.eigh_batched(a_[None])
            V = r.V[0]
            idx = jnp.argmax(jnp.abs(V), axis=0)
            s = jnp.sign(V[idx, jnp.arange(n)])
            V = V * jnp.where(s == 0, 1.0, s)[None, :]
            return jnp.sum(jnp.asarray(Gw) * r.w[0]) + jnp.sum(
                jnp.asarray(GV) * V
            )

        ga = np.asarray(jax.grad(f32)(jnp.asarray(A)), np.float64)
        fd = _fd_grad(f64, A.astype(np.float64))
        np.testing.assert_allclose(ga, fd, rtol=2e-3, atol=2e-3)

    def test_degenerate_pair_finite(self):
        """Repeated eigenvalues: w-gradients stay exact, no NaN/Inf."""
        rng = np.random.RandomState(2)
        n = 6
        Q, _ = np.linalg.qr(rng.randn(n, n))
        w = np.array([1.0, 1.0, 2.0, 3.0, 4.0, 5.0])
        A = (Q @ np.diag(w) @ Q.T).astype(np.float32)

        def f(a_):
            r = symmetric.eigh_batched(a_[None])
            return jnp.sum(r.w) + jnp.sum(r.V)

        ga = np.asarray(jax.grad(f)(jnp.asarray(A)))
        assert np.isfinite(ga).all()


class TestSVDVJP:
    def test_singular_value_grad_analytic(self):
        """∂(Σ c_i s_i)/∂A = U diag(c) Vᵀ, tall and wide."""
        rng = np.random.RandomState(3)
        for (m, n) in [(12, 7), (7, 12), (9, 9)]:
            B = 2
            A = rng.randn(B, m, n).astype(np.float32)
            k = min(m, n)
            c = rng.randn(B, k).astype(np.float32)

            def f(a_):
                r = svd.svd_batched(a_)
                return jnp.sum(jnp.asarray(c) * r.s)

            ga = np.asarray(jax.grad(f)(jnp.asarray(A)), np.float64)
            for i in range(B):
                U, s, Vt = np.linalg.svd(
                    A[i].astype(np.float64), full_matrices=False
                )
                want = U @ np.diag(c[i].astype(np.float64)) @ Vt
                np.testing.assert_allclose(
                    ga[i], want, rtol=1e-3, atol=2e-4
                )

    def test_projector_grad_fd(self):
        """Sign-invariant functional Σ G ∘ (UUᵀ) vs f64 FD (exercises
        the F-coupling AND the left null-space term, m > n)."""
        rng = np.random.RandomState(4)
        m, n = 9, 5
        A = (rng.randn(m, n) + 3 * np.eye(m, n)).astype(np.float32)
        G = rng.randn(m, m).astype(np.float32)
        G = G + G.T

        def f64(A_):
            U, s, Vt = np.linalg.svd(A_, full_matrices=False)
            return float((G.astype(np.float64) * (U @ U.T)).sum())

        def f32(a_):
            r = svd.svd_batched(a_[None])
            U = r.U[0]
            return jnp.sum(jnp.asarray(G) * (U @ U.T))

        ga = np.asarray(jax.grad(f32)(jnp.asarray(A)), np.float64)
        fd = _fd_grad(f64, A.astype(np.float64))
        np.testing.assert_allclose(ga, fd, rtol=2e-3, atol=2e-3)


class TestQRVJP:
    def test_qr_grad_fd(self):
        """Σ Gq∘Q + Gr∘R vs f64 FD through positive-diagonal QR."""
        rng = np.random.RandomState(5)
        m, n = 10, 6
        A = (rng.randn(m, n) + 2 * np.eye(m, n)).astype(np.float32)
        Gq = rng.randn(m, n).astype(np.float32)
        Gr = np.triu(rng.randn(n, n)).astype(np.float32)

        def f64(A_):
            Q, R = np.linalg.qr(A_)
            sg = np.sign(np.diag(R)); sg = np.where(sg == 0, 1.0, sg)
            Q, R = Q * sg[None, :], R * sg[:, None]
            return float((Gq.astype(np.float64) * Q).sum()
                         + (Gr.astype(np.float64) * R).sum())

        def f32(a_):
            r = lstsq.qr_batched(a_[None])
            return jnp.sum(jnp.asarray(Gq) * r.Q[0]) + jnp.sum(
                jnp.asarray(Gr) * r.R[0]
            )

        ga = np.asarray(jax.grad(f32)(jnp.asarray(A)), np.float64)
        fd = _fd_grad(f64, A.astype(np.float64))
        np.testing.assert_allclose(ga, fd, rtol=2e-3, atol=2e-3)

    def test_lstsq_solution_grad_chain(self):
        """Gradient flows through qr_batched into downstream algebra."""
        rng = np.random.RandomState(6)
        A = (rng.randn(2, 8, 4) + 2 * np.eye(8, 4)).astype(np.float32)

        def f(a_):
            r = lstsq.qr_batched(a_)
            return jnp.sum(r.R ** 2)  # = Σ ‖A‖_F² for exact QR

        ga = np.asarray(jax.grad(f)(jnp.asarray(A)), np.float64)
        # d(‖A‖_F²)/dA = 2A
        np.testing.assert_allclose(
            ga, 2 * A.astype(np.float64), rtol=2e-3, atol=2e-3
        )


class TestCholeskyVJP:
    def test_cholesky_grad_fd(self):
        rng = np.random.RandomState(7)
        n = 7
        M = rng.randn(n, n)
        A = (M @ M.T + n * np.eye(n)).astype(np.float32)
        G = np.tril(rng.randn(n, n)).astype(np.float32)

        def f64(A_):
            L = np.linalg.cholesky((A_ + A_.T) / 2)
            return float((G.astype(np.float64) * L).sum())

        def f32(a_):
            r = spd.cholesky_batched(a_[None])
            return jnp.sum(jnp.asarray(G) * r.L[0])

        ga = np.asarray(jax.grad(f32)(jnp.asarray(A)), np.float64)
        fd = _fd_grad(f64, A.astype(np.float64))
        np.testing.assert_allclose(ga, fd, rtol=2e-3, atol=2e-3)

    def test_logdet_via_cholesky(self):
        """∂ logdet/∂A = sym(A⁻¹) through 2·Σ log diag(L)."""
        rng = np.random.RandomState(8)
        B, n = 2, 9
        M = rng.randn(B, n, n)
        A = (np.einsum("bij,bkj->bik", M, M) + n * np.eye(n)).astype(
            np.float32
        )

        def f(a_):
            r = spd.cholesky_batched(a_)
            return jnp.sum(
                2.0 * jnp.log(jnp.diagonal(r.L, axis1=1, axis2=2))
            )

        ga = np.asarray(jax.grad(f)(jnp.asarray(A)), np.float64)
        for i in range(B):
            inv = np.linalg.inv(A[i].astype(np.float64))
            np.testing.assert_allclose(
                ga[i], 0.5 * (inv + inv.T), rtol=1e-3, atol=1e-5
            )

    def test_grads_under_jit_and_vmap_shapes(self):
        rng = np.random.RandomState(9)
        B, n = 4, 6
        M = rng.randn(B, n, n)
        A = (np.einsum("bij,bkj->bik", M, M) + n * np.eye(n)).astype(
            np.float32
        )

        @jax.jit
        def loss(a_):
            r = spd.cholesky_batched(a_)
            return jnp.sum(r.L ** 2)

        ga = np.asarray(jax.grad(loss)(jnp.asarray(A)))
        assert ga.shape == A.shape and np.isfinite(ga).all()
