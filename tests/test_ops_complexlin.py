"""Complex dense ops (real 2n-embedding) vs numpy complex oracles."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops.complexlin import (
    det_complex_batched,
    inverse_complex_batched,
    solve_complex_batched,
)


def cbatch(B, n, seed=0, shift=0.0):
    rng = np.random.RandomState(seed)
    M = rng.randn(B, n, n) + 1j * rng.randn(B, n, n)
    M = M + shift * np.eye(n)
    return M.astype(np.complex64)


class TestComplexSolve:
    def test_solve_matches_numpy(self):
        B, n = 3, 16
        A = cbatch(B, n, seed=1, shift=4.0 * np.sqrt(16))
        rng = np.random.RandomState(2)
        b = (rng.randn(B, n) + 1j * rng.randn(B, n)).astype(
            np.complex64
        )
        xr, xi = solve_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag),
            jnp.asarray(b.real), jnp.asarray(b.imag),
        )
        x = np.asarray(xr) + 1j * np.asarray(xi)
        for i in range(B):
            want = np.linalg.solve(A[i].astype(np.complex128), b[i])
            np.testing.assert_allclose(x[i], want, atol=1e-4)

    def test_inverse_matches_numpy(self):
        B, n = 2, 12
        A = cbatch(B, n, seed=3, shift=10.0)
        ir, ii = inverse_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag)
        )
        inv = np.asarray(ir) + 1j * np.asarray(ii)
        for i in range(B):
            np.testing.assert_allclose(
                A[i] @ inv[i], np.eye(n), atol=1e-3
            )

    def test_det_matches_numpy(self):
        B, n = 3, 8
        A = cbatch(B, n, seed=4, shift=3.0)
        dr, di = det_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag)
        )
        got = np.asarray(dr) + 1j * np.asarray(di)
        want = np.linalg.det(A.astype(np.complex128))
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_det_singular_and_phase(self):
        # purely imaginary diagonal: det = i^n · prod — phase matters
        n = 4
        d = np.array([1j, 2j, -1j, 3j], np.complex64)
        A = np.diag(d)[None]
        dr, di = det_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag)
        )
        got = complex(np.asarray(dr)[0], np.asarray(di)[0])
        want = complex(np.prod(d.astype(np.complex128)))
        assert abs(got - want) < 1e-4 * abs(want)
        # singular lane
        A2 = np.zeros((1, 3, 3), np.complex64)
        dr2, di2 = det_complex_batched(
            jnp.asarray(A2.real), jnp.asarray(A2.imag)
        )
        assert np.asarray(dr2)[0] == 0.0 and np.asarray(di2)[0] == 0.0
