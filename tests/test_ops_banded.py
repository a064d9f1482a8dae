"""Block-tridiagonal / banded PCR solvers vs scipy and dense oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.banded import (
    banded_solve_batched,
    block_tridiag_solve_batched,
)


def block_tridiag_dense(dl, d, du):
    """Assemble dense [B, K·nb, K·nb] from block diagonals."""
    B, K, nb, _ = d.shape
    N = K * nb
    A = np.zeros((B, N, N))
    for k in range(K):
        A[:, k * nb:(k + 1) * nb, k * nb:(k + 1) * nb] = d[:, k]
        if k > 0:
            A[:, k * nb:(k + 1) * nb, (k - 1) * nb:k * nb] = dl[:, k]
        if k < K - 1:
            A[:, k * nb:(k + 1) * nb, (k + 1) * nb:(k + 2) * nb] = du[:, k]
    return A


def dominant_blocks(B, K, nb, seed=0):
    rng = np.random.RandomState(seed)
    dl = rng.randn(B, K, nb, nb)
    du = rng.randn(B, K, nb, nb)
    d = rng.randn(B, K, nb, nb) + 8.0 * nb * np.eye(nb)
    return (
        dl.astype(np.float32), d.astype(np.float32), du.astype(np.float32)
    )


class TestBlockTridiag:
    @pytest.mark.parametrize("K", [1, 2, 5, 8])
    def test_matches_dense_solve(self, K):
        dl, d, du = dominant_blocks(2, K, 4, seed=K)
        A = block_tridiag_dense(dl, d, du)
        b = np.random.RandomState(20 + K).randn(2, K * 4).astype(np.float32)
        res = block_tridiag_solve_batched(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
            jnp.asarray(b.reshape(2, K, 4)),
        )
        assert bool(np.asarray(res.ok).all())
        x = np.asarray(res.x, np.float64).reshape(2, K * 4)
        want = np.linalg.solve(A, b[..., None].astype(np.float64))[..., 0]
        np.testing.assert_allclose(x, want, atol=1e-4 * np.abs(want).max())

    def test_matrix_rhs(self):
        dl, d, du = dominant_blocks(1, 4, 3, seed=9)
        A = block_tridiag_dense(dl, d, du)
        b = np.random.RandomState(30).randn(1, 4, 3, 2).astype(np.float32)
        res = block_tridiag_solve_batched(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du), jnp.asarray(b)
        )
        x = np.asarray(res.x, np.float64).reshape(1, 12, 2)
        want = np.linalg.solve(
            A, b.reshape(1, 12, 2).astype(np.float64)
        )
        np.testing.assert_allclose(x, want, atol=1e-4)

    def test_singular_flagged(self):
        dl, d, du = dominant_blocks(2, 4, 3, seed=11)
        d[1] = 0.0  # lane 1 singular everywhere
        b = np.random.RandomState(31).randn(2, 4, 3).astype(np.float32)
        res = block_tridiag_solve_batched(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du), jnp.asarray(b)
        )
        ok = np.asarray(res.ok)
        assert ok[0] and not ok[1]


class TestBanded:
    @pytest.mark.parametrize("kb,N", [(1, 16), (2, 20), (3, 24), (4, 30)])
    def test_matches_scipy(self, kb, N):
        from scipy.linalg import solve_banded

        rng = np.random.RandomState(kb * 10 + N)
        ab = rng.randn(2, 2 * kb + 1, N).astype(np.float32)
        ab[:, kb] += 4.0 * (2 * kb + 1)  # diagonal dominance
        b = rng.randn(2, N).astype(np.float32)
        res = banded_solve_batched(jnp.asarray(ab), jnp.asarray(b), kb=kb)
        assert bool(np.asarray(res.ok).all())
        x = np.asarray(res.x, np.float64)
        for i in range(2):
            want = solve_banded(
                (kb, kb), ab[i].astype(np.float64), b[i].astype(np.float64)
            )
            np.testing.assert_allclose(
                x[i], want, atol=1e-4 * max(np.abs(want).max(), 1.0)
            )

    def test_block_width_invariance(self):
        """Any nb >= kb packs the same system: solutions agree."""
        from scipy.linalg import solve_banded

        kb, N = 2, 24
        rng = np.random.RandomState(42)
        ab = rng.randn(1, 5, N).astype(np.float32)
        ab[:, kb] += 20.0
        b = rng.randn(1, N).astype(np.float32)
        want = solve_banded((kb, kb), ab[0].astype(np.float64),
                            b[0].astype(np.float64))
        for nb in (2, 3, 8, 24):
            res = banded_solve_batched(
                jnp.asarray(ab), jnp.asarray(b), kb=kb, nb=nb
            )
            np.testing.assert_allclose(
                np.asarray(res.x)[0], want, atol=1e-4,
                err_msg=f"nb={nb}",
            )

    def test_band_edges_respected(self):
        """The out-of-band corners of the scipy storage are ignored
        (scipy convention: those entries are not referenced)."""
        from scipy.linalg import solve_banded

        kb, N = 2, 12
        rng = np.random.RandomState(77)
        ab = rng.randn(1, 5, N).astype(np.float32)
        ab[:, kb] += 20.0
        b = rng.randn(1, N).astype(np.float32)
        ab_poison = ab.copy()
        # poison the never-referenced corners
        for j in range(kb):
            ab_poison[:, : kb - j, j] = 1e6
            ab_poison[:, 2 * kb + 1 - (kb - j):, N - 1 - j] = 1e6
        res = banded_solve_batched(
            jnp.asarray(ab_poison), jnp.asarray(b), kb=kb
        )
        want = solve_banded(
            (kb, kb), ab[0].astype(np.float64), b[0].astype(np.float64)
        )
        np.testing.assert_allclose(
            np.asarray(res.x)[0], want, atol=1e-4
        )

    def test_tridiagonal_agrees_with_scalar_pcr(self):
        from linalg_solver_tpu.ops.tridiag import tridiag_solve_batched

        rng = np.random.RandomState(5)
        N = 32
        dl = rng.randn(2, N).astype(np.float32)
        du = rng.randn(2, N).astype(np.float32)
        d = (rng.randn(2, N) + 8.0).astype(np.float32)
        b = rng.randn(2, N).astype(np.float32)
        ab = np.zeros((2, 3, N), np.float32)
        ab[:, 0, 1:] = du[:, :-1]   # scipy: ab[u+i-j, j] = A[i,j]
        ab[:, 1] = d
        ab[:, 2, :-1] = dl[:, 1:]
        r1 = banded_solve_batched(jnp.asarray(ab), jnp.asarray(b), kb=1)
        r2 = tridiag_solve_batched(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du), jnp.asarray(b)
        )
        np.testing.assert_allclose(
            np.asarray(r1.x), np.asarray(r2.x), atol=1e-4
        )
