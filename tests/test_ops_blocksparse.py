"""Block-sparse operators: round-trip, matvec, solve, eigs."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops.blocksparse import (
    blocksparse_eigs,
    blocksparse_from_dense,
    blocksparse_solve,
    blocksparse_to_dense,
    make_blocksparse_matvec,
)


def block_tridiag(nb, bs, seed=0, dominance=4.0):
    """Diagonally dominant block-tridiagonal matrix (nnzb ≈ 3nb)."""
    rng = np.random.RandomState(seed)
    n = nb * bs
    A = np.zeros((n, n), np.float32)
    for i in range(nb):
        for j in range(nb):
            if abs(i - j) <= 1:
                A[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs] = (
                    rng.randn(bs, bs) * 0.3
                )
    A += dominance * np.eye(n, dtype=np.float32)
    return A


class TestBlockSparseCore:
    def test_from_to_dense_roundtrip(self):
        A = block_tridiag(8, 8, seed=1)
        op = blocksparse_from_dense(A, 8)
        assert op.blocks.shape[0] == 3 * 8 - 2
        D = np.asarray(blocksparse_to_dense(op))
        np.testing.assert_array_equal(D, A)

    def test_matvec_matches_dense(self):
        A = block_tridiag(6, 8, seed=2)
        op = blocksparse_from_dense(A, 8)
        mv = make_blocksparse_matvec(op)
        v = np.random.RandomState(3).randn(2, 48).astype(np.float32)
        got = np.asarray(mv(jnp.asarray(v)), np.float64)
        want = v @ A.T.astype(np.float64)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_duplicate_coordinates_sum(self):
        import jax.numpy as jnp

        from linalg_solver_tpu.ops.blocksparse import BlockSparse

        blk = jnp.ones((2, 4, 4), jnp.float32)
        op = BlockSparse(blk, jnp.asarray([0, 0]), jnp.asarray([1, 1]),
                         nb=2)
        D = np.asarray(blocksparse_to_dense(op))
        np.testing.assert_array_equal(D[:4, 4:], 2.0)


class TestBlockSparseSolve:
    def test_gmres_matches_dense_solve(self):
        A = block_tridiag(8, 8, seed=4)
        op = blocksparse_from_dense(A, 8)
        b = np.random.RandomState(5).randn(2, 64).astype(np.float32)
        res = blocksparse_solve(op, jnp.asarray(b), method="gmres",
                                tol=1e-6)
        assert bool(np.asarray(res.converged).all())
        want = np.linalg.solve(A.astype(np.float64), b.T).T
        np.testing.assert_allclose(np.asarray(res.x, np.float64), want,
                                   atol=1e-4)

    def test_cg_on_spd_blocks(self):
        A = block_tridiag(8, 8, seed=6)
        A = ((A + A.T) / 2).astype(np.float32)  # SPD by dominance
        op = blocksparse_from_dense(A, 8)
        b = np.random.RandomState(7).randn(1, 64).astype(np.float32)
        res = blocksparse_solve(op, jnp.asarray(b), method="cg",
                                tol=1e-6)
        assert bool(np.asarray(res.converged).all())
        want = np.linalg.solve(A.astype(np.float64), b.T).T
        np.testing.assert_allclose(np.asarray(res.x, np.float64), want,
                                   atol=1e-4)


class TestBlockSparseEigs:
    def test_top_eigenvalues(self):
        """Separated top spectrum: block-diagonal dominant blocks."""
        nb, bs = 6, 8
        n = nb * bs
        rng = np.random.RandomState(8)
        A = block_tridiag(nb, bs, seed=8, dominance=2.0)
        # plant separated large eigenvalues in the first block
        A[:bs, :bs] = np.diag([20.0, 15.0, 11.0] + [2.0] * (bs - 3))
        op = blocksparse_from_dense(A.astype(np.float32), bs)
        res = blocksparse_eigs(op, 3, which="LM", max_restarts=60)
        w = np.linalg.eigvals(A.astype(np.float64))
        want = np.sort(w[np.argsort(-np.abs(w))][:3].real)[::-1]
        assert bool(np.asarray(res.converged).all())
        got = np.sort(np.asarray(res.real)[0])[::-1]
        np.testing.assert_allclose(got, want, atol=2e-3 * 20)
