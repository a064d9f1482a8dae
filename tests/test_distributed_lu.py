"""Distributed (mesh-sharded) single-matrix LU — tests on the 8 virtual
CPU devices from conftest.  Differential vs numpy and vs the batch path;
the result must be invariant to the mesh shape (1, 2, 4, 8 devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.parallel.distributed_lu import (
    cyclic_column_order,
    distributed_det,
    distributed_lu,
    distributed_solve,
    gather_packed_lu,
)
from linalg_solver_tpu.parallel.mesh import make_mesh


def make_matrix(n, seed=0, shift=None):
    rng = np.random.RandomState(seed)
    shift = shift if shift is not None else 3.0 * np.sqrt(n)
    return (rng.randn(n, n) + shift * np.eye(n)).astype(np.float32)


class TestCyclicOrder:
    def test_order_is_permutation(self):
        order = np.asarray(cyclic_column_order(24, 4, 3))
        assert sorted(order.tolist()) == list(range(24))

    def test_blocks_are_cyclic(self):
        order = np.asarray(cyclic_column_order(16, 2, 4))
        # Device 0 owns blocks 0 and 4 -> global cols 0,1 then 8,9.
        assert order[:4].tolist() == [0, 1, 8, 9]


class TestDistributedLU:
    @pytest.mark.parametrize("tp", [1, 2, 4, 8])
    def test_solve_matches_numpy(self, tp):
        mesh = make_mesh(dp=8 // tp, tp=tp)
        n = 32
        A = make_matrix(n, seed=1)
        b = np.random.RandomState(2).randn(n).astype(np.float32)
        x = np.asarray(
            distributed_solve(
                jnp.asarray(A), jnp.asarray(b), mesh, axis="tp", nb=4
            ),
            dtype=np.float64,
        )
        expected = np.linalg.solve(A.astype(np.float64), b)
        np.testing.assert_allclose(x, expected, atol=5e-4)

    def test_solve_matrix_rhs(self):
        mesh = make_mesh(dp=2, tp=4)
        n, k = 16, 3
        A = make_matrix(n, seed=3)
        B = np.random.RandomState(4).randn(n, k).astype(np.float32)
        X = np.asarray(
            distributed_solve(
                jnp.asarray(A), jnp.asarray(B), mesh, axis="tp", nb=4
            ),
            dtype=np.float64,
        )
        np.testing.assert_allclose(
            A.astype(np.float64) @ X, B, atol=5e-4
        )

    @pytest.mark.parametrize("tp", [2, 8])
    def test_det_matches_numpy(self, tp):
        mesh = make_mesh(dp=8 // tp, tp=tp)
        n = 8 * tp
        A = make_matrix(n, seed=5, shift=2.0).astype(np.float64)
        # Normalize so |det| ~ 1 (a 64x64 diagonally dominant det
        # overflows f32 otherwise).
        sign_e, logdet = np.linalg.slogdet(A)
        A = (A / np.exp(logdet / n)).astype(np.float32)
        d = float(distributed_det(jnp.asarray(A), mesh, axis="tp", nb=4))
        np.testing.assert_allclose(d, sign_e, rtol=4e-3)

    def test_packed_lu_reconstructs_pa(self):
        mesh = make_mesh(dp=2, tp=4)
        n, nb = 16, 4
        A = make_matrix(n, seed=6, shift=2.0)
        res = distributed_lu(jnp.asarray(A), mesh, axis="tp", nb=nb)
        assert bool(np.asarray(res.ok))
        lu = np.asarray(gather_packed_lu(res, nb, 4), dtype=np.float64)
        perm = np.asarray(res.perm)
        L = np.tril(lu, -1) + np.eye(n)
        U = np.triu(lu)
        np.testing.assert_allclose(
            L @ U, A.astype(np.float64)[perm], atol=1e-4
        )

    def test_mesh_shape_invariance(self):
        """Same matrix, same nb: every mesh width must give the SAME
        pivot sequence and packed factor (the redundant panel
        factorization is deterministic)."""
        n, nb = 16, 4
        A = make_matrix(n, seed=7, shift=2.0)
        results = []
        for tp in (1, 2, 4):
            mesh = make_mesh(dp=8 // tp, tp=tp)
            res = distributed_lu(jnp.asarray(A), mesh, axis="tp", nb=nb)
            results.append(
                (
                    np.asarray(gather_packed_lu(res, nb, tp)),
                    np.asarray(res.perm),
                )
            )
        for lu, perm in results[1:]:
            np.testing.assert_array_equal(perm, results[0][1])
            np.testing.assert_allclose(lu, results[0][0], atol=1e-5)

    def test_matches_batched_blocked_lu(self):
        """The distributed factor must equal the single-chip blocked LU
        (same max-magnitude pivot rule, same block algebra)."""
        from linalg_solver_tpu.ops.lu_blocked import blocked_lu_batched

        n, nb = 16, 4
        A = make_matrix(n, seed=8, shift=2.0)
        mesh = make_mesh(dp=4, tp=2)
        res_d = distributed_lu(jnp.asarray(A), mesh, axis="tp", nb=nb)
        res_b = blocked_lu_batched(jnp.asarray(A)[None], nb=nb)
        np.testing.assert_array_equal(
            np.asarray(res_d.perm), np.asarray(res_b.perm)[0]
        )
        np.testing.assert_allclose(
            np.asarray(gather_packed_lu(res_d, nb, 2)),
            np.asarray(res_b.lu)[0],
            atol=1e-5,
        )

    def test_singular_flagged(self):
        mesh = make_mesh(dp=4, tp=2)
        A = make_matrix(8, seed=9)
        A[:, 0] = 0.0
        A[0, :] = 0.0
        res = distributed_lu(jnp.asarray(A), mesh, axis="tp", nb=4)
        assert not bool(np.asarray(res.ok))
        d = float(distributed_det(jnp.asarray(A), mesh, axis="tp", nb=4))
        assert d == 0.0
