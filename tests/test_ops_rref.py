"""Device RREF / solve / LU tests on CPU, including pivot-sequence
bit-matching against the exact host path."""

import numpy as np
import pytest
import random
import sympy

import jax.numpy as jnp

from linalg_solver_tpu.exact.matrix import Matrix
from linalg_solver_tpu.ops import (
    det_gj,
    det_lu,
    det_lu_batched,
    inverse,
    inverse_batched,
    lu_factor,
    lu_solve,
    nullspace,
    rank,
    rank_batched,
    rref,
    rref_batched,
    solve,
    solve_lu_batched,
)


def rand_int_matrix(m, n, rng, lo=-5, hi=5):
    return np.array(
        [[rng.randint(lo, hi) for _ in range(n)] for _ in range(m)],
        dtype=np.float64,
    )


class TestRREF:
    def test_identity(self):
        res = rref(jnp.eye(3), bar_col=3)
        np.testing.assert_allclose(res.reduced, np.eye(3))
        assert int(res.num_pivots) == 3
        assert list(res.pivot_cols) == [0, 1, 2]

    def test_matches_sympy_rref(self):
        rng = random.Random(0)
        # Two fixed shapes: each distinct shape is one XLA compile.
        for trial in range(10):
            m, n = (3, 4) if trial % 2 == 0 else (4, 5)
            A = rand_int_matrix(m, n, rng)
            res = rref(jnp.asarray(A), bar_col=n, tol=1e-9)
            expected, piv = sympy.Matrix(A.astype(int)).rref()
            np.testing.assert_allclose(
                np.asarray(res.reduced),
                np.array(expected, dtype=np.float64),
                atol=1e-5,
            )
            k = int(res.num_pivots)
            assert tuple(int(c) for c in res.pivot_cols[:k]) == piv

    def test_pivot_sequence_bit_matches_exact_path(self):
        """The device 'first nonzero' rule must reproduce the exact path's
        pivot sequence and S/N/E step-event sequence on integer inputs."""
        rng = random.Random(42)
        for trial in range(10):
            m, n = 4, 5
            A = rand_int_matrix(m, n, rng, lo=-3, hi=3)
            # Sprinkle zeros to force swaps.
            for _ in range(5):
                A[rng.randrange(m)][rng.randrange(n)] = 0

            exact = Matrix(
                [[sympy.Rational(int(x)) for x in row] for row in A]
            )
            _, exact_pivots, _, exact_steps = exact.row_reduce(bar_col=n - 1)

            res = rref(jnp.asarray(A), bar_col=n - 1, tol=1e-4,
                       pivot_rule="first")
            k = int(res.num_pivots)
            got_pivots = [
                (int(r), int(c))
                for r, c in zip(res.pivot_rows[:k], res.pivot_cols[:k])
            ]
            assert got_pivots == exact_pivots, f"trial {trial}"

            # Compare step-label sequences (S/N/E prefixes in order).
            from linalg_solver_tpu.ops import EV_SWAP, EV_NORM

            ne = int(res.num_events)
            code_to_label = {EV_SWAP: "S", EV_NORM: "N"}
            got_labels = [
                code_to_label.get(int(res.events[i, 0]), "E")
                for i in range(ne)
            ]
            exact_labels = [label[0] for label, _ in exact_steps]
            assert got_labels == exact_labels, f"trial {trial}"

    def test_batched(self):
        rng = random.Random(1)
        batch = np.stack([rand_int_matrix(3, 4, rng) for _ in range(5)])
        res = rref_batched(jnp.asarray(batch), bar_col=4, tol=1e-9)
        for i in range(5):
            single = rref(jnp.asarray(batch[i]), bar_col=4, tol=1e-9)
            np.testing.assert_allclose(
                res.reduced[i], single.reduced, atol=1e-10
            )
            assert int(res.num_pivots[i]) == int(single.num_pivots)

    def test_det_from_rref(self):
        rng = random.Random(2)
        for _ in range(10):
            A = rand_int_matrix(4, 4, rng)
            aug = np.concatenate([A, np.zeros((4, 1))], axis=1)
            res = rref(jnp.asarray(aug), bar_col=4, tol=1e-9)
            expected = float(sympy.Matrix(A.astype(int)).det())
            np.testing.assert_allclose(float(res.det), expected, rtol=1e-4, atol=1e-4)


class TestSolve:
    def test_unique(self):
        A = jnp.array([[2.0, 0.0], [0.0, 4.0]])
        sol = solve(A, jnp.array([6.0, 8.0]))
        assert bool(sol.is_consistent)
        assert int(sol.dim) == 0
        np.testing.assert_allclose(sol.particular, [3.0, 2.0])

    def test_inconsistent(self):
        A = jnp.array([[1.0, 1.0], [1.0, 1.0]])
        sol = solve(A, jnp.array([1.0, 2.0]), tol=1e-9)
        assert not bool(sol.is_consistent)

    def test_underdetermined_generators(self):
        rng = random.Random(3)
        for _ in range(10):
            m, n = 3, 5
            A = rand_int_matrix(m, n, rng)
            x_true = rand_int_matrix(n, 1, rng)[:, 0]
            b = A @ x_true
            sol = solve(jnp.asarray(A), jnp.asarray(b), tol=1e-7)
            assert bool(sol.is_consistent)
            # Particular solution satisfies the system.
            np.testing.assert_allclose(
                A @ np.asarray(sol.particular), b, atol=1e-4
            )
            # Each valid generator is in the nullspace.
            gens = np.asarray(sol.generators)
            mask = np.asarray(sol.gen_mask)
            assert int(sol.dim) == int(mask.sum())
            assert int(sol.dim) == n - np.linalg.matrix_rank(A)
            for j in range(n):
                if mask[j]:
                    np.testing.assert_allclose(
                        A @ gens[:, j], np.zeros(m), atol=1e-4
                    )

    def test_nullspace_dim(self):
        A = np.array([[1.0, 2.0, 3.0], [2.0, 4.0, 6.0]])
        ns = nullspace(jnp.asarray(A), tol=1e-9)
        assert int(ns.dim) == 2
        np.testing.assert_allclose(ns.particular, np.zeros(3))


class TestInverseRank:
    def test_inverse(self):
        rng = random.Random(4)
        for _ in range(5):
            A = rand_int_matrix(4, 4, rng)
            while abs(np.linalg.det(A)) < 0.5:
                A = rand_int_matrix(4, 4, rng)
            res = inverse(jnp.asarray(A), tol=1e-9)
            assert bool(res.is_invertible)
            np.testing.assert_allclose(
                np.asarray(res.inverse) @ A, np.eye(4), atol=1e-4
            )

    def test_singular(self):
        A = jnp.array([[1.0, 2.0], [2.0, 4.0]])
        res = inverse(A, tol=1e-9)
        assert not bool(res.is_invertible)

    def test_inverse_batched(self):
        rng = random.Random(5)
        batch = []
        while len(batch) < 4:
            A = rand_int_matrix(3, 3, rng)
            if abs(np.linalg.det(A)) > 0.5:
                batch.append(A)
        batch = np.stack(batch)
        res = inverse_batched(jnp.asarray(batch), tol=1e-9)
        assert bool(res.is_invertible.all())
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", np.asarray(res.inverse), batch),
            np.broadcast_to(np.eye(3), (4, 3, 3)),
            atol=1e-4,
        )

    def test_rank(self):
        assert int(rank(jnp.eye(4))) == 4
        A = np.array([[1.0, 2.0], [2.0, 4.0]])
        assert int(rank(jnp.asarray(A), tol=1e-9)) == 1
        rng = random.Random(6)
        for _ in range(5):
            r = rng.randint(1, 3)
            B = rand_int_matrix(4, r, rng) @ rand_int_matrix(r, 5, rng)
            assert int(rank(jnp.asarray(B))) == \
                np.linalg.matrix_rank(B)

    def test_rank_batched(self):
        batch = jnp.stack([jnp.eye(3), jnp.zeros((3, 3))])
        ranks = rank_batched(batch)
        assert list(np.asarray(ranks)) == [3, 0]


class TestLU:
    def test_factorization_property(self):
        rng = random.Random(7)
        for _ in range(10):
            A = rand_int_matrix(5, 5, rng)
            res = lu_factor(jnp.asarray(A))
            lu = np.asarray(res.lu)
            L = np.tril(lu, -1) + np.eye(5)
            U = np.triu(lu)
            PA = A[np.asarray(res.perm)]
            np.testing.assert_allclose(L @ U, PA, atol=1e-4)

    def test_det(self):
        rng = random.Random(8)
        for _ in range(10):
            A = rand_int_matrix(4, 4, rng)
            expected = float(sympy.Matrix(A.astype(int)).det())
            np.testing.assert_allclose(
                float(det_lu(jnp.asarray(A))), expected, rtol=1e-4, atol=1e-4
            )
            np.testing.assert_allclose(
                float(det_gj(jnp.asarray(A), tol=1e-9)),
                expected, rtol=1e-4, atol=1e-4,
            )

    def test_det_singular(self):
        A = jnp.array([[1.0, 2.0], [2.0, 4.0]])
        assert float(det_lu(A)) == 0.0

    def test_solve(self):
        rng = random.Random(9)
        for _ in range(5):
            A = rand_int_matrix(4, 4, rng)
            while abs(np.linalg.det(A)) < 0.5:
                A = rand_int_matrix(4, 4, rng)
            b = rand_int_matrix(4, 1, rng)[:, 0]
            x = lu_solve(lu_factor(jnp.asarray(A)), jnp.asarray(b))
            np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-4)

    def test_solve_block_rhs(self):
        A = np.array([[2.0, 1.0], [1.0, 3.0]])
        B = np.array([[1.0, 0.0], [0.0, 1.0]])
        X = lu_solve(lu_factor(jnp.asarray(A)), jnp.asarray(B))
        np.testing.assert_allclose(A @ np.asarray(X), B, atol=1e-5)

    def test_batched(self):
        rng = random.Random(10)
        batch, rhs = [], []
        while len(batch) < 6:
            A = rand_int_matrix(4, 4, rng)
            if abs(np.linalg.det(A)) > 0.5:
                batch.append(A)
                rhs.append(rand_int_matrix(4, 1, rng)[:, 0])
        batch, rhs = np.stack(batch), np.stack(rhs)
        X = solve_lu_batched(jnp.asarray(batch), jnp.asarray(rhs))
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", batch, np.asarray(X)), rhs, atol=1e-3
        )
        dets = det_lu_batched(jnp.asarray(batch))
        for i in range(6):
            np.testing.assert_allclose(
                float(dets[i]), np.linalg.det(batch[i]), rtol=1e-4
            )
