"""Tests for the exact Matrix core: construction, arithmetic, elimination,
solve/kernel/inverse/rank — differential against sympy oracles."""

import random

import pytest
import sympy

from linalg_solver_tpu.exact.matrix import (
    AffineSubspace,
    Matrix,
    NoSolution,
)

pytestmark = pytest.mark.usefixtures("quiet_trace")


def rand_matrix(m, n, lo=-5, hi=5):
    return Matrix(
        [[sympy.Rational(random.randint(lo, hi)) for _ in range(n)]
         for _ in range(m)]
    )


class TestConstruction:
    def test_empty_raises(self):
        with pytest.raises(ValueError):
            Matrix([])

    def test_non_list_rows_raise(self):
        with pytest.raises(ValueError):
            Matrix([1, 2])

    def test_ragged_raises(self):
        with pytest.raises(ValueError):
            Matrix([[1, 2], [3]])

    def test_shape(self):
        m = Matrix([[1, 2, 3], [4, 5, 6]])
        assert (m.rows, m.cols) == (2, 3)

    def test_factories(self):
        assert Matrix.zero(2, 3).items == [[0, 0, 0], [0, 0, 0]]
        assert Matrix.identity(2).items == [[1, 0], [0, 1]]
        assert Matrix.diagonal([1, 2]).items == [[1, 0], [0, 2]]
        assert Matrix.new_vector([1, 2]).items == [[1], [2]]


class TestArithmetic:
    def test_add(self):
        a = Matrix([[1, 2], [3, 4]])
        b = Matrix([[10, 20], [30, 40]])
        assert (a + b).items == [[11, 22], [33, 44]]

    def test_add_mismatch_raises(self):
        with pytest.raises(ValueError):
            Matrix([[1]]) + Matrix([[1, 2]])

    def test_sub_neg(self):
        a = Matrix([[5, 5]])
        b = Matrix([[2, 3]])
        assert (a - b).items == [[3, 2]]
        assert (-a).items == [[-5, -5]]

    def test_matmul(self):
        a = Matrix([[1, 2], [3, 4]])
        b = Matrix([[5, 6], [7, 8]])
        assert (a * b).items == [[19, 22], [43, 50]]

    def test_matmul_mismatch_raises(self):
        with pytest.raises(ValueError):
            Matrix([[1, 2]]) * Matrix([[1, 2]])

    def test_scalar_mul(self):
        assert (Matrix([[1, 2]]) * 3).items == [[3, 6]]

    def test_transpose(self):
        assert Matrix([[1, 2, 3], [4, 5, 6]]).transpose().items == [
            [1, 4], [2, 5], [3, 6],
        ]

    def test_matmul_differential(self):
        for _ in range(5):
            a = rand_matrix(3, 4)
            b = rand_matrix(4, 2)
            expected = sympy.Matrix(a.items) * sympy.Matrix(b.items)
            got = (a * b).items
            assert sympy.Matrix(got) == expected


class TestStructure:
    def test_triangular_checks(self):
        """The reference's names are SWAPPED vs the math convention
        (reference linalg.py:160-172: ``is_upper_triangular`` is True
        when the STRICT UPPER triangle is zero) — we match its
        semantics exactly; see the docstrings in exact/matrix.py."""
        assert Matrix([[1, 0], [2, 3]]).is_upper_triangular()
        assert not Matrix([[1, 2], [0, 3]]).is_upper_triangular()
        assert Matrix([[1, 2], [0, 3]]).is_lower_triangular()
        assert not Matrix([[1, 0], [2, 3]]).is_lower_triangular()

    def test_minor(self):
        m = Matrix([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
        assert m.minor(1, 1).items == [[1, 3], [7, 9]]

    def test_block_roundtrip(self):
        m = rand_matrix(4, 6)
        blocks = m.to_block_matrix([2], [3])
        assert blocks.rows == 2 and blocks.cols == 2
        back = Matrix.from_block_matrix(blocks)
        assert back.items == m.items

    def test_block_invalid_split(self):
        with pytest.raises(ValueError):
            rand_matrix(3, 3).to_block_matrix([5], [])


class TestRowReduce:
    def test_identity_stays(self):
        reduced, pivots, mats, steps = Matrix.identity(3).row_reduce(bar_col=3)
        assert reduced == Matrix.identity(3).items
        assert pivots == [(0, 0), (1, 1), (2, 2)]
        assert len(mats) == 1 and steps == []

    def test_swap_step_labeled(self):
        m = Matrix([[0, sympy.Rational(1)], [sympy.Rational(1), 0]])
        _, pivots, _, steps = m.row_reduce(bar_col=2)
        assert any(label.startswith("S") for label, _ in steps)
        assert pivots == [(0, 0), (1, 1)]

    def test_rref_matches_sympy(self):
        for _ in range(10):
            m = rand_matrix(3, 4)
            reduced, pivots, _, _ = m.row_reduce(bar_col=4)
            expected, piv_cols = sympy.Matrix(m.items).rref()
            assert sympy.Matrix(reduced) == expected
            assert tuple(c for _, c in pivots) == piv_cols

    def test_bar_col_limits_elimination(self):
        m = Matrix([[sympy.Rational(x) for x in row]
                    for row in [[2, 4, 6], [1, 2, 5]]])
        reduced, pivots, _, _ = m.row_reduce(bar_col=2)
        # Only columns 0,1 are eligible for pivots.
        assert all(c < 2 for _, c in pivots)


class TestSolve:
    def test_unique_solution(self):
        A = Matrix([[sympy.Rational(2), 0], [0, sympy.Rational(3)]])
        sol = A.find_preimage_of([sympy.Rational(4), sympy.Rational(9)])
        assert isinstance(sol, AffineSubspace)
        assert sol.get_one() == [2, 3]
        assert sol.dim() == 0

    def test_no_solution(self):
        A = Matrix([[1, 1], [1, 1]])
        sol = A.find_preimage_of([1, 2])
        assert isinstance(sol, NoSolution)

    def test_underdetermined(self):
        A = Matrix([[sympy.Rational(1), sympy.Rational(1)]])
        sol = A.find_preimage_of([sympy.Rational(2)])
        assert isinstance(sol, AffineSubspace)
        assert sol.dim() == 1

    def test_logged_matches_quiet(self):
        for _ in range(5):
            A = rand_matrix(3, 4)
            b = [sympy.Rational(random.randint(-5, 5)) for _ in range(3)]
            quiet = A.find_preimage_of(b)
            logged = A.find_preimage_of(
                b, log_matrices=True, log_steps=True, log_result=True
            )
            assert isinstance(quiet, type(logged))
            if isinstance(quiet, AffineSubspace):
                assert quiet.dim() == logged.dim()
                # Both particular solutions must satisfy A x = b.
                for sol in (quiet, logged):
                    x = sympy.Matrix(sol.get_one())
                    assert sympy.Matrix(A.items) * x == sympy.Matrix(b)

    def test_kernel_dimension(self):
        A = rand_matrix(3, 5)
        ker = A.kernel()
        assert ker.dim() == 5 - A.rank()
        # Every basis vector maps to zero.
        for vec in ker.basis():
            out = sympy.Matrix(A.items) * sympy.Matrix(vec)
            assert all(x == 0 for x in out)


class TestInverse:
    def test_inverse_matches_sympy(self):
        for _ in range(5):
            while True:
                A = rand_matrix(3, 3)
                if A.rank() == 3:
                    break
            inv_quiet = A.inverse()
            inv_logged = A.inverse(
                log_matrices=True, log_steps=True, log_result=True
            )
            expected = sympy.Matrix(A.items).inv()
            assert sympy.Matrix(inv_quiet.items) == expected
            assert sympy.Matrix(inv_logged.items) == expected

    def test_singular_returns_nosolution(self):
        A = Matrix([[sympy.Rational(1), sympy.Rational(2)],
                    [sympy.Rational(2), sympy.Rational(4)]])
        assert isinstance(A.inverse(), NoSolution)
        assert isinstance(
            A.inverse(log_matrices=True, log_steps=True), NoSolution
        )

    def test_non_square_raises(self):
        with pytest.raises(ValueError):
            Matrix([[1, 2]]).inverse()


class TestRank:
    def test_rank(self):
        assert Matrix.identity(3).rank() == 3
        assert Matrix([[1, 2], [2, 4]]).rank() == 1
        assert Matrix.zero(2, 2).rank() == 0
