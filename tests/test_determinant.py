"""Determinant tests: planner-driven execution vs sympy oracle, legacy
paths, and the characteristic-polynomial (Polynomial entries) path."""

import random

import pytest
import sympy

from linalg_solver_tpu.exact.matrix import Matrix
from linalg_solver_tpu.exact.polynomial import Polynomial

pytestmark = pytest.mark.usefixtures("quiet_trace")


def rand_sparse(n, density=0.5, lo=-5, hi=5):
    return Matrix(
        [
            [
                sympy.Rational(random.randint(lo, hi))
                if random.random() < density
                else sympy.Rational(0)
                for _ in range(n)
            ]
            for _ in range(n)
        ]
    )


class TestPlannedDeterminant:
    def test_trivial_sizes(self):
        assert Matrix([[5]]).determinant() == 5
        assert Matrix([[1, 2], [3, 4]]).determinant() == -2

    def test_diagonal(self):
        assert Matrix.diagonal([2, 3, 4]).determinant() == 24

    def test_zero_row(self):
        m = Matrix([[0, 0, 0], [1, 2, 3], [4, 5, 6]])
        assert m.determinant() == 0

    def test_differential_vs_sympy(self):
        for trial in range(20):
            n = random.randint(3, 6)
            density = random.choice([0.3, 0.5, 0.8])
            m = rand_sparse(n, density)
            expected = sympy.Matrix(m.items).det()
            assert m.determinant() == expected, (
                f"trial {trial}: planned determinant mismatch on {m.items}"
            )

    def test_dense_differential(self):
        for _ in range(5):
            m = rand_sparse(4, density=1.0)
            assert m.determinant() == sympy.Matrix(m.items).det()

    def test_legacy_path_differential(self):
        for _ in range(10):
            n = random.randint(2, 4)
            m = rand_sparse(n, 0.7)
            expected = sympy.Matrix(m.items).det()
            assert m.determinant(use_optimal=False) == expected

    def test_direct_determinant(self):
        for _ in range(5):
            m = rand_sparse(3, 1.0)
            assert m.direct_determinant() == sympy.Matrix(m.items).det()

    def test_non_square_raises(self):
        with pytest.raises(ValueError):
            Matrix([[1, 2]]).direct_determinant()


class TestCharacteristicPolynomial:
    def test_char_poly_via_determinant(self):
        # det(A - lambda I) over Polynomial entries must match sympy's
        # characteristic polynomial (up to the (-1)^n convention).
        for _ in range(5):
            n = random.randint(2, 3)
            A = rand_sparse(n, 0.8)
            lam = Polynomial({1: 1}, var=r"\lambda")
            lam_I = Matrix.diagonal([lam] * n)
            char_matrix = A - lam_I
            p = char_matrix.determinant(log_permutation_details=True)
            x = sympy.symbols(r"\lambda")
            if isinstance(p, Polynomial):
                got = sympy.expand(p.to_sympy())
            else:
                got = sympy.expand(sympy.sympify(p))
            expected = sympy.expand(
                sympy.Matrix(A.items).charpoly(x).as_expr() * (-1) ** n
            )
            assert sympy.simplify(got - expected) == 0

    def test_sparse_char_poly_exercises_planner(self):
        # Sparse matrix: the planner will pick expansions/DM; the AddRow
        # fraction-free path triggers when beneficial.
        A = Matrix(
            [
                [sympy.Rational(2), sympy.Rational(1), 0, 0],
                [0, sympy.Rational(3), 0, 0],
                [0, 0, sympy.Rational(4), sympy.Rational(1)],
                [0, 0, sympy.Rational(1), sympy.Rational(4)],
            ]
        )
        lam = Polynomial({1: 1}, var=r"\lambda")
        p = (A - Matrix.diagonal([lam] * 4)).determinant()
        roots = p.radical_roots()
        assert roots == {2: 1, 3: 1, 5: 1, 3: 1} or set(roots) == {2, 3, 5}


class TestExecutorSparsityChecks:
    def test_sparsity_mismatch_raises(self):
        from linalg_solver_tpu.exact.determinant_exec import (
            execute_process,
            find_optimal_process,
        )

        # Plan for a sparse matrix, then execute on a denser one.
        sparse = Matrix([[1, 0, 0], [0, 1, 0], [0, 0, 1]])
        _, process = find_optimal_process(sparse)
        dense = Matrix([[1, 1, 1], [1, 1, 1], [1, 1, 1]])
        with pytest.raises(ValueError, match="Sparsity mismatch"):
            execute_process(dense, process)

    def test_sparser_than_planned_is_fine(self):
        from linalg_solver_tpu.exact.determinant_exec import (
            execute_process,
            find_optimal_process,
        )

        dense = Matrix([[1, 2], [3, 4]])
        _, process = find_optimal_process(dense)
        sparser = Matrix([[1, 0], [0, 4]])
        assert execute_process(sparser, process) == 4

    def test_logged_cost_reported(self):
        from linalg_solver_tpu.utils.trace import nest_logger

        m = Matrix.diagonal([sympy.Rational(2), sympy.Rational(3)])
        with nest_logger() as lg:
            m.determinant()
        text = str(lg)
        assert "Optimální strategie" in text or "\\det" in text
