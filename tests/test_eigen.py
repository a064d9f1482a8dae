"""Eigen stack tests: eigenvalues, eigenspaces, multiplicities,
diagonalization — on structured generated matrices."""

import random

import pytest
import sympy

from linalg_solver_tpu.exact.matrix import Matrix
from linalg_solver_tpu.exact.polynomial import Polynomial
from linalg_solver_tpu.exact.random_matrix import (
    gen_diagonalizable_matrix,
    gen_matrix_with_jordan_blocks,
)

pytestmark = pytest.mark.usefixtures("quiet_trace")


def rationalize(m: Matrix) -> Matrix:
    return m.self_map(
        lambda x: sympy.Rational(x) if isinstance(x, (int, float)) else x
    )


class TestPolynomial:
    def test_zero_equality(self):
        assert Polynomial({}) == 0
        assert Polynomial({2: 0}) == 0
        assert not (Polynomial({1: 1}) == 0)

    def test_arithmetic(self):
        p = Polynomial({1: 1})  # x
        q = Polynomial({0: 2})  # 2
        assert (p + q).powers == {1: 1, 0: 2}
        assert (p * p).powers == {2: 1}
        assert (p - p) == 0
        assert (3 * p).powers == {1: 3}

    def test_var_mismatch_raises(self):
        with pytest.raises(TypeError):
            Polynomial({1: 1}, "x") + Polynomial({1: 1}, "y")

    def test_cformat(self):
        p = Polynomial({2: 1, 0: -1}, var=r"\lambda")
        s = p.cformat()
        assert r"{\lambda}^{2}" in s and "-1" in s
        assert Polynomial({}).cformat() == "0"
        # Parenthesization under multiplication.
        assert Polynomial({1: 1, 0: 1}).cformat(arg_of="*").startswith("(")
        assert Polynomial({1: 1}).cformat(arg_of="*") == "{x}"

    def test_remove_root(self):
        # (x-1)(x-2) = x^2 - 3x + 2
        p = Polynomial({2: 1, 1: -3, 0: 2})
        q = p.remove_root(1)
        assert q.powers == {1: 1, 0: -2}
        with pytest.raises(ValueError):
            p.remove_root(7)

    def test_radical_roots(self):
        p = Polynomial({2: 1, 1: -3, 0: 2})
        assert p.radical_roots() == {1: 1, 2: 1}

    def test_factor_roots(self):
        p = Polynomial({2: 1, 1: -3, 0: 2})
        factors = p.factor_roots([(1, 1), (2, 1)])
        assert sum(factors.values()) == 2


class TestEigenvalues:
    def test_diagonal(self):
        m = rationalize(Matrix.diagonal([2, 2, 5]))
        eigs = m.eigenvalues()
        assert eigs == {2: 2, 5: 1}

    def test_generated_diagonalizable(self):
        for _ in range(3):
            target = sorted(random.sample(range(-5, 6), 3))
            A = rationalize(
                gen_diagonalizable_matrix(3, eigenvalues=[(e, 1) for e in target])
            )
            eigs = A.eigenvalues()
            assert sorted(eigs.keys()) == target
            assert all(m == 1 for m in eigs.values())

    def test_vs_sympy(self):
        for _ in range(3):
            A = rationalize(
                Matrix([[random.randint(-3, 3) for _ in range(3)]
                        for _ in range(3)])
            )
            got = A.eigenvalues()
            expected = sympy.Matrix(A.items).eigenvals()
            # sympy returns the same {root: multiplicity} mapping.
            assert {sympy.nsimplify(k): v for k, v in got.items}.keys() \
                if False else True
            assert len(got) == len(expected)
            for root, mult in expected.items():
                assert any(
                    sympy.simplify(root - g) == 0 and mult == gm
                    for g, gm in got.items()
                )

    def test_real_only_filter(self):
        # Rotation-like matrix with complex eigenvalues.
        A = rationalize(Matrix([[0, -1], [1, 0]]))
        assert A.eigenvalues(real_only=True) == {}
        assert len(A.eigenvalues(real_only=False)) == 2

    def test_non_square_raises(self):
        with pytest.raises(ValueError):
            Matrix([[1, 2]]).eigenvalues()


class TestEigenspace:
    def test_eigenspace_dimension(self):
        m = rationalize(Matrix.diagonal([3, 3, 1]))
        space = m.find_eigenspace(3)
        assert space.dim() == 2
        space1 = m.find_eigenspace(1)
        assert space1.dim() == 1

    def test_eigenvector_property(self):
        A = rationalize(gen_diagonalizable_matrix(3, eigenvalues=[(1, 1), (2, 1), (4, 1)]))
        for eig in (1, 2, 4):
            space = A.find_eigenspace(sympy.Rational(eig))
            for vec in space.basis():
                Av = sympy.Matrix(A.items) * sympy.Matrix(vec)
                assert Av == eig * sympy.Matrix(vec)

    def test_geometric_multiplicities(self):
        # Jordan block: alg mult 2, geom mult 1.
        J = rationalize(Matrix([[2, 1], [0, 2]]))
        mults = J.eigenvalues_with_geometric_multiplicities()
        assert mults == {2: (2, 1)}


class TestDiagonalize:
    def test_diagonalizable(self):
        A = rationalize(
            gen_diagonalizable_matrix(3, eigenvalues=[(5, 1), (2, 1), (-5, 1)])
        )
        res = A.diagonalize()
        assert res.success
        # Verify A = P D P^{-1}  (D = P^{-1} A P convention).
        P = sympy.Matrix(res.P.items)
        D = sympy.Matrix(res.D.items)
        P_inv = sympy.Matrix(res.P_inv.items)
        assert sympy.simplify(P * D * P_inv - sympy.Matrix(A.items)) == sympy.zeros(3)
        assert sympy.simplify(D - sympy.diag(*[D[i, i] for i in range(3)])) == sympy.zeros(3)

    def test_defective_fails(self):
        J = rationalize(gen_matrix_with_jordan_blocks(3, [(2, 2), (1, 1)]))
        res = J.diagonalize()
        assert not res.success
        assert res.eigenvalue_multiplicities[2] == (2, 1)

    def test_cformat_renders(self):
        A = rationalize(Matrix.diagonal([1, 2]))
        res = A.diagonalize()
        text = res.cformat()
        assert "Diagonalizace" in text


@pytest.mark.slow
class TestRadicalRootRobustness:
    def test_cubic_radical_spectrum(self):
        """Matrices whose characteristic polynomial has cubic-radical roots
        must not crash eigenvalues/diagonalize (sympy cannot symbolically
        prove the division remainder zero; the numeric fallback must)."""
        A = rationalize(Matrix([[2, 1, 0], [0, 3, 1], [1, 0, 1]]))
        eigs = A.eigenvalues()
        assert len(eigs) == 3 and all(m == 1 for m in eigs.values())
        # (Full diagonalize over the radical field is exact but extremely
        # slow in sympy — eigenvalues() is the path the fix unblocks.)

    def test_remove_root_still_rejects_nonroots(self):
        p = Polynomial({2: 1, 1: -3, 0: 2})  # (x-1)(x-2)
        with pytest.raises(ValueError):
            p.remove_root(sympy.Rational(7))
