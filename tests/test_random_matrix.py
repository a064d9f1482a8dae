"""RandomMatrixBuilder property tests."""

import random

import pytest
import sympy

from linalg_solver_tpu.exact.matrix import Matrix
from linalg_solver_tpu.exact.random_matrix import (
    RandomMatrixBuilder,
    gen_jordan_matrix,
    gen_matrix_with_jordan_blocks,
    gen_matrix_with_rank,
    gen_regular_matrix,
    gen_unimodular_matrix,
    raw_gen_rand_matrix,
)

pytestmark = pytest.mark.usefixtures("quiet_trace")


class TestBuilder:
    def test_random_shape(self):
        m = raw_gen_rand_matrix(3, 5)
        assert (m.rows, m.cols) == (3, 5)

    def test_custom_dist(self):
        m = raw_gen_rand_matrix(4, 4, dist=lambda: 7)
        assert all(x == 7 for row in m.items for x in row)

    def test_full_rank(self):
        for _ in range(3):
            m = gen_regular_matrix(4)
            assert m.rank() == 4

    def test_with_rank(self):
        for _ in range(3):
            m = gen_matrix_with_rank(4, 6, rank=2)
            assert (m.rows, m.cols) == (4, 6)
            assert m.rank() == 2

    def test_unimodular(self):
        for _ in range(5):
            m = gen_unimodular_matrix(4)
            det = sympy.Matrix(m.items).det()
            assert det in (1, -1)

    def test_jordan_form(self):
        J = gen_jordan_matrix(4, [(3, 2), (1, 2)])
        assert J.items == [
            [3, 1, 0, 0],
            [0, 3, 0, 0],
            [0, 0, 1, 1],
            [0, 0, 0, 1],
        ]

    def test_jordanized_similar(self):
        A = gen_matrix_with_jordan_blocks(3, [(2, 2), (5, 1)])
        eigs = sympy.Matrix(A.items).eigenvals()
        assert eigs == {2: 2, 5: 1}

    def test_with_eigenvalues(self):
        A = (
            RandomMatrixBuilder.new()
            .with_size(3, 3)
            .with_eigenvalues([1, 2, 3])
            .build()
        )
        assert set(sympy.Matrix(A.items).eigenvals()) == {1, 2, 3}

    def test_with_eigenvalue_multiplicities(self):
        A = (
            RandomMatrixBuilder.new()
            .with_size(3, 3)
            .with_eigenvalues([(4, 2), (1, 1)])
            .build()
        )
        assert sympy.Matrix(A.items).eigenvals() == {4: 2, 1: 1}

    def test_mutually_exclusive_constraints(self):
        with pytest.raises(AssertionError):
            (
                RandomMatrixBuilder.new()
                .with_size(3, 3)
                .with_rank(2)
                .with_eigenvalues([1, 2, 3])
                .build()
            )

    def test_rank_bound_asserted(self):
        with pytest.raises(AssertionError):
            RandomMatrixBuilder.new().with_size(2, 2).with_rank(5).build()

    def test_jordan_size_mismatch_asserted(self):
        with pytest.raises(AssertionError):
            (
                RandomMatrixBuilder.new()
                .with_size(3, 3)
                .with_jordan_blocks([(1, 2)])
                .build()
            )

    def test_generation_is_silent(self):
        from linalg_solver_tpu.utils.trace import nest_logger

        with nest_logger() as lg:
            gen_matrix_with_rank(3, 3, rank=2)
            gen_matrix_with_jordan_blocks(3, [(1, 2), (0, 1)])
        assert lg.accum == []

    def test_build_sized(self):
        m = RandomMatrixBuilder.new().build_sized(3)
        assert (m.rows, m.cols) == (3, 3)
