"""Differential tests: C++ native planner vs the pure-Python engine.

The native engine must agree with the Python engine on optimal costs, DM
structure, canonical equivalence — and the processes it returns must
execute correctly on actual values (mirroring the reference's randomized
property-test strategy, tests.rs:122-475)."""

import random

import pytest
import sympy

from linalg_solver_tpu.planner import (
    SparsityPattern,
    are_permutation_equivalent,
    dulmage_mendelsohn,
    find_optimal_process,
)
from linalg_solver_tpu.planner import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native planner library not built"
)

T, F = True, False


def random_pattern(rng, n, density=0.6):
    return [
        [rng.random() < density for _ in range(n)] for _ in range(n)
    ]


class TestNativeAgainstPython:
    def test_costs_agree_on_fixtures(self):
        fixtures = [
            [[T]],
            [[T, T], [T, T]],
            [[T, F, F], [F, T, F], [F, F, T]],
            [[T, T, F, F], [T, T, F, F], [F, F, T, T], [F, F, T, T]],
            [[T, T, T], [T, T, T], [T, T, T]],
            [[F, F, F], [T, T, T], [T, T, T]],
            [
                [T, T, F, F, F],
                [T, T, T, F, F],
                [F, T, T, T, F],
                [F, F, T, T, T],
                [F, F, F, T, T],
            ],
        ]
        for pattern in fixtures:
            py_cost, _ = find_optimal_process(
                SparsityPattern.from_bools(pattern)
            )
            nat_cost, _ = native.find_optimal_process(pattern)
            assert (nat_cost.multiplications, nat_cost.additions) == (
                py_cost.multiplications, py_cost.additions,
            ), f"cost mismatch on {pattern}"

    def test_costs_agree_randomized(self):
        rng = random.Random(5)
        for _ in range(15):
            n = rng.randint(2, 5)
            pattern = random_pattern(rng, n, rng.choice([0.4, 0.6, 0.9]))
            py_cost, _ = find_optimal_process(
                SparsityPattern.from_bools(pattern)
            )
            nat_cost, _ = native.find_optimal_process(pattern)
            assert nat_cost.total == py_cost.total, f"mismatch on {pattern}"

    def test_dm_agrees(self):
        rng = random.Random(6)
        for _ in range(15):
            n = rng.randint(2, 6)
            pattern = random_pattern(rng, n, 0.5)
            py_dm = dulmage_mendelsohn(SparsityPattern.from_bools(pattern))
            nat_dm = native.dm_decomposition(pattern)
            assert nat_dm.block_sizes == py_dm.block_sizes
            assert nat_dm.row_perm.perm == py_dm.row_perm.perm
            assert nat_dm.col_perm.perm == py_dm.col_perm.perm

    def test_canonical_equivalence_agrees(self):
        rng = random.Random(7)
        for _ in range(10):
            n = rng.randint(2, 5)
            base = random_pattern(rng, n, 0.5)
            rp = list(range(n))
            cp = list(range(n))
            rng.shuffle(rp)
            rng.shuffle(cp)
            permuted = [
                [base[rp[i]][cp[j]] for j in range(n)] for i in range(n)
            ]
            other = random_pattern(rng, n, 0.5)
            assert native.check_permutation_equivalent(base, permuted)
            expected = are_permutation_equivalent(
                SparsityPattern.from_bools(base),
                SparsityPattern.from_bools(other),
            )
            assert (
                native.check_permutation_equivalent(base, other) == expected
            )

    def test_native_process_executes_correctly(self):
        """End-to-end: the native plan must produce correct determinants
        through the exact-path executor."""
        from linalg_solver_tpu.exact.determinant_exec import execute_process
        from linalg_solver_tpu.exact.matrix import Matrix

        rng = random.Random(8)
        for _ in range(10):
            n = rng.randint(2, 5)
            items = [
                [
                    sympy.Rational(rng.randint(-4, 4))
                    if rng.random() < 0.6 else sympy.Rational(0)
                    for _ in range(n)
                ]
                for _ in range(n)
            ]
            m = Matrix(items)
            pattern = [[x != 0 for x in row] for row in items]
            _, process = native.find_optimal_process(pattern)
            got = execute_process(m, process)
            assert got == sympy.Matrix(items).det()

    def test_native_is_default_engine(self):
        """With the library built, the package-level API uses it."""
        import linalg_solver_tpu.planner as planner_pkg

        assert planner_pkg._load_native() is not None


@pytest.mark.slow
class TestNativePerformance:
    def test_native_faster_on_larger_pattern(self):
        """The native search should comfortably beat Python on a pattern
        with substantial search space (this is the reference's hot loop)."""
        import time

        rng = random.Random(9)
        n = 7
        pattern = random_pattern(rng, n, 0.5)

        t0 = time.perf_counter()
        native.find_optimal_process(pattern)
        t_native = time.perf_counter() - t0

        t0 = time.perf_counter()
        find_optimal_process(SparsityPattern.from_bools(pattern))
        t_python = time.perf_counter() - t0

        # Not a strict benchmark, but the native engine should never be
        # slower; typically it is 10-100x faster.
        assert t_native < t_python, (t_native, t_python)


class TestNativeTreeSoundness:
    def test_full_tree_soundness_randomized(self):
        """The native engine's remap must also fix up minor coordinate
        systems (full-tree nz validation)."""
        from tests.test_planner import _validate_tree

        rng = random.Random(23)
        for _ in range(10):
            n = rng.randint(3, 6)
            pattern = random_pattern(rng, n, 0.5)
            _, proc = native.find_optimal_process(pattern)
            _validate_tree(SparsityPattern.from_bools(pattern), proc)
