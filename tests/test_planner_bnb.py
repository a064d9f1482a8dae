"""Branch-and-bound planner: exactness vs the exhaustive search, the
anytime mode's certificate, and the 10x10 scaling runs (VERDICT r1
item 7)."""

import random
import time

import pytest
import sympy

from linalg_solver_tpu.exact.matrix import Matrix
from linalg_solver_tpu.planner import _load_native, plan_anytime
from linalg_solver_tpu.planner.bound import (
    greedy_upper_bound,
    influential_lower_bound,
)
from linalg_solver_tpu.planner.pattern import SparsityPattern
from linalg_solver_tpu.planner.search import find_optimal_process


def _cost_tuple(c):
    return (c.multiplications, c.additions)


class TestBranchAndBound:
    def test_all_3x3_match_exhaustive(self):
        for bits in range(512):
            pat = [[(bits >> (3 * r + c)) & 1 == 1 for c in range(3)]
                   for r in range(3)]
            sp = SparsityPattern.from_bools(pat)
            c1, _ = find_optimal_process(sp, prune=True)
            c2, _ = find_optimal_process(sp, prune=False)
            assert _cost_tuple(c1) == _cost_tuple(c2), bits

    @pytest.mark.slow
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_4_to_6_match_exhaustive(self, seed):
        rng = random.Random(seed)
        for t in range(12):
            n = rng.choice([4, 4, 5, 5, 6])
            dens = rng.choice([0.3, 0.5, 0.7])
            pat = [[rng.random() < dens for _ in range(n)]
                   for _ in range(n)]
            sp = SparsityPattern.from_bools(pat)
            c1, _ = find_optimal_process(sp, prune=True)
            c2, _ = find_optimal_process(sp, prune=False)
            assert _cost_tuple(c1) == _cost_tuple(c2), (seed, t, n)

    def test_lower_bound_admissible(self):
        """influential_lower_bound <= optimal <= greedy_upper_bound on
        random patterns (the soundness contract of both bounds)."""
        rng = random.Random(9)
        for t in range(25):
            n = rng.choice([3, 4, 5])
            pat = [[rng.random() < 0.5 for _ in range(n)]
                   for _ in range(n)]
            sp = SparsityPattern.from_bools(pat)
            cost, _ = find_optimal_process(sp)
            lb = influential_lower_bound(sp)
            ub = greedy_upper_bound(sp)
            assert lb <= cost.total <= ub, (t, lb, cost.total, ub)

    def test_native_matches_python_bnb(self):
        nat = _load_native()
        if nat is None:
            pytest.skip("native planner not built")
        rng = random.Random(5)
        for t in range(10):
            n = rng.choice([4, 5, 6])
            pat = [[rng.random() < 0.5 for _ in range(n)]
                   for _ in range(n)]
            cn, _ = nat.find_optimal_process(pat)
            cp, _ = find_optimal_process(SparsityPattern.from_bools(pat))
            assert _cost_tuple(cn) == _cost_tuple(cp), (t, n)


class TestAnytime:
    def test_small_pattern_is_exact(self):
        rng = random.Random(11)
        for t in range(6):
            n = rng.choice([3, 4, 5])
            pat = [[rng.random() < 0.5 for _ in range(n)]
                   for _ in range(n)]
            sp = SparsityPattern.from_bools(pat)
            cost, proc, optimal, lb = plan_anytime(sp)
            exact_cost, _ = find_optimal_process(sp)
            assert optimal
            assert _cost_tuple(cost) == _cost_tuple(exact_cost)
            assert lb == cost.total

    def test_half_dense_10x10_certificate_and_executes(self):
        """The anytime plan on a 10x10 half-dense pattern (beyond any
        exact engine's reach) returns fast, carries an honest
        lb <= cost certificate, and its process tree EXECUTES to the
        correct determinant."""
        rng = random.Random(7)
        pat = [[rng.random() < 0.5 for _ in range(10)]
               for _ in range(10)]
        # ensure structural nonsingularity is possible but not required
        sp = SparsityPattern.from_bools(pat)
        t0 = time.time()
        cost, proc, optimal, lb = plan_anytime(sp, node_cap=3000)
        wall = time.time() - t0
        assert wall < 120, wall
        assert lb <= cost.total

        # execute the plan on actual values vs sympy
        from linalg_solver_tpu.exact.determinant_exec import (
            execute_process,
        )

        vals = [[sympy.Rational(rng.randint(-4, 4)) if pat[r][c] else
                 sympy.Rational(0) for c in range(10)]
                for r in range(10)]
        m = Matrix([list(r) for r in vals])
        got = execute_process(m, proc)
        want = sympy.Matrix(
            [[v for v in row] for row in vals]
        ).det()
        assert sympy.simplify(got - want) == 0

    @pytest.mark.slow
    def test_banded_10x10_exact_in_reasonable_time(self):
        """A banded 10x10 plans EXACTLY (the sparse regime the planner
        exists for)."""
        pat = [[abs(i - j) <= 1 for j in range(10)] for i in range(10)]
        nat = _load_native()
        engine = (
            (lambda p: nat.find_optimal_process(p))
            if nat is not None else
            (lambda p: find_optimal_process(
                SparsityPattern.from_bools(p)))
        )
        t0 = time.time()
        cost, _ = engine(pat)
        wall = time.time() - t0
        assert wall < 120, wall
        assert cost.total > 0
