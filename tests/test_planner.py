"""Planner tests: cost-model assertions on concrete patterns (mirroring the
reference's Rust unit tests, determinant.rs:969-1151), DM decomposition
invariants (dm.rs:388-541, tests.rs:122-316), and canonicalization
properties (canonical.rs:285-367, tests.rs:384-475)."""

import random

import pytest

from linalg_solver_tpu.exact.permutation import Permutation
from linalg_solver_tpu.planner import (
    AddRow,
    BlockTriangular,
    ColExpansion,
    Cost,
    Direct,
    RowExpansion,
    SparsityPattern,
    are_permutation_equivalent,
    canonicalize,
    dulmage_mendelsohn,
    find_optimal_process,
    hopcroft_karp,
    tarjan_scc,
)


def P(rows):
    return SparsityPattern.from_bools(rows)


T, F = True, False


class TestCostModel:
    def test_cost_arithmetic(self):
        c = Cost(5, 3)
        assert c.total == 8
        assert c.add_mults(2).multiplications == 7
        assert c.add_adds(2).additions == 5
        assert (c + Cost(1, 1)).total == 10

    def test_direct_costs(self):
        assert Cost.direct(0).total == 0
        assert Cost.direct(1).total == 0
        assert Cost.direct(2) == Cost(2, 1)
        assert Cost.direct(3) == Cost(6 * 2, 5)


class TestOptimalProcess:
    def test_direct_1x1(self):
        cost, proc = find_optimal_process(P([[T]]))
        assert cost.total == 0
        assert isinstance(proc.raw, Direct) and proc.raw.size == 1

    def test_direct_2x2(self):
        cost, proc = find_optimal_process(P([[T, T], [T, T]]))
        assert cost.total == 3
        assert isinstance(proc.raw, Direct) and proc.raw.size == 2

    def test_diagonal_3x3(self):
        cost, proc = find_optimal_process(
            P([[T, F, F], [F, T, F], [F, F, T]])
        )
        assert cost.multiplications == 2
        assert cost.additions == 0
        assert isinstance(proc.raw, BlockTriangular)

    def test_lower_triangular(self):
        cost, _ = find_optimal_process(
            P([[T, F, F], [T, T, F], [T, T, T]])
        )
        assert cost.total <= 5

    def test_block_diagonal_two_2x2(self):
        cost, proc = find_optimal_process(
            P([
                [T, T, F, F],
                [T, T, F, F],
                [F, F, T, T],
                [F, F, T, T],
            ])
        )
        assert isinstance(proc.raw, BlockTriangular)
        assert cost.total == 7  # two 2x2 (3 each) + 1 combine mult

    def test_full_3x3(self):
        cost, proc = find_optimal_process(
            P([[T, T, T], [T, T, T], [T, T, T]])
        )
        assert cost.total <= 14
        assert isinstance(
            proc.raw, (RowExpansion, ColExpansion, AddRow)
        )

    def test_add_row_beneficial(self):
        cost, _ = find_optimal_process(
            P([
                [T, T, T, T],
                [T, F, F, F],
                [F, T, F, F],
                [F, F, T, F],
            ])
        )
        assert cost.total < 50

    def test_zero_row_means_det_zero(self):
        cost, _ = find_optimal_process(
            P([[F, F, F], [T, T, T], [T, T, T]])
        )
        assert cost.total == 0

    def test_zero_col_means_det_zero(self):
        cost, _ = find_optimal_process(
            P([[F, T, T], [F, T, T], [F, T, T]])
        )
        assert cost.total == 0

    def test_banded_5x5(self):
        cost, _ = find_optimal_process(
            P([
                [T, T, F, F, F],
                [T, T, T, F, F],
                [F, T, T, T, F],
                [F, F, T, T, T],
                [F, F, F, T, T],
            ])
        )
        assert cost.total < 50

    def test_permutation_equivalent_same_cost(self):
        m1 = P([[T, T, F], [F, T, T], [T, F, F]])
        m2 = P([[T, F, F], [F, T, T], [T, T, F]])
        c1, _ = find_optimal_process(m1)
        c2, _ = find_optimal_process(m2)
        assert c1.total == c2.total

    def test_expected_nonzeros_match_pattern(self):
        pat = P([[T, T, F], [F, T, T], [T, F, T]])
        _, proc = find_optimal_process(pat)
        assert set(proc.expected_nonzeros.entries()) == set(
            pat.nonzero_entries()
        )


class TestHopcroftKarp:
    def test_identity(self):
        assert hopcroft_karp(P([[T, F], [F, T]])).size() == 2

    def test_full(self):
        assert hopcroft_karp(P([[T, T], [T, T]])).size() == 2

    def test_deficient(self):
        assert hopcroft_karp(P([[T, T], [F, F]])).size() == 1


class TestTarjan:
    def test_chain(self):
        assert len(tarjan_scc([[1], [2], []])) == 3

    def test_cycle(self):
        sccs = tarjan_scc([[1], [2], [0]])
        assert len(sccs) == 1 and len(sccs[0]) == 3

    def test_sinks_first(self):
        # 0 -> 1; the sink SCC {1} must come before {0}.
        sccs = tarjan_scc([[1], []])
        assert sccs[0] == [1]

    def test_deep_chain_no_recursion_limit(self):
        n = 5000
        adj = [[i + 1] for i in range(n - 1)] + [[]]
        assert len(tarjan_scc(adj)) == n


class TestDM:
    def test_identity(self):
        res = dulmage_mendelsohn(P([[T, F, F], [F, T, F], [F, F, T]]))
        assert sum(res.block_sizes) == 3
        assert res.row_perm.perm == [0, 1, 2]
        assert res.col_perm.perm == [0, 1, 2]

    def test_full_matrix_irreducible(self):
        res = dulmage_mendelsohn(P([[T, T, T], [T, T, T], [T, T, T]]))
        assert res.block_sizes == [3]
        assert not res.is_decomposable

    def test_block_diagonal_identity_perm(self):
        res = dulmage_mendelsohn(
            P([
                [T, T, F, F],
                [T, T, F, F],
                [F, F, T, T],
                [F, F, T, T],
            ])
        )
        assert res.row_perm.perm == [0, 1, 2, 3]
        assert res.col_perm.perm == [0, 1, 2, 3]
        assert res.block_sizes == [2, 2]

    def test_lower_triangular_reversed(self):
        res = dulmage_mendelsohn(P([[T, F, F], [T, T, F], [T, T, T]]))
        assert res.row_perm.perm == [2, 1, 0]
        assert res.col_perm.perm == [2, 1, 0]

    def test_upper_triangular_identity(self):
        res = dulmage_mendelsohn(P([[T, T, T], [F, T, T], [F, F, T]]))
        assert res.row_perm.perm == [0, 1, 2]
        assert res.col_perm.perm == [0, 1, 2]

    def test_structurally_singular_trivial(self):
        res = dulmage_mendelsohn(P([[T, T], [F, F]]))
        assert res.block_sizes == [2]

    def test_permuted_block_diagonal_recovered(self):
        # Random block-diagonal scrambled by P, Q: DM must produce a
        # decomposition at least as fine, with sizes summing to n, and the
        # permuted matrix must be truly upper block triangular.
        rng = random.Random(7)
        for _ in range(20):
            sizes = [rng.randint(1, 3) for _ in range(3)]
            n = sum(sizes)
            dense = [[False] * n for _ in range(n)]
            off = 0
            for s in sizes:
                for i in range(s):
                    for j in range(s):
                        dense[off + i][off + j] = True
                off += s
            rp = list(range(n))
            cp = list(range(n))
            rng.shuffle(rp)
            rng.shuffle(cp)
            scrambled = [
                [dense[rp[i]][cp[j]] for j in range(n)] for i in range(n)
            ]
            res = dulmage_mendelsohn(P(scrambled))
            assert sum(res.block_sizes) == n
            assert len(res.block_sizes) >= len(sizes)
            # Verify upper block-triangular structure after permutation.
            pat = P(scrambled)
            perm_rows = res.row_perm.perm
            perm_cols = res.col_perm.perm
            block_of = []
            for b, s in enumerate(res.block_sizes):
                block_of.extend([b] * s)
            for i in range(n):
                for j in range(n):
                    if pat.get(perm_rows[i], perm_cols[j]):
                        assert block_of[i] <= block_of[j]


class TestCanonical:
    def test_deterministic(self):
        m = P([[T, T, F], [F, T, T], [T, F, T]])
        c1, c2 = canonicalize(m), canonicalize(m)
        assert c1.canonical_hash == c2.canonical_hash
        assert c1.row_perm == c2.row_perm
        assert c1.col_perm == c2.col_perm

    def test_permutation_invariance(self):
        rng = random.Random(3)
        for _ in range(10):
            n = rng.randint(2, 5)
            base = [
                [rng.random() < 0.5 for _ in range(n)] for _ in range(n)
            ]
            h0 = canonicalize(P(base)).canonical_hash
            for _ in range(5):
                rp = list(range(n))
                cp = list(range(n))
                rng.shuffle(rp)
                rng.shuffle(cp)
                permuted = [
                    [base[rp[i]][cp[j]] for j in range(n)] for i in range(n)
                ]
                assert canonicalize(P(permuted)).canonical_hash == h0
                assert are_permutation_equivalent(P(base), P(permuted))

    def test_distinguishes_structures(self):
        m1 = P([[T, T, F], [F, T, T], [T, F, F]])
        m2 = P([[T, F, F], [F, T, F], [F, F, T]])
        assert not are_permutation_equivalent(m1, m2)

    def test_different_nnz_not_equivalent(self):
        assert not are_permutation_equivalent(
            P([[T, T], [T, T]]), P([[T, T], [T, F]])
        )

    def test_canonical_perm_valid(self):
        m = P([[T, F, T], [T, T, F], [F, F, T]])
        c = canonicalize(m)
        assert sorted(c.row_perm.perm) == [0, 1, 2]
        assert sorted(c.col_perm.perm) == [0, 1, 2]


class TestRemap:
    def test_cache_remap_consistency(self):
        # Running the planner twice on a pattern and its permuted twin must
        # yield processes whose top-level expected nonzeros match each
        # pattern's own coordinates.
        rng = random.Random(11)
        for _ in range(10):
            n = rng.randint(3, 5)
            base = [
                [rng.random() < 0.6 for _ in range(n)] for _ in range(n)
            ]
            rp = list(range(n))
            cp = list(range(n))
            rng.shuffle(rp)
            rng.shuffle(cp)
            permuted = [
                [base[rp[i]][cp[j]] for j in range(n)] for i in range(n)
            ]
            for pat in (P(base), P(permuted)):
                cost, proc = find_optimal_process(pat)
                assert set(proc.expected_nonzeros.entries()) == set(
                    pat.nonzero_entries()
                ), "process must be expressed in the pattern's coordinates"


class TestPermutationAlgebra:
    def test_identity(self):
        p = Permutation.id(5)
        assert p.is_id() and len(p) == 5
        assert p.sign() == 1
        assert p.cformat() == r"\text{id}"

    def test_sign(self):
        assert Permutation([1, 0]).sign() == -1
        assert Permutation([1, 2, 0]).sign() == 1

    def test_compose(self):
        p1 = Permutation([1, 0, 2])
        p2 = Permutation([0, 2, 1])
        composed = p1.compose(p2)
        assert [composed(i) for i in range(3)] == [1, 2, 0]

    def test_inverse(self):
        p = Permutation([2, 0, 1])
        assert p.compose(p.inverse()).is_id()

    def test_cformat_cycles(self):
        assert Permutation([1, 0, 2]).cformat() == "(1 2)"
        assert Permutation([1, 2, 0]).cformat() == "(1 2 3)"

    def test_cost(self):
        assert Permutation.id(4).cost() == 0
        assert Permutation([1, 0, 3, 2]).cost() == 2
        assert Permutation([1, 2, 0]).cost() == 2

    def test_try_get_one_transpose(self):
        assert Permutation([1, 0, 2]).try_get_one_transpose() == (0, 1)
        assert Permutation([1, 2, 0]).try_get_one_transpose() is None

    def test_invalid_raises(self):
        import pytest

        with pytest.raises(ValueError):
            Permutation([0, 0])
        with pytest.raises(ValueError):
            Permutation([0, 5])


def _validate_tree(pattern: "SparsityPattern", process, rows=None, cols=None):
    """Structural soundness: at every node, the process's expected nonzeros
    must equal the pattern restricted to (rows, cols) — including inside
    expansion minors, block-triangular blocks and AddRow results.  This is
    the full-tree version of the executor's runtime sparsity check."""
    from linalg_solver_tpu.planner import (
        AddRow as _AddRow,
        BlockTriangular as _BT,
        ColExpansion as _CE,
        Direct as _D,
        RowExpansion as _RE,
    )

    if rows is None:
        rows = list(range(pattern.rows))
    if cols is None:
        cols = list(range(pattern.cols))
    actual = {
        (i, j)
        for i in range(len(rows))
        for j in range(len(cols))
        if pattern.get(rows[i], cols[j])
    }
    raw = process.raw
    if not isinstance(raw, _AddRow):
        assert set(process.expected_nonzeros.entries()) == actual, (
            rows, cols, sorted(actual),
            process.expected_nonzeros.entries(),
        )
    if isinstance(raw, _RE):
        sub_rows = [r for i, r in enumerate(rows) if i != raw.row]
        for c, sub in raw.minors:
            sub_cols = [x for i, x in enumerate(cols) if i != c]
            _validate_tree(pattern, sub, sub_rows, sub_cols)
    elif isinstance(raw, _CE):
        sub_cols = [x for i, x in enumerate(cols) if i != raw.col]
        for r, sub in raw.minors:
            sub_rows = [x for i, x in enumerate(rows) if i != r]
            _validate_tree(pattern, sub, sub_rows, sub_cols)
    elif isinstance(raw, _BT):
        arp = [rows[i] for i in raw.row_perm]
        acp = [cols[i] for i in raw.col_perm]
        offset = 0
        for block in raw.blocks:
            size = block.size
            _validate_tree(
                pattern, block,
                arp[offset:offset + size], acp[offset:offset + size],
            )
            offset += size
    elif isinstance(raw, _AddRow):
        # Apply the symbolic row operation, then validate the result tree.
        import copy

        bits = [
            [pattern.get(rows[i], cols[j]) for j in range(len(cols))]
            for i in range(len(rows))
        ]
        for j in range(len(cols)):
            bits[raw.dst][j] = bits[raw.dst][j] or bits[raw.src][j]
        bits[raw.dst][raw.pivot_col] = False
        sub_pattern = SparsityPattern.from_bools(bits)
        _validate_tree(
            pattern=sub_pattern, process=raw.result,
            rows=list(range(len(rows))), cols=list(range(len(cols))),
        )


@pytest.mark.slow
class TestProcessTreeSoundness:
    def test_regression_cached_minor_coordinates(self):
        """Regression: remapped cache hits must fix up expansion minors'
        local coordinate systems (sorted-remaining order changes under
        permutation).  This exact matrix used to trip the executor's
        sparsity check (and would trip the reference's too)."""
        M = [
            [0, 2, 0, -2, 0, -1],
            [0, -1, 3, 0, 2, 0],
            [0, 0, 2, 0, -3, 1],
            [0, 0, -1, 0, 0, 2],
            [0, 0, 0, -1, -3, 3],
            [2, -1, -1, 0, 0, 0],
        ]
        pattern = SparsityPattern.from_bools(
            [[x != 0 for x in row] for row in M]
        )
        _, proc = find_optimal_process(pattern)
        _validate_tree(pattern, proc)

        import sympy

        from linalg_solver_tpu.exact.determinant_exec import execute_process
        from linalg_solver_tpu.exact.matrix import Matrix
        from linalg_solver_tpu.utils.trace import nest_logger

        m = Matrix([[sympy.Rational(x) for x in row] for row in M])
        with nest_logger():
            got = execute_process(m, proc)
        assert got == sympy.Matrix(M).det()

    def test_full_tree_soundness_randomized(self):
        rng = random.Random(17)
        for _ in range(12):
            n = rng.randint(3, 6)
            pattern = SparsityPattern.from_bools(
                [
                    [rng.random() < 0.5 for _ in range(n)]
                    for _ in range(n)
                ]
            )
            _, proc = find_optimal_process(pattern)
            _validate_tree(pattern, proc)
