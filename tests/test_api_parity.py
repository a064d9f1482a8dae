"""API parity contract: every public symbol of the reference
(koskja/linalg-solver) must exist here — the package facade
(reference __init__.py:24-45), the Matrix surface (linalg.py),
Permutation/RowColPermutation (permutation.rs pymethods), the planner
module surface (lib.rs registrations), Polynomial, the builder, and the
log/fmt helpers.  A user of the reference must find everything."""

import linalg_solver_tpu as pkg
import linalg_solver_tpu.planner as planner_pkg
from linalg_solver_tpu.utils import fmt, trace


def _missing(obj, names):
    return [n for n in names if not hasattr(obj, n)]


def test_package_facade():
    assert _missing(pkg, [
        "Matrix", "Polynomial", "Permutation", "RandomMatrixBuilder",
        "raw_gen_rand_matrix", "gen_regular_matrix", "gen_matrix_with_rank",
        "gen_jordan_matrix", "gen_matrix_with_jordan_blocks",
        "gen_diagonalizable_matrix", "gen_unimodular_matrix",
        "cformat", "make_latex_matrix", "make_latex_vector",
        "make_latex_augmented_matrix", "make_latex_vertical_augmented_matrix",
        "log", "nest_logger", "nest_appending_logger", "ignore_log",
        "capture_logs",
    ]) == []


def test_matrix_surface():
    assert _missing(pkg.Matrix, [
        "rows", "cols", "self_map", "get_row", "get_col",
        "inorder_slot_iter", "multi_add", "scalar_mul", "determinant",
        "direct_determinant", "to_block_matrix", "from_block_matrix",
        "zero", "identity", "diagonal", "new_vector", "eigenvalues",
        "transpose", "AffineSubspace", "NoSolution", "row_reduce",
        "find_preimage_of", "inverse", "rank", "kernel", "find_eigenspace",
        "DiagonalizationResult", "eigenvalues_with_geometric_multiplicities",
        "simplify", "diagonalize", "set_item", "is_upper_triangular",
        "is_lower_triangular", "minor",
    ]) == []


def test_permutation_surfaces():
    p = pkg.Permutation([0])
    assert _missing(p, [
        "perm", "sign", "cost", "cycle_decomposition", "cformat",
        "is_id", "inverse", "try_get_one_transpose",
    ]) == []
    rc = pkg.RowColPermutation([0], [0])
    assert _missing(rc, [
        "row_perm", "col_perm", "cost", "try_transpose", "with_transpose",
        "matrix_transpose", "to_rows_cols_permutations", "inverse", "is_id",
    ]) == []


def test_planner_surface():
    assert _missing(planner_pkg, [
        "find_optimal_determinant_process", "dm_decomposition",
        "canonicalize_matrix", "check_permutation_equivalent",
        "Process", "Cost", "Direct", "RowExpansion", "ColExpansion",
        "BlockTriangular", "AddRow", "Nonzeros", "DMResult",
        "CanonicalForm", "OptimalProcessResult",
    ]) == []


def test_polynomial_and_builder_surfaces():
    q = pkg.Polynomial({1: 1})
    assert _missing(q, [
        "powers", "var", "multi_add", "remove_root", "factor_roots",
        "radical_roots", "cformat",
    ]) == []
    b = pkg.RandomMatrixBuilder()
    assert _missing(b, [
        "new", "with_size", "with_rank", "with_dist", "with_eigenvalues",
        "with_jordan_blocks", "build", "build_sized", "build_random",
        "build_full_rank", "build_rank", "build_diagonalizable",
        "build_jordan", "build_jordanized", "assert_requirements",
        "is_square",
    ]) == []


def test_log_and_fmt_surfaces():
    assert _missing(trace, [
        "Logger", "push_logger", "pop_logger", "log", "raw_log",
        "nest_logger", "nest_appending_logger", "capture_logs",
        "ignore_log", "global_logger",
    ]) == []
    assert _missing(fmt, [
        "pcformat", "cformat", "pretty_print_arithmetic",
        "make_latex_matrix", "make_latex_vector",
        "make_latex_augmented_matrix", "multi_add", "multi_add_vargs",
        "prod", "multi_mul", "scalar_mul", "linear_comb",
        "make_latex_vertical_augmented_matrix",
    ]) == []
