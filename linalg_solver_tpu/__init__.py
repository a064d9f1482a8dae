"""linalg_solver_tpu — a TPU-native dense linear algebra framework.

Two complementary paths behind one API:

- **Exact host path** (``linalg_solver_tpu.exact``): element-generic
  matrices over exact scalars with a composable LaTeX derivation trace —
  full capability parity with the reference ``linalg_solver`` package.
- **TPU numeric path** (``linalg_solver_tpu.ops`` / ``.models`` /
  ``.parallel``): HBM-resident batches of matrices driven through blocked
  Pallas LU / Gauss–Jordan kernels under ``jit``/``shard_map``, with
  device-recorded pivot events replayed into the same trace layer.

The combinatorial determinant planner (``linalg_solver_tpu.planner``) is
shared: pure-Python engine plus a C++ native engine (``csrc/``).
"""

from .exact import (
    AffineSubspace,
    DiagonalizationResult,
    Matrix,
    NoSolution,
    Permutation,
    Polynomial,
    RandomMatrixBuilder,
    RowColPermutation,
    gen_diagonalizable_matrix,
    gen_jordan_matrix,
    gen_matrix_with_jordan_blocks,
    gen_matrix_with_rank,
    gen_regular_matrix,
    gen_unimodular_matrix,
    raw_gen_rand_matrix,
)
from .utils import (
    Logger,
    capture_logs,
    cformat,
    global_logger,
    ignore_log,
    log,
    make_latex_augmented_matrix,
    make_latex_matrix,
    make_latex_vector,
    make_latex_vertical_augmented_matrix,
    nest_appending_logger,
    nest_logger,
)

__version__ = "0.1.0"

__all__ = [
    "Matrix",
    "Polynomial",
    "Permutation",
    "RowColPermutation",
    "AffineSubspace",
    "NoSolution",
    "DiagonalizationResult",
    "RandomMatrixBuilder",
    "raw_gen_rand_matrix",
    "gen_regular_matrix",
    "gen_matrix_with_rank",
    "gen_jordan_matrix",
    "gen_matrix_with_jordan_blocks",
    "gen_diagonalizable_matrix",
    "gen_unimodular_matrix",
    "cformat",
    "make_latex_matrix",
    "make_latex_vector",
    "make_latex_augmented_matrix",
    "make_latex_vertical_augmented_matrix",
    "log",
    "Logger",
    "global_logger",
    "nest_logger",
    "nest_appending_logger",
    "ignore_log",
    "capture_logs",
]
