"""Exact host path: compute with full LaTeX derivations.

Run: PYTHONPATH=.. python exact_derivations.py  (or PYTHONPATH=. from repo root)
"""

import sympy

from linalg_solver_tpu import (
    Matrix, Polynomial, RandomMatrixBuilder, capture_logs, log, nest_logger,
)


def q(rows):
    return Matrix([[sympy.Rational(x) for x in row] for row in rows])


def main():
    A = q([[2, 1, 0], [0, 3, 1], [1, 0, 1]])

    # Determinant with the planner-optimal strategy, derivation captured.
    latex = capture_logs(lambda: A.determinant())
    print("--- determinant derivation ---")
    print(latex)

    # Linear system -> affine solution subspace.
    with nest_logger():
        sol = A.find_preimage_of([sympy.Rational(1), 2, 3])
        print("particular solution:", sol.get_one(), "dim:", sol.dim())

    # Eigen stack: the characteristic polynomial runs the full determinant
    # machinery over Polynomial entries.  (Use a rational-spectrum matrix:
    # radical spectra work too, but sympy takes minutes on them.)
    D = q([[4, -2, 0], [1, 1, 0], [0, 0, 7]])
    with nest_logger():
        res = D.diagonalize()
    print("diagonalizable:", res.success,
          "eigenvalues:", list(res.eigenvalue_multiplicities))

    # Structured generation.
    with nest_logger():
        M = (
            RandomMatrixBuilder.new()
            .with_size(4, 4)
            .with_jordan_blocks([(2, 2), (1, 2)])
            .build()
        )
        print("jordan-similar matrix rank:", M.rank())


if __name__ == "__main__":
    main()
