"""Structured random matrix generation (exact host path).

Fluent ``RandomMatrixBuilder`` producing matrices that are unconstrained,
full-rank, of prescribed rank r (= A·B with A m×r, B r×n both full rank),
diagonalizable with prescribed eigenvalues (P⁻¹DP), or similar to a
prescribed Jordan form (P⁻¹JP).  Similarity transforms use unimodular
matrices L·U with ±1 diagonals, so P⁻¹ stays integral.

All internal products run under ``ignore_log`` so generation stays silent.

The batched on-device generators live in ``linalg_solver_tpu.ops.generate``;
this module is their exact single-matrix counterpart.

Capability parity with /root/reference/linalg_solver/random_matrix.py:7-267.
"""

from __future__ import annotations

import random
from typing import Any, Callable, List, Optional, Tuple

from ..utils.trace import ignore_log
from .matrix import Matrix

Dist = Callable[[], Any]


def _default_dist() -> int:
    return random.randint(-5, 5)


class RandomMatrixBuilder:
    def __init__(self) -> None:
        self.rank: Optional[int] = None
        self.eigenvalues: Optional[List[Tuple[Any, int]]] = None
        self.jordan_blocks: Optional[List[Tuple[Any, int]]] = None
        self.do_randomize_from_diagonal_form: bool = True
        self.num_rows: Optional[int] = None
        self.num_cols: Optional[int] = None
        self.dist: Optional[Dist] = None

    @classmethod
    def new(cls, **kwargs) -> "RandomMatrixBuilder":
        builder = cls()
        for key, value in kwargs.items():
            setattr(builder, key, value)
        return builder

    # -- fluent configuration ---------------------------------------------
    def with_size(self, num_rows: int, num_cols: int) -> "RandomMatrixBuilder":
        self.num_rows = num_rows
        self.num_cols = num_cols
        return self

    def with_rank(self, rank: int) -> "RandomMatrixBuilder":
        self.rank = rank
        return self

    def with_dist(self, dist: Optional[Dist]) -> "RandomMatrixBuilder":
        self.dist = dist
        return self

    def with_eigenvalues(self, eigenvalues) -> "RandomMatrixBuilder":
        if isinstance(eigenvalues[0], tuple):
            self.eigenvalues = eigenvalues
        else:
            self.eigenvalues = [(e, 1) for e in eigenvalues]
        return self

    def with_jordan_blocks(
        self, blocks: List[Tuple[Any, int]]
    ) -> "RandomMatrixBuilder":
        self.jordan_blocks = blocks
        return self

    # -- validation --------------------------------------------------------
    def is_square(self) -> bool:
        return self.num_rows == self.num_cols

    def assert_requirements(self) -> None:
        if self.eigenvalues is not None:
            assert self.is_square(), "Diagonalizable matrix must be square."
            assert sum(m for _, m in self.eigenvalues) == self.num_rows, (
                "Sum of eigenvalue multiplicities must match matrix size."
            )
            assert self.rank is None, "Cannot specify both eigenvalues and rank."
            assert self.jordan_blocks is None, (
                "Cannot specify both eigenvalues and Jordan blocks."
            )
        if self.rank is not None:
            assert self.rank <= min(self.num_rows, self.num_cols), (
                "Rank cannot exceed min(num_rows, num_cols)."
            )
            assert self.eigenvalues is None, (
                "Cannot specify both rank and eigenvalues."
            )
            assert self.jordan_blocks is None, (
                "Cannot specify both rank and Jordan blocks."
            )
        if self.jordan_blocks is not None:
            assert self.is_square(), "Jordan block matrix must be square."
            assert sum(s for _, s in self.jordan_blocks) == self.num_rows, (
                "Sum of Jordan block sizes must match matrix size."
            )
            assert self.eigenvalues is None, (
                "Cannot specify both Jordan blocks and eigenvalues."
            )
            assert self.rank is None, (
                "Cannot specify both Jordan blocks and rank."
            )

    # -- build dispatch ----------------------------------------------------
    def build_sized(self, num_rows: int, num_cols: Optional[int] = None) -> Matrix:
        self.num_rows = num_rows
        self.num_cols = num_cols if num_cols is not None else num_rows
        return self.build()

    def build(self) -> Matrix:
        self.assert_requirements()
        if self.jordan_blocks is not None:
            return self.build_jordanized()
        if self.eigenvalues is not None:
            return self.build_diagonalizable()
        if self.rank is not None:
            if (
                self.rank == min(self.num_rows, self.num_cols)
                and self.num_rows == self.num_cols
            ):
                return self.build_full_rank()
            return self.build_rank()
        return self.build_random()

    # -- strategies ---------------------------------------------------------
    def build_random(self) -> Matrix:
        dist = self.dist or _default_dist
        return Matrix(
            [[dist() for _ in range(self.num_cols)] for _ in range(self.num_rows)]
        )

    def build_full_rank(self) -> Matrix:
        dist = self.dist or _default_dist
        N = self.num_rows
        while True:
            candidate = Matrix([[dist() for _ in range(N)] for _ in range(N)])
            if candidate.rank() == N:
                return candidate

    def build_rank(self) -> Matrix:
        dist = self.dist or _default_dist
        rows, cols, rank = self.num_rows, self.num_cols, self.rank
        while True:
            A = Matrix([[dist() for _ in range(rank)] for _ in range(rows)])
            if A.rank() == rank:
                break
        while True:
            B = Matrix([[dist() for _ in range(cols)] for _ in range(rank)])
            if B.rank() == rank:
                break
        return ignore_log(lambda: A * B)

    def build_diagonalizable(self) -> Matrix:
        N = self.num_rows
        diag: List[Any] = []
        for eig, mult in self.eigenvalues:
            diag.extend([eig] * mult)
        D = Matrix.diagonal(diag)
        if not self.do_randomize_from_diagonal_form:
            return D
        P = gen_unimodular_matrix(N)
        P_inv = P.inverse()
        return ignore_log(lambda: P_inv * D * P)

    def build_jordan(self) -> Matrix:
        N = self.num_rows
        total = sum(size for _, size in self.jordan_blocks)
        if total != N:
            raise ValueError(
                f"Sum of Jordan block sizes ({total}) must equal matrix "
                f"size ({N})"
            )
        J = [[0 for _ in range(N)] for _ in range(N)]
        pos = 0
        for eigenvalue, size in self.jordan_blocks:
            for i in range(size):
                J[pos + i][pos + i] = eigenvalue
                if i < size - 1:
                    J[pos + i][pos + i + 1] = 1
            pos += size
        return Matrix(J)

    def build_jordanized(self) -> Matrix:
        J = self.build_jordan()
        N = self.num_rows
        P = gen_unimodular_matrix(N)
        P_inv = P.inverse()
        return ignore_log(lambda: P_inv * J * P)


# ---------------------------------------------------------------------------
# Convenience generators
# ---------------------------------------------------------------------------

def raw_gen_rand_matrix(
    rows: int, cols: int, dist: Optional[Dist] = None
) -> Matrix:
    return (
        RandomMatrixBuilder.new()
        .with_size(rows, cols)
        .with_dist(dist)
        .build_random()
    )


def gen_regular_matrix(N: int, dist: Optional[Dist] = None) -> Matrix:
    return (
        RandomMatrixBuilder.new()
        .with_size(N, N)
        .with_dist(dist)
        .build_full_rank()
    )


def gen_matrix_with_rank(
    rows: int, cols: int, rank: Optional[int] = None,
    dist: Optional[Dist] = None,
) -> Matrix:
    return (
        RandomMatrixBuilder.new()
        .with_size(rows, cols)
        .with_rank(rank or min(rows, cols))
        .with_dist(dist)
        .build_rank()
    )


def gen_jordan_matrix(N: int, blocks: List[Tuple[Any, int]]) -> Matrix:
    return (
        RandomMatrixBuilder.new()
        .with_size(N, N)
        .with_jordan_blocks(blocks)
        .build_jordan()
    )


def gen_matrix_with_jordan_blocks(
    N: int, blocks: List[Tuple[Any, int]], dist: Optional[Dist] = None
) -> Matrix:
    return (
        RandomMatrixBuilder.new()
        .with_size(N, N)
        .with_jordan_blocks(blocks)
        .with_dist(dist)
        .build_jordanized()
    )


def gen_diagonalizable_matrix(
    N: int,
    eigenvalues: Optional[List[Tuple[Any, int]]] = None,
    dist: Optional[Dist] = None,
) -> Matrix:
    if eigenvalues is None:
        eigenvalues = [
            ((dist() if dist is not None else _default_dist()), 1)
            for _ in range(N)
        ]
    return (
        RandomMatrixBuilder.new()
        .with_size(N, N)
        .with_eigenvalues(eigenvalues)
        .with_dist(dist)
        .build_diagonalizable()
    )


def gen_unimodular_matrix(N: int, dist: Optional[Dist] = None) -> Matrix:
    """L·U with ±1 diagonal entries: det = ±1, hence an exact integer inverse
    — the similarity transform used by the structured builders."""
    random_sign = lambda: random.choice([-1, 1])
    if dist is None:
        dist = lambda: random.randint(-1, 1)

    U = [[0 for _ in range(N)] for _ in range(N)]
    for i in range(N):
        U[i][i] = random_sign()
        for j in range(i + 1, N):
            U[i][j] = dist()

    L = [[0 for _ in range(N)] for _ in range(N)]
    for i in range(N):
        L[i][i] = random_sign()
        for j in range(i):
            L[i][j] = dist()

    return ignore_log(lambda: Matrix(L) * Matrix(U))
