"""Exhaustive planner: minimum-scalar-op determinant strategy search.

DFS over sparsity patterns trying, in order: block-triangular decomposition
(Dulmage–Mendelsohn), Laplace expansion along every row, along every
column, and every determinant-preserving AddRow elimination that strictly
reduces the nonzero count.  Results are memoized under the WL-canonical
hash of the pattern, with processes stored in canonical coordinates and
remapped on retrieval — permutation-equivalent subproblems share one cache
entry.  A direct-cost sentinel guards recursion cycles through AddRow.

SwapRows is deliberately not a strategy: a swapped pattern is
permutation-equivalent, hits the same cache entry, and costs the same.

Mirrors /root/reference/linalg-helper/src/determinant.rs:553-967; the cost
model is the contract (direct: n!(n-1) mults + (n!-1) adds; expansion with
k nonzeros: k mults + (k-1) adds; AddRow: (src_nnz-1) mults + overlap
adds; block combine: (b-1) mults).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

from .canonical import canonicalize
from .dm import dulmage_mendelsohn
from .pattern import SparsityPattern
from .process import (
    AddRow,
    BlockTriangular,
    ColExpansion,
    Cost,
    Direct,
    Nonzeros,
    Process,
    RowExpansion,
    canonicalize_process,
    remap_process,
)

ProcessCache = Dict[int, Tuple[Cost, Process]]


def _pattern_nonzeros(pattern: SparsityPattern) -> Nonzeros:
    return Nonzeros(pattern.rows, pattern.cols, pattern.nonzero_entries())


def find_optimal_process(pattern: SparsityPattern) -> Tuple[Cost, Process]:
    """Entry point: plan the cheapest determinant strategy for ``pattern``."""
    cache: ProcessCache = {}
    return _search(pattern, cache)


def _search(pattern: SparsityPattern, cache: ProcessCache) -> Tuple[Cost, Process]:
    n = pattern.rows
    assert n == pattern.cols, "Matrix must be square"

    if n <= 2:
        return (
            Cost.direct(n),
            Process(Direct(n), _pattern_nonzeros(pattern)),
        )

    canon = canonicalize(pattern)
    cached = cache.get(canon.canonical_hash)
    if cached is not None:
        cost, proc = cached
        return (cost, remap_process(proc, canon.row_perm, canon.col_perm))

    # Sentinel: if the search re-enters this pattern (via AddRow cycles),
    # it sees the direct cost as an upper bound instead of recursing forever.
    canonical_nz = _pattern_nonzeros(pattern).permute_inv(
        canon.row_perm, canon.col_perm
    )
    cache[canon.canonical_hash] = (
        Cost.direct(n),
        Process(Direct(n), canonical_nz),
    )

    best: List[Optional[Tuple[Cost, Process]]] = [None]

    def update_best(cost: Cost, process: Process) -> None:
        if best[0] is None or cost.total < best[0][0].total:
            best[0] = (cost, process)

    _try_block_triangular(pattern, cache, update_best)
    for row in range(n):
        _try_row_expansion(pattern, row, cache, update_best)
    for col in range(n):
        _try_col_expansion(pattern, col, cache, update_best)
    _try_add_row_operations(pattern, cache, update_best)

    result = best[0]
    if result is None:
        result = (
            Cost.direct(n),
            Process(Direct(n), _pattern_nonzeros(pattern)),
        )

    cache[canon.canonical_hash] = (
        result[0],
        canonicalize_process(result[1], canon.row_perm, canon.col_perm),
    )
    return result


def _try_block_triangular(
    pattern: SparsityPattern,
    cache: ProcessCache,
    update_best: Callable[[Cost, Process], None],
) -> None:
    dm = dulmage_mendelsohn(pattern)
    if len(dm.block_sizes) <= 1:
        return

    total = Cost.zero()
    blocks: List[Process] = []
    offset = 0
    for block_size in dm.block_sizes:
        block_rows = dm.row_perm.perm[offset:offset + block_size]
        block_cols = dm.col_perm.perm[offset:offset + block_size]
        sub = pattern.submatrix(block_rows, block_cols)
        sub_cost, sub_proc = _search(sub, cache)
        total = total + sub_cost
        blocks.append(sub_proc)
        offset += block_size

    # Multiplying the block determinants together.
    total = total.add_mults(len(dm.block_sizes) - 1)

    update_best(
        total,
        Process(
            BlockTriangular(blocks, dm.row_perm, dm.col_perm),
            _pattern_nonzeros(pattern),
        ),
    )


def _try_row_expansion(
    pattern: SparsityPattern,
    row: int,
    cache: ProcessCache,
    update_best: Callable[[Cost, Process], None],
) -> None:
    n = pattern.rows
    nonzero_cols = pattern.row_neighbors(row)

    if not nonzero_cols:
        # Zero row: determinant is trivially 0, no work at all.
        update_best(
            Cost.zero(), Process(Direct(n), _pattern_nonzeros(pattern))
        )
        return

    total = Cost.zero()
    minors: List[Tuple[int, Process]] = []
    remaining_rows = [r for r in range(n) if r != row]
    for col in nonzero_cols:
        remaining_cols = [c for c in range(n) if c != col]
        sub = pattern.submatrix(remaining_rows, remaining_cols)
        sub_cost, sub_proc = _search(sub, cache)
        total = total + sub_cost
        minors.append((col, sub_proc))

    k = len(nonzero_cols)
    total = total.add_mults(k)
    if k > 1:
        total = total.add_adds(k - 1)

    update_best(
        total,
        Process(RowExpansion(row, minors), _pattern_nonzeros(pattern)),
    )


def _try_col_expansion(
    pattern: SparsityPattern,
    col: int,
    cache: ProcessCache,
    update_best: Callable[[Cost, Process], None],
) -> None:
    n = pattern.rows
    nonzero_rows = pattern.col_neighbors(col)

    if not nonzero_rows:
        update_best(
            Cost.zero(), Process(Direct(n), _pattern_nonzeros(pattern))
        )
        return

    total = Cost.zero()
    minors: List[Tuple[int, Process]] = []
    remaining_cols = [c for c in range(n) if c != col]
    for row in nonzero_rows:
        remaining_rows = [r for r in range(n) if r != row]
        sub = pattern.submatrix(remaining_rows, remaining_cols)
        sub_cost, sub_proc = _search(sub, cache)
        total = total + sub_cost
        minors.append((row, sub_proc))

    k = len(nonzero_rows)
    total = total.add_mults(k)
    if k > 1:
        total = total.add_adds(k - 1)

    update_best(
        total,
        Process(ColExpansion(col, minors), _pattern_nonzeros(pattern)),
    )


def _try_add_row_operations(
    pattern: SparsityPattern,
    cache: ProcessCache,
    update_best: Callable[[Cost, Process], None],
) -> None:
    n = pattern.rows
    nnz_before = pattern.total_nnz()
    for src in range(n):
        src_nnz = pattern.row_nnz(src)
        src_mask = pattern.row_mask(src)
        for dst in range(n):
            if src == dst:
                continue
            dst_mask = pattern.row_mask(dst)
            # Candidate pivots: columns where both rows are nonzero.
            both = src_mask & dst_mask
            while both:
                low = both & -both
                pivot_col = low.bit_length() - 1
                both ^= low

                modified = pattern.with_add_row(src, dst, pivot_col)
                if modified.total_nnz() >= nnz_before:
                    continue  # the operation must strictly help

                sub_cost, sub_proc = _search(modified, cache)
                overlap = (
                    (src_mask & dst_mask & ~(1 << pivot_col)).bit_count()
                )
                op_cost = Cost(src_nnz - 1, overlap)
                update_best(
                    op_cost + sub_cost,
                    Process(
                        AddRow(src, dst, pivot_col, sub_proc),
                        _pattern_nonzeros(pattern),
                    ),
                )
