"""Run the ACTUAL reference package against this framework's planner.

The reference (/root/reference) computes its determinant strategies
through a Rust PyO3 extension ``linalg_helper`` that cannot be built in
this image (no cargo/maturin).  Its *Python* package, however, only
touches three symbols of that extension at runtime:

- ``find_optimal_determinant_process``  (reference determinant.py:83)
- ``Permutation`` / ``RowColPermutation``  (reference permutation.py:1)

This module builds an in-memory ``linalg_helper`` shim backed by this
framework's planner (``linalg_solver_tpu.planner``) and permutation
algebra (``exact.permutation``), injects it into ``sys.modules``, and
imports the reference package + its ``main.py`` driver — so golden
tests can diff the reference's own ``output.tex`` byte-for-byte
against this framework's CLI output on the same seed (VERDICT r1
item 2: "golden parity" proven against the reference actually
running, not hand-mirrored strings).

The attribute shapes mirror the PyO3 classes the reference reads
(reference determinant.py:84,95-106,142-143,270,432-434,639-642):
``result.cost/.process``, ``process.raw.{direct,row_expansion,
col_expansion,block_triangular,add_row}``, ``process.expected_nonzeros
.entries()``, ``process.size``, variant fields ``row/col/minors/
blocks/row_perm/col_perm/src/dst/pivot_col/result``, and
``cost.total/.multiplications/.additions``.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"

from linalg_solver_tpu import planner as _planner
from linalg_solver_tpu.exact.permutation import (
    Permutation,
    RowColPermutation,
)
from linalg_solver_tpu.planner.process import (
    AddRow,
    BlockTriangular,
    ColExpansion,
    Cost,
    Direct,
    Nonzeros,
    Process,
    RowExpansion,
)


class _RawShim:
    """Mimics the PyO3 ``RawProcess`` enum: exactly one variant field
    is non-None (reference determinant.py:95-106 dispatches on it)."""

    __slots__ = (
        "direct", "row_expansion", "col_expansion",
        "block_triangular", "add_row",
    )

    def __init__(self):
        self.direct = None
        self.row_expansion = None
        self.col_expansion = None
        self.block_triangular = None
        self.add_row = None


class _ProcessShim:
    """Wraps a planner ``Process`` tree in the attribute shape of the
    PyO3 ``Process`` class, deep-wrapping every child subtree."""

    __slots__ = ("_p", "raw", "expected_nonzeros")

    def __init__(self, p: Process):
        self._p = p
        self.expected_nonzeros = p.expected_nonzeros
        raw = _RawShim()
        v = p.raw
        if isinstance(v, Direct):
            raw.direct = v
        elif isinstance(v, RowExpansion):
            raw.row_expansion = types.SimpleNamespace(
                row=v.row,
                minors=[(c, _ProcessShim(s)) for c, s in v.minors],
            )
        elif isinstance(v, ColExpansion):
            raw.col_expansion = types.SimpleNamespace(
                col=v.col,
                minors=[(r, _ProcessShim(s)) for r, s in v.minors],
            )
        elif isinstance(v, BlockTriangular):
            raw.block_triangular = types.SimpleNamespace(
                blocks=[_ProcessShim(b) for b in v.blocks],
                row_perm=v.row_perm,
                col_perm=v.col_perm,
            )
        elif isinstance(v, AddRow):
            raw.add_row = types.SimpleNamespace(
                src=v.src, dst=v.dst, pivot_col=v.pivot_col,
                result=_ProcessShim(v.result),
            )
        else:  # pragma: no cover
            raise TypeError(f"unknown process variant: {v!r}")
        self.raw = raw

    @property
    def size(self) -> int:
        return self._p.size


def _find_optimal_determinant_process(pattern):
    res = _planner.find_optimal_determinant_process(
        [[bool(x) for x in row] for row in pattern]
    )
    return types.SimpleNamespace(
        cost=res.cost, process=_ProcessShim(res.process)
    )


def build_linalg_helper_shim() -> types.ModuleType:
    mod = types.ModuleType("linalg_helper")
    mod.__doc__ = (
        "In-memory shim replacing the reference's Rust PyO3 extension, "
        "backed by linalg_solver_tpu.planner (see tests/reference_shim.py)."
    )
    mod.find_optimal_determinant_process = _find_optimal_determinant_process
    mod.dm_decomposition = _planner.dm_decomposition
    mod.canonicalize_matrix = _planner.canonicalize_matrix
    mod.check_permutation_equivalent = _planner.check_permutation_equivalent
    mod.Permutation = Permutation
    mod.RowColPermutation = RowColPermutation
    mod.Cost = Cost
    mod.Nonzeros = Nonzeros
    return mod


def load_reference():
    """Import the reference package + main driver with the shim
    installed.  Returns ``(linalg_solver_pkg, main_module)``."""
    if "linalg_helper" not in sys.modules:
        sys.modules["linalg_helper"] = build_linalg_helper_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    ref_pkg = importlib.import_module("linalg_solver")  # the reference
    ref_log = importlib.import_module("linalg_solver.log")

    # Silence the reference's auto-printing global logger in tests
    # (it is an INSTANCE attribute set at module import, log.py:92).
    ref_log.global_logger._auto_print = False

    spec = importlib.util.spec_from_file_location(
        "reference_main", f"{REFERENCE_ROOT}/main.py"
    )
    main_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(main_mod)
    return ref_pkg, main_mod
