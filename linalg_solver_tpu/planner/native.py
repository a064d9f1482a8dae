"""ctypes binding to the C++ native planner (csrc/planner.cpp).

The shared library returns JSON which this module deserializes into the
same ``Process`` / ``Cost`` / ``DMResult`` / ``CanonicalForm`` objects the
pure-Python engine produces, so the executor and all downstream code are
engine-agnostic.  If the library is missing, a one-shot ``make -C csrc``
is attempted (g++ is part of the image); failures simply disable the
native engine.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import List, Optional, Tuple

from ..exact.permutation import Permutation
from .canonical import CanonicalForm
from .dm import DMResult
from .process import (
    AddRow,
    BlockTriangular,
    ColExpansion,
    Cost,
    Direct,
    Nonzeros,
    Process,
    RowExpansion,
)

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_LIB_PATH = os.path.join(_REPO_ROOT, "csrc", "build", "libplanner.so")

_lib = None
_load_failed = False


def _try_build() -> bool:
    csrc = os.path.join(_REPO_ROOT, "csrc")
    if not os.path.exists(os.path.join(csrc, "Makefile")):
        return False
    try:
        subprocess.run(
            ["make", "-C", csrc],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.planner_find_optimal.restype = ctypes.c_void_p
        lib.planner_find_optimal.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.planner_dm.restype = ctypes.c_void_p
        lib.planner_dm.argtypes = lib.planner_find_optimal.argtypes
        lib.planner_canonicalize.restype = ctypes.c_void_p
        lib.planner_canonicalize.argtypes = lib.planner_find_optimal.argtypes
        lib.planner_perm_equivalent.restype = ctypes.c_int
        lib.planner_perm_equivalent.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.planner_free.restype = None
        lib.planner_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _load_failed = True
        return None
    return _lib


def is_available() -> bool:
    return _load() is not None


def _pattern_bytes(matrix: List[List[bool]]) -> Tuple[bytes, int, int]:
    rows = len(matrix)
    cols = len(matrix[0]) if rows else 0
    data = bytes(
        1 if matrix[r][c] else 0 for r in range(rows) for c in range(cols)
    )
    return data, rows, cols


def _call_json(fn, *args) -> Optional[dict]:
    lib = _load()
    ptr = fn(*args)
    if not ptr:
        return None
    try:
        return json.loads(ctypes.string_at(ptr).decode())
    finally:
        lib.planner_free(ptr)


def _parse_process(node: dict, size_hint: int) -> Process:
    kind = node["kind"]
    nz_entries = [(r, c) for r, c in node["nz"]]

    if kind == "Direct":
        raw = Direct(node["size"])
        dims = node["size"]
    elif kind in ("RowExpansion", "ColExpansion"):
        minors = [
            (idx, _parse_process(sub, size_hint - 1))
            for idx, sub in node["minors"]
        ]
        dims = size_hint
        if kind == "RowExpansion":
            raw = RowExpansion(node["row"], minors)
        else:
            raw = ColExpansion(node["col"], minors)
    elif kind == "BlockTriangular":
        row_perm = Permutation(node["row_perm"], _validate=False)
        col_perm = Permutation(node["col_perm"], _validate=False)
        blocks = []
        for sub in node["blocks"]:
            blocks.append(_parse_process(sub, _node_size(sub)))
        raw = BlockTriangular(blocks, row_perm, col_perm)
        dims = len(row_perm)
    elif kind == "AddRow":
        result = _parse_process(node["result"], size_hint)
        raw = AddRow(node["src"], node["dst"], node["pivot_col"], result)
        dims = size_hint
    else:
        raise ValueError(f"Unknown process kind: {kind}")

    return Process(raw, Nonzeros(dims, dims, nz_entries))


def _node_size(node: dict) -> int:
    kind = node["kind"]
    if kind == "Direct":
        return node["size"]
    if kind in ("RowExpansion", "ColExpansion"):
        if node["minors"]:
            return 1 + _node_size(node["minors"][0][1])
        return 1
    if kind == "BlockTriangular":
        return len(node["row_perm"])
    if kind == "AddRow":
        return _node_size(node["result"])
    raise ValueError(f"Unknown process kind: {kind}")


def find_optimal_process(
    matrix: List[List[bool]],
) -> Tuple[Cost, Process]:
    data, rows, cols = _pattern_bytes(matrix)
    lib = _load()
    obj = _call_json(lib.planner_find_optimal, data, rows, cols)
    if obj is None:
        raise RuntimeError("native planner rejected the pattern")
    cost = Cost(obj["cost"]["mults"], obj["cost"]["adds"])
    process = _parse_process(obj["process"], rows)
    return cost, process


def dm_decomposition(matrix: List[List[bool]]) -> DMResult:
    data, rows, cols = _pattern_bytes(matrix)
    lib = _load()
    obj = _call_json(lib.planner_dm, data, rows, cols)
    if obj is None:
        raise RuntimeError("native planner rejected the pattern")
    return DMResult(
        Permutation(obj["row_perm"], _validate=False),
        Permutation(obj["col_perm"], _validate=False),
        list(obj["block_sizes"]),
    )


def canonicalize_matrix(matrix: List[List[bool]]) -> CanonicalForm:
    data, rows, cols = _pattern_bytes(matrix)
    lib = _load()
    obj = _call_json(lib.planner_canonicalize, data, rows, cols)
    if obj is None:
        raise RuntimeError("native planner rejected the pattern")
    return CanonicalForm(
        Permutation(obj["row_perm"], _validate=False),
        Permutation(obj["col_perm"], _validate=False),
        int(obj["hash"]),
    )


def check_permutation_equivalent(
    a: List[List[bool]], b: List[List[bool]]
) -> bool:
    da, rows, cols = _pattern_bytes(a)
    db, rb, cb = _pattern_bytes(b)
    if (rows, cols) != (rb, cb):
        return False
    lib = _load()
    res = lib.planner_perm_equivalent(da, db, rows, cols)
    if res < 0:
        raise RuntimeError("native planner rejected the pattern")
    return bool(res)
