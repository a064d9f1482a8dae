"""Backend dispatch for the hot batched kernels.

Backends:

- ``"loop"``   — XLA ``fori_loop`` reference implementations (``ops.lu``,
  ``ops.solve``); always available, correctness oracle.
- ``"pallas"`` — blocked Pallas TPU kernels (``ops.pallas``); registered
  when importable on the current platform.
- ``"xla"``    — XLA's built-in ``jnp.linalg`` routines, used as the
  external performance baseline in ``bench.py``.
- ``"auto"``   — pallas if available for the shape/dtype, else loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import lu as _lu
from .solve import inverse_batched as _gj_inverse_batched


def _pallas_available() -> bool:
    try:
        from . import pallas  # noqa: F401

        return pallas.is_supported()
    except Exception:
        return False


def _resolve(backend: str, op: str) -> str:
    if backend == "auto":
        if _pallas_available():
            from . import pallas

            if pallas.supports(op):
                return "pallas"
        return "loop"
    return backend


def lu_factor_batched(a: jax.Array, backend: str = "auto"):
    be = _resolve(backend, "lu_factor")
    if be == "pallas":
        from . import pallas

        return pallas.lu_factor_batched(a)
    return _lu.lu_factor_batched(a)


def solve_batched(a: jax.Array, b: jax.Array, backend: str = "auto"):
    be = _resolve(backend, "solve")
    if be == "pallas":
        from . import pallas

        return pallas.solve_batched(a, b)
    if be == "xla":
        return jnp.linalg.solve(a, b)
    return _lu.solve_lu_batched(a, b)


def inverse_batched(a: jax.Array, backend: str = "auto"):
    be = _resolve(backend, "inverse")
    if be == "pallas":
        from . import pallas

        return pallas.inverse_batched(a)
    if be == "xla":
        return jnp.linalg.inv(a)
    return _gj_inverse_batched(a, tol=1e-30).inverse


def det_batched(a: jax.Array, backend: str = "auto"):
    be = _resolve(backend, "det")
    if be == "pallas":
        from . import pallas

        return pallas.det_batched(a)
    if be == "xla":
        return jnp.linalg.det(a)
    return _lu.det_lu_batched(a)
