"""Matmul precision control.

On TPU, JAX's default matmul precision for float32 operands is a single
bfloat16 pass — fine for neural nets, but it injects ~1e-3 relative error
per contraction, which is catastrophic for linear algebra (generated
spectra off by 6e-2, solve residuals stuck at 2.6e-3).  The framework's
numerical kernels trace under ``float32`` matmul precision; apply
``f32_matmuls`` to any jitted function whose body issues matmuls.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace ``fn`` under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
