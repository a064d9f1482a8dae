"""Device mesh construction and sharding helpers.

The framework's scaling axes (SURVEY.md §2.3, §5):

- ``dp`` — data parallelism over the matrix batch: each chip owns a slice
  of ``[B, N, N]``; the core kernels need no cross-chip communication,
  collectives appear only for metrics/gradient reduction.
- ``tp`` — tensor parallelism inside a matrix: the contraction dimension
  of the matmul-heavy paths (preconditioner application, Faddeev–LeVerrier
  powers) is sharded and reduced with ``psum`` over ICI.

The reference is single-process (SURVEY.md §2.3); this module is the
TPU-native scaling story replacing it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 2-axis ``("dp", "tp")`` mesh.  ``dp`` defaults to
    ``len(devices) // tp``."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        if len(devices) % tp:
            raise ValueError(
                f"{len(devices)} devices not divisible by tp={tp}"
            )
        dp = len(devices) // tp
    if dp * tp > len(devices):
        raise ValueError(
            f"mesh {dp}x{tp} needs {dp * tp} devices, have {len(devices)}"
        )
    grid = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def batch_spec() -> P:
    """Batch-of-matrices sharding: batch over dp, matrices unsharded."""
    return P("dp", None, None)


def batch_vec_spec() -> P:
    return P("dp", None)


def replicated_spec(ndim: int) -> P:
    return P(*([None] * ndim))


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a ``[B, ...]`` array with its batch axis sharded over dp."""
    spec = P("dp", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(
        x, NamedSharding(mesh, replicated_spec(x.ndim))
    )
