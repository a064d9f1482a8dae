"""Distributed EXTENDED-PRECISION solve: f64-class backward error for
ONE mesh-sharded system from pure f32/bf16 arithmetic.

Composes the column-block-cyclic distributed LU (`distributed_lu` —
one psum panel broadcast per phase) with the Ozaki slice-GEMM dd
residual refinement (`ops.dd`).  The residual is computed ROW-SHARDED:
each device owns a contiguous row block of A and evaluates its rows'
error-free dd residual entirely locally — a row's dot product never
crosses devices, so the extended-precision arithmetic adds ZERO
collectives (the f32-collapsed residual is then resharded by the
correction solve exactly like any right-hand side).

No reference counterpart on either axis (the reference is single-host
exact arithmetic); this is the mesh-scale version of "replace f64
hardware with error-free bf16 GEMMs".
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.dd import (
    dd_add_f32,
    matmul_sliced_dd,
    slice_cols,
    slice_rows,
)
from ..utils.precision import f32_matmuls
from .distributed_lu import (
    _build_solve_body,
    default_block,
    distributed_lu,
)

_HIGH = jax.lax.Precision.HIGHEST


class DistributedDDSolve(NamedTuple):
    x_hi: jax.Array   # [N] replicated
    x_lo: jax.Array   # [N]
    resid: jax.Array  # scalar — last dd residual max-norm
    ok: jax.Array     # scalar


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "nb", "iters", "t")
)
@f32_matmuls
def distributed_solve_dd(
    a: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    nb: Optional[int] = None,
    iters: int = 4,
    t: int = 6,
) -> DistributedDDSolve:
    """Solve one ``[N, N]`` system sharded over ``mesh[axis]`` to
    f64-class backward error (``b: [N]``): one distributed LU, then
    ``iters`` rounds of refinement with row-local error-free dd
    residuals."""
    n = a.shape[-1]
    d_axis = mesh.shape[axis]
    nb = nb or default_block(n, d_axis)

    res = distributed_lu(a, mesh, axis=axis, nb=nb)
    solve_body = _build_solve_body(n, nb, d_axis, axis)

    def corr(r):
        x = shard_map(
            solve_body,
            mesh=mesh,
            in_specs=(P(None, axis), P(None), P(None, None)),
            out_specs=P(None, None),
            check_vma=False,
        )(res.lu_sharded, res.perm, r[:, None])
        return x[:, 0]

    def resid_body(a_rows, b_rows, xh, xl):
        # [n/D, n] local rows: dd residual with no communication
        a3 = a_rows[None]
        p = matmul_sliced_dd(
            slice_rows(a3, t), slice_cols(xh[None, :, None], t)
        )
        r_hi, r_lo = dd_add_f32(
            -p.hi[0, :, 0], -p.lo[0, :, 0], b_rows
        )
        ax_lo = jnp.einsum("ij,j->i", a_rows, xl, precision=_HIGH)
        r_hi, r_lo = dd_add_f32(r_hi, r_lo, -ax_lo)
        return r_hi + r_lo

    resid_fn = shard_map(
        resid_body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )

    b = b.astype(jnp.float32)
    a = a.astype(jnp.float32)
    x_hi = corr(b)
    x_lo = jnp.zeros_like(x_hi)
    resid = jnp.asarray(jnp.inf, jnp.float32)
    for _ in range(iters):
        r = resid_fn(a, b, x_hi, x_lo)
        d = corr(r)
        x_hi, x_lo = dd_add_f32(x_hi, x_lo, d)
        resid = jnp.max(jnp.abs(r))
    scale = jnp.maximum(
        jnp.max(jnp.abs(a)) * jnp.max(jnp.abs(x_hi)),
        jnp.maximum(jnp.max(jnp.abs(b)), 1e-30),
    )
    ok = res.ok & (resid <= 1e-10 * scale)
    return DistributedDDSolve(x_hi, x_lo, resid, ok)
