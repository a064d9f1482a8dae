"""Distributed single-matrix LU: column-block-cyclic blocked LU with
partial pivoting under ``shard_map``.

The batch-parallel kernels (``ops.lu_blocked``) scale by sharding the
*batch* axis — each chip factors whole matrices.  This module scales the
other axis: ONE matrix too large (or too latency-critical) for a single
chip is factored across the mesh, ScaLAPACK-style:

- **Layout**: columns are sharded block-cyclically over a mesh axis —
  device ``d`` owns column blocks ``{j : j mod D == d}`` of width ``nb``.
  Rows are never sharded, so the two data-dependent parts of partial
  pivoting — the pivot search down a column and the row swaps — stay
  entirely device-local.  Cyclic (not contiguous) block assignment keeps
  every device busy through the whole factorization instead of idling
  devices whose columns are already finished.
- **Per phase j**: the owner's ``[N, nb]`` panel is broadcast with ONE
  masked ``psum`` (the only communication — it rides ICI), every device
  factors the panel redundantly (``O(N·nb²)`` — negligible against the
  trailing update), applies the phase's row permutation to its local
  columns, and runs the trailing GEMM ``A22 -= L21 @ (L11⁻¹ A12)`` on its
  own columns only.  Finished columns (global block ≤ j) are protected by
  a multiplicative column mask computed from the device index — the same
  SPMD program runs everywhere, XLA sees static shapes, and the masked
  flops (≤ ~1.5× the ideal trailing count) are the price of keeping the
  unrolled phase loop branch-free.
- **Solve**: block forward/backward substitution over the sharded factor;
  per block one ``[nb, nb]`` diagonal-block ``psum`` broadcast and one
  masked ``psum`` of the owner's column-block contribution.

The redundant panel factorization mirrors the reference's philosophy of
recomputing cheap steps rather than communicating (its planner re-derives
minors instead of caching values, reference determinant.py:169-185);
everything else is the TPU-native translation of the reference's
single-matrix ``row_reduce`` (reference linalg.py:534-630) to a mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.lu_blocked import (
    _panel_factor,
    invert_unit_lower,
    invert_upper,
)
from ..utils.precision import f32_matmuls
from . import comm


def cyclic_column_order(n: int, nb: int, d_axis: int) -> jnp.ndarray:
    """Global column indices in shard order: device 0's blocks (j = 0, D,
    2D, …), then device 1's (j = 1, D+1, …), …  ``a[:, order]`` is the
    array to shard contiguously over the axis."""
    m = n // nb
    idx = []
    for d in range(d_axis):
        for j in range(d, m, d_axis):
            idx.extend(range(j * nb, (j + 1) * nb))
    return jnp.asarray(idx, jnp.int32)


def _inverse_order(order: jnp.ndarray) -> jnp.ndarray:
    return jnp.argsort(order)


class DistributedLUResult(NamedTuple):
    lu_sharded: jax.Array   # [N, N] packed L\U, cyclic-shard column order
    perm: jax.Array         # [N] replicated: row i of (PA) = row perm[i]
    sign: jax.Array         # [] permutation parity
    ok: jax.Array           # [] every pivot nonzero


def _build_lu_body(n: int, nb: int, d_axis: int, axis: str, tol: float):
    """The shard_map body: factor the local column blocks in place."""
    m = n // nb

    def body(a_loc):
        dtype = a_loc.dtype
        d = lax.axis_index(axis)
        # Global block index of each local column (runtime: depends on d).
        lcols = jnp.arange(n // d_axis)
        gblock = d + (lcols // nb) * d_axis              # [N/D]

        perm = jnp.arange(n, dtype=jnp.int32)
        sign = jnp.ones((), dtype)
        ok = jnp.ones((), bool)

        for j in range(m):
            owner, lb = j % d_axis, j // d_axis
            k0 = j * nb
            is_owner = (d == owner).astype(dtype)

            # ONE collective: broadcast the owner's [N, nb] panel.
            my_block = a_loc[:, lb * nb:(lb + 1) * nb]
            panel = comm.psum(my_block * is_owner, axis)

            # Redundant local panel factorization on rows >= k0 (all
            # devices see identical data -> identical pivot choices).
            sub = panel[k0:, :]
            sub_f, local_perm, psign, pok = _panel_factor(
                sub[None], 0, nb, jnp.arange(n - k0),
                jnp.asarray(tol, dtype),
            )
            sub_f, local_perm = sub_f[0], local_perm[0]
            sign = sign * psign[0]
            ok = ok & pok[0]

            # Phase row permutation, applied to ALL local columns.
            a_loc = a_loc.at[k0:].set(
                jnp.take(a_loc[k0:], local_perm, axis=0)
            )
            perm = perm.at[k0:].set(jnp.take(perm[k0:], local_perm))

            # Owner writes its factored panel back (rows < k0 are
            # finished U rows from earlier phases — untouched).
            written = a_loc.at[k0:, lb * nb:(lb + 1) * nb].set(sub_f)
            a_loc = a_loc * (1 - is_owner) + written * is_owner

            if j + 1 < m:
                L11 = jnp.tril(sub_f[:nb], -1) + jnp.eye(nb, dtype=dtype)
                L21 = sub_f[nb:, :]                      # [N-k0-nb, nb]
                # U12 for every local column, then mask to blocks > j —
                # finished blocks (<= j, including the owner's own) must
                # not be touched.
                right = (gblock > j).astype(dtype)[None, :]
                A12 = a_loc[k0:k0 + nb, :]
                U12 = (invert_unit_lower(L11) @ A12) * right
                a_loc = a_loc.at[k0:k0 + nb, :].set(
                    U12 + A12 * (1 - right)
                )
                a_loc = a_loc.at[k0 + nb:, :].add(-(L21 @ U12))

        return a_loc, perm, sign, ok

    return body


def _build_solve_body(n: int, nb: int, d_axis: int, axis: str):
    """Block substitution over the cyclic-sharded factor."""
    m = n // nb

    def body(a_loc, perm, b):
        dtype = a_loc.dtype
        d = lax.axis_index(axis)
        k_rhs = b.shape[-1]

        pb = jnp.take(b, perm, axis=0)                   # [N, K] replicated

        # Diagonal blocks, broadcast once each.
        diags = []
        for j in range(m):
            owner, lb = j % d_axis, j // d_axis
            is_owner = (d == owner).astype(dtype)
            blk = a_loc[j * nb:(j + 1) * nb, lb * nb:(lb + 1) * nb]
            diags.append(comm.psum(blk * is_owner, axis))

        eye = jnp.eye(nb, dtype=dtype)

        # Forward: L y = P b (unit lower).
        z = pb
        ys = []
        for j in range(m):
            owner, lb = j % d_axis, j // d_axis
            k0 = j * nb
            is_owner = (d == owner).astype(dtype)
            l11i = invert_unit_lower(jnp.tril(diags[j], -1) + eye)
            y_j = l11i @ z[k0:k0 + nb]                   # [nb, K]
            ys.append(y_j)
            if j + 1 < m:
                Lbelow = a_loc[k0 + nb:, lb * nb:(lb + 1) * nb]
                contrib = comm.psum((Lbelow @ y_j) * is_owner, axis)
                z = z.at[k0 + nb:].add(-contrib)

        # Backward: U x = y.
        xs = [jnp.zeros((nb, k_rhs), dtype)] * m
        zz = jnp.concatenate(ys, axis=0)
        for j in reversed(range(m)):
            owner, lb = j % d_axis, j // d_axis
            k0 = j * nb
            is_owner = (d == owner).astype(dtype)
            u11i = invert_upper(jnp.triu(diags[j]))
            x_j = u11i @ zz[k0:k0 + nb]
            xs[j] = x_j
            if j > 0:
                Uabove = a_loc[:k0, lb * nb:(lb + 1) * nb]
                contrib = comm.psum((Uabove @ x_j) * is_owner, axis)
                zz = zz.at[:k0].add(-contrib)

        return jnp.concatenate(xs, axis=0)

    return body


def _check_args(n: int, nb: int, d_axis: int) -> None:
    if n % (nb * d_axis):
        raise ValueError(
            f"N={n} must be divisible by nb*D = {nb}*{d_axis}"
        )


def default_block(n: int, d_axis: int) -> int:
    """Largest power-of-two block width <= 128 giving each device at
    least one block."""
    nb = min(128, n // d_axis)
    while n % (nb * d_axis):
        nb //= 2
        if nb < 1:
            raise ValueError(f"no valid block width for N={n}, D={d_axis}")
    return nb


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "nb", "tol")
)
@f32_matmuls
def distributed_lu(
    a: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    nb: Optional[int] = None,
    tol: float = 0.0,
) -> DistributedLUResult:
    """Factor ``P A = L U`` for one ``[N, N]`` matrix sharded over
    ``mesh[axis]``.  Returns the packed factor in cyclic column order
    (see ``cyclic_column_order``), the row permutation, parity and ok."""
    n = a.shape[-1]
    d_axis = mesh.shape[axis]
    nb = nb or default_block(n, d_axis)
    _check_args(n, nb, d_axis)

    order = cyclic_column_order(n, nb, d_axis)
    a_cyc = a[:, order]

    body = _build_lu_body(n, nb, d_axis, axis, tol)
    lu_s, perm, sign, ok = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=(P(None, axis), P(None), P(), P()),
        check_vma=False,
    )(a_cyc)
    return DistributedLUResult(lu_s, perm, sign, ok)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "nb", "tol")
)
@f32_matmuls
def distributed_solve(
    a: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    nb: Optional[int] = None,
    tol: float = 0.0,
) -> jax.Array:
    """Solve ``a @ x = b`` (``b: [N]`` or ``[N, K]``) for one matrix
    sharded over ``mesh[axis]``.  ``x`` is returned replicated."""
    n = a.shape[-1]
    d_axis = mesh.shape[axis]
    nb = nb or default_block(n, d_axis)
    _check_args(n, nb, d_axis)

    vector_input = b.ndim == 1
    if vector_input:
        b = b[:, None]

    res = distributed_lu(a, mesh, axis=axis, nb=nb, tol=tol)
    body = _build_solve_body(n, nb, d_axis, axis)
    x = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis), P(None), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )(res.lu_sharded, res.perm, b.astype(res.lu_sharded.dtype))
    return x[:, 0] if vector_input else x


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "nb", "tol")
)
@f32_matmuls
def distributed_det(
    a: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    nb: Optional[int] = None,
    tol: float = 0.0,
) -> jax.Array:
    """Determinant of one mesh-sharded matrix: product of the sharded
    U diagonal (one masked psum) × permutation parity."""
    n = a.shape[-1]
    d_axis = mesh.shape[axis]
    nb = nb or default_block(n, d_axis)
    _check_args(n, nb, d_axis)
    res = distributed_lu(a, mesh, axis=axis, nb=nb, tol=tol)

    def diag_body(lu_loc):
        d = lax.axis_index(axis)
        m = n // nb
        parts = []
        for j in range(m):
            owner, lb = j % d_axis, j // d_axis
            is_owner = (d == owner).astype(lu_loc.dtype)
            blk = lu_loc[j * nb:(j + 1) * nb, lb * nb:(lb + 1) * nb]
            dvec = jnp.sum(
                blk * jnp.eye(nb, dtype=lu_loc.dtype), axis=-1
            )
            parts.append(comm.psum(dvec * is_owner, axis))
        return jnp.prod(jnp.concatenate(parts))

    det_u = shard_map(
        diag_body,
        mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=P(),
        check_vma=False,
    )(res.lu_sharded)
    return jnp.where(res.ok, res.sign * det_u, 0.0)


def gather_packed_lu(res: DistributedLUResult, nb: int, d_axis: int):
    """Undo the cyclic column order: the packed L\\U in natural column
    order (host-side convenience for tests/inspection)."""
    n = res.lu_sharded.shape[-1]
    order = cyclic_column_order(n, nb, d_axis)
    return res.lu_sharded[:, _inverse_order(order)]
