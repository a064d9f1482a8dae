"""Pallas TPU kernel: LU panel factorization for the blocked batched LU.

The blocked LU (``ops.lu_blocked``) spends its wall-clock in the panel
loop: ``nb`` sequential pivot steps, each re-touching the ``[B, N, nb]``
panel in HBM.  This kernel runs those steps with the panel resident in
VMEM, batch in the lane dimension (``[N, nb, BT]``, BT = 128 lanes), so
the whole panel phase costs one HBM read + one write.  The trailing
``A22 -= L21 @ U12`` updates and the deferred out-of-panel row swaps stay
in XLA, where the GEMMs land on the MXU with full-width contractions.

Per column step (all lanes in parallel):
pivot = argmax |column| over rows ≥ j → explicit row swap (one-hot
exchange, O(N·nb·BT) VPU) → scale multipliers → rank-1 update of the
columns right of the pivot.  The local permutation, sign and
zero-pivot mask are tracked per lane.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _panel_kernel(a_hbm, out_hbm, perm_ref, sign_ref, ok_ref, work, sems,
                  *, n: int, nb: int, k0: int, bt: int):
    """The panel stays in HBM; each program DMAs its lane-tile into the
    single VMEM ``work`` buffer, factors there, and DMAs back (one buffer
    instead of double-buffered in/out blocks, which exceed VMEM at
    [256, 64, 128] tiles).  Dynamic indexing goes through the ref; perm
    updates use one-hot selects."""
    i = pl.program_id(0)
    dtype = work.dtype

    load = pltpu.make_async_copy(
        a_hbm.at[:, :, pl.ds(i * bt, bt)], work, sems.at[0]
    )
    load.start()
    load.wait()

    out_ref = work
    rows = lax.broadcasted_iota(jnp.int32, (n, bt), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)

    def step(jj, carry):
        perm, sign, ok = carry
        j = k0 + jj  # global pivot row for panel column jj

        col = out_ref[:, pl.ds(jj, 1), :][:, 0, :]          # [n, bt]
        eligible = rows >= j
        masked = jnp.where(eligible, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(masked, axis=0)                      # [bt]
        mx = jnp.max(masked, axis=0)
        has_pivot = mx > 0.0

        # Swap rows j <-> p (full panel width) via one-hot exchange.
        do_swap = has_pivot & (p != j)
        act = do_swap.astype(dtype)
        oh_j = (rows == j).astype(dtype)                    # [n, bt]
        oh_p = (rows == p[None, :]).astype(dtype)
        arr = out_ref[:]
        row_j = out_ref[pl.ds(j, 1), :, :][0]               # [nb, bt]
        row_p = jnp.sum(arr * oh_p[:, None, :], axis=0)     # [nb, bt]
        delta = (row_j - row_p) * act[None, :]
        arr = arr - oh_j[:, None, :] * delta[None, :, :] \
                  + oh_p[:, None, :] * delta[None, :, :]

        perm_j = jnp.sum(
            perm * (rows == j).astype(jnp.int32), axis=0
        )                                                   # [bt]
        perm_p = jnp.sum(
            perm * oh_p.astype(jnp.int32), axis=0
        )                                                   # [bt]
        swap_mask = do_swap[None, :]
        perm = jnp.where(
            (rows == j) & swap_mask, perm_p[None, :], perm
        )
        perm = jnp.where(
            (rows == p[None, :]) & swap_mask, perm_j[None, :], perm
        )
        sign = jnp.where(do_swap, -sign, sign)

        # Scale multipliers and rank-1 update of columns right of jj.
        col = jnp.sum(
            arr * (cols == jj).astype(dtype), axis=1
        )                                                   # [n, bt]
        pivot_val = jnp.sum(col * oh_j, axis=0)             # [bt]
        safe = jnp.where(has_pivot, pivot_val, 1.0)
        below = (rows > j).astype(dtype) * has_pivot.astype(dtype)[None, :]
        factors = col / safe[None, :] * below               # [n, bt]
        pivot_row = jnp.sum(arr * oh_j[:, None, :], axis=0)  # [nb, bt]
        right = (cols > jj).astype(dtype)                   # [1, nb, 1]
        arr = arr - factors[:, None, :] * (pivot_row[None, :, :] * right)
        # Store the multipliers in panel column jj (rows below j).
        col_oh = (cols == jj).astype(dtype)                 # [1, nb, 1]
        new_col = jnp.where(below > 0, factors, col)        # [n, bt]
        arr = arr * (1.0 - col_oh) + new_col[:, None, :] * col_oh
        out_ref[:] = arr

        ok = ok * has_pivot.astype(dtype)
        return perm, sign, ok

    init = (
        lax.broadcasted_iota(jnp.int32, (n, bt), 0),
        jnp.ones((bt,), dtype),
        jnp.ones((bt,), dtype),  # ok carried as f32 0/1 (Mosaic i1 carries
                                 # are fragile in loop layouts)
    )
    perm, sign, ok = lax.fori_loop(0, nb, step, init)
    perm_ref[:] = perm
    sign_ref[:] = sign[None, :]
    ok_ref[:] = (ok[None, :] > 0).astype(jnp.int32)

    store = pltpu.make_async_copy(
        work, out_hbm.at[:, :, pl.ds(i * bt, bt)], sems.at[1]
    )
    store.start()
    store.wait()


class PanelResult(NamedTuple):
    panel: jax.Array      # [B, N, nb] factored panel
    local_perm: jax.Array  # [B, N] row source indices (for deferred swaps)
    sign: jax.Array       # [B]
    ok: jax.Array         # [B] bool


@functools.partial(jax.jit, static_argnames=("k0", "nb", "interpret"))
def panel_factor(
    panel: jax.Array, k0: int, nb: int, interpret: bool = False
) -> PanelResult:
    """Factor a ``[B, N, nb]`` panel whose columns span global columns
    ``[k0, k0+nb)``; batch padded to the lane width internally."""
    B, n, _ = panel.shape
    bt = LANES
    pad = (-B) % bt
    if pad:
        filler = jnp.broadcast_to(
            jnp.eye(n, nb, k=-k0, dtype=panel.dtype), (pad, n, nb)
        )
        panel = jnp.concatenate([panel, filler], axis=0)
    Bp = panel.shape[0]

    p_t = jnp.transpose(panel, (1, 2, 0)).astype(
        jnp.result_type(panel.dtype, jnp.float32)
    )  # [N, nb, Bp]

    kernel = functools.partial(_panel_kernel, n=n, nb=nb, k0=k0, bt=bt)
    out, perm, sign, ok = pl.pallas_call(
        kernel,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full panel, HBM
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full panel, HBM
            pl.BlockSpec((n, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nb, Bp), p_t.dtype),
            jax.ShapeDtypeStruct((n, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), p_t.dtype),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, nb, bt), p_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # The scratch tile plus elimination temporaries exceed the default
        # 16MB scoped-VMEM budget at [256, 64, 128]; raise the cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_t)

    return PanelResult(
        jnp.transpose(out, (2, 0, 1))[:B],
        jnp.transpose(perm, (1, 0))[:B],
        sign[0, :B],
        ok[0, :B].astype(bool),
    )
