"""Pallas TPU kernel: fused two-sided random-butterfly application.

``butterfly_apply`` (ops/rbt.py) is HBM-bandwidth-bound: each of the
``depth`` levels per side is a separate elementwise pass over the
``[B, N, N]`` batch, and the column side pays two materialized
transposes — ~6 full read+write sweeps ≈ 0.8 ms at B=N=256 (round-3
micro-bench).  This kernel computes ``A' = UᵀAV`` (or the inverse-side
``V·X·Uᵀ``) in ONE read and ONE write per matrix: each grid instance
holds a whole ``[N, N]`` matrix in VMEM and applies every butterfly
level of both sides in registers/VMEM before storing.

The butterfly structure: level ``l`` splits the index range into
segments of ``N >> l``; within a segment with halves ``(t, b)`` and
per-level diagonals ``(r0, r1)``,

    trans=True  (Bᵀ):  t' = r0 (t + b),  b' = r1 (t − b)
    trans=False (B):   t' = r0 t + r1 b, b' = r0 t − r1 b

all scaled by 1/√2 — exactly ``ops.rbt.butterfly_apply``'s math, so
the two implementations are interchangeable (differential-tested in
tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = 0.7071067811865476

#: batch tile: matrices processed per grid instance
_BT = 8


def _apply_rows(x, diags, n: int, depth: int, trans: bool):
    """Row-side butterfly on ``x [bt, n, n]`` (values, not refs —
    static unroll, tiny VMEM working set)."""
    levels = list(range(depth))
    if not trans:
        levels = levels[::-1]
    for lvl in levels:
        seg = n >> lvl
        h = seg // 2
        parts = []
        for g in range(0, n, seg):
            top = x[:, g:g + h, :]
            bot = x[:, g + h:g + seg, :]
            r0 = diags[lvl][g:g + h][None, :, None]
            r1 = diags[lvl][g + h:g + seg][None, :, None]
            if trans:
                nt = r0 * (top + bot)
                nb_ = r1 * (top - bot)
            else:
                nt = r0 * top + r1 * bot
                nb_ = r0 * top - r1 * bot
            parts.append(nt * _SQRT_HALF)
            parts.append(nb_ * _SQRT_HALF)
        x = jnp.concatenate(parts, axis=1)
    return x


def _apply_cols(x, diags, n: int, depth: int, trans: bool):
    levels = list(range(depth))
    if not trans:
        levels = levels[::-1]
    for lvl in levels:
        seg = n >> lvl
        h = seg // 2
        parts = []
        for g in range(0, n, seg):
            top = x[:, :, g:g + h]
            bot = x[:, :, g + h:g + seg]
            r0 = diags[lvl][g:g + h][None, None, :]
            r1 = diags[lvl][g + h:g + seg][None, None, :]
            if trans:
                nt = r0 * (top + bot)
                nb_ = r1 * (top - bot)
            else:
                nt = r0 * top + r1 * bot
                nb_ = r0 * top - r1 * bot
            parts.append(nt * _SQRT_HALF)
            parts.append(nb_ * _SQRT_HALF)
        x = jnp.concatenate(parts, axis=2)
    return x


def _bf2_kernel(a_ref, du0, du1, dv0, dv1, out_ref, *, n: int,
                depth: int, trans_rows: bool, trans_cols: bool):
    x = a_ref[...]
    du = (du0[0], du1[0])[:depth]
    dv = (dv0[0], dv1[0])[:depth]
    x = _apply_rows(x, du, n, depth, trans_rows)
    x = _apply_cols(x, dv, n, depth, trans_cols)
    out_ref[...] = x


@functools.partial(
    jax.jit,
    static_argnames=("depth", "trans_rows", "trans_cols", "interpret"),
)
def butterfly_two_sided(
    a: jax.Array,
    diags_rows: tuple,
    diags_cols: tuple,
    depth: int = 2,
    trans_rows: bool = True,
    trans_cols: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``rows-side ∘ cols-side`` butterfly over ``[B, N, N]``:
    one HBM read + one write.  ``trans_rows/trans_cols`` pick Bᵀ vs B
    per side: the solve's preconditioning is ``(True, True)``
    (``UᵀAV``); the inverse reconstruction ``V X Uᵀ`` is
    ``(False, False)`` with ``(diags_v, diags_u)``."""
    B, n, _ = a.shape
    assert n % (1 << depth) == 0, (
        f"butterfly_two_sided(depth={depth}) needs n % {1 << depth} "
        f"== 0 (even segments at every level), got n={n}"
    )
    d = jnp.ones((1, n), a.dtype)
    du = list(diags_rows) + [d[0]] * (2 - len(diags_rows))
    dv = list(diags_cols) + [d[0]] * (2 - len(diags_cols))
    pad = (-B) % _BT
    ap = a
    if pad:
        ap = jnp.concatenate(
            [a, jnp.zeros((pad, n, n), a.dtype)], axis=0
        )
    Bp = ap.shape[0]
    kernel = functools.partial(
        _bf2_kernel, n=n, depth=depth,
        trans_rows=trans_rows, trans_cols=trans_cols,
    )
    out = pl.pallas_call(
        kernel,
        grid=(Bp // _BT,),
        in_specs=[
            pl.BlockSpec((_BT, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=pl.BlockSpec((_BT, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), a.dtype),
        # Mosaic double-buffers the in/out blocks: the default 16 MB
        # scoped-VMEM limit OOMs at n=384 (17.84 MB) even though
        # supported() passes — raise it explicitly (the chip has
        # ~120 MB usable; examples/probe_vmem.py).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(ap, du[0][None, :], du[1][None, :], dv[0][None, :],
      dv[1][None, :])
    return out[:B]


def supported(n: int, depth: int = 2, dtype=jnp.float32) -> bool:
    """VMEM: in+out tiles ``2·_BT·n²·4`` must fit comfortably; every
    butterfly level needs even segments (level ``depth−1`` has segments
    of ``n >> (depth−1)``, so ``n % (1 << depth) == 0``)."""
    return (
        n >= (1 << depth)
        and n % (1 << depth) == 0
        and 2 * _BT * n * n * 4 <= 12 * 2**20
    )
