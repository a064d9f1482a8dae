"""Decompose the RBT fallback-gate cost: gate math, lax.cond with a
trivial branch, lax.cond with the real pivoted rescue."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops.lu_blocked import blocked_solve_batched
from linalg_solver_tpu.ops.rbt import (
    _nopivot_backward,
    _nopivot_lu_phases,
    _nopivot_solve,
    butterfly_apply,
    rbt_diags,
)
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N, nb = 256, 256, 64
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)


def solve_variant(a, b, mode: str):
    ir_steps = 2
    b3 = b[:, :, None]
    f32 = jnp.float32
    a32 = a.astype(f32)
    b3 = b3.astype(f32)
    m = N // nb
    diags_u = rbt_diags(jax.random.PRNGKey(17), N, 2, f32)
    diags_v = rbt_diags(jax.random.PRNGKey(29), N, 2, f32)
    if mode not in ("none", "contraction_gate"):
        amax = jnp.max(jnp.abs(a32), axis=(1, 2))
        bmax = jnp.max(jnp.abs(b3), axis=(1, 2))

    with jax.default_matmul_precision("bfloat16"):
        a_p = butterfly_apply(a32, diags_u, trans=True)
        a_p = jnp.swapaxes(
            butterfly_apply(jnp.swapaxes(a_p, 1, 2), diags_v, True),
            1, 2,
        )
        b_p = butterfly_apply(b3, diags_u, trans=True)
        ph = _nopivot_lu_phases(a_p, nb, False, rhs=b_p)
        y = _nopivot_backward(ph, ph.ys, m, nb)
        x = butterfly_apply(y, diags_v, trans=False)

    for step in range(ir_steps):
        with jax.default_matmul_precision("float32"):
            resid = b3 - a32 @ x
        if mode != "none" and step == ir_steps - 1:
            if mode != "contraction_gate":
                rmax = jnp.max(jnp.abs(resid), axis=(1, 2))
            xmax = jnp.max(jnp.abs(x), axis=(1, 2))
        with jax.default_matmul_precision("bfloat16"):
            rp = butterfly_apply(resid, diags_u, trans=True)
            z = _nopivot_solve(ph, rp, m, nb)
            zc = butterfly_apply(z, diags_v, trans=False)
            if mode != "none" and step == ir_steps - 1:
                zcmax = jnp.max(jnp.abs(zc), axis=(1, 2))
            x = x + zc

    if mode != "none":
        bad = ~ph.ok
        bad |= ~(zcmax <= 0.3 * jnp.maximum(xmax, 1e-30))
        if mode not in ("contraction_gate",):
            scale = jnp.maximum(bmax, amax * xmax)
            bad |= ~(rmax <= 1e-4 * jnp.maximum(scale, 1e-30))
        if mode == "gate_only":
            x = jnp.where(bad[:, None, None], x * 1.0000001, x)
        elif mode == "cond_trivial":
            ylane = jax.lax.cond(
                jnp.any(bad),
                lambda _: x * 1.0000001,
                lambda _: x,
                operand=None,
            )
            x = jnp.where(bad[:, None, None], ylane, x)
        elif mode == "cond_rescue":
            ylane = jax.lax.cond(
                jnp.any(bad),
                lambda _: blocked_solve_batched(a32, b3, nb=nb,
                                                ir_steps=2),
                lambda _: x,
                operand=None,
            )
            x = jnp.where(bad[:, None, None], ylane, x)
        elif mode in ("rescue_barrier", "contraction_gate"):
            def _rescue(_):
                ab, bb = jax.lax.optimization_barrier((a32, b3))
                return blocked_solve_batched(ab, bb, nb=nb, ir_steps=2)

            ylane = jax.lax.cond(
                jnp.any(bad), _rescue, lambda _: x, operand=None
            )
            x = jnp.where(bad[:, None, None], ylane, x)
    return x[:, :, 0]


for mode in ("none", "rescue_barrier", "contraction_gate"):
    f = jax.jit(functools.partial(solve_variant, mode=mode))
    x = np.asarray(f(a, b), np.float64)
    r = np.max(np.linalg.norm(
        np.einsum("bij,bj->bi", np.asarray(a, np.float64), x)
        - np.asarray(b, np.float64), axis=1
    ) / np.linalg.norm(np.asarray(b, np.float64), axis=1))
    sec = device_slope_time(f, a, b)
    print(f"{mode:14s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:7.1f} GFLOP/s"
          f"  resid {r:.2e}", flush=True)
