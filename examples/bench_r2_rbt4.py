"""Isolate the RBT fallback-gate cost: pure-where gate (no cond),
trivial cond branch, early-predicate cond, re-draw rescue through the
same kernels (layout-matched branch)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import lu_blocked as lub
from linalg_solver_tpu.ops import rbt
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


def run(name, f):
    x = np.asarray(f(a, b), np.float64)
    r = np.max(np.linalg.norm(
        np.einsum("bij,bj->bi", np.asarray(a, np.float64), x)
        - np.asarray(b, np.float64), axis=1
    ) / np.linalg.norm(np.asarray(b, np.float64), axis=1))
    sec = device_slope_time(f, a, b)
    print(f"{name:24s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:7.1f} GFLOP/s"
          f"  resid {r:.2e}", flush=True)


def _core(a, b, keyset=(17, 29), lookahead=8):
    """The fallback-free pipeline; returns (x, ph, gate scalars)."""
    ir_steps = 2
    b3 = b[:, :, None]
    f32 = jnp.float32
    a32 = a.astype(f32)
    b3 = b3.astype(f32)
    m = N // nb
    diags_u = rbt_diags(jax.random.PRNGKey(keyset[0]), N, 2, f32)
    diags_v = rbt_diags(jax.random.PRNGKey(keyset[1]), N, 2, f32)
    amax = jnp.max(jnp.abs(a32), axis=(1, 2))
    bmax = jnp.max(jnp.abs(b3), axis=(1, 2))

    with jax.default_matmul_precision("bfloat16"):
        a_p = butterfly_apply(a32, diags_u, trans=True)
        a_p = jnp.swapaxes(
            butterfly_apply(jnp.swapaxes(a_p, 1, 2), diags_v, True),
            1, 2,
        )
        b_p = butterfly_apply(b3, diags_u, trans=True)
        ph = _nopivot_lu_phases(a_p, nb, False, rhs=b_p,
                                lookahead=lookahead)
        y = _nopivot_backward(ph, ph.ys, m, nb)
        x = butterfly_apply(y, diags_v, trans=False)

    for step in range(ir_steps):
        with jax.default_matmul_precision("float32"):
            resid = b3 - a32 @ x
        if step == ir_steps - 1:
            rmax = jnp.max(jnp.abs(resid), axis=(1, 2))
            xmax = jnp.max(jnp.abs(x), axis=(1, 2))
        with jax.default_matmul_precision("bfloat16"):
            rp = butterfly_apply(resid, diags_u, trans=True)
            z = _nopivot_solve(ph, rp, m, nb)
            zc = butterfly_apply(z, diags_v, trans=False)
            if step == ir_steps - 1:
                zcmax = jnp.max(jnp.abs(zc), axis=(1, 2))
            x = x + zc

    bad = ~ph.ok
    bad |= ~(zcmax <= 0.3 * jnp.maximum(xmax, 1e-30))
    scale = jnp.maximum(bmax, amax * xmax)
    bad |= ~(rmax <= 1e-4 * jnp.maximum(scale, 1e-30))
    return x, a32, b3, ph, bad


def solve_variant(a, b, structure: str):
    x, a32, b3, ph, bad = _core(a, b)

    if structure == "gate_only":
        x = jnp.where(bad[:, None, None], x * 1.0000001, x)
    elif structure == "cond_trivial":
        ylane = jax.lax.cond(
            jnp.any(bad), lambda _: x * 1.0000001, lambda _: x,
            operand=None,
        )
        x = jnp.where(bad[:, None, None], ylane, x)
    elif structure == "cond_early":
        # Predicate ready right after the factorization (no
        # dependence on the refinement tail).
        ylane = jax.lax.cond(
            jnp.any(~ph.ok),
            lambda _: lub.blocked_solve_batched(a32, b3, nb=nb,
                                                ir_steps=2),
            lambda _: x,
            operand=None,
        )
        x = jnp.where((~ph.ok)[:, None, None], ylane, x)
    elif structure == "redraw":
        def _true(xx):
            yy, _, _, _, _ = _core(a, b, keyset=(101, 103))
            return jnp.where(bad[:, None, None], yy, xx)

        x = jax.lax.cond(jnp.any(bad), _true, lambda xx: xx, x)
    return x[:, :, 0]


for s in ("gate_only", "cond_trivial", "cond_early", "redraw"):
    run(f"{s}",
        jax.jit(functools.partial(solve_variant, structure=s)))
