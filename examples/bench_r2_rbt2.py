"""RBT solve experiments, round 2: lookahead sweep + rescue-branch
variants (what does the mere PRESENCE of each rescue path cost?)."""

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


# 1) lookahead sweep, no fallback
for la in (2, 4, 8):
    run(f"nofb lookahead={la}",
        jax.jit(functools.partial(
            rbt.pallas_solve_rbt_batched, nb=64, fallback=False,
            lookahead=la)))


# 2) rescue variants
def solve_variant(a, b, rescue: str):
    ir_steps = 2
    b3 = b[:, :, None]
    f32 = jnp.float32
    a32 = a.astype(f32)
    b3 = b3.astype(f32)
    m = N // nb
    diags_u = rbt_diags(jax.random.PRNGKey(17), N, 2, f32)
    diags_v = rbt_diags(jax.random.PRNGKey(29), N, 2, f32)
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

    if rescue == "mixed":
        def _r(_):
            return lub.pallas_solve_mixed_batched(
                a32, b3, nb=nb, fallback=False
            )
    elif rescue == "redraw":
        def _r(_):
            du = rbt_diags(jax.random.PRNGKey(101), N, 2, f32)
            dv = rbt_diags(jax.random.PRNGKey(103), N, 2, f32)
            with jax.default_matmul_precision("bfloat16"):
                ap2 = butterfly_apply(a32, du, trans=True)
                ap2 = jnp.swapaxes(
                    butterfly_apply(jnp.swapaxes(ap2, 1, 2), dv, True),
                    1, 2,
                )
                bp2 = butterfly_apply(b3, du, trans=True)
                ph2 = _nopivot_lu_phases(ap2, nb, False, rhs=bp2)
                y2 = _nopivot_backward(ph2, ph2.ys, m, nb)
                x2 = butterfly_apply(y2, dv, trans=False)
            for _ in range(2):
                with jax.default_matmul_precision("float32"):
                    r2 = b3 - a32 @ x2
                with jax.default_matmul_precision("bfloat16"):
                    z2 = _nopivot_solve(
                        ph2, butterfly_apply(r2, du, trans=True), m, nb
                    )
                    x2 = x2 + butterfly_apply(z2, dv, trans=False)
            return x2

    ylane = jax.lax.cond(jnp.any(bad), _r, lambda _: x, operand=None)
    x = jnp.where(bad[:, None, None], ylane, x)
    return x[:, :, 0]


for rescue in ("mixed", "redraw"):
    run(f"rescue={rescue}",
        jax.jit(functools.partial(solve_variant, rescue=rescue)))
