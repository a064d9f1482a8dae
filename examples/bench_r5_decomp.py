"""Round-5: decompose the bench-path overhead above the fused kernel.

Direct kernel (u=2): 1.571 ms = 1844 GF/s, but bench.py's production
path (dispatch auto -> pallas_solve_rbt_batched fallback="redraw")
captured 1551 GF/s (~1.85 ms).  Candidates for the ~0.28 ms: the
outer rescue ``lax.cond`` host-predicate stall (~0.1-0.15 ms untaken,
CLAUDE.md), wrapper work (pad/transposes are shared with the direct
call), any(bad) reduction.  Also: nb=8 x unroll interaction (round-4's
nb sweep ran at u=1 where nb=8 tied nb=16; halving the phase width
halves the masked-column waste).

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r5_decomp.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.pallas.solve_fused_kernel import solve_fused_rbt
from linalg_solver_tpu.ops.rbt import pallas_solve_rbt_batched
from linalg_solver_tpu.ops import dispatch
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N = 256, 256
k_a, k_b = jax.random.split(jax.random.PRNGKey(0))
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
FL = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)


def run(name, f, out0=True):
    g = (lambda a_, b_: f(a_, b_)[0]) if out0 else f
    x = g(a, b)
    r = np.linalg.norm(
        np.einsum("bij,bj->bi", np.asarray(a, np.float64),
                  np.asarray(x, np.float64)) - np.asarray(b, np.float64),
        axis=1,
    ) / np.linalg.norm(np.asarray(b, np.float64), axis=1)
    sec = device_slope_time(g, a, b)
    print(
        f"{name:46s}: {sec*1e3:7.3f} ms = {FL/sec/1e9:6.0f} GF/s  "
        f"resid={r.max():.1e}",
        flush=True,
    )


if __name__ == "__main__":
    kern = jax.jit(functools.partial(
        solve_fused_rbt, nb=16, unroll=2, ir_steps=2
    ))
    run("[warmup] kernel u=2", kern)
    run("kernel nb=16 u=2 (direct)", kern)
    run("rbt fallback=False (wrapper, no rescue)",
        jax.jit(functools.partial(
            pallas_solve_rbt_batched, fallback=False
        )), out0=False)
    run("rbt fallback=redraw (production)",
        jax.jit(functools.partial(
            pallas_solve_rbt_batched, fallback="redraw"
        )), out0=False)
    run("dispatch auto (bench path)",
        jax.jit(dispatch.solve_batched), out0=False)
    run("kernel nb= 8 u=2 (direct)",
        jax.jit(functools.partial(
            solve_fused_rbt, nb=8, unroll=2, ir_steps=2
        )))
    run("kernel nb= 8 u=4 (direct)",
        jax.jit(functools.partial(
            solve_fused_rbt, nb=8, unroll=4, ir_steps=2
        )))
    run("kernel nb=16 u=2 (repeat)", kern)
