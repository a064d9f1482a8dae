"""Round-4 metric-2 bench: rank-2 GJ + 256-lane tiles + in-kernel
Rademacher probe vs the pivoted GJ kernel and jnp.linalg.inv.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r4_inv.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.pallas.inv_rbt_kernel import (
    inverse_rbt_fused_batched,
)
from linalg_solver_tpu.ops.pallas import gj_kernel
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, n = 1024, 64
a = jax.random.normal(
    jax.random.PRNGKey(3), (B, n, n), jnp.float32
) + (4.0 * n**0.5) * jnp.eye(n, dtype=jnp.float32)
a64 = np.asarray(a, np.float64)


def run(name, f, *args):
    x = np.asarray(f(*args), np.float64)
    err = np.max(np.abs(
        np.einsum("bij,bjk->bik", a64, x) - np.eye(n)
    ))
    sec = device_slope_time(f, *args)
    print(f"{name:46s} {sec*1e3:7.3f} ms  {B/sec/1e6:6.3f} M/s"
          f"  |AX-I| {err:.2e}", flush=True)


run("fused rank1 bt128 in-kernel probe (prod)",
    jax.jit(functools.partial(inverse_rbt_fused_batched)), a)
run("fused rank1 bt128 ungated",
    jax.jit(functools.partial(
        inverse_rbt_fused_batched, fallback=False)), a)
run("fused rank1 bt128 full-residual gate",
    jax.jit(functools.partial(
        inverse_rbt_fused_batched, gate_mode="full")), a)
run("pivoted GJ kernel",
    jax.jit(gj_kernel.inverse_batched), a)
run("jnp.linalg.inv", jax.jit(jnp.linalg.inv), a)
