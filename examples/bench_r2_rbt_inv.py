"""Measure the RBT pivot-free inverse vs the pivoted GJ-kernel inverse
at the BASELINE metric-2 shape (1024 x 64x64)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops.pallas import inverse_batched as gj_inverse
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N = 1024, 64
a = jax.random.normal(
    jax.random.PRNGKey(3), (B, N, N), jnp.float32
) + (4.0 * N**0.5) * jnp.eye(N, dtype=jnp.float32)
a64 = np.asarray(a, np.float64)


def run(name, f):
    x = np.asarray(f(a), np.float64)
    err = np.max(np.abs(a64 @ x - np.eye(N)))
    sec = device_slope_time(f, a)
    print(f"{name:30s} {sec*1e3:7.3f} ms  {B/sec/1e6:7.3f} M matrices/s"
          f"  |AX-I| {err:.2e}", flush=True)


run("pivoted GJ kernel", jax.jit(gj_inverse))
run("jnp.linalg.inv", jax.jit(jnp.linalg.inv))
for ns in (0, 1):
    for fb in (True, False):
        run(f"rbt ns={ns} fallback={fb}",
            jax.jit(functools.partial(
                rbt.pallas_inverse_rbt_batched, nb=64, ns_steps=ns,
                fallback=fb)))
run("rbt ns=1 lookahead=4",
    jax.jit(functools.partial(
        rbt.pallas_inverse_rbt_batched, nb=64, ns_steps=1,
        fallback=False, lookahead=4)))
