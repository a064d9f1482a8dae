"""Measure the RBT pivot-free solve vs the pivoted mixed path at the
bench shape (B=256, N=256)."""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import lu_blocked as lub
from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N = 256, 256
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
a64 = np.asarray(a, np.float64)
b64 = np.asarray(b, np.float64)

FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
results = {}


def run(name, f):
    x = np.asarray(f(a, b), np.float64)
    resid = np.max(np.linalg.norm(
        np.einsum("bij,bj->bi", a64, x) - b64, axis=1
    ) / np.linalg.norm(b64, axis=1))
    sec = device_slope_time(f, a, b)
    gf = FLOPS / sec / 1e9
    results[name] = [round(gf, 1), float(resid)]
    print(f"{name:34s} {sec * 1e3:7.3f} ms  {gf:7.1f} GFLOP/s  "
          f"resid {resid:.2e}", flush=True)


run("mixed (pivoted, reference point)",
    jax.jit(functools.partial(lub.pallas_solve_mixed_batched, nb=64)))
for nb in (64, 128):
    for ir in (2,):
        run(f"rbt nb={nb} ir={ir}",
            jax.jit(functools.partial(
                rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=ir)))
run("rbt nb=64 ir=1",
    jax.jit(functools.partial(
        rbt.pallas_solve_rbt_batched, nb=64, ir_steps=1)))
run("rbt nb=64 no-fallback",
    jax.jit(functools.partial(
        rbt.pallas_solve_rbt_batched, nb=64, fallback=False)))

print(json.dumps(results))
