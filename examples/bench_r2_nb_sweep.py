"""Re-sweep panel width nb for the mixed solve after the phase-loop
restructure (the glue cost that previously favored nb=64 halved)."""

import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import lu_blocked as lub
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N = 256, 256
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)

FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
results = {}

import functools

for nb in (16, 32, 64, 128):
    for ir in (1, 2):
        f = jax.jit(functools.partial(
            lub.pallas_solve_mixed_batched, nb=nb, ir_steps=ir
        ))
        sec = device_slope_time(f, a, b)
        gf = FLOPS / sec / 1e9
        results[f"nb={nb} ir={ir}"] = round(gf, 1)
        print(f"nb={nb:4d} ir={ir}: {sec * 1e3:7.3f} ms  {gf:7.1f} GFLOP/s")

print(json.dumps(results))
