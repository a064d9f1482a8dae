"""Round-3 combined sweep, part 2: narrower panels (nb=16/8) — panel
VPU work scales with nb, glue op count with N/nb.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_combo2.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N = 256, 256
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
a64 = np.asarray(a, np.float64)
b64 = np.asarray(b, np.float64)


def run(name, f, *args):
    x = np.asarray(f(*args), np.float64)
    r = np.max(np.linalg.norm(
        np.einsum("bij,bj->bi", a64, x) - b64, axis=1
    ) / np.linalg.norm(b64, axis=1))
    sec = device_slope_time(f, *args)
    print(f"{name:40s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:7.1f} GFLOP/s"
          f"  resid {r:.2e}", flush=True)


for nb, la in ((16, 16), (16, 8), (8, 8)):
    run(f"resliced nb={nb} la={la}",
        jax.jit(functools.partial(
            rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=2,
            fallback="redraw", lookahead=la)), a, b)
