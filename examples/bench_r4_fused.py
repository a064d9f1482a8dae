"""Round-4: monolithic fused solve kernel vs the round-3 phase path.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r4_fused.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops.pallas.solve_fused_kernel import solve_fused_rbt
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

ir = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def rune2e(name, f, *args):
    t0 = time.perf_counter()
    out = f(*args)
    x = np.asarray(out[0] if isinstance(out, tuple) else out, np.float64)
    print(f"  [compile+first run {time.perf_counter()-t0:.1f} s]",
          flush=True)
    r = np.max(np.linalg.norm(
        np.einsum("bij,bj->bi", a64, x) - b64, axis=1
    ) / np.linalg.norm(b64, axis=1))
    sec = device_slope_time(f, *args)
    print(f"{name:44s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:6.1f} GF/s"
          f"  resid {r:.2e}", flush=True)


rune2e(f"fused kernel ir={ir} (x+flags)",
       jax.jit(functools.partial(solve_fused_rbt, ir_steps=ir)), a, b)
rune2e("r3 phase path (fb=False, nb=32 la=32)",
       jax.jit(functools.partial(
           rbt.pallas_solve_rbt_batched, nb=32, ir_steps=2,
           fallback=False, lookahead=32)), a, b)
