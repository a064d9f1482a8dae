"""Round-3: lookahead/group sweep of the no-pivot panel kernel (la=16
amortizes per-iteration Mosaic machinery over 2x the columns at the
price of O(la^2) in-window correction terms), kernel-alone + e2e.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_la16.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops.pallas.lu_nopivot_kernel import (
    panel_factor_nopivot,
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
a64 = np.asarray(a, np.float64)
b64 = np.asarray(b, np.float64)

panel = a[:, :, :nb]
for la in (8, 16, 32):
    @jax.jit
    def f_k(p, la=la):
        out, ok = panel_factor_nopivot(p, nb, lookahead=la)
        return jnp.sum(out) + jnp.sum(ok)

    sec = device_slope_time(f_k, panel)
    print(f"  kernel M=256 nb=64 la={la:2d}          {sec*1e3:7.3f} ms",
          flush=True)


def run(name, f, *args):
    x = np.asarray(f(*args), np.float64)
    r = np.max(np.linalg.norm(
        np.einsum("bij,bj->bi", a64, x) - b64, axis=1
    ) / np.linalg.norm(b64, axis=1))
    sec = device_slope_time(f, *args)
    print(f"{name:40s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:7.1f} GFLOP/s"
          f"  resid {r:.2e}", flush=True)


for la in (16, 32):
    run(f"kernel engine la={la} e2e",
        jax.jit(functools.partial(
            rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=2,
            fallback="redraw", lookahead=la)), a, b)
