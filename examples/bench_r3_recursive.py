"""Round-3 headline attack: log-depth GEMM recursion vs the no-pivot
panel kernel inside the RBT solve, at the bench shape (B=256, N=256).

MEASURED DEAD END (2026-08-21, v5e chip): the recursion alone costs
2.92 / 4.95 / 12.5 ms at leaf=8/16/32 — the pure-XLA unrolled leaf
eliminations and the deep tree of tiny batched GEMMs are op-overhead
bound (~256 fused elementwise steps + ~300 sub-[B,32,32] GEMMs), far
over the kernel engine's 0.66 ms phase-kernel cost.  The winning
restructure keeps the Pallas kernel for the sequential panel work and
moves only the POST-FACTOR stages to GEMMs: see
examples/bench_r3_hybrid.py (engine="hybrid").  Kept for the record;
the e2e sweep was dropped once the isolated numbers settled it.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_recursive.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops.lu_recursive import inverse_nopivot_recursive
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
    return sec


# isolated: the recursion alone (factor-equivalent), bf16 GEMMs
for leaf in (8, 16, 32):
    @jax.jit
    def rec_only(a, leaf=leaf):
        with jax.default_matmul_precision("bfloat16"):
            inv, ok = inverse_nopivot_recursive(a, leaf=leaf)
        return inv[:, 0] + ok[:, None]

    sec = device_slope_time(rec_only, a)
    print(f"  recursion alone leaf={leaf:2d} bf16        "
          f"{sec*1e3:7.3f} ms", flush=True)

run("kernel engine (prod, ref)",
    jax.jit(functools.partial(
        rbt.pallas_solve_rbt_batched, nb=64, ir_steps=2,
        fallback="redraw", lookahead=8)), a, b)
