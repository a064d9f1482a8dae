"""Round-3 headline attack, take 2: HYBRID engine — no-pivot panel
kernel phases + assembled full L/U + D&C/Neumann triangular inverses
(all MXU) + single-GEMM solve apply.  Replaces the 2.27 ms backward
stage (stacked invert_upper + strided U12 GEMV walk) measured by
examples/bench_r3_rbt_ablate.py.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_hybrid.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops.rbt import (
    _phases_full_inverse,
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


# staged: butterflies + phases + full-inverse assembly (consumed small)
diags_u = rbt_diags(jax.random.PRNGKey(17), N, 2, jnp.float32)
diags_v = rbt_diags(jax.random.PRNGKey(29), N, 2, jnp.float32)


@jax.jit
def stage_fullinv(a):
    with jax.default_matmul_precision("bfloat16"):
        a_p = butterfly_apply(a, diags_u, trans=True)
        a_p = jnp.swapaxes(butterfly_apply(
            jnp.swapaxes(a_p, 1, 2), diags_v, True), 1, 2)
        inv_p, ok = _phases_full_inverse(a_p, nb, False, 8)
    return inv_p[:, 0] + ok[:, None]


sec = device_slope_time(stage_fullinv, a)
print(f"  butterflies+phases+fullinv           {sec*1e3:7.3f} ms",
      flush=True)

run("kernel engine (prod, ref)",
    jax.jit(functools.partial(
        rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=2,
        fallback="redraw", lookahead=8)), a, b)
run("hybrid ir=2 fb=redraw",
    jax.jit(functools.partial(
        rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=2,
        fallback="redraw", engine="hybrid")), a, b)
run("hybrid ir=2 fb=False",
    jax.jit(functools.partial(
        rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=2,
        fallback=False, engine="hybrid")), a, b)
run("hybrid ir=1 fb=redraw",
    jax.jit(functools.partial(
        rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=1,
        fallback="redraw", engine="hybrid")), a, b)
run("hybrid nb=128 ir=2 fb=redraw",
    jax.jit(functools.partial(
        rbt.pallas_solve_rbt_batched, nb=128, ir_steps=2,
        fallback="redraw", engine="hybrid")), a, b)
