"""No-fallback RBT solve tuning: ir_steps x nb sweep at lookahead=8,
plus the kernels-only dependency floor (phase loop alone)."""

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

B, N = 256, 256
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)


def run(name, f, check=True):
    x = np.asarray(f(a, b), np.float64)
    if check:
        r = np.max(np.linalg.norm(
            np.einsum("bij,bj->bi", np.asarray(a, np.float64), x)
            - np.asarray(b, np.float64), axis=1
        ) / np.linalg.norm(np.asarray(b, np.float64), axis=1))
    else:
        r = float("nan")
    sec = device_slope_time(f, a, b)
    print(f"{name:28s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:7.1f} GFLOP/s"
          f"  resid {r:.2e}", flush=True)


for nb in (64, 128):
    for ir in (1, 2):
        run(f"nofb nb={nb} ir={ir} la=8",
            jax.jit(functools.partial(
                rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=ir,
                fallback=False, lookahead=8)))

# Kernels-only floor: the four sequential shrinking panels at la=8
# (bf16 phases would still pay this chain — it is the new ceiling).
@jax.jit
def kernels_only(a, b):
    trail = a
    acc = 0.0
    for k0 in range(0, N, 64):
        panel = trail[:, :, :64]
        trail = trail[:, :, 64:]
        pu, ok = panel_factor_nopivot(panel, 64, lookahead=8)
        acc = acc + jnp.sum(pu[:, -1, -1])
        if trail.shape[2]:
            trail = trail[:, 64:, :]  # shrink rows only (no GEMM)
    return jnp.zeros((B, N)) + acc[None, None]


run("kernels-only (4 panels)", kernels_only, check=False)
