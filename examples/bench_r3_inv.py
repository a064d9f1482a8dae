"""Round-3 metric-2 attack: fused RBT no-pivot inverse kernel vs the
pivoted Gauss-Jordan kernel at the BASELINE shape (1024 x 64x64).

The fused kernel (ops/pallas/inv_rbt_kernel.py) applies butterflies in
VMEM, runs no-pivot GJ restricted to the contiguous n+1-column live
span (half the pivoted kernel's 2n VPU span), and skips both the
per-step argmax and the exit un-permutation GEMM.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_inv.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.pallas import gj_kernel
from linalg_solver_tpu.ops.pallas.inv_rbt_kernel import (
    inverse_rbt_fused_batched,
)
from linalg_solver_tpu.utils.benchmarking import device_slope_time

Bi, Ni = 1024, 64
ai = jax.random.normal(
    jax.random.PRNGKey(3), (Bi, Ni, Ni), jnp.float32
) + (4.0 * Ni**0.5) * jnp.eye(Ni, dtype=jnp.float32)
a64 = np.asarray(ai, np.float64)


def run(name, f, a):
    x = np.asarray(f(a), np.float64)
    err = np.max(np.abs(np.einsum("bij,bjk->bik", a64, x)
                        - np.eye(Ni)))
    sec = device_slope_time(f, a)
    print(f"{name:36s} {sec*1e3:7.3f} ms  {Bi/sec/1e3:8.1f}k mat/s"
          f"  |AX-I| {err:.2e}", flush=True)
    return sec


run("pivoted GJ kernel (current)",
    jax.jit(gj_kernel.inverse_batched), ai)
for ns, fb in ((0, False), (0, True), (1, True), (2, True)):
    run(f"fused RBT ns={ns} fb={fb}",
        jax.jit(functools.partial(
            inverse_rbt_fused_batched, ns_steps=ns, fallback=fb,
            gate_mode="full")), ai)
run("fused RBT ns=0 fb=probe",
    jax.jit(functools.partial(
        inverse_rbt_fused_batched, ns_steps=0, fallback=True,
        gate_mode="probe")), ai)
from linalg_solver_tpu.ops import rbt

for leaf in (8, 16):
    run(f"RBT recursive-engine leaf={leaf}",
        jax.jit(functools.partial(
            rbt.pallas_inverse_rbt_batched, nb=64, ns_steps=1,
            engine="recursive", leaf=leaf)), ai)
run("jnp.linalg.inv", jax.jit(jnp.linalg.inv), ai)
