"""Round-5 (VERDICT r4 item 3): measure GEMM-dominant metric-2
formulations before declaring the VPU floor.

The ledger's [1024, 64^2] batched-GEMM rate is 32 TF/s — an arithmetic
ceiling ~20x above the VPU span-GJ bound the fused kernel sits at
(0.283 ms best-sample = 2.7-3.6 M matrices/s).  Candidates, all
in-tree:

- ``engine="recursive"``: log-depth Schur recursion, ~10/3 n^3 GEMM
  FLOPs/matrix + ns_steps Newton-Schulz GEMMs — pure MXU.
- ``engine="hybrid"``: no-pivot panel kernel factor + block-substituted
  explicit inverse (GEMM assembly).
- the production fused kernel (baseline).

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r5_inv_gemm.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.rbt import pallas_inverse_rbt_batched
from linalg_solver_tpu.ops.pallas import inverse_batched as pinv_fused
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N = 1024, 64
a = jax.random.normal(
    jax.random.PRNGKey(3), (B, N, N), jnp.float32
) + (4.0 * N**0.5) * jnp.eye(N, dtype=jnp.float32)


def check(x):
    ident = np.einsum(
        "bij,bjk->bik", np.asarray(a, np.float64),
        np.asarray(x, np.float64),
    )
    return np.max(np.abs(ident - np.eye(N)))


def run(name, f):
    x = f(a)
    err = check(x)
    sec = device_slope_time(f, a)
    print(
        f"{name:58s} {sec*1e3:7.3f} ms = {B/sec/1e6:5.2f} M/s  "
        f"err={err:.1e}",
        flush=True,
    )


if __name__ == "__main__":
    run("fused kernel (production baseline)", jax.jit(pinv_fused))
    for leaf in (8, 16, 32):
        for fb in (False, "redraw"):
            run(
                f"recursive leaf={leaf} ns=1 fb={fb}",
                jax.jit(functools.partial(
                    pallas_inverse_rbt_batched, engine="recursive",
                    leaf=leaf, ns_steps=1, fallback=fb,
                )),
            )
    run(
        "recursive leaf=16 ns=1 bf16-factor fb=False",
        jax.jit(functools.partial(
            pallas_inverse_rbt_batched, engine="recursive", leaf=16,
            ns_steps=1, factor_precision="bfloat16", fallback=False,
        )),
    )
    for nb in (16, 32):
        run(
            f"hybrid nb={nb} ns=1 fb=False",
            jax.jit(functools.partial(
                pallas_inverse_rbt_batched, engine="hybrid", nb=nb,
                ns_steps=1, fallback=False,
            )),
        )
