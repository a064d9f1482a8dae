"""Dev experiment: Neumann base size and matmul precision vs wall time."""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import linalg_solver_tpu.ops.lu_blocked as lub  # noqa: E402
from linalg_solver_tpu.utils.benchmarking import chained_time  # noqa: E402

B, N = 256, 256
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
flops = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)

real_ctx = jax.default_matmul_precision


def run(base, prec):
    lub._NEUMANN_BASE = base
    if prec != "float32":
        jax.default_matmul_precision = lambda _: real_ctx(prec)
    else:
        jax.default_matmul_precision = real_ctx
    both = jax.jit(
        lambda a, b: lub.blocked_lu_solve(
            lub.blocked_lu_batched(a, nb=64, panel_backend="pallas"), b
        )
    )
    import numpy as np

    x = np.asarray(both(a, b), dtype=np.float64)
    an = np.asarray(a, dtype=np.float64)
    bn = np.asarray(b, dtype=np.float64)
    resid = np.linalg.norm(
        np.einsum("bij,bj->bi", an, x) - bn
    ) / np.linalg.norm(bn)
    t = chained_time(both, a, b, iters=10, repeats=3)
    print(
        f"base={base:<3} prec={prec:<14} factor+solve {t*1e3:7.2f} ms  "
        f"{flops/t/1e9:7.1f} GFLOP/s  resid(f64) {float(resid):.2e}",
        flush=True,
    )
    jax.default_matmul_precision = real_ctx


configs = [
    (64, "float32"),
    (32, "float32"),
    (16, "float32"),
    (1, "float32"),
    (32, "tensorfloat32"),
    (16, "tensorfloat32"),
]
if len(sys.argv) > 1:
    configs = [
        (int(c.split(",")[0]), c.split(",")[1]) for c in sys.argv[1:]
    ]
for base, prec in configs:
    run(base, prec)
