"""Round-5 (VERDICT r4 item 4): unpivoted diagonal-block inverses for
``large_solve_rbt``.

The round-4 micro-profile showed the pivoted ``jnp.linalg.inv`` on the
nb×nb diagonal blocks costs 9.6 of 15.3 ms at B=8 N=2048 (getrf column
loops, not FLOPs).  After RBT preconditioning the blocks can be
inverted unpivoted with the log-depth GEMM Schur recursion
(``ops.lu_recursive.inverse_nopivot_recursive``) — pure MXU work.
Same-process A/B of ``diag_engine="recursive"`` (new default) vs
``"pivoted"`` (old path) at both large-N shapes, plus accuracy.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r5_large_diag.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import lu_large
from linalg_solver_tpu.utils.benchmarking import device_slope_time


def bench_shape(B, N, nb=128):
    k_a, k_b = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
        4.0 * N**0.5
    ) * jnp.eye(N, dtype=jnp.float32)
    b = jax.random.normal(k_b, (B, N), jnp.float32)
    FL = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)

    for eng in ("pivoted", "recursive"):
        f = jax.jit(functools.partial(
            lu_large.large_solve_rbt, nb=nb, ir_steps=2, diag_engine=eng
        ))
        x = f(a, b)
        r = np.linalg.norm(
            np.einsum(
                "bij,bj->bi", np.asarray(a, np.float64),
                np.asarray(x, np.float64),
            ) - np.asarray(b, np.float64), axis=1,
        ) / np.linalg.norm(np.asarray(b, np.float64), axis=1)
        sec = device_slope_time(f, a, b)
        print(
            f"B={B:3d} N={N} diag={eng:9s}: {sec*1e3:8.3f} ms = "
            f"{FL/sec/1e9:7.0f} GF/s   resid={r.max():.2e}",
            flush=True,
        )


if __name__ == "__main__":
    bench_shape(16, 1024)
    bench_shape(8, 2048)
