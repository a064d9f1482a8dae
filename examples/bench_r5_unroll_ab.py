"""Round-5: clean same-process A/B of fused-solve unroll (compiles
cached by bench_r5_unroll.py; first chained run per process is ~3x
slow, so a warmup run precedes the measured grid).

unroll=8's Mosaic compile exceeded 18 min (timeout) — dead end for a
production default, mirroring round-4's full-unroll blowup.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r5_unroll_ab.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.pallas.solve_fused_kernel import solve_fused_rbt
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N = 256, 256
k_a, k_b = jax.random.split(jax.random.PRNGKey(0))
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
FL = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)


def run(nb, unroll, ir, label=""):
    f = jax.jit(functools.partial(
        solve_fused_rbt, nb=nb, unroll=unroll, ir_steps=ir
    ))
    x, bad = f(a, b)
    r = np.linalg.norm(
        np.einsum("bij,bj->bi", np.asarray(a, np.float64),
                  np.asarray(x, np.float64)) - np.asarray(b, np.float64),
        axis=1,
    ) / np.linalg.norm(np.asarray(b, np.float64), axis=1)
    sec = device_slope_time(lambda a_, b_: f(a_, b_)[0], a, b)
    print(
        f"{label}nb={nb:2d} unroll={unroll} ir={ir}: {sec*1e3:7.3f} ms = "
        f"{FL/sec/1e9:6.0f} GF/s  resid={r.max():.1e} "
        f"bad={int(np.asarray(bad).sum())}",
        flush=True,
    )


if __name__ == "__main__":
    run(16, 4, 2, label="[warmup] ")
    run(16, 1, 2)
    run(16, 2, 2)
    run(16, 4, 2)
    run(16, 4, 0)
    run(16, 1, 2)   # repeat baseline: drift check
    run(16, 4, 2)
