"""Round-5 (VERDICT r4 item 5b): re-attack the 448 <= N < 1024 band.

Round-4's crossover A/B (lanes 754/783 vs block elimination 325/709
GF/s at N=512/768) predates ``large_solve_rbt``'s round-5 upgrades:
UNPIVOTED recursive diagonal-block inverses (``diag_engine="recursive"``
— the pivoted getrf loops were the 9.6-of-15.3 ms term the A/B was
measuring) and per-size nb routing.  At N=1024 those moved the block
path 1181 -> 3077 GF/s, so the 512/768 crossover must be re-measured.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r5_band.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.rbt import pallas_solve_rbt_batched
from linalg_solver_tpu.ops.lu_large import large_solve_rbt
from linalg_solver_tpu.utils.benchmarking import device_slope_time


def run(name, f, B, N, warm=False):
    k_a, k_b = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
        4.0 * N**0.5
    ) * jnp.eye(N, dtype=jnp.float32)
    b = jax.random.normal(k_b, (B, N), jnp.float32)
    fl = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
    x = np.asarray(f(a, b), np.float64)
    r = np.linalg.norm(
        np.einsum("bij,bj->bi", np.asarray(a, np.float64), x)
        - np.asarray(b, np.float64), axis=1,
    ) / np.linalg.norm(np.asarray(b, np.float64), axis=1)
    sec = device_slope_time(f, a, b)
    tag = "[warmup] " if warm else ""
    print(
        f"{tag}{name:34s} B={B:3d} N={N:4d}: {sec*1e3:7.3f} ms = "
        f"{fl/sec/1e9:6.0f} GF/s  resid={r.max():.1e}",
        flush=True,
    )


lanes = jax.jit(functools.partial(pallas_solve_rbt_batched))
blk128 = jax.jit(functools.partial(
    large_solve_rbt, nb=128, ir_steps=2
))
blk64 = jax.jit(functools.partial(large_solve_rbt, nb=64, ir_steps=2))

if __name__ == "__main__":
    run("lanes (phase engine)", lanes, 64, 512, warm=True)
    for B, N in ((64, 512), (32, 768), (16, 896)):
        run("lanes (phase engine)", lanes, B, N)
        run("large_solve_rbt nb=128 rec-diag", blk128, B, N)
        run("large_solve_rbt nb=64 rec-diag", blk64, B, N)
