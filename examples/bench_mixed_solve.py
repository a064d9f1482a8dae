"""On-chip A/B: full-f32 fused solve vs mixed-precision refined solve.

Run on the real TPU (PYTHONPATH must include /root/.axon_site):

    PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_mixed_solve.py

Prints device-slope times, GFLOP/s and f64-verified residuals for the
bench.py headline shape (B=256, N=256) — the decision input for
routing bench.py through backend="mixed".
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from linalg_solver_tpu.ops.lu_blocked import (
        pallas_solve_batched,
        pallas_solve_mixed_batched,
    )
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    print("devices:", jax.devices())
    B, N = 256, 256
    key = jax.random.PRNGKey(0)
    k_a, k_b = jax.random.split(key)
    a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
        4.0 * N**0.5
    ) * jnp.eye(N, dtype=jnp.float32)
    b = jax.random.normal(k_b, (B, N), jnp.float32)

    variants = {
        "f32": jax.jit(lambda a, b: pallas_solve_batched(a, b, nb=64)),
        "mixed_ir1": jax.jit(
            lambda a, b: pallas_solve_mixed_batched(
                a, b, nb=64, ir_steps=1
            )
        ),
        "mixed_ir2": jax.jit(
            lambda a, b: pallas_solve_mixed_batched(
                a, b, nb=64, ir_steps=2
            )
        ),
    }

    an = np.asarray(a, np.float64)
    bn = np.asarray(b, np.float64)

    def resid(x):
        x = np.asarray(x, np.float64)
        r = np.einsum("bij,bj->bi", an, x) - bn
        return float(np.linalg.norm(r) / np.linalg.norm(bn))

    flops = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
    for name, fn in variants.items():
        print(name, "resid:", resid(fn(a, b)))
    for name, fn in variants.items():
        t = device_slope_time(fn, a, b, i1=5, i2=25, repeats=3)
        print(
            f"{name}: {t * 1e3:.4f} ms -> {flops / t / 1e9:.1f} GFLOP/s"
        )


if __name__ == "__main__":
    main()
