"""On-chip: large-N mixed blocked solve (XLA panels + bf16 updates)
vs jnp.linalg.solve.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_lu_large.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from linalg_solver_tpu.ops.lu_large import large_solve_mixed
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    print("devices:", jax.devices(), flush=True)
    for B, N in [(16, 1024), (64, 512), (8, 2048)]:
        k_a, k_b = jax.random.split(jax.random.PRNGKey(0))
        a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
            4.0 * N**0.5
        ) * jnp.eye(N, dtype=jnp.float32)
        b = jax.random.normal(k_b, (B, N), jnp.float32)
        an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
        flops = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
        variants = [
            ("large nb=128", jax.jit(
                lambda a, b: large_solve_mixed(a, b, nb=128, ir_steps=1))),
            ("large nb=256", jax.jit(
                lambda a, b: large_solve_mixed(a, b, nb=256, ir_steps=1))),
            ("jnp.solve", jax.jit(
                lambda a, b: jnp.linalg.solve(a, b[..., None])[..., 0])),
        ]
        for name, fn in variants:
            try:
                x = np.asarray(fn(a, b), np.float64)
                r = np.linalg.norm(
                    np.einsum("bij,bj->bi", an, x) - bn
                ) / np.linalg.norm(bn)
                t = device_slope_time(fn, a, b, i1=3, i2=9, repeats=2)
                print(
                    f"[B={B} N={N}] {name}: {t*1e3:.2f} ms = "
                    f"{flops/t/1e9:.0f} GFLOP/s, resid {r:.2e}",
                    flush=True,
                )
            except Exception as exc:
                print(f"[B={B} N={N}] {name}: FAILED {type(exc).__name__} {exc}",
                      flush=True)


if __name__ == "__main__":
    main()
