"""Round-3 routing sweep: same-process A/B of the solve and inverse
backends across N, to pick the ``backend="auto"`` crossovers honestly
(VERDICT r2 weak-2: auto never routed to the measured-best backends).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_routing.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops import lu_blocked as lub
from linalg_solver_tpu.ops import pallas as pk
from linalg_solver_tpu.utils.benchmarking import device_slope_time


def solve_case(B, N):
    k_a, k_b = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
        4.0 * N**0.5
    ) * jnp.eye(N, dtype=jnp.float32)
    b = jax.random.normal(k_b, (B, N), jnp.float32)
    flops = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
    a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
    nb = next(w for w in (64, 48, 32, 16, 8) if N % w == 0)

    def run(name, f):
        try:
            x = np.asarray(f(a, b), np.float64)
            r = np.max(np.linalg.norm(
                np.einsum("bij,bj->bi", a64, x) - b64, axis=1
            ) / np.linalg.norm(b64, axis=1))
            sec = device_slope_time(f, a, b)
        except Exception as e:  # noqa: BLE001
            print(f"  solve B={B} N={N} {name:16s} FAILED: {e}",
                  flush=True)
            return
        print(f"  solve B={B} N={N} {name:16s} {sec*1e3:8.3f} ms "
              f"{flops/sec/1e9:8.1f} GFLOP/s  resid {r:.2e}", flush=True)

    run("rbt", jax.jit(functools.partial(
        rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=2,
        fallback="redraw")))
    run("mixed", jax.jit(functools.partial(
        lub.pallas_solve_mixed_batched, nb=nb)))
    run("blocked_pallas", jax.jit(functools.partial(
        lub.pallas_solve_batched, nb=nb)))
    if pk.supports("solve", N):
        run("gj_kernel", jax.jit(pk.solve_batched))
    run("xla", jax.jit(
        lambda a, b: jnp.linalg.solve(a, b[..., None])[..., 0]))


def inverse_case(B, N):
    a = jax.random.normal(
        jax.random.PRNGKey(3), (B, N, N), jnp.float32
    ) + (4.0 * N**0.5) * jnp.eye(N, dtype=jnp.float32)
    a64 = np.asarray(a, np.float64)
    nb = next(w for w in (64, 48, 32, 16, 8) if N % w == 0)

    def run(name, f):
        try:
            x = np.asarray(f(a), np.float64)
            err = np.max(np.abs(a64 @ x - np.eye(N)))
            sec = device_slope_time(f, a)
        except Exception as e:  # noqa: BLE001
            print(f"  inv   B={B} N={N} {name:16s} FAILED: {e}",
                  flush=True)
            return
        print(f"  inv   B={B} N={N} {name:16s} {sec*1e3:8.3f} ms "
              f"{B/sec/1e3:8.1f} k mat/s  |AX-I| {err:.2e}", flush=True)

    run("rbt ns=1", jax.jit(functools.partial(
        rbt.pallas_inverse_rbt_batched, nb=nb, ns_steps=1,
        fallback="redraw")))
    run("blocked_pallas", jax.jit(functools.partial(
        lub.blocked_inverse_batched, nb=nb, panel_backend="pallas")))
    if pk.supports("inverse", N):
        run("gj_kernel", jax.jit(pk.inverse_batched))
    run("xla", jax.jit(jnp.linalg.inv))


if __name__ == "__main__":
    for B, N in ((256, 128), (256, 256), (64, 512)):
        solve_case(B, N)
    for B, N in ((1024, 64), (256, 128), (64, 256), (16, 512)):
        inverse_case(B, N)
