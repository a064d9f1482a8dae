"""Benchmark: batched 256×256 LU factor+solve throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": R}

``value``      — GFLOP/s of this framework's best backend
                 (2/3·N³ + 2·N² FLOPs per factor+solve, × batch).
``vs_baseline``— ratio vs XLA's built-in ``jnp.linalg.solve`` on the same
                 shapes/chip (the strongest available baseline; the
                 reference itself publishes no numbers — see BASELINE.md).

Runs on the default JAX platform (the real TPU under the driver).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

# Compiles through the TPU tunnel are slow; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time_fn(fn, *args, iters: int = 10) -> float:
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    # Slope between two on-device scan-loop lengths: cancels both the
    # tunnel's per-dispatch latency and the runtime's fixed per-
    # iteration loop cost, leaving pure device throughput (agrees with
    # jax.profiler device totals); best of three against variance.
    return device_slope_time(fn, *args, i1=5, i2=25, repeats=3)


def main() -> None:
    B, N = 256, 256
    key = jax.random.PRNGKey(0)
    k_a, k_b = jax.random.split(key)
    # Well-conditioned dense batch: the eigenvalues of a Gaussian matrix
    # fill a disk of radius ~sqrt(N), so shift by 4*sqrt(N).
    a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
        4.0 * N**0.5
    ) * jnp.eye(N, dtype=jnp.float32)
    b = jax.random.normal(k_b, (B, N), jnp.float32)

    flops = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)

    from linalg_solver_tpu.ops import dispatch

    # backend="auto" — the DEFAULT path every user gets — routes this
    # shape to the RBT backend, which since round 4 is the ONE-LAUNCH
    # fused kernel (ops/pallas/solve_fused_kernel.py): butterfly
    # preconditioning, pivot-free f32 LU, substitution, and both
    # refinement rounds in a single pallas_call with the trail and a
    # pristine copy of A resident in VMEM; per-lane gated with a
    # lane-compacted redraw/pivoted rescue.  Same-process A/B: 1.78 ms
    # vs the round-3 phase path's 3.29 ms at equal f64-verified
    # accuracy (see ops/dispatch._resolve's measured routing table).
    from linalg_solver_tpu.ops.dispatch import _resolve

    assert _resolve("auto", "solve", N) == "rbt", (
        "auto must route the headline shape to rbt"
    )
    ours = jax.jit(
        lambda a, b: dispatch.solve_batched(a, b, backend="auto")
    )
    baseline = jax.jit(
        lambda a, b: jnp.linalg.solve(a, b[..., None])[..., 0]
    )

    # Sanity: the solver must actually solve the systems.
    x_ours = ours(a, b)
    resid = jnp.linalg.norm(
        jnp.einsum("bij,bj->bi", a, x_ours) - b
    ) / jnp.linalg.norm(b)
    assert float(resid) < 1e-2, f"solver inaccurate: resid={float(resid)}"

    t_ours = _time_fn(ours, a, b)
    t_base = _time_fn(baseline, a, b)
    del resid

    # BASELINE metric 2: 1k-batch 64x64 inverse matrices/sec vs
    # jnp.linalg.inv.  The facade routes to the fused RBT no-pivot
    # kernel: in-kernel butterflies + span-restricted Gauss-Jordan +
    # in-kernel Rademacher probe gate + in-kernel redraw/pivoted
    # rescue ladder under pl.when (2.9-3.6M ungated, 2.3-4.5M gated
    # same-process vs the pivoted GJ kernel's ~0.9M;
    # examples/bench_r4_inv.py).
    Bi, Ni = 1024, 64
    ai = jax.random.normal(
        jax.random.PRNGKey(3), (Bi, Ni, Ni), jnp.float32
    ) + (4.0 * Ni**0.5) * jnp.eye(Ni, dtype=jnp.float32)
    from linalg_solver_tpu.ops.pallas import inverse_batched as pinv_b

    inv_ours = jax.jit(pinv_b)
    inv_base = jax.jit(jnp.linalg.inv)
    ident = jnp.einsum(
        "bij,bjk->bik", ai, inv_ours(ai),
        precision=jax.lax.Precision.HIGHEST,
    )
    inv_err = float(
        jnp.max(jnp.abs(ident - jnp.eye(Ni, dtype=jnp.float32)))
    )
    assert inv_err < 1e-2, f"inverse inaccurate: {inv_err}"
    # The sub-millisecond inverse is the variance-sensitive metric
    # (chip-state spread up to ±25% between samples at this scale) —
    # take the best of 5 slope measurements instead of 3.
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    # Same repeats for BOTH sides of the ratio (min-estimator bias
    # under ±25% chip variance — ADVICE r4).
    t_inv = device_slope_time(inv_ours, ai, i1=5, i2=25, repeats=5)
    t_inv_base = device_slope_time(inv_base, ai, i1=5, i2=25, repeats=5)

    gflops = flops / t_ours / 1e9
    gflops_base = flops / t_base / 1e9
    print(
        json.dumps(
            {
                "metric": "batched 256x256 LU factor+solve (B=256, backend=auto -> one-launch fused RBT kernel, f32)",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(gflops / gflops_base, 3),
                "metric2": "1k-batch 64x64 inverse (fused RBT kernel, in-kernel probe gate + rescue ladder)",
                "value2": round(Bi / t_inv, 0),
                "unit2": "matrices/s",
                "vs_baseline2": round(t_inv_base / t_inv, 3),
            }
        )
    )


if __name__ == "__main__":
    # The TPU tunnel occasionally drops between rounds; a transient
    # backend-init failure should not cost the round's benchmark.
    import time
    import traceback

    for attempt in range(3):
        try:
            main()
            break
        except Exception:
            if attempt == 2:
                raise
            traceback.print_exc()
            time.sleep(60)
