"""Rescue-firing benchmark, round 4 (VERDICT r3 item 2): the DEFAULT
fused solve path on batches with k ADVERSARIAL lanes.

Round-3 structure re-ran the full redraw pipeline + nested pivoted pass
for the whole batch under one lax.cond — a flat ~5x penalty for k>=1.
Round 4 changes two things:

1. the fused kernel factors in f32 (no bf16 GEMM passes), so the
   butterfly preconditioning alone handles singular-leading-minor lanes
   and the kappa-spread gaussian class IN LINE — the gate mostly
   doesn't fire at all;
2. when it does fire, the rescue is LANE-COMPACTED: flagged lanes
   gather into one 128-lane kernel tile (ops/rbt._compacted_rescue),
   so the re-run costs one tile, not the batch.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r4_rescue.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N = 256, 256
FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)

# The production default: fused engine, compacted redraw rescue.
solver = jax.jit(functools.partial(
    rbt.pallas_solve_rbt_batched, ir_steps=2, fallback="redraw"))


def measure(tag, a, b):
    x = np.asarray(solver(a, b), np.float64)
    a64 = np.asarray(a, np.float64)
    b64 = np.asarray(b, np.float64)
    # f64 HOST residuals (a bf16 einsum check lies); report the worst
    # lane among the solvable ones
    r = np.linalg.norm(
        np.einsum("bij,bj->bi", a64, x) - b64, axis=1
    ) / np.maximum(np.linalg.norm(b64, axis=1), 1e-30)
    finite = np.isfinite(r)
    sec = device_slope_time(solver, a, b)
    print(f"{tag:28s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:7.1f} GFLOP/s"
          f"  worst-finite-lane resid {np.max(r[finite]):.2e}"
          f"  finite {int(np.sum(finite))}/{B}", flush=True)
    return sec


key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
base = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)

times = {}
for k in (0, 1, 8, 64):
    a = np.asarray(base).copy()
    for lane in range(k):
        if lane % 2 == 0:
            # singular leading minor: zero the top-left 32x32 block
            # (still full-rank overall with the bottom rows) — defeats
            # no-pivot LU but not the butterfly/pivoted rescue
            a[lane, :32, :32] = 0.0
        else:
            # fully zero lane: genuinely singular, must be flagged,
            # not crash the batch
            a[lane] = 0.0
    times[k] = measure(f"adversarial k={k}", jnp.asarray(a), b)

# κ-spread gaussian (NO diagonal shift): condition numbers ~1e3-1e5,
# the realistic hard class the friendly bench input avoids
g = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (B, N, N),
                                 jnp.float32))
times["gauss"] = measure("gaussian (no shift)", jnp.asarray(g), b)

print(f"\npenalties vs k=0: "
      + ", ".join(f"k={k}: {times[k]/times[0]:.2f}x"
                  for k in (1, 8, 64))
      + f", gaussian: {times['gauss']/times[0]:.2f}x")

# VERDICT r3 item 2 bound: one flagged lane must no longer cost the
# whole batch a multi-x rescue.
assert times[1] / times[0] < 1.3, (
    f"k=1 rescue penalty regressed: {times[1]/times[0]:.2f}x"
)
print("k=1 penalty bound OK (<1.3x)")
