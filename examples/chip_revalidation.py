"""One-shot on-chip revalidation of the staged measurement queue.

Run when the TPU tunnel is back:

    PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_revalidation.py

Covers, in order (compilation cache on, so reruns are cheap):
  1. mixed-precision refined solve vs f32 fused solve (bench shape)
  2. the bench.py headline itself
  3. eigensolver timing spot-check under the corrected AT gating
     (clustered + gaussian 32×256)
  4. symmetric eigh + SVD throughput samples
Prints one line per measurement; failures in a later stage don't lose
earlier numbers.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def stage(name):
    def deco(fn):
        def run():
            try:
                fn()
            except Exception as exc:  # keep going; report
                print(f"[{name}] FAILED: {type(exc).__name__}: {exc}")
        run.__name__ = name
        return run
    return deco


@stage("mixed_solve")
def stage_mixed():
    from linalg_solver_tpu.ops.lu_blocked import (
        pallas_solve_batched, pallas_solve_mixed_batched,
    )
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    B, N = 256, 256
    k_a, k_b = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
        4.0 * N**0.5
    ) * jnp.eye(N, dtype=jnp.float32)
    b = jax.random.normal(k_b, (B, N), jnp.float32)
    an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
    flops = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
    for name, fn in [
        ("f32", jax.jit(lambda a, b: pallas_solve_batched(a, b, nb=64))),
        ("mixed_ir1", jax.jit(
            lambda a, b: pallas_solve_mixed_batched(a, b, nb=64, ir_steps=1))),
        ("mixed_ir2", jax.jit(
            lambda a, b: pallas_solve_mixed_batched(a, b, nb=64, ir_steps=2))),
    ]:
        x = np.asarray(fn(a, b), np.float64)
        r = np.linalg.norm(
            np.einsum("bij,bj->bi", an, x) - bn
        ) / np.linalg.norm(bn)
        t = device_slope_time(fn, a, b, i1=5, i2=25, repeats=3)
        print(f"[mixed_solve] {name}: {t*1e3:.3f} ms = "
              f"{flops/t/1e9:.0f} GFLOP/s, resid {r:.2e}")


@stage("bench_headline")
def stage_bench():
    import bench
    bench.main()


@stage("schur_timing")
def stage_schur():
    import time
    from linalg_solver_tpu.ops.schur import eigvals_schur

    rng = np.random.default_rng(0)
    n = 256
    # clustered (multiplicity-85-like) and gaussian
    w = np.repeat([1.0, 2.0, 3.0], [86, 85, 85])
    qs, _ = np.linalg.qr(rng.standard_normal((32, n, n)))
    clustered = (qs * w[None, None, :]) @ np.swapaxes(qs, 1, 2)
    gauss = rng.standard_normal((32, n, n))
    for name, A in [("clustered", clustered), ("gaussian", gauss)]:
        A32 = jnp.asarray(A.astype(np.float32))
        r = eigvals_schur(A32)   # compile
        jax.block_until_ready(r.real)
        t0 = time.perf_counter()
        r = eigvals_schur(A32)
        np.asarray(r.real)
        dt = time.perf_counter() - t0
        ev = np.asarray(r.real) + 1j * np.asarray(r.imag)
        worst = 0.0
        for b in range(4):   # spot-check 4 lanes
            want = np.linalg.eigvals(A[b])
            got = ev[b]
            for g in got:
                i = np.argmin(np.abs(want - g))
                worst = max(worst, abs(want[i] - g))
                want = np.delete(want, i)
        print(f"[schur_timing] {name} 32x256: {dt:.2f} s wall, "
              f"conv {int(np.asarray(r.converged).sum())}/32, "
              f"clean {int(np.asarray(r.clean).sum())}/32, "
              f"dev {worst:.1e}")


@stage("eigh_svd")
def stage_eigh_svd():
    from linalg_solver_tpu.ops.svd import svd_batched
    from linalg_solver_tpu.ops.symmetric import eigh_batched
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    rng = np.random.default_rng(1)
    A = rng.standard_normal((32, 256, 256)).astype(np.float32)
    S = jnp.asarray(A + np.swapaxes(A, 1, 2))
    G = jnp.asarray(A)
    f_eigh = jax.jit(lambda x: eigh_batched(x).w)
    f_svd = jax.jit(lambda x: svd_batched(x).s)
    for name, fn, x in [("eigh", f_eigh, S), ("svd", f_svd, G)]:
        t = device_slope_time(fn, x, i1=3, i2=9, repeats=2)
        print(f"[eigh_svd] {name} 32x256: {t*1e3:.1f} ms/call")


def main():
    print("devices:", jax.devices())
    for st in (stage_mixed, stage_bench, stage_schur, stage_eigh_svd):
        st()


if __name__ == "__main__":
    main()
