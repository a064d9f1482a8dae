"""On-chip validation of the extended-precision (Ozaki slice-GEMM)
path: f64-class accuracy from bf16 MXU arithmetic.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_dd.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def main():
    print("devices:", jax.devices(), flush=True)
    from linalg_solver_tpu.ops.dd import (
        matmul_dd_batched,
        solve_dd_batched,
    )
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    rng = np.random.RandomState(0)

    # ---------------- dd matmul: accuracy + cost vs f32 HIGHEST ------
    print("\n=== matmul_dd 64x(256x256x256) ===", flush=True)
    B, n = 64, 256
    A = rng.randn(B, n, n).astype(np.float32)
    Bm = rng.randn(B, n, n).astype(np.float32)
    Aj, Bj = jnp.asarray(A), jnp.asarray(Bm)
    t0 = time.time()
    r = matmul_dd_batched(Aj, Bj)
    jax.block_until_ready(r.hi)
    print(f"first call: {time.time()-t0:.1f}s", flush=True)
    got = np.asarray(r.hi, np.float64) + np.asarray(r.lo, np.float64)
    want = A[:4].astype(np.float64) @ Bm[:4].astype(np.float64)
    rel = np.abs(got[:4] - want).max() / np.abs(want).max()
    print("dd rel err (4 lanes, f64-host):", rel)

    hp = jax.lax.Precision.HIGHEST
    f32mm = jax.jit(
        lambda a, b: jnp.einsum("bij,bjk->bik", a, b, precision=hp)
    )
    plain = np.asarray(f32mm(Aj[:4], Bj[:4]), np.float64)
    print("f32 HIGHEST rel err:", np.abs(plain - want).max()
          / np.abs(want).max())

    dt_dd = device_slope_time(
        lambda a, b: matmul_dd_batched(a, b).hi, Aj, Bj
    )
    dt_f32 = device_slope_time(f32mm, Aj, Bj)
    dt_dd3 = device_slope_time(
        lambda a, b: matmul_dd_batched(a, b, t=3).hi, Aj, Bj
    )
    flops = 2.0 * B * n ** 3
    print(f"dd t=6: {dt_dd*1e3:.2f} ms ({flops/dt_dd/1e12:.2f} eff-TFLOP/s)"
          f" | dd t=3: {dt_dd3*1e3:.2f} ms"
          f" | f32 HIGHEST: {dt_f32*1e3:.2f} ms"
          f" | ratio dd/f32: {dt_dd/dt_f32:.2f}x", flush=True)

    # ---------------- dd solve at the bench shape --------------------
    print("\n=== solve_dd 256x(256x256) ===", flush=True)
    B, n = 256, 256
    U, _ = np.linalg.qr(rng.randn(B, n, n))
    V, _ = np.linalg.qr(rng.randn(B, n, n))
    s = np.logspace(0, -4, n)
    A = ((U * s[None, None, :]) @ V.transpose(0, 2, 1)).astype(
        np.float32
    )
    x_true = rng.randn(B, n)
    b = np.einsum(
        "bij,bj->bi", A.astype(np.float64), x_true
    ).astype(np.float32)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)
    t0 = time.time()
    sres = solve_dd_batched(Aj, bj)
    jax.block_until_ready(sres.x_hi)
    print(f"first call: {time.time()-t0:.1f}s  ok: "
          f"{int(np.asarray(sres.ok).sum())}/{B}", flush=True)
    x = (np.asarray(sres.x_hi, np.float64)
         + np.asarray(sres.x_lo, np.float64))
    res = np.abs(
        np.einsum("bij,bj->bi", A.astype(np.float64), x)
        - b.astype(np.float64)
    ).max() / np.abs(b).max()
    print("dd solve rel resid (f64-host, kappa=1e4):", res)

    from linalg_solver_tpu.ops.dispatch import solve_batched

    xp = np.asarray(
        jax.block_until_ready(solve_batched(Aj, bj, backend="mixed")),
        np.float64,
    )
    resp = np.abs(
        np.einsum("bij,bj->bi", A.astype(np.float64), xp)
        - b.astype(np.float64)
    ).max() / np.abs(b).max()
    print("mixed-path rel resid:", resp)

    dt_dd = device_slope_time(
        lambda a, c: solve_dd_batched(a, c).x_hi, Aj, bj
    )
    dt_mixed = device_slope_time(
        lambda a, c: solve_batched(a, c, backend="mixed"), Aj, bj
    )
    print(f"solve_dd: {dt_dd*1e3:.2f} ms | mixed f32: "
          f"{dt_mixed*1e3:.2f} ms | ratio {dt_dd/dt_mixed:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
