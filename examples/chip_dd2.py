"""Chip run 2 for extended precision: optimized dd timings, the mixed
solve's divergence fallback, and dd-refined eigh.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_dd2.py
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
        eigh_dd_batched,
        matmul_dd_batched,
        solve_dd_batched,
    )
    from linalg_solver_tpu.utils.benchmarking import device_slope_time

    rng = np.random.RandomState(0)
    hp = jax.lax.Precision.HIGHEST

    # ---------------- dd matmul: accuracy + honest cost --------------
    print("\n=== matmul_dd 64x(256x256x256), band-accumulated ===",
          flush=True)
    B, n = 64, 256
    A = rng.randn(B, n, n).astype(np.float32)
    Bm = rng.randn(B, n, n).astype(np.float32)
    Aj, Bj = jnp.asarray(A), jnp.asarray(Bm)
    r = matmul_dd_batched(Aj, Bj)
    got = np.asarray(r.hi, np.float64) + np.asarray(r.lo, np.float64)
    want = A[:4].astype(np.float64) @ Bm[:4].astype(np.float64)
    print("dd rel err:", np.abs(got[:4] - want).max()
          / np.abs(want).max(), flush=True)

    # honest baselines: consume EVERY output element via a global sum
    # (device_slope_time consumes one element; XLA slices a bare dot)
    f32mm = lambda a, b: jnp.sum(
        jnp.einsum("bij,bjk->bik", a, b, precision=hp)
    )
    bf16mm = lambda a, b: jnp.sum(
        jnp.einsum("bij,bjk->bik", a, b)
    )
    dd6 = lambda a, b: jnp.sum(matmul_dd_batched(a, b).hi)
    dd3 = lambda a, b: jnp.sum(matmul_dd_batched(a, b, t=3).hi)
    dt_f32 = device_slope_time(f32mm, Aj, Bj)
    dt_bf16 = device_slope_time(bf16mm, Aj, Bj)
    dt_dd6 = device_slope_time(dd6, Aj, Bj)
    dt_dd3 = device_slope_time(dd3, Aj, Bj)
    flops = 2.0 * B * n ** 3
    print(f"bf16 1-pass: {dt_bf16*1e3:.2f} ms "
          f"({flops/dt_bf16/1e12:.1f} TF/s)\n"
          f"f32 HIGHEST: {dt_f32*1e3:.2f} ms "
          f"({flops/dt_f32/1e12:.1f} TF/s)\n"
          f"dd t=6:      {dt_dd6*1e3:.2f} ms "
          f"({flops/dt_dd6/1e12:.2f} TF/s, {dt_dd6/dt_f32:.1f}x f32)\n"
          f"dd t=3:      {dt_dd3*1e3:.2f} ms "
          f"({dt_dd3/dt_f32:.1f}x f32)", flush=True)

    # ---------------- dd solve, slice-once -----------------------------
    print("\n=== solve_dd 256x(256x256), kappa=1e4 ===", flush=True)
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
    sres = solve_dd_batched(Aj, bj)
    x = (np.asarray(sres.x_hi, np.float64)
         + np.asarray(sres.x_lo, np.float64))
    res = np.abs(
        np.einsum("bij,bj->bi", A.astype(np.float64), x)
        - b.astype(np.float64)
    ).max() / np.abs(b).max()
    print("dd solve resid:", res, " ok:",
          int(np.asarray(sres.ok).sum()), "/", B, flush=True)
    dt_dd = device_slope_time(
        lambda a, c: solve_dd_batched(a, c).x_hi, Aj, bj
    )
    print(f"solve_dd per-call: {dt_dd*1e3:.2f} ms", flush=True)

    # ---------------- mixed path: divergence fallback -----------------
    print("\n=== mixed solve fallback on kappa=1e4 ===", flush=True)
    from linalg_solver_tpu.ops.dispatch import solve_batched

    xp = np.asarray(
        jax.block_until_ready(solve_batched(Aj, bj, backend="mixed")),
        np.float64,
    )
    resp = np.abs(
        np.einsum("bij,bj->bi", A.astype(np.float64), xp)
        - b.astype(np.float64)
    ).max() / np.abs(b).max()
    print("mixed-with-fallback resid (was 5e28):", resp, flush=True)

    # headline-class input: fallback must NOT trigger, cost must stay flat
    print("\n=== mixed solve cost on the bench class ===", flush=True)
    Ag = (rng.randn(B, n, n) / np.sqrt(n) + 2 * np.eye(n)).astype(
        np.float32
    )
    bg = rng.randn(B, n).astype(np.float32)
    Agj, bgj = jnp.asarray(Ag), jnp.asarray(bg)
    xg = np.asarray(
        jax.block_until_ready(solve_batched(Agj, bgj, backend="mixed")),
        np.float64,
    )
    resg = np.abs(
        np.einsum("bij,bj->bi", Ag.astype(np.float64), xg)
        - bg.astype(np.float64)
    ).max() / np.abs(bg).max()
    dt_mixed = device_slope_time(
        lambda a, c: solve_batched(a, c, backend="mixed"), Agj, bgj
    )
    from linalg_solver_tpu.ops.lu_blocked import (
        pallas_solve_mixed_batched,
    )

    dt_nofb = device_slope_time(
        lambda a, c: pallas_solve_mixed_batched(a, c, nb=64,
                                                fallback=False),
        Agj, bgj,
    )
    print(f"gaussian resid: {resg:.2e} | with fallback: "
          f"{dt_mixed*1e3:.2f} ms | without: {dt_nofb*1e3:.2f} ms "
          f"(overhead {100*(dt_mixed/dt_nofb-1):.1f}%)", flush=True)

    # ---------------- dd eigh ----------------------------------------
    print("\n=== eigh_dd 32x(256x256) separated spectrum ===",
          flush=True)
    B, n = 32, 256
    Q, _ = np.linalg.qr(rng.randn(B, n, n))
    lam = np.linspace(1, 2, n)[None, :] * np.ones((B, 1))
    H = ((Q * lam[:, None, :]) @ Q.transpose(0, 2, 1)).astype(
        np.float32
    )
    Hj = jnp.asarray(H)
    t0 = time.time()
    r = eigh_dd_batched(Hj)
    jax.block_until_ready(r.w)
    print(f"first call: {time.time()-t0:.1f}s", flush=True)
    w = np.asarray(r.w, np.float64) + np.asarray(r.w_lo, np.float64)
    want = np.stack([
        np.linalg.eigvalsh(H[b].astype(np.float64)) for b in range(4)
    ])
    from linalg_solver_tpu.ops.symmetric import eigh_batched

    w32 = np.asarray(eigh_batched(Hj).w, np.float64)
    print("dd eig err:", np.abs(w[:4] - want).max(),
          "| f32 eig err:", np.abs(w32[:4] - want).max(), flush=True)
    dt = device_slope_time(lambda a: eigh_dd_batched(a).w, Hj)
    dt32 = device_slope_time(lambda a: eigh_batched(a).w, Hj)
    print(f"eigh_dd: {dt*1e3:.1f} ms | f32 eigh: {dt32*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
