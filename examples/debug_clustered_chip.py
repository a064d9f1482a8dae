"""Isolate the on-chip clustered-spectrum stall (clean 2/32, dev O(1)
at 32x256 multiplicity-85 — CPU converges the identical ensemble clean
at dev 3e-5).

Sweeps config axes on small-to-large clustered problems:
  - size n in {128, 256}
  - AED on/off (aed_w=-1 auto vs 0)
  - multishift chain vs single double-shift (npairs auto vs 1)

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/debug_clustered_chip.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import schur  # noqa: E402


def clustered(B, n, seed=0):
    rng = np.random.default_rng(seed)
    mult = n // 3
    reps = [n - 2 * mult, mult, mult]
    w = np.repeat([1.0, 2.0, 3.0], reps)
    qs, _ = np.linalg.qr(rng.standard_normal((B, n, n)))
    return (qs * w[None, None, :]) @ np.swapaxes(qs, 1, 2)


def check(tag, A, **kw):
    A32 = jnp.asarray(A.astype(np.float32))
    t0 = time.perf_counter()
    try:
        r = schur.real_schur(A32, **kw)
        re, im = schur._eigvals_from_T(r.T)
    except Exception as exc:
        print(f"[{tag}] FAILED: {type(exc).__name__}: {exc}", flush=True)
        return
    ev = np.asarray(re) + 1j * np.asarray(im)
    dt = time.perf_counter() - t0
    worst = 0.0
    for b in range(min(4, A.shape[0])):
        want = np.linalg.eigvals(A[b])
        for g in ev[b]:
            i = np.argmin(np.abs(want - g))
            worst = max(worst, abs(want[i] - g))
            want = np.delete(want, i)
    B = A.shape[0]
    print(
        f"[{tag}] {dt:.1f}s sweeps={int(r.sweeps)} "
        f"conv={int(np.asarray(r.converged).sum())}/{B} "
        f"clean={int(np.asarray(r.clean).sum())}/{B} dev={worst:.2e}",
        flush=True,
    )


def main():
    print("devices:", jax.devices(), flush=True)
    A128 = clustered(4, 128)
    A256 = clustered(8, 256)
    check("n=128 default", A128)
    check("n=128 no-AED", A128, aed_w=0)
    check("n=128 npairs=1", A128, nshift_pairs=1)
    check("n=256 default", A256)
    check("n=256 no-AED", A256, aed_w=0)
    check("n=256 npairs=1", A256, nshift_pairs=1)


if __name__ == "__main__":
    main()
