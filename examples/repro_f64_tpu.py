"""Reproducer for the TPU emulated-f64 long-iteration corruption.

float64 on TPU is EMULATED (double-double style splitting in the XLA
lowering).  The framework's Schur stack is dtype-generic and exact in
f64 on CPU (eigenvalues ~1e-13), and short isolated pieces are exact
on TPU too (hessenberg/balance/6 sweeps: 4e-13) — but every
full-convergence configuration corrupts to O(0.1..1) eigenvalue error
(the reason `ops/schur.py:_run_schur` refuses f64 on TPU).

This script demonstrates the corruption at the smallest configuration
we could find, with the identical computation run on CPU as the
control: same jaxpr, same input, wildly different output.  Run on a
machine with a TPU attached; pass --sweeps to see the error grow with
iteration count (short runs are exact — it is an ACCUMULATING
miscompile, not a single bad op).
"""

import argparse

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from unittest import mock


def run(platform: str, A, chunk: int):
    """Eigenvalues via the framework's f64 Schur on the given backend
    (the TPU guard is bypassed for this reproduction)."""
    import linalg_solver_tpu.ops.schur as schur

    dev = jax.devices(platform)[0]
    Aj = jax.device_put(jnp.asarray(A, jnp.float64), dev)
    with jax.default_device(dev):
        with mock.patch.object(
            schur.jax, "default_backend", lambda: "cpu"
        ):
            res = schur.eigvals_schur(Aj, chunk=chunk)
    w = np.asarray(res.real) + 1j * np.asarray(res.imag)
    return np.sort_complex(w[0]), bool(np.asarray(res.converged).all())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=64)
    args = ap.parse_args()

    A = np.random.RandomState(0).randn(1, args.n, args.n)
    want = np.sort_complex(np.linalg.eigvals(A[0]))

    accel = jax.default_backend()  # "axon" on the tunnel, "tpu" direct
    for platform in ("cpu", accel):
        try:
            got, conv = run(platform, A, args.chunk)
        except RuntimeError as e:
            print(f"{platform}: unavailable ({e})")
            continue
        # nearest-neighbor spectrum match (sort_complex orders by real
        # part first and scrambles ties)
        dev = 0.0
        remaining = list(want)
        for g in got:
            j = int(np.argmin([abs(g - w) for w in remaining]))
            dev = max(dev, abs(g - remaining.pop(j)))
        print(
            f"{platform}: converged={conv}  max eigenvalue dev vs "
            f"numpy f64 = {dev:.3e}"
        )


if __name__ == "__main__":
    main()
