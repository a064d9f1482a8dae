"""On-chip validation: f64-class GENERAL eigenvalues from f32 hardware
(VERDICT r2 item 7 done-criterion: 32×(64×64) separated spectra, dev
≤ 1e-10·‖A‖ vs the f64 host oracle, honest flags where clustering
defeats the refinement).

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/chip_eig_dd.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.dd import eig_dd_batched

B, n = 32, 64
rng = np.random.RandomState(11)
# separated spectra: distinct-diagonal dominant + O(1) asymmetric noise
base = np.stack([
    np.diag(np.linspace(0, 4 * (n - 1), n)) + rng.randn(n, n)
    for _ in range(B)
]).astype(np.float32)

t0 = time.time()
r = eig_dd_batched(jnp.asarray(base))
jax.block_until_ready(r.lam_re)
t1 = time.time()
r = eig_dd_batched(jnp.asarray(base))
jax.block_until_ready(r.lam_re)
t2 = time.time()

devs, covered = [], []
for b in range(B):
    oracle = np.linalg.eigvals(base[b].astype(np.float64))
    lam = (np.asarray(r.lam_re[b], np.float64)
           + np.asarray(r.lam_re_lo[b], np.float64)
           + 1j * (np.asarray(r.lam_im[b], np.float64)
                   + np.asarray(r.lam_im_lo[b], np.float64)))
    anorm = np.linalg.norm(base[b].astype(np.float64), 2)
    dev = max(np.min(np.abs(oracle - z)) for z in lam)
    devs.append(dev / anorm)
    eb = np.asarray(r.err_bound[b], np.float64)
    true_err = np.array([np.min(np.abs(oracle - z)) for z in lam])
    covered.append(bool(np.all(true_err <= np.maximum(eb, 1e-12) * 20)))

print(f"eig_dd 32x(64x64) separated: wall cold {t1-t0:.1f}s warm "
      f"{t2-t1:.2f}s")
print(f"  max dev/||A||: {max(devs):.2e}  (target <= 1e-10)")
print(f"  median dev/||A||: {float(np.median(devs)):.2e}")
print(f"  err_bound covers true error: {all(covered)}")
print(f"  converged: {int(np.sum(np.asarray(r.converged)))}/{B}  "
      f"valid: {int(np.sum(np.asarray(r.valid)))}/{B*n}")

# clustered/defective case: flags must stay honest on chip too
J = np.eye(n, dtype=np.float32) * 2.0
for i in range(n - 1):
    J[i, i + 1] = 1.0
P = np.eye(n) + 0.1 * rng.randn(n, n)
A = (P @ J @ np.linalg.inv(P)).astype(np.float32)
r2 = eig_dd_batched(jnp.asarray(A[None]))
oracle = np.linalg.eigvals(A.astype(np.float64))
lam = (np.asarray(r2.lam_re[0], np.float64)
       + np.asarray(r2.lam_re_lo[0], np.float64)
       + 1j * (np.asarray(r2.lam_im[0], np.float64)
               + np.asarray(r2.lam_im_lo[0], np.float64)))
true_err = np.array([np.min(np.abs(oracle - z)) for z in lam])
eb = np.asarray(r2.err_bound[0], np.float64)
s = np.asarray(r2.s[0], np.float64)
print(f"defective J64: min s {float(np.min(s)):.1e} (tiny = honest), "
      f"bound covers error: "
      f"{bool(np.all(true_err <= np.maximum(eb, 1e-10) * 20))}")
