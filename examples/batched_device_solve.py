"""TPU numeric path: batched solving, spectra, and trace replay.

Run: PYTHONPATH=. python examples/batched_device_solve.py
(Add jax.config.update("jax_platforms", "cpu") to force CPU.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from linalg_solver_tpu.models import BatchedSolver, jordan_analysis
from linalg_solver_tpu.ops.generate import full_rank_batch, jordan_batch
from linalg_solver_tpu.trace.events import replay_solve_trace
from linalg_solver_tpu.utils.trace import capture_logs


def main():
    key = jax.random.PRNGKey(0)
    solver = BatchedSolver()

    # 1k batched solves.
    a = full_rank_batch(key, 1024, 64)
    b = jax.random.normal(jax.random.PRNGKey(1), (1024, 64))
    x = solver.solve(a, b)
    resid = jnp.linalg.norm(
        jnp.einsum("bij,bj->bi", a, x) - b
    ) / jnp.linalg.norm(b)
    print("batch solve relative residual:", float(resid))

    # Inverse + exact integer determinants.
    inv = solver.inverse(a[:8])
    print("inverse check:", float(jnp.max(jnp.abs(
        jnp.einsum("bij,bjk->bik", a[:8], inv) - jnp.eye(64)
    ))))
    # Exact integer determinants (Bareiss): small matrices so the int32
    # intermediates provably fit (see ops.exact_int.bareiss_safe).
    small = jax.random.randint(jax.random.PRNGKey(3), (8, 4, 4), -5, 6)
    exact = solver.det_exact(small.astype(jnp.int32))
    print("exact dets:", np.asarray(exact.det), "ok:", bool(exact.ok.all()))

    # Jordan structure of a 128x128 batch at known eigenvalues.
    batch = jordan_batch(
        jax.random.PRNGKey(2), 8,
        tuple([(2.0, 2)] * 16 + [(5.0, 1)] * 96),
        transform="orthogonal",
    )
    report = jordan_analysis(batch, jnp.array([2.0, 5.0]), k_max=3)
    print("alg mult:", np.asarray(report.alg_mult[0]),
          "geom mult:", np.asarray(report.geom_mult[0]))

    # Device events replayed as a human-readable LaTeX derivation.
    latex = capture_logs(lambda: replay_solve_trace(batch=2, n=3))
    print("--- replayed derivation (first 400 chars) ---")
    print(latex[:400])


if __name__ == "__main__":
    main()
