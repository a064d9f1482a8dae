"""Production-style serving loop: stream → solve → verify → checkpoint.

Composes the framework's production pieces the way a long-running
service would (SURVEY.md §5 lists the reference as having none of
these — they are TPU-native additions):

- **Request stream**: batches of linear systems arrive in shards sized
  for the device (here generated; in production, from a host queue).
- **Failure detection**: every result is residual-checked
  (``BatchedSolver.solve_checked``); failed lanes are retried on the
  exact/loop path rather than silently returned.
- **Metrics**: running counters (throughput, failure rate, worst
  residual) aggregated on host.
- **Checkpoint/resume**: the stream cursor + accumulated metrics
  persist via ``utils.checkpoint.save_pytree``; a restarted process
  resumes mid-stream instead of recomputing.

Run: PYTHONPATH=. python examples/serving_pipeline.py [--resume]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from linalg_solver_tpu.models.solver import BatchedSolver
from linalg_solver_tpu.ops.generate import full_rank_batch
from linalg_solver_tpu.utils.checkpoint import load_pytree, save_pytree

CKPT = "/tmp/linalg_serving_ckpt"


def make_request(step: int, batch: int, n: int):
    """One incoming request shard (deterministic per step)."""
    key = jax.random.PRNGKey(step)
    k_a, k_b = jax.random.split(key)
    a = full_rank_batch(k_a, batch, n)
    b = jax.random.normal(k_b, (batch, n))
    return a, b


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()

    solver = BatchedSolver()
    state = {
        "step": jnp.zeros((), jnp.int32),
        "served": jnp.zeros((), jnp.int32),
        "failed": jnp.zeros((), jnp.int32),
        "worst_rel": jnp.zeros((), jnp.float32),
    }
    if args.resume and os.path.exists(CKPT):
        state = load_pytree(CKPT, state)
        print(f"resumed at step {int(state['step'])}")

    t0 = time.time()
    for step in range(int(state["step"]), args.steps):
        a, b = make_request(step, args.batch, args.n)
        x, rel, ok = solver.solve_checked(a, b)
        okn = np.asarray(ok)
        if not okn.all():
            # Failed lanes: retry through the affine path (handles the
            # singular/ill-conditioned stragglers the fast path flags).
            bad = ~okn
            sub = solver.affine_solve(a[bad], b[bad])
            x = np.asarray(x)
            x[bad] = np.asarray(sub.particular)
        state = {
            "step": jnp.asarray(step + 1, jnp.int32),
            "served": state["served"] + args.batch,
            "failed": state["failed"] + int((~okn).sum()),
            "worst_rel": jnp.maximum(
                state["worst_rel"], jnp.max(rel)
            ),
        }
        if (step + 1) % 5 == 0:
            save_pytree(CKPT, state)
            dt = time.time() - t0
            print(json.dumps({
                "step": step + 1,
                "served": int(state["served"]),
                "failed": int(state["failed"]),
                "worst_rel": float(state["worst_rel"]),
                "throughput_mat_s": round(
                    int(state["served"]) / max(dt, 1e-9)
                ),
            }))
    save_pytree(CKPT, state)
    print("done:", json.dumps({
        "served": int(state["served"]),
        "failed": int(state["failed"]),
        "worst_rel": float(state["worst_rel"]),
    }))


if __name__ == "__main__":
    main()
