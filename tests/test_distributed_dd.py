"""Distributed extended-precision solve: f64-class residuals for one
mesh-sharded system (row-local dd residuals, zero extra collectives).
Runs on the 8-virtual-device CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linalg_solver_tpu.parallel.mesh import make_mesh


def _system(n, kappa, seed):
    rng = np.random.RandomState(seed)
    U, _ = np.linalg.qr(rng.randn(n, n))
    V, _ = np.linalg.qr(rng.randn(n, n))
    s = np.logspace(0, -np.log10(kappa), n)
    A = ((U * s[None, :]) @ V.T).astype(np.float32)
    x = rng.randn(n)
    b = (A.astype(np.float64) @ x).astype(np.float32)
    return A, b


class TestDistributedDD:
    def test_f64_class_residual(self):
        from linalg_solver_tpu.parallel.distributed_dd import (
            distributed_solve_dd,
        )

        A, b = _system(64, kappa=1e3, seed=0)
        mesh = make_mesh(dp=2, tp=4)
        r = distributed_solve_dd(
            jnp.asarray(A), jnp.asarray(b), mesh, axis="tp"
        )
        assert bool(np.asarray(r.ok))
        x = np.asarray(r.x_hi, np.float64) + np.asarray(r.x_lo, np.float64)
        res = np.abs(
            A.astype(np.float64) @ x - b.astype(np.float64)
        ).max() / np.abs(b).max()
        assert res < 1e-11, res

    def test_beats_plain_distributed_solve(self):
        from linalg_solver_tpu.parallel.distributed_dd import (
            distributed_solve_dd,
        )
        from linalg_solver_tpu.parallel.distributed_lu import (
            distributed_solve,
        )

        A, b = _system(64, kappa=1e3, seed=1)
        mesh = make_mesh(dp=2, tp=4)
        r = distributed_solve_dd(
            jnp.asarray(A), jnp.asarray(b), mesh, axis="tp"
        )
        x = np.asarray(r.x_hi, np.float64) + np.asarray(r.x_lo, np.float64)
        xp = np.asarray(
            distributed_solve(jnp.asarray(A), jnp.asarray(b), mesh,
                              axis="tp"),
            np.float64,
        )
        A64, b64 = A.astype(np.float64), b.astype(np.float64)
        res = np.abs(A64 @ x - b64).max()
        resp = np.abs(A64 @ xp - b64).max()
        assert res < resp / 1e3

    @pytest.mark.slow
    @pytest.mark.parametrize("tp", [1, 2, 4, 8])
    def test_mesh_shape_invariance(self, tp):
        from linalg_solver_tpu.parallel.distributed_dd import (
            distributed_solve_dd,
        )

        A, b = _system(32, kappa=10.0, seed=2)
        mesh = make_mesh(dp=8 // tp, tp=tp)
        r = distributed_solve_dd(
            jnp.asarray(A), jnp.asarray(b), mesh, axis="tp", nb=4
        )
        assert bool(np.asarray(r.ok))
        x = np.asarray(r.x_hi, np.float64) + np.asarray(r.x_lo, np.float64)
        res = np.abs(
            A.astype(np.float64) @ x - b.astype(np.float64)
        ).max()
        assert res < 1e-11, (tp, res)
