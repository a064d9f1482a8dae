"""Communication-volume accounting: the distributed paths' collective
counts and payload bytes must match their analytic scaling models
(parallel/comm.py) — multi-chip performance evidence beyond
correctness (VERDICT r1 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from linalg_solver_tpu.parallel import comm
from linalg_solver_tpu.parallel.distributed_eigh import distributed_eigh
from linalg_solver_tpu.parallel.distributed_lu import (
    distributed_lu,
    distributed_solve,
)


def _mesh(D, axis="tp"):
    return Mesh(np.array(jax.devices()[:D]), (axis,))


def _spd(n, seed=0):
    g = np.random.RandomState(seed).randn(n, n).astype(np.float32)
    return jnp.asarray((g + g.T) / 2)


def _reg(n, seed=0):
    g = np.random.RandomState(seed).randn(n, n).astype(np.float32)
    return jnp.asarray(g + 3.0 * n**0.5 * np.eye(n, dtype=np.float32))


class TestCommVolume:
    @pytest.mark.parametrize("D,nb,mult", [(2, 4, 2), (4, 4, 2),
                                           (8, 2, 1)])
    def test_lu_factor_matches_model(self, D, nb, mult):
        n = nb * D * mult
        mesh = _mesh(D)
        a = _reg(n)
        jax.clear_caches()  # force a fresh trace under the meter
        with comm.CommMeter() as m:
            res = distributed_lu(a, mesh, axis="tp", nb=nb)
            jax.block_until_ready(res.lu_sharded)
        model = comm.model_lu_factor(n, nb)
        assert dict(m.calls) == model["calls"], m.as_dict()
        assert dict(m.bytes) == model["bytes"], m.as_dict()

    @pytest.mark.parametrize("k_rhs", [1, 3])
    def test_lu_solve_matches_model(self, k_rhs):
        D, nb, n = 4, 4, 32
        mesh = _mesh(D)
        a = _reg(n, seed=1)
        b = jnp.asarray(
            np.random.RandomState(2).randn(n, k_rhs).astype(np.float32)
        )
        jax.clear_caches()
        with comm.CommMeter() as m:
            x = distributed_solve(a, b, mesh, axis="tp", nb=nb)
            jax.block_until_ready(x)
        model = comm.model_lu_solve(n, nb, k_rhs=k_rhs)
        assert dict(m.calls) == model["calls"], m.as_dict()
        assert dict(m.bytes) == model["bytes"], m.as_dict()
        # and it actually solved the system
        resid = float(jnp.linalg.norm(a @ x - b) / jnp.linalg.norm(b))
        assert resid < 1e-4

    @pytest.mark.parametrize("D,sweeps", [(2, 6), (4, 8)])
    def test_eigh_matches_model_and_converges(self, D, sweeps):
        n = 8 * (2 * D)
        mesh = _mesh(D)
        a = _spd(n, seed=3)
        jax.clear_caches()
        with comm.CommMeter() as m:
            res = distributed_eigh(a, mesh, axis="tp", sweeps=sweeps)
            jax.block_until_ready(res.w)
        w = n // (2 * D)
        model = comm.model_eigh(n, D, w, sweeps)
        assert dict(m.calls) == model["calls"], m.as_dict()
        assert dict(m.bytes) == model["bytes"], m.as_dict()
        assert bool(res.converged), float(res.offnorm)

    def test_meter_inactive_is_transparent(self):
        """No meter: results identical (wrappers are pass-through)."""
        D, nb, n = 2, 4, 16
        mesh = _mesh(D)
        a = _reg(n, seed=5)
        b = jnp.ones((n,), jnp.float32)
        x1 = distributed_solve(a, b, mesh, axis="tp", nb=nb)
        jax.clear_caches()
        with comm.CommMeter():
            x2 = distributed_solve(a, b, mesh, axis="tp", nb=nb)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    def test_weak_scaling_comm_model(self):
        """Weak scaling (fixed N/device): factor comm bytes grow ∝ D²
        at fixed per-device columns — the model captures it and the
        implementation matches at every mesh size."""
        nb, per_dev = 2, 4
        for D in (2, 4, 8):
            n = per_dev * nb * D
            mesh = _mesh(D)
            a = _reg(n, seed=D)
            jax.clear_caches()
            with comm.CommMeter() as m:
                res = distributed_lu(a, mesh, axis="tp", nb=nb)
                jax.block_until_ready(res.lu_sharded)
            model = comm.model_lu_factor(n, nb)
            assert dict(m.calls) == model["calls"]
            assert dict(m.bytes) == model["bytes"]
