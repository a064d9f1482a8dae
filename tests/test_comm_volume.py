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
        """The adaptive loop's while body is traced ONCE, so the meter
        sees the fixed part + exactly ONE per-sweep part; the dynamic
        trip count is reported as ``sweeps_used`` and closes the total
        model ``model_eigh_adaptive(..., sweeps_used)``."""
        n = 8 * (2 * D)
        mesh = _mesh(D)
        a = _spd(n, seed=3)
        jax.clear_caches()
        with comm.CommMeter() as m:
            res = distributed_eigh(a, mesh, axis="tp", sweeps=sweeps)
            jax.block_until_ready(res.w)
        w = n // (2 * D)
        traced = comm.model_eigh_adaptive(n, D, w, 1)
        assert dict(m.calls) == traced["calls"], m.as_dict()
        assert dict(m.bytes) == traced["bytes"], m.as_dict()
        assert bool(res.converged), float(res.offnorm)
        k = int(res.sweeps_used)
        assert 1 <= k <= sweeps
        # the total adaptive model is consistent additive structure
        total = comm.model_eigh_adaptive(n, D, w, k)
        per_sweep = comm.model_eigh_per_sweep(n, D, w)
        for kind, c in per_sweep["calls"].items():
            assert total["calls"][kind] == (
                comm.model_eigh_fixed(n)["calls"].get(kind, 0) + k * c
            )

    def test_eigh_adaptive_early_exit(self):
        """A near-diagonal input converges in FEWER sweeps than the
        cap — the loop must stop paying rounds (VERDICT r2 weak-5),
        and a hard input at the same shape must pay more."""
        D = 4
        n = 8 * (2 * D)
        mesh = _mesh(D)
        rng = np.random.RandomState(7)
        easy = np.diag(np.arange(1, n + 1).astype(np.float32))
        easy += 1e-6 * (lambda g: (g + g.T) / 2)(
            rng.randn(n, n).astype(np.float32)
        )
        res_easy = distributed_eigh(
            jnp.asarray(easy), mesh, axis="tp", sweeps=8
        )
        res_hard = distributed_eigh(_spd(n, seed=3), mesh, axis="tp",
                                    sweeps=8)
        assert bool(res_easy.converged)
        assert int(res_easy.sweeps_used) <= 2
        assert int(res_easy.sweeps_used) < int(res_hard.sweeps_used)

    def test_alpha_beta_time_model(self):
        """α-β projections: positive, monotone in payload, and the
        strong-scaling table rows carry more rounds at larger D."""
        m_small = comm.model_eigh_per_sweep(64, 4, 8)
        m_large = comm.model_eigh_per_sweep(256, 4, 32)
        t_small = comm.time_alpha_beta(m_small, 4)
        t_large = comm.time_alpha_beta(m_large, 4)
        assert 0 < t_small < t_large
        assert comm.time_alpha_beta(m_small, 1) == 0.0
        rows = comm.projected_eigh_scaling(1024, Ds=(8, 16, 64))
        assert [r[0] for r in rows] == [8, 16, 64]
        assert [r[1] for r in rows] == [15, 31, 127]
        assert all(r[2] > r[3] > 0 for r in rows)

    def test_alpha_beta_sensitivity_band(self):
        """The ×{0.5,1,2} band brackets the nominal projection, the
        worst case is ≤ 4× the best (α and β each span 4×), and the
        banded strong-scaling table matches the point table at its
        nominal column."""
        m = comm.model_eigh_adaptive(1024, 8, 64, 4)
        lo, mid, hi = comm.time_alpha_beta_band(m, 8)
        assert 0 < lo < mid < hi
        assert hi <= 4 * lo * 1.0000001
        assert mid == comm.time_alpha_beta(m, 8)
        band_rows = comm.projected_eigh_scaling_band(1024, Ds=(8, 16))
        point_rows = comm.projected_eigh_scaling(1024, Ds=(8, 16))
        for br, pr in zip(band_rows, point_rows):
            assert br[0] == pr[0] and br[1] == pr[1]
            assert br[2][1] == pytest.approx(pr[2])
            assert br[2][0] < br[2][1] < br[2][2]

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
