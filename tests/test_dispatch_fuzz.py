"""Randomized sweep over the dispatch surface: solve/inverse/det/rank/
affine_solve across shapes and backends vs numpy (f64) oracles."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops import dispatch


class TestDispatchFuzz:
    def test_square_wellposed_sweep(self):
        rng = np.random.RandomState(17)
        for trial in range(6):
            B = int(rng.randint(2, 9))
            n = int(rng.choice([4, 8, 16, 24, 48, 72]))
            A = (
                rng.randn(B, n, n) + 3 * np.sqrt(n) * np.eye(n)
            ).astype(np.float32)
            b = rng.randn(B, n).astype(np.float32)
            Aj, bj = jnp.asarray(A), jnp.asarray(b)

            x = np.asarray(dispatch.solve_batched(Aj, bj), np.float64)
            resid = np.abs(
                np.einsum("bij,bj->bi", A.astype(np.float64), x) - b
            ).max()
            assert resid < 1e-3 * max(1, np.abs(b).max()), (trial, resid)

            inv = np.asarray(dispatch.inverse_batched(Aj), np.float64)
            ierr = np.abs(
                np.einsum("bij,bjk->bik", A.astype(np.float64), inv)
                - np.eye(n)
            ).max()
            assert ierr < 1e-3, (trial, ierr)

            det = np.asarray(dispatch.det_batched(Aj), np.float64)
            want = np.linalg.det(A.astype(np.float64))
            np.testing.assert_allclose(
                det, want, rtol=1e-3, err_msg=f"trial {trial}"
            )

            rk = np.asarray(dispatch.rank_batched(Aj))
            assert (rk == n).all(), (trial, rk)

    def test_rank_deficient_sweep(self):
        rng = np.random.RandomState(23)
        for trial in range(5):
            B = 4
            m = int(rng.randint(8, 40))
            n = int(rng.randint(8, 40))
            r = int(rng.randint(1, min(m, n)))
            A = (
                rng.randn(B, m, r) @ rng.randn(B, r, n)
            ).astype(np.float32)
            b = np.einsum(
                "bij,bj->bi", A, rng.randn(B, n)
            ).astype(np.float32)
            sub = dispatch.affine_solve_batched(
                jnp.asarray(A), jnp.asarray(b)
            )
            assert bool(np.asarray(sub.is_consistent).all()), trial
            assert (np.asarray(sub.dim) == n - r).all(), (
                trial, np.asarray(sub.dim), n - r,
            )
            rk = np.asarray(dispatch.rank_batched(jnp.asarray(A)))
            assert (rk == r).all(), (trial, rk, r)
