"""Blocked large-N rank-revealing Gauss–Jordan: differential tests vs
the loop path (structural equality by RREF uniqueness) and a numpy
oracle, plus the accuracy regression for the pivot-row normalization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops.rref_blocked import (
    rank_blocked_batched,
    solve_affine_blocked_batched,
)
from linalg_solver_tpu.ops.solve import rank_batched, solve_batched


def make_case(rng, B, m, n, r):
    A = (rng.randn(B, m, r) @ rng.randn(B, r, n)).astype(np.float32)
    b = np.einsum("bij,bj->bi", A, rng.randn(B, n)).astype(np.float32)
    half = B // 2
    b[half:] = rng.randn(B - half, m).astype(np.float32)
    return A, b


class TestBlockedRREF:
    @pytest.mark.parametrize(
        "m,n,r,nb",
        [(24, 24, 24, 8), (24, 24, 10, 8), (20, 30, 12, 16),
         (30, 20, 9, 8), (33, 33, 33, 16)],
    )
    def test_matches_loop_path(self, m, n, r, nb):
        rng = np.random.RandomState(m * 100 + n)
        A, b = make_case(rng, 6, m, n, r)
        sub_b = solve_affine_blocked_batched(
            jnp.asarray(A), jnp.asarray(b), nb=nb
        )
        sub_l = solve_batched(
            jnp.asarray(A), jnp.asarray(b), pivot_rule="partial"
        )
        np.testing.assert_array_equal(
            np.asarray(sub_b.dim), np.asarray(sub_l.dim)
        )
        np.testing.assert_array_equal(
            np.asarray(sub_b.is_consistent),
            np.asarray(sub_l.is_consistent),
        )
        np.testing.assert_array_equal(
            np.asarray(sub_b.gen_mask), np.asarray(sub_l.gen_mask)
        )
        np.testing.assert_array_equal(
            np.asarray(rank_blocked_batched(jnp.asarray(A), nb=nb)),
            np.asarray(rank_batched(jnp.asarray(A))),
        )
        for i in range(6):
            if not bool(sub_b.is_consistent[i]):
                continue
            x = np.asarray(sub_b.particular[i], np.float64)
            resid = np.abs(
                A[i].astype(np.float64) @ x - b[i]
            ).max()
            assert resid < 2e-3 * max(1, np.abs(b[i]).max()), (i, resid)
            gm = np.asarray(sub_b.gen_mask[i])
            if gm.any():
                G = np.asarray(sub_b.generators[i], np.float64)
                AG = A[i].astype(np.float64) @ G[:, gm]
                assert np.abs(AG).max() < 2e-3, (i, np.abs(AG).max())

    def test_accuracy_kappa_independent(self):
        """Regression: the trailing update must replay the panel's own
        multipliers (unit-triangular solve) and reconstruct pivot rows
        as clean products.  An explicit pivot-block inverse costs
        ~eps·κ(A) (1e-1 residuals at κ=1e4); the fused (1−1/piv) form
        costs a flat ~25×."""
        rng = np.random.RandomState(7)
        A = (rng.randn(6, 33, 33) @ rng.randn(6, 33, 33)).astype(
            np.float32
        )
        b = np.einsum(
            "bij,bj->bi", A, rng.randn(6, 33)
        ).astype(np.float32)
        sub = solve_affine_blocked_batched(
            jnp.asarray(A), jnp.asarray(b), nb=16
        )
        for i in range(6):
            x = np.asarray(sub.particular[i], np.float64)
            resid = np.abs(A[i].astype(np.float64) @ x - b[i]).max()
            # κ reaches ~1e4 here; the stable form stays at a few e-4.
            assert resid < 1e-3, (i, resid)

    def test_dispatch_routes_large_n(self):
        from linalg_solver_tpu.ops import dispatch

        rng = np.random.RandomState(3)
        n, r = 288, 200
        A = (rng.randn(2, n, r) @ rng.randn(2, r, n)).astype(np.float32)
        b = np.einsum("bij,bj->bi", A, rng.randn(2, n)).astype(
            np.float32
        )
        sub = dispatch.affine_solve_batched(
            jnp.asarray(A), jnp.asarray(b)
        )
        assert bool(np.asarray(sub.is_consistent).all())
        # Constructed rank r (numpy's default matrix_rank tolerance is
        # f64-scale and counts the f32 formation noise as full rank).
        np.testing.assert_array_equal(np.asarray(sub.dim), n - r)
        rk = dispatch.rank_batched(jnp.asarray(A))
        np.testing.assert_array_equal(np.asarray(rk), r)


class TestLargeNSpectral:
    def test_spectral_decompose_blocked_route(self):
        """n ≥ 256 off-TPU routes the eigenspace nullspaces through the
        blocked RREF; the decomposition must survive intact."""
        from linalg_solver_tpu.ops.eigen import spectral_decompose_batched

        rng = np.random.RandomState(1)
        B, n = 2, 288
        vals = np.concatenate(
            [np.full(144, 2.0), np.full(144, 5.0)]
        ).astype(np.float32)
        Q, _ = np.linalg.qr(rng.randn(B, n, n))
        A = ((Q * vals[None, None, :]) @ np.swapaxes(Q, 1, 2)).astype(
            np.float32
        )
        res = spectral_decompose_batched(
            jnp.asarray(A), jnp.asarray(np.tile(vals, (B, 1))),
            jnp.zeros((B, n), jnp.float32), tol=1e-2, max_distinct=2,
        )
        assert np.asarray(res.success).all()
        rec = (
            np.asarray(res.P, np.float64)
            @ np.asarray(res.D, np.float64)
            @ np.asarray(res.P_inv, np.float64)
        )
        assert np.abs(rec - A).max() / np.abs(A).max() < 1e-3


@pytest.mark.slow
class TestBlockedRREFFuzz:
    """Randomized property sweep: random shapes, ranks, panel widths and
    per-matrix tolerances vs the loop oracle (RREF uniqueness makes the
    structural outputs comparable exactly)."""

    def test_random_sweep(self):
        rng = np.random.RandomState(99)
        for trial in range(8):
            m = int(rng.randint(8, 40))
            n = int(rng.randint(8, 40))
            r = int(rng.randint(1, min(m, n) + 1))
            nb = int(rng.choice([4, 8, 16, 32]))
            B = 4
            A = (
                rng.randn(B, m, r) @ rng.randn(B, r, n)
            ).astype(np.float32)
            # mix of exactly-zero rows/columns to stress skipping
            if trial % 2:
                A[:, rng.randint(m), :] = 0.0
                A[:, :, rng.randint(n)] = 0.0
            b = np.einsum(
                "bij,bj->bi", A, rng.randn(B, n)
            ).astype(np.float32)
            b[B // 2:] = rng.randn(B - B // 2, m).astype(np.float32)
            sub_b = solve_affine_blocked_batched(
                jnp.asarray(A), jnp.asarray(b), nb=nb
            )
            sub_l = solve_batched(
                jnp.asarray(A), jnp.asarray(b), pivot_rule="partial"
            )
            for field in ("dim", "is_consistent", "gen_mask"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(sub_b, field)),
                    np.asarray(getattr(sub_l, field)),
                    err_msg=f"trial {trial} field {field}",
                )
            np.testing.assert_array_equal(
                np.asarray(rank_blocked_batched(jnp.asarray(A), nb=nb)),
                np.asarray(rank_batched(jnp.asarray(A))),
                err_msg=f"trial {trial} rank",
            )
