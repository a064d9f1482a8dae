"""Pallas kernel tests — interpret mode on CPU (the real-TPU path is
exercised by bench.py / the driver)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops.pallas import gj_kernel


def make_batch(B, N, seed=0, shift=None):
    rng = np.random.RandomState(seed)
    shift = shift if shift is not None else 3.0 * np.sqrt(N)
    return (
        rng.randn(B, N, N).astype(np.float32)
        + shift * np.eye(N, dtype=np.float32)
    )


class TestGJKernel:
    def test_inverse(self):
        A = make_batch(4, 8, seed=0)
        inv = np.asarray(gj_kernel.inverse_batched(
            jnp.asarray(A), interpret=True
        ))
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", A, inv),
            np.broadcast_to(np.eye(8), (4, 8, 8)),
            atol=1e-4,
        )

    def test_solve(self):
        A = make_batch(4, 8, seed=1)
        rng = np.random.RandomState(2)
        b = rng.randn(4, 8).astype(np.float32)
        x = np.asarray(gj_kernel.solve_batched(
            jnp.asarray(A), jnp.asarray(b), interpret=True
        ))
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", A, x), b, atol=1e-3
        )

    def test_det(self):
        A = make_batch(4, 8, seed=3)
        d = np.asarray(gj_kernel.det_batched(jnp.asarray(A), interpret=True))
        expected = np.linalg.det(A.astype(np.float64))
        np.testing.assert_allclose(d, expected, rtol=1e-3)

    def test_det_with_pivot_swaps(self):
        # Antidiagonal forces a non-identity pivot order; sign must follow.
        A = np.zeros((2, 4, 4), np.float32)
        for i in range(4):
            A[:, i, 3 - i] = float(i + 1)
        d = np.asarray(gj_kernel.det_batched(jnp.asarray(A), interpret=True))
        expected = np.linalg.det(A.astype(np.float64))
        np.testing.assert_allclose(d, expected, rtol=1e-5)

    def test_rank_full_and_deficient(self):
        rng = np.random.RandomState(4)
        full = make_batch(2, 8, seed=5)
        low = np.einsum(
            "bik,bkj->bij",
            rng.randn(2, 8, 3).astype(np.float32),
            rng.randn(2, 3, 8).astype(np.float32),
        )
        batch = np.concatenate([full, low])
        ranks = np.asarray(gj_kernel.rank_batched(
            jnp.asarray(batch), interpret=True
        ))
        assert list(ranks) == [8, 8, 3, 3]

    def test_rank_rectangular(self):
        A = np.array([[[1.0, 2.0, 3.0], [2.0, 4.0, 6.0]]], np.float32)
        r = np.asarray(gj_kernel.rank_batched(jnp.asarray(A), interpret=True))
        assert list(r) == [1]

    def test_rank_zero_column_then_pivot(self):
        # Column 0 all-zero but the matrix has rank 1: pivot-skip logic.
        A = np.array([[[0.0, 1.0], [0.0, 0.0]]], np.float32)
        r = np.asarray(gj_kernel.rank_batched(jnp.asarray(A), interpret=True))
        assert list(r) == [1]

    def test_batch_padding(self):
        # Batch not divisible by the lane tile gets padded transparently.
        A = make_batch(3, 4, seed=6)
        inv = np.asarray(gj_kernel.inverse_batched(
            jnp.asarray(A), interpret=True
        ))
        assert inv.shape == (3, 4, 4)
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", A, inv),
            np.broadcast_to(np.eye(4), (3, 4, 4)),
            atol=1e-4,
        )

    def test_supported_bounds(self):
        assert gj_kernel.supported(64, 128)
        assert not gj_kernel.supported(256, 512)

    def test_matches_loop_inverse(self):
        from linalg_solver_tpu.ops.solve import inverse_batched as gj_loop

        A = make_batch(4, 8, seed=7)
        pallas_inv = np.asarray(
            gj_kernel.inverse_batched(jnp.asarray(A), interpret=True)
        )
        loop_inv = np.asarray(gj_loop(jnp.asarray(A), tol=1e-30).inverse)
        np.testing.assert_allclose(pallas_inv, loop_inv, atol=1e-4)


class TestAffineSolveGJ:
    """The GJ-kernel affine solve must reproduce the loop path's affine
    subspaces exactly in structure (RREF is unique for a pivot-column
    set) and closely in values."""

    def _compare(self, A, b, tol=None):
        from linalg_solver_tpu.ops.solve import (
            solve_affine_gj_batched,
            solve_batched,
        )

        got = solve_affine_gj_batched(
            jnp.asarray(A), jnp.asarray(b), tol=tol, interpret=True
        )
        want = solve_batched(
            jnp.asarray(A), jnp.asarray(b), tol=tol, pivot_rule="partial"
        )
        np.testing.assert_array_equal(
            np.asarray(got.is_consistent), np.asarray(want.is_consistent)
        )
        np.testing.assert_array_equal(
            np.asarray(got.dim), np.asarray(want.dim)
        )
        np.testing.assert_array_equal(
            np.asarray(got.gen_mask), np.asarray(want.gen_mask)
        )
        consistent = np.asarray(want.is_consistent)
        np.testing.assert_allclose(
            np.asarray(got.particular)[consistent],
            np.asarray(want.particular)[consistent],
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got.generators), np.asarray(want.generators),
            atol=1e-4,
        )

    def test_square_full_rank(self):
        A = make_batch(4, 8, seed=21)
        b = np.random.RandomState(22).randn(4, 8).astype(np.float32)
        self._compare(A, b, tol=1e-5)

    def test_square_rank_deficient_consistent(self):
        rng = np.random.RandomState(23)
        U = rng.randn(3, 8, 4).astype(np.float32)
        V = rng.randn(3, 4, 8).astype(np.float32)
        A = np.einsum("bik,bkj->bij", U, V)  # rank 4
        x0 = rng.randn(3, 8).astype(np.float32)
        b = np.einsum("bij,bj->bi", A, x0)   # consistent by construction
        self._compare(A, b)

    def test_inconsistent_flagged(self):
        A = np.zeros((2, 4, 4), np.float32)
        A[:, 0, 0] = 1.0
        b = np.zeros((2, 4), np.float32)
        b[1, 1] = 1.0  # zero row, nonzero rhs -> no solution
        self._compare(A, b, tol=1e-6)

    def test_rectangular_wide(self):
        rng = np.random.RandomState(24)
        A = rng.randn(3, 4, 8).astype(np.float32)
        b = rng.randn(3, 4).astype(np.float32)
        self._compare(A, b, tol=1e-5)

    def test_rectangular_tall(self):
        rng = np.random.RandomState(25)
        A = rng.randn(3, 8, 4).astype(np.float32)
        x0 = rng.randn(3, 4).astype(np.float32)
        b = np.einsum("bij,bj->bi", A, x0)
        self._compare(A, b, tol=1e-4)

    def test_solutions_actually_solve(self):
        from linalg_solver_tpu.ops.solve import solve_affine_gj_batched

        rng = np.random.RandomState(26)
        U = rng.randn(2, 8, 5).astype(np.float32)
        V = rng.randn(2, 5, 8).astype(np.float32)
        A = np.einsum("bik,bkj->bij", U, V)
        x0 = rng.randn(2, 8).astype(np.float32)
        b = np.einsum("bij,bj->bi", A, x0)
        sub = solve_affine_gj_batched(
            jnp.asarray(A), jnp.asarray(b), interpret=True
        )
        assert bool(np.asarray(sub.is_consistent).all())
        Ad = A.astype(np.float64)
        part = np.asarray(sub.particular, np.float64)
        resid = np.einsum("bij,bj->bi", Ad, part) - b
        assert np.abs(resid).max() < 1e-2
        gens = np.asarray(sub.generators, np.float64)
        mask = np.asarray(sub.gen_mask)
        img = np.einsum("bij,bjk->bik", Ad, gens)
        assert np.abs(img[:, :, :][mask[:, None, :].repeat(8, 1)]).max() < 1e-2
        assert int(np.asarray(sub.dim)[0]) == 3  # n - rank = 8 - 5


class TestInvRBTFusedKernel:
    """Fused RBT no-pivot inverse kernel (metric-2 hot path): in-kernel
    butterflies + span-restricted no-pivot GJ + gate/rescue."""

    def test_well_conditioned_matches_oracle(self):
        from linalg_solver_tpu.ops.pallas.inv_rbt_kernel import (
            inverse_rbt_fused_batched,
        )

        rng = np.random.RandomState(0)
        n = 64
        A = (rng.randn(8, n, n)
             + 4 * np.sqrt(n) * np.eye(n)).astype(np.float32)
        X = np.asarray(
            inverse_rbt_fused_batched(jnp.asarray(A), interpret=True),
            np.float64,
        )
        err = np.max(np.abs(
            np.einsum("bij,bjk->bik", A.astype(np.float64), X)
            - np.eye(n)
        ))
        assert err < 5e-5, err

    def test_adversarial_lanes_rescued(self):
        from linalg_solver_tpu.ops.pallas.inv_rbt_kernel import (
            inverse_rbt_fused_batched,
        )

        rng = np.random.RandomState(1)
        n = 32
        A = (rng.randn(6, n, n)
             + 4 * np.sqrt(n) * np.eye(n)).astype(np.float32)
        # lane 0: zero leading block (kills no-pivot LU, still regular)
        A[0, :8, :8] = 0.0
        X = np.asarray(
            inverse_rbt_fused_batched(jnp.asarray(A), interpret=True),
            np.float64,
        )
        err = np.max(np.abs(
            np.einsum("bij,bjk->bik", A.astype(np.float64), X)
            - np.eye(n)
        ))
        assert err < 1e-2, err  # pivoted-rescue accuracy class

    def test_singular_lane_does_not_poison_batch(self):
        from linalg_solver_tpu.ops.pallas.inv_rbt_kernel import (
            inverse_rbt_fused_batched,
        )

        rng = np.random.RandomState(2)
        n = 16
        A = (rng.randn(4, n, n)
             + 4 * np.sqrt(n) * np.eye(n)).astype(np.float32)
        A[1] = 0.0
        X = np.asarray(
            inverse_rbt_fused_batched(jnp.asarray(A), interpret=True),
            np.float64,
        )
        keep = [0, 2, 3]
        err = np.max(np.abs(
            np.einsum("bij,bjk->bik", A[keep].astype(np.float64),
                      X[keep]) - np.eye(n)
        ))
        assert err < 5e-5, err

    def test_ns_polish_improves(self):
        from linalg_solver_tpu.ops.pallas.inv_rbt_kernel import (
            inverse_rbt_fused_batched,
        )

        rng = np.random.RandomState(3)
        n = 32
        A = (rng.randn(4, n, n)
             + 3 * np.sqrt(n) * np.eye(n)).astype(np.float32)

        def err_of(ns):
            X = np.asarray(
                inverse_rbt_fused_batched(
                    jnp.asarray(A), ns_steps=ns, interpret=True
                ),
                np.float64,
            )
            return np.max(np.abs(
                np.einsum("bij,bjk->bik", A.astype(np.float64), X)
                - np.eye(n)
            ))

        assert err_of(1) <= err_of(0) * 1.5
        assert err_of(1) < 5e-6


class TestButterflyKernel:
    """Fused two-sided butterfly (ops/pallas/butterfly_kernel.py) vs
    the per-level XLA passes in ops.rbt."""

    @pytest.mark.parametrize("depth", [1, 2])
    @pytest.mark.parametrize("trans", [True, False])
    def test_matches_xla_path(self, depth, trans):
        from linalg_solver_tpu.ops import rbt
        from linalg_solver_tpu.ops.pallas.butterfly_kernel import (
            butterfly_two_sided,
        )

        B, N = 3, 32
        a = jnp.asarray(
            np.random.RandomState(depth).randn(B, N, N)
            .astype(np.float32)
        )
        du = rbt.rbt_diags(jax.random.PRNGKey(7), N, depth,
                           jnp.float32)
        dv = rbt.rbt_diags(jax.random.PRNGKey(9), N, depth,
                           jnp.float32)
        want = rbt.butterfly_apply(a, du, trans=trans)
        want = jnp.swapaxes(
            rbt.butterfly_apply(jnp.swapaxes(want, 1, 2), dv, trans),
            1, 2,
        )
        got = butterfly_two_sided(
            a, tuple(du), tuple(dv), depth=depth,
            trans_rows=trans, trans_cols=trans, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_batch_padding(self):
        # B not a multiple of the kernel's batch tile
        from linalg_solver_tpu.ops import rbt
        from linalg_solver_tpu.ops.pallas.butterfly_kernel import (
            butterfly_two_sided,
        )

        B, N = 5, 16
        a = jnp.asarray(
            np.random.RandomState(0).randn(B, N, N).astype(np.float32)
        )
        du = rbt.rbt_diags(jax.random.PRNGKey(1), N, 2, jnp.float32)
        dv = rbt.rbt_diags(jax.random.PRNGKey(2), N, 2, jnp.float32)
        want = rbt.butterfly_apply(a, du, trans=True)
        want = jnp.swapaxes(
            rbt.butterfly_apply(jnp.swapaxes(want, 1, 2), dv, True),
            1, 2,
        )
        got = butterfly_two_sided(
            a, tuple(du), tuple(dv), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestInvRBTGateModes:
    """probe vs full gate: the probe (two batched GEMVs) must catch the
    same failures the full f32 residual does on structured breakage."""

    @pytest.mark.parametrize("gate_mode", ["probe", "full"])
    def test_adversarial_lane_rescued_by_gate(self, gate_mode):
        from linalg_solver_tpu.ops.pallas.inv_rbt_kernel import (
            inverse_rbt_fused_batched,
        )

        rng = np.random.RandomState(5)
        n = 32
        A = (rng.randn(5, n, n)
             + 4 * np.sqrt(n) * np.eye(n)).astype(np.float32)
        A[2, :8, :8] = 0.0  # regular, but no-pivot LU breaks
        X = np.asarray(
            inverse_rbt_fused_batched(
                jnp.asarray(A), interpret=True, gate_mode=gate_mode
            ),
            np.float64,
        )
        err = np.max(np.abs(
            np.einsum("bij,bjk->bik", A.astype(np.float64), X)
            - np.eye(n)
        ))
        assert err < 1e-2, (gate_mode, err)

    def test_probe_matches_full_on_clean_batch(self):
        from linalg_solver_tpu.ops.pallas.inv_rbt_kernel import (
            inverse_rbt_fused_batched,
        )

        rng = np.random.RandomState(6)
        n = 16
        A = (rng.randn(4, n, n)
             + 4 * np.sqrt(n) * np.eye(n)).astype(np.float32)
        Xp = np.asarray(inverse_rbt_fused_batched(
            jnp.asarray(A), interpret=True, gate_mode="probe"))
        Xf = np.asarray(inverse_rbt_fused_batched(
            jnp.asarray(A), interpret=True, gate_mode="full"))
        # no lane fires either gate: identical untaken-branch results
        np.testing.assert_allclose(Xp, Xf, rtol=1e-6, atol=1e-7)


class TestNoPivotWideLookahead:
    """The production solve default is lookahead=32 (group=32, one
    unrolled window per 32 columns), but interpret mode clamps to 8 —
    so the widened-window scheduling was never differentially tested
    (ADVICE r3).  Force the full window on tiny shapes and check the
    result is IDENTICAL to the clamped schedule (lookahead only changes
    scheduling, never values) and correct vs numpy."""

    pytestmark = pytest.mark.slow

    @pytest.mark.parametrize("la", [16, 32])
    def test_wide_window_matches_clamped(self, la):
        from linalg_solver_tpu.ops.pallas.lu_nopivot_kernel import (
            panel_factor_nopivot,
        )

        nb = la  # group follows lookahead; one window per group
        A = make_batch(3, nb, seed=la)  # square panel, m == nb
        out_wide, ok_wide = panel_factor_nopivot(
            jnp.asarray(A), nb, interpret=True, lookahead=la,
            interpret_full_lookahead=True,
        )
        out_ref, ok_ref = panel_factor_nopivot(
            jnp.asarray(A), nb, interpret=True, lookahead=8,
        )
        np.testing.assert_allclose(
            np.asarray(out_wide), np.asarray(out_ref),
            rtol=2e-5, atol=2e-5,
        )
        assert np.array_equal(np.asarray(ok_wide), np.asarray(ok_ref))
        # and the factorization is a genuine no-pivot LU: L @ U == A
        W = np.asarray(out_wide, np.float64)
        L = np.tril(W, -1) + np.eye(nb)
        U = np.triu(W)
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", L, U), A, rtol=1e-4, atol=1e-4,
        )
