"""Random-butterfly-preconditioned pivot-free solve (ops/rbt.py +
ops/pallas/lu_nopivot_kernel.py) — interpret mode on CPU; the real-TPU
numbers live in examples/bench_r2_rbt.py / STATUS.md.

No counterpart in the reference (its exact rational elimination needs
no pivot conditioning); this is the TPU-native route around the pivot
dependency chain documented in STATUS.md's ceiling model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops.pallas.lu_nopivot_kernel import (
    panel_factor_nopivot,
)


def make_batch(B, N, seed=0, shift=None):
    rng = np.random.RandomState(seed)
    shift = shift if shift is not None else 4.0 * np.sqrt(N)
    return (
        rng.randn(B, N, N).astype(np.float32)
        + shift * np.eye(N, dtype=np.float32)
    )


def rel_resid(a, x, b):
    a64 = np.asarray(a, np.float64)
    x64 = np.asarray(x, np.float64)
    b64 = np.asarray(b, np.float64)
    num = np.linalg.norm(
        np.einsum("bij,bj->bi", a64, x64) - b64, axis=1
    )
    return num / np.linalg.norm(b64, axis=1)


class TestButterfly:
    def test_trans_matches_materialized_transpose(self):
        # apply(x, trans=True) must equal W^T x for the W defined by
        # apply(e_i, trans=False) columns.
        n = 16
        diags = rbt.rbt_diags(jax.random.PRNGKey(0), n, 2, jnp.float32)
        eye = jnp.eye(n, dtype=jnp.float32)[None]  # [1, n, n]
        W = np.asarray(rbt.butterfly_apply(eye, diags, trans=False))[0]
        rng = np.random.RandomState(1)
        x = rng.randn(1, n, 3).astype(np.float32)
        got = np.asarray(
            rbt.butterfly_apply(jnp.asarray(x), diags, trans=True)
        )
        np.testing.assert_allclose(got[0], W.T @ x[0], rtol=1e-5,
                                   atol=1e-6)

    def test_well_conditioned(self):
        # Parker's exp(U(-1,1)/10) scaling keeps kappa(W) small.
        n = 64
        diags = rbt.rbt_diags(jax.random.PRNGKey(3), n, 2, jnp.float32)
        eye = jnp.eye(n, dtype=jnp.float32)[None]
        W = np.asarray(
            rbt.butterfly_apply(eye, diags, trans=False), np.float64
        )[0]
        assert np.linalg.cond(W) < 2.5


class TestNoPivotPanel:
    def test_reconstruction(self):
        # panel = L_full @ U11 with L unit-lower (rows >= nb hold L21).
        B, M, nb = 4, 24, 8
        rng = np.random.RandomState(0)
        panel = (
            rng.randn(B, M, nb).astype(np.float32)
            + 4.0 * np.eye(M, nb, dtype=np.float32)
        )
        out, ok = panel_factor_nopivot(
            jnp.asarray(panel), nb, interpret=True
        )
        out = np.asarray(out, np.float64)
        assert bool(np.all(np.asarray(ok)))
        L = np.tril(out[:, :nb, :], -1) + np.eye(nb)
        L_full = np.concatenate([L, out[:, nb:, :]], axis=1)
        U11 = np.triu(out[:, :nb, :])
        np.testing.assert_allclose(
            L_full @ U11, panel, rtol=2e-4, atol=2e-4
        )

    def test_zero_pivot_flagged(self):
        B, nb = 2, 8
        panel = np.broadcast_to(
            3.0 * np.eye(nb, dtype=np.float32), (B, nb, nb)
        ).copy()
        panel[1, 0, 0] = 0.0  # pivot(0) = row 0 is exactly zero
        panel[1, 1, 0] = 1.0  # a pivoted factorization would be fine
        _, ok = panel_factor_nopivot(
            jnp.asarray(panel), nb, interpret=True
        )
        assert bool(ok[0]) and not bool(ok[1])


class TestRBTSolve:
    def test_solve_vector_rhs(self):
        B, N = 4, 64
        a = jnp.asarray(make_batch(B, N, seed=0))
        b = jnp.asarray(
            np.random.RandomState(1).randn(B, N).astype(np.float32)
        )
        x = rbt.pallas_solve_rbt_batched(a, b, nb=32, interpret=True)
        assert rel_resid(a, x, b).max() < 1e-5

    def test_solve_matrix_rhs_matches_vector(self):
        B, N, K = 3, 32, 4
        a = jnp.asarray(make_batch(B, N, seed=2))
        bm = jnp.asarray(
            np.random.RandomState(3).randn(B, N, K).astype(np.float32)
        )
        xm = np.asarray(
            rbt.pallas_solve_rbt_batched(a, bm, nb=16, interpret=True)
        )
        for k in range(K):
            xk = np.asarray(rbt.pallas_solve_rbt_batched(
                a, bm[:, :, k], nb=16, interpret=True
            ))
            np.testing.assert_allclose(xm[:, :, k], xk, atol=1e-5)

    def test_pivot_hostile_lane(self):
        # A lane whose leading minors are singular without mixing:
        # plain no-pivot LU fails, RBT (or the rescue) must solve it.
        B, N = 4, 64
        a = make_batch(B, N, seed=4)
        a[0] = 3.0 * np.eye(N, dtype=np.float32)[::-1]
        a[1][:2, :2] = [[0.0, 1.0], [1.0, 0.0]]
        b = np.random.RandomState(5).randn(B, N).astype(np.float32)
        x = rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(b), nb=32, interpret=True
        )
        assert rel_resid(a, x, b).max() < 1e-5

    def test_zero_lane_rescued_others_unharmed(self):
        # An all-zero lane defeats RBT (U^T 0 V = 0, every pivot zero,
        # ok=False) and routes through the pivoted rescue; the healthy
        # lanes must come back accurate and finite.
        B, N = 4, 32
        a = make_batch(B, N, seed=6)
        a[2] = 0.0
        b = np.random.RandomState(7).randn(B, N).astype(np.float32)
        x = np.asarray(rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(b), nb=16, interpret=True
        ))
        good = [0, 1, 3]
        r = rel_resid(a[good], x[good], b[good])
        assert r.max() < 1e-5

    @pytest.mark.parametrize("ir_steps", [0, 1, 2])
    def test_ir_steps_paths(self, ir_steps):
        B, N = 2, 32
        a = jnp.asarray(make_batch(B, N, seed=8))
        b = jnp.asarray(
            np.random.RandomState(9).randn(B, N).astype(np.float32)
        )
        x = rbt.pallas_solve_rbt_batched(
            a, b, nb=16, ir_steps=ir_steps, interpret=True
        )
        tol = 1e-3 if ir_steps == 0 else 1e-5
        assert rel_resid(a, x, b).max() < tol

    def test_no_fallback_path(self):
        B, N = 2, 32
        a = jnp.asarray(make_batch(B, N, seed=10))
        b = jnp.asarray(
            np.random.RandomState(11).randn(B, N).astype(np.float32)
        )
        x = rbt.pallas_solve_rbt_batched(
            a, b, nb=16, fallback=False, interpret=True
        )
        assert rel_resid(a, x, b).max() < 1e-5

    def test_inverse(self):
        B, N = 4, 64
        a = make_batch(B, N, seed=20)
        a[0] = 3.0 * np.eye(N, dtype=np.float32)[::-1]  # pivot-hostile
        x = np.asarray(rbt.pallas_inverse_rbt_batched(
            jnp.asarray(a), nb=32, interpret=True
        ), np.float64)
        a64 = np.asarray(a, np.float64)
        err = max(
            np.max(np.abs(a64[i] @ x[i] - np.eye(N))) for i in range(B)
        )
        assert err < 1e-4

    def test_inverse_zero_lane_rescued(self):
        B, N = 4, 32
        a = make_batch(B, N, seed=21)
        a[2] = 0.0  # defeats RBT; rescue keeps other lanes intact
        x = np.asarray(rbt.pallas_inverse_rbt_batched(
            jnp.asarray(a), nb=16, interpret=True
        ), np.float64)
        a64 = np.asarray(a, np.float64)
        err = max(
            np.max(np.abs(a64[i] @ x[i] - np.eye(N)))
            for i in (0, 1, 3)
        )
        assert err < 1e-4

    @pytest.mark.parametrize("ns_steps", [0, 1])
    def test_inverse_ns_steps(self, ns_steps):
        B, N = 2, 32
        a = jnp.asarray(make_batch(B, N, seed=22))
        x = np.asarray(rbt.pallas_inverse_rbt_batched(
            a, nb=16, ns_steps=ns_steps, interpret=True
        ), np.float64)
        a64 = np.asarray(a, np.float64)
        err = max(
            np.max(np.abs(a64[i] @ x[i] - np.eye(N))) for i in range(B)
        )
        assert err < (1e-3 if ns_steps == 0 else 1e-4)

    def test_inverse_multiphase(self):
        B, N = 2, 64
        a = jnp.asarray(make_batch(B, N, seed=23))
        x = np.asarray(rbt.pallas_inverse_rbt_batched(
            a, nb=32, interpret=True
        ), np.float64)
        a64 = np.asarray(a, np.float64)
        err = max(
            np.max(np.abs(a64[i] @ x[i] - np.eye(N))) for i in range(B)
        )
        assert err < 1e-4

    def test_pivoted_fallback_mode(self):
        # fallback="pivoted" (direct pivoted-branch rescue) must agree
        # with the default nested re-draw structure on hostile lanes.
        B, N = 4, 32
        a = make_batch(B, N, seed=30)
        a[1] = 0.0
        a[3] = 2.0 * np.eye(N, dtype=np.float32)[::-1]
        b = np.random.RandomState(31).randn(B, N).astype(np.float32)
        for fb in ("redraw", "pivoted"):
            x = np.asarray(rbt.pallas_solve_rbt_batched(
                jnp.asarray(a), jnp.asarray(b), nb=16, fallback=fb,
                interpret=True,
            ))
            good = [0, 2, 3]
            assert rel_resid(a[good], x[good], b[good]).max() < 1e-5

    def test_dispatch_backend_rbt(self):
        # Explicit backend="rbt" routes solve/inverse through the RBT
        # path (interpret mode is selected automatically off-TPU).
        from linalg_solver_tpu.ops import dispatch

        B, N = 3, 64
        a = make_batch(B, N, seed=32)
        b = np.random.RandomState(33).randn(B, N).astype(np.float32)
        x = np.asarray(dispatch.solve_batched(
            jnp.asarray(a), jnp.asarray(b), backend="rbt"
        ))
        assert rel_resid(a, x, b).max() < 1e-5
        xi = np.asarray(dispatch.inverse_batched(
            jnp.asarray(a), backend="rbt"
        ), np.float64)
        a64 = np.asarray(a, np.float64)
        err = max(
            np.max(np.abs(a64[i] @ xi[i] - np.eye(N)))
            for i in range(B)
        )
        assert err < 1e-4

    def test_non_power_of_two_n(self):
        # N = 96: butterfly depth shrinks until segments stay even.
        B, N = 2, 96
        a = jnp.asarray(make_batch(B, N, seed=12))
        b = jnp.asarray(
            np.random.RandomState(13).randn(B, N).astype(np.float32)
        )
        x = rbt.pallas_solve_rbt_batched(a, b, nb=32, interpret=True)
        assert rel_resid(a, x, b).max() < 1e-5
