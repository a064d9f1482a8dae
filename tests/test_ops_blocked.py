"""Blocked batched LU: differential tests against the loop path / numpy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops.lu_blocked import (
    blocked_det_batched,
    blocked_lu_batched,
    blocked_solve_batched,
    invert_unit_lower,
    invert_upper,
)


def make_batch(B, N, seed=0, shift=None):
    rng = np.random.RandomState(seed)
    shift = shift if shift is not None else 3.0 * np.sqrt(N)
    return (
        rng.randn(B, N, N).astype(np.float32)
        + shift * np.eye(N, dtype=np.float32)
    )


class TestTriangularInverse:
    def test_unit_lower(self):
        rng = np.random.RandomState(1)
        L = np.tril(rng.randn(3, 8, 8).astype(np.float32), -1) + np.eye(
            8, dtype=np.float32
        )
        Li = np.asarray(invert_unit_lower(jnp.asarray(L)))
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", L, Li),
            np.broadcast_to(np.eye(8), (3, 8, 8)),
            atol=1e-4,
        )

    def test_upper(self):
        rng = np.random.RandomState(2)
        U = np.triu(rng.randn(3, 8, 8).astype(np.float32)) + 3 * np.eye(
            8, dtype=np.float32
        )
        Ui = np.asarray(invert_upper(jnp.asarray(U)))
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", U, Ui),
            np.broadcast_to(np.eye(8), (3, 8, 8)),
            atol=1e-4,
        )


class TestBlockedLU:
    @pytest.mark.parametrize("nb", [4, 8])
    def test_factorization(self, nb):
        A = make_batch(4, 8, seed=3)
        res = blocked_lu_batched(jnp.asarray(A), nb=nb)
        lu = np.asarray(res.lu)
        perm = np.asarray(res.perm)
        assert bool(np.asarray(res.ok).all())
        for i in range(4):
            L = np.tril(lu[i], -1) + np.eye(8)
            U = np.triu(lu[i])
            np.testing.assert_allclose(L @ U, A[i][perm[i]], atol=1e-4)
            # perm must be a permutation of 0..N-1
            assert sorted(perm[i]) == list(range(8))

    def test_pivoting_actually_happens(self):
        # Zero diagonal forces swaps.
        A = np.array(
            [[[0.0, 2.0], [1.0, 0.0]], [[0.0, 1.0], [3.0, 0.0]]],
            dtype=np.float32,
        )
        res = blocked_lu_batched(jnp.asarray(A), nb=2)
        assert bool(np.asarray(res.ok).all())
        assert list(np.asarray(res.perm[0])) == [1, 0]
        np.testing.assert_allclose(np.asarray(res.sign), [-1.0, -1.0])

    def test_matches_loop_path(self):
        from linalg_solver_tpu.ops.lu import det_lu_batched

        A = make_batch(3, 16, seed=4)
        d_blocked = np.asarray(blocked_det_batched(jnp.asarray(A)))
        d_loop = np.asarray(det_lu_batched(jnp.asarray(A)))
        np.testing.assert_allclose(d_blocked, d_loop, rtol=1e-3)

    def test_solve(self):
        A = make_batch(4, 16, seed=5)
        rng = np.random.RandomState(6)
        b = rng.randn(4, 16).astype(np.float32)
        x = np.asarray(
            blocked_solve_batched(jnp.asarray(A), jnp.asarray(b), nb=8)
        )
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", A, x), b, atol=1e-3
        )

    def test_solve_block_rhs(self):
        A = make_batch(2, 8, seed=7)
        rng = np.random.RandomState(8)
        Bm = rng.randn(2, 8, 3).astype(np.float32)
        X = np.asarray(
            blocked_solve_batched(jnp.asarray(A), jnp.asarray(Bm), nb=4)
        )
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", A, X), Bm, atol=1e-3
        )

    def test_det_vs_numpy(self):
        A = make_batch(4, 8, seed=9)
        d = np.asarray(blocked_det_batched(jnp.asarray(A)))
        expected = np.linalg.det(A.astype(np.float64))
        np.testing.assert_allclose(d, expected, rtol=1e-3)

    def test_singular_flagged(self):
        A = make_batch(2, 8, seed=10)
        A[1, :, 0] = 0.0
        A[1, 0, :] = 0.0  # force structural singularity in element 1
        res = blocked_lu_batched(jnp.asarray(A), nb=4)
        ok = np.asarray(res.ok)
        assert bool(ok[0]) and not bool(ok[1])

    @pytest.mark.parametrize("backend", ["inplace", "pallas"])
    def test_inplace_panel_backends_match_swap_path(self, backend):
        """No-swap pivoting must produce the same packed L\\U, perm, sign
        and determinant as the swap-based panel (same pivot choices)."""
        A = make_batch(5, 16, seed=12, shift=2.0)
        kw = {"interpret": True} if backend == "pallas" else {}
        res = blocked_lu_batched(
            jnp.asarray(A), nb=4, panel_backend=backend, **kw
        )
        ref = blocked_lu_batched(jnp.asarray(A), nb=4, panel_backend="xla")
        assert bool(np.asarray(res.ok).all())
        np.testing.assert_array_equal(
            np.asarray(res.perm), np.asarray(ref.perm)
        )
        np.testing.assert_allclose(
            np.asarray(res.sign), np.asarray(ref.sign)
        )
        np.testing.assert_allclose(
            np.asarray(res.lu), np.asarray(ref.lu), atol=1e-5
        )
        lu = np.asarray(res.lu)
        perm = np.asarray(res.perm)
        for i in range(5):
            L = np.tril(lu[i], -1) + np.eye(16)
            U = np.triu(lu[i])
            np.testing.assert_allclose(
                L @ U, A[i][perm[i]], atol=1e-4
            )

    @pytest.mark.parametrize("krhs", [None, 3])
    def test_fused_pallas_solve_matches_assembled(self, krhs):
        """The assembly-free fused solve must agree with factor+solve on
        the packed L\\U (same pivots, same block algebra)."""
        from linalg_solver_tpu.ops.lu_blocked import (
            blocked_lu_solve,
            pallas_solve_batched,
        )

        A = make_batch(5, 16, seed=14, shift=2.0)
        rng = np.random.RandomState(15)
        bshape = (5, 16) if krhs is None else (5, 16, krhs)
        b = rng.randn(*bshape).astype(np.float32)
        x_fused = np.asarray(
            pallas_solve_batched(
                jnp.asarray(A), jnp.asarray(b), nb=4, interpret=True
            )
        )
        res = blocked_lu_batched(
            jnp.asarray(A), nb=4, panel_backend="pallas", interpret=True
        )
        x_ref = np.asarray(blocked_lu_solve(res, jnp.asarray(b)))
        np.testing.assert_allclose(x_fused, x_ref, atol=1e-5)
        if krhs is None:
            resid = np.einsum("bij,bj->bi", A, x_fused) - b
        else:
            resid = np.einsum("bij,bjk->bik", A, x_fused) - b
        assert np.abs(resid).max() < 1e-3

    def test_fused_pallas_det_matches_numpy(self):
        from linalg_solver_tpu.ops.lu_blocked import pallas_det_batched

        A = make_batch(4, 16, seed=16, shift=2.0)
        d = np.asarray(
            pallas_det_batched(jnp.asarray(A), nb=4, interpret=True)
        )
        expected = np.linalg.det(A.astype(np.float64))
        np.testing.assert_allclose(d, expected, rtol=1e-3)

    def test_fused_pallas_det_singular_is_zero(self):
        from linalg_solver_tpu.ops.lu_blocked import pallas_det_batched

        A = make_batch(2, 8, seed=17)
        A[1, :, 0] = 0.0
        A[1, 0, :] = 0.0
        d = np.asarray(
            pallas_det_batched(jnp.asarray(A), nb=4, interpret=True)
        )
        assert d[0] != 0.0 and d[1] == 0.0

    def test_inplace_singular_flagged(self):
        A = make_batch(2, 8, seed=13)
        A[1, :, 0] = 0.0
        A[1, 0, :] = 0.0
        res = blocked_lu_batched(jnp.asarray(A), nb=4,
                                 panel_backend="inplace")
        ok = np.asarray(res.ok)
        assert bool(ok[0]) and not bool(ok[1])

    def test_dispatch_auto_uses_blocked(self):
        from linalg_solver_tpu.ops import dispatch

        assert dispatch._resolve("auto", "solve", 256) in (
            "blocked", "pallas",
        )
        # Odd sizes fall back to the loop path.
        assert dispatch._resolve("auto", "solve", 7) == "loop"


class TestBlockedInverse:
    def test_inverse(self):
        A = make_batch(4, 16, seed=11)
        from linalg_solver_tpu.ops.lu_blocked import blocked_inverse_batched

        inv = np.asarray(blocked_inverse_batched(jnp.asarray(A), nb=8))
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", A, inv),
            np.broadcast_to(np.eye(16), (4, 16, 16)),
            atol=1e-3,
        )

    def test_dispatch_large_n_uses_blocked(self):
        from linalg_solver_tpu.ops import dispatch

        assert dispatch._resolve("auto", "inverse", 256) in (
            "blocked", "pallas",
        )



class TestMixedPrecisionSolve:
    """``pallas_solve_mixed_batched`` — bf16-factored, iteratively
    refined solve (the dsgesv/HPL-AI recipe).  On CPU the precision
    strings are no-ops, so these tests pin the *algebra*: the
    post-hoc ``_phases_solve`` substitution against the unassembled
    phase artifacts must reproduce the factorization's solve, and
    refinement must leave a correct solution fixed.  The precision
    win itself is measured on-chip (bench)."""

    @pytest.mark.parametrize("krhs", [None, 3])
    def test_refined_solve_is_accurate(self, krhs):
        from linalg_solver_tpu.ops.lu_blocked import (
            pallas_solve_mixed_batched,
        )

        A = make_batch(4, 16, seed=21, shift=2.0)
        rng = np.random.RandomState(22)
        bshape = (4, 16) if krhs is None else (4, 16, krhs)
        b = rng.randn(*bshape).astype(np.float32)
        x = np.asarray(
            pallas_solve_mixed_batched(
                jnp.asarray(A), jnp.asarray(b), nb=4, ir_steps=2,
                interpret=True,
            )
        )
        assert x.shape == b.shape
        if krhs is None:
            resid = np.einsum("bij,bj->bi", A, x) - b
        else:
            resid = np.einsum("bij,bjk->bik", A, x) - b
        rel = np.abs(resid).max() / np.abs(b).max()
        assert rel < 1e-5, rel

    def test_zero_refinement_matches_direct_fused_solve(self):
        """ir_steps=0 is exactly the fused factor+solve algebra —
        the mixed path's iteration-0 substitution must agree with
        ``pallas_solve_batched`` (identical pivots and block order;
        CPU runs both at full precision)."""
        from linalg_solver_tpu.ops.lu_blocked import (
            pallas_solve_batched,
            pallas_solve_mixed_batched,
        )

        A = make_batch(3, 16, seed=23, shift=2.0)
        rng = np.random.RandomState(24)
        b = rng.randn(3, 16, 2).astype(np.float32)
        x0 = np.asarray(
            pallas_solve_mixed_batched(
                jnp.asarray(A), jnp.asarray(b), nb=4, ir_steps=0,
                interpret=True,
            )
        )
        xd = np.asarray(
            pallas_solve_batched(
                jnp.asarray(A), jnp.asarray(b), nb=4, interpret=True
            )
        )
        np.testing.assert_allclose(x0, xd, atol=1e-5)

    def test_refinement_against_fresh_rhs_phases_solve(self):
        """``_phases_solve`` (the refinement's correction solve) must
        solve A·x = r for a FRESH right-hand side — i.e. re-applying
        the stored factorization without refactoring."""
        from linalg_solver_tpu.ops.lu_blocked import (
            pallas_solve_mixed_batched,
        )

        # An extra refinement step on an already-converged solution
        # must not perturb it beyond roundoff.
        A = make_batch(3, 16, seed=25, shift=2.0)
        rng = np.random.RandomState(26)
        b = rng.randn(3, 16, 2).astype(np.float32)
        x1 = np.asarray(
            pallas_solve_mixed_batched(
                jnp.asarray(A), jnp.asarray(b), nb=4, ir_steps=1,
                interpret=True,
            )
        )
        x3 = np.asarray(
            pallas_solve_mixed_batched(
                jnp.asarray(A), jnp.asarray(b), nb=4, ir_steps=3,
                interpret=True,
            )
        )
        np.testing.assert_allclose(x1, x3, atol=1e-5)

    def test_dispatch_mixed_backend_routes(self, monkeypatch):
        """backend="mixed" must reach the iteratively-refined solve
        (also what auto picks for 8 <= N < 256 on TPU — see
        tests/test_dispatch_routing.py)."""
        from linalg_solver_tpu.ops import dispatch

        called = {}

        def fake(a, b, nb):
            called["nb"] = nb
            return b

        monkeypatch.setattr(
            dispatch._lub, "pallas_solve_mixed_batched", fake
        )
        A = jnp.zeros((1, 64, 64), jnp.float32)
        b = jnp.zeros((1, 64), jnp.float32)
        out = dispatch.solve_batched(A, b, backend="mixed")
        assert called["nb"] == 64 and out is b
        assert dispatch._resolve("auto", "solve", 64) != "mixed"


class TestBlockedSolveStability:
    """Regression: the block substitution's explicit diagonal-block
    inverse-applications leave a kappa(U11)*eps residual term (measured
    1.7e-2 absolute at kappa~1e3, 64x64, vs 2.6e-5 for the loop LU).
    The XLA path now uses true triangular solves + one refinement
    round; residuals must sit at the substitution-stable level."""

    def test_moderate_kappa_backward_stable(self):
        from linalg_solver_tpu.ops.lu_blocked import (
            blocked_solve_batched,
        )

        rng = np.random.RandomState(5)
        G = rng.randn(2, 64, 64).astype(np.float32)  # kappa ~ 1e3
        b = rng.randn(2, 64).astype(np.float32)
        for nb in (64, 32, 16):
            x = np.asarray(
                blocked_solve_batched(
                    jnp.asarray(G), jnp.asarray(b)[:, :, None], nb=nb
                ),
                np.float64,
            )[:, :, 0]
            r = np.abs(
                np.einsum("bij,bj->bi", G.astype(np.float64), x) - b
            ).max()
            scale = np.abs(G).max() * np.abs(x).max()
            assert r < 64 * 1.2e-7 * scale * 4, (nb, r)
