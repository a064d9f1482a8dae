"""Large-N mixed blocked solve (XLA panels + bf16 updates + IR)."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops.lu_large import (
    large_lu_factor,
    large_lu_solve,
    large_solve_mixed,
)


def wellcond(B, N, seed=0, shift=4.0):
    rng = np.random.RandomState(seed)
    return (
        rng.randn(B, N, N) + shift * np.sqrt(N) * np.eye(N)
    ).astype(np.float32)


def rel_res(A, x, b):
    r = np.einsum("bij,bj->bi", A.astype(np.float64),
                  np.asarray(x, np.float64)) - b
    return float(np.linalg.norm(r) / np.linalg.norm(b))


class TestLargeSolveMixed:
    def test_refined_reaches_f32_floor(self):
        B, N = 3, 256
        A = wellcond(B, N, seed=1)
        b = np.random.RandomState(2).randn(B, N).astype(np.float32)
        x = large_solve_mixed(jnp.asarray(A), jnp.asarray(b), nb=64)
        assert rel_res(A, x, b) < 3e-7

    def test_unrefined_is_bf16_level(self):
        """ir_steps=0 documents WHY refinement is non-optional."""
        B, N = 2, 128
        A = wellcond(B, N, seed=3)
        b = np.random.RandomState(4).randn(B, N).astype(np.float32)
        x0 = large_solve_mixed(
            jnp.asarray(A), jnp.asarray(b), nb=64, ir_steps=0
        )
        x1 = large_solve_mixed(
            jnp.asarray(A), jnp.asarray(b), nb=64, ir_steps=1
        )
        assert rel_res(A, x1, b) < 3e-7
        assert rel_res(A, x0, b) > 10 * rel_res(A, x1, b)

    def test_moderate_condition_number(self):
        """κ ~ 1e3: refinement contracts at ρ ≈ κ·eps_bf16 ≈ 0.2 per
        step (measured 0.076 → 0.014 → … per step) — more steps, not
        more precision, is the lever.  κ ≫ 1/eps_bf16 needs the f32
        paths instead; that is the documented domain boundary."""
        rng = np.random.RandomState(5)
        N = 128
        U, _ = np.linalg.qr(rng.randn(N, N))
        V, _ = np.linalg.qr(rng.randn(N, N))
        s = np.logspace(0, 3, N)
        A = ((U * s) @ V.T).astype(np.float32)[None]
        b = rng.randn(1, N).astype(np.float32)
        x = large_solve_mixed(
            jnp.asarray(A), jnp.asarray(b), nb=64, ir_steps=8
        )
        assert rel_res(A, x, b) < 1e-5

    def test_pivoting_needed(self):
        """Rows of a well-conditioned matrix REVERSED: every panel must
        pivot hard (identity-perm shortcuts would solve the wrong
        system), while κ stays that of the original matrix."""
        N = 64
        A = wellcond(1, N, seed=6)[:, ::-1, :].copy()
        b = np.random.RandomState(7).randn(1, N).astype(np.float32)
        x = large_solve_mixed(jnp.asarray(A), jnp.asarray(b), nb=32)
        assert rel_res(A, x, b) < 1e-6

    def test_pivoting_nondominant(self):
        """Orthogonal + noise (κ ~ 10, nontrivial pivot pattern):
        bf16-updated factors + one IR step reach the f32 floor."""
        rng = np.random.RandomState(13)
        N = 96
        Q, _ = np.linalg.qr(rng.randn(N, N))
        A = (5.0 * Q + 0.1 * rng.randn(N, N)).astype(np.float32)[None]
        b = rng.randn(1, N).astype(np.float32)
        x = large_solve_mixed(
            jnp.asarray(A), jnp.asarray(b), nb=32, ir_steps=2
        )
        assert rel_res(A, x, b) < 1e-6

    def test_factor_solve_reuse(self):
        """One factorization, several right sides."""
        B, N = 2, 128
        A = wellcond(B, N, seed=8)
        fac = large_lu_factor(jnp.asarray(A), nb=64)
        for seed in (9, 10):
            b = np.random.RandomState(seed).randn(B, N).astype(np.float32)
            x = large_lu_solve(fac, jnp.asarray(b))
            # unrefined solve: bf16-factor accuracy
            assert rel_res(A, x, b) < 1e-3

    def test_dispatch_mixed_routes_large(self):
        """backend='mixed' at N >= 1024 goes through the large-N path
        (and solves correctly end to end)."""
        from linalg_solver_tpu.ops import dispatch

        N = 1024
        A = wellcond(1, N, seed=14)
        b = np.random.RandomState(15).randn(1, N).astype(np.float32)
        x = dispatch.solve_batched(
            jnp.asarray(A), jnp.asarray(b), backend="mixed"
        )
        assert rel_res(A, x, b) < 3e-7

    def test_matches_numpy_solution(self):
        B, N = 2, 192
        A = wellcond(B, N, seed=11)
        b = np.random.RandomState(12).randn(B, N).astype(np.float32)
        x = np.asarray(
            large_solve_mixed(jnp.asarray(A), jnp.asarray(b), nb=64),
            np.float64,
        )
        want = np.linalg.solve(A.astype(np.float64), b[..., None])[..., 0]
        assert np.abs(x - want).max() / np.abs(want).max() < 1e-5


class TestLargeSolveRBT:
    """RBT block elimination for the large-N regime (round 4): no
    pivoting, no gathers — butterflies + diagonal-block inverses +
    GEMMs, per-lane gated with a pivoted large_solve_mixed rescue."""

    def test_matches_numpy(self):
        from linalg_solver_tpu.ops.lu_large import large_solve_rbt

        rng = np.random.RandomState(0)
        B, N = 4, 128
        a = (rng.randn(B, N, N)
             + 4 * np.sqrt(N) * np.eye(N)).astype(np.float32)
        b = rng.randn(B, N).astype(np.float32)
        x = np.asarray(large_solve_rbt(
            jnp.asarray(a), jnp.asarray(b), nb=32, interpret=True
        ), np.float64)
        r = np.linalg.norm(
            np.einsum("bij,bj->bi", a.astype(np.float64), x) - b,
            axis=1,
        ) / np.linalg.norm(b, axis=1)
        assert r.max() < 1e-5, r

    def test_adversarial_lane_rescued(self):
        from linalg_solver_tpu.ops.lu_large import large_solve_rbt

        rng = np.random.RandomState(1)
        B, N = 4, 128
        a = (rng.randn(B, N, N)
             + 4 * np.sqrt(N) * np.eye(N)).astype(np.float32)
        # lane 1: singular leading 32x32 minor (defeats no-pivot block
        # elimination at nb=32 unless the butterfly/rescue handles it)
        a[1, :32, :32] = 0.0
        b = rng.randn(B, N).astype(np.float32)
        x = np.asarray(large_solve_rbt(
            jnp.asarray(a), jnp.asarray(b), nb=32, interpret=True
        ), np.float64)
        r = np.linalg.norm(
            np.einsum("bij,bj->bi", a.astype(np.float64), x) - b,
            axis=1,
        ) / np.linalg.norm(b, axis=1)
        # the adversarial lane converges through the butterflies + IR
        # with small NORMWISE backward error (the gate's contract);
        # clean lanes stay at the f32 floor
        assert r[1] < 2e-3, r
        assert np.delete(r, 1).max() < 1e-5, r
        nrm = np.linalg.norm(a[1].astype(np.float64)) * np.linalg.norm(
            x[1]
        ) + np.linalg.norm(b[1])
        eta = np.linalg.norm(
            np.einsum("ij,j->i", a[1].astype(np.float64), x[1]) - b[1]
        ) / nrm
        assert eta < 1e-5, eta

    def test_fallback_false_flags_not_required(self):
        from linalg_solver_tpu.ops.lu_large import large_solve_rbt

        rng = np.random.RandomState(2)
        B, N = 2, 64
        a = (rng.randn(B, N, N)
             + 4 * np.sqrt(N) * np.eye(N)).astype(np.float32)
        b = rng.randn(B, N).astype(np.float32)
        x = np.asarray(large_solve_rbt(
            jnp.asarray(a), jnp.asarray(b), nb=16, fallback=False,
            interpret=True,
        ), np.float64)
        r = np.linalg.norm(
            np.einsum("bij,bj->bi", a.astype(np.float64), x) - b,
            axis=1,
        ) / np.linalg.norm(b, axis=1)
        assert r.max() < 1e-5, r
