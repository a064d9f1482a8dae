"""The one-launch fused RBT solve kernel (round 4): interpret-mode
differential + gate-semantics tests (the on-chip path is exercised by
bench.py / the driver)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops.pallas.solve_fused_kernel import (
    solve_fused_rbt,
    supported,
)


def _batch(B, N, seed=0, shift=None):
    rng = np.random.RandomState(seed)
    shift = 4.0 * np.sqrt(N) if shift is None else shift
    a = (rng.randn(B, N, N) + shift * np.eye(N)).astype(np.float32)
    b = rng.randn(B, N).astype(np.float32)
    return a, b


def _resid(a, b, x):
    a64 = a.astype(np.float64)
    return np.linalg.norm(
        np.einsum("bij,bj->bi", a64, np.asarray(x, np.float64)) - b,
        axis=1,
    ) / np.linalg.norm(b, axis=1)


class TestSolveFusedKernel:
    def test_supported(self):
        assert supported(256)
        assert supported(64)
        assert not supported(63)      # nb divisibility
        assert not supported(512)     # 2 x N^2 x 128 x 4 > VMEM budget
        assert not supported(32)      # < 2*nb

    @pytest.mark.parametrize("N", [64, 96])
    def test_matches_oracle(self, N):
        a, b = _batch(6, N, seed=N)
        x, bad = solve_fused_rbt(
            jnp.asarray(a), jnp.asarray(b), interpret=True
        )
        r = _resid(a, b, x)
        assert r.max() < 1e-5, r
        assert not np.asarray(bad).any()

    def test_ir0_gate_and_accuracy(self):
        a, b = _batch(4, 64, seed=7)
        x, bad = solve_fused_rbt(
            jnp.asarray(a), jnp.asarray(b), ir_steps=0, interpret=True
        )
        r = _resid(a, b, x)
        # f32 factor, no refinement: still well under the loose gate
        assert r.max() < 1e-4, r
        assert not np.asarray(bad).any()

    def test_singular_lane_flagged(self):
        a, b = _batch(4, 64, seed=3)
        a[2] = 0.0  # exactly singular lane
        x, bad = solve_fused_rbt(
            jnp.asarray(a), jnp.asarray(b), interpret=True
        )
        badn = np.asarray(bad)
        assert badn[2]
        # other lanes unpoisoned and unflagged
        r = _resid(a, b, x)
        keep = np.array([0, 1, 3])
        assert r[keep].max() < 1e-5, r
        assert not badn[keep].any()

    def test_compacted_rescue_end_to_end(self):
        """Through pallas_solve_rbt_batched (engine auto -> fused +
        lane-compacted rescue): an adversarial singular-leading-minor
        lane comes back solved."""
        from linalg_solver_tpu.ops import rbt

        a, b = _batch(5, 64, seed=11)
        a[1, :16, :16] = 0.0  # singular leading minor, full rank
        x = np.asarray(rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(b), nb=32, interpret=True
        ), np.float64)
        r = _resid(a, b, x)
        assert r.max() < 1e-4, r

    def test_matrix_rhs_fused_slabs(self):
        """Matrix RHS k <= MAX_K_RHS rides the fused kernel as k vector
        slabs sharing one factorization (round 5); wide RHS still routes
        to the phase engine through engine='auto'."""
        from linalg_solver_tpu.ops import rbt

        rng = np.random.RandomState(13)
        a, _ = _batch(3, 64, seed=13)
        for k in (2, 8):
            bm = rng.randn(3, 64, k).astype(np.float32)
            xm, bad = solve_fused_rbt(
                jnp.asarray(a), jnp.asarray(bm), interpret=True
            )
            assert xm.shape == (3, 64, k)
            assert not np.asarray(bad).any()
            err = np.max(np.abs(
                np.asarray(xm, np.float64)
                - np.linalg.solve(a.astype(np.float64),
                                  bm.astype(np.float64))
            ))
            assert err < 1e-5, (k, err)
        # through the auto engine (routing + compacted rescue shapes)
        bm = rng.randn(3, 64, 4).astype(np.float32)
        xm = np.asarray(rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(bm), nb=32, interpret=True
        ), np.float64)
        r = np.max(np.abs(
            np.einsum("bij,bjk->bik", a.astype(np.float64), xm) - bm
        ))
        assert r < 1e-3, r

    def test_matrix_rhs_wide_falls_back_to_phase_engine(self):
        """k > MAX_K_RHS exceeds the slab budget: engine='auto' routes
        to the phase engine and still solves correctly."""
        from linalg_solver_tpu.ops import rbt
        from linalg_solver_tpu.ops.pallas.solve_fused_kernel import (
            MAX_K_RHS,
        )

        rng = np.random.RandomState(29)
        a, _ = _batch(3, 64, seed=29)
        bm = rng.randn(3, 64, MAX_K_RHS + 4).astype(np.float32)
        xm = np.asarray(rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(bm), nb=32, interpret=True
        ), np.float64)
        r = np.max(np.abs(
            np.einsum("bij,bjk->bik", a.astype(np.float64), xm) - bm
        ))
        assert r < 1e-3, r

    def test_matrix_rhs_singular_lane_rescued(self):
        """The lane-compacted rescue works on matrix-RHS batches: a
        truly singular lane flags non-finite, good lanes stay exact."""
        from linalg_solver_tpu.ops import rbt

        rng = np.random.RandomState(31)
        a, _ = _batch(5, 64, seed=31)
        a[2] = 0.0
        bm = rng.randn(5, 64, 4).astype(np.float32)
        xm = np.asarray(rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(bm), nb=32, interpret=True
        ), np.float64)
        good = [0, 1, 3, 4]
        err = np.max(np.abs(
            xm[good] - np.linalg.solve(
                a[good].astype(np.float64), bm[good].astype(np.float64)
            )
        ))
        assert err < 1e-5, err
        assert not np.isfinite(xm[2]).all()

    def test_unroll_variants_bitwise(self):
        """Manual partial unroll must not change a single bit."""
        a, b = _batch(4, 64, seed=37)
        xs = []
        for u in (1, 2, 4):
            x, bad = solve_fused_rbt(
                jnp.asarray(a), jnp.asarray(b), interpret=True,
                unroll=u,
            )
            assert not np.asarray(bad).any()
            xs.append(np.asarray(x))
        assert np.array_equal(xs[0], xs[1])
        assert np.array_equal(xs[0], xs[2])

    def test_streamed_residual_variant_matches(self):
        """The streamed-residual variant (refinement re-reads A from
        HBM in column chunks instead of a VMEM copy) must match the
        two-copy variant's accuracy."""
        a, b = _batch(6, 64, seed=17)
        xh, bh = solve_fused_rbt(
            jnp.asarray(a), jnp.asarray(b), interpret=True
        )
        xs, bs = solve_fused_rbt(
            jnp.asarray(a), jnp.asarray(b), interpret=True,
            force_stream=True,
        )
        rh = _resid(a, b, xh)
        rs = _resid(a, b, xs)
        assert rh.max() < 1e-5 and rs.max() < 1e-5, (rh, rs)
        assert not np.asarray(bh).any() and not np.asarray(bs).any()

    def test_supported_streamed_bounds(self):
        from linalg_solver_tpu.ops.pallas.solve_fused_kernel import (
            supported_streamed,
        )

        assert supported_streamed(384)
        assert supported_streamed(352)
        assert not supported_streamed(448)  # failed remote compile
        assert not supported_streamed(100)  # 32-chunk divisibility

    def test_nan_lane_does_not_poison_batch(self):
        """A lane containing NaN must flag (NaN-proof gate) and must
        not corrupt other lanes through the compacted rescue."""
        from linalg_solver_tpu.ops import rbt

        a, b = _batch(5, 64, seed=23)
        a[3, 10, 11] = np.nan
        x = np.asarray(rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(b), nb=32, interpret=True
        ), np.float64)
        r = _resid(a, b, x)
        keep = np.array([0, 1, 2, 4])
        assert r[keep].max() < 1e-5, r
        assert not np.isfinite(r[3])  # honest non-finite, not garbage
