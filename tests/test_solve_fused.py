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

    def test_matrix_rhs_falls_back_to_phase_engine(self):
        """engine='auto' only fuses vector RHS; matrix RHS must still
        solve correctly through the phase engine."""
        from linalg_solver_tpu.ops import rbt

        a, b = _batch(3, 64, seed=13)
        bm = np.stack([b, 2 * b], axis=2)  # [B, N, 2]
        xm = np.asarray(rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(bm), nb=32, interpret=True
        ), np.float64)
        r = np.max(np.abs(
            np.einsum("bij,bjk->bik", a.astype(np.float64), xm) - bm
        ))
        assert r < 1e-3, r

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
