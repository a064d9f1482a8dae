"""Log-depth GEMM Schur recursion (ops/lu_recursive.py) — the round-3
replacement for the no-pivot panel kernel's sequential column walk.

No counterpart in the reference (exact rational arithmetic needs no
pivot conditioning); see STATUS.md's RBT ceiling model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops.lu_recursive import (
    _leaf_inverse,
    inverse_nopivot_recursive,
)
from linalg_solver_tpu.ops import rbt


def make_batch(B, N, seed=0, shift=None):
    rng = np.random.RandomState(seed)
    shift = shift if shift is not None else 4.0 * np.sqrt(N)
    return (
        rng.randn(B, N, N).astype(np.float32)
        + shift * np.eye(N, dtype=np.float32)
    )


def inv_err(a, x):
    a64 = np.asarray(a, np.float64)
    x64 = np.asarray(x, np.float64)
    n = a64.shape[-1]
    return np.max(np.abs(
        np.einsum("bij,bjk->bik", a64, x64) - np.eye(n)
    ))


class TestLeafInverse:
    def test_matches_npinv(self):
        a = jnp.asarray(make_batch(6, 8, seed=0))
        x, ok = _leaf_inverse(a)
        assert bool(np.all(np.asarray(ok)))
        assert inv_err(a, x) < 1e-5

    def test_zero_pivot_flagged(self):
        a = np.broadcast_to(
            2.0 * np.eye(4, dtype=np.float32), (3, 4, 4)
        ).copy()
        a[1, 2, 2] = 0.0
        a[1, 3, 2] = 1.0  # row exchange would fix it; no-pivot can't
        _, ok = _leaf_inverse(jnp.asarray(a))
        assert bool(ok[0]) and not bool(ok[1]) and bool(ok[2])


class TestRecursiveInverse:
    @pytest.mark.parametrize("n,leaf", [(64, 8), (64, 16), (48, 8),
                                        (96, 16), (128, 32)])
    def test_well_conditioned(self, n, leaf):
        a = jnp.asarray(make_batch(4, n, seed=n + leaf))
        x, ok = inverse_nopivot_recursive(a, leaf=leaf)
        assert bool(np.all(np.asarray(ok)))
        assert inv_err(a, x) < 2e-4

    def test_leaf_at_or_above_n_is_pure_leaf(self):
        a = jnp.asarray(make_batch(3, 8, seed=5))
        x1, _ = inverse_nopivot_recursive(a, leaf=8)
        x2, _ = _leaf_inverse(a)
        # jit (recursive entry) vs eager (direct leaf) may fuse
        # differently — identical math, not identical bits.
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-6
        )

    def test_singular_leading_block_flagged(self):
        a = make_batch(3, 32, seed=7)
        a[1, :16, :16] = 0.0  # kills the A11 recursion's pivots
        _, ok = inverse_nopivot_recursive(jnp.asarray(a), leaf=8)
        ok = np.asarray(ok)
        assert bool(ok[0]) and not bool(ok[1]) and bool(ok[2])

    def test_matches_f64_oracle_closely(self):
        a = jnp.asarray(make_batch(2, 64, seed=9))
        x, _ = inverse_nopivot_recursive(a, leaf=16)
        want = np.linalg.inv(np.asarray(a, np.float64))
        np.testing.assert_allclose(
            np.asarray(x, np.float64), want, atol=5e-5
        )


class TestRecursiveEngineRBT:
    """The engine="recursive" path through ops.rbt (the headline
    backend's round-3 factor engine)."""

    def test_solve_matches_kernel_engine(self):
        B, N = 4, 64
        a = jnp.asarray(make_batch(B, N, seed=0))
        b = jnp.asarray(
            np.random.RandomState(1).randn(B, N).astype(np.float32)
        )
        xr = rbt.pallas_solve_rbt_batched(
            a, b, nb=32, interpret=True, engine="recursive", leaf=16
        )
        a64 = np.asarray(a, np.float64)
        r = np.linalg.norm(
            np.einsum("bij,bj->bi", a64, np.asarray(xr, np.float64))
            - np.asarray(b, np.float64), axis=1,
        ) / np.linalg.norm(np.asarray(b, np.float64), axis=1)
        assert r.max() < 1e-5

    def test_solve_zero_lane_rescued(self):
        B, N = 4, 32
        a = make_batch(B, N, seed=3)
        a[2] = 0.0  # singular lane: flags, rescue, non-finite rows
        b = np.random.RandomState(4).randn(B, N).astype(np.float32)
        x = np.asarray(rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(b), nb=16, interpret=True,
            engine="recursive", leaf=8,
        ))
        finite = np.setdiff1d(np.arange(B), [2])
        a64 = np.asarray(a, np.float64)[finite]
        r = np.linalg.norm(
            np.einsum("bij,bj->bi", a64,
                      np.asarray(x, np.float64)[finite])
            - b[finite].astype(np.float64), axis=1,
        ) / np.linalg.norm(b[finite], axis=1)
        assert r.max() < 1e-5

    def test_inverse_recursive_engine(self):
        B, N = 3, 64
        a = jnp.asarray(make_batch(B, N, seed=6))
        x = rbt.pallas_inverse_rbt_batched(
            a, nb=32, interpret=True, engine="recursive", leaf=16
        )
        assert inv_err(a, x) < 1e-4


class TestHybridEngineRBT:
    """engine="hybrid": no-pivot panel kernel phases + assembled full
    L/U + D&C/Neumann triangular inverses + single-GEMM apply — the
    measured round-3 winner at the bench shape (replaces the 2.27 ms
    backward stage; see STATUS's RBT ceiling model)."""

    def test_full_inverse_matches_oracle(self):
        B, N, nb = 3, 96, 32
        a = jnp.asarray(make_batch(B, N, seed=11))
        inv_p, ok = rbt._phases_full_inverse(a, nb, True, 8)
        assert bool(np.all(np.asarray(ok)))
        assert inv_err(a, inv_p) < 2e-4

    def test_solve_hybrid(self):
        B, N = 4, 64
        a = jnp.asarray(make_batch(B, N, seed=12))
        b = jnp.asarray(
            np.random.RandomState(13).randn(B, N).astype(np.float32)
        )
        x = rbt.pallas_solve_rbt_batched(
            a, b, nb=32, interpret=True, engine="hybrid"
        )
        a64 = np.asarray(a, np.float64)
        r = np.linalg.norm(
            np.einsum("bij,bj->bi", a64, np.asarray(x, np.float64))
            - np.asarray(b, np.float64), axis=1,
        ) / np.linalg.norm(np.asarray(b, np.float64), axis=1)
        assert r.max() < 1e-5

    def test_solve_hybrid_zero_lane_rescued(self):
        B, N = 4, 32
        a = make_batch(B, N, seed=14)
        a[1] = 0.0
        b = np.random.RandomState(15).randn(B, N).astype(np.float32)
        x = np.asarray(rbt.pallas_solve_rbt_batched(
            jnp.asarray(a), jnp.asarray(b), nb=16, interpret=True,
            engine="hybrid",
        ))
        finite = [0, 2, 3]
        a64 = np.asarray(a, np.float64)[finite]
        r = np.linalg.norm(
            np.einsum("bij,bj->bi", a64,
                      np.asarray(x, np.float64)[finite])
            - b[finite].astype(np.float64), axis=1,
        ) / np.linalg.norm(b[finite], axis=1)
        assert r.max() < 1e-5

    def test_inverse_hybrid(self):
        B, N = 3, 64
        a = jnp.asarray(make_batch(B, N, seed=16))
        x = rbt.pallas_inverse_rbt_batched(
            a, nb=32, interpret=True, engine="hybrid"
        )
        assert inv_err(a, x) < 1e-4
