"""Distributed tall-matrix factorizations on the 8 virtual CPU devices:
differential vs numpy, mesh-shape invariance, and agreement with the
batched single-chip paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.parallel.distributed_tall import (
    distributed_cholqr2,
    distributed_lstsq,
    distributed_polar_tall,
    distributed_svd_tall,
)
from linalg_solver_tpu.parallel.mesh import make_mesh


def tall(M, n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(M, n).astype(np.float32)


class TestDistributedQR:
    @pytest.mark.parametrize("shards", [1, 2, 8])
    def test_qr_factorizes(self, shards):
        mesh = make_mesh(dp=shards, tp=8 // shards)
        A = tall(64, 12, seed=1)
        res = distributed_cholqr2(jnp.asarray(A), mesh, axis="dp")
        assert bool(res.ok)
        Q, R = np.asarray(res.q), np.asarray(res.R)
        np.testing.assert_allclose(Q @ R, A, atol=1e-4)
        np.testing.assert_allclose(
            Q.T @ Q, np.eye(12), atol=1e-5
        )
        assert np.abs(np.tril(R, -1)).max() < 1e-6

    def test_mesh_shape_invariance(self):
        A = tall(64, 8, seed=2)
        rs = []
        for shards in (1, 2, 4, 8):
            mesh = make_mesh(dp=shards, tp=8 // shards)
            rs.append(
                np.asarray(
                    distributed_cholqr2(
                        jnp.asarray(A), mesh, axis="dp"
                    ).R
                )
            )
        for r in rs[1:]:
            np.testing.assert_allclose(r, rs[0], atol=1e-4)


class TestDistributedLstsq:
    @pytest.mark.parametrize("shards", [2, 8])
    def test_matches_numpy(self, shards):
        mesh = make_mesh(dp=shards, tp=8 // shards)
        A = tall(80, 10, seed=3)
        b = np.random.RandomState(4).randn(80).astype(np.float32)
        x = np.asarray(
            distributed_lstsq(jnp.asarray(A), jnp.asarray(b), mesh)
        )
        want = np.linalg.lstsq(
            A.astype(np.float64), b, rcond=None
        )[0]
        np.testing.assert_allclose(x, want, atol=1e-4)

    def test_block_rhs(self):
        mesh = make_mesh(dp=4, tp=2)
        A = tall(48, 6, seed=5)
        b = np.random.RandomState(6).randn(48, 3).astype(np.float32)
        x = np.asarray(
            distributed_lstsq(jnp.asarray(A), jnp.asarray(b), mesh)
        )
        want = np.linalg.lstsq(A.astype(np.float64), b, rcond=None)[0]
        np.testing.assert_allclose(x, want, atol=1e-4)

    def test_matches_batched_lstsq(self):
        from linalg_solver_tpu.ops.lstsq import lstsq_batched

        mesh = make_mesh(dp=8, tp=1)
        A = tall(64, 9, seed=7)
        b = np.random.RandomState(8).randn(64).astype(np.float32)
        xd = np.asarray(
            distributed_lstsq(jnp.asarray(A), jnp.asarray(b), mesh)
        )
        xb = np.asarray(
            lstsq_batched(jnp.asarray(A[None]), jnp.asarray(b[None])).x
        )[0]
        np.testing.assert_allclose(xd, xb, atol=1e-4)


class TestDistributedPolarSVD:
    def test_polar(self):
        mesh = make_mesh(dp=8, tp=1)
        A = tall(64, 10, seed=9)
        res = distributed_polar_tall(jnp.asarray(A), mesh)
        assert bool(res.ok)
        up, H = np.asarray(res.up), np.asarray(res.H)
        np.testing.assert_allclose(up @ H, A, atol=1e-4)
        np.testing.assert_allclose(
            up.T @ up, np.eye(10), atol=1e-4
        )
        w = np.linalg.eigvalsh(H.astype(np.float64))
        assert w.min() > -1e-4  # PSD

    @pytest.mark.parametrize("shards", [2, 8])
    def test_svd_matches_numpy(self, shards):
        mesh = make_mesh(dp=shards, tp=8 // shards)
        A = tall(72, 12, seed=10)
        res = distributed_svd_tall(jnp.asarray(A), mesh)
        assert bool(res.ok)
        s = np.asarray(res.s)
        want = np.linalg.svd(A.astype(np.float64), compute_uv=False)
        np.testing.assert_allclose(s, want, atol=1e-4 * want[0])
        U, V = np.asarray(res.U), np.asarray(res.V)
        np.testing.assert_allclose((U * s) @ V.T, A, atol=2e-4 * want[0])
        np.testing.assert_allclose(U.T @ U, np.eye(12), atol=1e-4)

    def test_svd_matches_batched(self):
        from linalg_solver_tpu.ops.svd import svd_batched

        mesh = make_mesh(dp=4, tp=2)
        A = tall(40, 8, seed=11)
        sd = np.asarray(
            distributed_svd_tall(jnp.asarray(A), mesh).s
        )
        sb = np.asarray(svd_batched(jnp.asarray(A[None])).s)[0]
        np.testing.assert_allclose(sd, sb, atol=1e-5)


class TestDistributedRSVD:
    @pytest.mark.parametrize("shards", [2, 8])
    def test_low_rank_recovery(self, shards):
        from linalg_solver_tpu.parallel.distributed_tall import (
            distributed_randomized_svd,
        )

        mesh = make_mesh(dp=shards, tp=8 // shards)
        rng = np.random.RandomState(20)
        M, n, r = 64, 24, 4
        A = (rng.randn(M, r) @ rng.randn(r, n)).astype(np.float32)
        res = distributed_randomized_svd(jnp.asarray(A), mesh, k=r)
        assert bool(np.asarray(res.ok))
        assert bool(np.asarray(res.valid).all())
        U, s, V = map(np.asarray, (res.U, res.s, res.V))
        rec = (U * s) @ V.T
        assert np.abs(rec - A).max() < 1e-4 * np.abs(A).max()
        want = np.linalg.svd(
            A.astype(np.float64), compute_uv=False
        )[:r]
        np.testing.assert_allclose(s, want, rtol=1e-4)

    def test_matches_batched_rsvd(self):
        from linalg_solver_tpu.ops.randomized import (
            randomized_svd_batched,
        )
        from linalg_solver_tpu.parallel.distributed_tall import (
            distributed_randomized_svd,
        )

        mesh = make_mesh(dp=4, tp=2)
        rng = np.random.RandomState(21)
        A = (rng.randn(48, 6) @ rng.randn(6, 20)).astype(np.float32)
        sd = np.asarray(
            distributed_randomized_svd(jnp.asarray(A), mesh, k=6).s
        )
        sb = np.asarray(
            randomized_svd_batched(jnp.asarray(A[None]), k=6).s
        )[0]
        np.testing.assert_allclose(sd, sb, rtol=1e-3)
