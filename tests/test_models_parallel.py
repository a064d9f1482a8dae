"""Models, mesh/sharding, trace replay, and driver entry point tests —
the multichip path runs on the 8 virtual CPU devices from conftest."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.models.solver import (
    BatchedSolver,
    init_train_state,
    make_training_step,
)
from linalg_solver_tpu.models.spectral import spectral_pipeline
from linalg_solver_tpu.ops.generate import (
    diagonalizable_batch,
    full_rank_batch,
    random_batch,
)
from linalg_solver_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(dp=4, tp=2)
        assert mesh.axis_names == ("dp", "tp")
        assert mesh.devices.shape == (4, 2)

    def test_default_dp(self):
        mesh = make_mesh(tp=2)
        assert mesh.devices.shape == (4, 2)

    def test_too_many_raises(self):
        with pytest.raises(ValueError):
            make_mesh(dp=16, tp=2)

    def test_shard_batch_placement(self):
        mesh = make_mesh(dp=8, tp=1)
        x = jnp.zeros((16, 4, 4))
        sharded = shard_batch(x, mesh)
        assert sharded.sharding.is_equivalent_to(
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("dp", None, None)
            ),
            x.ndim,
        )


class TestBatchShardedSolve:
    """The flagship batch path's multi-chip form (VERDICT r4 item 1):
    dp-sharded shard_map execution with ZERO collective traffic."""

    def _batch(self, B=16, N=64, seed=0):
        ka, kb = jax.random.split(jax.random.PRNGKey(seed))
        a = jax.random.normal(ka, (B, N, N), jnp.float32) + (
            4.0 * N**0.5
        ) * jnp.eye(N, dtype=jnp.float32)
        b = jax.random.normal(kb, (B, N), jnp.float32)
        return a, b

    def test_axes_fold_and_errors(self):
        from linalg_solver_tpu.models.solver import batch_shard_axes

        mesh = make_mesh(dp=4, tp=2)
        assert batch_shard_axes(mesh, 16) == ("dp", "tp")
        assert batch_shard_axes(mesh, 4) == ("dp",)   # tp doesn't divide
        with pytest.raises(ValueError):
            batch_shard_axes(mesh, 6)                 # nothing divides

    def test_sharded_solve_matches_and_zero_collectives(self):
        from linalg_solver_tpu.models import solver as solver_mod
        from linalg_solver_tpu.parallel import comm

        mesh = make_mesh(dp=4, tp=2)
        a, b = self._batch()
        a_sh, b_sh = shard_batch(a, mesh), shard_batch(b, mesh)
        with comm.CommMeter() as meter:
            x = BatchedSolver(mesh=mesh).solve(a_sh, b_sh)
            jax.block_until_ready(x)
        assert dict(meter.calls) == {}, meter.as_dict()
        x_ref = BatchedSolver().solve(a, b)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(x_ref), atol=1e-5
        )
        # solution actually solves the systems (f64 host check)
        r = np.linalg.norm(
            np.einsum(
                "bij,bj->bi", np.asarray(a, np.float64),
                np.asarray(x, np.float64),
            ) - np.asarray(b, np.float64), axis=1,
        ) / np.linalg.norm(np.asarray(b, np.float64), axis=1)
        assert r.max() < 1e-5, r.max()
        # output stays batch-sharded over the full mesh
        assert x.sharding.is_equivalent_to(
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(("dp", "tp"), None)
            ),
            x.ndim,
        )

    def test_compiled_hlo_has_no_collectives(self):
        from linalg_solver_tpu.models import solver as solver_mod

        mesh = make_mesh(dp=4, tp=2)
        a, b = self._batch()
        a_sh, b_sh = shard_batch(a, mesh), shard_batch(b, mesh)
        hlo = (
            solver_mod._sharded_batch_op.lower(
                mesh, ("dp", "tp"), "auto", "solve", a_sh, b_sh
            )
            .compile()
            .as_text()
        )
        for tok in (
            "all-reduce", "all-gather", "collective-permute",
            "reduce-scatter", "all-to-all",
        ):
            assert tok not in hlo, tok

    def test_sharded_rbt_fused_backend_bitwise(self):
        """The headline fused-RBT backend under shard_map: lanes are
        independent, so sharding must not change a single bit."""
        from linalg_solver_tpu.ops import dispatch

        mesh = make_mesh(dp=4, tp=2)
        a, b = self._batch(seed=7)
        a_sh, b_sh = shard_batch(a, mesh), shard_batch(b, mesh)
        x = BatchedSolver(mesh=mesh, backend="rbt").solve(a_sh, b_sh)
        x_ref = dispatch.solve_batched(a, b, backend="rbt")
        np.testing.assert_array_equal(np.asarray(x), np.asarray(x_ref))

    def test_sharded_inverse_det_rank(self):
        mesh = make_mesh(dp=4, tp=2)
        # N small enough that det stays in f32 range
        ka = jax.random.PRNGKey(5)
        a = jax.random.normal(ka, (16, 8, 8), jnp.float32) + 3.0 * jnp.eye(
            8, dtype=jnp.float32
        )
        a_sh = shard_batch(a, mesh)
        sv = BatchedSolver(mesh=mesh)
        inv = sv.inverse(a_sh)
        err = jnp.max(
            jnp.abs(
                jnp.einsum("bij,bjk->bik", a, inv)
                - jnp.eye(8, dtype=jnp.float32)
            )
        )
        assert float(err) < 1e-4, float(err)
        np.testing.assert_allclose(
            np.asarray(sv.det(a_sh)), np.asarray(jnp.linalg.det(a)),
            rtol=1e-4,
        )
        assert np.all(np.asarray(sv.rank(a_sh)) == 8)


class TestBatchedSolver:
    def test_solve_and_inverse(self):
        solver = BatchedSolver()
        key = jax.random.PRNGKey(0)
        a = full_rank_batch(key, 4, 5)
        b = random_batch(jax.random.PRNGKey(1), 4, 5, 1)[:, :, 0]
        x = solver.solve(a, b)
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", np.asarray(a), np.asarray(x)),
            np.asarray(b), atol=1e-3,
        )
        inv = solver.inverse(a)
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", np.asarray(a), np.asarray(inv)),
            np.broadcast_to(np.eye(5), (4, 5, 5)), atol=1e-3,
        )
        dets = solver.det(a)
        for i in range(4):
            np.testing.assert_allclose(
                float(dets[i]),
                np.linalg.det(np.asarray(a[i]).astype(np.float64)),
                rtol=1e-3,
            )
        assert list(np.asarray(solver.rank(a))) == [5] * 4

    def test_affine_solve_rank_deficient(self):
        solver = BatchedSolver()
        a = jnp.broadcast_to(
            jnp.array([[1.0, 2.0, 3.0], [2.0, 4.0, 6.0]]), (2, 2, 3)
        )
        b = jnp.array([[1.0, 2.0], [0.0, 1.0]])
        sol = solver.affine_solve(a, b)
        assert bool(sol.is_consistent[0])
        assert not bool(sol.is_consistent[1])
        assert int(sol.dim[0]) == 2

    def test_lstsq_svd_rcond_facade(self):
        """The facade must route to ops.lstsq / ops.svd / ops.cond."""
        solver = BatchedSolver()
        rng = np.random.RandomState(3)
        A = rng.randn(2, 16, 6).astype(np.float32)
        b = rng.randn(2, 16).astype(np.float32)
        res = solver.lstsq(jnp.asarray(A), jnp.asarray(b))
        for i in range(2):
            want = np.linalg.lstsq(
                A[i].astype(np.float64), b[i], rcond=None
            )[0]
            np.testing.assert_allclose(
                np.asarray(res.x)[i], want, atol=1e-4
            )
        sq = rng.randn(2, 8, 8).astype(np.float32) + 4 * np.eye(
            8, dtype=np.float32
        )
        s = np.asarray(solver.svd(jnp.asarray(sq)).s)
        for i in range(2):
            want = np.linalg.svd(
                sq[i].astype(np.float64), compute_uv=False
            )
            np.testing.assert_allclose(s[i], want, atol=1e-4)
        rc = np.asarray(solver.rcond(jnp.asarray(sq)))
        assert ((rc > 0) & (rc <= 1.0)).all()


class TestTrainingStep:
    def test_loss_decreases_on_mesh(self):
        mesh = make_mesh(dp=4, tp=2)
        B, N = 8, 8
        key = jax.random.PRNGKey(0)
        k_a, k_b = jax.random.split(key)
        a = jax.random.normal(k_a, (B, N, N)) + 3.0 * jnp.eye(N)
        b = jax.random.normal(k_b, (B, N))
        a = shard_batch(a, mesh)
        b = shard_batch(b, mesh)
        state = init_train_state(N)
        state = type(state)(replicate(state.params, mesh), state.step)
        step = make_training_step(mesh, lr=1e-2)
        with mesh:
            state1, loss1 = step(state, a, b)
            state2, loss2 = step(state1, a, b)
        assert int(state2.step) == 2
        assert float(loss2) < float(loss1)

    def test_tp1_matches_tp2(self):
        """The tp-sharded loss must be invariant to the mesh layout."""
        B, N = 8, 8
        key = jax.random.PRNGKey(3)
        k_a, k_b = jax.random.split(key)
        a = jax.random.normal(k_a, (B, N, N)) + 3.0 * jnp.eye(N)
        b = jax.random.normal(k_b, (B, N))
        losses = []
        for tp in (1, 2, 4):
            mesh = make_mesh(tp=tp)
            sa, sb = shard_batch(a, mesh), shard_batch(b, mesh)
            state = init_train_state(N)
            state = type(state)(replicate(state.params, mesh), state.step)
            step = make_training_step(mesh, lr=1e-2)
            with mesh:
                _, loss = step(state, sa, sb)
            losses.append(float(loss))
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
        np.testing.assert_allclose(losses[0], losses[2], rtol=1e-5)


class TestSpectralPipeline:
    def test_report(self):
        batch = diagonalizable_batch(
            jax.random.PRNGKey(2), 2, [4.0, 1.0, -2.0]
        )
        report = spectral_pipeline(batch, iters=200)
        assert bool(np.asarray(report.diagonalizable).all())
        for i in range(2):
            np.testing.assert_allclose(
                np.sort(np.asarray(report.eig_real[i])),
                [-2.0, 1.0, 4.0], atol=1e-2,
            )
            assert list(np.asarray(report.alg_mult[i])) == [1, 1, 1]
            assert list(np.asarray(report.geom_mult[i])) == [1, 1, 1]


class TestTraceReplay:
    def test_replay_matches_exact_path(self, quiet_trace):
        """Device event stream replayed on host must reproduce the exact
        path's snapshots and reduced matrix."""
        import sympy

        from linalg_solver_tpu.exact.matrix import Matrix
        from linalg_solver_tpu.ops.rref import rref
        from linalg_solver_tpu.trace.events import replay_rref_events

        A = [[0, 2, 1, 4], [1, 1, 0, 2], [2, 2, 1, 3]]
        exact = Matrix([[sympy.Rational(x) for x in row] for row in A])
        exact_reduced, _, exact_snaps, exact_steps = exact.row_reduce(
            bar_col=3
        )

        res = rref(
            jnp.asarray(np.array(A, np.float32)), bar_col=3, tol=1e-5,
            pivot_rule="first",
        )
        replay_reduced, snaps, steps = replay_rref_events(
            A, np.asarray(res.events), int(res.num_events), bar_col=3
        )
        assert [
            [sympy.Rational(x) for x in row] for row in exact_reduced
        ] == replay_reduced
        assert snaps == exact_snaps
        assert [lbl[0] for lbl, _ in steps] == [
            lbl[0] for lbl, _ in exact_steps
        ]

    def test_replay_solve_trace_logs(self, quiet_trace):
        from linalg_solver_tpu.trace.events import replay_solve_trace

        replay_solve_trace(batch=2, n=3)
        text = str(quiet_trace)
        assert "TPU" in text
        assert r"\StepSim" in text or r"\sim" in text


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, _REPO_ROOT)
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = fn(*args)
        assert out.shape == (8, 64)
        a, b = args
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", np.asarray(a), np.asarray(out)),
            np.asarray(b), atol=1e-2,
        )

    def test_dryrun_multichip(self, capsys):
        import sys

        sys.path.insert(0, _REPO_ROOT)
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out

    @pytest.mark.slow
    def test_dryrun_multichip_d16(self):
        """The weak-scaling collective-count assertion at D=16 needs 16
        virtual devices — run the dryrun in a subprocess with its own
        CPU topology (VERDICT r3 item 7)."""
        import subprocess
        import sys

        code = (
            "import jax;"
            "jax.config.update('jax_platforms', 'cpu');"
            "jax.config.update('jax_num_cpu_devices', 16);"
            f"import sys; sys.path.insert(0, {_REPO_ROOT!r});"
            "import __graft_entry__ as ge;"
            "ge.dryrun_multichip(16)"
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=900,
            cwd=_REPO_ROOT,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "dryrun_multichip OK" in out.stdout


class TestJordanAnalysis:
    def test_known_jordan_structure(self):
        from linalg_solver_tpu.models.jordan import jordan_analysis
        from linalg_solver_tpu.ops.generate import jordan_batch

        # J(2)⊕J(2)⊕J(1-block of 5): eigenvalue 2 has blocks (2, 2),
        # eigenvalue 5 has one block of size 1.
        batch = jordan_batch(
            jax.random.PRNGKey(3), 4, ((2.0, 2), (2.0, 2), (5.0, 1))
        )
        report = jordan_analysis(
            batch, jnp.array([2.0, 5.0]), k_max=3
        )
        alg = np.asarray(report.alg_mult)
        geom = np.asarray(report.geom_mult)
        blocks = np.asarray(report.block_counts)
        for i in range(4):
            assert alg[i, 0] == 4 and geom[i, 0] == 2
            assert alg[i, 1] == 1 and geom[i, 1] == 1
            # eigenvalue 2: zero blocks of size 1, two of size 2
            assert list(blocks[i, 0, :3]) == [0, 2, 0]
            assert list(blocks[i, 1, :3]) == [1, 0, 0]

    def test_diagonalizable_all_size_one(self):
        from linalg_solver_tpu.models.jordan import jordan_analysis
        from linalg_solver_tpu.ops.generate import diagonalizable_batch

        batch = diagonalizable_batch(
            jax.random.PRNGKey(4), 3, [3.0, 3.0, 1.0]
        )
        report = jordan_analysis(batch, jnp.array([3.0, 1.0]), k_max=2)
        alg = np.asarray(report.alg_mult)
        geom = np.asarray(report.geom_mult)
        assert (alg[:, 0] == 2).all() and (geom[:, 0] == 2).all()
        assert (alg[:, 1] == 1).all() and (geom[:, 1] == 1).all()

    def test_gj_method_agrees_with_svd(self):
        from linalg_solver_tpu.models.jordan import jordan_analysis
        from linalg_solver_tpu.ops.generate import jordan_batch

        batch = jordan_batch(jax.random.PRNGKey(5), 2, ((1.0, 3),))
        gj_rep = jordan_analysis(batch, jnp.array([1.0]), k_max=4,
                                 method="gj")
        svd_rep = jordan_analysis(batch, jnp.array([1.0]), k_max=4,
                                  method="svd")
        assert np.array_equal(
            np.asarray(gj_rep.weyr), np.asarray(svd_rep.weyr)
        )
        assert list(np.asarray(gj_rep.weyr[0, 0])) == [1, 1, 1, 0]


class TestWeyrStability:
    """Regression: Weyr via raw rank((A−λI)^k) corrupts multiplicities
    when spectrum-spread^k reaches the rank tolerance (signal decays as
    gap^k, threshold rides ‖M^k‖).  The deflated iteration
    ker M^{k+1} = ker((I−QQᵀ)M) keeps every measured matrix at ‖M‖."""

    BLOCKS = tuple(
        [(2.0, 3)] * 3 + [(2.0, 2)] * 3 + [(5.0, 2)] * 5 + [(1.0, 1)] * 9
    )

    @pytest.mark.parametrize("method", ["svd", "gj"])
    def test_gap4_spectrum_kmax4_exact(self, method):
        from linalg_solver_tpu.models.jordan import jordan_analysis
        from linalg_solver_tpu.ops.generate import jordan_batch

        A = jordan_batch(
            jax.random.PRNGKey(1), 6, self.BLOCKS, transform="orthogonal"
        )
        rep = jordan_analysis(
            A, jnp.array([2.0, 5.0, 1.0]), k_max=4, method=method
        )
        assert (np.asarray(rep.alg_mult) == [15, 10, 9]).all()
        assert (np.asarray(rep.geom_mult) == [6, 5, 9]).all()
        bc = np.asarray(rep.block_counts)
        assert (bc[:, 0] == [0, 3, 3, 0]).all()
        assert (bc[:, 1] == [0, 5, 0, 0]).all()
        assert (bc[:, 2] == [9, 0, 0, 0]).all()

    def test_non_eigenvalue_slot_zero(self):
        from linalg_solver_tpu.models.jordan import jordan_analysis
        from linalg_solver_tpu.ops.generate import jordan_batch

        A = jordan_batch(jax.random.PRNGKey(2), 3, ((3.0, 2), (1.0, 1)))
        rep = jordan_analysis(A, jnp.array([3.0, 9.0]), k_max=3)
        assert (np.asarray(rep.alg_mult)[:, 1] == 0).all()
        assert (np.asarray(rep.geom_mult)[:, 1] == 0).all()


@pytest.mark.slow
class TestShardedSpectral:
    def test_matches_replicated(self):
        from linalg_solver_tpu.models.spectral import (
            spectral_pipeline,
            spectral_pipeline_sharded,
        )

        mesh = make_mesh(dp=4, tp=2)
        A = diagonalizable_batch(
            jax.random.PRNGKey(0), 8, [4.0, 1.0, 1.0, -2.0],
            transform="orthogonal",
        )
        rep_s = spectral_pipeline_sharded(A, mesh, tol=1e-2)
        rep_r = spectral_pipeline(A, tol=1e-2)
        assert np.asarray(rep_s.diagonalizable).all()
        np.testing.assert_allclose(
            np.asarray(rep_s.eig_real), np.asarray(rep_r.eig_real),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(rep_s.alg_mult), np.asarray(rep_r.alg_mult)
        )
        np.testing.assert_array_equal(
            np.asarray(rep_s.geom_mult), np.asarray(rep_r.geom_mult)
        )
        rec = (
            np.asarray(rep_s.P, np.float64)
            @ np.asarray(rep_s.D, np.float64)
            @ np.asarray(rep_s.P_inv, np.float64)
        )
        assert np.abs(rec - np.asarray(A, np.float64)).max() < 1e-3

    def test_indivisible_batch_raises(self):
        from linalg_solver_tpu.models.spectral import (
            spectral_pipeline_sharded,
        )

        mesh = make_mesh(dp=4, tp=2)
        A = jnp.zeros((6, 3, 3))
        with pytest.raises(ValueError, match="not divisible"):
            spectral_pipeline_sharded(A, mesh)


@pytest.mark.slow
class TestSpectralFuzz:
    """Randomized differential test: spectral reports vs a float64 numpy
    oracle on random diagonalizable batches (random spectra with repeats,
    well-conditioned random similarity)."""

    def test_random_spectra_vs_numpy(self):
        from linalg_solver_tpu.models.spectral import spectral_pipeline

        rng = np.random.RandomState(11)
        for trial in range(3):
            n = int(rng.randint(6, 14))
            B = 4
            pool = rng.choice([-3.0, -1.0, 0.5, 2.0, 4.0], size=3,
                              replace=False)
            vals = rng.choice(pool, size=(B, n)).astype(np.float64)
            P = np.eye(n) + 0.25 * rng.randn(B, n, n)
            A = (
                np.linalg.inv(P)
                @ np.stack([np.diag(v) for v in vals])
                @ P
            ).astype(np.float32)
            rep = spectral_pipeline(jnp.asarray(A), tol=5e-2)
            assert np.asarray(rep.diagonalizable).all(), trial
            for b in range(B):
                got = np.sort(np.asarray(rep.eig_real[b]))
                want = np.sort(
                    np.linalg.eigvals(A[b].astype(np.float64)).real
                )
                np.testing.assert_allclose(got, want, atol=5e-2)
                # multiplicities must match the prescription
                w_sorted = np.sort(vals[b])
                uniq, counts = np.unique(w_sorted, return_counts=True)
                alg = np.asarray(rep.alg_mult[b])
                lam = np.asarray(rep.eig_real[b])
                for u, c in zip(uniq, counts):
                    sel = np.abs(lam - u) < 5e-2
                    assert sel.sum() == c, (trial, b, u, c, lam)
                    assert (alg[sel] == c).all(), (trial, b, u, alg)
            rec = (
                np.asarray(rep.P, np.float64)
                @ np.asarray(rep.D, np.float64)
                @ np.asarray(rep.P_inv, np.float64)
            )
            rel = np.abs(rec - A).max() / np.abs(A).max()
            assert rel < 1e-2, (trial, rel)


class TestSpectralEigMethod:
    """method="eig": O(n³) eigenvectors via Schur vectors + strevc."""

    def test_distinct_spectrum(self):
        rng = np.random.RandomState(5)
        B, n = 3, 24
        lam_true = np.stack(
            [rng.permutation(np.linspace(-5, 5, n)) for _ in range(B)]
        ).astype(np.float32)
        P = np.eye(n) + 0.3 * rng.randn(B, n, n)
        A = (
            np.linalg.inv(P)
            @ np.stack([np.diag(v) for v in lam_true]) @ P
        ).astype(np.float32)
        rep = spectral_pipeline(jnp.asarray(A), method="eig", tol=1e-2)
        assert np.asarray(rep.diagonalizable).all()
        np.testing.assert_allclose(
            np.sort(np.asarray(rep.eig_real), axis=1),
            np.sort(lam_true, axis=1), atol=1e-3,
        )
        assert (np.asarray(rep.alg_mult) == 1).all()
        assert (np.asarray(rep.geom_mult) == 1).all()
        rec = (
            np.asarray(rep.P, np.float64)
            @ np.asarray(rep.D, np.float64)
            @ np.asarray(rep.P_inv, np.float64)
        )
        assert np.abs(rec - A).max() / np.abs(A).max() < 1e-4

    def test_normal_repeated_eigenvalues_still_work(self):
        # T is diagonal at repeated eigenvalues of a NORMAL matrix, so
        # strevc columns stay orthogonal and the result is valid.
        A = diagonalizable_batch(
            jax.random.PRNGKey(0), 2, [2.0, 2.0, 5.0, 1.0],
            transform="orthogonal",
        )
        rep = spectral_pipeline(A, method="eig", tol=1e-2)
        assert np.asarray(rep.diagonalizable).all()
        alg = np.asarray(rep.alg_mult)
        assert (np.sort(alg, axis=1) == [[1, 1, 2, 2]]).all()

    def test_defective_flagged(self):
        J = np.zeros((4, 4), np.float32)
        J[0, 0] = J[1, 1] = 2.0
        J[0, 1] = 1.0
        J[2, 2], J[3, 3] = 5.0, 1.0
        rng = np.random.RandomState(1)
        P = np.eye(4) + 0.2 * rng.randn(4, 4)
        A = (P @ J @ np.linalg.inv(P))[None].astype(np.float32)
        rep = spectral_pipeline(jnp.asarray(A), method="eig", tol=1e-2)
        assert not np.asarray(rep.diagonalizable).any()
