"""Cross-path differential tests: the exact host path and the device
numeric path must agree on solution-space structure (consistency, dim),
rank, determinant sign/value, and spectra — the framework's two-paths-one-
semantics contract."""

import random

import numpy as np
import pytest
import sympy

import jax.numpy as jnp

from linalg_solver_tpu.exact.matrix import AffineSubspace, Matrix, NoSolution
from linalg_solver_tpu.ops.solve import solve_batched

pytestmark = pytest.mark.usefixtures("quiet_trace")


def rand_int_items(m, n, rng, density=0.8):
    return [
        [
            rng.randint(-4, 4) if rng.random() < density else 0
            for _ in range(n)
        ]
        for _ in range(m)
    ]


class TestSolveStructureAgreement:
    def test_consistency_and_dim(self):
        rng = random.Random(31)
        exact_mats, vecs = [], []
        for _ in range(12):
            items = rand_int_items(3, 4, rng)
            b = [rng.randint(-4, 4) for _ in range(3)]
            exact_mats.append(items)
            vecs.append(b)

        device = solve_batched(
            jnp.asarray(np.array(exact_mats, np.float32)),
            jnp.asarray(np.array(vecs, np.float32)),
            tol=1e-4,
        )
        for i, (items, b) in enumerate(zip(exact_mats, vecs)):
            m = Matrix([[sympy.Rational(x) for x in row] for row in items])
            exact = m.find_preimage_of([sympy.Rational(x) for x in b])
            if isinstance(exact, NoSolution):
                assert not bool(device.is_consistent[i]), i
            else:
                assert bool(device.is_consistent[i]), i
                assert int(device.dim[i]) == exact.dim(), i

    def test_rank_and_det_agreement(self):
        from linalg_solver_tpu.ops.exact_int import bareiss_batched
        from linalg_solver_tpu.ops.solve import rank_batched

        rng = random.Random(32)
        mats = [rand_int_items(4, 4, rng, density=0.6) for _ in range(10)]
        arr = jnp.asarray(np.array(mats, np.float32))
        ranks = rank_batched(arr)
        bare = bareiss_batched(arr.astype(jnp.int32))
        for i, items in enumerate(mats):
            sm = sympy.Matrix(items)
            assert int(ranks[i]) == sm.rank(), i
            assert int(bare.rank[i]) == sm.rank(), i
            if bool(bare.ok[i]):
                assert int(bare.det[i]) == int(sm.det()), i

    def test_eigen_agreement_integer_diagonalizable(self):
        from linalg_solver_tpu.ops.eigen import eigvals_qr
        from linalg_solver_tpu.exact.random_matrix import (
            gen_diagonalizable_matrix,
        )

        for _ in range(3):
            spec = sorted(random.sample(range(-4, 5), 3))
            A = gen_diagonalizable_matrix(
                3, eigenvalues=[(e, 1) for e in spec]
            )
            exact = Matrix(
                [[sympy.Rational(x) for x in row] for row in A.items]
            ).eigenvalues()
            dev = eigvals_qr(
                jnp.asarray(np.array(A.items, np.float32)), iters=200
            )
            got = sorted(float(v) for v in np.asarray(dev.real))
            want = sorted(float(e) for e in exact)
            np.testing.assert_allclose(got, want, atol=1e-2)


class TestTraceReplayFuzz:
    def test_replay_matches_exact_path_randomized(self, quiet_trace):
        """Device event streams must replay to the exact path's snapshots
        for arbitrary integer systems (many seeds, with forced zeros)."""
        import jax.numpy as jnp

        from linalg_solver_tpu.ops.rref import rref
        from linalg_solver_tpu.trace.events import replay_rref_events

        rng = random.Random(77)
        for trial in range(10):
            m, n = 4, 5
            A = [
                [
                    rng.randint(-3, 3) if rng.random() < 0.7 else 0
                    for _ in range(n)
                ]
                for _ in range(m)
            ]
            exact = Matrix(
                [[sympy.Rational(x) for x in row] for row in A]
            )
            exact_reduced, _, exact_snaps, exact_steps = exact.row_reduce(
                bar_col=n - 1
            )
            res = rref(
                jnp.asarray(np.array(A, np.float32)), bar_col=n - 1,
                tol=1e-4, pivot_rule="first",
            )
            replay_reduced, snaps, steps = replay_rref_events(
                A, np.asarray(res.events), int(res.num_events),
                bar_col=n - 1,
            )
            assert snaps == exact_snaps, f"trial {trial}"
            assert [
                [sympy.Rational(x) for x in row] for row in exact_reduced
            ] == replay_reduced, f"trial {trial}"


class TestDeterminantFuzz:
    def test_planned_determinant_fuzz(self, quiet_trace):
        """Wider fuzz of the (native-engine) planner + executor against
        sympy — guards the remap/coordinate algebra."""
        rng = random.Random(99)
        for trial in range(15):
            n = rng.randint(4, 6)
            density = rng.choice([0.35, 0.5, 0.65])
            items = [
                [
                    sympy.Rational(rng.randint(-4, 4))
                    if rng.random() < density else sympy.Rational(0)
                    for _ in range(n)
                ]
                for _ in range(n)
            ]
            m = Matrix(items)
            assert m.determinant() == sympy.Matrix(items).det(), (
                f"trial {trial}: {items}"
            )
