"""backend="auto" routing contract (VERDICT r2 weak-2 / next-1).

The default path must route every user to the measured-best backend
(same-process chip sweep, examples/bench_r3_routing.py):

- tiny N (GJ tile fits VMEM)         -> "pallas" (batch-in-lanes GJ)
- solve  8 <= N < 256                -> "mixed"  (bf16+IR, rescued)
- solve  256 <= N < 1024             -> "rbt"    (gated + rescued)
- solve  N >= 1024, N % 128 == 0     -> "mixed"  (lu_large inside)
- solve  N >= 1024 otherwise         -> "xla"
- inverse above the GJ tile, N<1024  -> "rbt"
- inverse N >= 1024                  -> "xla"

On hosts without the TPU backend the Pallas branch is unavailable and
auto falls back to blocked/loop — these tests simulate availability.
"""

import pytest

from linalg_solver_tpu.ops import dispatch


class _FakePallas:
    """Simulates the TPU pallas module: GJ kernel supports only the
    small-N tiles (inverse up to 64, solve up to 128 for these
    shapes)."""

    @staticmethod
    def supports(op, n):
        if n is None:
            return True
        return {"inverse": n <= 64, "solve": n <= 64,
                "det": n <= 64, "rank": n <= 256}.get(op, False)


@pytest.fixture()
def tpu_routing(monkeypatch):
    monkeypatch.setattr(dispatch, "_pallas_available", lambda: True)
    import linalg_solver_tpu.ops.pallas as pallas_mod

    monkeypatch.setattr(pallas_mod, "supports", _FakePallas.supports)
    yield


class TestAutoRouting:
    def test_solve_routes(self, tpu_routing):
        r = lambda n: dispatch._resolve("auto", "solve", n)
        assert r(64) == "pallas"          # GJ tile
        assert r(128) == "mixed"          # below the RBT crossover
        assert r(160) == "mixed"
        assert r(192) == "mixed"   # measured tie; mixed is proven >=
        assert r(256) == "rbt"            # the headline bench shape
        assert r(512) == "rbt"
        assert r(1024) == "mixed"         # -> lu_large inside
        assert r(2048) == "mixed"
        assert r(1088) == "xla"           # >=1024, not 128-divisible

    def test_inverse_routes(self, tpu_routing):
        r = lambda n: dispatch._resolve("auto", "inverse", n)
        assert r(64) == "pallas"          # GJ kernel dominates
        assert r(128) == "rbt"
        assert r(256) == "rbt"
        assert r(512) == "rbt"
        assert r(1024) == "xla"

    def test_awkward_sizes_fall_back(self, tpu_routing):
        # no RBT panel width divides 250; blocked needs N % nb == 0
        assert dispatch._resolve("auto", "solve", 250) == "loop"
        # tiny N: the GJ kernel covers it on TPU
        assert dispatch._resolve("auto", "solve", 7) == "pallas"

    def test_explicit_backends_pass_through(self, tpu_routing):
        for be in ("rbt", "mixed", "xla", "blocked", "loop"):
            assert dispatch._resolve(be, "solve", 256) == be

    def test_cpu_fallback_unchanged(self, monkeypatch):
        monkeypatch.setattr(dispatch, "_pallas_available", lambda: False)
        assert dispatch._resolve("auto", "solve", 256) == "blocked"
        assert dispatch._resolve("auto", "solve", 7) == "loop"


class TestAutoExecutes:
    """auto must EXECUTE correctly on this (CPU) host for the shapes
    the routing table touches — the routing decision may differ on
    TPU, but the dispatch surface must be total."""

    @pytest.mark.parametrize("n", [8, 16, 64])
    def test_auto_solve_small(self, n):
        import numpy as np
        import jax.numpy as jnp

        rng = np.random.RandomState(n)
        a = rng.randn(2, n, n).astype(np.float32) + 3.0 * np.sqrt(
            n
        ) * np.eye(n, dtype=np.float32)
        b = rng.randn(2, n).astype(np.float32)
        x = np.asarray(dispatch.solve_batched(jnp.asarray(a),
                                              jnp.asarray(b)))
        r = np.linalg.norm(
            np.einsum("bij,bj->bi", a, x) - b
        ) / np.linalg.norm(b)
        assert r < 1e-4
