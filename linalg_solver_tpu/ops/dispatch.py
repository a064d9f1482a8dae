"""Backend dispatch for the hot batched kernels.

Backends:

- ``"loop"``   — XLA ``fori_loop`` reference implementations (``ops.lu``,
  ``ops.solve``); always available, correctness oracle.
- ``"pallas"`` — blocked Pallas TPU kernels (``ops.pallas``); registered
  when importable on the current platform.
- ``"xla"``    — XLA's built-in ``jnp.linalg`` routines, used as the
  external performance baseline in ``bench.py``.
- ``"dd"``     — (solve only) f64-class extended-precision solve
  (``ops.dd.solve_dd_batched``: error-free Ozaki slice-GEMM residuals,
  float-float refinement); ~same cost as ``"mixed"``, 2.3e-14 residual
- ``"mixed"``  — (solve only) bf16-factored + f32 iteratively-refined
  LU (``lu_blocked.pallas_solve_mixed_batched``); opt-in, N must be
  divisible by the panel width.
- ``"auto"``   — pallas if available for the shape/dtype, else loop.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import lu as _lu
from . import lu_blocked as _lub
from .solve import inverse_batched as _gj_inverse_batched


def _best_nb(n: int, panel_backend: str = "xla") -> int:
    """Tuned panel width for the blocked path (bench notes: with the
    fused assembly-free solve the Pallas panel prefers nb=64 at N=256 on
    v5e — panel VPU work scales with nb and no longer buys cheaper
    assembly; nb=128 was ~7% slower, nb=32 ~15% slower)."""
    return min(64, n)


def _blocked_ok(n: int, panel_backend: str = "xla") -> bool:
    """The blocked path needs N divisible by its panel width."""
    nb = _best_nb(n, panel_backend)
    return n % nb == 0 and n >= 8


def _pallas_available() -> bool:
    try:
        from . import pallas  # noqa: F401

        return pallas.is_supported()
    except Exception:
        return False


#: ops served by the blocked LU with the Pallas panel kernel
_BLOCKED_PALLAS_OPS = {"lu_factor", "solve", "det", "inverse"}


#: above this size XLA's own blocked LU (big panels, big GEMMs) wins —
#: measured at N=1024: 687 GFLOP/s for jnp.linalg vs ~260 for ours
#: (the VMEM-resident panel no longer fits at full lane width).  For
#: SOLVE with N % 128 == 0 the large-N mixed path (XLA panels + bf16
#: trailing updates) beats even that: 723 vs 698 at N=1024, 1770 vs
#: 1508 at N=2048 — auto routes there.
_XLA_CROSSOVER_N = 1024

#: below this size the RBT butterfly+refinement overhead outweighs the
#: pivot-chain saving for SOLVE (same-process chip sweep, B=256:
#: N=128 mixed 375 vs rbt 239 GFLOP/s; N=192 a tie (524 vs 517);
#: N=256 rbt 670 vs 626; B=64 N=512 rbt 779 vs 544;
#: examples/bench_r3_routing.py + /tmp bench_192).
_RBT_SOLVE_MIN_N = 256


def _rbt_nb(n: int) -> Optional[int]:
    """Panel width the RBT no-pivot kernel can use for N, or None."""
    return next((w for w in (64, 48, 32, 16, 8) if n % w == 0), None)


def _resolve(backend: str, op: str, n: Optional[int] = None) -> str:
    """Pick the measured-best backend for ``backend="auto"``.

    Routing evidence (same-process A/B on the v5e chip, round-3 sweep
    `examples/bench_r3_routing.py`; see STATUS.md):

    - tiny N (one lane tile fits VMEM): the batch-in-lanes GJ kernel
      dominates everything (1.94M 64×64 inverses/s same-process).
    - solve, 256 ≤ N < 1024: ``rbt`` (gated + rescued, safe by
      construction) — 670-780 GFLOP/s vs mixed's 540-630.
    - solve, 8 ≤ N < 256: ``mixed`` (bf16-factored + f32 IR with the
      per-lane divergence rescue) — 375 vs rbt's 239 at N=128; a tie
      at N=192.
    - solve, N ≥ 1024 (N % 128 == 0): ``mixed`` routes internally to
      ``ops.lu_large.large_solve_rbt`` which beats plain XLA ~2×.
      The 1024 crossover is measured, not assumed: at N=512/768 the
      lanes path still wins (754/783 vs block elimination's 325/709
      GF/s, round-4 A/B) — XLA block inverses get expensive at B≥32.
    - inverse, N ≤ 180 (the fused RBT kernel's VMEM reach): the
      ``pallas`` facade — 0.21 ms/128 matrices at N=128 vs the phase
      path's ~1.2 ms (round-4 probe).  Above that: ``rbt`` wins at
      every measured size (31.4k vs 26.5k at 256, 3.3k vs blocked
      1.7k / xla 2.7k at 512).
    """
    if backend == "auto":
        if _pallas_available():
            from . import pallas

            if pallas.supports(op, n):
                return "pallas"
            if op == "solve" and n is not None:
                if n >= _XLA_CROSSOVER_N:
                    return "mixed" if n % 128 == 0 else "xla"
                if n >= _RBT_SOLVE_MIN_N and _rbt_nb(n):
                    return "rbt"
                if _rbt_nb(n):
                    return "mixed"
            if op == "inverse" and n is not None:
                if n >= _XLA_CROSSOVER_N:
                    return "xla"
                if _rbt_nb(n):
                    return "rbt"
            if (
                n is not None
                and n >= _XLA_CROSSOVER_N
                and op in ("solve", "det", "inverse")
            ):
                return "xla"
            if (
                op in _BLOCKED_PALLAS_OPS
                and n is not None
                and _blocked_ok(n, "pallas")
            ):
                return "blocked_pallas"
        if n is not None and _blocked_ok(n):
            return "blocked"
        return "loop"
    return backend


def lu_factor_batched(a: jax.Array, backend: str = "auto"):
    be = _resolve(backend, "lu_factor", a.shape[-1])
    if be == "pallas":
        from . import pallas

        return pallas.lu_factor_batched(a)
    if be == "blocked_pallas":
        return _lub.blocked_lu_batched(
            a, nb=_best_nb(a.shape[-1], "pallas"), panel_backend="pallas"
        )
    if be == "blocked":
        return _lub.blocked_lu_batched(a, nb=_best_nb(a.shape[-1]))
    return _lu.lu_factor_batched(a)


def solve_batched(a: jax.Array, b: jax.Array, backend: str = "auto"):
    """Batched linear solve ``A x = b`` (vector or matrix RHS on the
    ``xla`` branch; vector RHS elsewhere).

    DIFFERENTIABLE: carries a custom VJP reusing the solve itself —
    ``ȳ = A⁻ᵀ x̄`` (one extra solve of the transposed system through
    the SAME backend), ``Ā = −ȳ xᵀ``, ``b̄ = ȳ`` — so reverse-mode AD
    never unrolls the factorization loops (the Pallas/blocked/mixed/dd
    paths contain ``fori_loop``/``while_loop`` bodies that XLA cannot
    reverse-differentiate, and gradients of a refined solve are the
    gradients of the exact solve to first order)."""
    return _solve_vjp(a, b, backend)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _solve_vjp(a, b, backend):
    return _solve_impl(a, b, backend)


def _solve_fwd(a, b, backend):
    x = _solve_impl(a, b, backend)
    return x, (a, x)


def _solve_bwd(backend, res, g):
    a, x = res
    at = jnp.swapaxes(a, -1, -2)
    gy = _solve_impl(at, g, backend)
    if x.ndim == a.ndim:     # matrix RHS
        abar = -jnp.einsum(
            "...ik,...jk->...ij", gy, x,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:                    # vector RHS
        abar = -gy[..., :, None] * x[..., None, :]
    return abar.astype(a.dtype), gy.astype(x.dtype)


_solve_vjp.defvjp(_solve_fwd, _solve_bwd)


def _solve_impl(a: jax.Array, b: jax.Array, backend: str = "auto"):
    if backend == "dd":
        # f64-class backward error from bf16/f32 arithmetic (Ozaki
        # slice-GEMM dd refinement) — measured 2.3e-14 residual at the
        # SAME cost as the mixed path (11.1 vs 10.6 ms at B=N=256 on
        # chip).  Returns x collapsed to f32; callers needing the
        # trailing bits use ops.dd.solve_dd_batched directly.
        from . import dd as _dd

        r = _dd.solve_dd_batched(a, b)
        return r.x_hi + r.x_lo
    be = _resolve(backend, "solve", a.shape[-1])
    if be == "rbt":
        # Random-butterfly preconditioning + the SEARCH-FREE LU kernel
        # (no per-column pivot chain) + f32 iterative refinement, with
        # a per-lane gate rescuing failed lanes through an independent
        # re-draw and, nested inside, the pivoted path.  Fastest
        # well-conditioned batched solve measured at B=N=256 (see
        # ops/rbt.py and STATUS.md's ceiling model).
        from . import rbt as _rbt

        n = a.shape[-1]
        if _rbt_nb(n) is None:
            raise ValueError(
                f"backend='rbt' needs N divisible by a panel width "
                f"in (64, 48, 32, 16, 8); got N={n} — pad the batch "
                f"or use backend='auto'."
            )
        # nb=None: rbt picks the measured size-dependent optimum
        # (32 at N<=384, 64 above — examples/bench_r3_combo*.py and
        # the N=512 A/B in docs/HISTORY.md).
        return _rbt.pallas_solve_rbt_batched(
            a, b, interpret=not _pallas_available()
        )
    if be == "mixed":
        # bf16-factored + f32 iteratively-refined (dsgesv recipe):
        # fastest well-conditioned solve; callers needing a guarantee
        # on hard input should residual-check (models.solver).
        n = a.shape[-1]
        if n >= _XLA_CROSSOVER_N and n % 128 == 0:
            # Large-N regime: RBT block elimination — no pivot gathers,
            # no getrf column loops, UNPIVOTED recursive diagonal-block
            # inverses (pure GEMM work) + MXU trailing GEMMs, per-lane
            # gated with a pivoted large_solve_mixed rescue.  Round-5
            # chip A/B (examples/bench_r5_large_diag.py sweep):
            # B=8 N=2048 4121 GF/s at nb=256 (pivoted-diag 3015,
            # nb=128 3713, nb=512 3578); B=16 N=1024 3077 GF/s at
            # nb=128 (pivoted-diag 1181, nb=256 2943); resid 1.2e-7.
            from . import lu_large as _lul

            nb_l = 256 if n >= 2048 and n % 256 == 0 else 128
            return _lul.large_solve_rbt(a, b, nb=nb_l, ir_steps=2)
        nb = next(
            (w for w in (64, 48, 32, 16, 8) if n % w == 0), None
        )
        if nb is None:
            raise ValueError(
                f"backend='mixed' needs N divisible by a panel width "
                f"in (64, 48, 32, 16, 8); got N={n} — pad the batch "
                f"or use backend='auto'."
            )
        return _lub.pallas_solve_mixed_batched(a, b, nb=nb)
    if be == "pallas":
        from . import pallas

        return pallas.solve_batched(a, b)
    if be == "blocked_pallas":
        # Fused path: block substitution in unordered row space — skips
        # the full-matrix packed-LU assembly gather entirely.
        return _lub.pallas_solve_batched(
            a, b, nb=_best_nb(a.shape[-1], "pallas")
        )
    if be == "blocked":
        return _lub.blocked_solve_batched(a, b, nb=_best_nb(a.shape[-1]))
    if be == "xla":
        if b.ndim == a.ndim - 1:  # vector rhs: jnp.linalg.solve needs a
            return jnp.linalg.solve(a, b[..., None])[..., 0]
        return jnp.linalg.solve(a, b)
    return _lu.solve_lu_batched(a, b)


def inverse_batched(a: jax.Array, backend: str = "auto"):
    """Batched inverse.  DIFFERENTIABLE: custom VJP
    ``Ā = −Xᵀ Ḡ Xᵀ`` (two GEMMs on the saved inverse — no extra
    factorization, no loop unrolling)."""
    return _inverse_vjp(a, backend)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _inverse_vjp(a, backend):
    return _inverse_impl(a, backend)


def _inverse_fwd(a, backend):
    x = _inverse_impl(a, backend)
    return x, x


def _inverse_bwd(backend, x, g):
    hp = jax.lax.Precision.HIGHEST
    xt = jnp.swapaxes(x, -1, -2)
    abar = -jnp.einsum("...ij,...jk,...kl->...il", xt, g, xt,
                       precision=hp)
    return (abar.astype(x.dtype),)


_inverse_vjp.defvjp(_inverse_fwd, _inverse_bwd)


def _inverse_impl(a: jax.Array, backend: str = "auto"):
    if backend == "dd":
        from . import dd as _dd

        r = _dd.inverse_dd_batched(a)
        return r.x_hi + r.x_lo
    be = _resolve(backend, "inverse", a.shape[-1])
    if be == "rbt":
        from . import rbt as _rbt

        n = a.shape[-1]
        nb = next(
            (w for w in (64, 48, 32, 16, 8) if n % w == 0), None
        )
        if nb is None:
            raise ValueError(
                f"backend='rbt' needs N divisible by a panel width "
                f"in (64, 48, 32, 16, 8); got N={n}."
            )
        return _rbt.pallas_inverse_rbt_batched(
            a, nb=nb, interpret=not _pallas_available()
        )
    if be == "pallas":
        from . import pallas

        return pallas.inverse_batched(a)
    if be == "blocked_pallas":
        return _lub.blocked_inverse_batched(
            a, nb=_best_nb(a.shape[-1], "pallas"), panel_backend="pallas"
        )
    if be == "xla":
        return jnp.linalg.inv(a)
    return _gj_inverse_batched(a, tol=1e-30).inverse


def affine_solve_batched(
    a: jax.Array, b: jax.Array, backend: str = "auto", tol=None
):
    """General (possibly singular/rectangular) batched solve returning
    padded affine solution sets.  Routes to the VMEM Gauss–Jordan kernel
    when one lane tile fits (~34× the vmapped fori_loop path at
    256×(64×64)); both use partial pivoting and produce the same
    (unique) reduced row echelon form."""
    from .solve import (
        solve_affine_gj_batched,
        solve_affine_gj_supported,
        solve_batched as _loop_affine,
    )

    m, n = a.shape[-2], a.shape[-1]
    if (
        backend in ("auto", "pallas")
        and _pallas_available()
        and solve_affine_gj_supported(m, n)
    ):
        return solve_affine_gj_batched(a, b, tol=tol)
    if backend in ("auto", "blocked") and max(m, n) >= 256:
        # Large N (beyond the VMEM kernel tile): blocked rank-revealing
        # Gauss-Jordan — panel elimination + MXU trailing updates.
        from .rref_blocked import solve_affine_blocked_batched

        return solve_affine_blocked_batched(a, b, tol=tol)
    if tol is not None and getattr(tol, "ndim", 0) == 1:
        # Per-matrix tolerances: the loop path's tol is per-call scalar.
        from .solve import solve as _solve1

        return jax.vmap(
            lambda a1, b1, t: _solve1(a1, b1, tol=t, pivot_rule="partial")
        )(a, b, tol)
    return _loop_affine(a, b, tol=tol, pivot_rule="partial")


def nullspace_batched(a: jax.Array, backend: str = "auto", tol=None):
    """Batched nullspaces as affine subspaces through the origin."""
    B, m = a.shape[0], a.shape[-2]
    return affine_solve_batched(
        a, jnp.zeros((B, m), a.dtype), backend=backend, tol=tol
    )


def rank_batched(a: jax.Array, backend: str = "auto", tol=None):
    be = _resolve(backend, "rank", a.shape[-1])
    if be == "pallas":
        from . import pallas

        return pallas.rank_batched(a, tol=tol)
    if backend in ("auto", "blocked") and max(a.shape[-2:]) >= 256:
        from .rref_blocked import rank_blocked_batched

        return rank_blocked_batched(a, tol=tol)
    from .solve import rank_batched as _loop_rank

    return _loop_rank(a, tol=tol)


def det_batched(a: jax.Array, backend: str = "auto"):
    """Batched determinant.  DIFFERENTIABLE: custom VJP
    ``Ā = ḡ · det(A) · A⁻ᵀ`` (Jacobi's formula; one inverse in the
    backward pass).  Like ``jnp.linalg.det``, the gradient is only
    defined at nonsingular inputs (the adjugate is not recovered from
    a singular inverse)."""
    return _det_vjp(a, backend)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _det_vjp(a, backend):
    return _det_impl(a, backend)


def _det_fwd(a, backend):
    d = _det_impl(a, backend)
    return d, (a, d)


def _det_bwd(backend, res, g):
    a, d = res
    inv_t = jnp.swapaxes(_inverse_impl(a, backend), -1, -2)
    return ((g * d)[..., None, None] * inv_t,)


_det_vjp.defvjp(_det_fwd, _det_bwd)


def _det_impl(a: jax.Array, backend: str = "auto"):
    be = _resolve(backend, "det", a.shape[-1])
    if be == "pallas":
        from . import pallas

        return pallas.det_batched(a)
    if be == "blocked_pallas":
        return _lub.pallas_det_batched(
            a, nb=_best_nb(a.shape[-1], "pallas")
        )
    if be == "blocked":
        return _lub.blocked_det_batched(a)
    if be == "xla":
        return jnp.linalg.det(a)
    return _lu.det_lu_batched(a)
