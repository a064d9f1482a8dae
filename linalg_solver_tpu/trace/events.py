"""Host-side replay of device-recorded elimination events into LaTeX.

The device kernels (``ops.rref``) record compact ``(code, arg1, arg2)``
events — row swaps, pivot normalizations, eliminations.  This module
replays that event stream against the *original host-side matrix* using
exact arithmetic, regenerating the same step-by-step derivation the exact
path produces (identical S/N/E labels, ``\\StepSim`` chains, and snapshot
layout), so composed device computations still read as human derivations.

This is the TPU build's realization of the reference's "Logger as tracing
system" (SURVEY.md §5): the device computes, the host narrates.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import sympy

from ..ops.rref import EV_ELIM_ABOVE, EV_ELIM_BELOW, EV_NORM, EV_SWAP
from ..exact import elimination
from ..utils.fmt import make_latex_augmented_matrix
from ..utils.trace import log


def _to_exact(items: Sequence[Sequence[Any]]) -> List[List[Any]]:
    out = []
    for row in items:
        exact_row = []
        for x in row:
            if isinstance(x, (int, np.integer)):
                exact_row.append(sympy.Integer(int(x)))
            elif isinstance(x, (float, np.floating)):
                f = float(x)
                exact_row.append(
                    sympy.Integer(int(f)) if f.is_integer()
                    else sympy.Rational(f)
                )
            else:
                exact_row.append(x)
        out.append(exact_row)
    return out


def replay_rref_events(
    host_items: Sequence[Sequence[Any]],
    events: np.ndarray,
    num_events: int,
    bar_col: Optional[int] = None,
) -> Tuple[List[List[Any]], List[str], List[Tuple[str, str]]]:
    """Re-derive the elimination on the host by applying the device event
    stream to an exact copy of the input.

    Returns ``(reduced_items, snapshot_latex_list, steps)`` in the same
    format as the exact path's ``row_reduce``.
    """
    A = _to_exact(host_items)
    n = len(A[0])
    if bar_col is None:
        bar_col = n - 1

    snapshots = [make_latex_augmented_matrix(A, bar_col=bar_col)]
    steps: List[Tuple[str, str]] = []

    def snapshot(prefix: str, description: str) -> None:
        snapshots.append(make_latex_augmented_matrix(A, bar_col=bar_col))
        steps.append((f"{prefix}{len(steps)}", description))

    for idx in range(int(num_events)):
        code, x, y = (int(v) for v in events[idx])
        if code == EV_SWAP:
            r, i = x, y
            A[r], A[i] = A[i], A[r]
            snapshot(
                "S", r"Výměna řádků $R_{%d}$ a $R_{%d}$" % (r + 1, i + 1)
            )
        elif code == EV_NORM:
            r, j = x, y
            factor = A[r][j]
            A[r] = [v / factor for v in A[r]]
            snapshot("N", r"Normalizace pivotního řádku %s" % (r + 1))
        elif code == EV_ELIM_BELOW:
            j, r = x, y
            for k in range(r + 1, len(A)):
                f = A[k][j]
                if f != 0:
                    A[k] = [a - f * b for a, b in zip(A[k], A[r])]
            snapshot(
                "E", r"Eliminace prvků pod pivotem ve sloupci %s" % (j + 1)
            )
        elif code == EV_ELIM_ABOVE:
            j, r = x, y
            for k in range(r):
                f = A[k][j]
                if f != 0:
                    A[k] = [a - f * b for a, b in zip(A[k], A[r])]
            snapshot("E", r"Eliminace nad pivotem ve sloupci %s" % (j + 1))
        else:
            raise ValueError(f"Unknown event code {code}")

    return A, snapshots, steps


def log_replayed_reduction(
    host_items: Sequence[Sequence[Any]],
    events: np.ndarray,
    num_events: int,
    bar_col: Optional[int] = None,
    log_matrices: bool = True,
    log_steps: bool = True,
) -> List[List[Any]]:
    """Replay device events and emit the derivation into the active trace
    logger; returns the (exact) reduced matrix."""
    reduced, snapshots, steps = replay_rref_events(
        host_items, events, num_events, bar_col
    )
    n = len(host_items[0])
    elimination.log_row_reduction_progress(
        snapshots, steps, n, log_matrices, log_steps
    )
    return reduced


def replay_solve_trace(batch: int = 4, n: int = 3, seed: int = 0) -> None:
    """Demo used by the CLI's ``--device`` section: solve a small batch on
    device, then narrate batch element 0's derivation from its event
    stream."""
    import jax
    import jax.numpy as jnp

    from ..ops.generate import full_rank_batch, random_batch
    from ..ops.rref import rref_batched

    key = jax.random.PRNGKey(seed)
    k_a, k_b = jax.random.split(key)
    A = full_rank_batch(k_a, batch, n, lo=-5, hi=5)
    b = random_batch(k_b, batch, n, 1)[:, :, 0]
    aug = jnp.concatenate([A, b[:, :, None]], axis=2)
    res = rref_batched(aug, bar_col=n, tol=1e-5)

    log(
        r"Dávka %s soustav $A\,x=b$ řešena na TPU; derivace prvku 0 "
        r"(přehrána z událostí zaznamenaných kernelem):",
        batch,
    )
    host_aug = np.asarray(aug[0])
    reduced_exact = log_replayed_reduction(
        host_aug,
        np.asarray(res.events[0]),
        int(res.num_events[0]),
        bar_col=n,
    )
    log(
        r"Řešení prvku 0 (přesně, z přehrané derivace): "
        r"$x = \left(%s\right)$",
        ", ".join(
            sympy.latex(sympy.nsimplify(row[n])) for row in reduced_exact
        ),
    )

    # Exact integer determinants of the same batch (Bareiss, bit-exact).
    from ..ops.exact_int import bareiss_batched

    bres = bareiss_batched(jnp.round(A).astype(jnp.int32))
    log(
        r"Celočíselné determinanty dávky (Bareissova eliminace, přesně): "
        r"$%s$",
        ", ".join(str(int(d)) for d in np.asarray(bres.det)),
    )
