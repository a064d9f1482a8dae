"""Batched polynomial root finding on device: companion + Schur.

The exact path finds roots symbolically (``Polynomial.radical_roots``
→ sympy, reference polynomial.py:144-151); this is the float
counterpart for BATCHES of polynomials: build companion matrices and
run the production real-Schur eigensolver — the same algorithm
``numpy.roots`` uses, but batched and on the TPU.

Coefficients are dense, highest degree first (numpy convention):
``coeffs [B, d+1]`` represents ``c₀ xᵈ + … + c_d``.  Leading zeros are
NOT supported (they change the degree per lane — trim on the host);
lanes with a zero leading coefficient are flagged ``ok=False``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RootsResult(NamedTuple):
    real: jax.Array       # [B, d]
    imag: jax.Array       # [B, d]
    converged: jax.Array  # [B] eigensolver converged
    ok: jax.Array         # [B] leading coefficient nonzero


def roots_batched(coeffs: jax.Array, **schur_kwargs) -> RootsResult:
    """All d roots of each degree-d polynomial in the batch."""
    from .schur import eigvals_schur

    B, dp1 = coeffs.shape
    d = dp1 - 1
    if d < 1:
        raise ValueError("need degree >= 1 (at least 2 coefficients)")
    f32 = jnp.result_type(coeffs.dtype, jnp.float32)
    c = coeffs.astype(f32)
    lead = c[:, 0]
    ok = jnp.abs(lead) > 0
    safe = jnp.where(ok, lead, 1.0)
    monic = c[:, 1:] / safe[:, None]              # [B, d]

    # Companion matrix: subdiagonal of ones, first row −monic.
    sub = jnp.eye(d, k=-1, dtype=f32)
    comp = jnp.broadcast_to(sub, (B, d, d))
    first_row = (jnp.arange(d)[None, :, None] == 0).astype(f32)
    comp = comp * (1 - first_row) - monic[:, None, :] * first_row

    ev = eigvals_schur(comp, **schur_kwargs)
    return RootsResult(ev.real, ev.imag, ev.converged, ok)
