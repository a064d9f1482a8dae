"""Ablation study of the phase loop + solve side at the bench shape.

Local modified copies of the phase loop isolate each cost center:
panel kernels, one-hot row selects, trailing GEMM, l11 inverse chains,
forward-substitution riding, backward pass, IR rounds.
"""

import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import lu_blocked as lub
from linalg_solver_tpu.ops.lu_blocked import (
    _take_rows_mxu, invert_unit_lower,
)
from linalg_solver_tpu.ops.pallas.lu_panel_kernel import panel_factor_masked
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N, NB = 256, 256, 64
M = N // NB
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
b3 = b[:, :, None]

FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
results = {}


def t(name, fn, *args):
    sec = device_slope_time(fn, *args)
    results[name] = round(sec * 1e3, 3)
    print(f"{name:52s} {sec * 1e3:8.3f} ms")
    return sec


def phase_loop(a, *, kernels=True, selects=True, trailing=True,
               l11inv=True):
    """Configurable copy of the factor phase loop (no rhs, no u11inv)."""
    trail = a
    dtype = trail.dtype
    eye_nb = jnp.eye(NB, dtype=dtype)
    pivoted = jnp.zeros((B, N), jnp.int32)
    outs = []
    with jax.default_matmul_precision("bfloat16"):
        for k0 in range(0, N, NB):
            panel = trail[:, :, :NB]
            trail = trail[:, :, NB:]
            if kernels:
                panel_u, _, piv_row, pivoted, _ = panel_factor_masked(
                    panel, pivoted, NB, interpret=False
                )
                piv_row = piv_row.astype(jnp.int32)
            else:
                panel_u = panel * 1.0001
                piv_row = jnp.broadcast_to(
                    jnp.arange(k0, k0 + NB, dtype=jnp.int32)[None],
                    (B, NB),
                )
                pivoted = pivoted + 0
            if selects:
                L11U11 = _take_rows_mxu(panel_u, piv_row)
            else:
                L11U11 = panel_u[:, k0:k0 + NB, :]
            if l11inv:
                l11i = invert_unit_lower(
                    jnp.tril(L11U11, -1) + eye_nb
                )
            else:
                l11i = L11U11
            outs.append(panel_u)
            last = k0 + NB >= N
            if not last and trailing:
                unpiv = (pivoted == 0).astype(dtype)
                L21m = panel_u * unpiv[:, :, None]
                if selects:
                    A12 = _take_rows_mxu(trail, piv_row)
                else:
                    A12 = trail[:, k0:k0 + NB, :]
                U12 = l11i @ A12
                trail = trail - L21m @ U12
    return outs[-1], trail if not trailing else outs[0]


t("loop: full (kern+sel+trail+l11i)",
  jax.jit(lambda a: phase_loop(a)), a)
t("loop: no selects (slices instead)",
  jax.jit(lambda a: phase_loop(a, selects=False)), a)
t("loop: no trailing update",
  jax.jit(lambda a: phase_loop(a, trailing=False)), a)
t("loop: no l11 inverse chain",
  jax.jit(lambda a: phase_loop(a, l11inv=False)), a)
t("loop: kernels only (no sel/trail/l11i)",
  jax.jit(lambda a: phase_loop(a, selects=False, trailing=False,
                               l11inv=False)), a)
t("loop: everything but kernels",
  jax.jit(lambda a: phase_loop(a, kernels=False)), a)

# reference points
t("one 64MB elementwise pass (a*1.01)",
  jax.jit(lambda a: a * 1.01), a)


@jax.jit
def three_gemms(a):
    # the trailing updates' GEMM shapes, unmasked
    with jax.default_matmul_precision("bfloat16"):
        x = a[:, :, :NB]
        o = []
        for W in (192, 128, 64):
            o.append(x @ a[:, :64, N - W:])
    return o[0], o[1], o[2]

t("3 trailing-shape GEMMs alone", three_gemms, a)

# solve side: backward pass + IR, on precomputed phases
@jax.jit
def full_solve(a, b):
    return lub.pallas_solve_mixed_batched(a, b, nb=NB)

t("mixed solve (reference)", full_solve, a, b)

@jax.jit
def factor_only(a, b3):
    with jax.default_matmul_precision("bfloat16"):
        ph = lub._pallas_lu_phases(a, NB, False, rhs=b3)
    return ph.panels[-1], ph.ys[-1], ph.u11s_inv[-1]

t("phases(rhs+u11inv) [solve-side = ref minus this]",
  factor_only, a, b3)

print(json.dumps(results))
