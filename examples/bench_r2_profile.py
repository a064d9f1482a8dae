"""Round-2 headline-bench decomposition: where do the 5.6 ms go?

Slope-times the mixed-path solve and its components at the bench shape
(B=256, N=256, nb=64) on the real chip, to drive the VERDICT r1
perf push (attack the ~2.1 ms of layout copies + fusions).
"""

import functools
import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import lu_blocked as lub
from linalg_solver_tpu.ops import dispatch
from linalg_solver_tpu.ops.pallas.lu_panel_kernel import panel_factor_masked
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N, NB = 256, 256, 64
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
b3 = b[:, :, None]

FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)

results = {}


def t(name, fn, *args, **kw):
    sec = device_slope_time(fn, *args, **kw)
    results[name] = sec * 1e3
    print(f"{name:46s} {sec * 1e3:8.3f} ms   "
          f"{FLOPS / sec / 1e9:8.1f} GFLOP/s-equiv")
    return sec


# 1. the full headline path
t("mixed solve (bench headline)",
  jax.jit(lambda a, b: dispatch.solve_batched(a, b, backend="mixed")),
  a, b)

# 2. XLA baseline
t("jnp.linalg.solve",
  jax.jit(lambda a, b: jnp.linalg.solve(a, b[..., None])[..., 0]), a, b)

# 3. phases WITH rhs + u11 inverses (factor + forward subst + inverses)
@jax.jit
def phases_full(a, b3):
    with jax.default_matmul_precision("bfloat16"):
        ph = lub._pallas_lu_phases(a, NB, False, rhs=b3)
    return ph.panels[-1], ph.ys[-1], ph.u11s_inv[-1]

t("phases (factor+fwd+u11inv)", phases_full, a, b3)

# 4. phases WITHOUT u11 inverses
@jax.jit
def phases_nou11(a, b3):
    with jax.default_matmul_precision("bfloat16"):
        ph = lub._pallas_lu_phases(a, NB, False, need_u11_inv=False,
                                   rhs=b3)
    return ph.panels[-1], ph.ys[-1]

t("phases (no u11 inverses)", phases_nou11, a, b3)

# 5. phases without rhs (pure factor artifacts)
@jax.jit
def phases_norhs(a):
    with jax.default_matmul_precision("bfloat16"):
        ph = lub._pallas_lu_phases(a, NB, False, need_u11_inv=False)
    return ph.panels[-1], ph.u11_diags[-1]

t("phases (no rhs, no u11inv)", phases_norhs, a)

# 6. panel kernel alone (phase-0 shape), ×1
@jax.jit
def panel_only(a):
    panel = a[:, :, :NB]
    pivoted = jnp.zeros((B, N), jnp.int32)
    pu, _, pr, pv, ok = panel_factor_masked(panel, pivoted, NB,
                                            interpret=False)
    return pu, pr

t("panel kernel (phase 0, x1)", panel_only, a)

# 7. full mixed path minus fallback (isolate the fallback residual cost)
t("mixed solve fallback=False",
  jax.jit(functools.partial(lub.pallas_solve_mixed_batched, nb=NB,
                            fallback=False)), a, b)

# 8. mixed with ir_steps=1
t("mixed solve ir_steps=1 (fallback on)",
  jax.jit(functools.partial(lub.pallas_solve_mixed_batched, nb=NB,
                            ir_steps=1)), a, b)

# 9. all-f32 fused path
t("f32 fused pallas_solve",
  jax.jit(functools.partial(lub.pallas_solve_batched, nb=NB)), a, b)

print(json.dumps(results))
