"""Round-3 RBT ceiling model: component-level costs of the pivot-free
solve at the bench shape (B=256, N=256, nb=64).

Stages (cumulative, each consumed to a small output):
  butterflies -> phase loop (kernels+glue) -> backward -> +2 IR rounds
Plus ISOLATED panel-kernel timings per phase shape and a width sweep
of the kernel alone to expose the per-column sequential cost.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_rbt_ablate.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops.pallas.lu_nopivot_kernel import (
    panel_factor_nopivot,
)
from linalg_solver_tpu.ops.rbt import (
    _nopivot_backward,
    _nopivot_lu_phases,
    butterfly_apply,
    rbt_diags,
)
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N, nb = 256, 256, 64
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)


def run(name, f, *args):
    sec = device_slope_time(f, *args)
    print(f"{name:34s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:7.1f} GF/s-equiv",
          flush=True)
    return sec


diags_u = rbt_diags(jax.random.PRNGKey(17), N, 2, jnp.float32)
diags_v = rbt_diags(jax.random.PRNGKey(29), N, 2, jnp.float32)


def prec(a, b):
    a_p = butterfly_apply(a, diags_u, trans=True)
    a_p = jnp.swapaxes(
        butterfly_apply(jnp.swapaxes(a_p, 1, 2), diags_v, True), 1, 2
    )
    b_p = butterfly_apply(b[:, :, None], diags_u, trans=True)
    return a_p, b_p


@jax.jit
def stage_butterfly(a, b):
    with jax.default_matmul_precision("bfloat16"):
        a_p, b_p = prec(a, b)
    return a_p[:, :, 0] + b_p[:, :, 0]


@jax.jit
def stage_phases(a, b):
    with jax.default_matmul_precision("bfloat16"):
        a_p, b_p = prec(a, b)
        ph = _nopivot_lu_phases(a_p, nb, False, rhs=b_p, lookahead=8)
    return jnp.concatenate(ph.ys, axis=1)[:, :, 0]


@jax.jit
def stage_backward(a, b):
    with jax.default_matmul_precision("bfloat16"):
        a_p, b_p = prec(a, b)
        ph = _nopivot_lu_phases(a_p, nb, False, rhs=b_p, lookahead=8)
        y = _nopivot_backward(ph, ph.ys, N // nb, nb)
        x = butterfly_apply(y, diags_v, trans=False)
    return x[:, :, 0]


t_bf = run("butterflies(A,b)", stage_butterfly, a, b)
t_ph = run("+phase loop (kernels+glue)", stage_phases, a, b)
t_bw = run("+backward+V (ir=0)", stage_backward, a, b)
t_e2e = run("e2e fb=redraw ir=2", jax.jit(functools.partial(
    rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=2,
    fallback="redraw", lookahead=8)), a, b)

# ---- isolated panel kernels, per phase shape -------------------------
tk = 0.0
for p, M in enumerate((256, 192, 128, 64)):
    panel = jax.random.normal(
        jax.random.PRNGKey(p), (B, M, nb), jnp.float32
    ) + 4.0 * 16.0 * jnp.eye(M, nb, dtype=jnp.float32)
    f = jax.jit(functools.partial(
        panel_factor_nopivot, nb=nb, lookahead=8))
    sec = device_slope_time(lambda x: f(x)[0], panel)
    tk += sec
    print(f"  kernel alone M={M:3d} nb=64        {sec*1e3:7.3f} ms",
          flush=True)
print(f"  kernels total                    {tk*1e3:7.3f} ms "
      f"({tk/64e-6/4:.2f} us/column avg)", flush=True)

# ---- width sweep at fixed M: per-column sequential cost --------------
M = 256
for w, la in ((64, 8), (32, 8), (16, 8), (8, 8), (64, 4), (64, 2)):
    panel = jax.random.normal(
        jax.random.PRNGKey(9), (B, M, w), jnp.float32
    ) + 64.0 * jnp.eye(M, w, dtype=jnp.float32)
    f = jax.jit(functools.partial(
        panel_factor_nopivot, nb=w, lookahead=la))
    sec = device_slope_time(lambda x: f(x)[0], panel)
    print(f"  kernel M=256 w={w:2d} la={la}           {sec*1e3:7.3f} ms"
          f"  ({sec/w*1e6:5.2f} us/column)", flush=True)

print(f"\nmodel: butterflies {t_bf*1e3:.2f} | phases {(t_ph-t_bf)*1e3:.2f}"
      f" (kernels {tk*1e3:.2f} glue {(t_ph-t_bf-tk)*1e3:.2f})"
      f" | backward {(t_bw-t_ph)*1e3:.2f} | ir+gate {(t_e2e-t_bw)*1e3:.2f}"
      f" | total {t_e2e*1e3:.2f} ms")
