"""Round-3 floor check at the tuned point (nb=32, la=32): what's left
between 3.39 ms and the 2.90 ms (= 1 TFLOP/s-equiv) mark.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_floor.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
from linalg_solver_tpu.ops.pallas.butterfly_kernel import (
    butterfly_two_sided,
)
from linalg_solver_tpu.ops.pallas.lu_nopivot_kernel import (
    panel_factor_nopivot,
)
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N, nb, la = 256, 256, 32, 32
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
FLOPS = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
a64 = np.asarray(a, np.float64)
b64 = np.asarray(b, np.float64)

du = rbt.rbt_diags(jax.random.PRNGKey(17), N, 2, jnp.float32)
dv = rbt.rbt_diags(jax.random.PRNGKey(29), N, 2, jnp.float32)


def run(name, f, *args):
    sec = device_slope_time(f, *args)
    print(f"{name:44s} {sec*1e3:7.3f} ms", flush=True)
    return sec


@jax.jit
def f_bf(a):
    return jnp.sum(butterfly_two_sided(a, tuple(du), tuple(dv)))


@jax.jit
def f_kernels(a):
    tot = jnp.zeros((), a.dtype)
    trail = a
    for k0 in range(0, N, nb):
        out, ok = panel_factor_nopivot(
            trail[:, :, :nb], nb, lookahead=la
        )
        tot += jnp.sum(out) + jnp.sum(ok)
        trail = trail[:, nb:, nb:]
    return tot


@jax.jit
def f_phases_all(a):
    with jax.default_matmul_precision("bfloat16"):
        ph = rbt._nopivot_lu_phases(a, nb, False, lookahead=la)
    tot = sum(jnp.sum(p) for p in ph.panels)
    tot += sum(jnp.sum(u) for u in ph.u12s)
    tot += sum(jnp.sum(x) for x in ph.l11s_inv)
    tot += sum(jnp.sum(x) for x in ph.u11s_inv)
    return tot + jnp.sum(ph.ok)


run("fused butterfly A (scalar)", f_bf, a)
run("8 panel kernels only (no glue)", f_kernels, a)
run("phases + all inverses (nb=32 la=32)", f_phases_all, a)


def rune2e(name, f, *args):
    x = np.asarray(f(*args), np.float64)
    r = np.max(np.linalg.norm(
        np.einsum("bij,bj->bi", a64, x) - b64, axis=1
    ) / np.linalg.norm(b64, axis=1))
    sec = device_slope_time(f, *args)
    print(f"{name:44s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:6.1f} GF/s"
          f"  resid {r:.2e}", flush=True)


rune2e("e2e fb=redraw (prod)",
       jax.jit(functools.partial(
           rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=2,
           fallback="redraw", lookahead=la)), a, b)
rune2e("e2e fb=False",
       jax.jit(functools.partial(
           rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=2,
           fallback=False, lookahead=la)), a, b)
rune2e("e2e fb=redraw ir=1",
       jax.jit(functools.partial(
           rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=1,
           fallback="redraw", lookahead=la)), a, b)
