"""RBT solve: (1) end-to-end with the new nested re-draw fallback,
(2) component ablation of the no-fallback pipeline — butterflies,
phase loop, backward, refinement — to find the glue costs."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import rbt
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


def run(name, f, check=True):
    x = np.asarray(f(a, b), np.float64)
    if check and x.shape == (B, N):
        r = np.max(np.linalg.norm(
            np.einsum("bij,bj->bi", np.asarray(a, np.float64), x)
            - np.asarray(b, np.float64), axis=1
        ) / np.linalg.norm(np.asarray(b, np.float64), axis=1))
    else:
        r = float("nan")
    sec = device_slope_time(f, a, b)
    print(f"{name:28s} {sec*1e3:7.3f} ms  {FLOPS/sec/1e9:7.1f} GFLOP/s"
          f"  resid {r:.2e}", flush=True)


# --- end-to-end with the production fallbacks -------------------------
for fb, ir in (("redraw", 2), ("redraw", 1), ("pivoted", 2), (False, 2)):
    run(f"e2e fb={fb} ir={ir}",
        jax.jit(functools.partial(
            rbt.pallas_solve_rbt_batched, nb=nb, ir_steps=ir,
            fallback=fb, lookahead=8)))

# --- component ablation (each stage consumed to a [B, N] output) ------
diags_u = rbt_diags(jax.random.PRNGKey(17), N, 2, jnp.float32)
diags_v = rbt_diags(jax.random.PRNGKey(29), N, 2, jnp.float32)


@jax.jit
def stage_butterfly(a, b):
    with jax.default_matmul_precision("bfloat16"):
        a_p = butterfly_apply(a, diags_u, trans=True)
        a_p = jnp.swapaxes(
            butterfly_apply(jnp.swapaxes(a_p, 1, 2), diags_v, True),
            1, 2,
        )
    return a_p[:, :, 0] + b


@jax.jit
def stage_phases(a, b):
    with jax.default_matmul_precision("bfloat16"):
        a_p = butterfly_apply(a, diags_u, trans=True)
        a_p = jnp.swapaxes(
            butterfly_apply(jnp.swapaxes(a_p, 1, 2), diags_v, True),
            1, 2,
        )
        b_p = butterfly_apply(b[:, :, None], diags_u, trans=True)
        ph = _nopivot_lu_phases(a_p, nb, False, rhs=b_p, lookahead=8)
    return ph.ys[-1][:, :, 0] * jnp.ones((B, N))


@jax.jit
def stage_backward(a, b):
    with jax.default_matmul_precision("bfloat16"):
        a_p = butterfly_apply(a, diags_u, trans=True)
        a_p = jnp.swapaxes(
            butterfly_apply(jnp.swapaxes(a_p, 1, 2), diags_v, True),
            1, 2,
        )
        b_p = butterfly_apply(b[:, :, None], diags_u, trans=True)
        ph = _nopivot_lu_phases(a_p, nb, False, rhs=b_p, lookahead=8)
        y = _nopivot_backward(ph, ph.ys, N // nb, nb)
        x = butterfly_apply(y, diags_v, trans=False)
    return x[:, :, 0]


run("stage: butterflies(A)", stage_butterfly, check=False)
run("stage: +phase loop", stage_phases, check=False)
run("stage: +backward (ir=0)", stage_backward, check=False)
