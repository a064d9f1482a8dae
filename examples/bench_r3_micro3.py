"""Round-3 micro-bench v3: SCALAR-consumed, differenced decomposition
of the phase-loop glue (the 1.92 ms 'phases factor-only' found by
micro2), plus candidate replacements.

All timed fns return ONE scalar that depends on every real output, so
neither DCE nor loop-invariant hoisting can drop work (the scalar is
chained through the scan carry via args[0]).

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_micro3.py
"""

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.lu_blocked import (
    invert_unit_lower,
    invert_upper,
)
from linalg_solver_tpu.ops.pallas.lu_nopivot_kernel import (
    panel_factor_nopivot,
)
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N, nb = 256, 256, 64
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
l11 = jnp.tril(
    jax.random.normal(key, (B, nb, nb), jnp.float32), -1
) + jnp.eye(nb, dtype=jnp.float32)
u11 = jnp.triu(jax.random.normal(key, (B, nb, nb), jnp.float32)) \
    + 10.0 * jnp.eye(nb, dtype=jnp.float32)
rhs192 = jax.random.normal(key, (B, nb, 192), jnp.float32)
l21 = jax.random.normal(key, (B, 192, nb), jnp.float32)


def run(name, f, *args):
    sec = device_slope_time(f, *args)
    print(f"{name:46s} {sec*1e3:7.3f} ms", flush=True)
    return sec


@jax.jit
def f_kernel_alone(a):
    out, ok = panel_factor_nopivot(a[:, :, :nb], nb, lookahead=8)
    return jnp.sum(out) + jnp.sum(ok)


@jax.jit
def f_l11i_neumann(l11):
    with jax.default_matmul_precision("bfloat16"):
        return jnp.sum(invert_unit_lower(l11))


@jax.jit
def f_u11i_neumann(u11):
    with jax.default_matmul_precision("bfloat16"):
        return jnp.sum(invert_upper(u11))


@jax.jit
def f_u11i_stacked(u11):
    with jax.default_matmul_precision("bfloat16"):
        s = jnp.concatenate([u11, u11, u11, u11], axis=0)
        return jnp.sum(invert_upper(s))


@jax.jit
def f_trsm_left_lower(rhs192, l11):
    z = lax.linalg.triangular_solve(
        l11, rhs192, left_side=True, lower=True, unit_diagonal=True
    )
    return jnp.sum(z)


@jax.jit
def f_trsm_left_upper(rhs192, u11):
    z = lax.linalg.triangular_solve(
        u11, rhs192, left_side=True, lower=False
    )
    return jnp.sum(z)


@jax.jit
def f_u12_via_inv(rhs192, l11):
    with jax.default_matmul_precision("bfloat16"):
        return jnp.sum(invert_unit_lower(l11) @ rhs192)


@jax.jit
def f_trailing(rhs192, l21):
    with jax.default_matmul_precision("bfloat16"):
        return jnp.sum(l21 @ rhs192)


@jax.jit
def f_transpose_roundtrip(a):
    t = jnp.transpose(a[:, :, :nb], (2, 1, 0))
    return jnp.sum(jnp.transpose(t, (2, 1, 0)) * 1.0000001)


run("panel kernel [B,256,64] (scalar consume)", f_kernel_alone, a)
run("l11i Neumann [256,64,64]", f_l11i_neumann, l11)
run("u11i Neumann [256,64,64]", f_u11i_neumann, u11)
run("u11i Neumann stacked [1024,64,64]", f_u11i_stacked, u11)
run("trsm lower-unit [256,64,64]x[256,64,192]", f_trsm_left_lower,
    rhs192, l11)
run("trsm upper [256,64,64]x[256,64,192]", f_trsm_left_upper,
    rhs192, u11)
run("U12 via inv GEMM (Neumann + matmul)", f_u12_via_inv,
    rhs192, l11)
run("trailing GEMM [B,192,64]@[B,64,192] bf16", f_trailing,
    rhs192, l21)
run("transpose roundtrip [B,256,64]", f_transpose_roundtrip, a)
