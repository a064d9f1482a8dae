"""Round-3 micro-bench: isolate the post-factor building blocks of the
RBT solve at B=256, N=256, nb=64 to find where the non-kernel
milliseconds actually go (the staged ablation can only attribute
cumulative deltas; XLA DCE moves work between stages).

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_micro.py
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.lu_blocked import (
    invert_unit_lower,
    invert_upper,
)
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N, nb = 256, 256, 64
m = N // nb
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (B, N, N), jnp.float32)
low = jnp.tril(a, -1) + jnp.eye(N, dtype=jnp.float32)
up = jnp.triu(a) + 10.0 * jnp.eye(N, dtype=jnp.float32)
stk = jax.random.normal(key, (B * m, nb, nb), jnp.float32) \
    + 10.0 * jnp.eye(nb, dtype=jnp.float32)


def run(name, f, *args):
    sec = device_slope_time(f, *args)
    print(f"{name:44s} {sec*1e3:7.3f} ms", flush=True)


@jax.jit
def f_lower(x):
    with jax.default_matmul_precision("bfloat16"):
        return invert_unit_lower(x)[:, 0]


@jax.jit
def f_upper(x):
    with jax.default_matmul_precision("bfloat16"):
        return invert_upper(x)[:, 0]


@jax.jit
def f_stacked_upper(x):
    with jax.default_matmul_precision("bfloat16"):
        return invert_upper(jnp.triu(x))[:, 0]


@jax.jit
def f_big_gemm_bf16(x, y):
    with jax.default_matmul_precision("bfloat16"):
        return (x @ y)[:, 0]


@jax.jit
def f_big_gemm_f32(x, y):
    with jax.default_matmul_precision("float32"):
        return (x @ y)[:, 0]


@jax.jit
def f_gemv(x, v):
    with jax.default_matmul_precision("bfloat16"):
        return (x @ v)[:, :, 0]


@jax.jit
def f_assemble(x):
    # the concatenate tree of _phases_full_inverse: m column blocks
    # then m row blocks
    cols = []
    for i in range(m):
        p = x[:, i * nb:, i * nb:(i + 1) * nb]
        if i:
            p = jnp.concatenate(
                [jnp.zeros((B, i * nb, nb), x.dtype), p], axis=1
            )
        cols.append(p)
    F = jnp.concatenate(cols, axis=2)
    return F[:, 0]


run("invert_unit_lower [256,256,256]", f_lower, low)
run("invert_upper      [256,256,256]", f_upper, up)
run("invert_upper stacked [1024,64,64]", f_stacked_upper, stk)
run("bf16 GEMM [256,256,256]^2", f_big_gemm_bf16, a, a)
run("f32  GEMM [256,256,256]^2", f_big_gemm_f32, a, a)
run("bf16 GEMV [256,256,256]@[256,256,1]", f_gemv, a,
    jax.random.normal(key, (B, N, 1), jnp.float32))
run("assembly concats", f_assemble, a)
