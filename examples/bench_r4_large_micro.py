"""Round-4: decompose large_solve_mixed at B=8, N=2048 (VERDICT r3
item 5 — attack the worst MFU shape).

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r4_large_micro.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
import jax.scipy.linalg as jsl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops import lu_large
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N, nb = 8, 2048, 128
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
FL = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)


def run(name, f, *args):
    sec = device_slope_time(f, *args)
    print(f"{name:46s} {sec*1e3:8.3f} ms", flush=True)
    return sec


# e2e
sec = device_slope_time(
    jax.jit(functools.partial(lu_large.large_solve_mixed, nb=nb)), a, b
)
print(f"{'e2e large_solve_mixed nb=128':46s} {sec*1e3:8.3f} ms "
      f"= {FL/sec/1e9:.0f} GF/s", flush=True)


# panel getrf cost: all 16 panel shapes, summed in one jit
@jax.jit
def f_getrfs(a):
    tot = jnp.zeros((), jnp.float32)
    for k in range(N // nb):
        M = N - k * nb
        lu, _, perm = lax.linalg.lu(a[:, :M, k * nb:(k + 1) * nb])
        tot += jnp.sum(lu) + jnp.sum(perm)
    return tot


run("16 panel getrf [8, M, 128] (indep shapes)", f_getrfs, a)


# trailing GEMMs alone (bf16): the phase-k update shapes
@jax.jit
def f_gemms(a):
    tot = jnp.zeros((), jnp.float32)
    for k in range(N // nb - 1):
        M = N - (k + 1) * nb
        x = a[:, :M, :nb].astype(jnp.bfloat16)
        y = a[:, :nb, :M].astype(jnp.bfloat16)
        tot += jnp.sum(jnp.einsum(
            "bij,bjk->bik", x, y,
            preferred_element_type=jnp.float32))
    return tot


run("15 trailing GEMMs bf16 [8,M,128]x[8,128,M]", f_gemms, a)


# triangular solves for U12
@jax.jit
def f_tris(a):
    tot = jnp.zeros((), jnp.float32)
    L = jnp.tril(a[:, :nb, :nb], -1) + jnp.eye(nb)
    for k in range(N // nb - 1):
        M = N - (k + 1) * nb
        U12 = jsl.solve_triangular(
            L, a[:, :nb, :M], lower=True, unit_diagonal=True
        )
        tot += jnp.sum(U12)
    return tot


run("15 U12 triangular solves [8,128,M]", f_tris, a)


# row gathers
@jax.jit
def f_gathers(a):
    tot = jnp.zeros((), jnp.float32)
    perm = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
    for k in range(N // nb - 1):
        M = N - k * nb
        g = jnp.take_along_axis(
            a[:, :M, :M], perm[:, :M, None], axis=1
        )
        tot += jnp.sum(g)
    return tot


run("15 trailing row gathers", f_gathers, a)

# pure GEMM roofline at this operand scale
for dt, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32-1pass")):
    x = a.astype(dt)

    @jax.jit
    def f_mm(x):
        return jnp.einsum(
            "bij,bjk->bik", x, x,
            preferred_element_type=jnp.float32)

    sec = device_slope_time(f_mm, x)
    print(f"{'batched GEMM [8,2048,2048] ' + tag:46s} {sec*1e3:8.3f} ms"
          f" = {2*B*float(N)**3/sec/1e12:.1f} TF/s", flush=True)
