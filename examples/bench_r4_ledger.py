"""Round-4 roofline-anchored MFU ledger (VERDICT r3 item 5).

For each headline shape: the MEASURED batched-GEMM rate for the same
operand shape (the MXU roofline an ideal all-GEMM formulation could
target), the measured HBM stream rate (the memory roofline), our
path's e2e rate, and the achieved VPU element-FMA rate for the
lanes-layout kernels (their binding resource).

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r4_ledger.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.utils.benchmarking import device_slope_time


# NOTE: device_slope_time's dependency chain consumes ONE element of
# the output — any computation XLA can prove unnecessary for that
# element gets dead-code-eliminated (an earlier probe "measured" a
# 1852 TF/s f32 GEMM this way).  Roofline probes therefore SUM the
# output into the dependency scalar and subtract the separately
# measured reduction cost.


def gemm_roofline(B, N):
    x = jax.random.normal(
        jax.random.PRNGKey(0), (B, N, N), jnp.bfloat16
    )

    @jax.jit
    def f(x):
        y = jnp.einsum("bij,bjk->bik", x, x,
                       preferred_element_type=jnp.float32)
        return jnp.sum(y)

    @jax.jit
    def f0(x):
        return jnp.sum(x.astype(jnp.float32))

    sec = max(device_slope_time(f, x) - device_slope_time(f0, x),
              1e-9)
    return 2 * B * float(N) ** 3 / sec / 1e12, sec


def hbm_stream():
    x = jax.random.normal(jax.random.PRNGKey(0), (256, 1024, 1024),
                          jnp.float32)  # 1 GiB

    @jax.jit
    def f(x):
        return jnp.sum(x * 1.000001)

    sec = device_slope_time(f, x)
    return x.size * 4 / sec / 1e9  # GB/s, read stream


print(f"HBM stream (1 GiB elementwise, r+w): "
      f"{hbm_stream():.0f} GB/s", flush=True)

shapes = [(256, 256), (1024, 64), (16, 1024), (8, 2048)]
for B, N in shapes:
    tf, sec = gemm_roofline(B, N)
    print(f"GEMM roofline [B={B:4d}, N={N:4d}] bf16: {tf:6.1f} TF/s "
          f"({sec*1e3:.3f} ms)", flush=True)

# our paths, e2e (the driver-canonical configurations)
from linalg_solver_tpu.ops import dispatch
from linalg_solver_tpu.ops.pallas import inverse_batched as pinv_b

for B, N in ((256, 256), (16, 1024), (8, 2048)):
    k_a, k_b = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
        4.0 * N**0.5
    ) * jnp.eye(N, dtype=jnp.float32)
    b = jax.random.normal(k_b, (B, N), jnp.float32)
    f = jax.jit(functools.partial(dispatch.solve_batched, backend="auto"))
    np.asarray(f(a, b))
    sec = device_slope_time(f, a, b)
    fl = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)
    # solve kernel's VPU element-FMA count (lanes layout): N^3/3 per
    # matrix (+10% masked) — meaningful for the fused kernel shape only
    fma = B * N**3 / 3 * 1.1
    print(f"solve auto [B={B:4d}, N={N:4d}]: {sec*1e3:7.3f} ms = "
          f"{fl/sec/1e9:6.0f} GF/s  (elem-FMA rate if VPU-bound: "
          f"{fma/sec/1e12:.2f} T/s)", flush=True)

B, N = 1024, 64
a = jax.random.normal(jax.random.PRNGKey(3), (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
f = jax.jit(pinv_b)
np.asarray(f(a))
sec = device_slope_time(f, a)
fma = B * (N + 1) * N * N  # span-GJ work per matrix
print(f"inverse    [B={B:4d}, N={N:4d}]: {sec*1e3:7.3f} ms = "
      f"{B/sec/1e6:.2f} M mat/s  (elem-FMA rate: {fma/sec/1e12:.2f} "
      f"T/s)", flush=True)
