"""Dev benchmark: LU panel backend comparison on the real chip."""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.lu_blocked import (  # noqa: E402
    blocked_lu_batched, blocked_lu_solve,
)
from linalg_solver_tpu.utils.benchmarking import chained_time  # noqa: E402

B, N = 256, 256
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
flops = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)

configs = []
for arg in sys.argv[1:]:
    be, nb = arg.rsplit("/", 1)
    configs.append((be, int(nb)))
if not configs:
    configs = [("xla", 64), ("inplace", 64), ("pallas", 64), ("pallas", 128)]

for be, nb in configs:
    factor = jax.jit(
        lambda a, be=be, nb=nb: blocked_lu_batched(
            a, nb=nb, panel_backend=be
        )
    )
    both = jax.jit(
        lambda a, b, be=be, nb=nb: blocked_lu_solve(
            blocked_lu_batched(a, nb=nb, panel_backend=be), b
        )
    )
    x = both(a, b)
    resid = jnp.linalg.norm(
        jnp.einsum("bij,bj->bi", a, x) - b
    ) / jnp.linalg.norm(b)
    t_f = chained_time(factor, a, iters=10, repeats=3)
    t_fs = chained_time(both, a, b, iters=10, repeats=3)
    print(
        f"{be:>8}/nb={nb:<3} factor {t_f*1e3:7.2f} ms   "
        f"factor+solve {t_fs*1e3:7.2f} ms   "
        f"{flops/t_fs/1e9:7.1f} GFLOP/s   resid {float(resid):.2e}",
        flush=True,
    )
