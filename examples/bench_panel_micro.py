"""Dev micro-benchmark: panel kernel alone vs full factor pieces."""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.pallas.lu_panel_kernel import (  # noqa: E402
    panel_factor_inplace,
)
from linalg_solver_tpu.ops.lu_blocked import (  # noqa: E402
    blocked_lu_batched, blocked_lu_solve,
)
from linalg_solver_tpu.utils.benchmarking import chained_time  # noqa: E402

B, N = 256, 256
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)

which = sys.argv[1:] or ["kern64", "kern32", "full32", "solve64"]

if "kern64" in which:
    pan = a[:, :, :64]
    f = jax.jit(lambda p: panel_factor_inplace(p, 64))
    t = chained_time(f, pan, iters=10, repeats=3)
    print(f"panel kernel [256,256,64]      {t*1e3:7.2f} ms", flush=True)

if "kern32" in which:
    pan = a[:, :, :32]
    f = jax.jit(lambda p: panel_factor_inplace(p, 32))
    t = chained_time(f, pan, iters=10, repeats=3)
    print(f"panel kernel [256,256,32]      {t*1e3:7.2f} ms", flush=True)

if "full32" in which:
    f = jax.jit(
        lambda a: blocked_lu_batched(a, nb=32, panel_backend="pallas")
    )
    t = chained_time(f, a, iters=10, repeats=3)
    print(f"full factor pallas/nb=32       {t*1e3:7.2f} ms", flush=True)

if "solve64" in which:
    res = jax.jit(
        lambda a: blocked_lu_batched(a, nb=64, panel_backend="pallas")
    )(a)
    res = jax.tree_util.tree_map(jax.block_until_ready, res)
    b = jax.random.normal(key, (B, N), jnp.float32)
    f = jax.jit(lambda b, r: blocked_lu_solve(r, b))
    t = chained_time(f, b, res, iters=10, repeats=3)
    print(f"solve alone (nb=64 factors)    {t*1e3:7.2f} ms", flush=True)
