"""Round-5 (VERDICT r4 item 5b): re-attack N=448 streamed-residual.

Round 4's attempt (CK=32: trail 102.8 MB + 7.3 MB chunk + vectors
~= 111 MB) failed remote compile under the ~120 MB probed ceiling —
Mosaic's per-kernel accounting leaves less headroom than one flat
scratch.  This retries with a smaller column chunk (CK=16 -> 3.7 MB,
CK=8 -> 1.8 MB) by monkeypatching the module constant (one-shot
experiment; production wiring only if a variant compiles AND wins).

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r5_stream448.py [CK]
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.pallas import solve_fused_kernel as sfk
from linalg_solver_tpu.utils.benchmarking import device_slope_time

CK = int(sys.argv[1]) if len(sys.argv) > 1 else 16
sfk._STREAM_CK = CK
sfk._VMEM_BUDGET_STREAM = 112 * 2**20

B, N = 128, 448
k_a, k_b = jax.random.split(jax.random.PRNGKey(0))
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b = jax.random.normal(k_b, (B, N), jnp.float32)
FL = B * (2.0 / 3.0 * N**3 + 2.0 * N**2)

if __name__ == "__main__":
    assert sfk.supported_streamed(N, 16), "budget math changed?"
    f = jax.jit(functools.partial(
        sfk.solve_fused_rbt, nb=16, ir_steps=2, force_stream=True,
        unroll=2,
    ))
    print(f"compiling streamed N={N} CK={CK} ...", flush=True)
    x, bad = f(a, b)
    r = np.linalg.norm(
        np.einsum("bij,bj->bi", np.asarray(a, np.float64),
                  np.asarray(x, np.float64)) - np.asarray(b, np.float64),
        axis=1,
    ) / np.linalg.norm(np.asarray(b, np.float64), axis=1)
    sec = device_slope_time(lambda a_, b_: f(a_, b_)[0], a, b)
    print(
        f"streamed N={N} CK={CK} nb=16 u=2: {sec*1e3:7.3f} ms = "
        f"{FL/sec/1e9:6.0f} GF/s  resid={r.max():.1e} "
        f"bad={int(np.asarray(bad).sum())}",
        flush=True,
    )
