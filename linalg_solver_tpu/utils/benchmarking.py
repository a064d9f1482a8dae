"""Measurement utilities for TPU workloads.

``chained_time`` is the framework's canonical timing method: each
iteration's input depends on the previous output and the chain ends in a
host readback, so asynchronous dispatch (and remote-tunnel runtimes whose
``block_until_ready`` is lenient) cannot hide execution time.  The first
chained run in a process is typically several times slower than steady
state, so the best of ``repeats`` runs is reported.

``trace`` wraps ``jax.profiler`` for on-device profiling.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def chained_time(
    fn: Callable, *args, iters: int = 15, repeats: int = 2
) -> float:
    """Average seconds per call of ``fn(*args)``, async-dispatch-proof."""
    dep = jax.jit(lambda x, s: x + 1e-12 * s)

    def leaf(out):
        return jax.tree_util.tree_leaves(out)[0]

    def run(k: int) -> float:
        out = fn(*args)
        float(leaf(out).ravel()[0])  # warm + sync
        t0 = time.perf_counter()
        chained = args[0]
        for _ in range(k):
            out = fn(chained, *args[1:])
            chained = dep(args[0], leaf(out).ravel()[0])
        float(leaf(out).ravel()[0])
        return (time.perf_counter() - t0) / k

    return min(run(iters if r else max(iters // 3, 2))
               for r in range(repeats))


def device_loop_time(
    fn: Callable, *args, iters: int = 10, repeats: int = 3
) -> float:
    """Average seconds per call of ``fn(*args)`` with the iteration loop
    running ON DEVICE (``lax.scan``), eliminating per-call host dispatch.

    Through the axon TPU tunnel, each host→device dispatch costs several
    milliseconds — comparable to the kernels being measured — so
    ``chained_time`` systematically overstates sub-10ms workloads.  The
    scan carries a scalar derived from each output and perturbs the first
    input by ``carry * 0`` (a true data dependency that XLA cannot hoist,
    with no numerical effect), so iterations execute sequentially and
    cannot be CSE'd.
    """
    import jax.numpy as jnp
    from jax import lax

    first = args[0]

    def leaf(out):
        return jax.tree_util.tree_leaves(out)[0]

    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(a[0] + carry * 0.0, *a[1:])
            dep = leaf(out).ravel()[0].astype(first.dtype)
            return dep, None

        carry, _ = lax.scan(
            body, jnp.zeros((), first.dtype), None, length=iters
        )
        return carry

    best = float("inf")
    for _ in range(repeats):
        # float() forces a host readback — block_until_ready is not
        # reliable through the tunnel runtime.
        float(loop(*args))  # warm / steady-state
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def device_slope_time(
    fn: Callable, *args, i1: int = 5, i2: int = 25, repeats: int = 3
) -> float:
    """Marginal seconds per call of ``fn(*args)``: the SLOPE between an
    ``i1``-iteration and an ``i2``-iteration on-device scan loop.

    ``device_loop_time`` still carries a fixed ~1-3 ms per-iteration
    cost on this runtime (measured: a 0.04 ms matmul times as 1.4 ms);
    differencing two loop lengths cancels it exactly, leaving pure
    device throughput.  Agrees with ``jax.profiler`` device totals to a
    few percent.
    """
    import jax.numpy as jnp
    from jax import lax

    first = args[0]

    def leaf(out):
        return jax.tree_util.tree_leaves(out)[0]

    def make(iters):
        @jax.jit
        def loop(*a):
            def body(carry, _):
                out = fn(a[0] + carry * 0.0, *a[1:])
                dep = leaf(out).ravel()[0].astype(first.dtype)
                return dep, None

            carry, _ = lax.scan(
                body, jnp.zeros((), first.dtype), None, length=iters
            )
            return carry

        return loop

    best = []
    for loop in (make(i1), make(i2)):
        bt = float("inf")
        for _ in range(repeats):
            float(loop(*args))  # warm + sync (host readback)
            t0 = time.perf_counter()
            float(loop(*args))
            bt = min(bt, time.perf_counter() - t0)
        best.append(bt)
    return max(best[1] - best[0], 1e-12) / (i2 - i1)


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block with ``jax.profiler`` (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
