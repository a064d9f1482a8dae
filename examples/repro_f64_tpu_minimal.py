"""Minimal pure-JAX probe for the TPU emulated-f64 iteration drift.

Applies ``iters`` data-dependent Givens rotations to an accumulator Q
starting from the identity (the skeleton of every dense eigensolver's
bulge chase).  Q stays EXACTLY orthogonal in real arithmetic, so
``max|QᵀQ − I|`` measures only the arithmetic/lowering error:

- true float64 keeps it at ~iters·2⁻⁵² (CPU shows this),
- float32 keeps it at ~iters·2⁻²³ (the TPU f32 control shows this),
- a correct f64 EMULATION should track the CPU; drift far beyond
  iters·2⁻⁵² on the TPU in f64 is the emulated-lowering defect that
  forces ops/schur.py to refuse f64 on TPU.
"""

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax import lax


def drift(platform: str, dtype, n: int = 64, iters: int = 4096):
    dev = jax.devices(platform)[0]

    @jax.jit
    def run(m0):
        q0 = jnp.eye(n, dtype=dtype)

        def body(carry, k):
            m, q = carry
            i = k % (n - 1)
            z = jnp.zeros((), k.dtype)
            row = lax.dynamic_slice(m, (i, z), (2, 1))
            a, b = row[0, 0], row[1, 0]
            r = jnp.sqrt(a * a + b * b)
            safe = r > 0
            c = jnp.where(safe, a / jnp.where(safe, r, 1.0), 1.0)
            s = jnp.where(safe, b / jnp.where(safe, r, 1.0), 0.0)
            mi = lax.dynamic_slice(m, (i, z), (2, n))
            qi = lax.dynamic_slice(q, (i, z), (2, n))
            g = jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])
            m = lax.dynamic_update_slice(m, g @ mi, (i, z))
            q = lax.dynamic_update_slice(q, g @ qi, (i, z))
            return (m, q), ()

        (m, q), _ = lax.scan(
            body, (m0, q0), jnp.arange(iters, dtype=jnp.int32)
        )
        return q

    m0 = jax.device_put(
        jnp.asarray(np.random.RandomState(0).randn(n, n), dtype), dev
    )
    with jax.default_device(dev):
        q = np.asarray(run(m0), np.float64)
    return float(np.abs(q.T @ q - np.eye(n)).max())


if __name__ == "__main__":
    accel = jax.default_backend()
    for platform, dtype, label in (
        ("cpu", jnp.float64, "cpu f64 (truth)"),
        (accel, jnp.float32, "tpu f32 (control)"),
        (accel, jnp.float64, "tpu f64 (emulated)"),
    ):
        try:
            d = drift(platform, dtype)
        except Exception as e:  # pragma: no cover
            print(f"{label}: failed ({type(e).__name__}: {e})")
            continue
        print(f"{label}: max |QtQ - I| after 4096 rotations = {d:.3e}")
