"""Probe usable VMEM: compile+run a kernel with increasing scratch."""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def try_size(mb):
    n_rows = mb * 1024 * 1024 // (128 * 4)

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        scratch[n_rows - 1, :] = x_ref[0, :] * 2.0
        o_ref[0, :] = scratch[0, :] + scratch[n_rows - 1, :]

    x = jnp.ones((1, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_rows, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=256 * 1024 * 1024
        ),
    )(x)
    return float(out[0, 0])


for mb in (16, 32, 48, 64, 80, 96, 110, 120, 128):
    try:
        v = try_size(mb)
        print(f"{mb} MB scratch: OK (val={v})", flush=True)
    except Exception as e:
        print(f"{mb} MB scratch: FAIL — {str(e)[:200]}", flush=True)
        break
