"""Round-3 micro-bench v2: stage-ISOLATED costs of the RBT solve's
post-factor machinery at B=256, N=256, nb=64.

v1 (bench_r3_micro.py) consumed only row 0 of each result and XLA
dead-code-eliminated most of the work (a [256,256,256] triangular
inverse "cost" 0.000 ms).  Here every result is consumed by a full
reduction, and each stage is isolated by passing the PHASE ARTIFACTS
in as concrete device arrays, so no upstream cost can leak in.

Run: PYTHONPATH=/root/.axon_site:/root/repo python examples/bench_r3_micro2.py
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linalg_solver_tpu.ops.lu_blocked import invert_upper
from linalg_solver_tpu.ops.rbt import (
    _explicit_inverse_from_phases,
    _NoPivotPhases,
    _nopivot_backward,
    _nopivot_lu_phases,
    _nopivot_solve,
    butterfly_apply,
    rbt_diags,
)
from linalg_solver_tpu.utils.benchmarking import device_slope_time

B, N, nb = 256, 256, 64
m = N // nb
key = jax.random.PRNGKey(0)
k_a, k_b = jax.random.split(key)
a = jax.random.normal(k_a, (B, N, N), jnp.float32) + (
    4.0 * N**0.5
) * jnp.eye(N, dtype=jnp.float32)
b3 = jax.random.normal(k_b, (B, N, 1), jnp.float32)

diags_u = rbt_diags(jax.random.PRNGKey(17), N, 2, jnp.float32)
diags_v = rbt_diags(jax.random.PRNGKey(29), N, 2, jnp.float32)


def run(name, f, *args):
    sec = device_slope_time(f, *args)
    print(f"{name:44s} {sec*1e3:7.3f} ms", flush=True)
    return sec


@jax.jit
def f_butterflies(a, b3):
    with jax.default_matmul_precision("bfloat16"):
        a_p = butterfly_apply(a, diags_u, trans=True)
        a_p = jnp.swapaxes(butterfly_apply(
            jnp.swapaxes(a_p, 1, 2), diags_v, True), 1, 2)
        b_p = butterfly_apply(b3, diags_u, trans=True)
    return jnp.sum(a_p, axis=(1, 2)) + jnp.sum(b_p, axis=(1, 2))


@jax.jit
def f_ap(a):
    with jax.default_matmul_precision("bfloat16"):
        a_p = butterfly_apply(a, diags_u, trans=True)
        return jnp.swapaxes(butterfly_apply(
            jnp.swapaxes(a_p, 1, 2), diags_v, True), 1, 2)


a_p = jax.block_until_ready(f_ap(a))


@jax.jit
def f_phases_all(a_p):
    """Factor + per-phase inverses, FULLY consumed."""
    with jax.default_matmul_precision("bfloat16"):
        ph = _nopivot_lu_phases(a_p, nb, False, lookahead=8)
    tot = sum(jnp.sum(p, axis=(1, 2)) for p in ph.panels)
    tot += sum(jnp.sum(u, axis=(1, 2)) for u in ph.u12s)
    tot += sum(jnp.sum(l, axis=(1, 2)) for l in ph.l11s_inv)
    tot += sum(jnp.sum(u, axis=(1, 2)) for u in ph.u11s_inv)
    return tot + ph.ok


@jax.jit
def f_phases_noinv(a_p):
    """Factor only (panels + u12s consumed; per-phase inverses only as
    far as u12s require l11i)."""
    with jax.default_matmul_precision("bfloat16"):
        ph = _nopivot_lu_phases(a_p, nb, False, lookahead=8)
    tot = sum(jnp.sum(p, axis=(1, 2)) for p in ph.panels)
    tot += sum(jnp.sum(u, axis=(1, 2)) for u in ph.u12s)
    return tot + ph.ok


# concrete artifacts for isolation
def build_artifacts():
    with jax.default_matmul_precision("bfloat16"):
        ph = _nopivot_lu_phases(a_p, nb, False, lookahead=8)
        eye = jnp.broadcast_to(
            jnp.eye(N, dtype=a_p.dtype), (B, N, N)
        )
        ph2 = _nopivot_lu_phases(
            a_p, nb, False, rhs=butterfly_apply(b3, diags_u, True),
            lookahead=8,
        )
    return (
        [jax.block_until_ready(x) for x in ph.panels],
        [jax.block_until_ready(x) for x in ph.u12s],
        [jax.block_until_ready(x) for x in ph.l11s_inv],
        [jax.block_until_ready(x) for x in ph.u11s_inv],
        [jax.block_until_ready(x) for x in ph2.ys],
    )


panels, u12s, l11is, u11is, ys = jax.jit(build_artifacts)()

# device_slope_time chains its dependency through args[0], which must
# be a single array — flatten the artifact lists into positional args.
_art = (panels, u12s, l11is, u11is)
_flat, _treedef = jax.tree_util.tree_flatten(_art)


def _unflat(flat):
    p, u, li, ui = jax.tree_util.tree_unflatten(_treedef, flat)
    return _NoPivotPhases(p, u, li, ui, None, None)


_ys_flat, _ys_tree = jax.tree_util.tree_flatten(ys)


@jax.jit
def f_backward_vec(b_unused, *flat):
    ph = _unflat(flat[:len(_flat)])
    ys_ = jax.tree_util.tree_unflatten(_ys_tree, flat[len(_flat):])
    with jax.default_matmul_precision("bfloat16"):
        y = _nopivot_backward(ph, ys_, m, nb)
    return jnp.sum(y, axis=(1, 2)) + jnp.sum(b_unused) * 0.0


@jax.jit
def f_irsolve_vec(r, *flat):
    ph = _unflat(flat)
    with jax.default_matmul_precision("bfloat16"):
        z = _nopivot_solve(ph, r, m, nb)
    return jnp.sum(z, axis=(1, 2))


@jax.jit
def f_expinv(b_unused, *flat):
    ph = _unflat(flat)
    with jax.default_matmul_precision("bfloat16"):
        inv_p = _explicit_inverse_from_phases(ph, N, nb)
    return jnp.sum(inv_p, axis=(1, 2)) + jnp.sum(b_unused) * 0.0


@jax.jit
def f_stacked_upper_full(x):
    with jax.default_matmul_precision("bfloat16"):
        return jnp.sum(invert_upper(jnp.triu(x)), axis=(1, 2))


@jax.jit
def f_gemm_full_bf16(x, y):
    with jax.default_matmul_precision("bfloat16"):
        return jnp.sum(x @ y, axis=(1, 2))


@jax.jit
def f_gemm_full_f32(x, y):
    with jax.default_matmul_precision("float32"):
        return jnp.sum(x @ y, axis=(1, 2))


stk = jax.random.normal(key, (B * m, nb, nb), jnp.float32) \
    + 10.0 * jnp.eye(nb, dtype=jnp.float32)

run("butterflies A+b (full)", f_butterflies, a, b3)
run("phases factor-only (full consume)", f_phases_noinv, a_p)
run("phases + per-phase inverses (full)", f_phases_all, a_p)
run("backward walk (isolated, vec rhs)", f_backward_vec,
    b3, *_flat, *_ys_flat)
run("IR fwd+bwd solve (isolated, vec rhs)", f_irsolve_vec,
    b3, *_flat)
run("explicit inv_p block-subst (isolated)", f_expinv,
    b3, *_flat)
run("invert_upper stacked [1024,64,64] full", f_stacked_upper_full,
    stk)
run("bf16 GEMM [256,256,256]^2 full", f_gemm_full_bf16, a, a)
run("f32  GEMM [256,256,256]^2 full", f_gemm_full_f32, a, a)
