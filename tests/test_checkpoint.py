"""Plan serialization and checkpoint/resume tests."""

import random

import numpy as np
import pytest
import sympy

import jax.numpy as jnp

from linalg_solver_tpu.planner import (
    SparsityPattern,
    find_optimal_process,
)
from linalg_solver_tpu.planner.serialize import dumps_plan, loads_plan
from linalg_solver_tpu.utils.checkpoint import (
    load_plan,
    load_pytree,
    save_plan,
    save_pytree,
)


class TestPlanSerialization:
    def test_roundtrip_executes(self, quiet_trace):
        from linalg_solver_tpu.exact.determinant_exec import execute_process
        from linalg_solver_tpu.exact.matrix import Matrix

        rng = random.Random(0)
        for _ in range(8):
            n = rng.randint(2, 5)
            items = [
                [
                    sympy.Rational(rng.randint(-4, 4))
                    if rng.random() < 0.6 else sympy.Rational(0)
                    for _ in range(n)
                ]
                for _ in range(n)
            ]
            pattern = SparsityPattern.from_bools(
                [[x != 0 for x in row] for row in items]
            )
            cost, process = find_optimal_process(pattern)
            text = dumps_plan(cost, process)
            cost2, process2 = loads_plan(text)
            assert cost2.total == cost.total
            m = Matrix(items)
            assert execute_process(m, process2) == sympy.Matrix(items).det()

    def test_plan_file_roundtrip(self, tmp_path, quiet_trace):
        pattern = SparsityPattern.from_bools(
            [[True, True, False], [False, True, True], [True, False, True]]
        )
        cost, process = find_optimal_process(pattern)
        path = tmp_path / "plan.json"
        save_plan(str(path), cost, process)
        cost2, process2 = load_plan(str(path))
        assert cost2 == cost
        assert set(process2.expected_nonzeros.entries()) == set(
            process.expected_nonzeros.entries()
        )


class TestPytreeCheckpoint:
    def test_train_state_roundtrip(self, tmp_path):
        from linalg_solver_tpu.models.solver import init_train_state

        state = init_train_state(8)
        state = state._replace(
            params=state.params + 0.25, step=jnp.int32(17)
        )
        path = tmp_path / "ckpt"
        save_pytree(str(path), state)
        restored = load_pytree(str(path), init_train_state(8))
        np.testing.assert_allclose(restored.params, state.params)
        assert int(restored.step) == 17
