"""Checkpoint/resume for long-running device workloads.

The reference persists nothing but its output document (SURVEY.md §5);
this framework adds two durable artifacts:

- **Training state** (the preconditioner ``TrainState``, or any pytree of
  arrays) via Orbax — sharding-aware, resumable across processes.
- **Computation plans** (planner ``Process`` trees) via
  ``planner.serialize`` — a plan computed once (potentially expensive
  exhaustive search) can be stored and re-executed on new values.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays with Orbax (falls back to npz when Orbax is
    unavailable)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
    except ImportError:
        import numpy as np

        leaves, treedef = jax.tree_util.tree_flatten(tree)
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "arrays.npz"),
            *[np.asarray(leaf) for leaf in leaves],
        )
        with open(os.path.join(path, "treedef.json"), "w") as f:
            json.dump({"structure": str(treedef)}, f)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved with ``save_pytree`` (``like`` provides the
    structure/shapes/dtypes)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=like)
    except ImportError:
        import numpy as np

        leaves, treedef = jax.tree_util.tree_flatten(like)
        data = np.load(os.path.join(path, "arrays.npz"))
        restored = [data[k] for k in data.files]
        return jax.tree_util.tree_unflatten(treedef, restored)


def save_plan(path: str, cost, process) -> None:
    """Persist a planned determinant strategy (see planner.serialize)."""
    from ..planner.serialize import dumps_plan

    with open(path, "w", encoding="utf-8") as f:
        f.write(dumps_plan(cost, process))


def load_plan(path: str):
    from ..planner.serialize import loads_plan

    with open(path, encoding="utf-8") as f:
        return loads_plan(f.read())
