"""``python -m linalg_solver_tpu`` runs the CLI driver."""

from .cli import main

main()
