"""Device-event → LaTeX trace replay layer."""

from .events import (
    log_replayed_reduction,
    replay_rref_events,
    replay_solve_trace,
)

__all__ = [
    "replay_rref_events",
    "log_replayed_reduction",
    "replay_solve_trace",
]
