from .fmt import (
    cformat,
    pcformat,
    pretty_print_arithmetic,
    make_latex_matrix,
    make_latex_vector,
    make_latex_augmented_matrix,
    make_latex_vertical_augmented_matrix,
    multi_add,
    multi_add_vargs,
    multi_mul,
    prod,
    scalar_mul,
    linear_comb,
)
from .benchmarking import chained_time, trace as profiler_trace
from .checkpoint import load_plan, load_pytree, save_plan, save_pytree
from .trace import (
    Logger,
    TraceStack,
    global_logger,
    current_logger,
    push_logger,
    pop_logger,
    log,
    raw_log,
    nest_logger,
    nest_appending_logger,
    ignore_log,
    capture_logs,
)

__all__ = [
    "cformat", "pcformat", "pretty_print_arithmetic",
    "make_latex_matrix", "make_latex_vector", "make_latex_augmented_matrix",
    "make_latex_vertical_augmented_matrix",
    "multi_add", "multi_add_vargs", "multi_mul", "prod", "scalar_mul",
    "linear_comb",
    "chained_time", "profiler_trace",
    "save_pytree", "load_pytree", "save_plan", "load_plan",
    "Logger", "TraceStack", "global_logger", "current_logger",
    "push_logger", "pop_logger", "log", "raw_log",
    "nest_logger", "nest_appending_logger", "ignore_log", "capture_logs",
]
