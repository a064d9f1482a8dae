"""Tests for the LaTeX formatting layer and the trace logger stack."""

import sympy

from linalg_solver_tpu.utils.fmt import (
    cformat,
    linear_comb,
    make_latex_augmented_matrix,
    make_latex_matrix,
    make_latex_vector,
    make_latex_vertical_augmented_matrix,
    multi_add,
    multi_mul,
    pcformat,
    pretty_print_arithmetic,
)
from linalg_solver_tpu.utils.trace import (
    Logger,
    capture_logs,
    current_logger,
    ignore_log,
    log,
    nest_appending_logger,
    nest_logger,
    pop_logger,
    push_logger,
)


class TestCformat:
    def test_int(self):
        assert cformat(5) == "5"
        assert cformat(-3) == "-3"

    def test_string_passthrough(self):
        assert cformat(r"\alpha") == r"\alpha"

    def test_sympy_rational(self):
        assert cformat(sympy.Rational(1, 2)) == r"\frac{1}{2}"

    def test_custom_protocol(self):
        class Custom:
            def cformat(self, arg_of=None):
                return f"custom[{arg_of}]"

        assert cformat(Custom(), "+") == "custom[+]"

    def test_pcformat(self):
        assert pcformat(r"%s + %s = %s", 1, 2, 3) == "1 + 2 = 3"


class TestPrettyArithmetic:
    def test_add_zero(self):
        assert pretty_print_arithmetic(3, "+", 0) == "3"
        assert pretty_print_arithmetic(0, "+", 7) == "7"

    def test_mul_identity(self):
        assert pretty_print_arithmetic(1, "*", 9) == "9"
        assert pretty_print_arithmetic(9, "*", 0) == "0"


class TestBuilders:
    def test_matrix(self):
        s = make_latex_matrix([[1, 2], [3, 4]])
        assert s.startswith(r"\begin{pmatrix}")
        assert s.endswith(r"\end{pmatrix}")
        assert "1 & 2" in s and "3 & 4" in s

    def test_vector(self):
        s = make_latex_vector([1, 2])
        assert "1" in s and "2" in s

    def test_augmented_bar_position(self):
        s = make_latex_augmented_matrix([[1, 2, 3]], bar_col=2)
        assert "cc|c" in s

    def test_augmented_default_bar(self):
        s = make_latex_augmented_matrix([[1, 2, 3]])
        assert "cc|c" in s

    def test_single_column_is_plain(self):
        s = make_latex_augmented_matrix([[1], [2]])
        assert s.startswith(r"\begin{pmatrix}")

    def test_vertical_augmented(self):
        s = make_latex_vertical_augmented_matrix("x_1 & x_2", [[1, 2]], 2)
        assert r"\hline" in s


class TestMultiOps:
    def test_multi_add_ints(self):
        assert multi_add([1, 2, 3]) == 6

    def test_multi_add_single(self):
        assert multi_add([7]) == 7

    def test_multi_mul_ints(self):
        assert multi_mul([2, 3, 4]) == 24

    def test_delegates_to_custom(self):
        class Weird:
            def multi_add(self, *others):
                return "delegated"

        assert multi_add([Weird(), 1]) == "delegated"

    def test_linear_comb(self):
        assert linear_comb([2, 3], [10, 100]) == 320


class TestTraceStack:
    def test_log_goes_to_top(self):
        with nest_logger() as lg:
            log("hello %s", 42)
        assert lg.accum == ["hello 42"]

    def test_nesting_isolates(self):
        with nest_logger() as outer:
            log("outer1")
            with nest_logger() as inner:
                log("inner")
            log("outer2")
        assert outer.accum == ["outer1", "outer2"]
        assert inner.accum == ["inner"]

    def test_appending_logger_defers(self):
        collected = []
        with nest_logger() as lg:
            log("first")
            with nest_appending_logger(collected):
                log("sub1")
                log("sub2")
            log("second")
        assert lg.accum == ["first", "second"]
        assert collected == ["sub1\nsub2"]

    def test_appending_logger_skips_empty(self):
        collected = []
        with nest_logger():
            with nest_appending_logger(collected):
                pass
        assert collected == []

    def test_ignore_log(self):
        with nest_logger() as lg:
            result = ignore_log(lambda: (log("hidden"), 99)[1])
        assert result == 99
        assert lg.accum == []

    def test_capture_logs(self):
        with nest_logger():
            text = capture_logs(lambda: log("captured %s", "x"))
        assert text == "captured x"

    def test_push_pop(self):
        before = current_logger()
        mine = Logger()
        push_logger(mine)
        assert current_logger() is mine
        assert pop_logger() is mine
        assert current_logger() is before

    def test_level_limit(self):
        lg = Logger(level_limit=1)
        lg.log("a", level=0)
        lg.log("b", level=1)
        lg.log("c", level=2)
        assert lg.accum == ["a", "b"]
