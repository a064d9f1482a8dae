"""End-to-end driver test: the six showcase sections run to completion with
a fixed seed and produce a structurally sane LaTeX document (the de-facto
golden/integration test, mirroring the reference's seeded main driver)."""

import pytest

from linalg_solver_tpu.cli import main
from linalg_solver_tpu.utils.trace import global_logger


@pytest.fixture(autouse=True)
def _reset_global_logger():
    saved = list(global_logger.accum)
    saved_print = global_logger.auto_print
    global_logger.accum.clear()
    yield
    global_logger.accum[:] = saved
    global_logger.auto_print = saved_print


def test_cli_emits_document(tmp_path):
    out = tmp_path / "output.tex"
    main(["-o", str(out), "--seed", "2026", "--quiet"])
    text = out.read_text(encoding="utf-8")

    for section in [
        r"\section{Determinant}",
        r"\section{Inverze}",
        r"\section{Lineární soustava}",
        r"\section{Vlastní čísla}",
        r"\section{Diagonalizace}",
        r"\section{Kernel}",
    ]:
        assert section in text

    # Structural sanity: balanced environments.
    for env in ("pmatrix", "align*", "aligned", "array", "itemize"):
        assert text.count(r"\begin{%s}" % env) == text.count(
            r"\end{%s}" % env
        ), f"unbalanced {env} environment"
    assert text.count("$$") % 2 == 0

    assert r"\textbf{Determinant:}" in text
    assert r"\textbf{Inverzní matice:}" in text
    assert r"Optimální strategie" in text


def test_cli_deterministic(tmp_path):
    out1 = tmp_path / "a.tex"
    main(["-o", str(out1), "--seed", "7", "--quiet"])
    first = out1.read_text(encoding="utf-8")
    global_logger.accum.clear()
    out2 = tmp_path / "b.tex"
    main(["-o", str(out2), "--seed", "7", "--quiet"])
    assert first == out2.read_text(encoding="utf-8")


def test_cli_device_section(tmp_path):
    out = tmp_path / "dev.tex"
    global_logger.accum.clear()
    main(["-o", str(out), "--seed", "2026", "--device", "--quiet"])
    text = out.read_text(encoding="utf-8")
    assert r"\section{Dávkový TPU řešič}" in text
    assert r"\subsection*{Spektrální rozklad dávky}" in text
    # one summary row per batch element, all diagonalizable on this seed
    assert text.count("& ano") == 4
    assert text.count(r"\begin{tabular}") == text.count(r"\end{tabular}")
