"""Command-line driver: runs the six showcase workloads and writes the
accumulated LaTeX derivation to ``output.tex`` (compilable inside
``docs/res.tex``).

Sections mirror the reference driver (/root/reference/main.py:39-127):
determinant of a sparse 6x6, inverse of a regular 3x3, a linear system,
eigenvalues of a diagonalizable 3x3, diagonalization, and the kernel of a
rank-deficient 3x4 — all over exact sympy Rationals with a fixed seed.

A ``--device`` mode additionally runs the batched TPU numeric pipeline and
replays its device-recorded pivot events into the same document.
"""

from __future__ import annotations

import argparse
import random

import sympy

from .exact.matrix import Matrix, NoSolution
from .exact.random_matrix import (
    RandomMatrixBuilder,
    gen_diagonalizable_matrix,
    gen_matrix_with_rank,
    gen_regular_matrix,
)
from .utils.fmt import cformat
from .utils.trace import global_logger, log, raw_log


def rationalize_matrix(mat: Matrix) -> Matrix:
    """Copy of ``mat`` with numeric entries converted to sympy Rationals so
    elimination stays exact."""
    return mat.self_map(
        lambda x: sympy.Rational(x) if isinstance(x, (int, float)) else x
    )


def rationalize_vector(vec):
    return [
        sympy.Rational(x) if isinstance(x, (int, float)) else x for x in vec
    ]


def random_sparse_matrix(n: int, sparsity: float) -> Matrix:
    def sparse_dist():
        if random.random() > sparsity:
            return random.randint(-5, 5)
        return 0

    return (
        RandomMatrixBuilder.new()
        .with_dist(sparse_dist)
        .with_size(n, n)
        .build()
    )


def determinant_section() -> None:
    log(r"\section{Determinant}")
    A = rationalize_matrix(random_sparse_matrix(6, 0.45))
    log(r"Vstupní matice $A$: $%s$ \\", A)
    det_val = A.determinant(log_permutation_details=True)
    log(r"\textbf{Determinant:} $%s$", det_val)


def inverse_section() -> None:
    log(r"\section{Inverze}")
    A = rationalize_matrix(gen_regular_matrix(3))
    log(r"Vstupní matice $A$: $%s$", A)
    inv = A.inverse(log_matrices=True, log_steps=True, log_result=True)
    log(r"\textbf{Inverzní matice:} $%s$", inv)


def linear_system_section() -> None:
    log(r"\section{Lineární soustava}")
    A = rationalize_matrix(gen_regular_matrix(3))
    b = rationalize_vector([random.randint(-5, 5) for _ in range(3)])
    log(r"Lineární soustava $A\,x=b$ s $A=%s$", A)
    sol = A.find_preimage_of(
        b, log_matrices=True, log_steps=True, log_result=True
    )
    log(r"\textbf{Množina řešení:} $%s$", sol)


def eigenvalues_section() -> None:
    log(r"\section{Vlastní čísla}")
    A = rationalize_matrix(
        gen_diagonalizable_matrix(3, eigenvalues=[(-3, 1), (0, 1), (4, 1)])
    )
    log(r"Vstupní matice $A$: $%s$", A)
    eigs = A.eigenvalues()
    summary = ", ".join(
        "%s^{%d}" % (cformat(e), m) for e, m in eigs.items()
    )
    log(r"\textbf{Vlastní čísla:} $%s$", summary)


def diagonalization_section() -> None:
    log(r"\section{Diagonalizace}")
    A = rationalize_matrix(
        gen_diagonalizable_matrix(3, eigenvalues=[(5, 1), (2, 1), (-5, 1)])
    )
    log(r"Vstupní matice $A$: $%s$", A)
    log(r"%s", A.diagonalize())


def kernel_section() -> None:
    log(r"\section{Kernel}")
    A = rationalize_matrix(gen_matrix_with_rank(3, 4, rank=2))
    log(r"Vstupní matice $A$: $%s$ \\", A)
    ker = A.find_preimage_of(
        [0] * 3, log_matrices=True, log_steps=True, log_result=True
    )
    log(r"\textbf{Báze jádra:}    $%s$", ker)


def device_section(seed: int = 2026) -> None:
    """Run the TPU numeric pipeline on a small batch and replay its
    device-recorded elimination events into the document."""
    try:
        from .trace.events import replay_solve_trace
    except ImportError as exc:
        raise SystemExit(
            "--device requires the TPU numeric path "
            f"(linalg_solver_tpu.trace.events): {exc}"
        )

    log(r"\section{Dávkový TPU řešič}")
    replay_solve_trace()
    _device_spectral_subsection(seed)


def _device_spectral_subsection(seed: int) -> None:
    """Batched spectral report (eigenvalues, multiplicities,
    diagonalizability) for a generated device batch, summarized as a
    LaTeX table — the device-scale counterpart of the eigenvalue and
    diagonalization sections (reference main.py:78-94)."""
    import jax
    import numpy as np

    from .models.spectral import spectral_pipeline
    from .ops.generate import diagonalizable_batch

    log(r"\subsection*{Spektrální rozklad dávky}")
    eigs = [4.0, 1.0, 1.0, -2.0]
    batch = diagonalizable_batch(
        jax.random.PRNGKey(seed), 4, eigs, transform="orthogonal"
    )
    rep = spectral_pipeline(batch, tol=1e-2)
    lam = np.asarray(rep.eig_real)
    alg = np.asarray(rep.alg_mult)
    geom = np.asarray(rep.geom_mult)
    ok = np.asarray(rep.diagonalizable)
    raw_log(r"\begin{tabular}{c|c|c|c|c}")
    raw_log(
        r"matice & $\lambda$ & alg.~n\'asobnost & geom.~n\'asobnost"
        r" & diagonalizovateln\'a \\ \hline"
    )
    for b in range(lam.shape[0]):
        # distinct eigenvalues in descending order
        firsts = np.concatenate(
            [[True], np.abs(np.diff(lam[b])) > 1e-2]
        )
        lam_s = ", ".join(f"{v:.4g}" for v in lam[b][firsts])
        alg_s = ", ".join(str(int(v)) for v in alg[b][firsts])
        geom_s = ", ".join(str(int(v)) for v in geom[b][firsts])
        flag = r"ano" if bool(ok[b]) else r"ne"
        raw_log(
            f"$A_{{{b + 1}}}$ & ${lam_s}$ & {alg_s} & {geom_s}"
            f" & {flag} \\\\"
        )
    raw_log(r"\end{tabular}")
    raw_log("")


SECTIONS = [
    determinant_section,
    inverse_section,
    linear_system_section,
    eigenvalues_section,
    diagonalization_section,
    kernel_section,
]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        prog="linalg-solver-tpu",
        description="Exact linear algebra with LaTeX derivations "
        "(TPU-native numeric path included).",
    )
    parser.add_argument(
        "-o", "--output", default="output.tex",
        help="output .tex path (default: output.tex)",
    )
    parser.add_argument(
        "--seed", type=int, default=2026, help="PRNG seed (default: 2026)"
    )
    parser.add_argument(
        "--device", action="store_true",
        help="also run the batched device pipeline section",
    )
    parser.add_argument(
        "--quiet", action="store_true",
        help="do not echo log lines to stdout",
    )
    args = parser.parse_args(argv)

    if args.quiet:
        global_logger.auto_print = False

    random.seed(args.seed)
    for section in SECTIONS:
        section()
    if args.device:
        device_section(args.seed)

    with open(args.output, "w", encoding="utf-8") as f:
        f.write("\n".join(global_logger.accum))


if __name__ == "__main__":
    main()
