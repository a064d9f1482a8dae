"""Sparse univariate polynomials over an arbitrary coefficient ring.

Used as the scalar domain for characteristic polynomials: the matrix
``A - lambda*I`` has ``Polynomial`` entries and runs through the full
determinant machinery (including the planner's fraction-free AddRow path).

Capability parity with /root/reference/linalg_solver/polynomial.py:6-162.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import sympy

from ..utils.fmt import cformat


def _numerically_zero(expr: Any, scale: "Polynomial", digits: int = 40) -> bool:
    """High-precision numeric check that a (possibly Poly-wrapped) sympy
    remainder vanishes, relative to the polynomial's coefficient scale."""
    try:
        if isinstance(expr, sympy.Poly):
            coeffs = expr.all_coeffs()
        else:
            coeffs = [expr]
        ref = max(
            (abs(complex(sympy.N(c, digits))) for c in scale.powers.values()),
            default=1.0,
        )
        ref = max(ref, 1.0)
        return all(
            abs(complex(sympy.N(c, digits))) < 10.0 ** (-digits // 2) * ref
            for c in coeffs
        )
    except Exception:
        return False


class Polynomial:
    """``{exponent: coefficient}`` plus a display variable name."""

    __slots__ = ("powers", "var")

    def __init__(self, powers: Dict[int, Any], var: str = "x"):
        self.powers = {e: c for e, c in powers.items() if c != 0}
        self.var = var

    # -- equality / hashing ----------------------------------------------
    def __eq__(self, other: Any) -> bool:
        if isinstance(other, (int, float)) and other == 0:
            return not self.powers
        if isinstance(other, Polynomial):
            return self.var == other.var and self.powers == other.powers
        return NotImplemented

    def __hash__(self) -> int:
        return hash((self.var, tuple(sorted(self.powers.items()))))

    # -- ring arithmetic --------------------------------------------------
    def multi_add(self, *others: Any) -> "Polynomial":
        acc = dict(self.powers)
        for other in others:
            if not isinstance(other, Polynomial):
                other = Polynomial({0: other})
            elif other.var != self.var:
                raise TypeError(
                    f"Cannot add Polynomials with different variables: "
                    f"'{self.var}' and '{other.var}'"
                )
            for exp, coef in other.powers.items():
                acc[exp] = acc.get(exp, 0) + coef
        return Polynomial(acc, self.var)

    def __add__(self, other: Any) -> "Polynomial":
        return self.multi_add(other)

    __radd__ = __add__

    def __neg__(self) -> "Polynomial":
        return Polynomial({e: -c for e, c in self.powers.items()}, self.var)

    def __sub__(self, other: Any) -> "Polynomial":
        return self + (-other)

    def __rsub__(self, other: Any) -> "Polynomial":
        return (-self) + other

    def __mul__(self, other: Any) -> "Polynomial":
        if not isinstance(other, Polynomial):
            return Polynomial(
                {e: c * other for e, c in self.powers.items()}, self.var
            )
        if other.var != self.var:
            raise TypeError(
                f"Cannot multiply Polynomials with different variables: "
                f"'{self.var}' and '{other.var}'"
            )
        acc: Dict[int, Any] = {}
        for e1, c1 in self.powers.items():
            for e2, c2 in other.powers.items():
                acc[e1 + e2] = acc.get(e1 + e2, 0) + c1 * c2
        return Polynomial(acc, self.var)

    __rmul__ = __mul__

    # -- degree / evaluation ---------------------------------------------
    def degree(self) -> int:
        return max(self.powers.keys(), default=0)

    def __call__(self, x: Any) -> Any:
        acc = 0
        for e, c in self.powers.items():
            acc = acc + c * x**e
        return acc

    # -- sympy bridge -----------------------------------------------------
    def to_sympy(self) -> Any:
        x = sympy.symbols(self.var)
        expr = sympy.Integer(0)
        for e, c in self.powers.items():
            expr = expr + c * x**e
        return expr

    def _to_sympy_poly(self) -> sympy.Poly:
        x = sympy.symbols(self.var)
        deg = max(self.powers.keys(), default=-1)
        coeffs = [self.powers.get(i, 0) for i in range(deg, -1, -1)]
        if not coeffs:
            coeffs = [0]
        return sympy.Poly(coeffs, x)

    @staticmethod
    def from_sympy_poly(sympy_p: sympy.Poly, var: str) -> "Polynomial":
        d = sympy_p.as_dict()
        return Polynomial({mon[0]: c for mon, c in d.items() if c != 0}, var)

    # -- root manipulation ------------------------------------------------
    def remove_root(self, root: Any) -> "Polynomial":
        """Exact division by ``(x - root)``; raises if the remainder is nonzero.

        Roots in complicated radical form (e.g. cubic formulas) can defeat
        sympy's symbolic zero-proving even when exact; the remainder is then
        verified numerically at high precision before rejecting.
        """
        if not self.powers:
            return Polynomial({}, self.var)
        x = sympy.symbols(self.var)
        p = self._to_sympy_poly()
        quotient, remainder = sympy.div(p, sympy.Poly(x - root, x))
        rem = sympy.simplify(remainder)
        if not rem.is_zero and not _numerically_zero(rem, scale=self):
            raise ValueError(
                f"{root} is not a root of the polynomial, division resulted "
                f"in remainder {remainder}"
            )
        return Polynomial.from_sympy_poly(quotient, self.var)

    def factor_roots(
        self, roots: List[Tuple[Any, int]]
    ) -> Dict["Polynomial", int]:
        """Factor out ``(x - r)^mult`` for each known root, returning
        ``{linear_factor: multiplicity}`` plus any nontrivial residual."""
        residual = self
        for root, mult in roots:
            for _ in range(mult):
                residual = residual.remove_root(root)
        factors = {
            Polynomial({0: -root, 1: 1}, self.var): mult for root, mult in roots
        }
        if len(residual.powers) == 1 and residual.powers.get(0, 1) == 1:
            return factors
        return {residual: 1} | factors

    def radical_roots(self) -> Dict[Any, int]:
        """All roots expressible in radicals, via sympy: {root: multiplicity}."""
        return sympy.roots(self._to_sympy_poly(), multiple=False)

    # -- rendering --------------------------------------------------------
    def cformat(self, arg_of: str = None) -> str:
        parts = ""
        for exp, coef in sorted(self.powers.items(), key=lambda kv: -kv[0]):
            if coef == 0:
                continue
            if cformat(coef).startswith("-"):
                parts += "-"
                coef = -coef
            elif parts:
                parts += "+"
            coef_str = "" if (coef == 1 and exp != 0) else cformat(coef)
            if exp == 0:
                parts += coef_str
            else:
                pow_str = "" if exp == 1 else r"^{%s}" % exp
                parts += r"%s{%s}%s" % (coef_str, self.var, pow_str)
        if not parts:
            parts = "0"
        if arg_of is None or arg_of == "+":
            return parts
        # A monomial needs no parentheses unless it is negated under "*".
        if len(self.powers) <= 1 and not (parts.startswith("-") and arg_of == "*"):
            return parts
        return "(%s)" % parts

    def __repr__(self) -> str:
        return f"Polynomial({self.powers!r}, var={self.var!r})"

    def __str__(self) -> str:
        return self.cformat()
