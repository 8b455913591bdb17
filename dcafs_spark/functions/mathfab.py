"""Infix math-expression compiler (the reference's MathFab, Spark-first).

dcafs parses formulas like ``(i1+2)/i3`` or ``i0*0.001+{r:offset}`` once
at config time into a list of step lambdas evaluated per record over
``BigDecimal[]`` (reference `src/util/math/MathFab.java:59-250`,
operand decode `src/util/math/MathUtils.java:372-601`). Here the same
grammar compiles once into a Catalyst ``Column`` expression tree, so
per-record evaluation happens inside whole-stage codegen on the JVM —
no Python in the hot path.

Grammar (superset of MathFab):
    ||  !|                 logical or / xor
    &&                     logical and
    < > <= >= == !=        comparisons
    + - ~                  add, subtract, absolute-difference
    * / %                  multiply, divide, modulo
    ^                      power (right-assoc)
    unary - !              negate / logical not
    functions: ln, log10, exp, sqrt, abs, scale(x,n)=round-half-up,
        sin/sinr (radians), sind (degrees), cos/cosr, cosd, tan, tand,
        atan2(y,x), floor, ceil
    operands: numeric literals, iN (delimited field N),
        {r:id}/{i:id}/{f:id}/{t:id} (realtime-value refs), named
        constants (<def> in the reference — MathForward.java:402-404)

Field / rtval resolution is pluggable: callers pass ``fields`` (int ->
Column) and ``rtvals`` (name -> Column) providers so the same compiler
serves MathForward (array column), filter math rules, and task checks.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""
    \s*(
        \{[a-z]+:[^}]+\}      # rtval ref {r:group_name}
      | \d+\.\d+(?:[eE][-+]?\d+)? # float (exponent sign optional)
      | \d+(?:[eE][-+]?\d+)?      # int
      | i\d+                   # field ref
      | [A-Za-z_][A-Za-z0-9_]* # name / function
      | \|\||&&|!\||<=|>=|==|!=  # two-char ops
      | [-+*/%^~<>()!,]        # single-char ops
    )""",
    re.VERBOSE,
)

FieldProvider = Callable[[int], Column]
RtvalProvider = Callable[[str, str], Column]


def _tokenize(s: str) -> list[str]:
    pos, out = 0, []
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"bad token at {s[pos:]!r} in formula {s!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


_FUNCS_1: dict[str, Callable[[Column], Column]] = {
    "ln": F.log,
    "log10": F.log10,
    "exp": F.exp,
    "sqrt": F.sqrt,
    "abs": F.abs,
    "sin": F.sin,
    "sinr": F.sin,
    "sind": lambda c: F.sin(F.radians(c)),
    "cos": F.cos,
    "cosr": F.cos,
    "cosd": lambda c: F.cos(F.radians(c)),
    "tan": F.tan,
    "tand": lambda c: F.tan(F.radians(c)),
    "floor": F.floor,
    "ceil": F.ceil,
    "radians": F.radians,
    "degrees": F.degrees,
}


@dataclass
class MathExpr:
    """A compiled formula; call .column(...) to materialize."""

    formula: str
    tokens: list[str] = field(default_factory=list)

    def column(
        self,
        fields: FieldProvider | None = None,
        rtvals: RtvalProvider | None = None,
        consts: dict[str, float] | None = None,
        cols: dict[str, Column] | None = None,
    ) -> Column:
        return _Parser(self.tokens, fields, rtvals, consts or {}, cols or {}).parse()

    @property
    def max_field(self) -> int:
        """Highest iN index referenced (reference: lazy split bound,
        MathForward.java:597-608)."""
        mx = -1
        for t in self.tokens:
            if re.fullmatch(r"i\d+", t):
                mx = max(mx, int(t[1:]))
        return mx


def compile_math(formula: str) -> MathExpr:
    return MathExpr(formula, _tokenize(formula))


class _Parser:
    def __init__(self, tokens, fields, rtvals, consts, cols):
        self.t = tokens
        self.pos = 0
        self.fields = fields
        self.rtvals = rtvals
        self.consts = consts
        self.cols = cols

    def peek(self) -> str | None:
        return self.t[self.pos] if self.pos < len(self.t) else None

    def take(self) -> str:
        tok = self.t[self.pos]
        self.pos += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.take()
        if got != tok:
            raise ValueError(f"expected {tok!r}, got {got!r}")

    def parse(self) -> Column:
        out = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.t[self.pos:]}")
        return out

    def or_expr(self) -> Column:
        left = self.and_expr()
        while self.peek() in ("||", "!|"):
            op = self.take()
            right = self.and_expr()
            left = (left | right) if op == "||" else (left != right)
        return left

    def and_expr(self) -> Column:
        left = self.cmp_expr()
        while self.peek() == "&&":
            self.take()
            left = left & self.cmp_expr()
        return left

    def cmp_expr(self) -> Column:
        left = self.add_expr()
        op = self.peek()
        if op in ("<", ">", "<=", ">=", "==", "!="):
            self.take()
            right = self.add_expr()
            return {
                "<": left < right,
                ">": left > right,
                "<=": left <= right,
                ">=": left >= right,
                "==": left == right,
                "!=": left != right,
            }[op]
        return left

    def add_expr(self) -> Column:
        left = self.mul_expr()
        while self.peek() in ("+", "-", "~"):
            op = self.take()
            right = self.mul_expr()
            if op == "+":
                left = left + right
            elif op == "-":
                left = left - right
            else:  # ~ = absolute difference (MathUtils op decode)
                left = F.abs(left - right)
        return left

    def mul_expr(self) -> Column:
        left = self.unary()
        while self.peek() in ("*", "/", "%"):
            op = self.take()
            right = self.unary()
            if op == "*":
                left = left * right
            elif op == "/":
                left = left / right
            else:
                left = left % right
        return left

    def unary(self) -> Column:
        if self.peek() == "-":
            self.take()
            return -self.unary()
        if self.peek() == "!":
            self.take()
            return ~self.unary()
        return self.power()

    def power(self) -> Column:
        base = self.atom()
        if self.peek() == "^":
            self.take()
            return F.pow(base, self.unary())  # right assoc
        return base

    def atom(self) -> Column:
        tok = self.take()
        if tok == "(":
            inner = self.or_expr()
            self.expect(")")
            return inner
        if re.fullmatch(r"\d+(\.\d+)?([eE][-+]?\d+)?", tok):
            return F.lit(float(tok))
        if re.fullmatch(r"i\d+", tok):
            if self.fields is None:
                raise ValueError(f"field ref {tok} but no field provider")
            return self.fields(int(tok[1:]))
        if tok.startswith("{") and tok.endswith("}"):
            kind, name = tok[1:-1].split(":", 1)
            if self.rtvals is None:
                raise ValueError(f"rtval ref {tok} but no rtval provider")
            return self.rtvals(kind, name)
        # function call?
        if self.peek() == "(":
            self.take()
            args = [self.or_expr()]
            while self.peek() == ",":
                self.take()
                args.append(self.or_expr())
            self.expect(")")
            return self._call(tok, args)
        if tok in self.cols:
            return self.cols[tok]
        if tok in self.consts:
            return F.lit(float(self.consts[tok]))
        # bare column name fallback (typed-table mode)
        return F.col(tok)

    def _call(self, name: str, args: list[Column]) -> Column:
        name = name.lower()
        if name in _FUNCS_1 and len(args) == 1:
            return _FUNCS_1[name](args[0])
        if name in ("scale", "round") and len(args) == 2:
            # dcafs scale = HALF_UP rounding (MathForward.java:492-497);
            # Spark round() is HALF_UP — matches.
            return F.round(args[0], 0) if args[1] is None else F.call_function("round", args[0], args[1])
        if name == "atan2" and len(args) == 2:
            return F.atan2(args[0], args[1])
        if name == "pow" and len(args) == 2:
            return F.pow(args[0], args[1])
        if name in ("min", "least"):
            return F.least(*args)
        if name in ("max", "greatest"):
            return F.greatest(*args)
        raise ValueError(f"unknown function {name}/{len(args)}")
