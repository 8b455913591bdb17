"""Comparison grammar compiler.

Compiles the dcafs comparison mini-language (shared by filter rules,
value triggers and task checks — reference
`src/util/math/MathUtils.java:244-329`, `parseSingleCompareFunction`)
into a function `Column -> Column(Boolean)`:

  * symbolic: ``<50`` ``>30`` ``==65`` ``!=5`` ``<=125.2``
  * double-bounded: ``1<x<10`` / combined ``above 1, below 10``
  * word forms: ``above``→``>``  ``below``→``<``  ``not below``→``>=``
    ``not above``→``<=``  ``at least``→``>=``  ``equals``→``==``
    ``not``→``!=``
  * ``between X and Y``  → X < x < Y (exclusive)
  * ``not between X and Y`` → NOT(X < x < Y)
  * ``from X to Y`` / ``from X till Y`` → X <= x < Y
  * ``X through Y`` → X <= x <= Y
  * ranges: ``1-10`` / ``-5->15`` → inclusive both ends

The compiled predicate is a plain Catalyst boolean expression, so it
participates in predicate pushdown and codegen.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column

_OPS: dict[str, Callable[[Column, float], Column]] = {
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "==": lambda c, v: c == v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
}

# sign-tolerant exponent, same lexing as mathfab's number token (the
# round-10 `2e+3` fix): `<1.5e+4` and `at least +5` must parse
_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"


class _PyBool:
    """Boolean shim honoring Column-style `&` / `~` composition."""

    def __init__(self, v: bool):
        self.v = bool(v)

    def __and__(self, other: "_PyBool") -> "_PyBool":
        return _PyBool(self.v and other.v)

    def __invert__(self) -> "_PyBool":
        return _PyBool(not self.v)


class _PyVal:
    """Float shim: comparison ops return _PyBool, so the SAME compiled
    predicate lambdas (written against Column semantics) evaluate
    driver-side — one grammar, two execution targets."""

    def __init__(self, x: float):
        self.x = x

    def __lt__(self, v):
        return _PyBool(self.x < v)

    def __le__(self, v):
        return _PyBool(self.x <= v)

    def __gt__(self, v):
        return _PyBool(self.x > v)

    def __ge__(self, v):
        return _PyBool(self.x >= v)

    def __eq__(self, v):
        return _PyBool(self.x == v)

    def __ne__(self, v):
        return _PyBool(self.x != v)


def compile_compare_py(spec: str) -> Callable[[float], bool]:
    """Same grammar, evaluated on plain Python floats (used by the
    driver-side trigger/task engines where no DataFrame is in play)."""
    fn = compile_compare(spec)

    def check(x: float) -> bool:
        r = fn(_PyVal(x))
        return r.v if isinstance(r, _PyBool) else bool(r)

    return check


def _invert(op: str) -> str:
    return {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "==": "==", "!=": "!="}[op]


def compile_compare(op: str) -> Callable[[Column], Column]:
    """Compile one comparison spec to a Column predicate builder."""
    ori = op.strip()
    s = ori

    m = re.fullmatch(rf"not\s+between\s+({_NUM})\s+and\s+({_NUM})", s)
    if m:
        lo, hi = float(m.group(1)), float(m.group(2))
        return lambda c: ~((c > lo) & (c < hi))
    m = re.fullmatch(rf"between\s+({_NUM})\s+and\s+({_NUM})", s)
    if m:
        lo, hi = float(m.group(1)), float(m.group(2))
        return lambda c: (c > lo) & (c < hi)
    m = re.fullmatch(rf"from\s+({_NUM})\s+(?:to|till)\s+({_NUM})", s)
    if m:
        lo, hi = float(m.group(1)), float(m.group(2))
        return lambda c: (c >= lo) & (c < hi)
    m = re.fullmatch(rf"({_NUM})\s+through\s+({_NUM})", s)
    if m:
        lo, hi = float(m.group(1)), float(m.group(2))
        return lambda c: (c >= lo) & (c <= hi)
    # arrow range -5->15 (inclusive)
    m = re.fullmatch(rf"({_NUM})\s*->\s*({_NUM})", s)
    if m:
        lo, hi = float(m.group(1)), float(m.group(2))
        return lambda c: (c >= lo) & (c <= hi)

    # word forms → symbols (longest first)
    for word, sym in (
        ("not below ", ">="),
        ("not above ", "<="),
        ("at least ", ">="),
        ("below ", "<"),
        ("above ", ">"),
        ("equals ", "=="),
        ("not ", "!="),
    ):
        s = s.replace(word, sym)

    # multiple clauses combined with , or ; → AND ('above 1, below 10')
    parts = [p for p in re.split(r"[,;]", s) if p.strip()]
    if len(parts) > 1:
        subs = [compile_compare(p.strip()) for p in parts]

        def _and_all(c: Column) -> Column:
            out = subs[0](c)
            for sub in subs[1:]:
                out = out & sub(c)
            return out

        return _and_all

    s = s.replace(" ", "")

    # double-bounded: 15<x<=25 (variable letter arbitrary)
    m = re.fullmatch(rf"({_NUM})(<=?|>=?)[a-zA-Z$]*(<=?|>=?)({_NUM})", s)
    if m:
        lo, op1, op2, hi = float(m.group(1)), m.group(2), m.group(3), float(m.group(4))
        f1 = _OPS[_invert(op1)]
        f2 = _OPS[op2]
        return lambda c: f1(c, lo) & f2(c, hi)

    # single comparator, optional leading variable name: x<=25 or <=25
    m = re.fullmatch(rf"[a-zA-Z$]*(==|!=|<=|>=|<|>|=)({_NUM})", s)
    if m:
        fn = _OPS[m.group(1)]
        val = float(m.group(2))
        return lambda c: fn(c, val)

    # bare range 1-10 (inclusive both ends); supports negative bounds -5--10
    m = re.fullmatch(rf"({_NUM})-({_NUM})", s)
    if m:
        lo, hi = float(m.group(1)), float(m.group(2))
        return lambda c: (c >= lo) & (c <= hi)

    raise ValueError(f"cannot parse comparison: {ori!r}")
