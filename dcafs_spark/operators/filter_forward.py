"""FilterForward: predicate rules over text lines, with if/else fork.

Parity target: reference `src/io/forward/FilterForward.java` —
rules AND-combine, first failing rule rejects (:385-406); rejected rows
go to *reverse targets* (:69-81); `negate` inverts (:174,389).

Spark-first: every rule compiles to a Catalyst boolean Column, the
whole rule set to one AND-chained predicate, so it pushes down into the
scan whenever the source format supports it. The if/else fork is the
pass/fail pair of complementary filters — Catalyst caches the common
subplan and both sides stay codegen'd.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dcafs_spark.functions.checksum import nmea_checksum_ok
from dcafs_spark.functions.mathfab import compile_math


def _rule_to_predicate(rtype: str, value: str, col: Column, delimiter: str) -> Column:
    """One rule → boolean Column (rule table: FilterForward.java:315-379)."""
    rtype = rtype.lower()
    if rtype == "start":
        opts = value.split(",")
        pred = col.startswith(opts[0])
        for o in opts[1:]:  # multi-start = OR of alternatives (:324-328)
            pred = pred | col.startswith(o)
        return pred
    if rtype == "nostart":
        return ~_rule_to_predicate("start", value, col, delimiter)
    if rtype == "end":
        return col.endswith(value)
    if rtype == "contain":
        opts = value.split(",")
        pred = col.contains(opts[0])
        for o in opts[1:]:
            pred = pred | col.contains(o)
        return pred
    if rtype == "c_start":
        # char at 1-based position k from start equals c (:335-337)
        pos, ch = value.split(",", 1)
        return F.substring(col, int(pos), 1) == ch
    if rtype == "c_end":
        pos, ch = value.split(",", 1)
        return F.substring(col, -int(pos), 1) == ch
    if rtype == "minlength":
        return F.length(col) >= int(value)
    if rtype == "maxlength":
        return F.length(col) <= int(value)
    if rtype == "minitems":
        return F.size(F.split(col, F.lit(delimiter), -1)) >= int(value)
    if rtype == "maxitems":
        return F.size(F.split(col, F.lit(delimiter), -1)) <= int(value)
    if rtype == "items":
        return F.size(F.split(col, F.lit(delimiter), -1)) == int(value)
    if rtype == "nmea":
        return nmea_checksum_ok(col)
    if rtype == "regex":
        # reference uses String.matches = FULL match → anchor (:318-320)
        pat = value
        if not pat.startswith("^"):
            pat = "^" + pat
        if not pat.endswith("$"):
            pat = pat + "$"
        return col.rlike(pat)
    if rtype == "math":
        # numeric predicate over split fields: 'i0 < 10 && i1 > 2' (:349-379)
        arr = F.split(col, F.lit(delimiter), -1)
        expr = compile_math(value)
        fields = lambda k: F.try_element_at(arr, F.lit(k + 1)).try_cast("double")  # noqa: E731
        return expr.column(fields=fields).cast("boolean")
    raise ValueError(f"unknown filter rule type: {rtype}")


@dataclass
class FilterForward:
    """rules: list of (type, value) applied in order, AND-combined."""

    rules: list[tuple[str, str]]
    delimiter: str = ","
    negate: bool = False
    column: str = "value"

    def predicate(self) -> Column:
        col = F.col(self.column)
        pred = F.lit(True)
        for rtype, rvalue in self.rules:
            pred = pred & _rule_to_predicate(rtype, rvalue, col, self.delimiter)
        if self.negate:
            pred = ~pred
        return pred

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate())

    def fork(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(accepted, rejected) — rejected feeds 'reverse targets'."""
        p = self.predicate()
        return df.filter(p), df.filter(~p)
