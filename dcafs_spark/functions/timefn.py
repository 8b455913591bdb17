"""Datetime helpers: Java DateTimeFormatter → Spark pattern translation.

The reference formats/reformats date fields with Java patterns
(`src/util/tools/TimeTools.java:52-99`, EditorForward redate/retime).
Spark's datetime patterns (since 3.0) are *mostly* the same dialect but
differ in a few letters; `java_pattern_to_spark` translates the
divergent ones (run-aware, skipping single-quoted literal text: a
literal like 'min' survives untouched, and Java 'nnnnnnnnn'
nano-of-second maps to one 'SSS', not 9 substitutions) and is used by
the editor `redate`/`retime`/`millisdate` steps. A pattern letter
Spark doesn't accept at all surfaces as Spark's own analysis error —
deliberately not masked, the reference throws on bad patterns too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def java_pattern_to_spark(pattern: str) -> str:
    out: list[str] = []
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "'":
            # quoted literal: copy verbatim through the closing quote
            # ('' inside is an escaped quote)
            j = i + 1
            while j < n:
                if pattern[j] == "'":
                    if j + 1 < n and pattern[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(pattern[i : j + 1])
            i = j + 1
        elif ch.isalpha():
            j = i
            while j < n and pattern[j] == ch:
                j += 1
            run = pattern[i:j]
            if ch in ("u", "Y"):  # proleptic / week-based year → year
                run = "y" * len(run)
            elif ch in ("n", "N"):  # nano-of-second/day → millis fraction
                run = "SSS"
            out.append(run)
            i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def redate(col: Column, from_pattern: str, to_pattern: str) -> Column:
    """Reformat a date/time string field (EditorForward redate,
    EditorForward.java:391-414). 'epochmillis'/'epochsec' accepted as
    from-patterns (CHANGELOG 1.2.7)."""
    to_p = java_pattern_to_spark(to_pattern)
    if from_pattern == "epochmillis":
        ts = F.timestamp_millis(col.cast("long"))
    elif from_pattern == "epochsec":
        ts = F.timestamp_seconds(col.cast("long"))
    else:
        ts = F.to_timestamp(col, java_pattern_to_spark(from_pattern))
    return F.date_format(ts, to_p)


def millisdate(col: Column, to_pattern: str = "sql") -> Column:
    """Epoch-millis field → formatted timestamp string; 'sql' = ISO
    (EditorForward.java:351-383)."""
    ts = F.timestamp_millis(col.cast("long"))
    if to_pattern == "sql":
        return F.date_format(ts, "yyyy-MM-dd HH:mm:ss.SSS")
    return F.date_format(ts, java_pattern_to_spark(to_pattern))
