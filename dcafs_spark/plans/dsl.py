"""Pipeline DSL: declarative path specs compiled to DataFrame plans.

Parity target: the reference's *path* concept — an ordered chain of
forwards with a shared delimiter and failure routing
(`src/io/forward/PathForward.java:115-263`), declared in XML. Here a
path is a plain dict (JSON/YAML-friendly), and "compilation" builds a
lazy DataFrame transformation chain — Catalyst then fuses every step
into as few physical operators as the expressions allow, so a
10-step path typically runs as ONE whole-stage-codegen projection
over the scan. Nothing in the compiled plan is per-row Python.

Spec shape::

    {
      "id": "sbe38",
      "delimiter": ",",
      "steps": [
        {"type": "filter", "rules": [["start", "$"]], "negate": false,
         "reject": "bad_lines"},            # optional failure route
        {"type": "math", "ops": [{"target": "i1", "formula": "i1*0.001"}]},
        {"type": "editor", "edits": [{"kind": "trim", "args": {}}]},
        {"type": "generic", "fields": [
            {"name": "temp", "index": 1, "dtype": "real"}],
         "keep": ["origin", "ts"]},
      ]
    }

`compile_path` returns (main DataFrame, {reject_tag: DataFrame}).
The same compiler serves batch and streaming inputs — a streaming df
flows through identically (all steps are narrow transformations).

A filter step's failure route mirrors the reference's *reverse
targets* (`FilterForward.java:69-81`): the complementary predicate
over the same parent plan. Catalyst reuses the scan for both sides.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from dcafs_spark.operators.editor_forward import Edit, EditorForward
from dcafs_spark.operators.filter_forward import FilterForward
from dcafs_spark.operators.math_forward import MathForward, MathOp
from dcafs_spark.operators.projection import Field, Generic, valmap

PathSpec = dict[str, Any]


def _build_filter(step: dict, delimiter: str, column: str) -> FilterForward:
    return FilterForward(
        rules=[tuple(r) for r in step["rules"]],
        delimiter=step.get("delimiter", delimiter),
        negate=bool(step.get("negate", False)),
        column=column,
    )


def _build_math(step: dict, delimiter: str, column: str) -> MathForward:
    ops = [
        MathOp(
            target=o["target"],
            formula=o["formula"],
            special=o.get("special"),
            scale=o.get("scale"),
        )
        for o in step["ops"]
    ]
    return MathForward(
        ops=ops,
        delimiter=step.get("delimiter", delimiter),
        column=column,
        consts=step.get("consts", {}),
        suffix=step.get("suffix"),
    )


def _build_editor(step: dict, delimiter: str, column: str) -> EditorForward:
    edits = [Edit(e["kind"], e.get("args", {})) for e in step["edits"]]
    return EditorForward(edits=edits, delimiter=step.get("delimiter", delimiter), column=column)


def _build_generic(step: dict, delimiter: str) -> Generic:
    fields = [
        Field(
            name=f["name"],
            index=f.get("index", i),
            dtype=f.get("dtype", "real"),
            default=f.get("default"),
        )
        for i, f in enumerate(step["fields"])
    ]
    return Generic(
        fields=fields,
        delimiter=step.get("delimiter", delimiter),
        startswith=step.get("startswith", ""),
        nrs_mode=bool(step.get("nrs", False)),
    )


def compile_steps(
    df: DataFrame, steps: list[dict], delimiter: str = ",", column: str = "value"
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Apply each step in order; returns (main, rejects-by-tag)."""
    rejects: dict[str, DataFrame] = {}
    for step in steps:
        kind = step["type"].lower()
        if kind == "filter":
            ff = _build_filter(step, delimiter, column)
            if "reject" in step:
                df, rejected = ff.fork(df)
                rejects[step["reject"]] = rejected
            else:
                df = ff.apply(df)
        elif kind == "math":
            mf = _build_math(step, delimiter, column)
            if step.get("typed", False):
                df = mf.apply_typed(df, keep=step.get("keep"))
            else:
                df = mf.apply(df)
        elif kind == "editor":
            ed = _build_editor(step, delimiter, column)
            df = ed.apply(df)
        elif kind == "generic":
            g = _build_generic(step, delimiter)
            df = g.apply(df, keep=step.get("keep"))
        elif kind == "valmap":
            df = valmap(
                df,
                split=step.get("split", ":"),
                multi_delimiter=step.get("multi"),
                column=column,
            )
        elif kind == "custom":
            # extension point — the Spark analog of the reference's
            # custom label handlers (LabelWorker doLABEL(Datagram),
            # manual 'Adding a label' / SURVEY §2.10): a user callable
            # DataFrame -> DataFrame spliced into the compiled chain.
            # Distribution discipline is the author's contract, same as
            # any DataFrame transform; no driver-side row loop exists
            # here for one to accidentally fall into.
            fn = step.get("fn")
            if not callable(fn):
                raise ValueError("custom step needs a callable 'fn'")
            df = fn(df)
        else:
            raise ValueError(f"unknown step type: {kind}")
    return df, rejects


def compile_path(df: DataFrame, spec: PathSpec) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Compile a full path spec against an input DataFrame."""
    return compile_steps(
        df,
        spec.get("steps", []),
        delimiter=spec.get("delimiter", ","),
        column=spec.get("column", "value"),
    )
