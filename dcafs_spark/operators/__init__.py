"""Operators: the dcafs forwards (filter/math/editor), ingest
projections, and the LLM-data-pipeline extensions (dedup, similarity,
text analysis, multimodal)."""

from dcafs_spark.operators.filter_forward import FilterForward
from dcafs_spark.operators.math_forward import MathForward
from dcafs_spark.operators.editor_forward import EditorForward
from dcafs_spark.operators.projection import Generic, valmap

__all__ = ["FilterForward", "MathForward", "EditorForward", "Generic", "valmap"]
