"""riko_spark — a PySpark-native stream/batch analytics engine.

A from-scratch Structured-Streaming / DataFrame re-expression of the
pipe-graph semantics of nerevu/riko (Yahoo!-Pipes-style composable
operators over streams of items).  Every riko "pipe" becomes a
composable DataFrame operator; per-item processors are native Column
expressions or vectorized pandas/Arrow UDFs; stream-level operators
(sort/limit/dedupe/join/union/aggregate) are relational DataFrame ops
so Catalyst owns pushdown, pruning, join strategy and AQE.

Layout:
    operators/   operator registry + the ~40 riko pipe equivalents
    sources/     synthetic web-pages table + parquet table readers
    functions/   scalar/vectorized helpers (casts, text, similarity)
    plans/       JSON pipe-definition DAG -> DataFrame plan compiler
    streaming/   windows, watermark dedupe, stream-stream join,
                 exactly-once sink, lineage/metrics listener
"""

__version__ = "0.1.0"

from riko_spark.operators import get_operator, list_operators, register  # noqa: F401
