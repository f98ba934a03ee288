"""Python user-defined TABLE functions (Spark 4 UDTF API).

UDTFs are the row→rows extension point SQL callers can invoke with
LATERAL — the table-valued sibling of scalar UDFs. They run
row-at-a-time in Python, so they are the SLOW PATH by design: the
production chunker is the codegen generator explode in
``functions/text.py:chunk_documents`` (x34). ``ChunkUDTF`` exists to
certify the UDTF execution path itself: x72 runs it through SQL LATERAL
and the driver hash-matches it against the SAME DuckDB oracle as x34 —
if the UDTF plumbing (registration, lateral correlation, schema
projection, UTF-8 handling) drifts from the declarative twin by one
byte, the gate goes red.

Semantics mirror chunk_documents exactly: chunk i covers
[i*stride, i*stride + chunk_size) in CHARACTERS; the last chunk may be
short; every character is covered; identity = md5 of the chunk's UTF-8
bytes (what Spark's and DuckDB's md5(string) both hash).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf

CHUNK_SIZE = 200
STRIDE = 150


@udtf(returnType="chunk_idx int, chunk_len int, chunk_md5 string")
class ChunkUDTF:
    """yield (chunk_idx, chunk_len, chunk_md5) per overlapping chunk."""

    def eval(self, text: str):  # noqa: D102 — UDTF protocol method
        if text is None:
            return
        n = len(text)
        extra = (max(n - CHUNK_SIZE, 0) + STRIDE - 1) // STRIDE
        for i in range(extra + 1):
            chunk = text[i * STRIDE : i * STRIDE + CHUNK_SIZE]
            yield i, len(chunk), hashlib.md5(chunk.encode("utf-8")).hexdigest()


def register_chunk_udtf(spark) -> str:
    """Register ChunkUDTF for SQL use; returns the function name."""
    spark.udtf.register("chunk_udtf", ChunkUDTF)
    return "chunk_udtf"


class JsonFieldsUDTF:
    """POLYMORPHIC UDTF (Spark 4 ``analyze()`` protocol): the output
    schema is derived at ANALYSIS time from the constant ``fields``
    argument — ``json_fields(props, 'k,m')`` produces columns (k, m),
    ``'a,b,c'`` produces (a, b, c) — the schema-from-argument
    capability a static ``returnType`` (ChunkUDTF above) cannot
    express. Catalyst sees the resolved schema before planning, so
    downstream projection/pruning work as if the columns were real.
    Extraction itself is schema-on-read over a JSON payload; missing
    fields yield NULL columns (never errors - quarantine semantics).
    """

    @staticmethod
    def analyze(payload, fields):
        from pyspark.sql.types import StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if fields.value is None:
            raise ValueError("json_fields: 'fields' must be a constant string")
        names = [f.strip() for f in str(fields.value).split(",") if f.strip()]
        if not names:
            raise ValueError("json_fields: no field names given")
        return AnalyzeResult(
            StructType([StructField(n, StringType()) for n in names])
        )

    def eval(self, payload, fields):  # noqa: D102 — UDTF protocol method
        import json

        names = [f.strip() for f in str(fields).split(",") if f.strip()]
        try:
            obj = json.loads(payload) if payload else {}
        except (ValueError, TypeError):
            obj = {}
        yield tuple(
            None if obj.get(n) is None else str(obj[n]) for n in names
        )


def register_json_fields_udtf(spark) -> str:
    """``analyze()`` runs in a separate Python process that may not
    have this package on sys.path (a vanilla session adds the repo to
    the DRIVER's path only), so register the module for by-value
    pickling — the class rides inside the pickle instead of being
    imported by name on the analyzer side."""
    import sys

    from pyspark import cloudpickle
    from pyspark.sql.functions import udtf as _udtf

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.udtf.register("json_fields_udtf", _udtf(JsonFieldsUDTF))
    return "json_fields_udtf"
