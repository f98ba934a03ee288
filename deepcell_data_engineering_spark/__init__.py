"""deepcell_data_engineering_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of vanvalenlab/deepcell-data-engineering (caliban_toolbox):
image-unit cropping/slicing/stitching, label algebra, dataset build/split/
balance/benchmark, file/cloud connectors — plus the full relational surface
(joins, aggregations, windows, set ops, scalar functions) and the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Design principles (see SURVEY.md):
- DataFrame/SQL first; Catalyst does the optimizing. No RDDs.
- Image payloads are binary columns; per-image compute is Arrow-batched
  pandas UDFs (applyInPandas / mapInPandas), never driver loops.
- Every operator is designed for a multi-executor cluster at ~100 TB:
  partition-pruned scans, broadcast small dims, co-partitioned grouped ops,
  AQE on.
"""

__version__ = "0.1.0"

from deepcell_data_engineering_spark.session import get_spark  # noqa: F401
