"""mapreduce_model_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``vasilealexandru23/MapReduce-Model`` (a C++11 pthreads MapReduce inverted
index, reference at ``/root/reference/src/main.cc``) on idiomatic Spark:
DataFrame/SQL declarative plans optimized by Catalyst, executed by
Tungsten/whole-stage-codegen, with Structured Streaming for streams.

Layout
------
- ``session``    — SparkSession factory tuned for the harness (local[N]) with
                   scale-ready defaults (AQE, UTC, Arrow).
- ``operators``  — relational + custom operators (inverted index, joins,
                   windows, dedup, similarity, as-of, sessionize, ...).
- ``functions``  — column-level function libraries (text normalization,
                   hashing, vector math).
- ``sources``    — input connectors (manifest/text corpus scan, parquet star
                   schema loader).
- ``streaming``  — Structured Streaming windowed aggregations with watermarks.
- ``plans``      — plan-inspection helpers (pushdown/broadcast/codegen checks).

The reference's pthread machinery (mutexes, barriers, work-queues,
``main.cc:15,50-59,99-129``) is deliberately NOT ported: Spark's scheduler,
shuffle, and stage boundaries subsume it (SURVEY.md §2 Table A, A16-A19).
"""

from mapreduce_model_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
