"""Streaming windowed aggregations with watermarks.

The reference is batch-only (one fixed MapReduce job); streams are a
north-star requirement. Design: the SAME windowed aggregation function is
applied to a batch DataFrame (for the DuckDB oracle) and a readStream
DataFrame (for the real streaming path) — batch/stream parity is the
correctness property (SURVEY.md §5), verified in tests by running the
streaming query to completion on the finite events table.

Watermark semantics: ``withWatermark(ts, delay)`` bounds state — windows
older than ``max(event ts) - delay`` are finalized (append mode emits them,
state is dropped). On a 100 TB/day stream this is what keeps window state
finite; without it, session/sliding state grows unboundedly.

Scale notes: windowed aggs shuffle on (window, keys) — set
``spark.sql.shuffle.partitions`` to match cluster cores; skewed keys (one
hot user) are split by AQE in batch but NOT in streaming — salt hot keys
into the groupBy if a key exceeds one executor's state budget. State store
is RocksDB-backed on real clusters (``spark.sql.streaming.stateStore
.providerClass``) so state spills instead of OOMing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_model_spark.functions.rounding import rnd

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as an unbounded stream (file source).

    readStream needs an explicit schema, and the testdata's ``ts`` physical
    type has drifted across generations (ns-as-int64 / µs NTZ / µs TZ), so
    the stream schema is derived from a batch footer probe and the SAME
    normalization as the batch scan (``registry.normalize_events_ts``) is
    applied — batch/stream timestamp parity by construction. The probe
    reads only the parquet footer (no data pages) — negligible even
    against a 100 TB directory.
    """
    from mapreduce_model_spark.registry import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(raw_schema)
        # single-file source: FileStreamSource pins basePath to the literal
        # path unless it is a glob; glob + explicit directory basePath makes
        # it accept a lone file
        .option("basePath", sf_dir)
        .parquet(f"{sf_dir}/events*.parquet")
    )
    return normalize_events_ts(raw)


def tumbling_agg(events: DataFrame, width: str = "5 minutes", watermark: str | None = None) -> DataFrame:
    """Tumbling windows per event_type: count + sum(value). Works on batch
    and streaming frames alike (parity by construction)."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows (width 10, slide 5 → every event lands in 2 windows)."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
            "sum_value",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Per-user session windows (gap-based). ``session_window`` end = last
    event + gap; output in µs to stay precision-stable vs the oracle."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("s_start_us"),
            F.unix_micros("w.end").alias("s_end_us"),
            "n",
            "sum_value",
        )
    )


def run_stream_to_table(sdf: DataFrame, name: str, output_mode: str = "complete") -> None:
    """Drive a finite file-backed stream to completion into a memory sink
    (test/verification harness; production sinks are kafka/parquet/delta
    via the same writeStream)."""
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
