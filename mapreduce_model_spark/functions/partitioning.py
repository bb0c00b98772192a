"""Partitioning utilities for fan-out-heavy operators.

A scan's parallelism is bounded by its input splits (parquet row groups).
An operator that explodes each row into hundreds of derived rows (shingles,
tokens, band keys) does all that CPU *before* the first shuffle — so a
low-split scan serializes the most expensive part of the pipeline on a few
cores regardless of cluster size. ``spread_for_fanout`` inserts one cheap
shuffle of the *narrow* input (ids + text, pre-explosion) only when the
scan's partition count is below the session's parallelism; on a real
100 TB table with thousands of splits it is a no-op.

This generalizes the reference's dynamic mapper work queue
(main.cc:50-59): the unit of work there is one file claimed by an idle
thread; here it is one input partition sized so no core idles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_fanout(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` up to the default parallelism — only if it is
    currently under-partitioned. ``cols`` (optional) hash-partition on those
    columns so downstream same-key ops can reuse the exchange."""
    if df.isStreaming:
        # .rdd force-plans a batch query (illegal on a stream), and the
        # probe would be meaningless anyway: microbatch size is governed
        # by the source's admission control, not by scan splits
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
