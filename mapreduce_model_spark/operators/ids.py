"""Global ordered row numbering without a global window.

``row_number() OVER (ORDER BY …)`` funnels every row through ONE partition —
the canonical scale anti-pattern (fine in the DuckDB oracle, fatal at
100 TB). The distributed equivalent is two-phase:

1. Range-partition on the order keys and sort within partitions — rows are
   now globally ordered across partitions (partition i's rows all precede
   partition i+1's).
2. Number rows within each partition in parallel, then add each partition's
   starting offset = cumulative count of all earlier partitions. The
   per-partition counts are a tiny driver-side list (one long per
   partition), the only non-distributed data in the operator.

Same shape as RDD ``zipWithIndex`` but staying in DataFrame land (no
Python-side row serialization), with a deterministic total order from the
caller's keys rather than arbitrary partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_ordered_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Assign contiguous 1-based ids in the total order of ``order_cols``
    (which must be a unique key — equal keys would make the order, and
    therefore the ids, nondeterministic).

    Two shuffles (range exchange + the window's hash exchange on pid), both
    fully parallel; no partition ever holds more than its share of rows.

    ``materialize=True`` is MANDATORY for correct results: the counts pass
    and the numbering pass are two separate jobs, and repartitionByRange
    samples its range boundaries with a per-job seed — without pinning the
    layout the two jobs can disagree on partition boundaries, and every
    offset after the first divergent partition is wrong (observed at
    sf0.1). Same caveat as RDD zipWithIndex. The checkpoint is LAZY: the
    counts collect below is the action that materializes it, so pinning
    the layout costs no extra job. ``materialize=False`` exists
    only so tests can inspect the full physical plan (localCheckpoint
    truncates lineage); on a cluster prefer spark.checkpoint.dir-backed
    ``checkpoint()`` for executor-loss safety.
    """
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (
        df.repartitionByRange(int(parts), *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    if materialize:
        ranged = ranged.localCheckpoint(eager=False)
    # one row per partition — small enough for the driver at any scale
    # (700k partitions → 700k longs)
    counts = sorted(
        (r["_pid"], r["n"])
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets = {}
    acc = 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    offset_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.withColumn("_local", F.row_number().over(w))
        .join(offset_df, "_pid")
        .withColumn(id_col, (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )
