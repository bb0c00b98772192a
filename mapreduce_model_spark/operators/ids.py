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

Same shape as RDD ``zipWithIndex`` but staying in DataFrame/Arrow land (no
row-at-a-time Python serialization), with a deterministic total order from
the caller's keys rather than arbitrary partition order.

Phase 2 is a NARROW Arrow pass (``mapInArrow``): rows are already sorted
within their range partition, so local numbering needs no window — and
therefore no second exchange. The previous formulation
(``row_number() OVER (PARTITION BY _pid)`` + broadcast-joined offsets)
re-shuffled the entire dataset on ``_pid`` and re-sorted rows that were
already in order; at 100 TB that is a full extra network pass for zero
information. The Arrow pass is executor-local (zero-copy batches, one
int64 append per batch) and the offsets ride along in the closure — no
join, no map-literal codegen, no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)


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

    ONE shuffle (the range exchange); phase 2 is narrow. No partition ever
    holds more than its share of rows.

    ``materialize=True`` is MANDATORY for correct results: the counts pass
    and the numbering pass are two separate jobs, and repartitionByRange
    samples its range boundaries with a per-job seed — without pinning the
    layout the two jobs can disagree on partition boundaries, and every
    offset after the first divergent partition is wrong (observed at
    sf0.1; repro pinned in PLANS.md §global_row_ids). Same caveat as RDD
    zipWithIndex. The checkpoint is LAZY: the counts collect below is the
    action that materializes it, so pinning the layout costs no extra
    job. ``materialize=False`` exists only so tests can inspect the full
    physical plan (localCheckpoint truncates lineage); on a cluster prefer
    spark.checkpoint.dir-backed ``checkpoint()`` for executor-loss safety.
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
    offsets: dict[int, int] = {}
    acc = 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n

    out_names = [f.name for f in df.schema.fields]
    out_schema = StructType(
        list(df.schema.fields) + [StructField(id_col, LongType(), False)]
    )

    def _number(batches):
        import numpy as np
        import pyarrow as pa

        base = None
        seen = 0
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            if base is None:
                # one partition per task ⇒ _pid is constant across batches
                pid = b.column("_pid")[0].as_py()
                if pid not in offsets:
                    # A pid absent from the counts pass means the two jobs
                    # disagreed on the range layout (the materialize=True
                    # contract above was broken) — fail loudly rather than
                    # default to offset 0 and emit silently duplicate ids.
                    raise RuntimeError(
                        f"global_ordered_ids: partition {pid} not in counts "
                        f"({len(offsets)} partitions) — range layout diverged "
                        "between the counts job and the numbering job; run "
                        "with materialize=True (see docstring contract)"
                    )
                base = offsets[pid]
            ids = pa.array(
                np.arange(base + seen + 1, base + seen + n + 1, dtype=np.int64)
            )
            yield b.select(out_names).append_column(id_col, ids)
            seen += n

    return ranged.mapInArrow(_number, out_schema)


def global_prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """EXCLUSIVE running sum of ``value_col`` in the total order of
    ``order_cols`` (a unique key) — ``sum(...) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` without the single-partition
    global window. Same two-phase shape as :func:`global_ordered_ids`
    (and the same ``materialize`` layout-pinning contract): one range
    exchange + sort, per-partition VALUE SUMS to the driver (one long per
    partition — tiny at any scale), then a narrow Arrow pass computing
    each row's local exclusive cumsum plus its partition's base. This is
    the scan primitive behind sequence packing, byte-offset assignment in
    concatenated shard files, and cumulative quota splits.

    ``value_col`` must be integral: the driver bases sum whole partitions
    while the Arrow pass truncates per row, so a fractional column would
    drift across partition boundaries (truncate-the-total vs
    truncate-each-value). Rejected loudly rather than silently corrupting
    offsets."""
    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"global_prefix_sums: value_col {value_col!r} must be an integral "
            f"type, got {vtype.simpleString()} — cast explicitly (and decide "
            "the rounding) before calling; per-row truncation in the cumsum "
            "pass would not match the whole-partition sums the bases use"
        )
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (
        df.repartitionByRange(int(parts), *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    if materialize:
        ranged = ranged.localCheckpoint(eager=False)
    sums = sorted(
        (r["_pid"], r["s"])
        for r in ranged.groupBy("_pid")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).cast("long").alias("s"))
        .collect()
    )
    bases: dict[int, int] = {}
    acc = 0
    for pid, s in sums:
        bases[pid] = acc
        acc += int(s)

    out_names = [f.name for f in df.schema.fields]
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType(), False)]
    )

    def _cumsum(batches):
        import numpy as np
        import pyarrow as pa

        base = None
        run = 0
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            if base is None:
                pid = b.column("_pid")[0].as_py()
                if pid not in bases:
                    raise RuntimeError(
                        f"global_prefix_sums: partition {pid} not in sums "
                        f"({len(bases)} partitions) — range layout diverged "
                        "between the sums job and the cumsum job; run with "
                        "materialize=True (see global_ordered_ids contract)"
                    )
                base = bases[pid]
            # nulls contribute 0 — matching F.sum's null-skip in the sums
            # job AND the window twin's semantics. Without fill_null a
            # null arrives as NaN and astype(int64) turns it into
            # int64-min, corrupting every later offset in the partition
            # (r6 review, reproduced).
            vals = (
                b.column(value_col)
                .fill_null(0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            cums = np.cumsum(vals) - vals  # exclusive prefix within batch
            yield b.select(out_names).append_column(
                out_col, pa.array(base + run + cums)
            )
            run += int(vals.sum())

    return ranged.mapInArrow(_cumsum, out_schema)
