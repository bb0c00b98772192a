"""Window-function operators: ranking, analytics, top-k per group,
sessionization.

Heritage: generalizes the reference's per-letter ordering (postings-length
DESC, word ASC inside each letter file — main.cc:148-156), which is exactly a
rank-within-partition. The reference's static letter→reducer assignment
(main.cc:132-141) becomes ``Window.partitionBy``'s hash exchange.

Scale notes (100 TB):
- A window partitioned by a real key (customer, user) shuffles once on that
  key and streams each partition — fine at any scale as long as no single
  key's partition exceeds executor memory (AQE cannot split *within* a window
  partition; for pathological keys pre-aggregate or bucket the key).
- ``topk_per_group`` filters ``row_number() <= k`` immediately — never
  materializes a global sort. A global ORDER BY + LIMIT k is only for final
  small results (Spark's TakeOrderedAndProject handles it without a full
  sort of the world).
- ``sessionize`` is the lag/cumsum construction: two stacked windows over the
  same (key, ts) ordering → one shuffle total, whole-stage codegen between.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["topk_per_group", "sessionize"]


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ``row_number`` (deterministic only if
    ``order_cols`` is a total order within each group — callers must append
    tie-break keys, the hash-match discipline of SURVEY.md §7)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tie_break: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same ``key`` exceeds ``gap_seconds``.

    Batch analogue of streaming ``session_window`` (the classic
    lag + cumulative-sum construction): deterministic given a total order
    per key — pass ``tie_break`` (e.g. event_id) if timestamps can tie.
    Adds ``session_id`` (1-based per key) .
    """
    order = [F.col(ts_col)] + ([F.col(tie_break)] if tie_break else [])
    w = Window.partitionBy(key).orderBy(*order)
    ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
