"""Skyline (Pareto frontier) operator — maximize two dimensions.

A point is in the skyline iff no other point is >= in both dimensions and
> in at least one. The naive formulation is a dominance NOT EXISTS
self-join — O(n²) and a cartesian product in any engine. Over DISTINCT
points ordered by (x DESC, y DESC), a point survives iff its y exceeds
every earlier point's y — one running-max window.

Scale design (the reason this is an operator, not a one-liner): a global
running max is a single-partition sort. Phase 1 applies the same
running-max filter per x-range bucket — a window keyed on the bucket id,
fully parallel; within a bucket every earlier row also precedes globally,
so local survivors are a superset of the frontier (standard distributed-
skyline pruning). Phase 2 re-applies the exact filter over the few bucket
survivors — the same small-tail merge as TakeOrderedAndProject. If p is
dominated, its dominator (or, inductively, its dominator's dominator)
survives phase 1, so phase 2 still removes p: the two-phase result is
exactly the skyline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    pts: DataFrame, x: str = "x", y: str = "y", buckets: int = 32
) -> DataFrame:
    """Skyline of the DISTINCT (x, y) points in ``pts`` (maximize both).
    Returns the surviving distinct points with the same column names."""
    pts = pts.select(x, y).distinct()
    # bucketing runs ENTIRELY in double: long-typed extremes would overflow
    # both (x - _lo) * buckets and the _hi - _lo span under ANSI (the
    # double's precision loss only mis-buckets, which phase 2's exact
    # re-filter absorbs; an ANSI ARITHMETIC_OVERFLOW kills the job)
    lim = pts.agg(
        F.min(x).cast("double").alias("_lo"), F.max(x).cast("double").alias("_hi")
    )
    bucketed = pts.join(F.broadcast(lim)).withColumn(
        "_b",
        F.least(
            F.lit(buckets - 1),
            F.floor(
                (F.col(x).cast("double") - F.col("_lo"))
                * buckets
                / (F.col("_hi") - F.col("_lo") + 1e-9)
            ),
        ),
    )
    w_local = (
        Window.partitionBy("_b")
        .orderBy(F.desc(x), F.desc(y))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("_pm", F.max(y).over(w_local)).filter(
        F.col("_pm").isNull() | (F.col(y) > F.col("_pm"))
    )
    w_global = Window.orderBy(F.desc(x), F.desc(y)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        local.select(x, y)
        .withColumn("_pm", F.max(y).over(w_global))
        .filter(F.col("_pm").isNull() | (F.col(y) > F.col("_pm")))
        .select(x, y)
    )
