"""Join operators beyond plain equi-joins — as-of and range joins.

The reference has no joins at all (SURVEY.md §2, verified: main.cc is the
whole engine); these generalize its surface per the north star. Everything is
declarative DataFrame composition so Catalyst picks broadcast vs sort-merge
vs shuffled-hash and AQE re-plans at runtime.

Scale notes (100 TB):
- Equi-joins: small dims must broadcast (``F.broadcast``) — at 100 TB fact
  scale the dims (region/nation/supplier/customer at TPC-H ratios) stay MBs
  to low GBs; broadcasting removes the fact-side shuffle entirely.
- Range joins: a naive theta join is a cartesian per key. We require an
  equi-key (user_id, partkey...) so the cross product is per-key only, and
  AQE skew-join splits hot keys. For keyless ranges, bucketize the range
  dimension (join on overlapping bucket + residual filter).
- As-of joins: implemented as a per-key window over the union of both
  streams — one shuffle on the key, no per-row subqueries, no driver
  involvement. This is merge_asof semantics at arbitrary scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["broadcast_star_join", "range_join", "asof_join"]


def broadcast_star_join(
    fact: DataFrame, dims: list[tuple[DataFrame, Column | str]]
) -> DataFrame:
    """Join a fact table against small dimensions, broadcasting each dim.

    ``dims`` is ``[(dim_df, on)]`` applied left-to-right. At 100 TB the fact
    never shuffles for these joins; each dim ships once per executor.
    """
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on=on)
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[str],
    range_cond: Column,
) -> DataFrame:
    """Equi-key join with an extra non-equi (range/theta) residual condition.

    Catalyst plans the equi part as a hash/sort-merge join and applies the
    range condition as a post-join filter on each key's group — the standard
    scalable shape for bounded-interval joins (events within N minutes, price
    between bounds). Keys keep the cross-product local; AQE handles skew.
    """
    cond = None
    for k in equi_keys:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    cond = range_cond if cond is None else cond & range_cond
    return left.join(right, on=cond)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` on the same key (``direction='backward'``;
    ``'forward'``: the earliest right row with ``ts >= left.ts``).

    Spark lacks a native as-of join. The scalable construction: union-tag
    both inputs, then one per-key window ordered by the *value* of the
    timestamp with ``rangeBetween(unboundedPreceding, 0)`` — range (not row)
    framing makes ties on ts behave exactly like the SQL correlated
    subquery ``right.ts <= left.ts``. The matched row is carried as
    ``max(struct(ts, payload...))`` over the frame, which is
    order-insensitive (deterministic under ties, resolved by the struct's
    lexicographic order over payload values). One shuffle on ``key``, no
    driver state — valid at any scale.

    Returns ``left.*`` plus ``asof_ts_us`` (matched right timestamp as a
    µs-epoch long) and ``asof_<c>`` for each requested right column; nulls
    where unmatched.
    """
    right_cols = right_cols or []
    sign = 1 if direction == "backward" else -1

    lhs = left.withColumn("__ord", sign * F.unix_micros(F.col(left_ts))).withColumn(
        "__match", F.lit(None).cast("long")
    )
    rhs = right.select(
        F.col(key),
        (sign * F.unix_micros(F.col(right_ts))).alias("__ord"),
        F.unix_micros(F.col(right_ts)).alias("__match"),
        *[F.col(c).alias(f"__p_{c}") for c in right_cols],
    )
    merged = lhs.unionByName(rhs, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy("__ord")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    best = F.max(
        F.when(
            F.col("__match").isNotNull(),
            F.struct(
                F.col("__ord").alias("o"),
                F.col("__match").alias("m"),
                *[F.col(f"__p_{c}").alias(c) for c in right_cols],
            ),
        )
    ).over(w)

    out = (
        merged.withColumn("__best", best)
        .filter(F.col("__match").isNull())  # keep only left rows
        .withColumn("asof_ts_us", F.col("__best.m"))
    )
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"__best.{c}"))
    drop = ["__ord", "__match", "__best"] + [f"__p_{c}" for c in right_cols]
    return out.drop(*drop)


def interval_bucket_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_gap_us: int,
) -> DataFrame:
    """KEYLESS bounded-range join: all (left, right) pairs with
    ``|left.ts - right.ts| <= max_gap_us`` — no equi key available.

    The scalable construction (SURVEY.md §2 join_range note): bucketize
    time into ``max_gap_us``-wide cells; a qualifying pair is always in the
    same or adjacent buckets, so exploding the left side into its bucket
    and both neighbors turns the theta join into an equi join on bucket id
    plus a residual filter. Cost: 3× the left rows shuffled on bucket —
    versus a cartesian product, which never finishes at scale. Buckets
    inherit time skew; AQE's skew-join splitting handles hot buckets.

    Inputs must carry µs-long timestamp columns. Output keeps all left and
    right columns (right's prefixed ``r_`` by the caller's select).
    """
    lb = left.withColumn("_lb", (F.col(left_ts) / F.lit(max_gap_us)).cast("long"))
    probe = lb.withColumn(
        "_bucket", F.explode(F.array(F.col("_lb") - 1, F.col("_lb"), F.col("_lb") + 1))
    ).drop("_lb")
    rb = right.withColumn(
        "_bucket", (F.col(right_ts) / F.lit(max_gap_us)).cast("long")
    )
    return (
        probe.join(rb, "_bucket")
        .filter(
            F.abs(F.col(left_ts) - F.col(right_ts)) <= max_gap_us
        )
        .drop("_bucket")
    )
