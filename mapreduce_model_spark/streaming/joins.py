"""Stream-stream joins — watermarked interval join (attribution shape).

The canonical streaming join: purchases matched to the same user's clicks
in the preceding lookback window. Stream-stream inner joins require BOTH
sides watermarked plus a time-range join condition — that pair is what lets
the state store evict rows once the watermark passes the range, keeping
join state finite on an unbounded stream (without them Spark rejects the
query outright in append mode).

Batch/stream parity (SURVEY.md §5): the same builder runs on batch frames
(no watermark needed) and streaming frames — identical results once the
stream drains, which is the test contract.

Scale: state per side ≈ rate × (watermark + lookback) rows, shuffled on
user_id; a hot user concentrates state on one partition — salt the key in
the upstream select if one user exceeds an executor's state budget (same
note as streaming/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["click_purchase_attribution", "unattributed_purchases"]


def click_purchase_attribution(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Purchases joined to the same user's clicks within ``lookback`` before
    the purchase. ``events`` may be batch or streaming; watermarks are
    attached only on the streaming path.

    ``how='left_outer'`` keeps purchases with NO qualifying click
    (null click columns). On a stream, outer rows are emitted only once
    the watermark proves no matching click can still arrive — the state
    store holds a purchase exactly until watermark > purchase_ts (later
    clicks are outside the range condition), which is what keeps outer
    join state finite.

    Returns (purchase_id, click_id, user_id, purchase_ts, click_ts,
    gap_us ≥ 0; click_id/click_ts/gap_us null for outer-preserved rows).
    """
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    if events.isStreaming:
        purchases = purchases.withWatermark("ts", watermark)
        clicks = clicks.withWatermark("ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")),
        how,
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


def unattributed_purchases(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Purchases with NO same-user click in the preceding ``lookback`` —
    the remarketing/organic-conversion signal, as the null-preserved side
    of the watermarked left-outer stream-stream join (anti-join semantics
    that work on an unbounded stream; a true anti join is not available
    stream-stream)."""
    out = click_purchase_attribution(events, lookback, watermark, how="left_outer")
    return out.filter(F.col("click_id").isNull()).select(
        "purchase_id", "user_id", "purchase_ts"
    )
