"""Streaming-window queries, driver-checked via batch equivalence.

``window()``/``session_window()`` compute identical results on batch and
streaming frames (same expressions, same shuffle); the driver oracle checks
the batch path against DuckDB window math, and tests/test_streaming.py runs
the REAL readStream path to completion and asserts it equals the batch
result (batch/stream parity, SURVEY.md §5 port strategy)."""

from __future__ import annotations

from mapreduce_model_spark.registry import query, table
from mapreduce_model_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)


@query(
    "stream_tumbling",
    oracle="""
SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP)                        AS w_start,
       CAST(time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS TIMESTAMP) AS w_end,
       event_type,
       count(*) AS n,
       round(1e-9 + sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def stream_tumbling(spark, sf_dir):
    return tumbling_agg(table(spark, sf_dir, "events"), width="5 minutes")


@query(
    "stream_sliding",
    oracle="""
WITH expanded AS (
    SELECT CAST(time_bucket(INTERVAL '5 minutes', ts)
                - k * INTERVAL '5 minutes' AS TIMESTAMP) AS w_start,
           value
    FROM events CROSS JOIN range(0, 2) t(k)
)
SELECT w_start,
       w_start + INTERVAL '10 minutes' AS w_end,
       count(*) AS n,
       round(1e-9 + sum(value), 2) AS sum_value
FROM expanded
GROUP BY 1, 2
""",
)
def stream_sliding(spark, sf_dir):
    """10-min windows sliding by 5 — every event in exactly 2 windows (the
    oracle enumerates both aligned buckets per event)."""
    return sliding_agg(table(spark, sf_dir, "events"), width="10 minutes", slide="5 minutes")


@query(
    "stream_session",
    oracle="""
WITH e AS (
    SELECT user_id, epoch_us(ts) AS us, value FROM events
), flagged AS (
    SELECT *, CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS new_s
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
), sess AS (
    SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       min(us)              AS s_start_us,
       max(us) + 1800000000 AS s_end_us,
       count(*)             AS n,
       round(1e-9 + sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, sid
""",
)
def stream_session(spark, sf_dir):
    """Gap-based session windows (30 min) per user — session_window end is
    last event + gap, matching the lag/cumsum construction exactly."""
    return session_agg(table(spark, sf_dir, "events"), gap="30 minutes")


@query(
    "stream_attribution",
    oracle="""
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id  AS user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND epoch_us(c.ts) <= epoch_us(p.ts)
 AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
""",
)
def stream_attribution(spark, sf_dir):
    """Batch face of the stream-stream interval join (streaming/joins.py):
    purchases attributed to same-user clicks in the prior 30 minutes. The
    real watermarked stream-stream path runs in test_streaming.py and must
    emit exactly these rows."""
    from mapreduce_model_spark.streaming.joins import click_purchase_attribution

    out = click_purchase_attribution(table(spark, sf_dir, "events"), lookback="30 minutes")
    return out.select("purchase_id", "click_id", "user_id", "gap_us")


@query(
    "stream_dedup",
    oracle="""
SELECT event_id, user_id, event_type, round(1e-9 + value, 2) AS value
FROM events
""",
)
def stream_dedup(spark, sf_dir):
    """Batch face of streaming exact dedup for at-least-once sources: the
    input is the events feed redelivered twice (union with itself — the
    at-least-once failure mode), the output is each event exactly once.
    Duplicate rows are bit-identical, so ``dropDuplicates`` on the key is
    deterministic and the oracle is simply the original feed.

    The REAL streaming path — ``withWatermark + dropDuplicatesWithinWatermark``
    so dedup state is bounded by the watermark horizon instead of growing
    with the whole stream — runs in tests/test_streaming.py
    (test_stream_dedup_parity / test_streaming_dedup_within_watermark) and
    must emit exactly these rows. Scale: one shuffle on event_id; state
    per key is just the key + expiry timestamp."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    redelivered = ev.unionByName(ev)
    return redelivered.dropDuplicates(["event_id"]).select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") + 1e-9, 2).alias("value"),
    )


@query(
    "stream_attribution_unmatched",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id AS user_id
FROM events p
WHERE p.event_type = 'purchase'
  AND NOT EXISTS (
    SELECT 1 FROM events c
    WHERE c.event_type = 'click' AND c.user_id = p.user_id
      AND epoch_us(c.ts) <= epoch_us(p.ts)
      AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
  )
""",
)
def stream_attribution_unmatched(spark, sf_dir):
    """Batch face of the left-outer stream-stream join's null-preserved
    side (streaming/joins.py unattributed_purchases): purchases with no
    same-user click in the prior 30 minutes. The streaming path — where
    outer rows are emitted only after the watermark proves no match can
    arrive, keeping join state finite — runs in test_streaming.py and
    must emit exactly these rows (modulo the still-open watermark tail)."""
    from mapreduce_model_spark.streaming.joins import unattributed_purchases

    out = unattributed_purchases(table(spark, sf_dir, "events"), lookback="30 minutes")
    return out.select("purchase_id", "user_id")
