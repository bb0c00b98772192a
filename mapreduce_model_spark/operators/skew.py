"""Skew-handling operators — salted two-phase aggregation.

Why this exists: Spark's map-side partial aggregation already neutralizes
skew for *algebraic* aggregates (sum/count/min/max — partials are tiny), and
AQE splits skewed sort-merge join partitions. The remaining hole is
*holistic* aggregation on hot keys: ``collect_set('the')`` over a 100 TB
corpus funnels ~every doc id through one reducer task, no matter how many
executors exist (the reference hits the same wall — its hot-word postings
are built inside one mutex region, main.cc:120-127, and `the:[1 2 3 ...]`
spans every document, checker/test_out/t.txt).

Salting splits each hot key into ``n_salts`` synthetic sub-keys for a first
collect, then merges the (already-deduplicated, far smaller) partial arrays
in a second pass. Cost: one extra narrow shuffle of partial arrays. Result:
per-task state is bounded by |values|/n_salts for the hottest key.

The salt must be a *deterministic function of the value* (not rand()):
retries/speculative tasks then re-produce identical partials, and the salt
spreads a key's values uniformly without breaking exactly-once semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value: str,
    n_salts: int = 16,
    sort: bool = True,
) -> DataFrame:
    """``groupBy(keys).agg(sort_array(collect_set(value)))`` with bounded
    per-task state: phase 1 collects per (keys, salt), phase 2 merges the
    ≤ n_salts partial arrays per key.

    Output: keys + ``vals`` (array, sorted ascending when ``sort``).
    Equivalent results to the unsalted plan — asserted in tests and by the
    driver oracle (the salted inverted index shares the unsalted oracle).
    """
    salt = F.pmod(F.hash(F.col(value)), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(*keys, F.col(value), salt)
        .groupBy(*keys, "_salt")
        .agg(F.collect_set(value).alias("_partial"))
    )
    merged = F.array_distinct(F.flatten(F.collect_list("_partial")))
    if sort:
        merged = F.sort_array(merged)
    return phase1.groupBy(*keys).agg(merged.alias("vals"))


def salted_count_distinct(
    df: DataFrame, keys: list[str], value: str, n_salts: int = 16
) -> DataFrame:
    """Exact count(DISTINCT value) per key with bounded state: phase 1
    dedups within (keys, salt) — values land in exactly one salt, so the
    per-key sum of partial distinct counts is exact."""
    salt = F.pmod(F.hash(F.col(value)), F.lit(n_salts))
    phase1 = (
        df.select(*keys, F.col(value), salt.alias("_salt"))
        .groupBy(*keys, "_salt")
        .agg(F.countDistinct(value).alias("_n"))
    )
    return phase1.groupBy(*keys).agg(F.sum("_n").alias("n_distinct"))


def salted_key(col: Column | str, n_salts: int) -> Column:
    """Deterministic salt bucket for join-side replication patterns: the
    skewed fact side appends this to its key; the small side is exploded
    across all n_salts buckets. (For dims under the broadcast threshold,
    broadcast — don't salt.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c), F.lit(n_salts))
