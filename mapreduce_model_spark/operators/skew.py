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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Skew-proof equi join: the fact side salts each row into one of
    ``n_salts`` sub-keys (deterministic hash of a high-cardinality fact
    column — ``salt_col``, default the fact's first non-key column), and the
    dim side is replicated across ALL sub-keys, so a hot join key's rows
    spread over n_salts tasks instead of one.

    Use when the dim is too big to broadcast AND the fact key is skewed
    beyond what AQE's skew-join splitting handles (AQE splits partitions,
    not single hot KEYS feeding a hash join). Cost: dim shuffled ×n_salts.
    Supports 'inner' and 'left' (fact-preserving) joins — the salt spread
    never drops or duplicates fact rows because each fact row lands in
    exactly one sub-key.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    basis = salt_col or next(c for c in fact.columns if c != key)
    salted_fact = fact.withColumn("_salt", salted_key(basis, n_salts))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(replicated_dim, [key, "_salt"], how)
    return out.drop("_salt")
