"""Salted aggregation must be result-identical to the unsalted plan —
salting is a physical rewrite, never a semantic one."""

from pyspark.sql import functions as F

from mapreduce_model_spark.operators.inverted_index import word_doc_pairs
from mapreduce_model_spark.operators.skew import (
    salted_join,
    salted_collect_set,
    salted_count_distinct,
)
from mapreduce_model_spark.registry import table


def test_salted_collect_set_equals_unsalted(spark, sf_dir):
    pairs = word_doc_pairs(table(spark, sf_dir, "documents"))
    plain = {
        r.word: list(r.vals)
        for r in pairs.groupBy("word")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("vals"))
        .collect()
    }
    salted = {
        r.word: list(r.vals)
        for r in salted_collect_set(
            pairs, keys=["word"], value="doc_id", n_salts=7
        ).collect()
    }
    assert salted == plain


def test_salted_count_distinct_is_exact(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    plain = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    salted = {
        r.event_type: r.n_distinct
        for r in salted_count_distinct(
            ev, keys=["event_type"], value="user_id", n_salts=5
        ).collect()
    }
    assert salted == plain


def test_salt_is_deterministic(spark, sf_dir):
    """Same input → same salt (retry/speculation safety): two evaluations
    of the salted phase-1 produce identical partials."""
    pairs = word_doc_pairs(table(spark, sf_dir, "documents")).limit(500)
    a = salted_collect_set(pairs, ["word"], "doc_id", n_salts=4).collect()
    b = salted_collect_set(pairs, ["word"], "doc_id", n_salts=4).collect()
    assert sorted((r.word, tuple(r.vals)) for r in a) == sorted(
        (r.word, tuple(r.vals)) for r in b
    )


def test_salted_join_matches_plain_join(spark, sf_dir):
    """salted_join == plain join, row for row — on inner and left, with a
    dim missing some keys (left-null path) and a skewed fact key."""
    from mapreduce_model_spark.registry import table
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    # dim deliberately missing some keys so 'left' exercises null-padding
    part_dim = (
        table(spark, sf_dir, "part")
        .select("p_partkey", "p_brand")
        .filter(F.col("p_partkey") % 3 != 0)
    )
    for how in ("inner", "left"):
        plain = li.join(
            part_dim, li.l_partkey == part_dim.p_partkey, how
        ).select("l_orderkey", "l_linenumber", "l_partkey", "p_brand")
        salted = salted_join(
            li, part_dim.withColumnRenamed("p_partkey", "l_partkey"),
            key="l_partkey", n_salts=7, how=how,
        ).select("l_orderkey", "l_linenumber", "l_partkey", "p_brand")
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        ), how


def test_salted_join_rejects_unsupported_how(spark):
    import pytest as _pytest

    df = spark.range(5).withColumn("v", F.col("id"))
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, key="id", how="full")


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling — the engine's first line of defense for hot
    keys at 100 TB — must actually fire: a join where one key holds 80% of
    the rows gets its oversized partition split at runtime
    (SortMergeJoin(skew=true) + AQEShuffleRead 'skewed' in the final
    plan), with correct results. Salting (salted_join) remains the
    explicit fallback for holistic aggs and cases AQE can't split."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(500_000).select(
            F.when(F.rand(1) < 0.8, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(2000).select(
            (F.col("id") % 1000).alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(dim, "k").groupBy().count()
        assert j.collect()[0][0] == 1_000_000  # every row matches 2 dim rows
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p
        assert "skew=true" in p, p
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
