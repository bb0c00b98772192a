"""Approximate operators carry no oracle — their contract is bounded error
vs the exact answer, asserted here."""

from pyspark.sql import functions as F

from mapreduce_model_spark.registry import QUERIES, table


def test_approx_distinct_error_bounds(spark, sf_dir):
    """HLL++ at rsd=0.01 must land within 5% of exact counts; the KLL
    median within the central half of the distribution."""
    row = QUERIES["approx_distinct"](spark, sf_dir).collect()[0]
    li = table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("median"),
        F.expr("percentile(l_extendedprice, 0.25D)").alias("q1"),
        F.expr("percentile(l_extendedprice, 0.75D)").alias("q3"),
    ).collect()[0]
    assert abs(row.approx_orders - exact.orders) / exact.orders <= 0.05
    assert abs(row.approx_parts - exact.parts) / exact.parts <= 0.05
    assert exact.q1 <= row.median_price <= exact.q3


def test_histogram_quantiles_within_one_bin(spark, sf_dir):
    """Merged-histogram quantile estimates must land within one bin width
    (5000) of the exact percentile at every level — the estimator's error
    contract."""
    got = {r.p: r.est for r in QUERIES["quantile_mergeable_histogram"](spark, sf_dir).collect()}
    li = table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D, 0.99D))"
        ).alias("q")
    ).collect()[0].q
    assert set(got) == {0.25, 0.5, 0.75, 0.95, 0.99}
    for p, ex in zip([0.25, 0.5, 0.75, 0.95, 0.99], exact):
        assert abs(got[p] - ex) <= 5000, (p, got[p], ex)


def test_oph_estimator_tracks_exact_jaccard(spark, sf_dir):
    """The OPH bin-agreement estimator must track exact shingle Jaccard
    like classic MinHash does: on every blocked pair with a known exact
    J (ngram_jaccard's output), |OPH est − exact| stays within the
    k=32 sketch's sampling error, and the mean absolute error is small —
    the accuracy contract that justifies the k-fold-cheaper sketch."""
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    assert exact, "corpus has no blocked near-dup pairs to test against"
    sigs = {
        r.doc_id: r.sig.split(",")
        for r in QUERIES["dedup_minhash_oph"](spark, sf_dir).collect()
    }
    errs = []
    for (a, b), j in exact.items():
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / 32
        errs.append(abs(est - j))
    # per-pair: 4 sigma of a Binomial(32, J≈0.5) proportion ≈ 0.35
    assert max(errs) <= 0.35, max(errs)
    assert sum(errs) / len(errs) <= 0.15, sum(errs) / len(errs)
