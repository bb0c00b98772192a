"""Round-6 operator pins: the rfm_segments scale twin and multi-probe LSH.

Pattern: rows-only registered queries get an INDEPENDENT local recompute
pin (pandas/python), same as kmeans (numpy) and dedup_clusters (union-find)
— the query is approximate/window-free by design, so correctness is "the
distributed plan computes exactly what the reference implementation of the
same algorithm computes", not a SQL hash.
"""

from pyspark.sql import functions as F

from mapreduce_model_spark.registry import QUERIES


def test_rfm_scaled_matches_pandas_recompute(spark, sf_dir):
    """Collect the |users| frame (tiny at sf0.001), fetch the SAME GK
    boundaries Spark used, score with the same 1 + #(value > boundary)
    rule in plain python, and compare the segment roll-up exactly."""
    from mapreduce_model_spark.queries_pipeline import (
        _RFM_ACC,
        _RFM_QS,
        _rfm_per_user,
    )

    per_user_df = _rfm_per_user(spark, sf_dir)
    bounds = per_user_df.agg(
        F.percentile_approx("recency_days", _RFM_QS, _RFM_ACC).alias("rb"),
        F.percentile_approx("frequency", _RFM_QS, _RFM_ACC).alias("fb"),
        F.percentile_approx("monetary", _RFM_QS, _RFM_ACC).alias("mb"),
    ).first()
    per_user = per_user_df.toPandas()

    def score(v, bs):
        return 1 + sum(1 for b in bs if v > b)

    expected: dict[str, list] = {}
    for row in per_user.itertuples():
        seg = "{}-{}-{}".format(
            6 - score(row.recency_days, bounds["rb"]),
            score(row.frequency, bounds["fb"]),
            score(row.monetary, bounds["mb"]),
        )
        expected.setdefault(seg, []).append(row.monetary)

    got = {
        r["segment"]: r
        for r in QUERIES["rfm_segments_scaled"](spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for seg, vals in expected.items():
        assert got[seg]["n_users"] == len(vals)
        assert abs(got[seg]["avg_monetary"] - sum(vals) / len(vals)) < 1e-6
    # every axis score must be a real quintile label
    for seg in got:
        r, f, m = seg.split("-")
        assert {int(r), int(f), int(m)} <= {1, 2, 3, 4, 5}


def test_rfm_scaled_agrees_with_exact_twin_on_totals(spark, sf_dir):
    """Same universe: both twins partition the identical user set, so the
    n_users totals and the global monetary mass must agree exactly."""
    exact = QUERIES["rfm_segments"](spark, sf_dir).collect()
    scaled = QUERIES["rfm_segments_scaled"](spark, sf_dir).collect()
    assert sum(r["n_users"] for r in exact) == sum(r["n_users"] for r in scaled)
    mass_e = sum(r["n_users"] * r["avg_monetary"] for r in exact)
    mass_s = sum(r["n_users"] * r["avg_monetary"] for r in scaled)
    assert abs(mass_e - mass_s) / max(abs(mass_e), 1.0) < 1e-3
