"""Property-based tests (hypothesis): independent oracles for operators
whose SQL oracle shares construction logic with the implementation."""

import os
import tempfile

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_model_spark.operators.joins import asof_join
from mapreduce_model_spark.sources.manifest import read_manifest

events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25
)
quotes = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1000), st.floats(0, 100)),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ev=events, qt=quotes, direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_merge_asof(spark, ev, qt, direction):
    """asof_join == pandas merge_asof (both directions) on arbitrary
    inputs — an oracle with a completely independent implementation."""
    ldf = (
        pd.DataFrame(ev, columns=["key", "ts_s"])
        .drop_duplicates()
        .reset_index(drop=True)
    )
    ldf["event_id"] = ldf.index
    rdf = (
        pd.DataFrame(qt, columns=["key", "ts_s", "price"])
        .drop_duplicates(["key", "ts_s"])
        .astype({"key": "int64", "ts_s": "int64", "price": "float64"})
    )
    ldf = ldf.astype({"key": "int64", "ts_s": "int64", "event_id": "int64"})

    left = spark.createDataFrame(ldf).withColumn("ts", F.timestamp_seconds("ts_s"))
    right = (
        spark.createDataFrame(rdf)
        if len(rdf)
        else spark.createDataFrame([], "key: long, ts_s: long, price: double")
    ).withColumn("ts", F.timestamp_seconds("ts_s"))

    got = {
        r.event_id: r.asof_price
        for r in asof_join(
            left, right, key="key", right_cols=["price"], direction=direction
        ).collect()
    }

    expected_df = pd.merge_asof(
        ldf.sort_values("ts_s"),
        rdf.sort_values("ts_s"),
        on="ts_s",
        by="key",
        direction=direction,
    )
    expected = {
        int(r.event_id): (None if pd.isna(r.price) else float(r.price))
        for r in expected_df.itertuples()
    }
    assert got == expected


def test_read_manifest_errors(tmp_path):
    missing = tmp_path / "m1.txt"
    missing.write_text("2\nnope_a.txt\nnope_b.txt\n")
    with pytest.raises(FileNotFoundError):
        read_manifest(str(missing))

    short = tmp_path / "m2.txt"
    short.write_text("3\nonly_one.txt\n")
    with pytest.raises(ValueError):
        read_manifest(str(short))

    empty = tmp_path / "m3.txt"
    empty.write_text("")
    with pytest.raises(ValueError):
        read_manifest(str(empty))


def test_read_paths_special_chars_and_duplicates(spark, tmp_path):
    """Paths with spaces/plus survive the input_file_name URI round trip
    (a manifest cannot express space paths — operator>> tokenization — so
    this exercises the programmatic read_paths front door), and a path
    listed twice is two documents, each with the lines ONCE."""
    d = tmp_path / "corpus dir"
    d.mkdir()
    (d / "my doc.txt").write_text("alpha beta\ngamma\n")
    (d / "a+b.txt").write_text("delta\n")
    from mapreduce_model_spark.sources.manifest import read_paths

    rows = read_paths(
        spark,
        [str(d / "my doc.txt"), str(d / "a+b.txt"), str(d / "my doc.txt")],
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.text)
    assert sorted(by_doc) == [1, 2, 3]
    assert sorted(by_doc[1]) == ["alpha beta", "gamma"]  # once, not doubled
    assert by_doc[2] == ["delta"]
    assert sorted(by_doc[3]) == ["alpha beta", "gamma"]  # dup entry = own doc


def test_read_corpus_duplicate_manifest_entries(spark, tmp_path):
    """Manifest path: duplicate entries are distinct documents with the
    file's lines exactly once each (no read-twice doubling)."""
    f = tmp_path / "doc.txt"
    f.write_text("one two\nthree\n")
    manifest = tmp_path / "m.txt"
    manifest.write_text(f"2\n{f}\n{f}\n")
    from mapreduce_model_spark.sources.manifest import read_corpus

    rows = read_corpus(spark, str(manifest)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.text)
    assert sorted(by_doc) == [1, 2]
    for i in (1, 2):
        assert sorted(by_doc[i]) == ["one two", "three"]


def test_except_set_semantics_with_duplicates(spark):
    """EXCEPT (set semantics): a left row with ANY right match disappears
    even when the left holds it more times than the right."""
    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], "v: long")
    right = spark.createDataFrame([(1,), (3,)], "v: long")
    got = sorted(r.v for r in left.subtract(right).collect())
    assert got == [2]


graphs = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=0, max_size=60
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=graphs, gate=st.sampled_from([None, 0, 10]))
def test_connected_components_property(spark, edges, gate):
    """CC == driver union-find on arbitrary graphs for ALL three code
    paths: immediate local finish (gate=None), forced-distributed
    (gate=0), and mid-loop local finish (gate=10: small graphs finish
    immediately, larger ones contract first)."""
    from mapreduce_model_spark.operators.graph import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {n for ab in edges for n in ab if ab[0] != ab[1]}
    exp = {n: find(n) for n in touched}

    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)],
        "id_a: long, id_b: long",
    )
    got = {
        r.node: r.component
        for r in connected_components(e, small_graph_rows=gate).collect()
    }
    assert {n: got[n] for n in touched} == exp


intervals = st.lists(st.integers(0, 500), min_size=1, max_size=40)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(starts=intervals)
def test_sweep_line_matches_simulation(spark, starts):
    """The sweep-line construction used by max_concurrent_intervals,
    rebuilt on arbitrary second-offsets, must equal a direct sweep
    simulation — including heavy tie pileups hypothesis loves to plant."""
    import datetime as dt

    from pyspark.sql import Window

    base = dt.datetime(2024, 6, 1)
    rows = [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(starts)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    opens = df.select(F.col("ts").alias("t"), F.lit(1).alias("d"))
    closes = df.select(
        (F.col("ts") + F.expr("INTERVAL 300 SECOND")).alias("t"),
        F.lit(-1).alias("d"),
    )
    w = Window.orderBy("t", "d")
    got = (
        opens.unionAll(closes)
        .withColumn("c", F.sum("d").over(w))
        .agg(F.max("c"))
        .first()[0]
    )

    pts = [(s, 1) for s in starts] + [(s + 300, -1) for s in starts]
    cur = best = 0
    for _, d in sorted(pts):
        cur += d
        best = max(best, cur)
    assert got == best


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(st.integers(0, 1000), st.none()), min_size=1, max_size=60
    ),
    parts=st.integers(1, 6),
)
def test_global_prefix_sums_property(spark, vals, parts):
    """Two-phase exclusive prefix sum == a plain python running sum, for
    arbitrary values (nulls contribute 0) and partition counts — the
    partition-boundary bases and the Arrow cumsum have completely
    independent recomputation here."""
    from mapreduce_model_spark.operators.ids import global_prefix_sums

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    got = {
        r["k"]: r["cum_before"]
        for r in global_prefix_sums(
            df, ["k"], "v", num_partitions=parts
        ).collect()
    }
    acc, exp = 0, {}
    for i, v in enumerate(vals):
        exp[i] = acc
        acc += v or 0
    assert got == exp


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False), min_size=6, max_size=6
    ),
    radius=st.integers(1, 2),
)
def test_probe_buckets_is_exact_hamming_ball(spark, vec, radius):
    """probe_buckets must emit EXACTLY the Hamming ball of the vector's
    sign bucket: all distinct, every key within `radius` flips, every
    such key present — checked against an independent itertools
    enumeration."""
    from itertools import combinations

    from mapreduce_model_spark.operators.similarity import (
        probe_buckets,
        sign_bucket,
    )

    bits = 6
    df = spark.createDataFrame([(vec,)], "v array<double>")
    row = df.select(
        sign_bucket(F.col("v"), bits).alias("b"),
        probe_buckets(sign_bucket(F.col("v"), bits), bits, radius=radius).alias(
            "probes"
        ),
    ).first()
    bucket, probes = row["b"], row["probes"]
    expected = {bucket}
    for r in range(1, radius + 1):
        for idxs in combinations(range(bits), r):
            chars = list(bucket)
            for i in idxs:
                chars[i] = "0" if chars[i] == "1" else "1"
            expected.add("".join(chars))
    assert len(probes) == len(set(probes))  # distinct
    assert set(probes) == expected
