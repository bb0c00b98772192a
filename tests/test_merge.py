"""merge_upsert operator contract (operators/merge.py)."""

import pytest

from mapreduce_model_spark.operators.merge import merge_upsert


def test_merge_replaces_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, updates, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_compound_key(spark):
    target = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], "k int, s string, v double")
    updates = spark.createDataFrame([(1, "y", 9.0)], "k int, s string, v double")
    out = {(r.k, r.s): r.v for r in merge_upsert(target, updates, ["k", "s"]).collect()}
    assert out == {(1, "x"): 1.0, (1, "y"): 9.0}


def test_merge_rejects_missing_columns(spark):
    target = spark.createDataFrame([(1, 1.0)], "k int, v double")
    updates = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="missing merge columns"):
        merge_upsert(target, updates, "k")


def test_merge_ignores_extra_update_columns(spark):
    target = spark.createDataFrame([(1, 1.0)], "k int, v double")
    updates = spark.createDataFrame([(2, 5.0, "extra")], "k int, v double, junk string")
    merged = merge_upsert(target, updates, "k")
    assert merged.columns == ["k", "v"]
    assert merged.count() == 2


def test_global_ordered_ids_match_sort_order(spark, sf_dir):
    """Ids are 1..N, contiguous, and follow the (source, doc_id) total
    order exactly (operators/ids.py)."""
    from mapreduce_model_spark.operators.ids import global_ordered_ids
    from mapreduce_model_spark.registry import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    out = global_ordered_ids(docs, ["source", "doc_id"], num_partitions=7).collect()
    assert len(out) == docs.count()
    by_id = sorted(out, key=lambda r: r.row_id)
    assert [r.row_id for r in by_id] == list(range(1, len(out) + 1))
    assert [(r.source, r.doc_id) for r in by_id] == sorted(
        (r.source, r.doc_id) for r in out
    )


def test_merge_apply_cdc_full_feed(spark):
    """Insert + update + delete in one feed: delete removes, update
    replaces, insert appends."""
    from mapreduce_model_spark.operators.merge import merge_apply_cdc

    target = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double")
    changes = spark.createDataFrame(
        [(1, None, "D"), (2, 25.0, "U"), (9, 90.0, "I")],
        "k int, v double, op string",
    )
    got = {r.k: r.v for r in merge_apply_cdc(target, changes, "k").collect()}
    assert got == {2: 25.0, 3: 30.0, 9: 90.0}


def test_merge_apply_cdc_null_op_is_ignored_not_deleted(spark):
    """A malformed feed row (NULL op) must be a no-op — the key stays in
    the target with its ORIGINAL value (regression: building the anti-join
    key set from raw changes silently deleted it)."""
    from mapreduce_model_spark.operators.merge import merge_apply_cdc

    target = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    changes = spark.createDataFrame([(1, 99.0, None)], "k int, v double, op string")
    got = {r.k: r.v for r in merge_apply_cdc(target, changes, "k").collect()}
    assert got == {1: 10.0, 2: 20.0}


def test_global_ordered_ids_edge_shapes(spark):
    """The narrow Arrow numbering pass must survive empty inputs and more
    partitions than rows (empty partitions yield no batches)."""
    from mapreduce_model_spark.operators.ids import global_ordered_ids

    empty = spark.createDataFrame([], "k long, s string")
    assert global_ordered_ids(empty, ["k"]).collect() == []

    tiny = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "k long, s string")
    out = sorted(global_ordered_ids(tiny, ["k"], num_partitions=8).collect())
    assert [(r.k, r.s, r.row_id) for r in out] == [
        (1, "a", 1),
        (2, "b", 2),
        (3, "c", 3),
    ]
