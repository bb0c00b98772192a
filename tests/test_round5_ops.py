"""Property tests for the round-5 operators (BM25, Count-Min-Sketch,
source-overlap). Value parity vs DuckDB is covered by the parametrized
oracle sweep (test_oracle_parity.py); these pin the semantic invariants
that a hash match alone would not explain to a reader."""

from mapreduce_model_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_cms_never_underestimates(spark):
    """Count-Min is one-sided: the sketch estimate is >= the exact count
    for every word (collisions only ever ADD mass), and with 4 rows the
    min over rows must be tight for at least some words."""
    rows = QUERIES["cms_heavy_hitters"](spark, SF).collect()
    assert len(rows) == 20
    assert all(r["cms_est"] >= r["n"] for r in rows), rows
    assert any(r["cms_est"] == r["n"] for r in rows)


def test_bm25_topk_is_ranked_and_positive(spark):
    rows = QUERIES["bm25_topk"](spark, SF).collect()
    assert len(rows) == 20
    scores = [r["bm25"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # deterministic tie-break: (score desc, doc_id asc)
    for a, b in zip(rows, rows[1:]):
        if a["bm25"] == b["bm25"]:
            assert a["doc_id"] < b["doc_id"]


def test_source_overlap_is_valid_jaccard(spark):
    rows = QUERIES["source_overlap"](spark, SF).collect()
    assert rows, "synthetic sources share vocabulary — overlap must exist"
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["n_shared"] >= 1


def test_lm_perplexity_bounds(spark):
    """ppl = exp(-mean ln p) with p < 1 strictly, so ppl > 1 for every
    doc; docs with < 2 words produce no row."""
    rows = QUERIES["lm_perplexity"](spark, SF).collect()
    assert rows
    assert all(r["ppl"] > 1.0 for r in rows)
    assert all(r["n_bigrams"] >= 1 for r in rows)


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    """The smallest doc_id with shingles sees everything first: its
    novelty must be exactly 1.0; all ratios live in [0, 1]."""
    rows = QUERIES["ngram_novelty"](spark, SF).collect()
    assert rows
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    assert by_id[0]["novelty"] == 1.0
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert 0 <= r["n_novel"] <= r["n_shingles"]
