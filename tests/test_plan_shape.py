"""Physical-plan regression tests — the 100 TB scale contract.

Correctness tests say the answers are right; these say the *plans* are the
ones that survive a 1000-executor cluster: small dimensions broadcast
(never shuffled), predicates and projections reach the parquet scan, and
nothing degenerates into an unblocked cartesian product. A regression here
is a performance bug even when every value still matches the oracle.
"""

import pytest
from pyspark.sql import functions as F

from mapreduce_model_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


# Session-wide memo: three registry-wide guards (cartesian, global-window
# funnel, row-at-a-time Python) each walk all ~190 plans; building and
# explaining a plan is pure (same session, same SF), so cache by name —
# saves ~2 min of identical work per suite run (r6 review).
_PLAN_CACHE: dict[str, str] = {}


def plan(spark, name: str) -> str:
    if name not in _PLAN_CACHE:
        df = QUERIES[name](spark, SF)
        _PLAN_CACHE[name] = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    return _PLAN_CACHE[name]


def test_join_multi_broadcasts_all_dims(spark):
    """orders⋈customer⋈nation⋈region: every dim side must broadcast — a
    sort-merge join against a 25-row nation table means statistics or the
    broadcast threshold broke."""
    p = plan(spark, "join_multi")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_join_inner_is_not_sort_merge(spark):
    p = plan(spark, "join_inner")
    assert "BroadcastHashJoin" in p


def test_groupby_agg_pushes_filter_and_partial_agg(spark):
    """TPC-H Q1 shape: the shipdate predicate must reach the scan, and the
    aggregate must be two-phase (map-side partial before the exchange)."""
    p = plan(spark, "groupby_agg")
    assert "LessThanOrEqual(l_shipdate" in p
    assert p.count("HashAggregate") >= 2


def test_scan_project_prunes_columns(spark):
    """A 4-column projection must not read the other 12 lineitem columns."""
    p = plan(spark, "scan_project")
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema
    assert "l_shipdate" not in read_schema


def test_filter_pred_pushes_predicates(spark):
    p = plan(spark, "filter_pred")
    assert "PushedFilters: [" in p
    # at least one real (non-IsNotNull) predicate reached the scan
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert any(
        ("GreaterThan" in l) or ("LessThan" in l) or ("In(" in l) or ("EqualTo" in l)
        for l in pushed
    ), pushed


def test_similarity_topk_broadcasts_queries(spark):
    """Brute-force cosine top-k: the tiny query-vector side is broadcast;
    the corpus is streamed once. BroadcastNestedLoopJoin is the *intended*
    physical shape; an unhinted CartesianProduct is not."""
    p = plan(spark, "similarity_topk")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_no_query_uses_cartesian_product(spark):
    """No registered query may degenerate into a non-broadcast cartesian
    product — at 100 TB that plan never finishes."""
    offenders = []
    for name in sorted(QUERIES):
        if "CartesianProduct" in plan(spark, name):
            offenders.append(name)
    assert offenders == []


def test_inverted_index_single_wide_shuffle(spark):
    """distinct + groupBy('word') must collapse onto one hash exchange of
    the pair stream (plus the presentation sort) — two data shuffles of the
    full pair set would double network cost at scale."""
    p = plan(spark, "inverted_index")
    assert p.count("hashpartitioning") <= 2, p


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    """Hive-partitioned layout + a partition-column predicate must prune at
    planning time: the scan's partition filter appears in the plan and only
    the matching directory's files are read."""
    from mapreduce_model_spark.operators.inverted_index import invert
    from mapreduce_model_spark.registry import table as t

    idx = invert(t(spark, SF, "documents")).select("letter", "word", "n_docs")
    out = str(tmp_path / "by_letter")
    idx.write.mode("overwrite").partitionBy("letter").parquet(out)

    q = spark.read.parquet(out).filter(F.col("letter") == "s").select("word")
    p = spark._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in p
    assert "isnotnull(letter" in p or "letter" in p.split("PartitionFilters")[1][:200]
    n_s = q.count()
    assert n_s == idx.filter(F.col("letter") == "s").count()


def test_keyless_range_join_is_not_cartesian(spark):
    p = plan(spark, "join_range_keyless")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_decontaminate_exact_broadcasts_eval_side(spark):
    """The eval hash set must broadcast into the anti join: the (100 TB)
    training side may never shuffle for decontamination."""
    p = plan(spark, "decontaminate_exact")
    assert "BroadcastHashJoin" in p
    assert "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_decontaminate_ngram_broadcasts_eval_shingles(spark):
    p = plan(spark, "decontaminate_ngram")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_merge_upsert_broadcasts_changeset(spark):
    """CDC merge: the small changeset broadcasts into the anti join — the
    target table is scanned but never shuffled for the merge itself."""
    p = plan(spark, "merge_upsert_customers")
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p


def test_sample_stratified_is_scan_plus_filter_only(spark):
    """Deterministic sampling is a narrow filter: no exchange of any kind
    in the plan (the md5 predicate itself can't push to parquet, but
    nothing may shuffle)."""
    p = plan(spark, "sample_stratified")
    assert "Exchange" not in p


def test_pii_scrub_is_narrow(spark):
    p = plan(spark, "pii_scrub")
    assert "Exchange" not in p
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "lang" not in read_schema  # column pruning: only doc_id+text read


def test_global_row_ids_never_single_partitions(spark):
    """The distributed row-numbering operator must not contain the global
    window's SinglePartition exchange — that is the exact anti-pattern it
    exists to replace. The registered query's plan is lineage-truncated at
    the mandatory localCheckpoint (see ids.py), so the range exchange is
    asserted on the un-materialized variant."""
    p = plan(spark, "global_row_ids")
    assert "SinglePartition" not in p

    from mapreduce_model_spark.operators.ids import global_ordered_ids
    from mapreduce_model_spark.registry import table as t

    full = global_ordered_ids(
        t(spark, SF, "documents").select("doc_id", "source"),
        ["source", "doc_id"],
        materialize=False,
    )
    pf = spark._jvm.PythonSQLUtils.explainString(
        full._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in pf
    assert "rangepartitioning" in pf


def test_tpch_q10_q14_broadcast_dims(spark):
    """TPC-H shapes: dims broadcast; the lineitem filters reach the scan."""
    p10 = plan(spark, "tpch_q10_returned_items")
    assert p10.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in p10
    p14 = plan(spark, "tpch_q14_promo_revenue")
    assert "BroadcastHashJoin" in p14
    assert "PushedFilters" in p14


def test_tpch_q5_q8_broadcast_all_dims(spark):
    """The 6- and 7-way stars: every dimension side broadcasts; the only
    shuffle joins are fact-fact (lineitem⋈orders on the order key)."""
    p5 = plan(spark, "tpch_q5_local_supplier")
    assert p5.count("BroadcastHashJoin") >= 4
    p8 = plan(spark, "tpch_q8_market_share")
    assert p8.count("BroadcastHashJoin") >= 5


def test_tpch_q19_stays_a_hash_join(spark):
    """The OR-of-ANDs must not break the p_partkey equi-join: Catalyst
    keeps the hash join and evaluates the disjunction as a residual."""
    p = plan(spark, "tpch_q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q21_semi_and_anti(spark):
    """EXISTS → left semi, NOT EXISTS → left anti, in one plan."""
    p = plan(spark, "tpch_q21_waiting_supplier")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "TakeOrderedAndProject" in p


def test_tpch_q18_semi_join_before_facts(spark):
    """The IN(+HAVING) subquery must reach the plan as a semi join (never
    materializing the big-order keys through a full inner join first)."""
    p = plan(spark, "tpch_q18_large_orders")
    assert "LeftSemi" in p


def test_tpch_scalar_subqueries_broadcast(spark):
    """Q11/Q15/Q22: the 1-row aggregate side of each scalar-subquery join
    must broadcast — a shuffle against a 1-row frame is a planner bug."""
    for name in (
        "tpch_q11_important_inventory",
        "tpch_q15_top_supplier",
        "tpch_q22_sales_opportunity",
    ):
        p = plan(spark, name)
        assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, name
        assert "CartesianProduct" not in p, name


def test_param_sql_pushes_both_filters(spark):
    """Bound parameters must behave exactly like literals for pushdown:
    the orderdate range and quantity predicates reach their scans."""
    p = plan(spark, "param_sql_groupby_all")
    assert "GreaterThanOrEqual(o_orderdate" in p
    assert "GreaterThanOrEqual(l_quantity" in p
    assert p.count("HashAggregate") >= 2


def test_shuffle_shards_has_no_global_sort(spark):
    """The training shuffle must be one hash-partitioned window per shard —
    never a SinglePartition global window, never a total-order sort."""
    p = plan(spark, "shuffle_shards")
    assert "SinglePartition" not in p
    assert p.count("+- Exchange") == 1


def test_scd2_history_is_one_exchange(spark):
    """SCD2 versioning: one exchange on the business key feeds the lead
    window; nothing else shuffles."""
    p = plan(spark, "scd2_history")
    assert "SinglePartition" not in p
    assert p.count("+- Exchange") == 1


def test_rollup_incremental_preaggregates_both_branches(spark):
    """Both the history and delta branches must pre-aggregate before their
    exchanges (the merge shuffles group-key-sized partials, not rows)."""
    p = plan(spark, "rollup_incremental")
    assert p.count("HashAggregate") >= 4  # partial+final per branch merge
    assert "CartesianProduct" not in p


def test_dedup_exact_is_one_hash_exchange(spark):
    """Exact dedup must hash in the scan stage and shuffle ONLY the groupBy
    partials (16-byte hash + id) — exactly one exchange, partial agg below
    it, and no repartition of raw text anywhere."""
    p = plan(spark, "dedup_exact")
    assert p.count("+- Exchange") == 1
    assert p.count("HashAggregate") >= 2  # partial before + final after
    assert "SinglePartition" not in p


def test_corpus_build_pipeline_shuffles_hashes_only(spark):
    """End-to-end corpus build: quality gates fuse into the scan, the exact
    dedup is the only data-sized exchange (the second exchange carries the
    manifest agg's group-key partials), and the survivor semi-join
    broadcasts rather than shuffling the corpus."""
    p = plan(spark, "corpus_build_pipeline")
    assert p.count("+- Exchange") == 2
    assert "BroadcastHashJoin LeftSemi" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_event_transitions_broadcasts_totals(spark):
    """The transition-matrix normalization join is event-types² — it must
    broadcast; a shuffle join on the totals would exchange the full
    transition stream twice."""
    p = plan(spark, "event_transitions")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_session_paths_top_k_never_global_sorts(spark):
    """Top-k paths must be TakeOrderedAndProject (per-partition heaps +
    driver merge of k rows), never a global Sort."""
    p = plan(spark, "session_paths")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_embedding_quantize_is_fully_narrow(spark):
    """Quantization must be a single narrow pass: the dim-sized stats come
    from a separate tiny job and re-enter as literals, so the returned
    plan has NO exchange at all — scan → project."""
    p = plan(spark, "embedding_quantize")
    assert "+- Exchange" not in p


def test_ewma_is_one_exchange(spark):
    """The EWMA fold runs inside the (user, day) aggregate — exactly one
    exchange, never a global sort or single-partition window."""
    p = plan(spark, "ewma_user_daily")
    assert p.count("+- Exchange") == 1
    assert "SinglePartition" not in p


def test_robust_outliers_two_scans_and_broadcast_stats(spark):
    """Median+MAD outlier screen: exactly TWO distinct lineitem scans (the
    median pass, and the cache-populating deviation pass — the final flag
    count reads the persisted deviation frame, never a third scan), and
    both per-group stats frames broadcast back onto the fact."""
    import re

    p = plan(spark, "robust_outliers")
    scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", p))
    assert len(scan_ids) == 2, scan_ids
    assert "InMemoryTableScan" in p  # flag pass reads the cached dev frame
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_join_asof_forward_single_exchange_no_join(spark):
    """Forward as-of join: the union-tag + per-key window formulation is ONE
    hash exchange on the key — no correlated re-scan, no join operator, and
    never a single-partition window."""
    p = plan(spark, "join_asof_forward")
    assert p.count("+- Exchange") == 1
    assert "SinglePartition" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "Window" in p


def test_quantile_histogram_preaggregates_partials(spark):
    """Mergeable-histogram quantiles: bin counts must pre-aggregate map-side
    (partial+final HashAggregate pairs) so every exchange carries bin-sized
    partials, and the tiny totals/CDF frames broadcast into the probe —
    no cartesian, no sort-merge."""
    p = plan(spark, "quantile_mergeable_histogram")
    assert p.count("HashAggregate") >= 4
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_kmeans_assign_pass_is_narrow(spark):
    """Lloyd's loop (Arrow engine since r12): the corpus is never
    shuffled or joined to meet the centroids (no SortMergeJoin, no
    cartesian, no nested-loop join anywhere). Below the local-finish
    gate the whole loop is ONE MapInPandas task over the persisted
    corpus; above it the final assign is a MapInArrow with the centroids
    as a numpy closure constant. Either way the only join is the k-row
    broadcast of member counts onto centroids."""
    p = plan(spark, "kmeans_embeddings")
    assert "MapInPandas" in p or "MapInArrow" in p
    assert "InMemoryTableScan" in p
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_graph_triangles_no_cartesian(spark):
    """Triangle enumeration must stay equi-join end to end — a missing
    join key on any of the three edge roles degenerates to a cross
    product."""
    p = plan(spark, "graph_triangles")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_decontaminate_bloom_training_side_never_shuffles(spark):
    """The Bloom screen's whole point: the filter re-enters as a broadcast
    1-row word map and the probe is narrow bit math — the only exchanges
    are the eval-side filter build (bounded ≤128 rows; its pack to one row
    is the lone SinglePartition) and the final per-source count partials.
    A SortMergeJoin anywhere means the training corpus shuffled."""
    p = plan(spark, "decontaminate_bloom")
    assert "SortMergeJoin" not in p
    assert p.count("SinglePartition") == 1  # the ≤128-row filter pack only
    assert p.count("+- Exchange") <= 5
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_bm25_topk_broadcasts_stats_and_takes_ordered(spark):
    """BM25: df/avgdl stats are tiny and must broadcast back onto the
    term-filtered postings; the final top-k must be TakeOrderedAndProject
    (per-partition heaps), never a global Sort."""
    p = plan(spark, "bm25_topk")
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2


def test_cms_heavy_hitters_sketch_is_preaggregated(spark):
    """Count-Min build: partial HashAggregates below every exchange (the
    sketch is SUM-mergeable — map-side combine carries it), and the top-k
    report is a TakeOrderedAndProject, not a global sort."""
    p = plan(spark, "cms_heavy_hitters")
    assert "TakeOrderedAndProject" in p
    assert p.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_lm_perplexity_probability_joins_never_sort_merge(spark):
    """Bigram-LM scoring: the unigram/bigram probability joins are keyed on
    words — at sf scale both sides broadcast; what must NEVER appear is a
    cartesian or a sort-merge of the scoring corpus."""
    p = plan(spark, "lm_perplexity")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 2


def test_source_overlap_pair_join_is_bounded(spark):
    """Source-overlap matrix: the pair generation joins distinct
    (source, shingle) sets on the shingle hash — equi-joins only, the
    |sources|²-bounded output never degenerates into a cartesian."""
    p = plan(spark, "source_overlap")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_ngram_novelty_has_no_self_join(spark):
    """Novelty is min-over-shingle windows — zero joins by construction;
    a join appearing here means someone rewrote it as the O(n²)
    earlier-docs self-join the window formulation exists to avoid."""
    p = plan(spark, "ngram_novelty")
    assert "Join" not in p
    assert p.count("Window") == 2
    assert p.count("+- Exchange") <= 3


def test_containment_reuses_persisted_shingle_sets(spark):
    """Containment shares the blocked-pair engine with Jaccard: the per-doc
    shingle-set build must be a persisted artifact re-read by its five
    consumers (InMemoryTableScan), not five re-scans of raw text, and the
    pair work is equi-joins only."""
    p = plan(spark, "dedup_containment")
    # every consumer reads the cache (formatted explain reprints the cached
    # relation's build lineage per reference, so "Scan parquet" overcounts —
    # the InMemoryTableScans are what executes)
    assert p.count("InMemoryTableScan") >= 5
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_boilerplate_ngrams_is_two_exchanges(spark):
    """Boilerplate detection: one (source, shingle)-keyed count exchange
    (the data-sized one, partial-agged below) plus the tiny per-source
    totals agg; the totals join back by broadcast. A third exchange is
    the NARROW pre-explode fanout spread (spread_for_fanout) — a
    local-small-file artifact that is a no-op on a many-split 100 TB
    scan, tolerated but never counted as data-sized work."""
    p = plan(spark, "boilerplate_ngrams")
    assert 2 <= p.count("+- Exchange") <= 3
    assert "BroadcastHashJoin" in p
    assert p.count("HashAggregate") >= 4  # both aggs two-phase
    assert "SortMergeJoin" not in p


def test_eval_coverage_training_side_broadcast_only(spark):
    """The 100 TB training side is touched by one narrow shingle pass and
    a BROADCAST semi join; the matched-hash set comes back broadcast too.
    A SortMergeJoin anywhere means a corpus-sized shuffle snuck in."""
    p = plan(spark, "eval_coverage")
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2
    assert "LeftSemi" in p


def test_anomaly_seasonal_baseline_broadcasts(spark):
    """The (type, hour) baseline is |types|x24 rows: it must broadcast
    back onto the fact scan — a shuffle-side join or a global window here
    would move the whole fact table at 100 TB."""
    p = plan(spark, "anomaly_seasonal")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Window" not in p  # the two-scan formulation, by design


def test_basket_lift_pair_join_keyed_on_order(spark):
    """The pair join must be an equi-join on l_orderkey (basket-size²
    bound) with the a<b orientation as a residual; the only nested-loop
    join is the broadcast 1-row order total."""
    p = plan(spark, "basket_lift")
    assert "CartesianProduct" not in p
    # formatted plans list each operator twice (tree + detail): <= 2 means
    # at most ONE BroadcastNestedLoopJoin instance — the 1-row total
    assert p.count("BroadcastNestedLoopJoin") <= 2
    assert "l_orderkey" in p
    assert "TakeOrderedAndProject" in p


def test_chunk_dedup_exchanges_carry_hashes_not_text(spark):
    """Chunking + hashing happen in the scan stage (transform over
    sequence — narrow); both exchanges must carry only (doc_id, idx, md5):
    if 'words' or 'text' appears in an Exchange's input columns the raw
    corpus is being shuffled."""
    p = plan(spark, "chunk_dedup")
    lines = p.splitlines()
    ex_args = [
        l
        for i, l in enumerate(lines)
        if "Arguments: hashpartitioning" in l
    ]
    assert ex_args, "expected hash exchanges in the plan"
    for l in ex_args:
        assert "text" not in l and "words" not in l


def test_entity_match_runs_on_name_dictionary(spark):
    """Resolution runs on the distinct-name dictionary: the candidate
    joins key on a block token (equi-join), never a cartesian; levenshtein
    appears only as a post-join filter."""
    p = plan(spark, "entity_match_names")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "levenshtein" in p


def test_time_embargo_split_two_fact_scans(spark):
    """The fact table appears exactly twice (boundary min/max + the tag
    pass); the split summary and the shared-user audit must both read the
    PERSISTED (split, user) aggregate, never re-derive the fact plan."""
    p = plan(spark, "time_embargo_split")
    assert p.count("events.parquet") == 2
    assert "InMemoryTableScan" in p or "InMemoryRelation" in p


def test_sql_udf_inlines_to_codegen(spark):
    """SQL-defined functions must fold into the plan at analysis time:
    no Python evaluation operator anywhere, and the aggregate stays
    two-phase exactly as if the expressions were written inline."""
    p = plan(spark, "sql_udf_surface")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_dau_wau_single_events_scan(spark):
    """The deduped user-day frame persists: day grid, DAU, and window
    contributions must all read the cached frame — exactly ONE events
    scan in the plan (review-caught triple scan)."""
    p = plan(spark, "dau_wau_stickiness")
    assert p.count("events.parquet") == 1
    assert "InMemoryTableScan" in p or "InMemoryRelation" in p


def test_wau_hll_single_events_scan(spark):
    """Sketch path: per_day persists so the day grid and the explode
    branch share one fact aggregation (review-caught double scan)."""
    p = plan(spark, "wau_hll_sliding")
    assert p.count("events.parquet") == 1
    assert "InMemoryTableScan" in p or "InMemoryRelation" in p


def test_phrase_search_single_corpus_tokenize(spark):
    """The phrase-restricted postings frame persists: the adjacency
    self-join must not re-run the posexplode per word branch — one
    documents scan only (review-caught double tokenize)."""
    p = plan(spark, "phrase_search")
    assert p.count("documents.parquet") == 1
    assert "InMemoryTableScan" in p or "InMemoryRelation" in p


def test_rfm_scaled_twin_has_no_window(spark):
    """rfm_segments_scaled exists to eliminate a total-order quintile
    window: its plan must contain no window operator at all — boundaries
    are an approx_percentile aggregate broadcast back, scoring is narrow."""
    p = plan(spark, "rfm_segments_scaled")
    assert "Window" not in p
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p


def test_rfm_exact_has_no_window_either(spark):
    """r10: the EXACT rfm_segments no longer uses ntile windows — each
    axis ranks via global_ordered_ids (range exchange + narrow Arrow
    numbering) and folds rank→bucket with exact ntile arithmetic (the
    last plan-level weak, cleared per the r9 verdict). The registered
    plan is lineage-truncated at global_ordered_ids' mandatory
    localCheckpoint (same as global_row_ids), so the range exchange is
    asserted on an un-materialized single-axis variant."""
    p = plan(spark, "rfm_segments")
    assert "Window" not in p
    assert "SinglePartition" not in p

    from mapreduce_model_spark.operators.ids import global_ordered_ids
    from mapreduce_model_spark.queries_pipeline import _rfm_per_user

    full = global_ordered_ids(
        _rfm_per_user(spark, SF), ["monetary", "user_id"], "m_rank",
        materialize=False,
    )
    pf = spark._jvm.PythonSQLUtils.explainString(
        full._jdf.queryExecution(), "formatted"
    )
    # the un-materialized variant shows the one range exchange; its only
    # SinglePartition (if any) is the 1-row max-ts scalar aggregate inside
    # _rfm_per_user, never a Window
    assert "rangepartitioning" in pf.lower()
    assert "Window" not in pf


def test_inverted_index_dfcap_single_tokenize(spark):
    """pairs persists across its two phases (df count + postings) and cnt
    across its two consumers — exactly ONE documents scan; without the
    persists the tokenize/dedup pipeline ran three times (r6 plan audit)."""
    p = plan(spark, "inverted_index_dfcap")
    assert p.count("documents.parquet") == 1
    assert "InMemoryTableScan" in p or "InMemoryRelation" in p


def test_rfm_scaled_shares_per_user_frame(spark):
    """The |users| RFM frame persists so the boundary aggregate and the
    scoring pass BOTH read the cache instead of re-running the fact
    aggregation (r6 plan audit: double scan). The cached build plan
    itself scans events twice (fact + broadcast max-ts branch — same as
    the exact twin), so the pin is on the cache reads, not scan count."""
    p = plan(spark, "rfm_segments_scaled")
    assert p.count("InMemoryTableScan") >= 2


def test_sequence_packing_global_never_single_partitions(spark):
    """The packing layout's running token count must come from the
    two-phase prefix-sum operator, never a global window: no Window, no
    SinglePartition exchange; the un-materialized variant shows the one
    range exchange (the registered query's plan is lineage-truncated at
    the mandatory localCheckpoint, same as global_row_ids)."""
    from pyspark.sql import functions as F

    p = plan(spark, "sequence_packing_global")
    assert "SinglePartition" not in p
    assert "Window" not in p

    from mapreduce_model_spark.functions.text import words_array
    from mapreduce_model_spark.operators.ids import global_prefix_sums
    from mapreduce_model_spark.registry import table as t

    docs = t(spark, SF, "documents").select(
        "doc_id", F.size(words_array("text")).cast("long").alias("n_tok")
    )
    full = global_prefix_sums(docs, ["doc_id"], "n_tok", materialize=False)
    pf = spark._jvm.PythonSQLUtils.explainString(
        full._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in pf
    assert "rangepartitioning" in pf


def test_sequence_packing_by_source_has_no_window(spark):
    """The per-source packing cumsum derives from the global two-phase
    prefix sum (per-source = global − source start): no Window operator,
    no SinglePartition; the source starts broadcast back (r6 upgrade —
    the Window.partitionBy(source) form put a whole source in ONE window
    partition)."""
    p = plan(spark, "sequence_packing")
    assert "Window" not in p
    assert "SinglePartition" not in p
    assert "BroadcastExchange" in p


def test_hard_negative_mining_no_window_partial_agg(spark):
    """Top-1-per-anchor must be the algebraic max(struct) aggregate with
    anchors broadcast — a window here would funnel the anchors×corpus
    fan-out through |anchors| partitions."""
    p = plan(spark, "hard_negative_mining")
    assert "Window" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    # struct-max is sort-aggregated (complex-type max has no hash impl);
    # what matters is the PARTIAL aggregate collapsing the fan-out before
    # the exchange — two SortAggregate nodes (partial + final)
    assert "HashAggregate" in p or p.count("SortAggregate") >= 2


def test_corpus_mix_temperature_thresholds_broadcast(spark):
    """The admission pass joins the |sources|-row threshold table by
    broadcast — document rows never shuffle — and no window appears."""
    p = plan(spark, "corpus_mix_temperature")
    assert "Window" not in p
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_hard_negative_ann_bucket_join_no_window(spark):
    """The ANN twin must stay bucket-equi-join-shaped: no cartesian
    product, no window; top-1 stays the partial max(struct) aggregate."""
    p = plan(spark, "hard_negative_mining_ann")
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p or p.count("SortAggregate") >= 2


def test_chunk_dedup_rebuild_no_window(spark):
    """The rebuild's first-writer election must be the algebraic
    min(struct) aggregate, not chunk_dedup's report-side window — at
    100 TB the window form funnels every hash-partition through a sort."""
    p = plan(spark, "chunk_dedup_rebuild")
    assert "Window" not in p
    assert "CartesianProduct" not in p


# Queries whose plans legitimately combine a Window with a SinglePartition
# exchange, each vetted (r6): either the SinglePartition belongs to a 1-row
# scalar aggregate BESIDE a properly partitioned window, or the global
# window runs on a provably bounded frame / is the documented oracle face
# of a shipped scale twin.
_WINDOW_SINGLEPARTITION_ALLOWED = {
    "class_rebalance",  # window partitioned by lang; SinglePartition is the 1-row min-count aggregate
    "quantile_mergeable_histogram",  # cumsum over the merged few-dozen-bin histogram, not the fact table
    "skyline_pareto",  # global pass runs on the bucket-pruned local-skyline survivors only
    "tfidf_top5",  # window partitioned by doc_id; SinglePartition is the 1-row n_docs aggregate
    "vocab_coverage_curve",  # global window over the top-max(_VOCAB_SIZES) rows (TakeOrdered first)
}


def test_no_undocumented_global_window_funnels(spark):
    """Registry-wide guard for the canonical 100 TB anti-pattern: any query
    whose physical plan contains BOTH a Window and a SinglePartition
    exchange must be on the vetted allowlist above. A new query that
    funnels corpus-sized data through an unpartitioned window trips this
    and forces an explicit, documented decision (partition it, prune to a
    bounded frame first, or justify an allowlist entry)."""
    offenders = []
    for name in sorted(QUERIES):
        if name in _WINDOW_SINGLEPARTITION_ALLOWED:
            continue
        p = plan(spark, name)
        if "Window" in p and "SinglePartition" in p:
            offenders.append(name)
    assert offenders == [], offenders


def test_no_row_at_a_time_python_in_hot_paths(spark):
    """Registry-wide guard for the UDF slow path: row-at-a-time Python
    evaluation (BatchEvalPython — pickled per-row transfer, 10-100x slower
    than Arrow) may appear ONLY in the two deliberate UDTF surface demos
    (SURVEY A20): doc_chunks_udtf (static schema) and ngram_cols_udtf
    (polymorphic analyze()). Everything else must stay JVM-side or go
    through Arrow (pandas_udf / mapInPandas / mapInArrow)."""
    offenders = []
    for name in sorted(QUERIES):
        if name in ("doc_chunks_udtf", "ngram_cols_udtf"):
            continue
        p = plan(spark, name)
        if "BatchEvalPython" in p:
            offenders.append(name)
    assert offenders == [], offenders


def test_contrastive_triplets_single_aggregate_no_window(spark):
    """Both triplet legs must come from ONE aggregate over ONE broadcast
    scan (conditional max(struct) branches) — not two passes, not a
    window."""
    p = plan(spark, "contrastive_triplets")
    assert "Window" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_source_token_caps_no_window(spark):
    """The per-source greedy cut must run on the two-phase prefix-sum
    derivation (range exchange + narrow Arrow cumsum), never a per-source
    window — same contract as sequence_packing."""
    p = plan(spark, "source_token_caps")
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_jl_projection_is_pure_map(spark):
    """The JL projection is a zero-exchange map-only pass: the ±1 matrix
    enters as a literal, so nothing shuffles and nothing broadcasts."""
    p = plan(spark, "jl_projection")
    assert "Exchange" not in p


def test_dsir_broadcasts_lambda_table(spark):
    """DSIR's 256-row λ table re-enters as a broadcast — scoring must not
    shuffle on the bucket key — and no window appears anywhere."""
    p = plan(spark, "dsir_importance")
    assert "BroadcastHashJoin" in p
    assert "Window" not in p


def test_dup_span_merge_never_shuffles_text(spark):
    """Every KEYED exchange in the span-merge plan carries only ids +
    hashes — text may ride only the spread_for_fanout REPARTITION_BY_NUM
    exchange (the small-input parallelism fix, a no-op on a real 100 TB
    scan with thousands of splits)."""
    p = plan(spark, "dup_span_merge")
    for block in p.split("\n\n"):
        if block.strip().startswith("(") and "Exchange" in block.splitlines()[0]:
            if "REPARTITION_BY_NUM" in block:
                continue
            assert "text#" not in block, block


def test_semantic_dedup_pair_join_is_cluster_keyed(spark):
    """The SemDeDup pair join must be keyed on cid (candidate volume
    Σ|cluster|²), never a cartesian; centroid assignment broadcasts."""
    p = plan(spark, "semantic_dedup")
    assert "CartesianProduct" not in p
    # BroadcastNestedLoopJoin appears ONLY as the k-row centroid broadcast
    # (corpus × 8 assign pass); the member-pair join itself must be an
    # equi-join on cid
    assert "cid" in p and ("SortMergeJoin" in p or "ShuffledHashJoin" in p or
                           "BroadcastHashJoin" in p)


def test_text_normalize_is_narrow(spark):
    """Normalization is a map-only scan pass — same contract as
    pii_scrub."""
    p = plan(spark, "text_normalize")
    assert "Exchange" not in p
