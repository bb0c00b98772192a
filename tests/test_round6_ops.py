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
        # the query emits rnd(avg, 4): up to 5e-5 from the exact mean —
        # the tolerance must cover the rounding step, not just float
        # noise (r6 review: 1e-6 only passed because every sf0.001
        # segment has <= 2 users, whose averages terminate early)
        assert abs(got[seg]["avg_monetary"] - sum(vals) / len(vals)) < 5.1e-5
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


def _clustered_corpus(spark, n_bases=100, copies=3, dim=32, scale=0.12, seed=7):
    """Deterministic near-dup corpus: jittered copies of gaussian bases
    (within-cluster cosine ~0.95+) — the workload multi-probe exists for."""
    import numpy as np

    rng = np.random.default_rng(seed)
    bases = rng.normal(size=(n_bases, dim))
    rows, vid = [], 0
    for b in bases:
        for _ in range(copies):
            v = b + rng.normal(scale=scale, size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    import numpy.linalg as la

    M = np.array([r[1] for r in rows])
    Mn = M / la.norm(M, axis=1, keepdims=True)
    return emb, Mn @ Mn.T, vid


def test_multiprobe_near_dup_recall_contract(spark):
    """The documented sign-LSH recall gap, closed: on genuinely-near pairs
    (cosine >= 0.9) Hamming-radius-1 probing must reach >= 0.9 recall vs
    the brute-force truth, strictly improve on single-probe, and radius 2
    must improve again — with zero false positives at every radius (the
    bucket join only BLOCKS; the exact cosine filter decides)."""
    from mapreduce_model_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb, C, n = _clustered_corpus(spark)
    truth = {
        (i, j) for i in range(n) for j in range(i + 1, n) if C[i, j] >= 0.9
    }
    assert len(truth) >= 100  # the corpus really is clustered
    recall = {}
    for radius in (0, 1, 2):
        got = {
            (r.id_a, r.id_b)
            for r in embedding_near_dup_pairs(
                emb, threshold=0.9, bits=6, probe_radius=radius
            ).collect()
        }
        assert got <= truth  # exact-cosine filter => no false positives
        recall[radius] = len(got) / len(truth)
    assert recall[1] >= 0.9
    assert recall[0] < recall[1] <= recall[2]


def test_multiprobe_captures_every_one_bit_split_pair(spark, sf_dir):
    """Exact mechanism pin on the real embeddings table: the radius-1
    query must contain EVERY brute-force pair (cosine >= threshold) whose
    sign buckets differ in <= 1 bit — probing captures precisely its
    Hamming ball, nothing about the corpus can change that."""
    import numpy as np

    from mapreduce_model_spark.queries_similarity import (
        NEAR_DUP_THRESHOLD,
        adaptive_lsh_bits,
    )
    from mapreduce_model_spark.registry import QUERIES

    pdf = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = pdf["vec_id"].to_numpy()
    M = np.array([list(map(float, e)) for e in pdf["embedding"]])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = Mn @ Mn.T
    # the registered face blocks adaptively — recompute its exact bits
    buckets = (M[:, : adaptive_lsh_bits(len(ids))] >= 0).astype(int)
    expected = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if C[i, j] >= NEAR_DUP_THRESHOLD and (
                (buckets[i] != buckets[j]).sum() <= 1
            ):
                expected.add((int(ids[i]), int(ids[j])))
    got = {
        (r.id_a, r.id_b)
        for r in QUERIES["embedding_near_dup_multiprobe"](
            spark, sf_dir
        ).collect()
    }
    assert expected  # non-vacuous
    assert expected <= got


def test_multimodal_oracles_survive_multibyte_text(spark, tmp_path):
    """Review-caught char/byte skew: the frame-dedup oracle used to slice
    `text` by CHARACTERS while the engine slices the UTF-8 payload by
    BYTES — parity held only because the synthetic corpus is pure ASCII.
    Both sides now address bytes (encode + hex-slice), so a corpus with
    multi-byte characters must hash identically end to end."""
    import duckdb

    from mapreduce_model_spark.registry import ORACLE_SQL, QUERIES

    t1 = "héllo wörld ünïcode χξψ " * 40
    t2 = "日本語テキスト断片 " * 60
    df = spark.createDataFrame(
        [
            (1, t1, "xx", "s", len(t1)),
            (2, t2, "yy", "s", len(t2)),
            (3, "short ascii", "zz", "s", 11),
            (4, t1, "xx", "s", len(t1)),  # duplicate payload → dup frames
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    for name in (
        "multimodal_cols",
        "multimodal_frames",
        "multimodal_resize",
        "multimodal_frame_dedup",
    ):
        s_rows = sorted(tuple(r) for r in QUERIES[name](spark, str(tmp_path)).collect())
        o_rows = sorted(tuple(r) for r in con.execute(ORACLE_SQL[name]).fetchall())
        assert s_rows == o_rows, name
    # and the duplicated payload really registers as duplicated frames
    dd = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_frame_dedup"](spark, str(tmp_path)).collect()
    }
    assert dd[4]["n_first_seen"] == 0 and dd[4]["dup_frac"] == 1.0


def test_inverted_index_dfcap_both_branches_live(spark, sf_dir):
    """The df-capped index build (stopword scale path): capped words carry
    n_docs but an EMPTY postings string; under-cap words carry the full
    sorted postings. Both branches must be non-empty at test scale, the
    cap boundary must be respected exactly, and under-cap postings must
    agree with the uncapped index."""
    from mapreduce_model_spark.queries_reference import _DF_CAP
    from mapreduce_model_spark.registry import QUERIES

    rows = QUERIES["inverted_index_dfcap"](spark, sf_dir).collect()
    capped = [r for r in rows if r["docs"] == ""]
    posted = [r for r in rows if r["docs"] != ""]
    assert capped and posted
    assert all(r["n_docs"] > _DF_CAP for r in capped)
    assert all(r["n_docs"] <= _DF_CAP for r in posted)
    full = {
        r["word"]: r["docs"]
        for r in QUERIES["inverted_index_agg"](spark, sf_dir).collect()
    }
    for r in posted:
        assert full[r["word"]] == r["docs"]
    assert len(rows) == len(full)  # every word present either way


def test_global_prefix_sums_matches_window(spark, sf_dir):
    """Operator pin: the two-phase exclusive prefix sum equals the global
    window formulation on the same data, including across partition
    boundaries (forced tiny partitions so several boundaries exist)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreduce_model_spark.operators.ids import global_prefix_sums

    df = spark.range(0, 997).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 13).cast("long").alias("v")
    )
    got = {
        r["k"]: r["cum_before"]
        for r in global_prefix_sums(df, ["k"], "v", num_partitions=7).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    exp = {
        r["k"]: r["c"]
        for r in df.select(
            "k", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("c")
        ).collect()
    }
    assert got == exp


def test_global_prefix_sums_null_values_contribute_zero(spark):
    """r6 review, reproduced: a null value used to become NaN→int64-min in
    the Arrow pass, corrupting every later offset in its partition. Nulls
    must contribute 0 — the window twin's null-skip semantics."""
    from pyspark.sql import functions as F

    from mapreduce_model_spark.operators.ids import global_prefix_sums

    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, None), (4, 7), (5, 1)], "k long, v long"
    )
    got = {
        r["k"]: r["cum_before"]
        for r in global_prefix_sums(df, ["k"], "v", num_partitions=2).collect()
    }
    assert got == {1: 0, 2: 0, 3: 5, 4: 5, 5: 12}


def test_global_prefix_sums_rejects_fractional_value_col(spark):
    """r6 review: the driver bases truncate the partition TOTAL while the
    Arrow pass truncates EACH value, so a double column would drift across
    partition boundaries. The operator must reject it loudly instead."""
    import pytest

    from mapreduce_model_spark.operators.ids import global_prefix_sums

    df = spark.createDataFrame([(1, 0.6), (2, 0.6), (3, 1.0)], "k long, v double")
    with pytest.raises(TypeError, match="must be an integral type"):
        global_prefix_sums(df, ["k"], "v")


def test_corpus_mix_temperature_flattens_shares(spark, tmp_path):
    """The semantic point of α<1 temperature scaling, pinned on a
    deliberately NON-uniform corpus (the shipped testdata has identical
    per-source counts, which made the first version of this test vacuous —
    r6 review): the gain ratio temp_share/doc_share is strictly decreasing
    in source size (∝ n^(α-1)), so the smallest source gains share and the
    largest loses it; temp shares sum to 1; thresholds and sampled counts
    stay within their bounds on every row.

    NOTE the true crossover where temp_share == doc_share is NOT the mean
    count — it is (N/Σn^α)^(1/(1-α)) ≥ mean (Jensen) — so "every
    above-average source loses" is false in general; only the monotone
    ratio and the min/max endpoints are safe invariants.
    """
    from mapreduce_model_spark.registry import QUERIES

    counts = {"srcA": 120, "srcB": 40, "srcC": 8, "srcD": 2}
    rows_in = []
    i = 0
    for src, n in counts.items():
        for _ in range(n):
            rows_in.append((i, f"doc {i}", "en", src, 10))
            i += 1
    spark.createDataFrame(
        rows_in, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    rows = QUERIES["corpus_mix_temperature"](spark, str(tmp_path)).collect()
    assert len(rows) == len(counts)
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-3
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    ratios = [r["temp_share"] / r["doc_share"] for r in by_n]
    assert all(a > b for a, b in zip(ratios, ratios[1:])), ratios
    assert ratios[0] > 1.0, "smallest source must gain share"
    assert ratios[-1] < 1.0, "largest source must lose share"
    for r in rows:
        assert 0 <= r["sample_threshold"] <= 1_000_000, r
        assert 0 <= r["n_sampled"] <= r["n_docs"], r


def test_hard_negative_ann_bounded_by_brute(spark, sf_dir):
    """The ANN twin can only ever find a weaker-or-equal negative than the
    brute-force face (brute maximizes over the whole corpus), and both
    must return a different-label negative for every anchor they emit."""
    from mapreduce_model_spark.registry import QUERIES

    brute = {
        r["query_id"]: r for r in QUERIES["hard_negative_mining"](spark, sf_dir).collect()
    }
    ann = {
        r["query_id"]: r
        for r in QUERIES["hard_negative_mining_ann"](spark, sf_dir).collect()
    }
    assert brute, "brute face returned nothing"
    # the bound below is vacuous if ANN collapses to nothing — pin coverage
    # (measured 20/20 anchors at sf0.001 AND sf0.01; buckets only densify
    # with corpus size, so half is a conservative floor)
    assert len(ann) >= max(1, len(brute) // 2), (len(ann), len(brute))
    for qid, r in brute.items():
        assert r["neg_label"] != r["query_label"]
    # every ANN anchor also exists in brute, with ANN cosine <= brute cosine
    for qid, r in ann.items():
        assert r["neg_label"] != r["query_label"]
        assert qid in brute
        assert r["cosine"] <= brute[qid]["cosine"] + 1e-9, (r, brute[qid])


def test_chunk_dedup_rebuild_reconstruction(spark, tmp_path):
    """First-writer-wins reconstruction on a constructed corpus: a chunk
    duplicated across docs survives only in the lowest (doc_id, chunk_idx);
    the rebuilt text is exactly the surviving chunks in document order, and
    a fully-gutted doc rebuilds to the empty string's hash."""
    import hashlib

    from mapreduce_model_spark.registry import QUERIES

    A = [f"alpha{chr(ord('a') + i)}" for i in range(16)]
    B = [f"beta{chr(ord('a') + i)}" for i in range(16)]
    C = [f"gamma{chr(ord('a') + i)}" for i in range(16)]
    docs = [
        (0, " ".join(A + B)),   # keeps A and B (first writer of both)
        (1, " ".join(A + C)),   # loses A, keeps C
        (2, " ".join(B)),       # loses B -> fully gutted
    ]
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: (r["n_kept_words"], r["rebuilt_md5"])
        for r in QUERIES["chunk_dedup_rebuild"](spark, str(tmp_path)).collect()
    }
    md5 = lambda ws: hashlib.md5(" ".join(ws).encode()).hexdigest()  # noqa: E731
    assert got == {
        0: (32, md5(A + B)),
        1: (16, md5(C)),
        2: (0, md5([])),
    }


def test_contrastive_triplets_consistent_with_hard_negatives(spark, sf_dir):
    """The triplet's negative leg must be exactly hard_negative_mining's
    pick, its positive leg must share the anchor's label, and the margin
    must equal pos_cosine - neg_cosine on every emitted row."""
    from mapreduce_model_spark.registry import QUERIES

    neg = {
        r["query_id"]: r
        for r in QUERIES["hard_negative_mining"](spark, sf_dir).collect()
    }
    trips = QUERIES["contrastive_triplets"](spark, sf_dir).collect()
    assert trips
    for t in trips:
        assert t["query_id"] in neg
        assert t["neg_id"] == neg[t["query_id"]]["hard_negative_id"]
        assert abs(t["neg_cosine"] - neg[t["query_id"]]["cosine"]) < 1e-9
        assert abs(t["margin"] - round(t["pos_cosine"] - t["neg_cosine"], 6)) < 2e-6


def test_source_token_caps_budget_semantics(spark, sf_dir):
    """Every source keeps a greedy doc prefix: tokens_kept >= min(budget,
    src_tokens) when anything is kept (the straddler is kept whole), a
    source never keeps more tokens than it has, and budgets sum to ~the
    global budget fraction of all tokens."""
    from mapreduce_model_spark.registry import QUERIES

    rows = QUERIES["source_token_caps"](spark, sf_dir).collect()
    assert rows
    all_tokens = sum(r["src_tokens"] for r in rows)
    assert sum(r["token_budget"] for r in rows) <= int(0.3 * all_tokens) + len(rows)
    for r in rows:
        assert r["tokens_kept"] <= r["src_tokens"], r
        if r["token_budget"] > 0:
            assert r["n_docs_kept"] >= 1, r
            assert r["tokens_kept"] >= min(r["token_budget"], r["src_tokens"]), r
