"""Round 10: metamorphic laws of the VECTOR families (r9 verdict #6).

Round 9 pinned the text-dedup definition with metamorphic laws; the
embedding side (sign-LSH, IVF, PQ) had none — the DuckDB oracles confirm
the two engines compute the same formula, not that the formula behaves
like nearest-neighbor search / quantization. Four laws, applied to each
family where it is defined:

  duplication — inserting an exact copy of a corpus vector always pairs
                the copy with its original (near-dup), and assigns the
                copy identical PQ codes/MSE (the copy's id is chosen
                above every existing id so the lowest-id codebook seeds
                are untouched);
  relabel     — an ORDER-PRESERVING id bijection (+C, with C a multiple
                of the IVF stride so the deterministic centroid slice
                maps to the same vectors) permutes every result exactly;
  scaling     — multiplying every vector by a POWER OF TWO changes no
                result: power-of-2 scaling is exact in binary floating
                point, cosines are scale-invariant bit-for-bit, sign
                buckets are unchanged, Lloyd's argmin keys scale exactly
                so PQ codes are identical and MSE scales by exactly 4;
  monotonicity— growing the probe set (LSH probe_radius 0→1, IVF
                nprobe 1→2→3) never shrinks a query's candidate set, so
                per-rank top-k cosines pointwise dominate and recall vs
                the exact top-k never decreases.

Seeded 80-vector slice of the sf0.001 embeddings — each law runs in
seconds.
"""

import pytest
from pyspark.sql import functions as F

from mapreduce_model_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_cosine_topk,
    lsh_cosine_topk,
    pq_fit,
)

_N = 80
_NQ = 10
_K = 3
_BITS = 4
_STRIDE = 10
_SHIFT = 1_000_000  # order-preserving relabel; multiple of _STRIDE


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < _N)
    )
    e.persist().count()
    return e


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < _NQ)


def _scaled(df):
    # ×2 is exact for every finite float: mantissas untouched
    return df.withColumn(
        "embedding", F.transform("embedding", lambda x: x * F.lit(2.0))
    )


def _relabel(df):
    return df.withColumn("vec_id", F.col("vec_id") + F.lit(_SHIFT))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---- duplication ---------------------------------------------------------


def test_near_dup_duplication_law(spark, emb):
    """Copying vector 0 under a fresh id always yields the (0, copy)
    pair at cosine 1, and never removes an existing pair (the copy only
    ADDS rows to its bucket; the join has no cap)."""
    base_pairs = _rows(embedding_near_dup_pairs(emb, 0.1, bits=_BITS))
    copy = emb.where(F.col("vec_id") == 0).withColumn(
        "vec_id", F.lit(_N + 1).cast("long")
    )
    dup_pairs = _rows(embedding_near_dup_pairs(emb.unionByName(copy), 0.1, bits=_BITS))
    assert set(base_pairs) <= set(dup_pairs)
    new = set(dup_pairs) - set(base_pairs)
    assert (0, _N + 1, 1.0) in new
    # every added pair involves the copy
    assert all(a == _N + 1 or b == _N + 1 for a, b, _ in new)


def test_pq_duplication_law(spark, emb):
    """Identical vectors must quantize identically: the copy gets
    bit-identical codes and MSE to its original within the same run (the
    final codebook assigns both by the same argmin with a cid-only tie
    break). NOTE the stronger 'other rows unchanged' claim is NOT a law —
    the copy participates in the Lloyd mean updates and legitimately
    shifts centroids (observed: same codes, mse drift ~1e-4 on
    neighboring clusters) — so it is deliberately not asserted."""
    copy = emb.where(F.col("vec_id") == 5).withColumn(
        "vec_id", F.lit(_N + 7).cast("long")
    )
    out = pq_fit(emb.unionByName(copy), m=4, k=8, n_iter=2).collect()
    by_id = {r["vec_id"]: (list(r["codes"]), r["mse"]) for r in out}
    assert by_id[_N + 7] == by_id[5]


# ---- relabel -------------------------------------------------------------


def test_lsh_relabel_law(spark, emb, queries):
    base = _rows(lsh_cosine_topk(emb, queries, k=_K, bits=_BITS, probe_radius=1))
    rel = _rows(
        lsh_cosine_topk(_relabel(emb), _relabel(queries), k=_K, bits=_BITS, probe_radius=1)
    )
    assert rel == sorted((q + _SHIFT, v + _SHIFT, c, r) for q, v, c, r in base)


def test_ivf_relabel_law(spark, emb, queries):
    base = _rows(ivf_cosine_topk(emb, queries, k=_K, stride=_STRIDE, nprobe=2))
    rel = _rows(
        ivf_cosine_topk(_relabel(emb), _relabel(queries), k=_K, stride=_STRIDE, nprobe=2)
    )
    assert rel == sorted((q + _SHIFT, v + _SHIFT, c, r) for q, v, c, r in base)


def test_pq_relabel_law(spark, emb):
    base = _rows(pq_fit(emb, m=4, k=8, n_iter=2))
    rel = _rows(pq_fit(_relabel(emb), m=4, k=8, n_iter=2))
    assert rel == sorted((i + _SHIFT, c, m) for i, c, m in base)


# ---- power-of-2 scaling --------------------------------------------------


def test_lsh_scale_invariance(spark, emb, queries):
    base = _rows(lsh_cosine_topk(emb, queries, k=_K, bits=_BITS))
    scaled = _rows(lsh_cosine_topk(_scaled(emb), _scaled(queries), k=_K, bits=_BITS))
    assert scaled == base  # cosines bit-identical, buckets unchanged


def test_ivf_scale_invariance(spark, emb, queries):
    base = _rows(ivf_cosine_topk(emb, queries, k=_K, stride=_STRIDE, nprobe=2))
    scaled = _rows(
        ivf_cosine_topk(_scaled(emb), _scaled(queries), k=_K, stride=_STRIDE, nprobe=2)
    )
    assert scaled == base


def test_pq_scale_law(spark, emb):
    """×2 input ⇒ identical codes (argmin keys scale by exactly 4, every
    Lloyd mean scales by exactly 2) and MSE scaled by exactly 4."""
    base = _rows(pq_fit(emb, m=4, k=8, n_iter=2))
    scaled = _rows(pq_fit(_scaled(emb), m=4, k=8, n_iter=2))
    assert [(i, c) for i, c, _ in scaled] == [(i, c) for i, c, _ in base]
    for (_, _, m_s), (_, _, m_b) in zip(scaled, base):
        assert m_s == 4.0 * m_b


# ---- probe monotonicity --------------------------------------------------


def _per_query_rank_cosines(rows):
    out = {}
    for q, v, c, r in rows:
        out.setdefault(q, {})[r] = c
    return out


def _recall_vs_exact(ann_rows, exact_rows):
    ann, ex = {}, {}
    for q, v, *_ in ann_rows:
        ann.setdefault(q, set()).add(v)
    for q, v, *_ in exact_rows:
        ex.setdefault(q, set()).add(v)
    hits = sum(len(ann.get(q, set()) & s) for q, s in ex.items())
    total = sum(len(s) for s in ex.values())
    return hits / total


def test_lsh_probe_radius_monotone(spark, emb, queries):
    r0 = _rows(lsh_cosine_topk(emb, queries, k=_K, bits=_BITS, probe_radius=0))
    r1 = _rows(lsh_cosine_topk(emb, queries, k=_K, bits=_BITS, probe_radius=1))
    exact = _rows(cosine_topk(emb, queries, k=_K))
    # candidate sets only grow ⇒ per-rank cosines pointwise dominate
    c0, c1 = _per_query_rank_cosines(r0), _per_query_rank_cosines(r1)
    for q, ranks in c0.items():
        for r, c in ranks.items():
            assert c1[q][r] >= c
    assert _recall_vs_exact(r1, exact) >= _recall_vs_exact(r0, exact)


def test_ivf_nprobe_monotone(spark, emb, queries):
    exact = _rows(cosine_topk(emb, queries, k=_K))
    prev_cos, prev_recall = None, -1.0
    for nprobe in (1, 2, 3):
        rows = _rows(
            ivf_cosine_topk(emb, queries, k=_K, stride=_STRIDE, nprobe=nprobe)
        )
        cos = _per_query_rank_cosines(rows)
        if prev_cos is not None:
            for q, ranks in prev_cos.items():
                for r, c in ranks.items():
                    assert cos[q][r] >= c
        recall = _recall_vs_exact(rows, exact)
        assert recall >= prev_recall
        prev_cos, prev_recall = cos, recall
