"""The MapReduce compatibility layer must reproduce the DataFrame engine's
results exactly — same job, two programming models."""

from pyspark.sql import functions as F

from mapreduce_model_spark.mapreduce import inverted_index_mapreduce, map_reduce
from mapreduce_model_spark.operators.inverted_index import invert
from mapreduce_model_spark.registry import table


def test_inverted_index_mapreduce_matches_dataframe_engine(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(200)
    mr = dict(inverted_index_mapreduce(spark, docs).collect())
    df_idx = {r.word: list(r.docs) for r in invert(docs).collect()}
    assert mr == df_idx


def test_map_reduce_wordcount_with_and_without_combiner(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(100)

    def mapper(row):
        return [(w, 1) for w in row.text.split()]

    with_comb = dict(
        map_reduce(docs, mapper, lambda k, vs: sum(vs), combine_fn=lambda a, b: a + b)
        .collect()
    )
    without = dict(map_reduce(docs, mapper, lambda k, vs: sum(vs)).collect())
    assert with_comb == without

    # cross-check one token against the declarative engine
    tok = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("t"))
        .filter(F.length("t") > 0)
        .groupBy("t")
        .count()
        .collect()
    )
    declarative = {r.t: r["count"] for r in tok}
    shared = set(declarative) & set(with_comb)
    assert shared
    for t in list(shared)[:50]:
        assert with_comb[t] == declarative[t], t
