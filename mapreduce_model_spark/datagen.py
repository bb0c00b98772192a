"""Synthetic table generator — standalone stand-in for the harness data.

Generates the same ten-table layout as ``/root/testdata/sf*`` (schemas in
FIXTURES.md) at any scale factor, so the engine runs without the driver's
parquet: ``python -m mapreduce_model_spark.datagen 0.01 /tmp/sf0.01``.

Everything derives from ``spark.range`` + deterministic hash arithmetic —
generation is itself a distributed, seeded, reproducible Spark job (no
driver-side row building, no RNG state): the same scale factor always
yields the same rows, on any cluster, which is what makes generated data
usable in golden tests. Values mimic the harness distributions (key
ranges, fan-outs, date windows) but are NOT row-identical to the driver's
tables — oracle parity runs against whatever directory you point it at,
so generated corpora check exactly the same way.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# words used to synthesize document text (overlaps the engine's stopword
# list so language-ID/quality signals fire)
_WORDS = (
    "the a an and of to in is it that as for on with at by from or be are was "
    "key value table row scan sort merge join hash part batch stream window "
    "spark line fast slow agg dup"
).split()


def _h(col, salt: str):
    """Deterministic uniform int from (salt, value) — the generator's RNG."""
    return F.abs(F.xxhash64(F.lit(salt), col))


def generate(spark: SparkSession, sf: float, out_dir: str) -> dict[str, int]:
    """Write all ten tables at scale factor ``sf`` under ``out_dir``.
    Returns {table: rows written}. sf=0.001 ≈ the harness's smallest tier
    (lineitem 6k rows), scaling linearly."""
    n_li = max(1, int(6_000_000 * sf))
    n_orders = n_li // 4
    n_cust = max(1, n_li // 40)
    n_part = max(1, n_li // 30)
    n_supp = max(1, n_li // 600)
    n_docs = max(1, int(500_000 * sf))
    n_events = max(1, int(1_000_000 * sf))
    counts: dict[str, int] = {}

    def write(name: str, df: DataFrame, n: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        counts[name] = n

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    region = spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.element_at(F.array(*[F.lit(r) for r in regions]), F.col("id").cast("int") + 1).alias("r_name"),
    )
    write("region", region, 5)

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("nation"), F.col("id").cast("string")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    write("nation", nation, 25)

    supplier = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("supplier"), F.col("id").cast("string")).alias("s_name"),
        (_h(F.col("id"), "sn") % 25).cast("int").alias("s_nationkey"),
        ((_h(F.col("id"), "sb") % 1_000_000) / 100.0).alias("s_acctbal"),
    )
    write("supplier", supplier, n_supp)

    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    customer = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("customer"), F.col("id").cast("string")).alias("c_name"),
        (_h(F.col("id"), "cn") % 25).cast("int").alias("c_nationkey"),
        ((_h(F.col("id"), "cb") % 1_000_000) / 100.0).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(s) for s in segments]),
            (_h(F.col("id"), "cs") % 5 + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    write("customer", customer, n_cust)

    colors = ["red", "green", "blue", "small", "large"]
    items = ["widget", "bolt", "ring", "gear", "cog"]
    types = ["ECONOMY", "MEDIUM", "SMALL", "STANDARD", "LARGE", "PROMO"]
    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(
            " ",
            F.element_at(F.array(*[F.lit(c) for c in colors]), (_h(F.col("id"), "pc") % 5 + 1).cast("int")),
            F.element_at(F.array(*[F.lit(i) for i in items]), (_h(F.col("id"), "pi") % 5 + 1).cast("int")),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), (_h(F.col("id"), "pb") % 25).cast("string")).alias("p_brand"),
        F.element_at(F.array(*[F.lit(t) for t in types]), (_h(F.col("id"), "pt") % 6 + 1).cast("int")).alias("p_type"),
        (_h(F.col("id"), "ps") % 50 + 1).cast("int").alias("p_size"),
        (900.0 + (F.col("id") % 1000) / 10.0).alias("p_retailprice"),
    )
    write("part", part, n_part)

    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    base_ts = F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        (_h(F.col("id"), "oc") % n_cust).alias("o_custkey"),
        F.element_at(F.array(*[F.lit(s) for s in statuses]), (_h(F.col("id"), "os") % 3 + 1).cast("int")).alias("o_orderstatus"),
        ((_h(F.col("id"), "op") % 50_000_000) / 100.0 + 900.0).alias("o_totalprice"),
        (base_ts + F.make_dt_interval(days=(_h(F.col("id"), "od") % 2555).cast("int"))).alias("o_orderdate"),
        F.element_at(F.array(*[F.lit(p) for p in prios]), (_h(F.col("id"), "oo") % 5 + 1).cast("int")).alias("o_orderpriority"),
    )
    write("orders", orders, n_orders)

    li_base = spark.range(n_li).select(
        F.col("id"),
        (_h(F.col("id"), "lo") % n_orders).alias("l_orderkey"),
    )
    lineitem = li_base.select(
        "l_orderkey",
        (_h(F.col("id"), "lp") % n_part).alias("l_partkey"),
        (_h(F.col("id"), "ls") % n_supp).alias("l_suppkey"),
        (_h(F.col("id"), "ln") % 7 + 1).cast("int").alias("l_linenumber"),
        (_h(F.col("id"), "lq") % 50 + 1).cast("double").alias("l_quantity"),
        ((_h(F.col("id"), "le") % 10_000_000) / 100.0 + 900.0).alias("l_extendedprice"),
        ((_h(F.col("id"), "ld") % 11) / 100.0).alias("l_discount"),
        ((_h(F.col("id"), "lt") % 9) / 100.0).alias("l_tax"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")), (_h(F.col("id"), "lr") % 3 + 1).cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("F"), F.lit("O")), (_h(F.col("id"), "ll") % 2 + 1).cast("int")).alias("l_linestatus"),
        (base_ts + F.make_dt_interval(days=(_h(F.col("id"), "lsd") % 2555).cast("int"))).alias("l_shipdate"),
    )
    write("lineitem", lineitem, n_li)

    word_arr = F.array(*[F.lit(w) for w in _WORDS])
    n_words_col = (_h(F.col("id"), "dl") % 70 + 10).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words_col),
            lambda i: F.element_at(
                word_arr, (_h(F.col("id") * 1000 + i, "dw") % len(_WORDS) + 1).cast("int")
            ),
        ),
        " ",
    )
    langs = ["en", "es", "fr", "de", "zh"]
    documents = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(F.array(*[F.lit(l) for l in langs]), (_h(F.col("id"), "dla") % 5 + 1).cast("int")).alias("lang"),
        F.concat(F.lit("src"), (_h(F.col("id"), "ds") % 20).cast("string")).alias("source"),
        F.length(text).alias("n_chars"),
    )
    write("documents", documents, n_docs)

    dim = 64
    embedding = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (((_h(F.col("id") * 100 + i, "em") % 2001) - 1000) / 1000.0).cast("float"),
    )
    embeddings = spark.range(n_docs).select(
        F.col("id").alias("vec_id"),
        embedding.alias("embedding"),
        (_h(F.col("id"), "el") % 10).cast("int").alias("label"),
    )
    write("embeddings", embeddings, n_docs)

    etypes = ["click", "error", "purchase", "signup", "view"]
    ev_base_us = F.lit(1_704_067_200_000_000)  # 2024-01-01 UTC, µs
    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (ev_base_us + _h(F.col("id"), "et") % (30 * 24 * 3600 * 1_000_000)).cast("long")
        ).alias("ts"),
        (_h(F.col("id"), "eu") % max(1, n_events // 100)).alias("user_id"),
        F.element_at(F.array(*[F.lit(t) for t in etypes]), (_h(F.col("id"), "ee") % 5 + 1).cast("int")).alias("event_type"),
        ((_h(F.col("id"), "ev") % 20_000) / 100.0).alias("value"),
        F.concat(F.lit('{"k": '), (_h(F.col("id"), "ek") % 100).cast("string"), F.lit("}")).alias("props"),
    )
    write("events", events, n_events)
    return counts


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print("Usage: python -m mapreduce_model_spark.datagen <sf> <out_dir>", file=sys.stderr)
        return 1
    from mapreduce_model_spark.session import get_spark

    sf, out_dir = float(argv[0]), argv[1]
    counts = generate(get_spark(app_name="datagen"), sf, out_dir)
    print(counts)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
