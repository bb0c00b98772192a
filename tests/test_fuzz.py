"""Keep the differential fuzzer (tools/fuzz.py) honest inside the suite:
a small seeded run must generate valid cross-engine SQL (0 skips — a skip
means the generator emitted something one engine refused) and 0
divergences. The big runs (200 queries × several seeds × sf0.01/sf0.1)
are recorded in COVERAGE.md; this pin is the rot guard."""


def test_fuzz_seeded_run_is_clean(spark, sf_dir, capsys):
    import random

    import duckdb

    from mapreduce_model_spark.registry import TABLES as TNAMES, table
    from tools.fuzz import Gen, Sampler, _multiset

    con = duckdb.connect()
    for t in TNAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    for t in TNAMES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)

    gen = Gen(random.Random(99), Sampler(con))
    for i in range(25):
        sql = gen.next_query()
        want = _multiset(con.execute(sql).fetchall())  # must not raise
        got = _multiset(tuple(r) for r in spark.sql(sql).collect())
        assert got == want, f"q{i} diverged: {sql}"
