"""Stream/batch parity fuzzer — the boundary the SQL fuzzer can't reach.

tools/fuzz.py differentially tests Spark-vs-DuckDB on BATCH plans; nothing
generated there ever exercises the streaming execution path (state store,
watermark eviction, micro-batch incrementalization). This battery does: a
seeded generator builds windowed/sessionized/dedup templates as ONE frame
function and applies it to BOTH a batch scan and a readStream over the
same parquet, asserting row-set equality after the stream drains. Because
the SAME expression tree runs on both sides, any divergence is an
execution-path bug (incremental state merge, watermark close, micro-batch
boundary), never a formula difference.

Two run modes per template mix:
  complete — multi-file source with maxFilesPerTrigger=1 (ts-ordered
             files → several micro-batches), output complete; parity =
             exact equality with the batch frame. Exercises incremental
             state merge across micro-batches.
  append   — watermarked stream; parity = batch windows whose end ≤
             max(ts) − watermark (the finalized set), emitted exactly
             once. Exercises the watermark-close contract. Single-file
             source so no generated case depends on file arrival order
             (late-data ordering is covered by the fixed tests in
             tests/test_streaming.py).

Usage: python tools/stream_fuzz.py [sf_dir] [n_cases]
Env:   STREAM_FUZZ_SEED (default 9), STREAM_FUZZ_N (default 120)
Prints one line per case (OK/FAIL) + final ``STREAMFUZZ n=.. fails=..``.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

WIDTHS = ["1 minute", "2 minutes", "5 minutes", "10 minutes", "30 minutes"]
GAPS = ["5 minutes", "10 minutes", "30 minutes", "1 hour"]
WATERMARKS = ["5 minutes", "10 minutes", "30 minutes", "1 hour"]


def _prep_split_source(spark, sf_dir: str, out_dir: str, n_files: int = 4) -> None:
    """events.parquet split into ``n_files`` ts-ordered files so
    maxFilesPerTrigger=1 yields time-ordered micro-batches (no late data
    by construction — every watermark test stays deterministic)."""
    from mapreduce_model_spark.registry import table

    ev = table(spark, sf_dir, "events").orderBy("ts", "event_id").collect()
    per = (len(ev) + n_files - 1) // n_files
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_files):
        chunk = ev[i * per : (i + 1) * per]
        if chunk:
            spark.createDataFrame(chunk).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/f{i:02d}")


def _keys(rng: random.Random):
    """0-2 grouping keys beyond the window."""
    pool = [
        ("event_type", lambda df: df),
        (
            "user_bucket",
            lambda df, m=rng.choice([2, 3, 5]): df.withColumn(
                "user_bucket", F.pmod("user_id", F.lit(m)).cast("int")
            ),
        ),
    ]
    picked = rng.sample(pool, rng.randrange(0, 3))
    return [p[0] for p in picked], [p[1] for p in picked]


def _aggs(rng: random.Random):
    pool = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value") + 1e-9, 2).alias("sum_v"),
        F.round(F.min("value") + 1e-9, 2).alias("min_v"),
        F.round(F.max("value") + 1e-9, 2).alias("max_v"),
        F.round(F.avg("value") + 1e-9, 2).alias("avg_v"),
    ]
    k = rng.randrange(1, 4)
    idx = sorted(rng.sample(range(len(pool)), k))
    return [pool[i] for i in idx]


def _filter(rng: random.Random):
    return rng.choice(
        [
            None,
            F.col("value") > rng.choice([0.0, 10.0, 50.0]),
            F.col("user_id") % rng.choice([2, 3]) == 0,
            F.col("event_type") != "click",
        ]
    )


def build_case(rng: random.Random):
    """Returns (description, frame_fn, mode, watermark) — frame_fn maps an
    events frame (batch OR stream) to the compared output frame."""
    kind = rng.choice(["tumbling", "tumbling", "sliding", "session", "dedup"])
    mode = rng.choice(["complete", "append"])
    wm = rng.choice(WATERMARKS)
    keys, keyfns = _keys(rng)
    aggs = _aggs(rng)
    flt = _filter(rng)

    if kind == "dedup":
        # deterministic dedup: distinct over the FULL projected row (so
        # which-row-survives never matters) — streaming dedup emits each
        # first-seen row in append mode; for a finite source the drained
        # table IS the distinct set. No watermark: a single stateful
        # operator, unbounded state is fine on test data (the gated
        # within-watermark variant is pinned in tests/test_streaming.py).
        m = rng.choice([2, 3, 5])

        def fn(ev, streaming_wm=None):
            return ev.select(
                F.unix_micros("ts").alias("ts_us"),
                "event_type",
                F.pmod("user_id", F.lit(m)).cast("int").alias("ub"),
            ).dropDuplicates(["event_type", "ub", "ts_us"])

        return f"dedup m={m}", fn, "dedup_append", wm, None

    if kind == "session":
        gap = rng.choice(GAPS)
        key = rng.choice(["user_id", "event_type"])

        # session_window end depends only on data → parity exact in
        # complete mode; append compares the finalized subset
        def fn(ev, streaming_wm=None, gap=gap, key=key):
            out = ev
            if flt is not None:
                out = out.where(flt)
            if streaming_wm:
                out = out.withWatermark("ts", streaming_wm)
            agged = out.groupBy(
                F.session_window("ts", gap).alias("w"), key
            ).agg(*aggs)
            return agged.select(
                F.unix_micros("w.start").alias("ws"),
                F.unix_micros("w.end").alias("we"),
                F.col(key).alias("k"),
                "*",
            ).drop("w", key)

        return f"session gap={gap} key={key} flt={flt is not None}", fn, mode, wm, flt

    width = rng.choice(WIDTHS)
    if kind == "sliding":
        slide = rng.choice([w for w in WIDTHS if WIDTHS.index(w) <= WIDTHS.index(width)])
        win = lambda: F.window("ts", width, slide).alias("w")  # noqa: E731
        desc = f"sliding w={width}/{slide}"
    else:
        win = lambda: F.window("ts", width).alias("w")  # noqa: E731
        desc = f"tumbling w={width}"

    def fn(ev, streaming_wm=None):
        out = ev
        for kf in keyfns:
            out = kf(out)
        if flt is not None:
            out = out.where(flt)
        if streaming_wm:
            out = out.withWatermark("ts", streaming_wm)
        agged = out.groupBy(win(), *keys).agg(*aggs)
        return agged.select(
            F.unix_micros("w.start").alias("ws"),
            F.unix_micros("w.end").alias("we"),
            "*",
        ).drop("w")

    return f"{desc} keys={keys} flt={flt is not None} aggs={len(aggs)}", fn, mode, wm, flt


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    n_cases = int(
        sys.argv[2] if len(sys.argv) > 2 else os.environ.get("STREAM_FUZZ_N", "120")
    )
    seed = int(os.environ.get("STREAM_FUZZ_SEED", "9"))

    from mapreduce_model_spark import get_spark
    from mapreduce_model_spark.registry import normalize_events_ts, table
    from mapreduce_model_spark.streaming.windows import run_stream_to_table

    spark = get_spark(app_name="stream-fuzz", cpus=8, shuffle_partitions=8)
    split_dir = tempfile.mkdtemp(prefix="streamfuzz_")
    try:
        _prep_split_source(spark, sf_dir, split_dir)
        batch_multi = spark.read.option("basePath", split_dir).parquet(
            f"{split_dir}/f*"
        )
        batch_single = table(spark, sf_dir, "events")

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

        rng = random.Random(seed)
        fails = 0
        for i in range(n_cases):
            desc, fn, mode, wm, flt = build_case(rng)
            name = f"sfz_{i}"
            try:
                if mode == "dedup_append":
                    stream_src = (
                        spark.readStream.schema(batch_multi.schema)
                        .option("maxFilesPerTrigger", "1")
                        .option("basePath", split_dir)
                        .parquet(f"{split_dir}/f*")
                    )
                    run_stream_to_table(fn(stream_src), name, output_mode="append")
                    got = _rows(spark.table(name))
                    want = _rows(fn(batch_multi).distinct())
                elif mode == "complete":
                    stream_src = (
                        spark.readStream.schema(batch_multi.schema)
                        .option("maxFilesPerTrigger", "1")
                        .option("basePath", split_dir)
                        .parquet(f"{split_dir}/f*")
                    )
                    sdf = fn(stream_src, streaming_wm=wm)
                    run_stream_to_table(sdf, name, output_mode="complete")
                    got = _rows(spark.table(name))
                    want = _rows(fn(batch_multi))
                else:
                    stream_src = normalize_events_ts(
                        spark.readStream.schema(raw_schema)
                        .option("basePath", sf_dir)
                        .parquet(f"{sf_dir}/events*.parquet")
                    )
                    sdf = fn(stream_src, streaming_wm=wm)
                    run_stream_to_table(sdf, name, output_mode="append")
                    got = _rows(spark.table(name))
                    # finalized set: windows whose end ≤ max(ts) − wm,
                    # where max(ts) is over the rows the WATERMARK operator
                    # actually sees — i.e. AFTER the template's filter (the
                    # event-time stats collector sits above the filter in
                    # the plan). 'we' is µs; wm strings are m/h.
                    src_batch = batch_single
                    if flt is not None:
                        src_batch = src_batch.where(flt)
                    max_ts = src_batch.agg(F.max("ts")).collect()[0][0]
                    num, unit = wm.split()
                    secs = int(num) * (3600 if unit.startswith("hour") else 60)
                    thr_us = int(max_ts.timestamp() * 1_000_000) - secs * 1_000_000
                    want = [r for r in _rows(fn(batch_single)) if r[1] <= thr_us]
                ok = got == want
            except Exception as exc:  # noqa: BLE001 — report, keep fuzzing
                ok = False
                got, want = [f"EXCEPTION {exc}"], []
            if ok:
                print(f"OK {i:03d} [{mode}] {desc}", flush=True)
            else:
                fails += 1
                print(
                    f"FAIL {i:03d} [{mode}] {desc}\n  got {len(got)} rows,"
                    f" want {len(want)}; first diff:"
                    f" {next(iter(set(map(str, got)) ^ set(map(str, want))), '')[:200]}",
                    flush=True,
                )
            spark.catalog.dropTempView(name) if spark.catalog.tableExists(name) else None
        print(f"STREAMFUZZ n={n_cases} fails={fails}")
        return 1 if fails else 0
    finally:
        shutil.rmtree(split_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
