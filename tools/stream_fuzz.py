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
             source so no generated case depends on file arrival order.

Third mode (r10, verdict #3 — the ordered modes never exercised the one
thing watermarks exist for):

  late     — events split into SHUFFLED/OVERLAPPING files (a hash-chosen
             subset displaced 1..k files later than its ts-bucket), then
             streamed append-mode with maxFilesPerTrigger=1. Parity = a
             batch simulation of the per-micro-batch watermark trajectory
             (_late_predictor): finalized windows must match exactly AND
             rows later than the watermark must be dropped exactly (per
             (row, window) pair — sliding windows drop only the already-
             closed windows of a late row). Watermark delays are drawn as
             fractions of the file time-span so the battery mixes
             late-but-kept with late-dropped rows; each OK line reports
             its pair-drop count so a battery that exercised no lateness
             is visible.

Fourth mode (r11, verdict #4 — the late mode above excludes sessions):

  late-session — session_window aggregations over the same displaced
             splits; parity = _late_session_predictor, an exact replay of
             the merge-then-evict state machine under the two-watermark
             trajectory (late filter on the per-row session end vs the
             PREVIOUS batch's watermark; eviction vs the current one). A
             session emitted by the watermark leaves state, so a later
             within-gap arrival opens a NEW overlapping session — the
             deliberate divergence from batch semantics this mode pins.
             Each OK line reports rows dropped + split sessions so a
             battery that exercised neither path is visible.

Usage: python tools/stream_fuzz.py [sf_dir] [n_cases]
Env:   STREAM_FUZZ_SEED (default 9), STREAM_FUZZ_N (default 120),
       STREAM_FUZZ_LATE_N (default 100), STREAM_FUZZ_LATE_SESS_N
       (default 50)
Prints one line per case (OK/FAIL) + ``STREAMFUZZ n=.. fails=..`` +
``LATEFUZZ n=.. fails=.. pairs_dropped=..`` +
``LATESESSFUZZ n=.. fails=.. rows_dropped=.. split_sessions=..``.
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


def _write_split(
    spark,
    ev,
    out_dir: str,
    n_files: int = 4,
    disp_pct: int = 0,
    max_disp: int = 1,
    salt: int = 0,
) -> list[tuple[int, str]]:
    """events split into ``n_files`` ts-ordered bucket files; with
    ``disp_pct`` > 0 a deterministic hash-chosen ``disp_pct``% of rows is
    displaced 1..``max_disp`` files LATER than its ts-bucket — controlled
    out-of-order arrival for the late-data mode. DataFrame slicing
    end-to-end so the written schema is the source schema exactly (the
    old collect + createDataFrame round trip re-inferred types, r9
    ADVICE). Files are written sequentially, so FileStreamSource's
    (modTime, path) order == index order. Returns [(index, path)] of the
    non-empty files actually written. The global row_number is fuzzer-
    harness-only (test-sized input), never engine code."""
    from pyspark.sql import Window as W

    cols = ev.columns
    n = ev.count()
    per = (n + n_files - 1) // n_files
    ranked = ev.withColumn(
        "_rn", F.row_number().over(W.orderBy("ts", "event_id")) - 1
    )
    # exact integer division: subtract the modulus first so the double
    # quotient is an integer before the cast
    base = (
        ((F.col("_rn") - F.col("_rn") % F.lit(per)) / F.lit(per))
    ).cast("int")
    fidx = base
    if disp_pct:
        h = F.pmod(F.hash("event_id", F.lit(salt)), F.lit(100))
        d = F.lit(1) + F.pmod(F.hash("event_id", F.lit(salt + 1)), F.lit(max_disp))
        fidx = F.when(h < F.lit(disp_pct), base + d).otherwise(base)
    fidx = F.least(fidx, F.lit(n_files - 1))
    tagged = ranked.withColumn("_f", fidx).persist()
    counts = {r["_f"]: r["n"] for r in tagged.groupBy("_f").agg(F.count(F.lit(1)).alias("n")).collect()}
    os.makedirs(out_dir, exist_ok=True)
    written: list[tuple[int, str]] = []
    for i in range(n_files):
        if counts.get(i):
            path = f"{out_dir}/f{i:02d}"
            tagged.where(F.col("_f") == i).select(*cols).coalesce(1).write.mode(
                "overwrite"
            ).parquet(path)
            written.append((i, path))
    tagged.unpersist()
    return written


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


_MIN_US = 60_000_000


def _dur_min(s: str) -> int:
    num, unit = s.split()
    return int(num) * (60 if unit.startswith("hour") else 1)


def build_late_case(rng: random.Random, range_us: int):
    """A watermarked tumbling/sliding aggregation over a SHUFFLED,
    OVERLAPPING multi-file source — the arrival order the ordered modes
    deliberately avoid (r9 verdict #3: the generator never exercised the
    one thing watermarks exist for). Watermark delays are drawn as
    fractions of the ts-bucket span so the battery mixes late-but-kept
    rows (delay ≥ displacement) with late-dropped ones. Session windows
    are excluded: late rows MERGE sessions, so the finalized set has no
    closed-form batch predictor (the fixed cases in tests/test_streaming.py
    cover session lateness)."""
    kind = rng.choice(["tumbling", "tumbling", "sliding"])
    width = rng.choice(WIDTHS)
    slide = (
        width
        if kind == "tumbling"
        else rng.choice([w for w in WIDTHS if WIDTHS.index(w) <= WIDTHS.index(width)])
    )
    n_files = rng.choice([3, 4, 5, 6])
    bucket_span_min = max(1, range_us // (n_files * _MIN_US))
    frac = rng.choice([0.05, 0.2, 0.5, 1.0, 1.5])
    wm_min = max(1, int(bucket_span_min * frac))
    keys, keyfns = _keys(rng)
    aggs = _aggs(rng)
    flt = _filter(rng)
    spec = {
        "width_us": _dur_min(width) * _MIN_US,
        "slide_us": _dur_min(slide) * _MIN_US,
        "delay_ms": wm_min * 60_000,
        "wm": f"{wm_min} minutes",
        "keys": keys,
        "keyfns": keyfns,
        "aggs": aggs,
        "flt": flt,
        "n_files": n_files,
        "disp_pct": rng.choice([5, 10, 20, 35]),
    }
    spec["max_disp"] = rng.randrange(1, spec["n_files"])

    def fn(ev, streaming_wm=None):
        out = ev
        for kf in keyfns:
            out = kf(out)
        if flt is not None:
            out = out.where(flt)
        if streaming_wm:
            out = out.withWatermark("ts", streaming_wm)
        agged = out.groupBy(F.window("ts", width, slide).alias("w"), *keys).agg(*aggs)
        return agged.select(
            F.unix_micros("w.start").alias("ws"),
            F.unix_micros("w.end").alias("we"),
            "*",
        ).drop("w")

    desc = (
        f"late {kind} w={width}/{slide} wm={wm_min}m files={spec['n_files']}"
        f" disp={spec['disp_pct']}%x{spec['max_disp']} keys={keys}"
        f" flt={flt is not None}"
    )
    return desc, fn, spec


def build_late_session_case(rng: random.Random, range_us: int):
    """A watermarked SESSION-window aggregation over a shuffled/overlapping
    multi-file source (r10 verdict #4 — the late mode excluded sessions
    because late rows MERGE sessions, so no single batch aggregation is a
    valid oracle). The oracle here is :func:`_late_session_predictor`, an
    exact replay of the per-micro-batch watermark trajectory over session
    merge/evict state transitions. Watermark delays are drawn as fractions
    of the ts-bucket span so the battery mixes late-but-kept rows with
    late-dropped ones AND with sessions that were already finalized when a
    within-gap row arrived (the stream must then open a NEW overlapping
    session — the exact divergence from batch semantics that makes the
    ordered modes unable to cover this path)."""
    n_files = rng.choice([3, 4, 5, 6])
    dense = rng.random() < 0.5
    if dense:
        # DENSE sub-mode: slice the corpus to n_files buckets of only a few
        # gap-widths each, so events chain into multi-row sessions and a
        # displaced row usually lands INSIDE an already-evicted session's
        # interval — the split-session path the span mode almost never hits
        # (bucket span there is ~days vs gaps ≤ 1 h). Gaps straddle the
        # per-key inter-arrival (≈9–21 min at sf0.01): a gap well ABOVE it
        # chains each key into one giant never-evicted session (no splits,
        # found empirically in the r11 60-case run — 1 split), so the small
        # gaps are what actually break sessions early and let a displaced
        # row arrive after its session's eviction.
        gap = rng.choice(["5 minutes", "10 minutes", "30 minutes"])
        mult = rng.choice([3, 4, 6])
        bucket_span_min = _dur_min(gap) * mult
        slice_us = n_files * bucket_span_min * _MIN_US
        frac = rng.choice([0.3, 0.6, 1.0, 1.5])
        off_us = int((range_us - slice_us) * rng.random()) if range_us > slice_us else 0
    else:
        gap = rng.choice(GAPS)
        bucket_span_min = max(1, range_us // (n_files * _MIN_US))
        frac = rng.choice([0.05, 0.2, 0.5, 1.0, 1.5])
        slice_us = off_us = None
    key = rng.choice(["user_id", "event_type"]) if not dense else rng.choice(
        ["event_type", "ub2"]
    )
    wm_min = max(1, int(bucket_span_min * frac))
    aggs = _aggs(rng)
    flt = _filter(rng)
    spec = {
        "gap_us": _dur_min(gap) * _MIN_US,
        "delay_ms": wm_min * 60_000,
        "wm": f"{wm_min} minutes",
        "key": key,
        "aggs": aggs,
        "flt": flt,
        "n_files": n_files,
        "disp_pct": rng.choice([5, 10, 20, 35]),
        "slice_us": slice_us,
        "off_us": off_us,
    }
    spec["max_disp"] = rng.randrange(1, n_files)

    def _with_key(df):
        if key == "ub2":
            return df.withColumn("ub2", F.pmod("user_id", F.lit(2)).cast("int"))
        return df

    spec["with_key"] = _with_key

    def fn(ev, streaming_wm=None, gap=gap, key=key):
        out = _with_key(ev)
        if flt is not None:
            out = out.where(flt)
        if streaming_wm:
            out = out.withWatermark("ts", streaming_wm)
        agged = out.groupBy(F.session_window("ts", gap).alias("w"), key).agg(*aggs)
        return agged.select(
            F.unix_micros("w.start").alias("ws"),
            F.unix_micros("w.end").alias("we"),
            F.col(key).alias("k"),
            "*",
        ).drop("w", key)

    desc = (
        f"late-session{' dense' if dense else ''} gap={gap} key={key}"
        f" wm={wm_min}m files={n_files}"
        f" disp={spec['disp_pct']}%x{spec['max_disp']} flt={flt is not None}"
    )
    return desc, fn, spec


def _merge_session(lst: list[dict], s: int, e: int, rid) -> None:
    """Union the half-open interval [s, e) (one row's session window) into
    the per-key open-session list IN PLACE. Spark merges two sessions iff
    they overlap as half-open intervals (start2 < end1) — an event at
    exactly ``prev_end`` starts a NEW session."""
    rows = [rid]
    keep = []
    for sess in lst:
        if sess["s"] < e and s < sess["e"]:
            s = min(s, sess["s"])
            e = max(e, sess["e"])
            rows.extend(sess["rows"])
        else:
            keep.append(sess)
    keep.append({"s": s, "e": e, "rows": rows})
    lst[:] = keep


def _late_session_predictor(spark, files: list[tuple[int, str]], spec, src):
    """Exact replay of Spark's session-window state machine over the known
    micro-batch (=file) order. Per batch k, in order:

    1. event-time stats see every post-filter row (max ts, whole-ms floor);
    2. LATE FILTER with the PREVIOUS batch's watermark (SPARK-40925): an
       incoming row is dropped iff its per-row session window end
       (ts + gap) ≤ wm(batch k−1) — the session_window column carries the
       event time, so the predicate tests its end, exactly as the verified
       fixed-window pair rule;
    3. MERGE surviving rows into per-key open sessions (half-open interval
       union — merge iff start2 < end1; session = [min ts, max ts + gap));
    4. EVICT+EMIT sessions whose end ≤ wm(batch k) — merge-then-evict, so
       a late row can extend a session and see it emitted the same batch.

    A session, once emitted, leaves state: a later within-gap arrival that
    passes the late filter opens a NEW session (its start is strictly after
    the emitted one's, so (ws, we, key) stays unique in the output — no
    multiset ambiguity). availableNow runs a trailing empty batch, so the
    final watermark performs the last eviction; sessions still open then
    are never emitted in append mode.

    The aggregation reuses the SAME agg expressions as the streamed plan
    over the simulated row→session assignment, so any divergence is an
    execution-path bug, not a formula difference. Row bookkeeping is
    driver-side but fuzzer-harness-only (test-sized input), never engine
    code. Returns (want_rows, n_rows_dropped, n_split_sessions) — drops
    prove lateness was exercised; splits prove the merge-after-evict path
    was (a split is an emitted session overlapping an earlier-emitted one
    for the same key, which single-batch semantics would have merged)."""
    gap_us, delay_ms = spec["gap_us"], spec["delay_ms"]
    aggs = spec["aggs"]

    rows = src.select(
        "_f", "event_id", F.unix_micros("ts").alias("ts_us"), "k"
    ).collect()
    by_f: dict[int, list] = {}
    for r in rows:
        by_f.setdefault(r["_f"], []).append(r)
    maxes = [
        max((r["ts_us"] for r in by_f.get(idx, [])), default=None)
        for idx, _ in files
    ]
    wm_evict, cur = [], 0
    for m in maxes:
        wm_evict.append(cur)
        if m is not None:
            cur = max(cur, (m // 1000 - delay_ms) * 1000)
    final_wm = cur
    wm_late = [0] + wm_evict[:-1]

    state: dict[object, list[dict]] = {}
    emitted: list[tuple[object, int, int, list]] = []
    dropped = 0
    for bi in range(len(files)):
        idx = files[bi][0]
        for r in by_f.get(idx, []):
            if r["ts_us"] + gap_us <= wm_late[bi]:
                dropped += 1
                continue
            _merge_session(
                state.setdefault(r["k"], []),
                r["ts_us"],
                r["ts_us"] + gap_us,
                r["event_id"],
            )
        for kk, lst in state.items():
            still = []
            for sess in lst:
                if sess["e"] <= wm_evict[bi]:
                    emitted.append((kk, sess["s"], sess["e"], sess["rows"]))
                else:
                    still.append(sess)
            state[kk] = still
    for kk, lst in state.items():
        for sess in lst:
            if sess["e"] <= final_wm:
                emitted.append((kk, sess["s"], sess["e"], sess["rows"]))

    splits = 0
    seen: dict[object, list[tuple[int, int]]] = {}
    for kk, s, e, _ in sorted(emitted, key=lambda t: (str(t[0]), t[1])):
        if any(s < pe and ps < e for ps, pe in seen.get(kk, [])):
            splits += 1
        seen.setdefault(kk, []).append((s, e))

    assign = [
        (int(rid), int(s), int(e))
        for _, s, e, rids in emitted
        for rid in rids
    ]
    if not assign:
        return [], dropped, splits
    adf = spark.createDataFrame(assign, "event_id long, ws long, we long")
    want_df = (
        src.join(F.broadcast(adf), "event_id")
        .groupBy("ws", "we", "k")
        .agg(*aggs)
    )
    return _rows(want_df), dropped, splits


def run_late_session_cases(spark, sf_dir: str, rng: random.Random, n: int):
    """Run ``n`` late-data SESSION cases: displaced split → append stream →
    :func:`_late_session_predictor`. Returns (fails, rows_dropped,
    split_sessions)."""
    from mapreduce_model_spark.registry import table
    from mapreduce_model_spark.streaming.windows import run_stream_to_table

    ev = table(spark, sf_dir, "events")
    lo, hi = ev.agg(
        F.unix_micros(F.min("ts")), F.unix_micros(F.max("ts"))
    ).collect()[0]
    fails = 0
    total_dropped = 0
    total_splits = 0
    for i in range(n):
        late_dir = tempfile.mkdtemp(prefix="streamfuzz_lsess_")
        name = f"sfzs_{i}"
        try:
            desc, fn, spec = build_late_session_case(rng, hi - lo)
            ev_case = ev
            if spec["slice_us"] is not None:
                s0 = lo + spec["off_us"]
                ev_case = ev.where(
                    F.unix_micros("ts").between(s0, s0 + spec["slice_us"])
                )
            files = _write_split(
                spark,
                ev_case,
                late_dir,
                n_files=spec["n_files"],
                disp_pct=spec["disp_pct"],
                max_disp=spec["max_disp"],
                salt=1000 + i,
            )
            if not files:
                print(f"SKIP S{i:03d} {desc} (empty slice)", flush=True)
                continue
            schema = spark.read.parquet(files[0][1]).schema
            stream_src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .option("basePath", late_dir)
                .parquet(f"{late_dir}/f*")
            )
            run_stream_to_table(
                fn(stream_src, streaming_wm=spec["wm"]), name, output_mode="append"
            )
            got = _rows(spark.table(name))
            src = spark.read.option("basePath", late_dir).parquet(f"{late_dir}/f*")
            src = src.withColumn(
                "_f",
                F.regexp_extract(F.input_file_name(), "/f(\\d{2})/", 1).cast("int"),
            )
            src = spec["with_key"](src)
            if spec["flt"] is not None:
                src = src.where(spec["flt"])
            src = src.withColumn("k", F.col(spec["key"]))
            want, n_dropped, n_splits = _late_session_predictor(
                spark, files, spec, src
            )
            total_dropped += n_dropped
            total_splits += n_splits
            ok = got == want
        except Exception as exc:  # noqa: BLE001 — report, keep fuzzing
            ok = False
            got, want, n_dropped, n_splits = [f"EXCEPTION {exc}"], [], 0, 0
        if ok:
            print(
                f"OK S{i:03d} {desc} dropped={n_dropped} splits={n_splits}",
                flush=True,
            )
        else:
            fails += 1
            print(
                f"FAIL S{i:03d} {desc}\n  got {len(got)} rows,"
                f" want {len(want)}; first diff:"
                f" {next(iter(set(map(str, got)) ^ set(map(str, want))), '')[:200]}",
                flush=True,
            )
        if spark.catalog.tableExists(name):
            spark.catalog.dropTempView(name)
        shutil.rmtree(late_dir, ignore_errors=True)
    return fails, total_dropped, total_splits


def _late_predictor(spark, late_dir: str, files: list[tuple[int, str]], spec):
    """Batch simulation of the append-mode watermark trajectory over the
    known micro-batch (=file) order. Spark semantics replicated exactly:

    - the watermark as of batch k is ``(max event-time µs seen in batches
      0..k-1, integer-floored to ms) − delay_ms``, scaled back to µs —
      EventTimeWatermarkExec accumulates stats in whole ms, so µs-precision
      input (this corpus) needs the floor, not a float .timestamp() round
      trip (initial watermark: 0);
    - stats see every post-filter row, including rows the stateful op then
      drops as late;
    - lateness is per (row, window) PAIR (sliding: a very-late row's older
      windows drop, newer ones survive), and the LATE FILTER LAGS EVICTION
      BY ONE BATCH: since Spark 3.4 each micro-batch carries TWO watermark
      values (SPARK-40925) — ``watermarkForLateEvents`` = the PREVIOUS
      batch's watermark (filters incoming rows) and
      ``watermarkForEviction`` = the current one (closes/emits windows).
      Pair kept iff window end > wm(batch k−1), not wm(batch k). Verified
      empirically here before encoding: a late row arriving in the first
      batch after the watermark passed its window end is ACCEPTED and its
      window emitted that same batch (numRowsDroppedByWatermark=0,
      numRowsRemoved=1); an identical row one batch later is dropped. The
      lag can never double-emit a window: any window evicted in batch j
      has end ≤ wm_evict(j) = wm_late(j+1), so every later arrival for it
      is filtered;
    - a window finalizes (append emits it, exactly once) iff its end ≤ the
      final watermark (availableNow runs a trailing empty batch, so the
      final eviction always happens).

    The window expansion is exact integer arithmetic on epoch-aligned
    starts (the F.window contract); the aggregation then reuses the SAME
    agg/key column expressions as the streamed plan, so a divergence is an
    execution-path bug, not a formula difference. Returns (want_df,
    n_pairs_dropped) — the drop count proves the case actually exercised
    lateness."""
    flt, keyfns, keys, aggs = spec["flt"], spec["keyfns"], spec["keys"], spec["aggs"]
    w_us, s_us, delay_ms = spec["width_us"], spec["slide_us"], spec["delay_ms"]

    maxes = []
    for _, path in files:
        df = spark.read.parquet(path)
        if flt is not None:
            df = df.where(flt)
        maxes.append(df.agg(F.unix_micros(F.max("ts"))).collect()[0][0])
    wm_evict, cur = [], 0
    for m in maxes:
        wm_evict.append(cur)
        if m is not None:
            cur = max(cur, (m // 1000 - delay_ms) * 1000)
    final_wm = cur
    # SPARK-40925: the late filter of batch k uses batch k-1's watermark
    wm_late = [0] + wm_evict[:-1]

    src = spark.read.option("basePath", late_dir).parquet(f"{late_dir}/f*")
    src = src.withColumn(
        "_f", F.regexp_extract(F.input_file_name(), "/f(\\d{2})/", 1).cast("int")
    )
    for kf in keyfns:
        src = kf(src)
    if flt is not None:
        src = src.where(flt)
    ts_us = F.unix_micros("ts")
    x = ts_us - F.lit(w_us).cast("long")
    smin = (
        ((x - x % F.lit(s_us)) / F.lit(s_us)).cast("long") + 1
    ) * F.lit(s_us).cast("long")
    smax = (
        ((ts_us - ts_us % F.lit(s_us)) / F.lit(s_us)).cast("long")
    ) * F.lit(s_us).cast("long")
    exp = (
        src.withColumn("ws", F.explode(F.sequence(smin, smax, F.lit(s_us).cast("long"))))
        .withColumn("we", F.col("ws") + F.lit(w_us).cast("long"))
        .persist()
    )
    wm_map = F.create_map(
        *[F.lit(v) for (idx, _), wm in zip(files, wm_late) for v in (idx, wm)]
    )
    kept = exp.where(F.col("we") > wm_map[F.col("_f")])
    n_dropped = exp.count() - kept.count()
    want_df = (
        kept.groupBy("ws", "we", *keys)
        .agg(*aggs)
        .where(F.col("we") <= F.lit(final_wm))
    )
    want = _rows(want_df)
    exp.unpersist()
    return want, n_dropped


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
        _write_split(spark, table(spark, sf_dir, "events"), split_dir)
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
                    # finalized set: windows whose end ≤ watermark, where
                    # the watermark derives from max(ts) over the rows the
                    # WATERMARK operator actually sees — i.e. AFTER the
                    # template's filter (the event-time stats collector
                    # sits above the filter in the plan) — floored to whole
                    # ms exactly as EventTimeWatermarkExec accumulates
                    # (in-engine unix_micros, no local-TZ .timestamp()
                    # round trip: r9 ADVICE). 'we' is µs; wm strings m/h.
                    src_batch = batch_single
                    if flt is not None:
                        src_batch = src_batch.where(flt)
                    max_us = src_batch.agg(
                        F.unix_micros(F.max("ts"))
                    ).collect()[0][0]
                    thr_us = (max_us // 1000 - _dur_min(wm) * 60_000) * 1000
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

        # ---- late-data mode: shuffled/overlapping files, watermark drops
        n_late = int(os.environ.get("STREAM_FUZZ_LATE_N", "100"))
        late_fails, total_dropped = run_late_cases(spark, sf_dir, rng, n_late)
        print(f"LATEFUZZ n={n_late} fails={late_fails} pairs_dropped={total_dropped}")

        # ---- late-data SESSION mode: watermark trajectory over merges
        n_lsess = int(os.environ.get("STREAM_FUZZ_LATE_SESS_N", "50"))
        ls_fails, ls_dropped, ls_splits = run_late_session_cases(
            spark, sf_dir, rng, n_lsess
        )
        print(
            f"LATESESSFUZZ n={n_lsess} fails={ls_fails}"
            f" rows_dropped={ls_dropped} split_sessions={ls_splits}"
        )
        return 1 if (fails or late_fails or ls_fails) else 0
    finally:
        shutil.rmtree(split_dir, ignore_errors=True)
        spark.stop()


def run_late_cases(spark, sf_dir: str, rng: random.Random, n_late: int):
    """Run ``n_late`` late-data cases (see :func:`build_late_case`): each
    case writes its own displaced split, streams it append-mode through
    maxFilesPerTrigger=1, and compares against :func:`_late_predictor`.
    Returns (fails, total_pairs_dropped) — a battery whose total drop
    count is 0 exercised nothing and should be treated as suspect."""
    from mapreduce_model_spark.registry import table
    from mapreduce_model_spark.streaming.windows import run_stream_to_table

    ev = table(spark, sf_dir, "events")
    lo, hi = ev.agg(
        F.unix_micros(F.min("ts")), F.unix_micros(F.max("ts"))
    ).collect()[0]
    fails = 0
    total_dropped = 0
    for i in range(n_late):
        late_dir = tempfile.mkdtemp(prefix="streamfuzz_late_")
        name = f"sfzl_{i}"
        try:
            desc, fn, spec = build_late_case(rng, hi - lo)
            files = _write_split(
                spark,
                ev,
                late_dir,
                n_files=spec["n_files"],
                disp_pct=spec["disp_pct"],
                max_disp=spec["max_disp"],
                salt=i,
            )
            schema = spark.read.parquet(files[0][1]).schema
            stream_src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .option("basePath", late_dir)
                .parquet(f"{late_dir}/f*")
            )
            run_stream_to_table(
                fn(stream_src, streaming_wm=spec["wm"]), name, output_mode="append"
            )
            got = _rows(spark.table(name))
            want, n_dropped = _late_predictor(spark, late_dir, files, spec)
            total_dropped += n_dropped
            ok = got == want
        except Exception as exc:  # noqa: BLE001 — report, keep fuzzing
            ok = False
            got, want, n_dropped = [f"EXCEPTION {exc}"], [], 0
        if ok:
            print(f"OK L{i:03d} {desc} dropped={n_dropped}", flush=True)
        else:
            fails += 1
            print(
                f"FAIL L{i:03d} {desc}\n  got {len(got)} rows,"
                f" want {len(want)}; first diff:"
                f" {next(iter(set(map(str, got)) ^ set(map(str, want))), '')[:200]}",
                flush=True,
            )
        if spark.catalog.tableExists(name):
            spark.catalog.dropTempView(name)
        shutil.rmtree(late_dir, ignore_errors=True)
    return fails, total_dropped


if __name__ == "__main__":
    raise SystemExit(main())
