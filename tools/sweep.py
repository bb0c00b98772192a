"""Full-registry DuckDB oracle sweep — the local twin of the driver's
correctness gate.

    python tools/sweep.py [sf_dir]          # default /root/testdata/sf0.01

Every registered query with an oracle is hash-compared against DuckDB on
the same parquet tables (row count + schema + order-insensitive value
hash, via tests.oracle_harness.compare_query — the same comparator the
pytest parity sweep uses); rows-only queries (iterative fixpoints,
sketches, mapInPandas) are executed to the noop sink so a crash still
fails the sweep. Exit code 1 on any failure.

Prints one summary line:
    SWEEPDONE checked=<n> rowsonly=<n> fails=<n> secs=<n>

Env: SWEEP_SKIP — comma-separated query names to skip (printed, counted in
the summary). Exists for sweeping GENERATED corpora whose vector tables
are 100-250x the driver's: a handful of registered queries are
fixed-constant exemplars (k=8 clusters, 6 LSH bits, stride-25 centroids —
documented in PLANS.md "Cross-scale scaling evidence") whose DuckDB
oracles go quadratic at that scale (the sf0.1-generated semantic_dedup
oracle filled the disk with spill before this knob existed). A per-query
exception no longer kills the sweep either way — it records FAIL and
moves on.

SWEEP_CHUNK=N — run the sweep as sequential child processes of N queries
each (one fresh Python+JVM+DuckDB per chunk), aggregating the children's
summary lines into one SWEEPDONE. Needed for multi-hour generated-corpus
sweeps: a single process accumulates allocator high-water across every
oracle it runs (glibc/jemalloc arenas never shrink back), and at gen-sf1
the 145th query's in-process mallocs started failing (DuckDB
bad_alloc, OpenBLAS pthread_create) with >100 GB still free system-wide.
Chunking resets the process footprint every N queries.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from mapreduce_model_spark.registry import ORACLE_SQL, QUERIES

    skip = {s for s in os.environ.get("SWEEP_SKIP", "").split(",") if s}
    # SWEEP_QUERIES=a,b,... restricts the sweep to a subset — for targeted
    # re-checks and for big generated corpora where the full registry's
    # DuckDB oracles exceed a round's wall-clock (gen-sf1: sweep the
    # scale-critical list rather than nothing)
    only = {s for s in os.environ.get("SWEEP_QUERIES", "").split(",") if s}
    unknown = only - set(QUERIES)
    if unknown:
        print(f"SWEEP_QUERIES unknown: {sorted(unknown)}")
        return 2

    chunk = int(os.environ.get("SWEEP_CHUNK", "0") or 0)
    if chunk > 0:
        import re
        import subprocess

        names = [
            n for n in QUERIES if (not only or n in only) and n not in skip
        ]
        t0 = time.time()
        tot = {"checked": 0, "rowsonly": 0, "fails": 0}
        rc_any = 0
        for i in range(0, len(names), chunk):
            env = dict(os.environ)
            env["SWEEP_QUERIES"] = ",".join(names[i : i + chunk])
            env["SWEEP_CHUNK"] = ""
            env.pop("SWEEP_SKIP", None)  # already applied to the list
            # stream the child's lines as they arrive — a multi-hour
            # generated-corpus chunk must show per-query progress LIVE,
            # not dump it when the child exits (the round-8 gen-sf1 run
            # sat opaque for an hour inside one oracle)
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), sf_dir],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
            summarized = False
            for raw in proc.stdout:
                # scan EVERY \r segment (progress-bar overwrite frames),
                # not just the last: a status line sharing a physical
                # line with a later \r fragment must not be dropped (a
                # lost SWEEPDONE would misread a healthy chunk as dead)
                for line in raw.rstrip("\n").split("\r"):
                    if line.startswith("SWEEPDONE"):
                        summarized = True
                        for k in tot:
                            m = re.search(rf"{k}=(\d+)", line)
                            if m:
                                tot[k] += int(m.group(1))
                    elif line.startswith(("OK ", "ROWS ", "FAIL", "SKIP")):
                        print(line, flush=True)
            proc.wait()
            rc_any |= proc.returncode
            if not summarized:
                # the child DIED mid-chunk (fatal signal, not a per-query
                # exception): every un-printed query in the chunk was
                # silently lost — say so, and count the chunk as failed
                rc_any = 1
                print(
                    f"CHUNKDIED rc={proc.returncode} "
                    f"queries={env['SWEEP_QUERIES']}",
                    flush=True,
                )
        skipped = f" skipped={len(skip)}" if skip else ""
        print(
            f"SWEEPDONE checked={tot['checked']} "
            f"rowsonly={tot['rowsonly']} fails={tot['fails']}{skipped} "
            f"secs={time.time() - t0:.0f} chunks={chunk}",
            flush=True,
        )
        return 1 if (tot["fails"] or rc_any) else 0

    from mapreduce_model_spark.session import get_spark
    from tests.oracle_harness import compare_query

    spark = get_spark(app_name="sweep", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    t0 = time.time()
    fails = n_skipped = 0
    n_checked = n_rowsonly = 0
    for name in QUERIES:
        if only and name not in only:
            continue
        if name in skip:
            n_skipped += 1
            print(f"SKIP {name} (SWEEP_SKIP)", flush=True)
            continue
        tq = time.time()
        if name in ORACLE_SQL:
            try:
                r = compare_query(spark, sf_dir, name)
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                r = f"raised {exc!r}"
            n_checked += 1
            if r is not None:
                fails += 1
                print(f"FAIL {name}: {r}", flush=True)
            elif os.environ.get("SWEEP_VERBOSE"):
                # per-query OK lines (flushed) so an interrupted long run
                # — e.g. the multi-hour gen-sf1 sweep — still leaves a
                # usable record of what passed
                print(f"OK {name} {time.time() - tq:.1f}s", flush=True)
        else:
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                n_rowsonly += 1
                if os.environ.get("SWEEP_VERBOSE"):
                    print(f"ROWS {name} {time.time() - tq:.1f}s", flush=True)
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                fails += 1
                print(f"FAIL-RUN {name}: {exc}", flush=True)
    skipped = f" skipped={n_skipped}" if n_skipped else ""
    print(
        f"SWEEPDONE checked={n_checked} rowsonly={n_rowsonly} "
        f"fails={fails}{skipped} secs={time.time() - t0:.0f}",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
