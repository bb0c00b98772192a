"""Local mimic of the driver's t2 correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, then compares row count, sorted column names, and the
order-insensitive multiset of (canonicalized) row values. Not the driver's
exact hash — a strictly local pre-flight so mismatches are caught here first.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from mapreduce_model_spark.registry import ORACLE_SQL, QUERIES, TABLES


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for row in rows:
        key = tuple(_canon(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def run_oracle(sf_dir: str, sql: str):
    import os

    con = duckdb.connect()
    try:
        # One heavy oracle must not take the machine with it: an uncapped
        # in-memory DuckDB reserves up to 80% of RAM with NO spill, and a
        # failed >100 GB reservation poisons the whole process for every
        # later allocation (the round-8 gen-sf1 sweep death). Cap the
        # buffer pool and give it a temp dir so big oracles spill instead.
        con.execute(
            f"SET memory_limit='{os.environ.get('ORACLE_MEM', '48GB')}'"
        )
        # Cap oracle parallelism: DuckDB defaults to every core, and the
        # window-heavy unrolled-recurrence oracles get SLOWER past ~16
        # threads — measured round 9 on semantic_dedup_sampled at gen-sf1:
        # 1024 s at the 32-thread default vs 228 s at threads=16 (same
        # query, same machine; the per-thread window materialization of
        # 64-double list payloads blows the shared buffer pool into
        # spill). 16 is also polite to the Spark JVM sharing the box.
        con.execute(f"SET threads={os.environ.get('ORACLE_THREADS', '16')}")
        con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
        try:
            con.execute(
                "SET max_temp_directory_size="
                f"'{os.environ.get('ORACLE_SPILL', '60GB')}'"
            )
        except duckdb.Error:
            pass
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            # harness tables are single files; Spark-generated ones
            # (datagen.py) are directories of part files
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        # ORACLE_TIMEOUT=<seconds>: hard wall-clock budget per oracle. The
        # caps above bound MEMORY, not TIME — a quadratic oracle can grind
        # for hours inside its spill budget (the round-8 gen-sf1 chunk
        # that sat >1 h in one blocked-Jaccard truth). The watchdog calls
        # con.interrupt(), DuckDB raises, and the sweep records the query
        # as a FAIL with the reason instead of silently eating the round.
        timeout = float(os.environ.get("ORACLE_TIMEOUT", "0") or 0)
        watchdog = None
        # gate the timer callback on a still-running flag: if the Timer
        # fires in the window between query completion and cancel(), an
        # ungated interrupt() would set a pending-interrupt flag on the
        # connection. Harmless today ONLY because each call opens a fresh
        # connection and closes it below — the flag makes the watchdog
        # safe even if the connection is ever cached/reused.
        running = [True]
        if timeout > 0:
            import threading

            def _interrupt() -> None:
                if running[0]:
                    con.interrupt()

            watchdog = threading.Timer(timeout, _interrupt)
            watchdog.daemon = True
            watchdog.start()
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        except duckdb.InterruptException as exc:
            raise TimeoutError(
                f"oracle exceeded ORACLE_TIMEOUT={timeout:.0f}s"
            ) from exc
        finally:
            running[0] = False
            if watchdog is not None:
                watchdog.cancel()
        return cols, rows
    finally:
        con.close()


def compare_query(spark, sf_dir: str, name: str) -> str | None:
    """Returns None on match, else a human-readable mismatch description."""
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLE_SQL:
        return None if len(s_rows) >= 0 else "spark query failed"
    o_cols, o_rows = run_oracle(sf_dir, ORACLE_SQL[name])
    if sorted(s_cols) != sorted(o_cols):
        return f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
    s_ms = _rows_to_multiset(s_cols, s_rows)
    o_ms = _rows_to_multiset(o_cols, o_rows)
    if s_ms != o_ms:
        only_s = [k for k in s_ms if s_ms[k] != o_ms.get(k, 0)][:3]
        only_o = [k for k in o_ms if o_ms[k] != s_ms.get(k, 0)][:3]
        return f"values differ: spark-only={only_s} oracle-only={only_o}"
    return None
