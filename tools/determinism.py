"""Rerun-determinism check: every registered query executed TWICE in one
session against the same sf_dir; the two runs' row-value multisets must be
identical.

    python tools/determinism.py [sf_dir]   # default /root/testdata/sf0.01

This is a DIFFERENT guarantee from the DuckDB sweep: the sweep proves the
answer is right once; this proves a rerun picks the SAME answer — the
idempotence contract several queries advertise (deterministic md5
sampling, tie-broken rankings, pinned range layouts). Nondeterminism that
an oracle comparison can mask (e.g. a result that is one of several valid
top-k tie orders, an unpinned repartitionByRange layout, time-dependent
expressions) fails here. Rows-only queries are included — determinism is
exactly the property they CAN be held to locally.

Exit 1 on any divergence; prints `DETERMINISTIC checked=N fails=0 secs=S`
on success (same tail convention as tools/sweep.py).
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from mapreduce_model_spark.session import get_spark
    from mapreduce_model_spark.registry import QUERIES
    from tests.oracle_harness import _rows_to_multiset

    spark = get_spark(app_name="determinism", cpus=8)
    t0 = time.time()
    fails = []
    for name in sorted(QUERIES):
        try:
            runs = []
            for _ in range(2):
                df = QUERIES[name](spark, sf_dir)
                cols = df.columns
                runs.append(_rows_to_multiset(cols, df.collect()))
            if runs[0] != runs[1]:
                # symmetric difference: keys whose counts differ in EITHER
                # direction, so rows present only in run B are reported too
                diff = {
                    k
                    for k in runs[0].keys() | runs[1].keys()
                    if runs[0].get(k) != runs[1].get(k)
                }
                fails.append((name, f"diverged: {len(diff)} differing keys"))
                print(f"FAIL {name}: rerun diverged ({len(diff)} keys)")
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            fails.append((name, repr(ex)))
            print(f"FAIL {name}: {ex!r}")
    secs = int(time.time() - t0)
    print(
        f"DETERMINISTIC checked={len(QUERIES)} fails={len(fails)} secs={secs}"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
