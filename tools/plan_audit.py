"""Registry-wide physical-plan audit for the optimization rounds.

    python tools/plan_audit.py [sf_dir] > AUDIT.txt

For every registered query, builds the DataFrame (running whatever driver-
side actions the body needs), captures `explain(formatted)`, and prints one
line per query with the node counts that matter for scale:

  Exchange / SortMergeJoin / BroadcastHashJoin / ShuffledHashJoin /
  CartesianProduct / BroadcastNestedLoopJoin / BatchEvalPython /
  ArrowEvalPython / single-partition Window / global Sort

Flags (prefix '!') anything that is a known scale smell so the audit can be
grepped: row-at-a-time Python (BatchEvalPython), cartesian products,
`Window [partitionBy=[]]`, and parquet scans with no ReadSchema pruning.
"""

from __future__ import annotations

import io
import os
import re
import sys
import time
from contextlib import redirect_stdout


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from mapreduce_model_spark import registry
    from mapreduce_model_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    for name, fn in registry.QUERIES.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"!ERROR {name}: {exc}", flush=True)
            continue
        dt = time.perf_counter() - t0
        n = {
            "ex": len(re.findall(r"\bExchange\b", text)),
            "smj": len(re.findall(r"\bSortMergeJoin\b", text)),
            "bhj": len(re.findall(r"\bBroadcastHashJoin\b", text)),
            "shj": len(re.findall(r"\bShuffledHashJoin\b", text)),
            "cart": len(re.findall(r"\bCartesianProduct\b", text)),
            "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", text)),
            "pyrow": len(re.findall(r"\bBatchEvalPython\b", text)),
            "pyarrow": len(re.findall(r"\bArrowEvalPython\b", text)),
            "mia": len(re.findall(r"\bMapInArrow\b|\bMapInPandas\b", text)),
            "fmg": len(re.findall(r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas", text)),
            "win": len(re.findall(r"\bWindow\b", text)),
            "gwin": len(re.findall(r"Window \[[^\]]*\], \[\]", text))
            + len(re.findall(r"partitionBy=\[\]", text)),
            "gsort": len(re.findall(r"\bSort \[.*\], true,", text)),
        }
        flags = []
        if n["pyrow"]:
            flags.append("PYROW")
        if n["cart"]:
            flags.append("CARTESIAN")
        if n["gwin"]:
            flags.append("GLOBALWINDOW")
        counts = " ".join(f"{k}={v}" for k, v in n.items() if v)
        flag = ("!" + ",".join(flags) + " ") if flags else ""
        print(f"{flag}{name}: build={dt:.2f}s {counts}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
