"""Compare two bench records query-by-query.

    python tools/compare_bench.py OLD NEW [threshold]

Accepts either a BENCH_FULL.json sidecar ({"queries": {...}}) or a
driver-recorded BENCH_r{N}.json ({"tail": "...last 2000 stdout bytes..."} —
the tail is regex-parsed, so truncated records still yield their surviving
queries). Prints the common-query geomean ratio (new/old) and every query
past the threshold (default 1.3x) in either direction, with the raw
per-run samples when the sidecar carries them.

Interpreting ratios in THIS sandbox — read "PLANS.md § Benchmark
measurement protocol" FIRST: the recorded stat changed across rounds
(r1-r3 min-of-runs, r4 median-with-warmup, r5+ median-after-warmup), the
environment drifts ~1.3x between driver rounds with bit-identical code,
and iterative queries (pagerank, dedup_clusters, kmeans) swing 2-3x across
fresh processes. Only an in-process A/B re-run past 1.3x is a regression.
"""

from __future__ import annotations

import json
import math
import re
import sys


# Payload/summary keys that the tail regex would otherwise mistake for
# query timings (the bench line carries them alongside the queries dict).
_NON_QUERY_KEYS = frozenset(
    {
        "sf",
        "value",
        "repeat",
        "total_s",
        "n_ok",
        "n_failed",
        "n",
        "rc",
        "cpus",
        "geomean_vs_prev",
    }
)


def load(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}
    tail = d.get("tail", "")
    out = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r'"([a-z0-9_]+)": (-?[0-9.]+)', tail)
    )
    return {k: v for k, v in out.items() if k not in _NON_QUERY_KEYS and v > 0}


def load_summary(path: str) -> dict | None:
    """Pull the trailing "summary" object (bench.py emits it LAST so it
    survives the driver's ~2000-byte tail truncation)."""
    d = json.load(open(path))
    if isinstance(d.get("summary"), dict):
        return d["summary"]
    m = re.search(r'"summary": (\{.*\})\}\s*$', d.get("tail", ""))
    if m:
        try:
            return json.loads(m.group(1))
        except json.JSONDecodeError:
            return None
    return None


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    old, new = load(argv[0]), load(argv[1])
    thresh = float(argv[2]) if len(argv) > 2 else 1.3
    for label, path in (("old", argv[0]), ("new", argv[1])):
        s = load_summary(path)
        if s:
            print(
                f"{label} summary: total={s.get('total_s')}s "
                f"n_ok={s.get('n_ok')} n_failed={s.get('n_failed')} "
                f"failed={s.get('failed')}"
            )
    common = sorted(n for n in new if n in old and old[n] > 0 and new[n] > 0)
    if not common:
        print("no common queries")
        return 1
    g = math.exp(sum(math.log(new[n] / old[n]) for n in common) / len(common))
    print(f"common queries: {len(common)}   geomean new/old: {g:.3f}x")
    print(f"only-old: {len(set(old) - set(new))}   only-new: {len(set(new) - set(old))}")
    runs = {}
    try:
        runs = json.load(open(argv[1])).get("runs", {})
    except Exception:  # noqa: BLE001 — samples are optional decoration
        pass
    flagged = [(new[n] / old[n], n) for n in common if not (1 / thresh) <= new[n] / old[n] <= thresh]
    for r, n in sorted(flagged, reverse=True):
        extra = f"  runs={runs[n]}" if n in runs else ""
        print(f"  {r:5.2f}x  {n}: {old[n]:.3f}s -> {new[n]:.3f}s{extra}")
    if not flagged:
        print(f"  no query outside [{1/thresh:.2f}x, {thresh}x]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
