"""Interleaved A/B bench of two git refs — the standing end-of-round
regression protocol (r9 verdict #1a; the manual r9 experiment
AB_r9_r7HEAD_vs_r8HEAD.json is the template this automates).

    python tools/ab_bench.py REF_A REF_B [out.json]

Why interleaved: this sandbox drifts ~1.3x between driver rounds on
bit-identical code, so a cross-round per-query ratio measures the
MACHINE unless both sides run on the same box in the same hour. The
protocol: check out both refs as git worktrees, run the FULL bench suite
alternating A,B,A,B (BENCH_AB_REPS reps per side, BENCH_REPEAT per
query inside each run), take per-query medians across a side's reps,
and report the common-query geomean B/A plus the within-side rep noise
(the same-code geomean between a side's own reps — the noise floor any
cross-side ratio must beat; r9 measured it at ~1.08).

Env: BENCH_AB_REPS (default 2), BENCH_REPEAT (default 3, passed
through), SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS (passed through),
BENCH_AB_CHUNK (passed to the runs as BENCH_CHUNK; default 0 = legacy
single-session mode so the record stays comparable to BENCH_r*).
Worktrees land under /tmp/abbench_<ref> and are removed afterwards.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, text=True, **kw)


def _bench_once(tree: str, label: str, rep: int) -> dict[str, float]:
    env = dict(
        os.environ,
        BENCH_FULL_PATH=f"/tmp/abbench_full_{label}_{rep}.json",
        BENCH_CHUNK=os.environ.get("BENCH_AB_CHUNK", "0"),
    )
    print(f"ab_bench: running {label} rep {rep} in {tree}", file=sys.stderr, flush=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=tree,
    )
    line = next(
        (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
    )
    if line is None:
        raise RuntimeError(
            f"{label} rep {rep}: bench produced no JSON line\n{proc.stderr[-3000:]}"
        )
    return json.loads(line)["queries"]


def _geomean(ratios: list[float]) -> float | None:
    ratios = [r for r in ratios if r > 0]
    if not ratios:
        return None
    return round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 4)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    ref_a, ref_b = sys.argv[1], sys.argv[2]
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, f"AB_{ref_a[:10]}_vs_{ref_b[:10]}.json")
    )
    reps = int(os.environ.get("BENCH_AB_REPS", "2"))

    trees = {}
    for label, ref in (("A", ref_a), ("B", ref_b)):
        tree = f"/tmp/abbench_{label}_{ref.replace('/', '_')[:20]}"
        subprocess.run(
            ["git", "worktree", "remove", "--force", tree],
            cwd=REPO,
            capture_output=True,
        )
        _run(["git", "worktree", "add", "--detach", tree, ref], cwd=REPO)
        trees[label] = tree

    try:
        runs: dict[str, list[dict[str, float]]] = {"A": [], "B": []}
        for rep in range(reps):  # interleave: A,B,A,B,...
            for label in ("A", "B"):
                runs[label].append(_bench_once(trees[label], label, rep))

        med = {}
        for label in ("A", "B"):
            names = set().union(*(set(r) for r in runs[label]))
            med[label] = {
                n: round(
                    statistics.median(
                        [r[n] for r in runs[label] if r.get(n, -1) > 0] or [-1]
                    ),
                    4,
                )
                for n in names
            }
        common = sorted(
            n
            for n in med["A"]
            if med["A"].get(n, -1) > 0 and med["B"].get(n, -1) > 0
        )
        ratios = {n: round(med["B"][n] / med["A"][n], 4) for n in common}
        geo = _geomean(list(ratios.values()))
        # within-side noise floor: same code, rep0 vs rep1
        noise = {}
        for label in ("A", "B"):
            if len(runs[label]) >= 2:
                r0, r1 = runs[label][0], runs[label][1]
                noise[label] = _geomean(
                    [
                        max(r0[n], r1[n]) / min(r0[n], r1[n])
                        for n in r0
                        if r0.get(n, -1) > 0 and r1.get(n, -1) > 0
                    ]
                )
        worst = sorted(ratios.items(), key=lambda kv: -kv[1])
        payload = {
            "ref_a": ref_a,
            "ref_b": ref_b,
            "reps_per_side": reps,
            "order": "interleaved A,B per rep",
            "bench_repeat": int(os.environ.get("BENCH_REPEAT", "3")),
            "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            "mode": "chunked" if os.environ.get("BENCH_AB_CHUNK", "0") != "0" else "single_session",
            "n_common": len(common),
            "geomean_b_over_a": geo,
            "within_side_rep_noise_geomean": noise,
            "worst10_b_over_a": dict(worst[:10]),
            "best10_b_over_a": dict(worst[-10:]),
            "ratios": ratios,
            "medians_a": med["A"],
            "medians_b": med["B"],
        }
        with open(out_path, "w") as fh:
            json.dump(payload, fh, sort_keys=True, indent=1)
            fh.write("\n")
        print(
            json.dumps(
                {
                    "geomean_b_over_a": geo,
                    "n_common": len(common),
                    "noise": noise,
                    "out": out_path,
                }
            )
        )
        return 0
    finally:
        for tree in trees.values():
            subprocess.run(
                ["git", "worktree", "remove", "--force", tree],
                cwd=REPO,
                capture_output=True,
            )


if __name__ == "__main__":
    raise SystemExit(main())
