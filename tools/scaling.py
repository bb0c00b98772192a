"""Cross-scale scaling curves: run a query subset at TWO scale factors
(same generator, true 10x row growth) and report the time ratios — the
cheapest empirical check of the 100 TB design claims (r6 verdict #2).

    python tools/scaling.py SF_A_DIR SF_B_DIR [q1,q2,... | -] [repeat]

With "-" (default) the subset is the standing scale-critical list below.
Each side runs in its OWN bench.py subprocess (clean JVM, no cache
residue from the other scale; BENCH_REPEAT warmup/median semantics), so a
ratio is median-after-warmup vs median-after-warmup on an otherwise idle
machine — the PLANS.md protocol.

Interpretation: the machine is fixed (local[32]), so a 10x data grow may
cost up to ~10x time for scan-bound work; SUPERLINEAR growth (ratio
beyond 10x by more than the ~1.3x drift envelope, i.e. >13x) is the
red flag for a quadratic tail or a global funnel. Sub-10x ratios mean
fixed overheads (plan compile, job launch) still dominate at the small
end — evidence the query is floor-bound, not data-bound. Flat ratios on
queries whose INPUT tables don't grow 10x (the generator holds events at
1M rows past sf0.3, and the query-vector counts are constants) are
expected and annotated, not alarming.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

# The standing scale-critical list: everything expensive at sf0.1 plus the
# operators whose 100 TB story a quadratic tail would break.
#
# DELIBERATELY EXCLUDED (registered face pins a constant for oracle
# parity that the operator API scales and the fixed-constant form cannot):
# - semantic_dedup pins k=8 clusters, so at 500k vectors its
#   within-cluster pair join is Sigma|cluster|^2 ~ 3e10 pairs; the scale
#   configuration is the k-proportional-to-sqrt(N) twin
#   semantic_dedup_scaled, which IS in the list.
# (Round 8: embedding_near_dup / _multiprobe / graph_pagerank /
# similarity_ann_ivf left this exclusion list — their faces now derive
# bits / stride from count(*) and are expected to scale.)
DEFAULT_QUERIES = ",".join(
    [
        # PQ / ANN family (training loops, probed search, recall audits)
        "similarity_ann_ivfpq", "ivfpq_recall_report", "similarity_pq_adc",
        "embedding_pq", "similarity_ann_ivf", "similarity_topk",
        "ann_recall_report", "kmeans_embeddings",
        "embedding_near_dup", "embedding_near_dup_multiprobe",
        "semantic_dedup_scaled",
        # dedup / LSH family (bucketed pair joins, recall audits, clusters)
        "lsh_recall_report", "simhash_recall_report", "dedup_near_minhash",
        "dedup_near_oph", "dedup_ngram_jaccard", "dedup_containment",
        "dedup_cross_source", "dedup_clusters", "dedup_cluster_quality",
        "dedup_exact", "split_leakage", "corpus_build_pipeline_near",
        # text / training loops
        "quality_classifier", "bpe_train", "bpe_encode",
        "tokenizer_fertility", "lm_perplexity", "bigram_pmi", "basket_lift",
        # graph fixpoints
        "graph_pagerank", "graph_bfs_depths",
        # Python-worker paths (Arrow dispatch floor vs data growth)
        "group_zscore", "cogroup_reconcile",
        # relational / shuffle shapes
        "join_salted", "recursive_hierarchy", "groupby_agg", "join_multi",
        "tpch_q8_market_share", "tpch_q21_waiting_supplier",
        "sequence_packing_global", "source_token_caps",
        "dau_wau_stickiness", "inverted_index",
    ]
)


def bench_once(sf_dir: str, queries: str, repeat: int) -> dict[str, float]:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_QUERIES=queries,
        BENCH_REPEAT=str(repeat),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py produced no JSON at {sf_dir}:\n{out.stderr[-2000:]}"
        )
    return json.loads(lines[-1])["queries"]


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_a, sf_b = sys.argv[1], sys.argv[2]
    queries = DEFAULT_QUERIES if len(sys.argv) < 4 or sys.argv[3] == "-" else sys.argv[3]
    repeat = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    def sf_of(d: str) -> str:
        m = re.search(r"sf([0-9.]+)", d)
        return m.group(1).rstrip(".") if m else d

    a = bench_once(sf_a, queries, repeat)
    b = bench_once(sf_b, queries, repeat)
    rows = []
    for name in queries.split(","):
        ta, tb = a.get(name), b.get(name)
        if ta is None or tb is None or ta <= 0 or tb <= 0:
            rows.append((name, ta, tb, None))
        else:
            rows.append((name, ta, tb, tb / ta))
    rows.sort(key=lambda r: -(r[3] or 0))
    la, lb = sf_of(sf_a), sf_of(sf_b)
    print(f"| query | sf{la} s | sf{lb} s | ratio |")
    print("|---|---|---|---|")
    for name, ta, tb, r in rows:
        rr = f"{r:.2f}x" if r else "FAIL"
        print(f"| {name} | {ta} | {tb} | {rr} |")
    flagged = [n for n, _, _, r in rows if r and r > 13.0]
    print(
        f"\nSCALINGDONE checked={len(rows)} superlinear(>13x)={len(flagged)}"
        + (f" flagged={','.join(flagged)}" if flagged else "")
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
