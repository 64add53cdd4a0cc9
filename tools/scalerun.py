"""Measure one decade of scale: time the quadratic-risk query set at
sf0.1 (driver fixtures) and sf1.0 (tools/scalegen.py output) and
report the scaling slope t(sf1)/t(sf0.1) against the 10x data growth.

A ~linear operator lands near 10x (often well under on local[32],
where sf0.1 underutilizes the cores); anything super-linear by a wide
margin contradicts its docstring's 100 TB claim and needs a plan fix
or a documented valve (VERDICT r6 item 5).

Usage:
  python tools/scalegen.py --sf 1.0            # once, ~40 s
  python tools/scalerun.py [--reps 2] [--json SCALE_RUN.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES_UNDER_TEST = [
    "q_dedup_containment",   # inverted-index co-count, max_df valve
    "q_dedup_substring",     # k-gram + interval union
    "q_dedup_minhash",       # LSH banding
    "q_coverage_select",     # greedy submodular, driver-held vocab
    "q_dbscan",              # label-blocked eps-graph
    "q_graph_pagerank",      # fixed-iteration O(|E|)/round
    "q_graph_components",    # large-star/small-star, O(log n) rounds
    "q_corpus_pipeline",     # end-to-end curation funnel
    "q_topic_nmf",           # fixed-iteration algebra
    "q_decision_stump",      # cumulative-window Gini per feature
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/scale_sf1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--json", default=None)
    ap.add_argument("--queries", default=None,
                    help="comma list; default = the quadratic-risk set")
    args = ap.parse_args()

    from challenge8_movies_etl_spark.registry import QUERIES, load_all
    from challenge8_movies_etl_spark.session import get_spark

    load_all()
    qids = (args.queries.split(",") if args.queries
            else QUERIES_UNDER_TEST)
    spark = get_spark("scalerun")
    QUERIES["q_agg_hash"](spark, args.small).count()  # warmup

    results: dict[str, dict] = {}
    for qid in qids:
        row: dict[str, float] = {}
        for tag, sf_dir in (("small", args.small), ("big", args.big)):
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                n = QUERIES[qid](spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = n
        row["slope"] = round(row["big"] / row["small"], 1)
        results[qid] = row
        print(f"{qid}: sf0.1 {row['small']}s  sf1.0 {row['big']}s  "
              f"slope {row['slope']}x  (rows {row['small_rows']} -> "
              f"{row['big_rows']})", flush=True)

    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1) + "\n")


if __name__ == "__main__":
    main()
