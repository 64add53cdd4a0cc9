"""Benchmark runner — prints ONE JSON line for the driver.

Methodology matches BASELINE.md: warm JVM (session start + one warmup
action excluded), best of 3 repetitions of a .count() action per query,
sf from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
local[$SPARK_GRAFT_CPUS].

Headline set = the BASELINE.md table (one per operator family) plus the
heavier LLM-extension operators, so regressions in any family move the
headline number.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q_agg_hash",
    "q_join_multi_5way",
    "q_window_rank",
    "q_pivot",
    "q_text_sentiment",
    "q_similarity_topk",
    "q_session_window",
    "q_flagship_etl",
]
EXTRA = [
    "q_scan_project",
    "q_dedup_tokenset",
    "q_stream_tumbling",
    "q_join_asof",
    # round-2 second-wave families (no BASELINE rows; 2x gate reads
    # against the closest-shape baseline query per BASELINE.md)
    "q_tfidf",
    "q_gapfill_locf",
    "q_graph_pagerank",
    # round-2 fourth-wave curation/ops families
    "q_quality_repetition",
    "q_dedup_containment",
    "q_interval_overlap",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from challenge8_movies_etl_spark.registry import QUERIES, load_all
    from challenge8_movies_etl_spark.session import get_spark

    load_all()
    spark = get_spark("bench")
    # warmup: exercise scan + shuffle + python-worker paths once
    QUERIES["q_agg_hash"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for qid in HEADLINE + EXTRA:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[qid](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[qid] = round(best, 3)

    total = round(sum(timings[q] for q in HEADLINE), 3)
    print(json.dumps({
        "metric": "headline_total_best_of_3",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
