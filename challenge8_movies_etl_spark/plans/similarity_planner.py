"""Python-side physical planner for similarity top-k (SURVEY.md §4.2).

No custom Catalyst rule is needed for correctness; this chooses between
the two physical strategies the engine implements, by estimated
cardinality — the REPOSE-style candidate-pruning decision (PAPERS.md,
ICDE'21) expressed as a planner function:

- corpus small OR single probe → broadcast brute force (exact; one
  scan, no shuffle)
- corpus large AND approximate allowed → IVF cells (scan ~n_probe/
  n_cells of the corpus)

The thresholds are config, not magic: at 100 TB the exact path is the
wrong default the moment the probe side stops being one row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators.similarity import brute_force_topk, ivf_topk


@dataclass
class SimilarityPlan:
    strategy: str        # 'broadcast_exact' | 'ivf_approx'
    est_rows_scanned: int


def plan_topk(n_vectors: int, allow_approx: bool,
              exact_scan_budget: int = 10_000_000) -> SimilarityPlan:
    if not allow_approx or n_vectors <= exact_scan_budget:
        return SimilarityPlan("broadcast_exact", n_vectors)
    return SimilarityPlan("ivf_approx", n_vectors * 3 // 8)


def execute_topk(embeddings: DataFrame, probe_id: int, k: int = 10,
                 allow_approx: bool = False,
                 n_vectors: int | None = None) -> DataFrame:
    n = n_vectors if n_vectors is not None else embeddings.count()
    plan = plan_topk(n, allow_approx)
    if plan.strategy == "broadcast_exact":
        return brute_force_topk(embeddings, probe_id, k)
    return ivf_topk(embeddings, probe_id, k)
