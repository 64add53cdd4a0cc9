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


@dataclass
class KnnJoinPlan:
    strategy: str        # 'exact_pairs' | 'ivf_blocked'
    est_pairs: int
    n_cells: int         # 0 for the exact strategy


def plan_knn_join(n_vectors: int, n_labels: int,
                  exact_pair_budget: int = 2_000_000) -> KnnJoinPlan:
    """Physical-strategy choice for the all-pairs kNN join (VERDICT
    r7 item 6): the exact per-label pair join costs ~N²/(2·|labels|)
    candidate pairs — fine while that fits the budget (every
    driver-checked fixture scale does: sf0.1 is 2 000 vectors / 10
    labels → 200 k pairs), quadratic death beyond it (the sf1.0
    fixture is 20 k vectors → 20 M pairs, measured 170 s after the
    two-phase rescue, SCALE_RUN_r7). Past the budget the plan
    switches to IVF-cell blocking with n_cells ~ √N (each cell holds
    ~√N vectors, total candidate work ~N^1.5·n_assign/|labels|) —
    the recall-pinned approximation tests hold at ≥0.92."""
    est = n_vectors * n_vectors // (2 * max(n_labels, 1))
    if est <= exact_pair_budget:
        return KnnJoinPlan("exact_pairs", est, 0)
    return KnnJoinPlan("ivf_blocked", est,
                       max(8, int(n_vectors ** 0.5)))
