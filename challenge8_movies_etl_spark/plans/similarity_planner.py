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
                  allow_approx: bool = False,
                  exact_pair_budget: int = 2_000_000) -> KnnJoinPlan:
    """Physical-strategy choice for the all-pairs kNN join (VERDICT
    r7 item 6): the exact per-label pair join costs ~N²/(2·|labels|)
    candidate pairs — fine while that fits the budget (every
    driver-checked fixture scale does: sf0.1 is 2 000 vectors / 10
    labels → 200 k pairs). Past the budget, IF the caller allows
    approximation, the plan switches to IVF-cell blocking at
    constant ~250-vector cell occupancy (total candidate work LINEAR
    in N; measured 13.4 s / 2.8× slope at sf1.0 vs 145 s exact).

    allow_approx defaults to FALSE after round 8's recall
    measurement (SCALE.md): on the isotropic-uniform fixture the
    sized blocked join recovers only 0.397 of the exact edges at
    sf1.0 — cell membership on clusterless 64-d data is essentially
    coverage-probability, so no sublinear candidate scheme keeps
    0.9 recall. A query whose oracle states EXACT kNN must not
    silently return that; q_knn_join therefore stays exact at every
    scale and q_knn_join_blocked is the recall-pinned opt-in. On
    clustered production embeddings (where IVF cells align with real
    clusters) allow_approx=True re-enables the linear plan —
    re-measure the recall pin on the target corpus first."""
    est = n_vectors * n_vectors // (2 * max(n_labels, 1))
    if not allow_approx or est <= exact_pair_budget:
        return KnnJoinPlan("exact_pairs", est, 0)
    # constant per-cell occupancy (~250 vectors/cell): per-bucket pair
    # work stays constant so total candidate work is LINEAR in N;
    # never below the 8 cells the recall pin was measured at (√N at
    # small N starves (cell,label) buckets — recall 0.92 → 0.58)
    return KnnJoinPlan("ivf_blocked", est, max(8, n_vectors // 250))
