"""Physical-plan quality gates (SURVEY.md §4 / the 100 TB posture),
as executable regression tests: filters must reach the parquet scan,
projections must prune the read schema, small dims must broadcast,
top-k must compile to TakeOrderedAndProject, and aggregations must
partial-aggregate before their exchange. A correctness-green query
with a degraded plan fails HERE."""

from __future__ import annotations

import re

from challenge8_movies_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMOKE

load_all()


def n_shuffles(p: str) -> int:
    """Count shuffle exchanges in a formatted plan (each node appears
    once in the tree and once as a '(n) Exchange' detail header; count
    the headers, exclude broadcasts)."""
    return len(re.findall(r"^\(\d+\) Exchange$", p, re.M))


def plan(spark, qid: str) -> str:
    df = QUERIES[qid](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def test_scan_project_prunes_columns(spark):
    p = plan(spark, "q_scan_project")
    # only the 4 needed of 11 lineitem columns may be read
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," \
           "l_extendedprice:double,l_discount:double>" in p, p


def test_filter_pushdown_reaches_scan(spark):
    p = plan(spark, "q_filter_pred")
    assert "PushedFilters: [" in p
    assert "IsNotNull(o_totalprice)" in p or "GreaterThanOrEqual" in p, p


def test_broadcast_join_is_broadcast(spark):
    p = plan(spark, "q_join_broadcast")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_topk_is_take_ordered(spark):
    p = plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in p, p
    # no global sort node — the O(n log n) shuffle-sort plan is wrong
    assert "Exchange rangepartitioning" not in p, p


def test_agg_has_partial_phase(spark):
    p = plan(spark, "q_agg_hash")
    assert "partial_" in p, p          # map-side combine present
    assert n_shuffles(p) == 1, p       # exactly the one agg shuffle


def test_semi_join_no_right_payload(spark):
    p = plan(spark, "q_join_semi")
    assert "LeftSemi" in p, p


def test_flagship_single_wide_exchange(spark):
    """The flagship must keep exactly two shuffle exchanges: the dedup
    window (wiki side) and the ratings aggregation — the
    self-join-eliminated plan. A third means the orders self-join
    regressed."""
    p = plan(spark, "q_flagship_etl")
    assert n_shuffles(p) == 2, p


def test_events_scan_prunes_for_pivot(spark):
    p = plan(spark, "q_pivot")
    assert "ReadSchema: struct<user_id:bigint,event_type:string>" in p, p


def test_simhash_candidates_equi_join(spark):
    """SimHash neighbor generation must be a band equi-join, never an
    all-pairs hamming-predicate nested loop (the 100 TB scale gate)."""
    p = plan(spark, "q_dedup_simhash")
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_minhash_candidates_equi_join(spark):
    """MinHash-LSH candidate generation: band-bucket equi-join only."""
    p = plan(spark, "q_dedup_minhash")
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_similarity_ann_broadcasts_probe(spark):
    """IVF probe side must broadcast — one scan of the corpus, no
    corpus-sized shuffle for a 1-row probe."""
    p = plan(spark, "q_similarity_ann")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_blocked_knn_equi_join(spark):
    """The blocked kNN join's candidate generation must be an equi-join
    on (cell, label) — no nested-loop/cartesian pair enumeration."""
    p = plan(spark, "q_knn_join_blocked")
    assert "CartesianProduct" not in p, p


def test_vocab_topk_take_ordered(spark):
    """Vocab top-k: map-side partial counts + TakeOrderedAndProject —
    never a global sort of the full vocabulary."""
    p = plan(spark, "q_vocab_topk")
    assert "TakeOrderedAndProject" in p, p
    assert "partial_" in p, p


def test_stratified_sample_no_shuffle(spark):
    """Hash-bucket sampling is a pure filter — zero exchanges."""
    p = plan(spark, "q_sample_stratified")
    assert n_shuffles(p) == 0, p


def test_minmax_scale_broadcasts_stats(spark):
    p = plan(spark, "q_minmax_scale")
    assert "BroadcastHashJoin" in p
    # only the stats aggregation may shuffle; the fact scan stays in place
    assert n_shuffles(p) == 1, p


def test_anomaly_stats_broadcast_back(spark):
    p = plan(spark, "q_anomaly_zscore")
    assert "BroadcastHashJoin" in p, p


def test_tfidf_vocab_broadcasts(spark):
    p = plan(spark, "q_tfidf")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_sessionize_single_user_exchange(spark):
    # both windows and the final groupBy share the user_id partitioning:
    # one data shuffle total
    p = plan(spark, "q_sessionize")
    assert n_shuffles(p) == 1, p


def test_gapfill_scans_events_once(spark):
    # spine + types derive from the persisted hourly aggregate, so the
    # raw events table appears exactly once in the physical plan
    p = plan(spark, "q_gapfill_locf")
    assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 1, p


def test_ewma_single_user_exchange(spark):
    # rn window + K lag windows share (user_id) partitioning and the
    # (ts, event_id) sort: one data shuffle, one sort, K folded lags
    p = plan(spark, "q_ewma_smooth")
    assert n_shuffles(p) == 1, p


def test_decontaminate_benchmark_broadcasts(spark):
    # the benchmark gram set must broadcast — the training-corpus side
    # of the membership probe never shuffles its grams
    p = plan(spark, "q_decontaminate")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime row-level bloom pruning — the 100 TB shuffle-join saver:
    with a selective dim filter, Spark builds a bloom filter over the
    dim keys and applies might_contain() to the fact side BEFORE its
    exchange, so pruned rows never shuffle. Verified by forcing the
    injection thresholds down at fixture scale (the 100 TB defaults
    trigger on real sizes)."""
    saved = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    from pyspark.sql import functions as F
    for k in saved:
        saved[k] = spark.conf.get(k)
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from challenge8_movies_etl_spark.sources.fixtures import load_table
        dim = (load_table(spark, SF_SMOKE, "orders")
               .filter("o_orderpriority = '1-URGENT'"))
        fact = load_table(spark, SF_SMOKE, "lineitem")
        j = (fact.join(dim, fact.l_orderkey == dim.o_orderkey)
             .groupBy("o_orderpriority").count())
        p = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert "might_contain" in p, p
        assert "bloom_filter_agg" in p, p
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bm25_broadcast_stats_and_topk(spark):
    """BM25: corpus stats are a 1-row broadcast (no corpus-sized
    shuffle), ranking compiles to TakeOrderedAndProject, and per-doc
    term frequencies stay scan-local (no explode-shuffle)."""
    p = plan(spark, "q_bm25")
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    # the only exchange allowed is the 1-row stats aggregation
    assert n_shuffles(p) <= 1, p


def test_chunk_sliding_zero_shuffle(spark):
    """Sliding-window chunking is a pure per-row generator."""
    p = plan(spark, "q_chunk_sliding")
    assert n_shuffles(p) == 0, p


def test_market_basket_broadcasts_item_dims(spark):
    """Pair counts join item frequencies broadcast-side; no cartesian
    anywhere (the self-join is keyed on the basket id)."""
    p = plan(spark, "q_market_basket")
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_outlier_iqr_broadcasts_fences(spark):
    """Quartile fences broadcast back onto the fact scan — the raw
    events relation is never shuffled (one keyed agg exchange only)."""
    p = plan(spark, "q_outlier_iqr")
    assert "BroadcastHashJoin" in p, p
    assert n_shuffles(p) <= 1, p


def test_covariance_broadcasts_size_relations(spark):
    """q_embed_covariance: the 64-row coordinate-sum relations and the
    1-row count must broadcast — a shuffle join against the 2080-row
    pair relation would be the wrong plan at any scale."""
    p = plan(spark, "q_embed_covariance")
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "partial_" in p, p  # decimal sums combine map-side


def test_minhash_reagg_single_agg_no_row_blowup(spark):
    """q_minhash_reagg: the 16 signature components must come from ONE
    map-side-combined groupBy over the distinct gram relation (computed
    once — the persisted sketch relation feeds both self-join sides),
    not an exploded per-component relation (16x rows) or a window."""
    p = plan(spark, "q_minhash_reagg")
    assert "Window" not in p, p
    # both join sides read the cached sketch, not a re-shingled corpus
    assert p.count("InMemoryTableScan") >= 2, p
    assert "partial_min" in p, p


def test_keep_best_is_single_groupby_argmax(spark):
    """q_dedup_keep_best: struct-max argmax must stay one hash
    aggregate — a window row_number plan (sort per group) is the shape
    the operator deliberately avoids."""
    p = plan(spark, "q_dedup_keep_best")
    assert "Window" not in p, p
    assert "partial_max" in p, p


def test_sql_lateral_decorrelates_to_window(spark):
    """q_sql_lateral: Catalyst must decorrelate the LATERAL LIMIT 1
    subquery into a set-based ranked plan — per-row subquery execution
    or a cartesian product would be wrong."""
    p = plan(spark, "q_sql_lateral")
    assert "Window" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_group_split_no_join(spark):
    """q_split_group_aware: the group hash is a per-row expression —
    any join in this plan means someone materialized a group table."""
    p = plan(spark, "q_split_group_aware")
    assert "Join" not in p, p


def test_topk_per_group_uses_window_group_limit(spark):
    """q_topk_per_group: the rank<=k filter must push a per-partition
    group limit below the exchange (WindowGroupLimit) — shuffling the
    whole fact table to rank it is the plan this query exists to
    avoid."""
    p = plan(spark, "q_topk_per_group")
    assert "WindowGroupLimit" in p, p


def test_threshold_curve_no_expand_no_fanout(spark):
    """q_dedup_threshold_curve must keep its bucket-cumulative shape:
    no Expand (the 5x countDistinct row multiplication) and no
    threshold-join fan-out of the pair relation (the taus spine joins
    6-row bucket aggregates, never pairs)."""
    p = plan(spark, "q_dedup_threshold_curve")
    assert "Expand" not in p, p
    # the cosine pair join appears exactly twice (pair-count branch +
    # per-vb branch off the persisted relation), not once per tau
    assert p.count("SortMergeJoin") + p.count("BroadcastHashJoin") < 10, p


def test_feature_hashing_single_combined_agg(spark):
    """Hashing-trick census: one map-side-combined exchange on the
    1024-bucket domain, distinct counts folded into the same agg."""
    p = plan(spark, "q_feature_hashing")
    assert "partial_" in p, p
    assert "TakeOrderedAndProject" in p, p  # top-30 never global-sorts


def test_bootstrap_replicas_broadcast_not_shuffled(spark):
    """The 20-replica fan-out must be a broadcast nested loop against
    the 20-row range, and the replica aggregate map-side-combines —
    the fact table is scanned, never shuffled at pair width."""
    p = plan(spark, "q_bootstrap_ci")
    assert "BroadcastNestedLoopJoin" in p, p
    assert "partial_count" in p, p


def test_zonemap_natural_chunks_stay_mapside(spark):
    """Both layout branches partial-aggregate; the only global sort is
    the declared clustered-layout rank."""
    p = plan(spark, "q_zonemap_prune")
    assert "partial_" in p, p
    assert p.count("Exchange rangepartitioning") <= 1, p


def test_wordpiece_udf_is_arrow_batched(spark):
    """The tokenizer must run as an Arrow-batched pandas UDF
    (ArrowEvalPython), never row-at-a-time BatchEvalPython."""
    p = plan(spark, "q_wordpiece_encode")
    assert "ArrowEvalPython" in p, p
    assert "BatchEvalPython" not in p, p


def test_embed_lsh_no_cartesian_and_bounded_joins(spark):
    """LSH candidates come from band-bucket equi-joins — never a
    cartesian pair product; verification joins are keyed."""
    p = plan(spark, "q_embed_lsh")
    assert "CartesianProduct" not in p, p


def test_temporal_join_broadcasts_version_history(spark):
    """The SCD2 version relation is dims x 3 and must broadcast; the
    per-event argmax is a window, not a second join."""
    p = plan(spark, "q_temporal_join")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_audience_overlap_partial_aggregates(spark):
    """Distinct (user, type) projection and the intersection count
    both partial-aggregate before their exchanges."""
    p = plan(spark, "q_audience_overlap")
    assert "partial_" in p, p
    assert "CartesianProduct" not in p, p


def test_similarity_batch_broadcasts_probes(spark):
    """The probe matrix rides a broadcast; the corpus is scanned
    exactly once for all probes."""
    p = plan(spark, "q_similarity_batch")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    # one parquet scan of embeddings per side-role (corpus + probes
    # derive from the same cached fixture scan)
    assert "CartesianProduct" not in p, p


def test_weighted_percentile_single_sort_exchange(spark):
    """Both windows and the final agg share the per-flag partitioning:
    at most one shuffle exchange in the whole plan."""
    p = plan(spark, "q_weighted_percentile")
    assert n_shuffles(p) <= 1, p


def test_flagship_sql_text_equals_dataframe_twin(spark):
    """The single-SQL-text flagship (shipped; ~0.3 s/build cheaper to
    plan) and the Column-API construction must return identical rows —
    the guard that the round-5 planning-constant rewrite changed no
    semantics."""
    from challenge8_movies_etl_spark.etl import q_flagship_etl_df
    from challenge8_movies_etl_spark.registry import QUERIES

    from tests.conftest import SF_SMOKE

    a = QUERIES["q_flagship_etl"](spark, SF_SMOKE)
    b = q_flagship_etl_df(spark, SF_SMOKE)
    assert a.columns == b.columns
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_pq_ann_is_takeordered(spark):
    """PQ serving scan must rank via TakeOrderedAndProject (per-
    partition top-k + k-row driver merge), never a global sort."""
    p = plan(spark, "q_pq_ann")
    assert "TakeOrderedAndProject" in p, p


def test_color_decode_zero_shuffle(spark):
    """The color decode pipeline is Arrow-streamed end to end: no
    exchange anywhere (decode parallelism == partition count)."""
    p = plan(spark, "q_multimodal_decode_color")
    assert n_shuffles(p) == 0, p


def test_audio_decode_zero_shuffle(spark):
    """WAV decode is Arrow-streamed end to end: no exchange anywhere
    (decode parallelism == partition count)."""
    p = plan(spark, "q_audio_decode")
    assert n_shuffles(p) == 0, p


def test_progressive_decode_zero_shuffle(spark):
    """Progressive JPEG decode keeps the same zero-shuffle shape as
    the baseline/color decode rows."""
    p = plan(spark, "q_multimodal_decode_progressive")
    assert n_shuffles(p) == 0, p


def test_video_framestats_zero_shuffle(spark):
    """Y4M decode + frame fan-out is Arrow-streamed end to end."""
    p = plan(spark, "q_video_framestats")
    assert n_shuffles(p) == 0, p


def test_spatial_knn_broadcasts_probes_and_takeordered(spark):
    """The probe side must broadcast (never shuffle the corpus
    against 8 points) and no cartesian product may appear — the
    crossJoin is the broadcast-probe idiom."""
    p = plan(spark, "q_spatial_knn")
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_decision_stump_no_cartesian_single_wide_shuffle_chain(spark):
    """Split search is histogram + windows: no cartesian
    candidate x rows blowup, and the plan stays fully JVM-side."""
    p = plan(spark, "q_decision_stump")
    assert "CartesianProduct" not in p, p
    assert "PythonUDF" not in p and "ArrowEval" not in p, p


def test_inverted_index_single_term_shuffle(spark):
    """Postings assembly shuffles on term once (partial-agg counts),
    plus the window rank — never a doc x term cartesian."""
    p = plan(spark, "q_inverted_index")
    assert "CartesianProduct" not in p, p
    assert n_shuffles(p) <= 3, p


def test_random_projection_broadcasts_sign_matrix(spark):
    """The 512-cell JL sign matrix must broadcast over the exploded
    component stream."""
    p = plan(spark, "q_embed_random_projection")
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_plan_knn_join_switchover():
    """plan_knn_join (round 8): EXACT at every scale unless the
    caller opts into approximation (the r8 recall measurement —
    0.397 at sf1.0 on the isotropic fixture — made exactness the
    default); with allow_approx the blocked plan sizes cells at
    constant ~250-vector occupancy (linear candidate work)."""
    from challenge8_movies_etl_spark.plans.similarity_planner import (
        plan_knn_join)
    # fixture scales: 500 / 500 / 2000 vectors, 10 labels
    for n in (500, 2000):
        p = plan_knn_join(n, 10)
        assert p.strategy == "exact_pairs"
        assert p.est_pairs == n * n // 20
    # exact stays the default even past the pair budget
    assert plan_knn_join(20_000, 10).strategy == "exact_pairs"
    big = plan_knn_join(20_000, 10, allow_approx=True)
    assert big.strategy == "ivf_blocked"
    assert big.n_cells == 80            # ~250 vectors/cell occupancy
    assert plan_knn_join(2_000_000, 10,
                         allow_approx=True).n_cells == 8000  # linear
    # within budget, allow_approx still resolves exact
    assert plan_knn_join(2_000, 10,
                         allow_approx=True).strategy == "exact_pairs"
    assert plan_knn_join(0, 0).strategy == "exact_pairs"


def test_geoip_longest_prefix_partial_aggregates(spark):
    """VERDICT r8 item 7: the per-event argmax must partial-aggregate
    (partial_max_by) BELOW the exchange instead of shuffling the full
    hit set through a row_number window."""
    p = plan(spark, "q_geoip_lookup")
    assert "partial_max_by" in p, p
    assert "row_number" not in p, p


def test_time_travel_tombstones_not_force_broadcast(spark):
    """The tombstone join must NOT carry a user broadcast hint: the DV
    set is row-count-proportional, so a forced broadcast risks the
    8 GB hard limit / driver OOM on a 100 TB table (ADVICE r9). AQE is
    free to pick broadcast at fixture scale; what the plan pins is the
    absence of the static hint (no join side is hint-marked) while the
    4-row snapshot axis stays an explicit broadcast."""
    from challenge8_movies_etl_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE
    df = QUERIES["q_time_travel_read"](spark, SF_SMOKE)
    logical = df._jdf.queryExecution().analyzed().toString()
    # exactly one ResolvedHint: the snapshot axis; none on first_del
    import re as _re
    hints = _re.findall(r"ResolvedHint.*", logical)
    assert len(hints) == 1, logical
    assert "snapshot_id" in df.columns
    p = plan(spark, "q_time_travel_read")
    assert "Join" in p, p


def test_components_star_contraction_partial_aggregates(spark):
    """Large-star/small-star rounds are groupBy-min contractions —
    the final labels aggregate must carry a partial phase (map-side
    combine), the property that keeps each round O(|E|) at scale."""
    p = plan(spark, "q_graph_components")
    assert "partial_min" in p or "partial_count" in p, p


def test_merge_upsert_single_keyed_join(spark):
    """MERGE materializes as ONE keyed shuffle join — never a nested
    loop or cartesian fan-out (the 100 TB contract in the docstring)."""
    p = plan(spark, "q_merge_upsert")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "FullOuter" in p, p


def test_optimize_binpack_manifest_sized_window(spark):
    """Bin-packing plans over the per-file manifest aggregate; the
    window runs AFTER the file rollup (rows = files, never data rows)
    and the whole plan needs only a handful of exchanges."""
    p = plan(spark, "q_optimize_binpack")
    assert "Window" in p, p
    assert n_shuffles(p) <= 5, p


def test_schema_evolution_read_prunes_and_single_rollup(spark):
    """Field-id mapping is pure projection: the scan reads only the
    two source columns and the audit is one map-side-combined rollup
    (one shuffle)."""
    p = plan(spark, "q_schema_evolution_read")
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" \
        in p, p
    assert "partial_count" in p or "partial_sum" in p, p
    assert n_shuffles(p) <= 2, p
