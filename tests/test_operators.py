"""Operator-library equivalence and property tests (SURVEY.md §5.4):
scale-path implementations must equal their declared/naive forms, and
algebraic invariants must hold on the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.operators.asof import asof_join_pandas
from challenge8_movies_etl_spark.operators.rangejoin import banded_range_join
from challenge8_movies_etl_spark.operators.schema_repair import (
    consolidate_columns,
    fold_to_map,
    null_ratio_profile,
    prune_mostly_null,
)
from challenge8_movies_etl_spark.registry import QUERIES, load_all
from challenge8_movies_etl_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE

load_all()


def test_banded_range_join_equals_naive(spark):
    naive = (QUERIES["q_join_range"](spark, SF_SMOKE)
             .select("eid_a", "eid_b").collect())
    e = load_table(spark, SF_SMOKE, "events")
    banded = (banded_range_join(e, "user_id", "ts", "event_id", 300)
              .select("eid_a", "eid_b").collect())
    assert sorted(map(tuple, naive)) == sorted(map(tuple, banded))
    assert len(naive) > 0


def test_asof_pandas_equals_argmax(spark):
    agg = {(r["err_id"], r["asof_click_ts"])
           for r in QUERIES["q_join_asof"](spark, SF_SMOKE).collect()}
    e = load_table(spark, SF_SMOKE, "events")
    errors = (e.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("err_id"),
                      F.col("ts").alias("err_ts")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id")))
    merged = asof_join_pandas(errors, clicks, key="user_id",
                              left_ts="err_ts", right_ts="click_ts",
                              right_cols=["click_ts", "click_id"])
    pd_pairs = {(r["err_id"], r["click_ts"])
                for r in merged.collect() if r["click_ts"] is not None}
    assert pd_pairs == agg
    assert len(pd_pairs) > 0


def test_consolidate_and_fold(spark):
    df = spark.createDataFrame(
        [("A", None, "x", "t-es", None),
         (None, "B", None, None, "t-fr"),
         (None, None, "y", None, None)],
        "director string, directed_by string, length string, "
        "title_es string, title_fr string")
    out = consolidate_columns(df, {"director": ["directed_by"]})
    assert "directed_by" not in out.columns
    assert [r["director"] for r in out.collect()] == ["A", "B", None]
    folded = fold_to_map(out, ["title_es", "title_fr"], "alt_titles")
    assert "title_es" not in folded.columns
    maps = [r["alt_titles"] for r in folded.collect()]
    assert maps[0] == {"title_es": "t-es"}
    assert maps[1] == {"title_fr": "t-fr"}
    assert maps[2] == {}


def test_null_ratio_prune(spark):
    df = spark.createDataFrame(
        [(i, None if i < 95 else "x", "keep") for i in range(100)],
        "id bigint, mostly_null string, full string")
    ratios = null_ratio_profile(df)
    assert ratios["mostly_null"] == 0.95
    assert ratios["id"] == 0.0
    pruned = prune_mostly_null(df, 0.9)
    assert set(pruned.columns) == {"id", "full"}


# --- algebraic invariants (SURVEY.md §5.4) -----------------------------

def test_union_counts(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT")
    b = o.filter(F.col("o_totalprice") > 100000)
    assert a.unionAll(b).count() == a.count() + b.count()


def test_semi_anti_partition(spark):
    c = load_table(spark, SF_SMOKE, "customer")
    o = load_table(spark, SF_SMOKE, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    semi = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
    anti = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
    assert semi.count() + anti.count() == c.count()
    assert semi.intersect(anti).count() == 0


def test_tumbling_counts_sum_to_total(spark):
    e = load_table(spark, SF_SMOKE, "events")
    windowed = QUERIES["q_stream_tumbling"](spark, SF_SMOKE)
    assert windowed.agg(F.sum("n")).collect()[0][0] == e.count()


def test_sessions_bounded_by_events(spark):
    e = load_table(spark, SF_SMOKE, "events")
    sessions = QUERIES["q_session_window"](spark, SF_SMOKE)
    n_sessions = sessions.count()
    assert 0 < n_sessions <= e.count()
    assert sessions.agg(F.sum("n_events")).collect()[0][0] == e.count()


def test_percentile_approx_error_bound(spark):
    """approx percentiles stay within the documented rank-error bound
    of the exact interpolated percentiles (accuracy=10000 over ~6k-row
    groups at smoke scale -> near-exact)."""
    from pyspark.sql import functions as F

    from challenge8_movies_etl_spark.registry import QUERIES, load_all
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    load_all()

    approx = {r["l_returnflag"]: r for r in
              QUERIES["q_percentile_approx"](spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {r["l_returnflag"]: r for r in
             li.groupBy("l_returnflag")
             .agg(F.expr("percentile(l_extendedprice, "
                         "array(0.5, 0.9, 0.99))").alias("p"))
             .collect()}
    assert set(approx) == set(exact) and len(approx) >= 2
    for flag, a in approx.items():
        p50, p90, p99 = exact[flag]["p"]
        # rank error n/accuracy translates to small relative value
        # error on these smooth distributions; 2% is generous
        assert abs(a["p50_approx"] - p50) / p50 < 0.02
        assert abs(a["p90_approx"] - p90) / p90 < 0.02
        assert abs(a["p99_approx"] - p99) / p99 < 0.02


def test_hll_intersection_error_bound(spark):
    """Sketch-only overlap estimates stay within a few percent of the
    exact distinct-intersection (inclusion-exclusion compounds the
    ~0.4% HLL(14) error of three estimates; 5% is a safe gate)."""
    from pyspark.sql import functions as F

    from challenge8_movies_etl_spark.registry import QUERIES, load_all
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    load_all()

    est = {(r["type_a"], r["type_b"]): r["est_overlap"]
           for r in QUERIES["q_hll_intersection"](spark, SF_SMOKE).collect()}
    e = load_table(spark, SF_SMOKE, "events")
    users = (e.select("event_type", "user_id").distinct())
    ua = users.select(F.col("event_type").alias("type_a"),
                      "user_id")
    ub = users.select(F.col("event_type").alias("type_b"),
                      "user_id")
    exact = {(r["type_a"], r["type_b"]): r["n"]
             for r in ua.join(ub, "user_id")
             .filter(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count("*").alias("n")).collect()}
    assert set(est) == set(exact) and len(est) >= 3
    for pair, n_est in est.items():
        n_true = exact[pair]
        assert abs(n_est - n_true) <= max(0.05 * n_true, 5), (pair, n_est, n_true)


def test_observe_metrics_piggyback(spark):
    """q_observe_metrics: metrics come from the CollectMetrics node of
    ONE observed action, and equal a direct aggregation of the same
    frame."""
    from pyspark.sql import functions as F

    from challenge8_movies_etl_spark.queries_core import q_observe_metrics
    from challenge8_movies_etl_spark.sources.fixtures import load_table

    row = q_observe_metrics(spark, SF_SMOKE).collect()[0]
    e = load_table(spark, SF_SMOKE, "events")
    direct = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
         .alias("errs")).collect()[0]
    assert row.n_rows == direct.n == e.count()
    assert row.n_errors == direct.errs
    assert row.n_null_props >= 0


def test_cogroup_asof_epoch_boundaries(spark):
    """Every event lands in the epoch floor((day-1)/7); per-type event
    counts must re-sum to the type's total, and thr must equal
    (thr_k+1)*10."""
    from challenge8_movies_etl_spark.queries_udf import q_cogroup_asof
    from challenge8_movies_etl_spark.sources.fixtures import load_table

    rows = q_cogroup_asof(spark, SF_SMOKE).collect()
    e = load_table(spark, SF_SMOKE, "events")
    totals = {r.event_type: r.n for r in
              e.groupBy("event_type").count()
              .withColumnRenamed("count", "n").collect()}
    by_type = {}
    for r in rows:
        assert r.thr == (r.thr_k + 1) * 10
        assert 0 <= r.n_above <= r.n_events
        by_type[r.event_type] = by_type.get(r.event_type, 0) + r.n_events
    assert by_type == totals
