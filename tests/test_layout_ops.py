"""Fourth-wave pipeline-layout operators: boilerplate passages,
sequence packing, z-order file layout (SURVEY.md §5 conventions —
deterministic fixtures, invariants pinned not fuzzy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.registry import QUERIES, load_all
from challenge8_movies_etl_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE

load_all()


def test_boilerplate_counts_bounded_and_consistent(spark):
    """n_boiler <= n_passages; n_passages = ceil(tokens/4) per doc;
    basis points recompute exactly from the two counts."""
    rows = QUERIES["q_boilerplate_passages"](spark, SF_SMOKE).collect()
    toks = {r["doc_id"]: r["n"] for r in
            load_table(spark, SF_SMOKE, "documents")
            .select("doc_id",
                    F.size(F.split("text", " ")).alias("n")).collect()}
    assert len(rows) == len(toks)
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_passages"]
        assert r["n_passages"] == -(-toks[r["doc_id"]] // 4)
        assert r["boiler_bp"] == r["n_boiler"] * 10000 // r["n_passages"]


def test_boilerplate_flags_injected_duplicate_passage(spark):
    """Two crafted docs sharing one exact 4-token passage are both
    flagged with exactly one boilerplate passage; the third is clean."""
    d = spark.createDataFrame(
        [(1, "common header line here alpha beta gamma delta"),
         (2, "common header line here epsilon zeta eta theta"),
         (3, "totally unrelated words one two three four five")],
        "doc_id long, text string")
    d.createOrReplaceTempView("_bp_docs")
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    n_pass = F.ceil(F.size("w") / F.lit(4.0)).cast("bigint")
    p = (w.select("doc_id",
                  F.explode(F.sequence(F.lit(0).cast("bigint"),
                                       n_pass - 1)).alias("i"), "w")
         .select("doc_id", F.md5(F.array_join(
             F.slice("w", (F.col("i") * 4 + 1).cast("int"), 4),
             " ")).alias("h")))
    c = p.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    out = {r["doc_id"]: r["nb"] for r in
           p.join(c, "h").groupBy("doc_id")
           .agg(F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
                .alias("nb")).collect()}
    assert out == {1: 1, 2: 1, 3: 0}


def test_pack_sequences_bins_monotone_and_budgeted(spark):
    """Within each lang stream (ordered by doc_id) bin_id is
    non-decreasing, starts at 0, and equals floor(prefix_tokens/256)."""
    rows = QUERIES["q_pack_sequences"](spark, SF_SMOKE).collect()
    by_lang: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["lang"], r["doc_id"])):
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        prefix = 0
        last_bin = 0
        for r in rs:
            assert r["bin_id"] == prefix // 256
            assert r["bin_id"] >= last_bin
            last_bin = r["bin_id"]
            prefix += r["n_tok"]


def test_zorder_envelopes_prune_both_dimensions(spark):
    """The point of z-order vs a 1-D sort: a selective predicate on
    EITHER bucketed dimension must prune most files. With 8-bit
    buckets and 256-value files, a single-value predicate on xb or yb
    can intersect at most 25% of file envelopes (for z-order it's far
    less; a 1-D sort on xb alone would leave yb envelopes full-width,
    pruning nothing on that dimension)."""
    files = QUERIES["q_zorder_layout"](spark, SF_SMOKE).collect()
    n = len(files)
    assert n > 4
    # rows conserved
    total = sum(r["n_rows"] for r in files)
    assert total == load_table(spark, SF_SMOKE, "orders").count()
    for probe in (3, 97, 200):
        hit_x = sum(1 for r in files if r["min_cb"] <= probe <= r["max_cb"])
        hit_y = sum(1 for r in files if r["min_db"] <= probe <= r["max_db"])
        assert hit_x <= n / 4
        assert hit_y <= n / 4


def test_partitioned_scan_actually_prunes(spark):
    """The filtered read of the partitionBy(event_type) layout must
    carry the partition predicate in the scan's PartitionFilters (zero
    I/O on the other four types) and read only the matching
    directory."""
    from challenge8_movies_etl_spark.queries_incremental import (
        q_partitioned_pruned_scan,
    )

    df = q_partitioned_pruned_scan(spark, SF_SMOKE)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "PartitionFilters" in p
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m and "event_type" in m.group(1), p
    # the data filters must NOT re-check event_type row-wise: pruning
    # happened at the directory level
    assert df.count() > 0


def _hilbert_xy2d_ref(n: int, x: int, y: int) -> int:
    """Reference iterative xy2d (independent of the SQL generator)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_stages_match_reference_bijectively(spark):
    """The shared SQL stage generator (which BOTH engines run, so a
    generator bug would hash-match) must agree with an independent
    Python xy2d on every cell of the 16x16 grid — and be a bijection
    onto 0..255."""
    from challenge8_movies_etl_spark.queries_incremental import (
        _HIL_N, _hilbert_stage)

    grid = spark.createDataFrame(
        [(x, y, x, y, 0) for x in range(_HIL_N) for y in range(_HIL_N)],
        "x0 int, y0 int, x int, y int, d int")
    s = _HIL_N // 2
    while s > 0:
        grid = grid.selectExpr("x0", "y0", *_hilbert_stage(s, _HIL_N))
        s //= 2
    got = {(r["x0"], r["y0"]): r["d"] for r in grid.collect()}
    assert sorted(got.values()) == list(range(_HIL_N * _HIL_N))
    for (x, y), d in got.items():
        assert d == _hilbert_xy2d_ref(_HIL_N, x, y), (x, y)


def test_hilbert_consecutive_positions_are_grid_adjacent():
    """THE Hilbert property (Morton lacks it): consecutive curve
    positions differ by exactly one grid step — this is what makes
    file envelopes tight in both dimensions."""
    from challenge8_movies_etl_spark.queries_incremental import _HIL_N

    d2xy = {}
    for x in range(_HIL_N):
        for y in range(_HIL_N):
            d2xy[_hilbert_xy2d_ref(_HIL_N, x, y)] = (x, y)
    for d in range(_HIL_N * _HIL_N - 1):
        (x1, y1), (x2, y2) = d2xy[d], d2xy[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
