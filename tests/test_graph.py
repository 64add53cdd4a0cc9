"""PageRank operator + query semantics: mass conservation, hub
dominance on a known topology, and determinism across partitionings."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.operators.graph import pagerank
from challenge8_movies_etl_spark.queries_graph import q_graph_pagerank
from tests.conftest import SF_SMOKE


def _star_edges(spark, n_leaves=6):
    # undirected star: hub 0 <-> leaves 1..n
    rows = [(0, i) for i in range(1, n_leaves + 1)]
    rows += [(i, 0) for i in range(1, n_leaves + 1)]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def test_star_hub_dominates(spark):
    ranks = {r["node"]: float(r["rank"])
             for r in pagerank(_star_edges(spark), iterations=5).collect()}
    hub = ranks.pop(0)
    assert all(hub > v for v in ranks.values())
    # leaves are symmetric -> identical ranks (exact decimals)
    assert len(set(ranks.values())) == 1
    # damped PageRank conserves mass up to per-node rounding
    assert math.isclose(hub + sum(ranks.values()), 1.0, abs_tol=1e-6)


def test_pagerank_partition_invariant(spark):
    e = _star_edges(spark, 5)
    a = sorted(map(tuple, pagerank(e, 4).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(7), 4).collect()))
    assert a == b


def test_query_topk_shape(spark):
    rows = q_graph_pagerank(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert {r["kind"] for r in rows} <= {"customer", "supplier"}
    prs = [r["pr"] for r in rows]
    assert prs == sorted(prs, reverse=True)
    assert all(p > 0 for p in prs)
