"""Graph analytics over the fixture relations: PageRank on the
customer-supplier interaction graph.

The edge list is derived relationally (orders ⋈ lineitem → distinct
(customer, supplier) pairs, both directions), so the whole pipeline —
graph construction included — is declarative DataFrame code; only the
power-method loop is driver-orchestrated (operators/graph.py), exactly
like the connected-components ladder it sits beside. The oracle unrolls
the same fixed-iteration computation into chained CTEs, so even this
iterative algorithm is value-hash-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.graph import pagerank, pagerank_oracle_sql
from .registry import query
from .sources.fixtures import load_table

_EDGES_CTE = """
    pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION
      SELECT s, c FROM pairs
    )"""

_PAGERANK_ORACLE = pagerank_oracle_sql(_EDGES_CTE, iterations=5) + """
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS kind,
           round(cast(rank as double), 8) AS pr
    FROM r5
    ORDER BY rank DESC, node
    LIMIT 20
    """


@query("q_graph_pagerank", oracle=_PAGERANK_ORACLE)
def q_graph_pagerank(spark, sf_dir):
    """Top-20 PageRank nodes of the bipartite customer-supplier graph
    (5 damped power iterations, d=0.85). Suppliers serving many
    customers and customers touching many suppliers surface first —
    the influence/centrality primitive behind seed selection and
    crawl prioritization. Node ids are disjointly encoded
    (customer=2k, supplier=2k+1); ranks are decimal-exact, so the
    top-20 cut (ordered by rank desc, node) is deterministic on both
    engines."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (o.join(li, o.o_orderkey == li.l_orderkey)
             .select((F.col("o_custkey") * 2).alias("c"),
                     (F.col("l_suppkey") * 2 + 1).alias("s"))
             .distinct())
    edges = (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .unionByName(
                 pairs.select(F.col("s").alias("src"),
                              F.col("c").alias("dst"))))
    # pairs is already distinct and the two directions are disjoint
    # (src parity differs), so the edge list is distinct by
    # construction — skip the operator's |E| dedup shuffle
    ranks = pagerank(edges, iterations=5, assume_distinct=True)
    kind = F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier")
    return (ranks.orderBy(F.desc("rank"), "node").limit(20)
            .select("node", kind.alias("kind"),
                    F.round(F.col("rank").cast("double"), 8).alias("pr")))
