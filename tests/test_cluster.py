"""Connected-components label propagation (operators/cluster.py)."""

from __future__ import annotations


def test_components_on_known_graph(spark):
    from challenge8_movies_etl_spark.operators.cluster import (
        connected_components,
    )
    nodes = spark.createDataFrame([(i,) for i in range(8)], "id bigint")
    # components: {0,1,2,3} (chain), {4,5} and {6}, {7} singletons
    edges = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2), (4, 5)], "src bigint, dst bigint")
    got = {r["id"]: r["cluster"]
           for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6, 7: 7}
