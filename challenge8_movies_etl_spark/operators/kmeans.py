"""Distributed k-means (Lloyd's algorithm), fixed-iteration and
hash-portable across engines.

Third member of the iterative-operator family (operators/graph.py
pagerank, operators/cluster.py connected components): per iteration,
assignment is an argmin over k broadcast centroids evaluated entirely
in codegen'd expressions; the update is one map-side-combinable
groupBy. Only the k×d centroid matrix ever reaches the driver — the
standard broadcast-centroid k-means shape that runs unchanged at
100 TB (assignment is a zero-shuffle map; the update shuffles |k×d|
partial sums).

Numeric discipline (registry.py conventions): per-dimension squared
differences are 10dp-rounded doubles cast to decimal and summed
exactly, so distances — and therefore assignments — are identical on
any engine at any parallelism; ties break toward the lowest centroid
index by exact decimal comparison. Centroid updates divide a decimal
sum by the count and round to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC_D = "decimal(30,12)"   # distance accumulator
DEC_S = "decimal(30,12)"   # per-dim coordinate sums


def _distances(vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Attach d0..d{k-1}: exact-decimal squared L2 distance to each
    centroid. Centroid arrays are attached as literal array COLUMNS
    first so zip_with reads attributes (a literal-array argument would
    be re-evaluated per element — the HOF trap in dedup.word_ngrams)."""
    out = vecs
    for idx, c in enumerate(centroids):
        out = out.withColumn(
            f"_c{idx}", F.array(*[F.lit(float(x)) for x in c]))
    for idx in range(len(centroids)):
        term = F.zip_with(
            "embedding", f"_c{idx}",
            lambda a, b: F.round((a.cast("double") - b) * (a.cast("double") - b), 10)
            .cast(DEC_D))
        out = out.withColumn(
            f"_d{idx}",
            F.aggregate(term, F.lit(0).cast(DEC_D),
                        lambda acc, x: (acc + x).cast(DEC_D)))
    return out.drop(*[f"_c{i}" for i in range(len(centroids))])


def assign_clusters(vecs: DataFrame, centroids: list[list[float]],
                    keep_dist: bool = False) -> DataFrame:
    """(vec_id, embedding) + centroids → (vec_id, embedding, cluster);
    argmin with lowest-index tie-break via exact decimal equality.
    With ``keep_dist`` the exact-decimal squared distance to the
    assigned centroid is retained as ``cdist`` (SemDeDup's keep
    priority orders on it)."""
    k = len(centroids)
    d = _distances(vecs, centroids)
    m = F.least(*[F.col(f"_d{i}") for i in range(k)])
    cl = F.when(F.col("_d0") == m, 0)
    for i in range(1, k):
        cl = cl.when(F.col(f"_d{i}") == m, i)
    d = d.withColumn("cluster", cl.cast("int"))
    if keep_dist:
        d = d.withColumn("cdist", m)
    return d.drop(*[f"_d{i}" for i in range(k)])


def update_centroids(assigned: DataFrame, k: int, dim: int) -> list[list[float]]:
    """Per-cluster per-dimension mean, 6dp: one map-side-combinable
    groupBy; only the k×d matrix is collected (the broadcast-centroid
    license — same scale argument as linalg.py's dim² partials)."""
    sums = (assigned
            .select("cluster", F.posexplode("embedding").alias("i", "v"))
            .groupBy("cluster", "i")
            .agg(F.sum(F.col("v").cast(DEC_S)).alias("s"),
                 F.count("*").alias("n"))
            .select("cluster", "i",
                    F.round(F.col("s").cast("double") / F.col("n"), 6)
                    .alias("c"))
            .collect())
    cents = [[0.0] * dim for _ in range(k)]
    for row in sums:
        cents[row["cluster"]][row["i"]] = row["c"]
    return cents


def kmeans(vecs: DataFrame, init: list[list[float]],
           iterations: int = 2) -> tuple[DataFrame, list[list[float]]]:
    """Run ``iterations`` rounds of (assign, update) from ``init``;
    returns (final assignment DataFrame, final centroids). The final
    assignment uses the centroids of the LAST update, i.e. assignment
    runs ``iterations``+0 times with one trailing re-assignment folded
    into the caller's aggregate if needed."""
    dim = len(init[0])
    cents = [list(c) for c in init]
    assigned = None
    for _ in range(iterations):
        assigned = assign_clusters(vecs, cents)
        cents = update_centroids(assigned, len(cents), dim)
    return assigned, cents


def kmeans_oracle_sql(k: int = 4, iterations: int = 2,
                      dim: int = 64) -> str:
    """The DuckDB twin: the fixed iteration loop unrolled into chained
    CTEs with the identical decimal/rounding expression tree (same
    construction as graph.pagerank_oracle_sql)."""
    return (f"WITH {kmeans_cte_chain(k, iterations)}" + f"""
SELECT a.cluster,
       cast(count(*) as bigint) AS n,
       round(cast(nrm.s as double), 6) AS cnorm
FROM a{iterations} a
JOIN (
  SELECT idx, sum(cast(cast(c as decimal(12,6)) as decimal(12,6))
                  * cast(c as decimal(12,6))) AS s
  FROM c{iterations} GROUP BY 1
) nrm ON nrm.idx = a.cluster
GROUP BY a.cluster, nrm.s
ORDER BY a.cluster""")


def kmeans_cte_chain(k: int = 4, iterations: int = 2) -> str:
    """The WITH-body of the unrolled loop (x, c0, then per-iteration
    d{i}/a{i}/c{i}) so composite oracles — e.g. SemDeDup — can build on
    the assignment CTE a{iterations}, which carries the exact-decimal
    distance to the assigned centroid."""
    parts = [f"""
x AS (
  SELECT vec_id, gs.i AS i, cast(embedding[gs.i] as double) AS v
  FROM embeddings e JOIN range(1, 100000) gs(i)
    ON gs.i <= len(embedding)
),
c0 AS (
  SELECT e.idx, gs.i AS i, cast(e.embedding[gs.i] as double) AS c
  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, embedding
        FROM embeddings ORDER BY vec_id LIMIT {k}) e
  JOIN range(1, 100000) gs(i) ON gs.i <= len(e.embedding)
)"""]
    prev = "c0"
    for it in range(1, iterations + 1):
        parts.append(f""",
d{it} AS (
  SELECT x.vec_id, {prev}.idx,
         sum(cast(round((x.v - {prev}.c) * (x.v - {prev}.c), 10)
                  as {DEC_D})) AS dist
  FROM x JOIN {prev} ON x.i = {prev}.i
  GROUP BY 1, 2
),
a{it} AS (
  SELECT vec_id, idx AS cluster, dist FROM (
    SELECT vec_id, idx, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, idx) AS rn
    FROM d{it}
  ) WHERE rn = 1
),
c{it} AS (
  SELECT a.cluster AS idx, x.i AS i,
         round(cast(sum(cast(x.v as {DEC_S})) as double) / count(*), 6)
           AS c
  FROM a{it} a JOIN x ON a.vec_id = x.vec_id
  GROUP BY 1, 2
)""")
        prev = f"c{it}"
    return "".join(parts)
