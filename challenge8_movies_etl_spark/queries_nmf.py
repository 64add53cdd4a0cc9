"""Distributed NMF topic modeling (Lee & Seung 2001 multiplicative
updates) — topic extraction as iterated relational algebra.

The doc-term count matrix V lives as a sparse (doc, term, v) relation;
the factors W (docs x k) and H (k x terms) live as (key, comp, val)
relations. One alternating update is then four joins and four
aggregations:

  Hnum = WᵀV   (join V·W on doc, sum per (comp, term))
  WtW  = WᵀW   (k x k, a tiny aggregate)
  H'   = H ∘ Hnum / (WtW·H),  rounded 8dp
  Wnum = V·H'ᵀ (join V·H' on term, sum per (doc, comp))
  HHt  = H'H'ᵀ (k x k)
  W'   = W ∘ Wnum / (W·HHt),  rounded 8dp

Numeric discipline (registry.py conventions): V is INTEGER counts;
W/H values are decimal(18,8) after every 8dp round, so every sum is an
exact decimal reduction (order-independent on any engine at any
parallelism); the elementwise update is double arithmetic over
identical inputs with an identical operation tree, re-quantized to
8dp. decimal(18,8) keeps every product within DuckDB's and Spark's
38-digit cap — a wider scale would make Spark silently reduce scale on
multiply (engine-dependent) and break the hash. Init is deterministic
and asymmetric on both engines (doc-id / first-char arithmetic), since
a symmetric init never separates the components.

Fixed k=2, 2 iterations, unrolled into chained CTEs on the oracle side
— topic modeling, value-hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import query
from .sources.fixtures import load_table

_NMF_K = 2
_NMF_ITERS = 2
_D8 = "decimal(18,8)"


def _nmf_oracle() -> str:
    comps = list(range(_NMF_K))
    parts = [f"""
WITH v AS MATERIALIZED (
  SELECT doc_id AS d, tok AS t, cast(count(*) as bigint) AS v
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY 1, 2
),
comps AS MATERIALIZED (SELECT unnest(range({_NMF_K})) AS c),
w0 AS MATERIALIZED (
  SELECT d, c, cast(1 + ((d * 31 + c * 17) % 7) / 10.0 as {_D8}) AS w
  FROM (SELECT DISTINCT d FROM v) CROSS JOIN comps
),
h0 AS MATERIALIZED (
  SELECT c, t,
         cast(1 + ((ascii(substr(t, 1, 1)) * 13 + c * 29) % 5) / 10.0
              as {_D8}) AS h
  FROM (SELECT DISTINCT t FROM v) CROSS JOIN comps
)"""]
    pw, ph = "w0", "h0"
    for i in range(1, _NMF_ITERS + 1):
        parts.append(f""",
hnum{i} AS MATERIALIZED (
  SELECT w.c, v.t,
         sum(cast(w.w as decimal(20,8)) * cast(v.v as decimal(10,0))) AS num
  FROM v JOIN {pw} w ON w.d = v.d
  GROUP BY 1, 2
),
wtw{i} AS MATERIALIZED (
  SELECT a.c AS ca, b.c AS cb,
         cast(round(cast(sum(cast(a.w as decimal(20,8)) * b.w)
                         as double), 8) as {_D8}) AS g
  FROM {pw} a JOIN {pw} b ON a.d = b.d
  GROUP BY 1, 2
),
hden{i} AS MATERIALIZED (
  SELECT g.ca AS c, h.t,
         sum(cast(g.g as decimal(20,8)) * h.h) AS den
  FROM wtw{i} g JOIN {ph} h ON h.c = g.cb
  GROUP BY 1, 2
),
h{i} AS MATERIALIZED (
  SELECT h.c, h.t,
         cast(round(cast(h.h as double) * cast(n.num as double)
                    / cast(d.den as double), 8) as {_D8}) AS h
  FROM {ph} h
  JOIN hnum{i} n ON n.c = h.c AND n.t = h.t
  JOIN hden{i} d ON d.c = h.c AND d.t = h.t
),
wnum{i} AS MATERIALIZED (
  SELECT v.d, h.c,
         sum(cast(h.h as decimal(20,8)) * cast(v.v as decimal(10,0))) AS num
  FROM v JOIN h{i} h ON h.t = v.t
  GROUP BY 1, 2
),
hht{i} AS MATERIALIZED (
  SELECT a.c AS ca, b.c AS cb,
         cast(round(cast(sum(cast(a.h as decimal(20,8)) * b.h)
                         as double), 8) as {_D8}) AS g
  FROM h{i} a JOIN h{i} b ON a.t = b.t
  GROUP BY 1, 2
),
wden{i} AS MATERIALIZED (
  SELECT w.d, g.ca AS c,
         sum(cast(g.g as decimal(20,8)) * w.w) AS den
  FROM {pw} w JOIN hht{i} g ON g.cb = w.c
  GROUP BY 1, 2
),
w{i} AS MATERIALIZED (
  SELECT w.d, w.c,
         cast(round(cast(w.w as double) * cast(n.num as double)
                    / cast(d.den as double), 8) as {_D8}) AS w
  FROM {pw} w
  JOIN wnum{i} n ON n.d = w.d AND n.c = w.c
  JOIN wden{i} d ON d.d = w.d AND d.c = w.c
)""")
        pw, ph = f"w{i}", f"h{i}"
    parts.append(f""",
mass AS MATERIALIZED (
  SELECT c, round(cast(sum(w) as double), 6) AS doc_mass
  FROM {pw} GROUP BY c
),
top AS MATERIALIZED (
  SELECT c, t, h,
         row_number() OVER (PARTITION BY c ORDER BY h DESC, t) AS rnk
  FROM {ph}
)
SELECT cast(top.c as int) AS component,
       cast(rnk as int) AS rank,
       t AS term,
       round(cast(h as double), 6) AS weight,
       doc_mass
FROM top JOIN mass ON mass.c = top.c
WHERE rnk <= 8
ORDER BY component, rank""")
    return "".join(parts)


@query("q_topic_nmf", oracle=_nmf_oracle())
def q_topic_nmf(spark, sf_dir):
    """NMF topic model over the corpus doc-term counts: k=2
    components, 2 alternating multiplicative updates, top-8 terms per
    component with weights plus each component's document mass — the
    classic distributed topic-extraction pipeline (count vectorize ->
    factorize -> read topics), expressed entirely as joins and
    aggregations over the sparse count relation. The oracle unrolls
    both updates into chained CTEs, so a matrix-factorization TRAINING
    loop is value-hash-checked (see module docstring for the decimal
    discipline that makes that possible).

    Scale: V is the only corpus-sized relation; each update touches it
    twice with doc- or term-keyed equi-joins against the k-wide factor
    relations (broadcast when they fit — k x |vocab| and k x k are
    always small; the docs x k side shuffles on doc like any fact
    aggregation). No step materializes a dense matrix; everything is
    map-side-combinable. k and iterations are fixed constants, so the
    lineage is bounded without checkpoints."""
    d = load_table(spark, sf_dir, "documents")
    v = (d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
         .groupBy(F.col("doc_id").alias("d"), "t")
         .agg(F.count("*").alias("v"))
         .persist())
    comps = spark.range(_NMF_K).select(F.col("id").cast("int").alias("c"))
    w = (v.select("d").distinct().crossJoin(F.broadcast(comps))
         .select("d", "c",
                 (1 + ((F.col("d") * 31 + F.col("c") * 17) % 7) / 10.0)
                 .cast(_D8).alias("w")))
    h = (v.select("t").distinct().crossJoin(F.broadcast(comps))
         .select("c", "t",
                 (1 + ((F.ascii(F.substring("t", 1, 1)) * 13
                        + F.col("c") * 29) % 5) / 10.0)
                 .cast(_D8).alias("h")))

    def upd(old, num, den, key_cols, val):
        out = (old.join(num, key_cols).join(den, key_cols)
               .select(*key_cols,
                       F.round(F.col(val).cast("double")
                               * F.col("num").cast("double")
                               / F.col("den").cast("double"), 8)
                       .cast(_D8).alias(val)))
        return out

    for _ in range(_NMF_ITERS):
        v10 = F.col("v").cast("decimal(10,0)")
        hnum = (v.join(w, "d")
                .groupBy("c", "t").agg(F.sum(F.col("w") * v10)
                                       .alias("num")))
        wa, wb = w.alias("wa"), w.alias("wb")
        wtw = (wa.join(wb, F.col("wa.d") == F.col("wb.d"))
               .groupBy(F.col("wa.c").alias("ca"),
                        F.col("wb.c").alias("cb"))
               .agg(F.round(F.sum(F.col("wa.w") * F.col("wb.w"))
                            .cast("double"), 8).cast(_D8).alias("g")))
        hden = (F.broadcast(wtw).join(h, F.col("cb") == h.c)
                .groupBy(F.col("ca").alias("c"), "t")
                .agg(F.sum(F.col("g") * F.col("h")).alias("den")))
        h = upd(h, hnum, hden, ["c", "t"], "h").localCheckpoint(eager=True)

        wnum = (v.join(h, "t")
                .groupBy("d", "c").agg(F.sum(F.col("h") * v10)
                                       .alias("num")))
        ha, hb = h.alias("ha"), h.alias("hb")
        hht = (ha.join(hb, F.col("ha.t") == F.col("hb.t"))
               .groupBy(F.col("ha.c").alias("ca"),
                        F.col("hb.c").alias("cb"))
               .agg(F.round(F.sum(F.col("ha.h") * F.col("hb.h"))
                            .cast("double"), 8).cast(_D8).alias("g")))
        wden = (w.join(F.broadcast(hht), F.col("cb") == w.c)
                .groupBy("d", F.col("ca").alias("c"))
                .agg(F.sum(F.col("g") * F.col("w")).alias("den")))
        w = upd(w, wnum, wden, ["d", "c"], "w").localCheckpoint(eager=True)

    mass = (w.groupBy("c")
            .agg(F.round(F.sum("w").cast("double"), 6).alias("doc_mass")))
    rnk = F.row_number().over(
        W.partitionBy("c").orderBy(F.desc("h"), "t"))
    top = h.withColumn("rnk", rnk).filter(F.col("rnk") <= 8)
    return (top.join(mass, "c")
            .select(F.col("c").cast("int").alias("component"),
                    F.col("rnk").cast("int").alias("rank"),
                    F.col("t").alias("term"),
                    F.round(F.col("h").cast("double"), 6).alias("weight"),
                    "doc_mass")
            .orderBy("component", "rank"))
