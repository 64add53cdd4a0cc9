"""Round-4 wave D: evaluation metrics, declarative recursion, and
graph census operators.

A training-data pipeline doesn't just transform — it MEASURES its own
components: q_eval_langid scores the heuristic language-ID operator
against the corpus ground-truth labels (confusion counts + P/R/F1),
q_ndcg scores a similarity ranking against label relevance (the IR
eval primitive for retrieval/dedup tuning), q_holt_smoothing runs
double exponential smoothing as ONE recursive SQL text executed
verbatim by both engines (the q_sql_recursive pattern applied to a
numeric fixed recursion), and q_graph_degree_dist is the degree
census that sizes every downstream graph operator's skew.

Hash-stability per registry.py conventions.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import query
from .sources.fixtures import load_table

# ---------------------------------------------------------------------------
# q_eval_langid — classifier evaluation against ground truth
# ---------------------------------------------------------------------------

_EVAL_LANGID_ORACLE = None  # built below (needs the langid lexicon SQL)


def _eval_langid_oracle() -> str:
    from .operators.text import EN_STOPWORDS, lexicon_count_sql
    pred = f"""
      CASE WHEN cast({lexicon_count_sql('text', EN_STOPWORDS)} as double)
                / len(string_split(text, ' ')) >= 0.05
           THEN 'en' ELSE 'unknown' END
    """
    return f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth_en,
             CASE WHEN ({pred}) = 'en' THEN 1 ELSE 0 END AS pred_en
      FROM documents
    ),
    cm AS (
      SELECT cast(sum(truth_en * pred_en) as bigint) AS tp,
             cast(sum((1 - truth_en) * pred_en) as bigint) AS fp,
             cast(sum(truth_en * (1 - pred_en)) as bigint) AS fn,
             cast(sum((1 - truth_en) * (1 - pred_en)) as bigint) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           round(cast(tp as double) / (tp + fp), 6) AS precision,
           round(cast(tp as double) / (tp + fn), 6) AS recall,
           round(cast(2 * tp as double) / (2 * tp + fp + fn), 6) AS f1,
           round(cast(tp + tn as double) / (tp + fp + fn + tn), 6)
             AS accuracy
    FROM cm
    """


@query("q_eval_langid", oracle=_eval_langid_oracle())
def q_eval_langid(spark, sf_dir):
    """Operator self-evaluation: the q_text_langid heuristic (English
    stopword-rate threshold) scored against the corpus ground-truth
    `lang` column as a binary en/non-en classifier — confusion counts
    plus precision/recall/F1/accuracy. This is the label-quality gate
    a pipeline runs before TRUSTING a cheap heuristic to route 100 TB
    (ship the heuristic only where its measured precision clears the
    bar; the F1 here is an honest property of the fixture, not tuned).

    Scale: pure per-row codegen features folded into one global
    aggregate — zero pre-agg shuffle, metrics from 4 exact counters."""
    from .operators.text import stopword_count, token_count

    d = load_table(spark, sf_dir, "documents")
    pred_en = (stopword_count(F.col("text")).cast("double")
               / token_count(F.col("text")) >= 0.05).cast("int")
    truth_en = (F.col("lang") == "en").cast("int")
    scored = d.select(truth_en.alias("t"), pred_en.alias("p"))
    cm = scored.agg(
        F.sum(F.col("t") * F.col("p")).alias("tp"),
        F.sum((1 - F.col("t")) * F.col("p")).alias("fp"),
        F.sum(F.col("t") * (1 - F.col("p"))).alias("fn"),
        F.sum((1 - F.col("t")) * (1 - F.col("p"))).alias("tn"))
    tp, fp = F.col("tp"), F.col("fp")
    fn, tn = F.col("fn"), F.col("tn")
    return cm.select(
        "tp", "fp", "fn", "tn",
        F.round(tp.cast("double") / (tp + fp), 6).alias("precision"),
        F.round(tp.cast("double") / (tp + fn), 6).alias("recall"),
        F.round((2 * tp).cast("double") / (2 * tp + fp + fn), 6)
        .alias("f1"),
        F.round((tp + tn).cast("double") / (tp + fp + fn + tn), 6)
        .alias("accuracy"))


# ---------------------------------------------------------------------------
# q_ndcg — ranking evaluation (NDCG@10 of cosine retrieval vs labels)
# ---------------------------------------------------------------------------


def _ndcg_oracle() -> str:
    from .operators.similarity import DEC_SIM as DEC
    from .queries_llm import _NORMS_CTE
    return f"""
    WITH {_NORMS_CTE},
    probe AS (
      SELECT embedding AS pe, label AS pl, nrm AS pn
      FROM norms WHERE vec_id = 0
    ),
    cands AS (
      SELECT n.vec_id, n.label,
             cast(sum(cast(cast(n.embedding[gs.i] as double)
                           * cast(p.pe[gs.i] as double) as {DEC}))
                  as double) / sqrt(max(n.nrm) * max(p.pn)) AS cos
      FROM norms n CROSS JOIN probe p, range(1, 65) gs(i)
      WHERE n.vec_id != 0
      GROUP BY n.vec_id, n.label
    ),
    ranked AS (
      SELECT vec_id,
             CASE WHEN label = (SELECT pl FROM probe) THEN 1 ELSE 0 END
               AS rel,
             row_number() OVER (ORDER BY cos DESC, vec_id) AS i
      FROM cands
    ),
    nrel AS (
      SELECT cast(sum(rel) as bigint) AS n_rel FROM ranked
    ),
    dcg AS (
      SELECT cast(sum(cast(round(rel / log2(i + 1), 6)
                           as decimal(18,6))) as double) AS dcg10,
             cast(sum(rel) as bigint) AS rel10
      FROM ranked WHERE i <= 10
    ),
    idcg AS (
      SELECT cast(sum(cast(round(1.0 / log2(gs.i + 1), 6)
                           as decimal(18,6))) as double) AS idcg10
      FROM range(1, 11) gs(i)
      WHERE gs.i <= (SELECT least(n_rel, 10) FROM nrel)
    )
    SELECT (SELECT n_rel FROM nrel) AS n_rel_total,
           round(dcg10, 6) AS dcg_at_10,
           round(dcg10 / (SELECT idcg10 FROM idcg), 6) AS ndcg_at_10,
           round(rel10 / 10.0, 6) AS precision_at_10
    FROM dcg
    """


@query("q_ndcg", oracle=_ndcg_oracle())
def q_ndcg(spark, sf_dir):
    """Ranking evaluation: NDCG@10 / precision@10 of exact-cosine
    retrieval (probe vec_id=0 against the whole corpus) with relevance
    = shares-the-probe's-label — the IR metric that tunes retrieval
    and semantic-dedup components (q_similarity_ann's recall tests
    answer "did we find the true neighbors"; NDCG answers "is the
    ORDER good enough for downstream use"). Per-position gain terms
    are 6dp-rounded decimals summed exactly; ranks tie-break on
    vec_id.

    Scale: one broadcast-probe scan (zero shuffle — the
    q_similarity_topk plan) + a TakeOrdered-sized ranking; the metric
    itself aggregates 10 rows."""
    from .operators.similarity import dot_col
    from .queries_llm import _norm

    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    probe = (n.filter(F.col("vec_id") == 0)
             .select(F.col("embedding").alias("pe"),
                     F.col("label").alias("pl"), F.col("nrm").alias("pn")))
    cands = (n.filter(F.col("vec_id") != 0)
             .crossJoin(F.broadcast(probe))
             .select("vec_id",
                     (F.col("label") == F.col("pl")).cast("int")
                     .alias("rel"),
                     (dot_col(F.col("embedding"), F.col("pe"))
                      / F.sqrt(F.col("nrm") * F.col("pn"))).alias("cos")))
    ranked = cands.select(
        "vec_id", "rel",
        F.row_number().over(W.orderBy(F.desc("cos"), "vec_id")).alias("i"))
    nrel = ranked.agg(F.sum("rel").alias("n_rel"))
    dcg = (ranked.filter(F.col("i") <= 10)
           .agg(F.sum(F.round(F.col("rel") / F.log2(F.col("i") + 1), 6)
                      .cast("decimal(18,6)")).cast("double").alias("dcg10"),
                F.sum("rel").alias("rel10")))
    pos = spark.range(1, 11).select(F.col("id").alias("i"))
    idcg = (pos.crossJoin(F.broadcast(nrel))
            .filter(F.col("i") <= F.least(F.col("n_rel"), F.lit(10)))
            .agg(F.sum(F.round(F.lit(1.0) / F.log2(F.col("i") + 1), 6)
                       .cast("decimal(18,6)")).cast("double")
                 .alias("idcg10")))
    return (dcg.crossJoin(F.broadcast(nrel)).crossJoin(F.broadcast(idcg))
            .select(F.col("n_rel").alias("n_rel_total"),
                    F.round(F.col("dcg10"), 6).alias("dcg_at_10"),
                    F.round(F.col("dcg10") / F.col("idcg10"), 6)
                    .alias("ndcg_at_10"),
                    F.round(F.col("rel10") / 10.0, 6)
                    .alias("precision_at_10")))


# ---------------------------------------------------------------------------
# q_holt_smoothing — double exponential smoothing as same-text recursion
# ---------------------------------------------------------------------------

_HOLT_SQL = """
WITH RECURSIVE daily AS (
  SELECT cast(ts as date) AS d, count(*) AS x
  FROM events GROUP BY cast(ts as date)
),
idx AS (
  SELECT row_number() OVER (ORDER BY d) AS t,
         cast(d as string) AS day,
         cast(x as double) AS x
  FROM daily
),
holt AS (
  SELECT t, day, x,
         round(x, 6) AS lvl,
         cast(0.0 as double) AS trd
  FROM idx WHERE t = 1
  UNION ALL
  SELECT s.t, s.day, s.x,
         round(0.3 * s.x + 0.7 * (h.lvl + h.trd), 6) AS lvl,
         round(0.1 * (round(0.3 * s.x + 0.7 * (h.lvl + h.trd), 6)
                      - h.lvl)
               + 0.9 * h.trd, 6) AS trd
  FROM holt h JOIN idx s ON s.t = h.t + 1
)
SELECT t, day, x, lvl, trd,
       round(lvl + trd, 6) AS forecast_next
FROM holt
ORDER BY t DESC
LIMIT 10
"""


@query("q_holt_smoothing", oracle=_HOLT_SQL)
def q_holt_smoothing(spark, sf_dir):
    """Holt double exponential smoothing (level alpha=0.3, trend
    beta=0.1) over the daily event-count series, expressed as ONE
    recursive SQL text executed verbatim by both engines (the
    q_sql_recursive pattern applied to a NUMERIC recursion — the state
    at t is a declared-6dp function of the state at t-1, so the
    fixed point is bit-identical everywhere). Emits the last 10 days'
    level/trend and the one-step forecast — the trend-aware
    capacity-planning smoother one rung above q_ewma_smooth's single
    exponential.

    Scale: the recursion runs on the |days|-sized aggregate series
    (hundreds of rows at any corpus size), AFTER one map-side-combined
    daily rollup of the fact table; per-entity smoothing at scale maps
    the same recursion over a keyed window (q_ewma_smooth's plan) —
    this operator is the declarative-recursion entry point for it."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_HOLT_SQL)


# ---------------------------------------------------------------------------
# q_graph_degree_dist — degree distribution census
# ---------------------------------------------------------------------------

_DEG_ORACLE = """
WITH deg AS (
  SELECT o.o_custkey, count(DISTINCT l.l_suppkey) AS degree
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1
),
hist AS (
  SELECT degree, count(*) AS n_customers FROM deg GROUP BY 1
),
tot AS (SELECT cast(sum(n_customers) as bigint) AS n FROM hist)
SELECT degree, n_customers,
       round(cast(cast(sum(n_customers) OVER (ORDER BY degree) as bigint)
                  as double) / (SELECT n FROM tot), 6) AS cum_share
FROM hist
ORDER BY degree
"""


@query("q_graph_degree_dist", oracle=_DEG_ORACLE)
def q_graph_degree_dist(spark, sf_dir):
    """Degree-distribution census of the customer→supplier bipartite
    graph: how many distinct suppliers each customer touches, as a
    histogram with cumulative share — the FIRST query to run before
    any graph operator at 100 TB, because the tail of this histogram
    IS the skew that sizes pagerank/triangle reducers (a power-law
    tail ⇒ salt or cap hot vertices; q_skew_profile's diagnostic,
    specialized to graphs).

    Scale: distinct-supplier degree is one two-key groupBy then a
    per-customer count; the histogram and cumulative run on the
    |distinct degrees| relation (tens of rows)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    deg = (o.join(li, o.o_orderkey == li.l_orderkey)
           .groupBy("o_custkey")
           .agg(F.countDistinct("l_suppkey").alias("degree")))
    hist = deg.groupBy("degree").agg(F.count("*").alias("n_customers"))
    tot = hist.agg(F.sum("n_customers").alias("n"))
    return (hist.crossJoin(F.broadcast(tot))
            .select("degree", "n_customers",
                    F.round(F.sum("n_customers").over(W.orderBy("degree"))
                            .cast("double") / F.col("n"), 6)
                    .alias("cum_share"))
            .orderBy("degree"))
