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

from .functions.hashsafe import davg, sql_davg
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
         cast(x as decimal(20,6)) AS x
  FROM daily
),
holt AS (
  SELECT t, day, x,
         x AS lvl,
         cast(0 as decimal(20,6)) AS trd
  FROM idx WHERE t = 1
  UNION ALL
  SELECT s.t, s.day, s.x,
         cast(round(cast('0.3' as decimal(2,1)) * s.x
                    + cast('0.7' as decimal(2,1)) * (h.lvl + h.trd), 6)
              as decimal(20,6)) AS lvl,
         cast(round(cast('0.1' as decimal(2,1))
                    * (cast(round(cast('0.3' as decimal(2,1)) * s.x
                                  + cast('0.7' as decimal(2,1))
                                    * (h.lvl + h.trd), 6)
                            as decimal(20,6)) - h.lvl)
                    + cast('0.9' as decimal(2,1)) * h.trd, 6)
              as decimal(20,6)) AS trd
  FROM holt h JOIN idx s ON s.t = h.t + 1
)
SELECT t, day, cast(x as double) + 0.0 AS x,
       cast(lvl as double) AS lvl,
       cast(trd as double) + 0.0 AS trd,
       cast(cast(lvl + trd as decimal(20,6)) as double) AS forecast_next
FROM holt
ORDER BY t DESC
LIMIT 10
"""
# EXACT DECIMAL recursion (round 8): the old form quantized each step
# with round(double, 6), but the step's true value is a 7dp decimal —
# one time in ten it sits EXACTLY on the 6dp half boundary, where
# Spark (BigDecimal HALF_UP on the binary expansion) and DuckDB
# (multiply + nearbyint) disagree on the same double; the sf1.0 sweep
# caught the flip compounding down the longer series. With
# decimal(2,1) literals and decimal state, every step is exact decimal
# arithmetic and both engines' round() is decimal HALF_UP — identical
# by construction. (x is cast back to double for the output contract;
# integers convert exactly.)


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


# ---------------------------------------------------------------------------
# q_rolling_corr — rolling Pearson correlation between two series
# ---------------------------------------------------------------------------

_RCORR_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d,
         cast(count(CASE WHEN event_type = 'click' THEN 1 END)
              as bigint) AS x,
         cast(count(CASE WHEN event_type = 'view' THEN 1 END)
              as bigint) AS y
  FROM events GROUP BY 1
),
rolled AS (
  SELECT d, x, y,
         cast(count(*) OVER w as bigint) AS n,
         cast(sum(x) OVER w as bigint) AS sx,
         cast(sum(y) OVER w as bigint) AS sy,
         cast(sum(x * x) OVER w as bigint) AS sxx,
         cast(sum(y * y) OVER w as bigint) AS syy,
         cast(sum(x * y) OVER w as bigint) AS sxy
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT cast(d as varchar) AS day, x, y,
       round(cast(n * sxy - sx * sy as double)
             / sqrt(cast(n * sxx - sx * sx as double)
                    * cast(n * syy - sy * sy as double)), 6) + 0.0 AS corr7
FROM rolled
WHERE n = 7 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
ORDER BY day
"""


@query("q_rolling_corr", oracle=_RCORR_ORACLE)
def q_rolling_corr(spark, sf_dir):
    """7-day rolling Pearson correlation between two event series
    (click vs view daily counts) — the co-movement drift signal behind
    metric-coupling monitors (a feed whose click/view correlation
    collapses is broken even when each volume looks normal). All six
    rolling sums are exact integers over a ROWS frame; the closed form
    (n*Sxy - SxSy)/sqrt(...) divides once behind a 6dp round.
    Degenerate (zero-variance) windows are excluded on both engines.

    Scale: one daily rollup, then windows over the |days| relation;
    per-key rolling correlation at scale partitions the same frame by
    the entity key."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.count(F.when(F.col("event_type") == "click", 1))
                  .alias("x"),
                  F.count(F.when(F.col("event_type") == "view", 1))
                  .alias("y")))
    w = W.orderBy("d").rowsBetween(-6, 0)
    r = daily.select(
        "d", "x", "y",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"))
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (r.filter((F.col("n") == 7) & (vx > 0) & (vy > 0))
            .select(F.col("d").cast("string").alias("day"), "x", "y",
                    F.round(num.cast("double")
                            / F.sqrt(vx.cast("double") * vy.cast("double")),
                            6).alias("corr7"))
            .orderBy("day"))


# ---------------------------------------------------------------------------
# q_corpus_divergence — per-source distribution drift vs the corpus
# ---------------------------------------------------------------------------

_JS_ORACLE = """
WITH tok AS (
  SELECT source, t.w AS w
  FROM documents, unnest(string_split(text, ' ')) AS t(w)
  WHERE t.w != ''
),
sc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
st AS (SELECT source, cast(sum(c) as bigint) AS n_s FROM sc GROUP BY 1),
gc AS (SELECT w, cast(sum(c) as bigint) AS g FROM sc GROUP BY 1),
gt AS (SELECT cast(sum(g) as bigint) AS n_g FROM gc),
grid AS (
  SELECT st.source, st.n_s, gc.w, gc.g, coalesce(sc.c, 0) AS c
  FROM st CROSS JOIN gc
  LEFT JOIN sc ON sc.source = st.source AND sc.w = gc.w
),
terms AS (
  SELECT source, n_s, c, g, (SELECT n_g FROM gt) AS n_g,
         CASE WHEN c > 0 THEN
           cast(round((cast(c as double) / n_s)
                * ln(2.0 * c * (SELECT n_g FROM gt)
                     / (cast(c as double) * (SELECT n_g FROM gt)
                        + cast(g as double) * n_s)), 8)
                as decimal(16,8))
         ELSE cast(0 as decimal(16,8)) END AS p_term,
         cast(round((cast(g as double) / (SELECT n_g FROM gt))
              * ln(2.0 * g * n_s
                   / (cast(c as double) * (SELECT n_g FROM gt)
                      + cast(g as double) * n_s)), 8)
              as decimal(16,8)) AS q_term
  FROM grid
)
SELECT source,
       max(n_s) AS n_tokens,
       cast(count(CASE WHEN c > 0 THEN 1 END) as bigint) AS vocab_used,
       cast(count(*) as bigint) AS vocab_total,
       cast(round(0.5 * sum(p_term) + 0.5 * sum(q_term), 4) as double)
         AS js_divergence
FROM terms GROUP BY source
"""


@query("q_corpus_divergence", oracle=_JS_ORACLE)
def q_corpus_divergence(spark, sf_dir):
    """Per-source Jensen-Shannon divergence of the unigram distribution
    against the whole corpus, plus vocabulary coverage — the
    source-drift ranking a data-mixing pipeline uses to flag feeds
    whose content departed from the blend (q_domain_mix rebalances
    volumes; this measures CONTENT). JS terms use exact rational
    arguments inside ln (p=c/N_s, q=g/N_g cross-multiplied), 8dp-rounded
    and decimal-summed (the q_entropy discipline); absent-word cells
    contribute only their q-side term (p*ln(...)->0 as p->0).

    Scale: token counts are one explode+groupBy; the grid is
    |sources| x |vocab| (bounded by the vocab, not the corpus) built
    from a broadcast vocab relation; each source's divergence is one
    decimal sum."""
    d = load_table(spark, sf_dir, "documents")
    tok = (d.select("source", F.explode(F.split("text", " ")).alias("w"))
           .filter(F.col("w") != ""))
    sc = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("n_s"))
    gc = sc.groupBy("w").agg(F.sum("c").alias("g"))
    gt = gc.agg(F.sum("g").alias("n_g"))
    grid = (st.crossJoin(F.broadcast(gc))
            .join(sc, ["source", "w"], "left")
            .withColumn("c", F.coalesce("c", F.lit(0)))
            .crossJoin(F.broadcast(gt)))
    denom = (F.col("c").cast("double") * F.col("n_g")
             + F.col("g").cast("double") * F.col("n_s"))
    p_term = F.when(
        F.col("c") > 0,
        F.round((F.col("c").cast("double") / F.col("n_s"))
                * F.log(2.0 * F.col("c") * F.col("n_g") / denom), 8)
        .cast("decimal(16,8)")).otherwise(F.lit(0).cast("decimal(16,8)"))
    q_term = F.round(
        (F.col("g").cast("double") / F.col("n_g"))
        * F.log(2.0 * F.col("g") * F.col("n_s") / denom), 8) \
        .cast("decimal(16,8)")
    terms = grid.select("source", "n_s", "c",
                        p_term.alias("p_term"), q_term.alias("q_term"))
    return (terms.groupBy("source")
            .agg(F.max("n_s").alias("n_tokens"),
                 F.count(F.when(F.col("c") > 0, 1)).alias("vocab_used"),
                 F.count("*").alias("vocab_total"),
                 F.round(0.5 * F.sum("p_term") + 0.5 * F.sum("q_term"), 4)
                 .cast("double").alias("js_divergence")))


# ---------------------------------------------------------------------------
# q_similarity_filtered — metadata-filtered vector retrieval
# ---------------------------------------------------------------------------


def _sim_filtered_oracle() -> str:
    from .operators.similarity import DEC_SIM as DEC
    from .queries_llm import _NORMS_CTE
    return f"""
    WITH {_NORMS_CTE},
    probe AS (SELECT embedding AS p, nrm AS pn, label AS pl
              FROM norms WHERE vec_id = 0),
    dots AS (
      SELECT n.vec_id, n.label,
             cast(sum(cast(cast(n.embedding[gs.i] as double)
                           * cast(probe.p[gs.i] as double)
                           as {DEC})) as double) AS dot,
             max(n.nrm) AS na, max(probe.pn) AS pn
      FROM norms n, probe, range(1, 65) gs(i)
      WHERE n.vec_id <> 0 AND n.label <> probe.pl
      GROUP BY n.vec_id, n.label
    )
    SELECT vec_id, label, round(dot / sqrt(na * pn), 4) AS cos
    FROM dots
    ORDER BY cos DESC, vec_id
    LIMIT 10
    """


@query("q_similarity_filtered", oracle=_sim_filtered_oracle())
def q_similarity_filtered(spark, sf_dir):
    """Filtered vector retrieval: top-10 cosine neighbors of probe
    vec_id=0 RESTRICTED to vectors whose label differs from the
    probe's — the pre-filtered search every production vector system
    exposes (metadata predicate + ANN), in its exact form. The filter
    composes BEFORE scoring, so non-matching vectors are never scored
    (predicate pushdown into the scan — post-filtering a top-k is the
    classic filtered-search bug: it returns < k rows).

    Scale: identical plan to q_similarity_topk (broadcast probe, one
    scan, TakeOrderedAndProject) — the predicate rides the scan; in
    the IVF tier the same predicate applies per cell."""
    from .operators.similarity import dot_col
    from .queries_llm import _norm

    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    probe = (n.filter(F.col("vec_id") == 0)
             .select(F.col("embedding").alias("pe"),
                     F.col("nrm").alias("pn"), F.col("label").alias("pl")))
    return (n.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(probe))
            .filter(F.col("label") != F.col("pl"))
            .select("vec_id", "label",
                    F.round(dot_col(F.col("embedding"), F.col("pe"))
                            / F.sqrt(F.col("nrm") * F.col("pn")), 4)
                    .alias("cos"))
            .orderBy(F.desc("cos"), "vec_id").limit(10))


# ---------------------------------------------------------------------------
# q_similarity_batch — batched multi-probe retrieval
# ---------------------------------------------------------------------------


def _sim_batch_oracle() -> str:
    from .operators.similarity import DEC_SIM as DEC
    from .queries_llm import _NORMS_CTE
    return f"""
    WITH {_NORMS_CTE},
    probes AS (
      SELECT vec_id AS probe_id, embedding AS p, nrm AS pn
      FROM norms WHERE vec_id < 5
    ),
    dots AS (
      SELECT probes.probe_id, n.vec_id,
             cast(sum(cast(cast(n.embedding[gs.i] as double)
                           * cast(probes.p[gs.i] as double)
                           as {DEC})) as double) AS dot,
             max(n.nrm) AS na, max(probes.pn) AS pn
      FROM norms n CROSS JOIN probes, range(1, 65) gs(i)
      WHERE n.vec_id <> probes.probe_id
      GROUP BY probes.probe_id, n.vec_id
    ),
    ranked AS (
      SELECT probe_id, vec_id, round(dot / sqrt(na * pn), 4) AS cos,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY round(dot / sqrt(na * pn), 4)
                                           DESC, vec_id) AS rk
      FROM dots
    )
    SELECT probe_id, vec_id, cos, rk
    FROM ranked WHERE rk <= 5
    """


@query("q_similarity_batch", oracle=_sim_batch_oracle())
def q_similarity_batch(spark, sf_dir):
    """Batched retrieval: exact top-5 neighbors for FIVE probes
    (vec_id < 5) in one plan — the query-batch shape real retrieval
    runs (embedding a request batch, then one corpus pass for all of
    them), not a per-probe loop. One scan scores |corpus| x |probes|
    via the broadcast probe relation; per-probe ranking partitions by
    probe_id.

    Scale: corpus pass count is 1 regardless of batch size; the
    broadcast probe matrix is |probes| x d (KBs for thousands of
    probes); the rank shuffles only |probes| x |corpus| scored rows —
    at 100 TB batch the probes to what executor memory holds and the
    scored relation stays TakeOrdered-prunable per partition."""
    from .operators.similarity import dot_col
    from .queries_llm import _norm

    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    probes = (n.filter(F.col("vec_id") < 5)
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("embedding").alias("pe"),
                      F.col("nrm").alias("pn")))
    scored = (n.crossJoin(F.broadcast(probes))
              .filter(F.col("vec_id") != F.col("probe_id"))
              .select("probe_id", "vec_id",
                      F.round(dot_col(F.col("embedding"), F.col("pe"))
                              / F.sqrt(F.col("nrm") * F.col("pn")), 4)
                      .alias("cos")))
    rk = F.row_number().over(
        W.partitionBy("probe_id").orderBy(F.desc("cos"), "vec_id"))
    return (scored.withColumn("rk", rk).filter(F.col("rk") <= 5)
            .select("probe_id", "vec_id", "cos", "rk"))


# ---------------------------------------------------------------------------
# q_incremental_agg_merge — incremental view maintenance
# ---------------------------------------------------------------------------

_IVM_ORACLE = """
SELECT event_type,
       count(*) AS n,
       cast(round(sum(cast(round(cast(value as decimal(20,10)), 3) * 1000
                     as bigint)) / 1000.0, 3)
            as double) AS total_value,
       max(cast(round(cast(value as decimal(20,10)), 3) as double))
         AS max_value
FROM events
GROUP BY 1
"""


@query("q_incremental_agg_merge", oracle=_IVM_ORACLE)
def q_incremental_agg_merge(spark, sf_dir):
    """Incremental view maintenance: the per-type aggregate is
    computed as BASE (events before the cutoff) merged with DELTA
    (events after) — counts add, integer-milli value sums add, maxes
    combine via greatest — while the oracle recomputes from scratch;
    the value-hash equality IS the IVM correctness proof (merge(base,
    delta) == recompute(all) for these distributive/algebraic
    aggregates). This is the maintenance algebra a 100 TB nightly
    pipeline runs: touch only the delta partition, merge summaries,
    never rescan the base — the batch twin of what Structured
    Streaming's stateful aggregation does per micro-batch.

    Scale: two map-side-combined aggregates (the base one amortized /
    pre-materialized in a real deployment) + a |groups|-sized
    full-outer merge join. Median/distinct-style HOLISTIC aggregates
    don't merge like this — they need the sketch family
    (q_minhash_reagg / q_percentile_approx / q_agg_sketch_reagg)."""
    e = load_table(spark, sf_dir, "events")
    val3 = F.round(F.col("value").cast("decimal(20,10)"), 3)
    milli = (val3 * 1000).cast("bigint")
    # Cutoff sits INSIDE the fixture's event range (2024-01-01..
    # 2024-01-30 at every SF), so base AND delta are non-empty and
    # the count/sum addition + greatest(max) merge paths are
    # genuinely exercised (round-5 advice: the old 2024-02-15
    # cutoff made the delta side vacuously empty).
    cutoff = F.lit("2024-01-15").cast("date")

    def agg(df, suffix):
        return df.groupBy("event_type").agg(
            F.count("*").alias(f"n{suffix}"),
            F.sum(milli).alias(f"s{suffix}"),
            F.max(val3.cast("double")).alias(f"m{suffix}"))

    base = agg(e.filter(F.col("ts").cast("date") < cutoff), "_b")
    delta = agg(e.filter(F.col("ts").cast("date") >= cutoff), "_d")
    merged = base.join(delta, "event_type", "full_outer")
    z = F.lit(0).cast("bigint")
    return merged.select(
        "event_type",
        (F.coalesce("n_b", z) + F.coalesce("n_d", z)).alias("n"),
        F.round((F.coalesce("s_b", z) + F.coalesce("s_d", z)) / 1000.0, 3)
        .cast("double").alias("total_value"),
        F.greatest(F.col("m_b"), F.col("m_d")).alias("max_value"))


# ---------------------------------------------------------------------------
# q_sql_window — textual window-function surface (same text, both engines)
# ---------------------------------------------------------------------------

_SQL_WINDOW = """
SELECT o_custkey,
       o_orderkey,
       rank() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
       round(cast(sum(cast(round(cast(o_totalprice as decimal(30,10)), 2)
                           * 100 as bigint))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) as double) / 100,
             2) AS running_spend
FROM orders
WHERE o_custkey % 100 = 0
"""


@query("q_sql_window", oracle=_SQL_WINDOW)
def q_sql_window(spark, sf_dir):
    """Textual window-function surface: rank + running integer-cents
    spend per customer as ONE raw SQL text executed verbatim by both
    engines (the q_sql_surface/q_sql_recursive pattern applied to
    windows — the DataFrame twins are q_window_rank/q_window_running;
    this is the entry point a SQL-first user actually types). The
    customer filter keeps the checked slice small; both window frames
    carry deterministic tie-breaks.

    Scale: one customer-keyed exchange serves both windows (same
    partitioning); the filter is pushed to the scan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL_WINDOW)


# ---------------------------------------------------------------------------
# q_eval_langid_slices — disaggregated (per-slice) classifier evaluation
# ---------------------------------------------------------------------------


def _eval_slices_oracle() -> str:
    from .operators.text import EN_STOPWORDS, lexicon_count_sql
    pred = f"""
      CASE WHEN cast({lexicon_count_sql('text', EN_STOPWORDS)} as double)
                / len(string_split(text, ' ')) >= 0.05
           THEN 1 ELSE 0 END
    """
    return f"""
    SELECT lang,
           count(*) AS n_docs,
           cast(sum({pred}) as bigint) AS n_pred_en,
           round(cast(sum(CASE WHEN (lang = 'en') = (({pred}) = 1)
                          THEN 1 ELSE 0 END) as double) / count(*), 6)
             AS slice_accuracy
    FROM documents
    GROUP BY 1
    """


@query("q_eval_langid_slices", oracle=_eval_slices_oracle())
def q_eval_langid_slices(spark, sf_dir):
    """Disaggregated evaluation: the langid heuristic's accuracy PER
    ground-truth language slice — the fairness/robustness practice
    that catches classifiers whose aggregate accuracy (q_eval_langid)
    hides a collapsed slice (e.g. a heuristic that calls everything
    non-en gets high accuracy on a mostly-non-en corpus while failing
    'en' completely). One row per language with prediction counts and
    slice accuracy.

    Scale: same zero-shuffle codegen features as q_eval_langid, one
    groupBy on the |langs| domain."""
    from .operators.text import stopword_count, token_count

    d = load_table(spark, sf_dir, "documents")
    pred_en = (stopword_count(F.col("text")).cast("double")
               / token_count(F.col("text")) >= 0.05).cast("int")
    correct = ((F.col("lang") == "en").cast("int") == pred_en).cast("int")
    return (d.select("lang", pred_en.alias("p"), correct.alias("ok"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("p").alias("n_pred_en"),
                 F.round(F.sum("ok").cast("double") / F.count("*"), 6)
                 .alias("slice_accuracy")))


# ---------------------------------------------------------------------------
# q_anomaly_seasonal — seasonally-adjusted volume anomalies
# ---------------------------------------------------------------------------

_SEAS_ANOM_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d, cast(count(*) as bigint) AS x
  FROM events GROUP BY 1
),
dow AS (
  SELECT date_diff('day', DATE '1970-01-01', d) % 7 AS dow,
         cast(count(*) as bigint) AS n_days,
         cast(sum(x) as bigint) AS sx
  FROM daily GROUP BY 1
),
tot AS (SELECT cast(sum(n_days) as bigint) AS big_n,
               cast(sum(sx) as bigint) AS big_s FROM dow),
adj AS (
  SELECT d.d, d.x,
         cast(round(cast(d.x as double) * w.n_days * t.big_s
                    / (cast(w.sx as double) * t.big_n), 6)
              as decimal(18,6)) AS a
  FROM daily d
  JOIN dow w ON date_diff('day', DATE '1970-01-01', d.d) % 7 = w.dow
  CROSS JOIN tot t
),
stats AS (
  SELECT count(*) AS n, sum(a) AS sa,
         sum(cast(cast(a as decimal(19,6)) * a as decimal(38,12))) AS saa
  FROM adj
)
SELECT cast(a.d as varchar) AS day, a.x,
       round(cast(a.a as double), 2) AS adjusted,
       round((cast(a.a as double) - cast(s.sa as double) / s.n)
             / sqrt(cast(s.saa as double) / s.n
                    - pow(cast(s.sa as double) / s.n, 2)), 4) AS z
FROM adj a CROSS JOIN stats s
WHERE abs((cast(a.a as double) - cast(s.sa as double) / s.n)
          / sqrt(cast(s.saa as double) / s.n
                 - pow(cast(s.sa as double) / s.n, 2))) > 2
ORDER BY day
"""


@query("q_anomaly_seasonal", oracle=_SEAS_ANOM_ORACLE)
def q_anomaly_seasonal(spark, sf_dir):
    """Seasonally-adjusted anomaly detection — the follow-through
    q_seasonal_dow promises: each day's count divides by the inverse
    of its weekday's seasonal index (x * n_days*S / (sx*N), the same
    n-scaled rationals), then days beyond 2 sigma of the ADJUSTED
    series are flagged. A busy-Monday spike that q_anomaly_zscore
    would flag disappears; a quiet-Sunday surge it would miss
    surfaces. Adjusted values are 6dp decimals so the moment sums are
    exact; the z comparison uses the same double expression on both
    engines.

    Scale: daily rollup + 7-row seasonal join + one moment aggregate —
    everything after the first groupBy is |days|-sized."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("x")))
    dow = (daily.groupBy((F.datediff("d", F.lit("1970-01-01")) % 7)
                         .alias("dow"))
           .agg(F.count("*").alias("n_days"), F.sum("x").alias("sx")))
    tot = dow.agg(F.sum("n_days").alias("big_n"), F.sum("sx").alias("big_s"))
    adj = (daily
           .withColumn("dow", F.datediff("d", F.lit("1970-01-01")) % 7)
           .join(F.broadcast(dow), "dow")
           .crossJoin(F.broadcast(tot))
           .select("d", "x",
                   F.round(F.col("x").cast("double") * F.col("n_days")
                           * F.col("big_s")
                           / (F.col("sx").cast("double") * F.col("big_n")),
                           6).cast("decimal(18,6)").alias("a")))
    stats = adj.agg(
        F.count("*").alias("n"), F.sum("a").alias("sa"),
        F.sum((F.col("a") * F.col("a")).cast("decimal(38,12)")).alias("saa"))
    j = adj.crossJoin(F.broadcast(stats))
    mean = F.col("sa").cast("double") / F.col("n")
    std = F.sqrt(F.col("saa").cast("double") / F.col("n") - F.pow(mean, 2))
    z = (F.col("a").cast("double") - mean) / std
    return (j.filter(F.abs(z) > 2)
            .select(F.col("d").cast("string").alias("day"), "x",
                    F.round(F.col("a").cast("double"), 2).alias("adjusted"),
                    F.round(z, 4).alias("z"))
            .orderBy("day"))


# ---------------------------------------------------------------------------
# q_audience_overlap — pairwise audience Jaccard between event types
# ---------------------------------------------------------------------------

_AUD_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
),
sizes AS (
  SELECT event_type, cast(count(*) as bigint) AS n FROM ut GROUP BY 1
),
inter AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         cast(count(*) as bigint) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.ta, i.tb, sa.n AS n_a, sb.n AS n_b, i.n_both,
       round(cast(i.n_both as double) / (sa.n + sb.n - i.n_both), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.ta
JOIN sizes sb ON sb.event_type = i.tb
"""


@query("q_audience_overlap", oracle=_AUD_ORACLE)
def q_audience_overlap(spark, sf_dir):
    """Pairwise audience overlap: for every event-type pair, the
    distinct-user intersection and Jaccard similarity — the audience/
    cohort-overlap matrix behind segmentation and cross-sell analysis,
    and the exact twin of what q_hll_intersection estimates with
    sketches (run THIS where exact fits; sketches where only
    summaries travel).

    Scale: one distinct (user, type) projection (map-side combined),
    then a user-keyed self-join whose per-user fan-out is bounded by
    |types|² (25 here) — never user x user."""
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("ta"))
    b = ut.select("user_id", F.col("event_type").alias("tb"))
    inter = (a.join(b, "user_id").filter(F.col("ta") < F.col("tb"))
             .groupBy("ta", "tb").agg(F.count("*").alias("n_both")))
    sa = sizes.select(F.col("event_type").alias("ta"),
                      F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("tb"),
                      F.col("n").alias("n_b"))
    return (inter.join(F.broadcast(sa), "ta").join(F.broadcast(sb), "tb")
            .select("ta", "tb", "n_a", "n_b", "n_both",
                    F.round(F.col("n_both").cast("double")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("n_both")), 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# q_cluster_quality — per-label centroid dispersion diagnostics
# ---------------------------------------------------------------------------


def _cluster_quality_oracle() -> str:
    from .operators.similarity import DEC_SIM as DEC
    return f"""
    WITH elems AS (
      SELECT label, vec_id, gs.i AS dim,
             cast(embedding[gs.i] as double) AS v
      FROM embeddings, range(1, 65) gs(i)
    ),
    cents AS (
      SELECT label, dim,
             cast(cast(CASE WHEN sum(cast(cast(v as decimal(27,10))
                                         * 10000000000 as bigint)) >= 0
               THEN (2 * sum(cast(cast(v as decimal(27,10))
                                  * 10000000000 as bigint))
                     + count(*) * 10000)
                    // (2 * count(*) * 10000)
               ELSE -((2 * -sum(cast(cast(v as decimal(27,10))
                                     * 10000000000 as bigint))
                       + count(*) * 10000)
                      // (2 * count(*) * 10000)) END as double) / 1e6
                  as decimal(12,6)) AS c
      FROM elems GROUP BY 1, 2
    ),
    dists AS (
      SELECT e.label, e.vec_id,
             sqrt(cast(sum(cast((e.v - cast(c.c as double))
                                * (e.v - cast(c.c as double))
                                as {DEC})) as double)) AS dist
      FROM elems e JOIN cents c ON e.label = c.label AND e.dim = c.dim
      GROUP BY 1, 2
    )
    SELECT label, cast(count(*) as bigint) AS n,
           cast(round(sum(cast(round(dist, 6) as decimal(16,6))), 4)
                as double) AS sum_dist,
           round(max(dist), 4) AS max_dist
    FROM dists GROUP BY 1
    """


@query("q_cluster_quality", oracle=_cluster_quality_oracle())
def q_cluster_quality(spark, sf_dir):
    """Cluster-quality diagnostics per label: the 6dp-pinned centroid
    (exact decimal mean per dimension) and each member's Euclidean
    distance to it, reported as per-label member count, total and max
    dispersion — the compactness readout that validates q_kmeans /
    semantic-dedup cluster assignments (a label whose max_dist dwarfs
    its mean is two clusters wearing one id). Distances follow the
    DEC_SIM discipline (decimal-exact sums of per-dim doubles) and
    are 6dp-rounded decimals before the dispersion sum.

    Scale: centroids are one (label, dim) map-side-combined aggregate
    (|labels| x 64 rows, broadcastable); distances are one
    co-keyed join + per-vector aggregate — no pairwise work at all
    (contrast the O(n²/labels) exact pair queries)."""
    from .operators.similarity import DEC_SIM as DEC

    e = load_table(spark, sf_dir, "embeddings")
    elems = e.select(
        "label", "vec_id",
        F.posexplode("embedding").alias("dim0", "vf")) \
        .select("label", "vec_id", (F.col("dim0") + 1).alias("dim"),
                F.col("vf").cast("double").alias("v"))
    # exact integer 6dp centroid mean (VERDICT r9 item 3): the 10dp
    # decimal sum over count can sit on a 6dp half boundary (needs
    # S = odd*5000*C), so both engines round by integer DIV instead
    _s10 = ("sum(cast(cast(v as decimal(27,10))"
            " * 10000000000 as decimal(30,0)))")
    cents = (elems.groupBy("label", "dim")
             .agg(F.expr(
                 f"cast(cast(CASE WHEN {_s10} >= 0"
                 f" THEN (2 * {_s10} + count(*) * 10000)"
                 f" DIV (2 * count(*) * 10000)"
                 f" ELSE -((2 * -{_s10} + count(*) * 10000)"
                 f" DIV (2 * count(*) * 10000)) END as double) / 1e6"
                 " as decimal(12,6))").alias("c")))
    diff = F.col("v") - F.col("c").cast("double")
    dists = (elems.join(cents, ["label", "dim"])
             .groupBy("label", "vec_id")
             .agg(F.sqrt(F.sum((diff * diff).cast(DEC)).cast("double"))
                  .alias("dist")))
    return (dists.groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.round("dist", 6).cast("decimal(16,6)")), 4)
                 .cast("double").alias("sum_dist"),
                 F.round(F.max("dist"), 4).alias("max_dist")))


# ---------------------------------------------------------------------------
# q_funnel_windowed — conversion within a bounded horizon
# ---------------------------------------------------------------------------

_FUNNEL_W_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
),
conv AS (
  SELECT v.user_id
  FROM v JOIN events e
    ON e.user_id = v.user_id
   AND e.event_type = 'purchase'
   AND e.ts > v.t_view
   AND e.ts <= v.t_view + INTERVAL 7 DAY
  GROUP BY 1
)
SELECT (SELECT cast(count(*) as bigint) FROM v) AS n_view,
       (SELECT cast(count(*) as bigint) FROM conv) AS n_converted_7d,
       round(cast((SELECT count(*) FROM conv) as double)
             / (SELECT count(*) FROM v), 6) AS cvr_7d
"""


@query("q_funnel_windowed", oracle=_FUNNEL_W_ORACLE)
def q_funnel_windowed(spark, sf_dir):
    """Time-bounded funnel: users whose first view converts to a
    purchase WITHIN 7 days — q_funnel counts eventual conversion at
    any horizon, which overstates attribution-relevant conversion;
    the bounded form is what experiments and cohort comparisons
    actually read (a conversion 6 months later is not the campaign's).

    Scale: first-view is one per-user aggregate; the horizon check is
    a user-keyed join against the survivor set with the interval
    predicate fused into the join filter — never event x event."""
    e = load_table(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    conv = (e.filter(F.col("event_type") == "purchase")
            .join(v, "user_id")
            .filter((F.col("ts") > F.col("t_view"))
                    & (F.col("ts") <= F.col("t_view")
                       + F.expr("INTERVAL 7 DAY")))
            .select("user_id").distinct())
    return (v.agg(F.count("*").alias("n_view"))
            .crossJoin(conv.agg(F.count("*").alias("n_converted_7d")))
            .select("n_view", "n_converted_7d",
                    F.round(F.col("n_converted_7d").cast("double")
                            / F.col("n_view"), 6).alias("cvr_7d")))


# ---------------------------------------------------------------------------
# q_lagged_crosscorr — lead-lag cross-correlation between two series
# ---------------------------------------------------------------------------

_XCORR_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d,
         cast(count(CASE WHEN event_type = 'click' THEN 1 END)
              as bigint) AS x,
         cast(count(CASE WHEN event_type = 'purchase' THEN 1 END)
              as bigint) AS y
  FROM events GROUP BY 1
),
pairs AS (
  SELECT gs.l AS lag, a.x, b.y
  FROM range(-3, 4) gs(l)
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + to_days(cast(gs.l as int))
),
s AS (
  SELECT lag, count(*) AS n,
         cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
         cast(sum(x * x) as bigint) AS sxx,
         cast(sum(y * y) as bigint) AS syy,
         cast(sum(x * y) as bigint) AS sxy
  FROM pairs GROUP BY 1
)
SELECT lag, n,
       round(cast(n * sxy - sx * sy as double)
             / sqrt(cast(n * sxx - sx * sx as double)
                    * cast(n * syy - sy * sy as double)), 6) + 0.0 AS xcorr
FROM s
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY lag
"""


@query("q_lagged_crosscorr", oracle=_XCORR_ORACLE)
def q_lagged_crosscorr(spark, sf_dir):
    """Lead-lag cross-correlation between the click and purchase daily
    series at lags -3..+3 (corr of x_t against y_{t+lag}): the
    which-leads-which diagnostic behind campaign-to-conversion delay
    estimation — the cross-series member of the family that q_acf
    (self), q_rolling_corr (contemporaneous windowed), and
    q_ols_regression (trend) already cover. Pearson per lag from
    exact integer sums over the aligned overlap; alignment is a
    date-shift equi-join (window offsets must be constants on both
    engines; the join realizes the variable offset and calendar gaps
    drop out naturally).

    Scale: everything after the daily rollup is |lags| x |days| rows;
    per-entity versions partition the same windows by the entity
    key."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.count(F.when(F.col("event_type") == "click", 1))
                  .alias("x"),
                  F.count(F.when(F.col("event_type") == "purchase", 1))
                  .alias("y")))
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    a = daily.select("d", "x")
    b = daily.select(F.col("d").alias("d2"), "y")
    # alignment by DATE SHIFT join (lag/lead offsets must be foldable
    # in both engines; a date-arithmetic equi-join realizes the
    # variable offset instead, and calendar gaps drop out naturally)
    pairs = (lags.crossJoin(a)
             .join(b, F.col("d2") == F.expr("date_add(d, lag)")))
    s = (pairs.groupBy("lag")
         .agg(F.count("*").alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("y") * F.col("y")).alias("syy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy")))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # zero-variance guard (round-5 advice): a constant series over a
    # lag's overlap makes dx or dy exactly 0 -> NaN / engine-divergent
    # division; filter like q_rolling_corr does.  `+ 0.0` normalizes a
    # possible -0.0 after round() (sign-of-zero hash hazard).
    return (s.filter((dx > 0) & (dy > 0))
            .select("lag", "n",
                    (F.round(num.cast("double")
                             / F.sqrt(dx.cast("double") * dy.cast("double")),
                             6) + F.lit(0.0)).alias("xcorr"))
            .orderBy("lag"))


# ---------------------------------------------------------------------------
# q_slo_burn_rate — error-budget burn-rate monitor
# ---------------------------------------------------------------------------

_SLO_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         cast(count(*) as bigint) AS n,
         cast(count(CASE WHEN event_type = 'error' THEN 1 END)
              as bigint) AS n_err
  FROM events GROUP BY 1
),
rolled AS (
  SELECT h, n, n_err,
         cast(sum(n) OVER w6 as bigint) AS n6,
         cast(sum(n_err) OVER w6 as bigint) AS e6
  FROM hourly
  WINDOW w6 AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT cast(h as varchar) AS hour, n, n_err,
       round(cast(n_err as double) / n, 6) AS rate,
       round(cast(e6 as double) / n6, 6) AS rate_6h,
       round(cast(e6 as double) / n6 / 0.25, 4) AS burn_6h,
       cast(e6 as double) / n6 > 0.25 AS breach
FROM rolled
ORDER BY hour
"""


@query("q_slo_burn_rate", oracle=_SLO_ORACLE)
def q_slo_burn_rate(spark, sf_dir):
    """SLO error-budget burn-rate monitoring (the SRE multiwindow
    alert shape): hourly error rate plus the 6-hour rolling rate,
    expressed as a burn multiple of a 25% error budget, with the
    breach flag — the ops-analytics readout an ingest pipeline runs
    over its own event stream (the multiwindow form suppresses
    single-hour blips while catching sustained burns). All rates are
    exact-integer ratios behind declared rounds; the breach compare
    uses the unrounded double identically on both engines.

    Scale: one map-side-combined hourly rollup; the rolling window
    runs over the |hours| relation. Per-service SLOs partition the
    same windows by the service key."""
    e = load_table(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count("*").alias("n"),
                   F.count(F.when(F.col("event_type") == "error", 1))
                   .alias("n_err")))
    w6 = W.orderBy("h").rowsBetween(-5, 0)
    rolled = hourly.select(
        "h", "n", "n_err",
        F.sum("n").over(w6).alias("n6"),
        F.sum("n_err").over(w6).alias("e6"))
    r6 = F.col("e6").cast("double") / F.col("n6")
    return (rolled.select(
        F.col("h").cast("string").alias("hour"), "n", "n_err",
        F.round(F.col("n_err").cast("double") / F.col("n"), 6)
        .alias("rate"),
        F.round(r6, 6).alias("rate_6h"),
        F.round(r6 / 0.25, 4).alias("burn_6h"),
        (r6 > 0.25).alias("breach"))
        .orderBy("hour"))


# ---------------------------------------------------------------------------
# q_dp_histogram — seeded-DP histogram release with clamping
# ---------------------------------------------------------------------------

_DPH_ORACLE = """
WITH bucketed AS (
  SELECT least(greatest(cast(floor(value / 50) as bigint), 0), 10)
           AS bucket
  FROM events
),
c AS (SELECT bucket, cast(count(*) as bigint) AS n
      FROM bucketed GROUP BY 1),
noised AS (
  SELECT bucket, n,
         (cast(('0x' || substr(md5('dph:' || cast(bucket as varchar)
                                    || ':s7'), 1, 12)) as bigint)
          % 999999 + 0.5) / 1000000.0 - 0.5 AS u
  FROM c
)
SELECT bucket,
       round(cast(n as double)
             - 1.0 * sign(u) * ln(1 - 2 * abs(u)), 4) + 0.0 AS noisy_count
FROM noised
ORDER BY bucket
"""


@query("q_dp_histogram", oracle=_DPH_ORACLE)
def q_dp_histogram(spark, sf_dir):
    """Differentially-private histogram release: values bucket at
    width 50 with CLAMPING to [0, 10] (clamping bounds the sensitivity
    — without it one outlier value creates an unbounded-domain bucket
    that leaks its presence), then per-bucket Laplace(1/eps) noise by
    the seeded inverse-CDF construction of q_dp_noisy_counts. A
    histogram is the canonical DP release (each row affects exactly
    one bucket, so buckets compose in parallel under one epsilon).

    Scale: one map-side-combined groupBy on an 11-value domain; noise
    is per-group codegen."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(F.greatest(F.floor(F.col("value") / 50)
                                .cast("bigint"), F.lit(0)), F.lit(10))
    c = (e.select(bucket.alias("bucket"))
         .groupBy("bucket").agg(F.count("*").alias("n")))
    u = ((F.conv(F.substring(F.md5(F.concat(
        F.lit("dph:"), F.col("bucket").cast("string"), F.lit(":s7"))),
        1, 12), 16, 10).cast("bigint") % 999999 + 0.5)
        / 1000000.0 - 0.5)
    noisy = F.round(F.col("n").cast("double")
                    - 1.0 * F.signum(u) * F.log(1 - 2 * F.abs(u)), 4)
    return (c.select("bucket", noisy.alias("noisy_count"))
            .orderBy("bucket"))


# ---------------------------------------------------------------------------
# q_crossval_ols — k-fold cross-validation via leave-one-fold-out
# sufficient statistics
# ---------------------------------------------------------------------------

_CV_Y = "value * 3.0 + (event_id % 7)"  # deterministic target


@query(
    "q_crossval_ols",
    oracle=f"""
    WITH pts AS (
      SELECT event_id % 5 AS fold, value AS x, {_CV_Y} AS y
      FROM events
    ),
    per_fold AS (
      SELECT fold, count(*) AS n,
             sum(cast(x as decimal(30,10))) AS sx,
             sum(cast(y as decimal(30,10))) AS sy,
             sum(cast(x * y as decimal(30,10))) AS sxy,
             sum(cast(x * x as decimal(30,10))) AS sxx
      FROM pts GROUP BY fold
    ),
    train AS (
      SELECT fold, n AS n_test,
             cast(sum(n) OVER () - n as double) AS tn,
             cast(sum(sx) OVER () - sx as double) AS tsx,
             cast(sum(sy) OVER () - sy as double) AS tsy,
             cast(sum(sxy) OVER () - sxy as double) AS tsxy,
             cast(sum(sxx) OVER () - sxx as double) AS tsxx
      FROM per_fold
    ),
    coefs AS (
      SELECT fold, n_test, cast(tn as bigint) AS n_train,
             (tn * tsxy - tsx * tsy) / (tn * tsxx - tsx * tsx)
               AS slope,
             (tsy - (tn * tsxy - tsx * tsy)
                    / (tn * tsxx - tsx * tsx) * tsx) / tn AS icept
      FROM train
    )
    SELECT p.fold, c.n_train, c.n_test,
           round(c.slope, 6) + 0.0 AS slope,
           round(c.icept, 6) + 0.0 AS intercept,
           cast((2 * sum(cast(cast((p.y - c.icept - c.slope * p.x)
                                    * (p.y - c.icept - c.slope * p.x)
                                    as decimal(27,10))
                               * 10000000000 as bigint))
                 + c.n_test * 10000)
                // (2 * c.n_test * 10000) as double) / 1e6 AS test_mse
    FROM pts p JOIN coefs c ON p.fold = c.fold
    GROUP BY p.fold, c.n_train, c.n_test, c.slope, c.icept
    ORDER BY p.fold
    """,
)
def q_crossval_ols(spark, sf_dir):
    """5-fold cross-validated linear regression in TWO passes over the
    data, never five: pass 1 aggregates per-fold sufficient statistics
    (n, Σx, Σy, Σxy, Σx² — decimal-exact), the leave-one-fold-out
    training sums are then just total − fold (a 5-row window, no
    re-scan), and pass 2 joins the broadcast per-fold coefficients back
    to score held-out MSE. This is how CV works at 100 TB: k-fold
    costs 2 scans + a k-row broadcast regardless of k.

    Hash discipline: sufficient statistics are exact decimal sums cast
    to double before the (deterministic IEEE) slope/intercept algebra;
    per-row residuals are doubles, their reduction decimal; rounding
    only at the edge with the sign-of-zero guard."""
    from .functions.hashsafe import DEC

    e = load_table(spark, sf_dir, "events")
    pts = e.select((F.col("event_id") % 5).alias("fold"),
                   F.col("value").alias("x"),
                   (F.col("value") * 3.0
                    + (F.col("event_id") % 7)).alias("y"))
    per_fold = (pts.groupBy("fold")
                .agg(F.count("*").alias("n"),
                     F.sum(F.col("x").cast(DEC)).alias("sx"),
                     F.sum(F.col("y").cast(DEC)).alias("sy"),
                     F.sum((F.col("x") * F.col("y")).cast(DEC))
                      .alias("sxy"),
                     F.sum((F.col("x") * F.col("x")).cast(DEC))
                      .alias("sxx")))
    w = W.partitionBy()
    train = per_fold.select(
        "fold", F.col("n").alias("n_test"),
        (F.sum("n").over(w) - F.col("n")).cast("double").alias("tn"),
        (F.sum("sx").over(w) - F.col("sx")).cast("double").alias("tsx"),
        (F.sum("sy").over(w) - F.col("sy")).cast("double").alias("tsy"),
        (F.sum("sxy").over(w) - F.col("sxy")).cast("double")
         .alias("tsxy"),
        (F.sum("sxx").over(w) - F.col("sxx")).cast("double")
         .alias("tsxx"))
    slope = ((F.col("tn") * F.col("tsxy") - F.col("tsx") * F.col("tsy"))
             / (F.col("tn") * F.col("tsxx") - F.col("tsx") * F.col("tsx")))
    coefs = train.select(
        "fold", "n_test", F.col("tn").cast("bigint").alias("n_train"),
        slope.alias("slope"),
        ((F.col("tsy") - slope * F.col("tsx")) / F.col("tn"))
         .alias("icept"))
    resid = F.col("y") - F.col("icept") - F.col("slope") * F.col("x")
    return (pts.join(F.broadcast(coefs), "fold")
            .groupBy("fold", "n_train", "n_test", "slope", "icept")
            .agg(F.expr(
                # exact integer 6dp mean of the 10dp-quantized squared
                # residuals (nonnegative, so no sign branch needed) —
                # VERDICT r9 item 3
                "cast((2 * sum(cast(cast((y - icept - slope * x)"
                " * (y - icept - slope * x) as decimal(27,10))"
                " * 10000000000 as decimal(30,0)))"
                " + first(n_test) * 10000)"
                " DIV (2 * first(n_test) * 10000) as double) / 1e6")
                 .alias("test_mse"))
            .select("fold", "n_train", "n_test",
                    (F.round("slope", 6) + 0.0).alias("slope"),
                    (F.round("icept", 6) + 0.0).alias("intercept"),
                    "test_mse")
            .orderBy("fold"))


# ---------------------------------------------------------------------------
# q_matryoshka_recall — truncated-dimension retrieval quality
# ---------------------------------------------------------------------------


def _matryoshka_oracle() -> str:
    from .operators.similarity import DEC_SIM
    def ranked(dims: int, alias: str) -> str:
        return f"""
    {alias} AS (
      SELECT probes.probe_id, n.vec_id,
             row_number() OVER (
               PARTITION BY probes.probe_id
               ORDER BY round(
                 cast(sum(cast(cast(n.embedding[gs.i] as double)
                               * cast(probes.pe[gs.i] as double)
                               as {DEC_SIM})) as double)
                 / sqrt(cast(sum(cast(cast(n.embedding[gs.i] as double)
                                      * cast(n.embedding[gs.i] as double)
                                      as {DEC_SIM})) as double)
                        * cast(sum(cast(cast(probes.pe[gs.i] as double)
                                        * cast(probes.pe[gs.i] as double)
                                        as {DEC_SIM})) as double)), 4)
                 DESC, n.vec_id) AS rk
      FROM embeddings n CROSS JOIN
           (SELECT vec_id AS probe_id, embedding AS pe
            FROM embeddings WHERE vec_id < 8) probes,
           range(1, {dims + 1}) gs(i)
      WHERE n.vec_id <> probes.probe_id
      GROUP BY probes.probe_id, n.vec_id, n.embedding, probes.pe
    )"""
    return f"""
    WITH {ranked(64, 'full_rank')}, {ranked(16, 'trunc_rank')}
    SELECT f.probe_id,
           cast(count(*) as bigint) AS n_overlap,
           round(count(*) / 10.0, 4) AS recall_at_10
    FROM full_rank f JOIN trunc_rank t
      ON f.probe_id = t.probe_id AND f.vec_id = t.vec_id
    WHERE f.rk <= 10 AND t.rk <= 10
    GROUP BY f.probe_id
    ORDER BY f.probe_id
    """


@query("q_matryoshka_recall", oracle=_matryoshka_oracle())
def q_matryoshka_recall(spark, sf_dir):
    """Matryoshka-truncation retrieval eval (Kusupati et al., MRL):
    rank the corpus for 8 probes by cosine over the FULL 64 dims and
    again over only the FIRST 16 dims, then report per-probe
    recall@10 of the truncated ranking against the full one — the
    measurement that decides whether a pipeline can serve the cheap
    prefix embedding and re-rank with the full vector. Both rankings
    use the decimal-exact 4dp cosine + vec_id tie-break, so overlap
    counts are engine-identical.

    Scale: two broadcast-probe corpus scans (the q_similarity_batch
    shape; the 16-dim pass reads the same column but folds a quarter
    of the elements) and a candidate-sized join — recall evaluation
    never goes corpus-quadratic. In production the truncated ranking
    IS the ANN tier (16-dim IVF/PQ index), and this query is its
    offline quality gate."""
    from .operators.similarity import DEC_SIM, dot_col
    from .queries_llm import _norm

    e = load_table(spark, sf_dir, "embeddings")

    def ranked(dims: int, rk_name: str):
        emb = (F.col("embedding") if dims == 64
               else F.slice(F.col("embedding"), 1, dims))
        n = e.select("vec_id", emb.alias("v"))
        probes = (n.filter(F.col("vec_id") < 8)
                  .select(F.col("vec_id").alias("probe_id"),
                          F.col("v").alias("pe")))
        scored = (n.crossJoin(F.broadcast(probes))
                  .filter(F.col("vec_id") != F.col("probe_id"))
                  .select("probe_id", "vec_id",
                          F.round(dot_col(F.col("v"), F.col("pe"))
                                  / F.sqrt(dot_col(F.col("v"), F.col("v"))
                                           * dot_col(F.col("pe"),
                                                     F.col("pe"))), 4)
                          .alias("cos")))
        return scored.select(
            "probe_id", "vec_id",
            F.row_number().over(
                W.partitionBy("probe_id")
                 .orderBy(F.desc("cos"), "vec_id")).alias(rk_name))

    full = ranked(64, "rk_full").filter(F.col("rk_full") <= 10)
    trunc = ranked(16, "rk_trunc").filter(F.col("rk_trunc") <= 10)
    return (full.join(trunc, ["probe_id", "vec_id"])
            .groupBy("probe_id")
            .agg(F.count("*").alias("n_overlap"),
                 F.round(F.count("*") / 10.0, 4).alias("recall_at_10"))
            .orderBy("probe_id"))


# ---------------------------------------------------------------------------
# q_offpolicy_ips — inverse-propensity off-policy evaluation
# ---------------------------------------------------------------------------

# Logged bandit synthesis, all integer-derived: 3 arms; the logging
# policy is a known epsilon-ish distribution over arms conditioned on
# a context bucket, the target policy is deterministic argmax on the
# context, reward is a deterministic integer function of (context,
# arm). Propensities are k/10 — exact decimal, identical doubles.
_IPS_CTX = "event_id % 4"
_IPS_ARM = "(event_id * 2654435761) % 10"   # 0-9 drives the logged arm
_IPS_SYNTH = f"""
      SELECT {_IPS_CTX} AS ctx,
             CASE WHEN {_IPS_ARM} < 6 THEN ({_IPS_CTX}) % 3
                  WHEN {_IPS_ARM} < 8 THEN (({_IPS_CTX}) + 1) % 3
                  ELSE (({_IPS_CTX}) + 2) % 3 END AS logged_arm,
             CASE WHEN {_IPS_ARM} < 6 THEN 0.6
                  WHEN {_IPS_ARM} < 8 THEN 0.2
                  ELSE 0.2 END AS propensity,
             CASE WHEN {_IPS_ARM} < 6 THEN 1
                  WHEN {_IPS_ARM} < 8 THEN 0 ELSE 0 END
               AS logged_is_argmax
      FROM events
"""


@query(
    "q_offpolicy_ips",
    oracle=f"""
    WITH logs AS ({_IPS_SYNTH}),
    rewarded AS (
      SELECT ctx, logged_arm, propensity,
             CASE WHEN logged_arm = ctx % 3 THEN 2 ELSE 1 END AS reward,
             CASE WHEN logged_arm = ctx % 3 THEN 1.0 / propensity
                  ELSE 0.0 END AS w
      FROM logs
    )
    SELECT ctx, count(*) AS n,
           cast(sum(reward) as bigint) AS logged_reward,
           {sql_davg('w * reward', 'ips_value', nd=6, gdp=10)},
           {sql_davg('least(w, 3.0) * reward', 'clipped_ips', nd=6, gdp=10)}
    FROM rewarded GROUP BY ctx ORDER BY ctx
    """,
)
def q_offpolicy_ips(spark, sf_dir):
    """Off-policy evaluation by inverse propensity scoring: logged
    bandit rounds (context, arm, propensity, reward — synthesized
    integer-deterministically, propensities exact tenths) are
    re-weighted by 1/propensity wherever the logged arm matches the
    TARGET policy's deterministic choice, estimating the target's
    expected reward without deploying it; the 3.0-clipped variant is
    the variance-bounded estimator production uses. Per-context
    output: rounds, logged reward, IPS and clipped-IPS value — the
    counterfactual-eval primitive behind every 'would the new ranking
    model have done better on last month's logs' question.

    Scale: one scan, one keyed aggregation — both estimators are
    plain weighted sums with decimal-exact reductions (weights are
    exact binary doubles: 1/0.6 and 1/0.2 are computed by one IEEE
    division on both engines)."""
    e = load_table(spark, sf_dir, "events")
    arm = (F.col("event_id") * 2654435761) % 10
    ctx = (F.col("event_id") % 4).alias("ctx")
    logs = e.select(
        ctx,
        F.when(arm < 6, F.col("event_id") % 4 % 3)
         .when(arm < 8, (F.col("event_id") % 4 + 1) % 3)
         .otherwise((F.col("event_id") % 4 + 2) % 3).alias("logged_arm"),
        F.when(arm < 6, 0.6).when(arm < 8, 0.2).otherwise(0.2)
         .alias("propensity"))
    target = F.col("ctx") % 3
    rewarded = logs.select(
        "ctx", "logged_arm", "propensity",
        F.when(F.col("logged_arm") == target, 2).otherwise(1)
         .alias("reward"),
        F.when(F.col("logged_arm") == target,
               F.lit(1.0) / F.col("propensity"))
         .otherwise(0.0).alias("w"))
    # exact integer 6dp means over the 10dp-quantized weighted rewards
    # (VERDICT r9 item 3): the decimal(30,10) sum / count quotient can
    # sit on a 6dp half boundary (S = odd*5000*C)
    wr = rewarded.withColumn(
        "wr", F.col("w") * F.col("reward")).withColumn(
        "cwr", F.least(F.col("w"), F.lit(3.0)) * F.col("reward"))
    return (wr.groupBy("ctx")
            .agg(F.count("*").alias("n"),
                 F.sum("reward").alias("logged_reward"),
                 davg("wr", "ips_value", nd=6, gdp=10),
                 davg("cwr", "clipped_ips", nd=6, gdp=10))
            .orderBy("ctx"))


# ---------------------------------------------------------------------------
# q_diff_in_diff — two-period, two-group causal estimate
# ---------------------------------------------------------------------------

_DID_TREAT = "user_id % 2 = 0"          # stable unit assignment
_DID_POST = "cast(ts as date) >= DATE '2024-01-16'"
# treatment effect is injected post-period for the treated group only:
# lift = +5 on the value metric, deterministic
_DID_Y = (f"value + CASE WHEN ({_DID_TREAT}) AND ({_DID_POST}) "
          f"THEN 5.0 ELSE 0.0 END")


@query(
    "q_diff_in_diff",
    oracle=f"""
    WITH obs AS (
      SELECT CASE WHEN {_DID_TREAT} THEN 1 ELSE 0 END AS treated,
             CASE WHEN {_DID_POST} THEN 1 ELSE 0 END AS post,
             {_DID_Y} AS y
      FROM events
    ),
    cells AS (
      SELECT treated, post, count(*) AS n,
             cast(sum(cast(y as decimal(30,10))) as double) / count(*)
               AS mean_y
      FROM obs GROUP BY treated, post
    )
    SELECT treated, post, n, round(mean_y, 6) AS mean_y,
           round((max(CASE WHEN treated = 1 AND post = 1
                           THEN mean_y END) OVER ()
                  - max(CASE WHEN treated = 1 AND post = 0
                             THEN mean_y END) OVER ())
                 - (max(CASE WHEN treated = 0 AND post = 1
                             THEN mean_y END) OVER ()
                    - max(CASE WHEN treated = 0 AND post = 0
                               THEN mean_y END) OVER ()), 6) + 0.0
             AS did_estimate
    FROM cells ORDER BY treated, post
    """,
)
def q_diff_in_diff(spark, sf_dir):
    """Difference-in-differences: the 2x2 (treated x post) cell means
    of a metric with a KNOWN injected post-treatment lift (+5.0 on
    the treated group after Jan 16 — integer-deterministic
    assignment), and the DiD estimate ΔΔ = (T,post − T,pre) −
    (C,post − C,pre), which must recover ~5.0 net of sampling noise
    (test-pinned). The four-cell window algebra mirrors exactly on
    both engines from decimal-exact cell means.

    Scale: one scan, one 4-group aggregation, a 4-row window — the
    experimentation readout costs one pass no matter the log volume;
    unit-level clustering of errors (the real-world refinement) rides
    the same sufficient statistics plus a per-unit pre-aggregation."""
    e = load_table(spark, sf_dir, "events")
    treated = F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)
    post = F.when(F.col("ts").cast("date")
                  >= F.lit("2024-01-16").cast("date"), 1).otherwise(0)
    y = (F.col("value")
         + F.when((F.col("user_id") % 2 == 0)
                  & (F.col("ts").cast("date")
                     >= F.lit("2024-01-16").cast("date")), 5.0)
            .otherwise(0.0))
    obs = e.select(treated.alias("treated"), post.alias("post"),
                   y.alias("y"))
    cells = (obs.groupBy("treated", "post")
             .agg(F.count("*").alias("n"),
                  (F.sum(F.col("y").cast("decimal(30,10)"))
                   .cast("double") / F.count("*")).alias("mean_y")))
    w = W.partitionBy()

    def cell(t, p):
        return F.max(F.when((F.col("treated") == t)
                            & (F.col("post") == p),
                            F.col("mean_y"))).over(w)

    did = (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0))
    return (cells.select("treated", "post", "n",
                         F.round("mean_y", 6).alias("mean_y"),
                         (F.round(did, 6) + 0.0).alias("did_estimate"))
            .orderBy("treated", "post"))


# ---------------------------------------------------------------------------
# q_uplift_qini — decile uplift (Qini-style) curve
# ---------------------------------------------------------------------------


@query(
    "q_uplift_qini",
    oracle="""
    WITH scored AS (
      SELECT event_id % 100 AS score,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CASE WHEN (event_id * 7919) % 100
                       < (event_id % 100) // 2
                       + CASE WHEN user_id % 2 = 0
                              THEN (event_id % 100) // 4 ELSE 0 END
                  THEN 1 ELSE 0 END AS converted
      FROM events
    ),
    deciles AS (
      SELECT 9 - (score // 10) AS decile, treated, converted
      FROM scored
    ),
    agg AS (
      SELECT decile,
             sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS n_t,
             sum(CASE WHEN treated = 1 AND converted = 1
                      THEN 1 ELSE 0 END) AS c_t,
             sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS n_c,
             sum(CASE WHEN treated = 0 AND converted = 1
                      THEN 1 ELSE 0 END) AS c_c
      FROM deciles GROUP BY decile
    )
    SELECT decile,
           cast(n_t as bigint) AS n_t, cast(c_t as bigint) AS c_t,
           cast(n_c as bigint) AS n_c, cast(c_c as bigint) AS c_c,
           round(cast(c_t as double) / n_t
                 - cast(c_c as double) / n_c, 6) + 0.0 AS uplift,
           round(cast(sum(c_t) OVER (ORDER BY decile) as double)
                 - cast(sum(c_c) OVER (ORDER BY decile) as double)
                   * sum(n_t) OVER (ORDER BY decile)
                   / sum(n_c) OVER (ORDER BY decile), 6) + 0.0
             AS qini
    FROM agg ORDER BY decile
    """,
)
def q_uplift_qini(spark, sf_dir):
    """Uplift-model evaluation: units are ranked by a model score into
    deciles (decile 0 = highest score), and each decile reports the
    incremental conversion rate (treated minus control) plus the
    cumulative Qini statistic — treated conversions minus
    control conversions scaled to the treated volume. The synthetic
    response has genuine heterogeneous uplift concentrated at high
    scores (integer construction), so the curve is decreasing in
    decile and the Qini accumulates early (both test-pinned) — the
    shape a real uplift model evaluation must detect.

    Scale: one scan into a 10 x 2 x 2 contingency aggregation, then
    10-row window math — model evaluation over any log volume is one
    pass; all emitted floats derive from integer counts by identical
    single IEEE ops."""
    e = load_table(spark, sf_dir, "events")
    score = F.col("event_id") % 100
    treated = F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)
    conv_thresh = (score / F.lit(2)).cast("bigint") + \
        F.when(F.col("user_id") % 2 == 0,
               (score / F.lit(4)).cast("bigint")).otherwise(0)
    converted = F.when((F.col("event_id") * 7919) % 100
                       < conv_thresh, 1).otherwise(0)
    deciles = e.select(
        (9 - (score / F.lit(10)).cast("bigint")).alias("decile"),
        treated.alias("treated"), converted.alias("converted"))
    agg = (deciles.groupBy("decile")
           .agg(F.sum(F.when(F.col("treated") == 1, 1).otherwise(0))
                .alias("n_t"),
                F.sum(F.when((F.col("treated") == 1)
                             & (F.col("converted") == 1), 1)
                      .otherwise(0)).alias("c_t"),
                F.sum(F.when(F.col("treated") == 0, 1).otherwise(0))
                .alias("n_c"),
                F.sum(F.when((F.col("treated") == 0)
                             & (F.col("converted") == 1), 1)
                      .otherwise(0)).alias("c_c")))
    wc = W.orderBy("decile")
    uplift = (F.col("c_t").cast("double") / F.col("n_t")
              - F.col("c_c").cast("double") / F.col("n_c"))
    qini = (F.sum("c_t").over(wc).cast("double")
            - F.sum("c_c").over(wc).cast("double")
              * F.sum("n_t").over(wc) / F.sum("n_c").over(wc))
    return (agg.select("decile", "n_t", "c_t", "n_c", "c_c",
                       (F.round(uplift, 6) + 0.0).alias("uplift"),
                       (F.round(qini, 6) + 0.0).alias("qini"))
            .orderBy("decile"))


# ---------------------------------------------------------------------------
# q_propensity_match — stratified (subclassification) causal ATT
# ---------------------------------------------------------------------------

# Deterministic confounded world on the user panel: the confounder is
# pre-period activity n_pre; treatment propensity RISES with it
# ((uid*7919) % 60 < n_pre - 10), and the outcome also rises with it
# (+0.5 * n_pre) on top of a true +5.0 treatment effect — so the naive
# treated-vs-control difference is biased upward and only the
# within-stratum comparison recovers ~5.
_PSM_PRE = "cast(ts as date) < DATE '2024-01-16'"


@query(
    "q_propensity_match",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             sum(CASE WHEN {_PSM_PRE} THEN 1 ELSE 0 END) AS n_pre,
             count(*) FILTER (NOT ({_PSM_PRE})) AS n_post,
             cast(sum(cast(value as decimal(30,10)))
                    FILTER (NOT ({_PSM_PRE})) as double)
               / nullif(count(*) FILTER (NOT ({_PSM_PRE})), 0) AS base_y
      FROM events GROUP BY user_id
    ),
    panel AS (
      SELECT user_id, n_pre,
             CASE WHEN (user_id * 7919) % 60 < n_pre - 10
                  THEN 1 ELSE 0 END AS treated,
             round(base_y + 0.5 * n_pre
                   + CASE WHEN (user_id * 7919) % 60 < n_pre - 10
                          THEN 5.0 ELSE 0.0 END, 6) AS y
      FROM users WHERE n_post > 0
    ),
    naive AS (
      SELECT cast(sum(cast(y as decimal(14,6))) FILTER (treated = 1)
                  as double) / sum(treated)
             - cast(sum(cast(y as decimal(14,6))) FILTER (treated = 0)
                    as double) / sum(1 - treated) AS naive_diff,
             count(*) AS n_users, sum(treated) AS n_treated
      FROM panel
    ),
    strata AS (
      SELECT n_pre,
             sum(treated) AS nt, sum(1 - treated) AS nc,
             cast(sum(cast(y as decimal(14,6))) FILTER (treated = 1)
                  as double) / nullif(sum(treated), 0) AS yt,
             cast(sum(cast(y as decimal(14,6))) FILTER (treated = 0)
                  as double) / nullif(sum(1 - treated), 0) AS yc
      FROM panel GROUP BY n_pre
    ),
    matched AS (
      SELECT cast(sum(cast(round(nt * (yt - yc), 8) as decimal(24,8)))
                  as double)
               / sum(nt) AS att,
             count(*) AS n_strata, cast(sum(nt) as bigint) AS nt_matched
      FROM strata WHERE nt > 0 AND nc > 0
    )
    SELECT cast(n_users as bigint) AS n_users,
           cast(n_treated as bigint) AS n_treated,
           cast(n_strata as bigint) AS n_strata_matched,
           nt_matched AS n_treated_matched,
           round(naive_diff, 6) + 0.0 AS naive_diff,
           round(att, 6) + 0.0 AS att_stratified
    FROM naive CROSS JOIN matched
    """,
)
def q_propensity_match(spark, sf_dir):
    """Propensity-stratified causal effect (Cochran subclassification,
    the matching estimator that actually scales): users stratify on
    the integer confounder (pre-period activity), ATT = the
    treated-weighted mean of within-stratum outcome differences over
    common-support strata. A deterministic confounded world is
    synthesized on the user panel — treatment probability AND outcome
    both rise with the confounder — so naive_diff must overstate the
    true +5.0 effect while att_stratified recovers it (test-pinned);
    the pair completes the causal family (q_diff_in_diff uses time,
    q_uplift_qini uses scores, this uses cross-sectional matching).

    Stratum means are decimal-exact; per-stratum terms round 8dp into
    decimals before the cross-strata sum (order-independent), and both
    final estimates carry the `+ 0.0` sign-of-zero guard.

    Scale: one event scan -> per-user aggregate -> per-stratum
    aggregate (integer key, bounded cardinality) -> scalar reduce;
    nearest-neighbor matching's quadratic search is exactly what this
    estimator avoids — at 100 TB, exact integer strata (or quantized
    propensity bins) keep the match a group-by."""
    e = load_table(spark, sf_dir, "events")
    pre = F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")
    users = (e.groupBy("user_id")
             .agg(F.sum(F.when(pre, 1).otherwise(0)).alias("n_pre"),
                  F.sum(F.when(~pre, 1).otherwise(0)).alias("n_post"),
                  (F.sum(F.when(~pre, F.col("value").cast("decimal(30,10)")))
                   .cast("double")
                   / F.nullif(F.sum(F.when(~pre, 1).otherwise(0)),
                              F.lit(0))).alias("base_y")))
    treated = F.when((F.col("user_id") * 7919) % 60
                     < F.col("n_pre") - 10, 1).otherwise(0)
    panel = (users.filter(F.col("n_post") > 0)
             .select("user_id", "n_pre", treated.alias("treated"),
                     F.round(F.col("base_y") + 0.5 * F.col("n_pre")
                             + F.when(treated == 1, 5.0).otherwise(0.0), 6)
                     .alias("y")))
    ydec = F.col("y").cast("decimal(14,6)")
    naive = panel.agg(
        (F.sum(F.when(F.col("treated") == 1, ydec)).cast("double")
         / F.sum("treated")
         - F.sum(F.when(F.col("treated") == 0, ydec)).cast("double")
         / F.sum(1 - F.col("treated"))).alias("naive_diff"),
        F.count("*").alias("n_users"),
        F.sum("treated").alias("n_treated"))
    strata = (panel.groupBy("n_pre")
              .agg(F.sum("treated").alias("nt"),
                   F.sum(1 - F.col("treated")).alias("nc"),
                   (F.sum(F.when(F.col("treated") == 1, ydec))
                    .cast("double")
                    / F.nullif(F.sum("treated"), F.lit(0))).alias("yt"),
                   (F.sum(F.when(F.col("treated") == 0, ydec))
                    .cast("double")
                    / F.nullif(F.sum(1 - F.col("treated")), F.lit(0)))
                   .alias("yc")))
    matched = (strata.filter((F.col("nt") > 0) & (F.col("nc") > 0))
               .agg((F.sum(F.round(F.col("nt") * (F.col("yt")
                                                  - F.col("yc")), 8)
                           .cast("decimal(24,8)")).cast("double")
                     / F.sum("nt")).alias("att"),
                    F.count("*").alias("n_strata"),
                    F.sum("nt").cast("long").alias("nt_matched")))
    return (naive.crossJoin(matched)
            .select(F.col("n_users").cast("long").alias("n_users"),
                    F.col("n_treated").cast("long").alias("n_treated"),
                    F.col("n_strata").cast("long")
                    .alias("n_strata_matched"),
                    F.col("nt_matched").alias("n_treated_matched"),
                    (F.round("naive_diff", 6) + 0.0).alias("naive_diff"),
                    (F.round("att", 6) + 0.0).alias("att_stratified")))


# ---------------------------------------------------------------------------
# q_mrr — mean reciprocal rank over a probe panel
# ---------------------------------------------------------------------------


def _mrr_oracle() -> str:
    from .operators.similarity import DEC_SIM as DEC
    from .queries_llm import _NORMS_CTE
    return f"""
    WITH {_NORMS_CTE},
    probes AS (
      SELECT vec_id AS pv, embedding AS pe, label AS pl, nrm AS pn
      FROM norms WHERE vec_id < 10
    ),
    cands AS (
      SELECT p.pv, n.vec_id,
             CASE WHEN n.label = p.pl THEN 1 ELSE 0 END AS rel,
             cast(sum(cast(cast(n.embedding[gs.i] as double)
                           * cast(p.pe[gs.i] as double) as {DEC}))
                  as double) / sqrt(max(n.nrm) * max(p.pn)) AS cos
      FROM norms n JOIN probes p ON n.vec_id != p.pv,
           range(1, 65) gs(i)
      GROUP BY p.pv, n.vec_id, n.label, p.pl
    ),
    ranked AS (
      SELECT pv, rel,
             row_number() OVER (PARTITION BY pv
                                ORDER BY cos DESC, vec_id) AS i
      FROM cands
    ),
    firsts AS (
      SELECT pv, cast(min(CASE WHEN rel = 1 THEN i END) as bigint)
               AS first_rel_rank
      FROM ranked GROUP BY pv
    )
    SELECT pv AS probe_vec,
           first_rel_rank,
           round(1.0 / first_rel_rank, 6) AS rr,
           round(cast(sum(cast(round(1.0 / first_rel_rank, 6)
                               as decimal(10,6))) OVER () as double)
                 / count(*) OVER (), 6) AS mrr
    FROM firsts
    ORDER BY probe_vec
    """


@query("q_mrr", oracle=_mrr_oracle())
def q_mrr(spark, sf_dir):
    """Mean reciprocal rank over a 10-probe panel: for each probe
    (vec_id < 10) rank the whole corpus by exact cosine and find the
    first same-label hit; RR = 1/rank, MRR = panel mean — the
    first-relevant-result metric that complements q_ndcg (order
    quality over the top-k) and q_matryoshka_recall (set recall).
    Per-probe RR is 6dp-rounded into decimals before the panel mean,
    so the aggregate is order-independent; ranks tie-break on vec_id.

    Scale: probe panel broadcasts against the corpus (the
    q_similarity_batch shape); per-probe ranking is one window on the
    probe partition; the panel mean is a 10-row window. Corpus size
    scales the cosine pass linearly, never quadratically."""
    from .operators.similarity import dot_col
    from .queries_llm import _norm

    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    probes = (n.filter(F.col("vec_id") < 10)
              .select(F.col("vec_id").alias("pv"),
                      F.col("embedding").alias("pe"),
                      F.col("label").alias("pl"),
                      F.col("nrm").alias("pn")))
    cos = (dot_col(F.col("embedding"), F.col("pe"))
           / F.sqrt(F.col("nrm") * F.col("pn")))
    cands = (n.join(F.broadcast(probes), F.col("vec_id") != F.col("pv"))
             .select("pv", "vec_id",
                     F.when(F.col("label") == F.col("pl"), 1).otherwise(0)
                     .alias("rel"),
                     cos.alias("cos")))
    i = F.row_number().over(
        W.partitionBy("pv").orderBy(F.desc("cos"), "vec_id"))
    firsts = (cands.withColumn("i", i)
              .groupBy("pv")
              .agg(F.min(F.when(F.col("rel") == 1, F.col("i")))
                   .cast("long").alias("first_rel_rank")))
    rr = F.round(1.0 / F.col("first_rel_rank"), 6)
    w = W.partitionBy()
    return (firsts.select(
        F.col("pv").alias("probe_vec"), "first_rel_rank",
        rr.alias("rr"),
        F.round(F.sum(rr.cast("decimal(10,6)")).over(w).cast("double")
                / F.count("*").over(w), 6).alias("mrr"))
        .orderBy("probe_vec"))


# ---------------------------------------------------------------------------
# q_iv_wald — instrumental-variable (Wald) causal estimate
# ---------------------------------------------------------------------------

# Deterministic confounded world on the user panel (q_propensity_match
# discipline): instrument z = md5(uid) low-byte parity — genuinely
# as-if random w.r.t. every fixture column, unlike uid%2, which IS the
# DiD treatment axis and correlates with activity; exposure x
# rises with BOTH z (+2.0 — the first stage) and the confounder n_pre
# (+0.1/unit); the outcome gains the true effect 3.0 per unit of x
# PLUS 0.5 per unit of confounder — so the naive y-on-x slope is
# biased and only the Wald ratio (y-diff over x-diff across
# instrument arms) recovers ~3.


@query(
    "q_iv_wald",
    oracle="""
    WITH users AS (
      SELECT user_id,
             count(*) AS n_pre,
             cast(sum(cast(value as decimal(30,10))) as double)
               / count(*) AS base_y
      FROM events GROUP BY user_id
    ),
    panel AS (
      SELECT user_id,
             cast(('0x' || substr(md5(cast(user_id as varchar)), 1, 2))
                  as bigint) % 2 AS z,
             round(2.0 * (cast(('0x' || substr(md5(cast(user_id as varchar)),
                                               1, 2)) as bigint) % 2)
                   + 0.1 * n_pre
                   + ((user_id * 7919) % 10) / 10.0, 6) AS x,
             n_pre, base_y
      FROM users
    ),
    py AS (
      SELECT user_id, z, x,
             round(3.0 * x + 0.5 * n_pre + base_y, 6) AS y
      FROM panel
    ),
    arms AS (
      SELECT z, count(*) AS n,
             cast(sum(cast(x as decimal(16,6))) as double) / count(*)
               AS mx,
             cast(sum(cast(y as decimal(16,6))) as double) / count(*)
               AS my
      FROM py GROUP BY z
    ),
    wald AS (
      SELECT
        (SELECT n FROM arms WHERE z = 1) AS n_z1,
        (SELECT n FROM arms WHERE z = 0) AS n_z0,
        (SELECT my FROM arms WHERE z = 1)
          - (SELECT my FROM arms WHERE z = 0) AS dy,
        (SELECT mx FROM arms WHERE z = 1)
          - (SELECT mx FROM arms WHERE z = 0) AS dx
      FROM (SELECT 1)
    )
    SELECT cast(n_z1 as bigint) AS n_z1, cast(n_z0 as bigint) AS n_z0,
           round(dx, 6) + 0.0 AS first_stage_dx,
           round(dy, 6) + 0.0 AS reduced_form_dy,
           round(dy / dx, 6) + 0.0 AS iv_wald_effect
    FROM wald
    """,
)
def q_iv_wald(spark, sf_dir):
    """Instrumental-variable causal effect, Wald form: with a binary
    as-if-random instrument, effect = (mean outcome difference across
    instrument arms) / (mean exposure difference across arms) — the
    two-group special case of 2SLS, and the estimator to reach for
    when treatment itself is confounded (here the exposure loads on
    the same pre-activity confounder that drives the outcome, so the
    naive slope is biased upward while Wald recovers the true +3.0;
    test-pinned). Completes the causal kit: time (DiD), matching
    (propensity strata), scores (Qini), logs (IPS), and now
    instruments. Arm means are decimal-exact; the three readouts are
    rounded, sign-of-zero-guarded doubles.

    Scale: one fact-table groupBy to the user panel, one 2-group
    aggregate, a 2-row reduce — instrument analysis costs one pass no
    matter the log volume."""
    e = load_table(spark, sf_dir, "events")
    users = (e.groupBy("user_id")
             .agg(F.count("*").alias("n_pre"),
                  (F.sum(F.col("value").cast("decimal(30,10)"))
                   .cast("double") / F.count("*")).alias("base_y")))
    z = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                            1, 2), 16, 10).cast("long") % 2)
    x = F.round(2.0 * z + 0.1 * F.col("n_pre")
                + ((F.col("user_id") * 7919) % 10) / 10.0, 6)
    panel = users.select("user_id", z.alias("z"), x.alias("x"), "n_pre",
                         "base_y")
    y = F.round(3.0 * F.col("x") + 0.5 * F.col("n_pre")
                + F.col("base_y"), 6)
    py = panel.select("z", "x", y.alias("y"))
    arms = (py.groupBy("z")
            .agg(F.count("*").alias("n"),
                 (F.sum(F.col("x").cast("decimal(16,6)")).cast("double")
                  / F.count("*")).alias("mx"),
                 (F.sum(F.col("y").cast("decimal(16,6)")).cast("double")
                  / F.count("*")).alias("my")))
    a1 = arms.filter(F.col("z") == 1).select(
        F.col("n").alias("n_z1"), F.col("mx").alias("mx1"),
        F.col("my").alias("my1"))
    a0 = arms.filter(F.col("z") == 0).select(
        F.col("n").alias("n_z0"), F.col("mx").alias("mx0"),
        F.col("my").alias("my0"))
    return (a1.crossJoin(a0)
            .select(F.col("n_z1").cast("long").alias("n_z1"),
                    F.col("n_z0").cast("long").alias("n_z0"),
                    (F.round(F.col("mx1") - F.col("mx0"), 6) + 0.0)
                    .alias("first_stage_dx"),
                    (F.round(F.col("my1") - F.col("my0"), 6) + 0.0)
                    .alias("reduced_form_dy"),
                    (F.round((F.col("my1") - F.col("my0"))
                             / (F.col("mx1") - F.col("mx0")), 6) + 0.0)
                    .alias("iv_wald_effect")))


# ---------------------------------------------------------------------------
# q_regression_discontinuity — local-linear RDD estimator at a cutoff
# ---------------------------------------------------------------------------

# Running variable: event_id % 100 (0..99 at every scale — user_id
# only spans 0..14 at sf0.001); cutoff 50, bandwidth 20. Outcome
# carries a smooth slope (0.05 * x) plus a KNOWN +6.0 jump at the
# cutoff, injected deterministically on top of the value metric so
# the estimator has ground truth to recover (test-pinned).
_RDD_X = "event_id % 100"
_RDD_Y = (f"0.1 * value + 0.05 * ({_RDD_X}) + "
          f"CASE WHEN ({_RDD_X}) >= 50 THEN 6.0 ELSE 0.0 END")


@query(
    "q_regression_discontinuity",
    oracle=f"""
    WITH obs AS (
      SELECT ({_RDD_X}) - 50 AS x, {_RDD_Y} AS y,
             CASE WHEN ({_RDD_X}) >= 50 THEN 1 ELSE 0 END AS side
      FROM events
      WHERE ({_RDD_X}) >= 30 AND ({_RDD_X}) < 70
    ),
    fits AS (
      SELECT side, count(*) AS n,
             cast(sum(x) as double) AS sx,
             cast(sum(x * x) as double) AS sxx,
             cast(sum(cast(y as decimal(30,10))) as double) AS sy,
             cast(sum(cast(x * y as decimal(30,10))) as double) AS sxy
      FROM obs GROUP BY side
    ),
    coefs AS (
      SELECT side, n,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS intercept
      FROM fits
    )
    SELECT side, n,
           round(slope, 6) + 0.0 AS slope,
           round(intercept, 6) + 0.0 AS intercept_at_cutoff,
           round(max(CASE WHEN side = 1 THEN intercept END) OVER ()
                 - max(CASE WHEN side = 0 THEN intercept END) OVER (),
                 6) + 0.0 AS rdd_effect
    FROM coefs ORDER BY side
    """,
)
def q_regression_discontinuity(spark, sf_dir):
    """Sharp regression-discontinuity estimate: units within a
    +/-20 bandwidth of the cutoff (running variable = event_id %% 100,
    cutoff 50) get separate local-linear fits on each side, and the
    causal effect is the gap between the two intercepts AT the
    cutoff — which must recover the +6.0 jump injected on the
    outcome (net of slope, test-pinned). Both OLS fits are
    closed-form from decimal-exact sufficient statistics (Sx, Sxx
    integer; Sy, Sxy exact decimal sums), so slope/intercept algebra
    runs on identical doubles in both engines; round(...,6) + 0.0
    normalizes any sign-of-zero.

    Scale: one bandwidth-filtered scan (the predicate pushes to the
    parquet scan) + a 2-group aggregation; the estimator itself is
    O(1) window algebra over two rows — the experimentation-readout
    shape, same as q_diff_in_diff."""
    e = load_table(spark, sf_dir, "events")
    xraw = F.col("event_id") % 100
    x = (xraw - 50).alias("x")
    y = (0.1 * F.col("value") + 0.05 * xraw
         + F.when(xraw >= 50, 6.0).otherwise(0.0)).alias("y")
    side = F.when(xraw >= 50, 1).otherwise(0).alias("side")
    obs = (e.filter((xraw >= 30) & (xraw < 70)).select(x, y, side))
    DECS = "decimal(30,10)"
    fits = (obs.groupBy("side")
            .agg(F.count("*").alias("n"),
                 F.sum("x").cast("double").alias("sx"),
                 F.sum(F.col("x") * F.col("x")).cast("double")
                  .alias("sxx"),
                 F.sum(F.col("y").cast(DECS)).cast("double").alias("sy"),
                 F.sum((F.col("x") * F.col("y")).cast(DECS))
                  .cast("double").alias("sxy")))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    coefs = fits.select("side", "n", slope.alias("slope"),
                        intercept.alias("intercept"))
    w = W.partitionBy()
    eff = (F.max(F.when(F.col("side") == 1, F.col("intercept"))).over(w)
           - F.max(F.when(F.col("side") == 0, F.col("intercept"))).over(w))
    return (coefs.select(
        "side", "n",
        (F.round("slope", 6) + 0.0).alias("slope"),
        (F.round("intercept", 6) + 0.0).alias("intercept_at_cutoff"),
        (F.round(eff, 6) + 0.0).alias("rdd_effect"))
        .orderBy("side"))


# ---------------------------------------------------------------------------
# q_offpolicy_dr — doubly-robust off-policy evaluation
# ---------------------------------------------------------------------------


@query(
    "q_offpolicy_dr",
    oracle=f"""
    WITH logs AS ({_IPS_SYNTH}),
    rewarded AS (
      SELECT ctx, logged_arm, propensity,
             CASE WHEN logged_arm = ctx % 3 THEN 2 ELSE 1 END AS reward,
             CASE WHEN logged_arm = ctx % 3 THEN 1.0 / propensity
                  ELSE 0.0 END AS w
      FROM logs
    ),
    qhat AS (
      SELECT ctx, logged_arm AS arm,
             {sql_davg('reward', 'q', nd=10, gdp=0)}
      FROM rewarded GROUP BY ctx, logged_arm
    ),
    terms AS (
      SELECT r.ctx,
             round(qt.q + r.w * (r.reward - qa.q), 10) AS t
      FROM rewarded r
      JOIN qhat qa ON qa.ctx = r.ctx AND qa.arm = r.logged_arm
      JOIN qhat qt ON qt.ctx = r.ctx AND qt.arm = r.ctx % 3
    )
    SELECT ctx, count(*) AS n,
           {sql_davg('t', 'dr_value', nd=6, gdp=10)}
    FROM terms GROUP BY ctx ORDER BY ctx
    """,
)
def q_offpolicy_dr(spark, sf_dir):
    """Doubly-robust off-policy evaluation (Dudik, Langford & Li
    2011) over the same logged-bandit synthesis as q_offpolicy_ips:
    a direct model q̂(ctx, arm) — per-cell mean reward fitted from
    the logs themselves by one group-by — is evaluated at the target
    policy's arm, then corrected by the propensity-weighted residual
    w·(r − q̂(ctx, a_logged)). Unbiased if EITHER the model or the
    propensities are right; the estimator the counterfactual-eval
    stack actually ships. Per-context n and DR value; q̂ and the
    per-round terms are 10dp-quantized so both engines sum identical
    doubles, and the final mean is decimal-exact then rounded.

    Scale: one scan to fit q̂ (ctx x arm cells — tiny), broadcast it
    back over the log scan for the correction term, one keyed
    aggregation. Two passes total, no shuffle wider than the cell
    table."""
    e = load_table(spark, sf_dir, "events")
    arm = (F.col("event_id") * 2654435761) % 10
    ctx = (F.col("event_id") % 4).alias("ctx")
    logs = e.select(
        ctx,
        F.when(arm < 6, F.col("event_id") % 4 % 3)
         .when(arm < 8, (F.col("event_id") % 4 + 1) % 3)
         .otherwise((F.col("event_id") % 4 + 2) % 3).alias("logged_arm"),
        F.when(arm < 6, 0.6).when(arm < 8, 0.2).otherwise(0.2)
         .alias("propensity"))
    target = F.col("ctx") % 3
    DECS = "decimal(30,10)"
    rewarded = logs.select(
        "ctx", "logged_arm", "propensity",
        F.when(F.col("logged_arm") == target, 2).otherwise(1)
         .alias("reward"),
        F.when(F.col("logged_arm") == target,
               F.lit(1.0) / F.col("propensity"))
         .otherwise(0.0).alias("w"))
    # q and dr_value are exact integer half-away-from-zero rounds
    # (VERDICT r9 item 3): reward is integer and t is 10dp-rounded,
    # so both quotients are boundary-exposed rationals
    qhat = (rewarded.groupBy("ctx", F.col("logged_arm").alias("arm"))
            .agg(davg("reward", "q", nd=10, gdp=0)))
    qa = qhat.select(F.col("ctx").alias("qa_ctx"),
                     F.col("arm").alias("qa_arm"), F.col("q").alias("q_a"))
    qt = qhat.select(F.col("ctx").alias("qt_ctx"),
                     F.col("arm").alias("qt_arm"), F.col("q").alias("q_t"))
    terms = (rewarded
             .join(F.broadcast(qa),
                   (F.col("qa_ctx") == F.col("ctx"))
                   & (F.col("qa_arm") == F.col("logged_arm")))
             .join(F.broadcast(qt),
                   (F.col("qt_ctx") == F.col("ctx"))
                   & (F.col("qt_arm") == F.col("ctx") % 3))
             .select("ctx",
                     F.round(F.col("q_t")
                             + F.col("w") * (F.col("reward")
                                             - F.col("q_a")), 10)
                     .alias("t")))
    return (terms.groupBy("ctx")
            .agg(F.count("*").alias("n"),
                 davg("t", "dr_value", nd=6, gdp=10))
            .orderBy("ctx"))


# ---------------------------------------------------------------------------
# q_roc_auc — exact tie-corrected ROC-AUC per weekly slice
# ---------------------------------------------------------------------------


@query(
    "q_roc_auc",
    oracle="""
    WITH scored AS (
      SELECT cast(floor((date_part('day', ts) - 1) / 7) as integer)
               AS week_slice,
             cast(round(value, 3) * 1000 as decimal(7,0)) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
    ),
    g AS (
      SELECT week_slice, v,
             cast(sum(pos) as bigint) AS np_v,
             cast(count(*) as bigint) AS n_v
      FROM scored GROUP BY 1, 2
    ),
    rk AS (
      SELECT week_slice, np_v, n_v,
             sum(n_v) OVER (PARTITION BY week_slice ORDER BY v) AS cum
      FROM g
    ),
    agg AS (
      SELECT week_slice,
             cast(sum(np_v * (2 * cum - n_v + 1)) as bigint) AS rp2,
             cast(sum(np_v) as bigint) AS n_pos,
             cast(sum(n_v) - sum(np_v) as bigint) AS n_neg
      FROM rk GROUP BY 1
    )
    SELECT week_slice, n_pos, n_neg,
           round(cast(rp2 - n_pos * (n_pos + 1) as double)
                 / (2.0 * n_pos * n_neg), 6) AS auc
    FROM agg ORDER BY week_slice
    """,
)
def q_roc_auc(spark, sf_dir):
    """Exact tie-corrected ROC-AUC of `value` as a classifier score for
    purchase events, per weekly slice — the rank-statistic identity
    AUC = (R_pos - n1(n1+1)/2) / (n1*n0) with AVERAGE ranks for ties,
    i.e. exactly the Mann-Whitney U normalization (q_mannwhitney_u's
    doubled-rank integer discipline reused: tied doubled average rank
    2*cum - n_v + 1 is always an integer, so the whole statistic is
    exact integers until one final IEEE division). No threshold sweep,
    no trapezoid: the rank form IS the area, exactly.

    Scale: one map-side-combined groupBy on (slice, milli-value key),
    one windowed cumsum over the distinct-value relation per slice
    (bounded by value cardinality, not row count), one scalar agg per
    slice. Slices partition the rank windows, so nothing is global."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.floor((F.dayofmonth("ts") - 1) / 7).cast("int")
        .alias("week_slice"),
        (F.round("value", 3) * 1000).cast("decimal(7,0)").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("pos"))
    g = (scored.groupBy("week_slice", "v")
         .agg(F.sum("pos").cast("long").alias("np_v"),
              F.count("*").alias("n_v")))
    rk = g.select(
        "week_slice", "np_v", "n_v",
        F.sum("n_v").over(
            W.partitionBy("week_slice").orderBy("v")
            .rangeBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"))
    agg = (rk.groupBy("week_slice")
           .agg(F.sum(F.col("np_v") * (2 * F.col("cum") - F.col("n_v") + 1))
                .cast("long").alias("rp2"),
                F.sum("np_v").cast("long").alias("n_pos"),
                (F.sum("n_v") - F.sum("np_v")).cast("long").alias("n_neg")))
    return (agg.select(
        "week_slice", "n_pos", "n_neg",
        F.round(F.expr("cast(rp2 - n_pos * (n_pos + 1) as double)")
                / (2.0 * F.col("n_pos") * F.col("n_neg")), 6)
        .alias("auc"))
        .orderBy("week_slice"))


# ---------------------------------------------------------------------------
# q_average_precision — exact AP (area under the PR curve) per day
# ---------------------------------------------------------------------------


@query(
    "q_average_precision",
    oracle="""
    WITH scored AS (
      SELECT cast(date_part('day', ts) as integer) AS day,
             event_id,
             cast(round(value, 3) * 1000 as decimal(7,0)) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
      FROM events
    ),
    ranked AS (
      SELECT day, rel,
             row_number() OVER (PARTITION BY day
                                ORDER BY v DESC, event_id) AS k,
             sum(rel) OVER (PARTITION BY day
                            ORDER BY v DESC, event_id) AS cum_rel
      FROM scored
    ),
    terms AS (
      SELECT day,
             cast(round(cast(cum_rel as double) / k, 10)
                  as decimal(16,10)) AS prec_at_k
      FROM ranked WHERE rel = 1
    )
    SELECT day, cast(count(*) as bigint) AS n_rel,
           round(cast(sum(prec_at_k) as double) / count(*), 6) AS ap
    FROM terms GROUP BY day ORDER BY day
    """,
)
def q_average_precision(spark, sf_dir):
    """Exact average precision (the step-function area under the
    precision-recall curve) of `value` ranking purchase events, per
    day: AP = mean over relevant items of precision@k at each hit,
    with the deterministic (score desc, event_id) tie-break every
    top-k in the repo carries. The PR-space companion to q_roc_auc —
    AUC is insensitive to class imbalance, AP is exactly what moves
    when positives are rare (the retrieval/filtering regime an LLM
    data pipeline lives in). Each precision@k is one IEEE division of
    exact integers, 10dp-quantized into an exact-decimal mean.

    Scale: rank windows are partitioned by day — no global ordering;
    at corpus scale the slice key is whatever bounds an eval set."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.dayofmonth("ts").cast("int").alias("day"),
        "event_id",
        (F.round("value", 3) * 1000).cast("decimal(7,0)").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("rel"))
    w = W.partitionBy("day").orderBy(F.desc("v"), "event_id")
    ranked = scored.select(
        "day", "rel",
        F.row_number().over(w).alias("k"),
        F.sum("rel").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_rel"))
    terms = (ranked.filter(F.col("rel") == 1)
             .select("day",
                     F.round(F.col("cum_rel").cast("double") / F.col("k"),
                             10).cast("decimal(16,10)")
                     .alias("prec_at_k")))
    return (terms.groupBy("day")
            .agg(F.count("*").alias("n_rel"),
                 F.round(F.sum("prec_at_k").cast("double") / F.count("*"),
                         6).alias("ap"))
            .orderBy("day"))


# ---------------------------------------------------------------------------
# q_rouge_n — ROUGE-1/2 overlap F1 between paired documents
# ---------------------------------------------------------------------------


@query(
    "q_rouge_n",
    oracle="""
    WITH paired AS (
      SELECT source, doc_id AS pid, text AS cand,
             lead(text) OVER (PARTITION BY source ORDER BY doc_id)
               AS ref
      FROM documents
    ),
    pairs AS (
      SELECT source, pid, string_split(cand, ' ') AS ct,
             string_split(ref, ' ') AS rt
      FROM paired WHERE ref IS NOT NULL
    ),
    grams AS (
      SELECT source, pid, 1 AS n, len(ct) AS n_cand, len(rt) AS n_ref,
             ct AS cg, rt AS rg FROM pairs
      UNION ALL
      SELECT source, pid, 2,
             greatest(len(ct) - 1, 0), greatest(len(rt) - 1, 0),
             [ct[i] || ' ' || ct[i + 1]
              FOR i IN range(1, greatest(len(ct), 1))],
             [rt[i] || ' ' || rt[i + 1]
              FOR i IN range(1, greatest(len(rt), 1))]
      FROM pairs
    ),
    cc AS (
      SELECT source, pid, n, u.g AS g, count(*) AS c
      FROM grams, unnest(cg) u(g) GROUP BY 1, 2, 3, 4
    ),
    rc AS (
      SELECT source, pid, n, u.g AS g, count(*) AS c
      FROM grams, unnest(rg) u(g) GROUP BY 1, 2, 3, 4
    ),
    ov AS (
      SELECT cc.source, cc.pid, cc.n,
             cast(sum(least(cc.c, rc.c)) as bigint) AS overlap
      FROM cc JOIN rc ON cc.pid = rc.pid AND cc.n = rc.n
                     AND cc.g = rc.g
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT g.source, g.n,
             cast(round(CASE
               WHEN coalesce(o.overlap, 0) = 0 THEN 0.0
               ELSE 2.0 * o.overlap / (g.n_cand + g.n_ref)
             END, 10) as decimal(16,10)) AS f1
      FROM grams g LEFT JOIN ov o
        ON o.pid = g.pid AND o.n = g.n
    )
    SELECT source, n AS gram_n, cast(count(*) as bigint) AS n_pairs,
           round(cast(sum(f1) as double) / count(*), 6) AS mean_f1
    FROM scored GROUP BY 1, 2 ORDER BY source, gram_n
    """,
)
def q_rouge_n(spark, sf_dir):
    """ROUGE-1 and ROUGE-2 F1 between each document and its successor
    within the same source (lead-over-doc_id pairing — the repo's
    deterministic stand-in for candidate/reference summary pairs):
    clipped n-gram overlap sum_g min(c_cand(g), c_ref(g)), and the
    standard identity F1 = 2*overlap/(|cand|+|ref|), which needs no
    separate P and R divisions (they share the overlap numerator).
    Per-pair F1 is one IEEE division 10dp-quantized into exact-decimal
    per-source means. A zero-overlap or empty-side pair scores 0 by
    the CASE guard — no divide-by-zero, no NULL drift.

    Scale: gram counting is explode -> map-side-combined groupBy per
    (pair, gram); the overlap join is keyed (pair, n, gram) — never
    doc x doc; pair construction is one lead() window partitioned by
    source. 100 TB eval sets pair by an explicit key instead of lead,
    same downstream shape."""
    d = load_table(spark, sf_dir, "documents")
    wsrc = W.partitionBy("source").orderBy("doc_id")
    paired = (d.select("source", F.col("doc_id").alias("pid"),
                       F.split("text", " ").alias("ct"),
                       F.split(F.lead("text").over(wsrc), " ")
                       .alias("rt"))
              .filter(F.col("rt").isNotNull()))

    def bigrams(name: str):
        return F.expr(
            f"zip_with(slice({name}, 1, greatest(size({name}) - 1, 0)),"
            f" slice({name}, 2, greatest(size({name}) - 1, 0)),"
            " (a, b) -> concat(a, ' ', b))")

    uni = paired.select("source", "pid", F.lit(1).alias("n"),
                        F.size("ct").alias("n_cand"),
                        F.size("rt").alias("n_ref"),
                        F.col("ct").alias("cg"), F.col("rt").alias("rg"))
    big = paired.select(
        "source", "pid", F.lit(2).alias("n"),
        F.greatest(F.size("ct") - 1, F.lit(0)).alias("n_cand"),
        F.greatest(F.size("rt") - 1, F.lit(0)).alias("n_ref"),
        bigrams("ct").alias("cg"),
        bigrams("rt").alias("rg"))
    grams = uni.unionByName(big)
    cc = (grams.select("source", "pid", "n",
                       F.explode("cg").alias("g"))
          .groupBy("source", "pid", "n", "g").agg(F.count("*").alias("c")))
    rc = (grams.select("pid", "n", F.explode("rg").alias("g"))
          .groupBy("pid", "n", "g").agg(F.count("*").alias("c"))
          .withColumnsRenamed({"pid": "rpid", "n": "rn", "g": "rg",
                               "c": "rc"}))
    ov = (cc.join(rc, (F.col("pid") == F.col("rpid"))
                  & (F.col("n") == F.col("rn"))
                  & (F.col("g") == F.col("rg")))
          .groupBy("pid", "n")
          .agg(F.sum(F.least("c", "rc")).cast("long").alias("overlap"))
          .withColumnsRenamed({"pid": "opid", "n": "on"}))
    scored = (grams.join(ov, (F.col("pid") == F.col("opid"))
                         & (F.col("n") == F.col("on")), "left")
              .select("source", "n",
                      F.round(F.when(F.coalesce("overlap", F.lit(0)) == 0,
                                     0.0)
                              .otherwise(2.0 * F.col("overlap")
                                         / (F.col("n_cand")
                                            + F.col("n_ref"))), 10)
                      .cast("decimal(16,10)").alias("f1")))
    return (scored.groupBy("source", F.col("n").alias("gram_n"))
            .agg(F.count("*").alias("n_pairs"),
                 F.round(F.sum("f1").cast("double") / F.count("*"), 6)
                 .alias("mean_f1"))
            .orderBy("source", "gram_n"))


# ---------------------------------------------------------------------------
# q_knn_classify — k-nearest-neighbor majority-vote classification
# ---------------------------------------------------------------------------


def _knn_classify_oracle() -> str:
    from .operators.similarity import DEC_SIM as DEC
    from .queries_llm import _NORMS_CTE
    return f"""
    WITH {_NORMS_CTE},
    probes AS (
      SELECT vec_id AS probe_id, embedding AS p, nrm AS pn,
             label AS true_label
      FROM norms WHERE vec_id % 25 = 0
    ),
    train AS (
      SELECT * FROM norms WHERE vec_id % 25 <> 0
    ),
    dots AS (
      SELECT probes.probe_id, train.vec_id, train.label,
             cast(sum(cast(cast(train.embedding[gs.i] as double)
                           * cast(probes.p[gs.i] as double)
                           as {DEC})) as double) AS dot,
             max(train.nrm) AS na, max(probes.pn) AS pn
      FROM train CROSS JOIN probes, range(1, 65) gs(i)
      GROUP BY probes.probe_id, train.vec_id, train.label
    ),
    ranked AS (
      SELECT probe_id, label,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY round(dot / sqrt(na * pn), 4)
                                           DESC, vec_id) AS rk
      FROM dots
    ),
    votes AS (
      SELECT probe_id, label, cast(count(*) as bigint) AS v
      FROM ranked WHERE rk <= 7
      GROUP BY probe_id, label
    ),
    winner AS (
      SELECT probe_id, label AS pred_label, v AS votes,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY v DESC, label) AS wr
      FROM votes
    )
    SELECT w.probe_id, w.pred_label, w.votes, p.true_label,
           CASE WHEN w.pred_label = p.true_label THEN 1 ELSE 0 END
             AS correct
    FROM winner w JOIN probes p ON p.probe_id = w.probe_id
    WHERE w.wr = 1
    """


@query("q_knn_classify", oracle=_knn_classify_oracle())
def q_knn_classify(spark, sf_dir):
    """kNN classification: every 25th vector is held out and labeled
    by the majority vote of its k=7 cosine-nearest neighbors among
    the rest — the label-propagation / weak-supervision primitive on
    top of the retrieval stack (q_similarity_batch is the neighbor
    stage; this adds the vote + deterministic tie-break: higher vote
    count, then smaller label id). Cosine follows the house
    exact-decimal reduction, rounded 4dp before ranking with vec_id
    tie-break, so neighbor sets are engine-identical.

    Scale: one corpus pass scores |held-out| x |train| via the
    broadcast probe matrix (probes batch to executor memory at 100 TB,
    same argument as q_similarity_batch); the vote is a bounded
    groupBy over k rows per probe. Cost note: the exact-decimal dot
    is the hash-parity discipline, ~10x a float dot — a production
    kNN would use the float path (rank ties this avoids are harmless
    when no oracle must agree bit-for-bit)."""
    from .operators.similarity import dot_col
    from .queries_llm import _norm

    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    probes = (n.filter(F.col("vec_id") % 25 == 0)
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("embedding").alias("pe"),
                      F.col("nrm").alias("pn"),
                      F.col("label").alias("true_label")))
    train = n.filter(F.col("vec_id") % 25 != 0)
    scored = (train.crossJoin(F.broadcast(probes))
              .select("probe_id", "vec_id", "label", "true_label",
                      F.round(dot_col(F.col("embedding"), F.col("pe"))
                              / F.sqrt(F.col("nrm") * F.col("pn")), 4)
                      .alias("cos")))
    rk = F.row_number().over(
        W.partitionBy("probe_id").orderBy(F.desc("cos"), "vec_id"))
    votes = (scored.withColumn("rk", rk).filter(F.col("rk") <= 7)
             .groupBy("probe_id", "true_label", "label")
             .agg(F.count("*").cast("long").alias("v")))
    wr = F.row_number().over(
        W.partitionBy("probe_id").orderBy(F.desc("v"), "label"))
    return (votes.withColumn("wr", wr).filter(F.col("wr") == 1)
            .select("probe_id", F.col("label").alias("pred_label"),
                    F.col("v").alias("votes"), "true_label",
                    F.when(F.col("label") == F.col("true_label"), 1)
                    .otherwise(0).alias("correct")))


# ---------------------------------------------------------------------------
# q_embed_drift — centroid shift between two corpus halves
# ---------------------------------------------------------------------------


def _embed_drift_oracle() -> str:
    from .operators.similarity import DEC_SIM as DEC
    return f"""
    WITH dims AS (
      SELECT vec_id % 2 AS half, gs.i AS dim,
             cast(sum(cast(cast(embedding[gs.i] as double) as {DEC}))
                  as {DEC}) AS s,
             cast(count(*) as bigint) AS n
      FROM embeddings, range(1, 65) gs(i)
      GROUP BY vec_id % 2, gs.i
    ),
    paired AS (
      SELECT a.dim,
             cast(a.s as double) AS sa, a.n AS na,
             cast(b.s as double) AS sb, b.n AS nb
      FROM dims a JOIN dims b ON a.dim = b.dim
      WHERE a.half = 0 AND b.half = 1
    ),
    terms AS (
      SELECT
        cast(round(sa * sb, 6) as decimal(30,10)) AS dot_t,
        cast(round(sa * sa, 6) as decimal(30,10)) AS naa_t,
        cast(round(sb * sb, 6) as decimal(30,10)) AS nbb_t,
        cast(round((sa / na - sb / nb) * (sa / na - sb / nb), 10)
             as decimal(30,12)) AS shift_t,
        na, nb
      FROM paired
    )
    SELECT max(na) AS n_even, max(nb) AS n_odd,
           round(cast(sum(dot_t) as double)
                 / sqrt(cast(sum(naa_t) as double)
                        * cast(sum(nbb_t) as double)), 6) + 0.0
             AS centroid_cos,
           round(sqrt(cast(sum(shift_t) as double)), 6) + 0.0
             AS centroid_l2
    FROM terms
    """


@query("q_embed_drift", oracle=_embed_drift_oracle())
def q_embed_drift(spark, sf_dir):
    """Embedding-space drift monitor: split the corpus into two halves
    (vec_id parity — in production, yesterday vs today), compare their
    centroids by cosine and L2 — the cheap canary that catches an
    encoder change, a data-mix shift, or a pipeline bug re-embedding a
    corpus, long before any downstream metric moves. Cosine is
    computed on the per-dimension SUM vectors (scaling by 1/n cancels
    in cosine), so its inputs are exact decimal reductions; the L2
    uses per-dimension mean differences, each one double expression
    rounded 10dp and decimal-summed over the 64 dims.

    Scale: one pass, one (half, dim)-keyed aggregation (128 groups at
    any corpus size), then a 64-row reduce. The 100 TB plan is the
    same two map-side-combined shuffles."""
    from .operators.similarity import DEC_SIM

    e = load_table(spark, sf_dir, "embeddings")
    dims = (e.select((F.col("vec_id") % 2).alias("half"),
                     F.posexplode("embedding").alias("pos", "x"))
            .groupBy("half", "pos")
            .agg(F.sum(F.col("x").cast("double").cast(DEC_SIM))
                 .cast(DEC_SIM).alias("s"),
                 F.count("*").cast("long").alias("n")))
    a = dims.filter(F.col("half") == 0).select(
        "pos", F.col("s").cast("double").alias("sa"),
        F.col("n").alias("na"))
    b = dims.filter(F.col("half") == 1).select(
        "pos", F.col("s").cast("double").alias("sb"),
        F.col("n").alias("nb"))
    paired = a.join(b, "pos")
    mean_d = (F.col("sa") / F.col("na") - F.col("sb") / F.col("nb"))
    terms = paired.select(
        F.round(F.col("sa") * F.col("sb"), 6).cast("decimal(30,10)")
        .alias("dot_t"),
        F.round(F.col("sa") * F.col("sa"), 6).cast("decimal(30,10)")
        .alias("naa_t"),
        F.round(F.col("sb") * F.col("sb"), 6).cast("decimal(30,10)")
        .alias("nbb_t"),
        F.round(mean_d * mean_d, 10).cast("decimal(30,12)")
        .alias("shift_t"),
        "na", "nb")
    return terms.agg(
        F.max("na").alias("n_even"), F.max("nb").alias("n_odd"),
        (F.round(F.sum("dot_t").cast("double")
                 / F.sqrt(F.sum("naa_t").cast("double")
                          * F.sum("nbb_t").cast("double")), 6) + 0.0)
        .alias("centroid_cos"),
        (F.round(F.sqrt(F.sum("shift_t").cast("double")), 6) + 0.0)
        .alias("centroid_l2"))


# ---------------------------------------------------------------------------
# q_agreement_metrics — Cohen's kappa, MCC, balanced accuracy
# ---------------------------------------------------------------------------


def _agreement_oracle() -> str:
    from .operators.text import EN_STOPWORDS, lexicon_count_sql
    pred = f"""
      CASE WHEN cast({lexicon_count_sql('text', EN_STOPWORDS)} as double)
                / len(string_split(text, ' ')) >= 0.05
           THEN 1 ELSE 0 END
    """
    return f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
             ({pred}) AS p
      FROM documents
    ),
    cm AS (
      SELECT cast(sum(t * p) as bigint) AS tp,
             cast(sum((1 - t) * p) as bigint) AS fp,
             cast(sum(t * (1 - p)) as bigint) AS fn,
             cast(sum((1 - t) * (1 - p)) as bigint) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           round(cast(2 * (tp * tn - fp * fn) as double)
                 / ((tp + fp) * (fp + tn) + (tp + fn) * (fn + tn)), 6)
             + 0.0 AS kappa,
           round(cast(tp * tn - fp * fn as double)
                 / sqrt(cast((tp + fp) * (tp + fn) as double)
                        * cast((tn + fp) * (tn + fn) as double)), 6)
             + 0.0 AS mcc,
           round((cast(tp as double) / (tp + fn)
                  + cast(tn as double) / (tn + fp)) / 2, 6) + 0.0
             AS balanced_acc
    FROM cm
    """


@query("q_agreement_metrics", oracle=_agreement_oracle())
def q_agreement_metrics(spark, sf_dir):
    """Chance-corrected agreement metrics over the langid confusion:
    Cohen's kappa (2(tp*tn - fp*fn) / ((tp+fp)(fp+tn) + (tp+fn)(fn+tn))),
    Matthews correlation, and balanced accuracy — the metrics that
    stay honest under class imbalance, where q_eval_langid's raw
    accuracy inflates (call everything majority-class and accuracy
    still looks fine; kappa and MCC go to 0). The annotator-agreement
    readout a labeling pipeline runs between model and human passes.

    Exactness: all three statistics are scalar expressions of the four
    exact bigint confusion cells — integer products in the numerators,
    one division (+ one sqrt for MCC) at the edge, rounded 6dp with
    the sign-of-zero guard (agreement AT chance is exactly the -0.0
    hazard).

    Scale: identical single-aggregate plan to q_eval_langid."""
    from .operators.text import stopword_count, token_count

    d = load_table(spark, sf_dir, "documents")
    pred_en = (stopword_count(F.col("text")).cast("double")
               / token_count(F.col("text")) >= 0.05).cast("int")
    truth_en = (F.col("lang") == "en").cast("int")
    scored = d.select(truth_en.alias("t"), pred_en.alias("p"))
    cm = scored.agg(
        F.sum(F.col("t") * F.col("p")).cast("long").alias("tp"),
        F.sum((1 - F.col("t")) * F.col("p")).cast("long").alias("fp"),
        F.sum(F.col("t") * (1 - F.col("p"))).cast("long").alias("fn"),
        F.sum((1 - F.col("t")) * (1 - F.col("p"))).cast("long")
        .alias("tn"))
    tp, fp = F.col("tp"), F.col("fp")
    fn, tn = F.col("fn"), F.col("tn")
    kappa = (2 * (tp * tn - fp * fn)).cast("double") \
        / ((tp + fp) * (fp + tn) + (tp + fn) * (fn + tn))
    mcc = ((tp * tn - fp * fn).cast("double")
           / F.sqrt(((tp + fp) * (tp + fn)).cast("double")
                    * ((tn + fp) * (tn + fn)).cast("double")))
    bacc = (tp.cast("double") / (tp + fn)
            + tn.cast("double") / (tn + fp)) / 2
    return cm.select(
        "tp", "fp", "fn", "tn",
        (F.round(kappa, 6) + 0.0).alias("kappa"),
        (F.round(mcc, 6) + 0.0).alias("mcc"),
        (F.round(bacc, 6) + 0.0).alias("balanced_acc"))


# ---------------------------------------------------------------------------
# q_mcnemar_test — paired comparison of two classifiers
# ---------------------------------------------------------------------------


def _mcnemar_oracle() -> str:
    from .operators.text import EN_STOPWORDS, lexicon_count_sql
    rate = (f"cast({lexicon_count_sql('text', EN_STOPWORDS)} as double)"
            " / len(string_split(text, ' '))")
    return f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
             CASE WHEN {rate} >= 0.05 THEN 1 ELSE 0 END AS pa,
             CASE WHEN {rate} >= 0.03 THEN 1 ELSE 0 END AS pb
      FROM documents
    ),
    cm AS (
      SELECT cast(count(*) FILTER (pa = t AND pb <> t) as bigint) AS b,
             cast(count(*) FILTER (pa <> t AND pb = t) as bigint) AS c,
             cast(count(*) FILTER (pa = t AND pb = t) as bigint)
               AS both_right,
             cast(count(*) FILTER (pa <> t AND pb <> t) as bigint)
               AS both_wrong
      FROM scored
    )
    SELECT b, c, both_right, both_wrong,
           round(CASE WHEN b + c > 0
                      THEN cast((b - c) * (b - c) as double) / (b + c)
                      ELSE 0.0 END, 6) + 0.0 AS chi2_mcnemar
    FROM cm
    """


@query("q_mcnemar_test", oracle=_mcnemar_oracle())
def q_mcnemar_test(spark, sf_dir):
    """McNemar's test comparing two langid thresholds (stopword rate
    >= 0.05 vs the laxer >= 0.03) on the SAME documents: only the
    discordant cells matter — b = strict right where lax wrong, c =
    reverse — chi2 = (b-c)^2/(b+c). THE correct way to compare two
    classifiers on one eval set (two independent accuracy readings
    double-count the shared easy mass; q_agreement_metrics scores one
    model, this arbitrates between two).

    Exactness: four exact bigint cells; one guarded scalar division.
    Scale: identical single-aggregate plan to q_eval_langid."""
    from .operators.text import stopword_count, token_count

    d = load_table(spark, sf_dir, "documents")
    rate = (stopword_count(F.col("text")).cast("double")
            / token_count(F.col("text")))
    t = (F.col("lang") == "en").cast("int")
    scored = d.select(t.alias("t"),
                      (rate >= 0.05).cast("int").alias("pa"),
                      (rate >= 0.03).cast("int").alias("pb"))
    agree_a = F.col("pa") == F.col("t")
    agree_b = F.col("pb") == F.col("t")
    cm = scored.agg(
        F.sum(F.when(agree_a & ~agree_b, 1).otherwise(0)).cast("long")
        .alias("b"),
        F.sum(F.when(~agree_a & agree_b, 1).otherwise(0)).cast("long")
        .alias("c"),
        F.sum(F.when(agree_a & agree_b, 1).otherwise(0)).cast("long")
        .alias("both_right"),
        F.sum(F.when(~agree_a & ~agree_b, 1).otherwise(0)).cast("long")
        .alias("both_wrong"))
    chi2 = F.when(
        F.col("b") + F.col("c") > 0,
        ((F.col("b") - F.col("c")) * (F.col("b") - F.col("c")))
        .cast("double") / (F.col("b") + F.col("c"))).otherwise(0.0)
    return cm.select("b", "c", "both_right", "both_wrong",
                     (F.round(chi2, 6) + 0.0).alias("chi2_mcnemar"))


# ---------------------------------------------------------------------------
# q_bleu — corpus-level BLEU-2 with brevity penalty
# ---------------------------------------------------------------------------


@query(
    "q_bleu",
    oracle="""
    WITH paired AS (
      SELECT source, doc_id AS pid,
             string_split(text, ' ') AS ct,
             string_split(lead(text) OVER (PARTITION BY source
                                           ORDER BY doc_id), ' ') AS rt
      FROM documents
    ), pr AS (
      SELECT * FROM paired WHERE rt IS NOT NULL
    ), grams AS (
      SELECT source, pid, 1 AS n, ct AS cg, rt AS rg FROM pr
      UNION ALL
      SELECT source, pid, 2 AS n,
             list_transform(range(1, greatest(len(ct), 1)),
                            i -> ct[i] || ' ' || ct[i + 1]) AS cg,
             list_transform(range(1, greatest(len(rt), 1)),
                            i -> rt[i] || ' ' || rt[i + 1]) AS rg
      FROM pr
    ), cc AS (
      SELECT source, pid, n, u.g AS g, count(*) AS c
      FROM grams, unnest(cg) AS u(g)
      GROUP BY source, pid, n, u.g
    ), rc AS (
      SELECT pid, n, u.g AS g, count(*) AS c
      FROM grams, unnest(rg) AS u(g)
      GROUP BY pid, n, u.g
    ), ov AS (
      SELECT cc.source, cc.n,
             sum(least(cc.c, coalesce(rc.c, 0))) AS clipped,
             sum(cc.c) AS total
      FROM cc LEFT JOIN rc
        ON cc.pid = rc.pid AND cc.n = rc.n AND cc.g = rc.g
      GROUP BY cc.source, cc.n
    ), lens AS (
      SELECT source, count(*) AS n_pairs,
             sum(len(ct)) AS cand_tokens,
             sum(len(rt)) AS ref_tokens
      FROM pr GROUP BY source
    ), ps AS (
      SELECT source,
             max(CASE WHEN n = 1 THEN clipped END) AS c1,
             max(CASE WHEN n = 1 THEN total END) AS t1,
             max(CASE WHEN n = 2 THEN clipped END) AS c2,
             max(CASE WHEN n = 2 THEN total END) AS t2
      FROM ov GROUP BY source
    )
    SELECT lens.source, n_pairs,
           cast(cand_tokens as bigint) AS cand_tokens,
           cast(ref_tokens as bigint) AS ref_tokens,
           round(cast(c1 as double) / t1, 6) AS p1,
           round(cast(c2 as double) / t2, 6) AS p2,
           CASE WHEN coalesce(c1, 0) = 0 OR coalesce(c2, 0) = 0
                     OR cand_tokens = 0 THEN 0.0
                ELSE round(
                  exp(least(0.0, 1.0 - cast(ref_tokens as double)
                                       / cand_tokens))
                  * exp(0.5 * (ln(cast(c1 as double) / t1)
                               + ln(cast(c2 as double) / t2))), 4)
           END AS bleu2
    FROM lens JOIN ps ON lens.source = ps.source
    ORDER BY lens.source
    """,
)
def q_bleu(spark, sf_dir):
    """Corpus-level BLEU-2 (Papineni et al. 2002) per source — the
    canonical MT/generation metric: modified (clipped) n-gram precision
    p_n = sum_pairs sum_g min(c_cand, c_ref) / sum_pairs |cand grams|
    pooled at CORPUS level (not mean-of-pairs — the corpus pooling is
    what makes BLEU robust to short segments), geometric mean over
    n=1,2, times the brevity penalty exp(min(0, 1 - ref_len/cand_len)).
    Pairs are candidate=doc, reference=successor doc within source
    (the repo's deterministic stand-in, same pairing as q_rouge_n). A
    source with zero clipped overlap at either order scores 0 (the
    standard corpus-BLEU zero, not a smoothed variant).

    Exactness: clipped counts and token totals are exact bigints; p1/p2
    are one IEEE division each rounded at 6dp; bleu2 is genuinely-float
    ln/exp math rounded at 4dp per the hash conventions.

    Scale: gram counting is explode -> map-side-combined groupBy per
    (pair, gram); the clip join is keyed (pid, n, gram) — never
    doc x doc; the corpus pool is a per-source re-aggregation of
    already-tiny per-(source, n) partials. Same 100 TB shape as
    q_rouge_n: pair by an explicit key, everything else unchanged."""
    d = load_table(spark, sf_dir, "documents")
    wsrc = W.partitionBy("source").orderBy("doc_id")
    paired = (d.select("source", F.col("doc_id").alias("pid"),
                       F.split("text", " ").alias("ct"),
                       F.split(F.lead("text").over(wsrc), " ").alias("rt"))
              .filter(F.col("rt").isNotNull()))

    def bigrams(name: str):
        return F.expr(
            f"zip_with(slice({name}, 1, greatest(size({name}) - 1, 0)),"
            f" slice({name}, 2, greatest(size({name}) - 1, 0)),"
            " (a, b) -> concat(a, ' ', b))")

    grams = (paired.select("source", "pid", F.lit(1).alias("n"),
                           F.col("ct").alias("cg"), F.col("rt").alias("rg"))
             .unionByName(paired.select(
                 "source", "pid", F.lit(2).alias("n"),
                 bigrams("ct").alias("cg"), bigrams("rt").alias("rg"))))
    cc = (grams.select("source", "pid", "n", F.explode("cg").alias("g"))
          .groupBy("source", "pid", "n", "g")
          .agg(F.count("*").alias("c")))
    rc = (grams.select("pid", "n", F.explode("rg").alias("g"))
          .groupBy("pid", "n", "g").agg(F.count("*").alias("c"))
          .withColumnsRenamed({"pid": "rpid", "n": "rn", "g": "rg",
                               "c": "rc"}))
    ov = (cc.join(rc, (F.col("pid") == F.col("rpid"))
                  & (F.col("n") == F.col("rn"))
                  & (F.col("g") == F.col("rg")), "left")
          .groupBy("source", "n")
          .agg(F.sum(F.least("c", F.coalesce("rc", F.lit(0))))
               .cast("long").alias("clipped"),
               F.sum("c").cast("long").alias("total")))
    lens = (paired.groupBy("source")
            .agg(F.count("*").alias("n_pairs"),
                 F.sum(F.size("ct")).cast("long").alias("cand_tokens"),
                 F.sum(F.size("rt")).cast("long").alias("ref_tokens")))
    ps = (ov.groupBy("source")
          .agg(F.max(F.when(F.col("n") == 1, F.col("clipped"))).alias("c1"),
               F.max(F.when(F.col("n") == 1, F.col("total"))).alias("t1"),
               F.max(F.when(F.col("n") == 2, F.col("clipped"))).alias("c2"),
               F.max(F.when(F.col("n") == 2, F.col("total"))).alias("t2")))
    p1 = F.col("c1").cast("double") / F.col("t1")
    p2 = F.col("c2").cast("double") / F.col("t2")
    bp = F.exp(F.least(F.lit(0.0),
                       1.0 - F.col("ref_tokens").cast("double")
                       / F.col("cand_tokens")))
    bleu = F.when((F.coalesce("c1", F.lit(0)) == 0)
                  | (F.coalesce("c2", F.lit(0)) == 0)
                  | (F.col("cand_tokens") == 0), 0.0).otherwise(
        F.round(bp * F.exp(0.5 * (F.log(p1) + F.log(p2))), 4))
    return (lens.join(ps, "source")
            .select("source", "n_pairs", "cand_tokens", "ref_tokens",
                    F.round(p1, 6).alias("p1"),
                    F.round(p2, 6).alias("p2"),
                    bleu.alias("bleu2"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# q_successive_halving — hyperband-style budgeted model selection
# ---------------------------------------------------------------------------

# 27 configs, eta=3: rungs evaluate 27@1 -> 9@3 -> 3@9 epochs.
_SH_SEED = ":sh8"


def _sh_score_sql(cfg: str, rung: str) -> str:
    """Deterministic 'validation score' in exact integer basis points:
    a config-quality term (md5 of the config id) plus a rung-local
    fluctuation an order of magnitude smaller — good configs mostly
    stay good, so halving is meaningful but not trivial."""
    q = (f"(cast(('0x' || substr(md5(cast({cfg} as varchar) "
         f"|| '{_SH_SEED}'), 1, 6)) as bigint) % 5000)")
    n = (f"(cast(('0x' || substr(md5(cast({cfg} as varchar) || ':' "
         f"|| cast({rung} as varchar) || '{_SH_SEED}'), 1, 6)) "
         f"as bigint) % 500)")
    return f"({q} + {n} + 100 * {rung})"


@query(
    "q_successive_halving",
    oracle=f"""
    WITH cfgs AS (
      SELECT u.c AS cfg FROM (SELECT 1) one,
             unnest(range(0, 27)) AS u(c)
    ),
    r0 AS (
      SELECT cfg, 0 AS rung, 1 AS budget,
             {_sh_score_sql("cfg", "0")} AS score,
             row_number() OVER (ORDER BY {_sh_score_sql("cfg", "0")}
                                DESC, cfg) AS rk
      FROM cfgs
    ),
    r1 AS (
      SELECT cfg, 1 AS rung, 3 AS budget,
             {_sh_score_sql("cfg", "1")} AS score,
             row_number() OVER (ORDER BY {_sh_score_sql("cfg", "1")}
                                DESC, cfg) AS rk
      FROM r0 WHERE rk <= 9
    ),
    r2 AS (
      SELECT cfg, 2 AS rung, 9 AS budget,
             {_sh_score_sql("cfg", "2")} AS score,
             row_number() OVER (ORDER BY {_sh_score_sql("cfg", "2")}
                                DESC, cfg) AS rk
      FROM r1 WHERE rk <= 3
    ),
    allr AS (
      SELECT * FROM r0 UNION ALL SELECT * FROM r1
      UNION ALL SELECT * FROM r2
    )
    SELECT rung, budget,
           count(*) AS n_configs,
           cast(sum(budget) as bigint) AS epochs_spent,
           max(CASE WHEN rk = 1 THEN cfg END) AS best_cfg,
           max(CASE WHEN rk = 1 THEN score END) AS best_score
    FROM allr GROUP BY rung, budget ORDER BY rung
    """,
)
def q_successive_halving(spark, sf_dir):
    """Successive halving (the inner loop of Hyperband) — budgeted
    hyperparameter selection as pure relational algebra: 27 configs
    evaluate at 1 epoch, the top 9 advance to 3 epochs, the top 3 to
    9 epochs (eta = 3), every promotion an exact integer-score argmax
    with a deterministic tiebreak. Scores are md5-seeded basis points
    (config quality + a rung-local fluctuation one order smaller), so
    the rung tables are hash-checkable and the schedule spends
    27 + 27 + 27 epochs total — the log-factor-of-grid cost that makes
    SH the standard large-scale tuner. The sf fixture is not consumed
    (the config grid IS the data); at 100 TB each 'evaluation' is a
    training job keyed by cfg and the promotion logic is this exact
    window-rank shape over the results table.

    Exactness: integer scores, integer ranks, no floats anywhere."""
    cfgs = spark.range(27).select(F.col("id").cast("int").alias("cfg"))

    def score(rung: int):
        q = (F.conv(F.substring(
            F.md5(F.concat(F.col("cfg").cast("string"),
                           F.lit(_SH_SEED))), 1, 6), 16, 10)
            .cast("bigint") % 5000)
        n = (F.conv(F.substring(
            F.md5(F.concat(F.col("cfg").cast("string"), F.lit(":"),
                           F.lit(str(rung)), F.lit(_SH_SEED))), 1, 6),
            16, 10).cast("bigint") % 500)
        return q + n + 100 * rung

    wdesc = W.orderBy(F.desc("score"), "cfg")
    rungs = []
    cur = cfgs
    for rung, (budget, keep) in enumerate(((1, 9), (3, 3), (9, None))):
        r = (cur.select("cfg", F.lit(rung).alias("rung"),
                        F.lit(budget).alias("budget"),
                        score(rung).alias("score"))
             .withColumn("rk", F.row_number().over(wdesc)))
        rungs.append(r)
        if keep is not None:
            cur = r.filter(F.col("rk") <= keep).select("cfg")
    allr = rungs[0]
    for r in rungs[1:]:
        allr = allr.unionByName(r)
    return (allr.groupBy("rung", "budget")
            .agg(F.count("*").alias("n_configs"),
                 F.sum("budget").cast("long").alias("epochs_spent"),
                 F.max(F.when(F.col("rk") == 1, F.col("cfg")))
                 .alias("best_cfg"),
                 F.max(F.when(F.col("rk") == 1, F.col("score")))
                 .alias("best_score"))
            .orderBy("rung"))


# ---------------------------------------------------------------------------
# q_cohens_kappa — inter-annotator agreement (annotation QC)
# ---------------------------------------------------------------------------

@query(
    "q_cohens_kappa",
    oracle="""
    WITH labeled AS (
      SELECT event_type,
             CASE WHEN (event_id * 2654435761) % 100 < 60
                  THEN 1 ELSE 0 END AS a1,
             CASE WHEN ((CASE WHEN (event_id * 2654435761) % 100 < 60
                              THEN 1 ELSE 0 END)
                        + CASE WHEN (event_id * 40503) % 100 < 20
                               THEN 1 ELSE 0 END) % 2 = 1
                  THEN 1 ELSE 0 END AS a2
      FROM events
    ),
    per_type AS (
      SELECT event_type,
             cast(count(*) as hugeint) AS n,
             cast(sum(CASE WHEN a1 = a2 THEN 1 ELSE 0 END) as hugeint)
               AS agree,
             cast(sum(a1) as hugeint) AS y1,
             cast(sum(a2) as hugeint) AS y2
      FROM labeled GROUP BY event_type
    ),
    terms AS (
      SELECT event_type, n, agree, y1, y2,
             n * agree - y1 * y2 - (n - y1) * (n - y2) AS num,
             n * n - y1 * y2 - (n - y1) * (n - y2) AS den
      FROM per_type
    )
    SELECT event_type,
           cast(n as bigint) AS n_items,
           cast(agree as bigint) AS n_agree,
           cast((2 * agree * 1000000 + n) // (2 * n) as double) / 1e6
             AS p_observed,
           CASE WHEN den = 0 THEN NULL
                WHEN num >= 0 THEN
                  cast((2 * num * 1000000 + den) // (2 * den)
                       as double) / 1e6
                ELSE
                  -cast((2 * -num * 1000000 + den) // (2 * den)
                        as double) / 1e6
           END AS kappa
    FROM terms ORDER BY event_type
    """,
)
def q_cohens_kappa(spark, sf_dir):
    """Cohen's kappa — the inter-annotator agreement gate a labeled
    training set (RLHF preferences, quality labels) passes before the
    labels are trusted: two deterministic hash annotators with ~80%
    engineered agreement are compared per event_type, and kappa is
    computed EXACTLY as a rational of integer counts — with binary
    labels, kappa = (n·agree − y1y2 − (n−y1)(n−y2)) /
    (n² − y1y2 − (n−y1)(n−y2)) — then rounded at 6dp by integer
    half-away-from-zero division (VERDICT r9 item 3 discipline; no
    double quotient anywhere, and n² rides decimal(38,0)/hugeint so
    the arithmetic survives any corpus size). The all-one-label
    degenerate case (den = 0) returns NULL on both engines.

    Scale: one map-side-combined groupBy over the label pairs; the
    kappa arithmetic is per-group scalar work. At 100 TB the same
    query audits agreement per (annotator-pair, slice) by widening
    the grouping key."""
    e = load_table(spark, sf_dir, "events")
    a1 = F.when((F.col("event_id") * 2654435761) % 100 < 60, 1) \
        .otherwise(0)
    flip = F.when((F.col("event_id") * 40503) % 100 < 20, 1).otherwise(0)
    labeled = e.select(
        "event_type", a1.alias("a1"),
        ((a1 + flip) % 2).alias("a2"))
    per_type = (labeled.groupBy("event_type")
                .agg(F.count("*").cast("decimal(38,0)").alias("n"),
                     F.sum(F.when(F.col("a1") == F.col("a2"), 1)
                           .otherwise(0)).cast("decimal(38,0)")
                     .alias("agree"),
                     F.sum("a1").cast("decimal(38,0)").alias("y1"),
                     F.sum("a2").cast("decimal(38,0)").alias("y2")))
    terms = per_type.selectExpr(
        "event_type", "n", "agree",
        "n * agree - y1 * y2 - (n - y1) * (n - y2) AS num",
        "n * n - y1 * y2 - (n - y1) * (n - y2) AS den")
    return terms.selectExpr(
        "event_type",
        "cast(n as bigint) AS n_items",
        "cast(agree as bigint) AS n_agree",
        "cast((2 * agree * 1000000 + n) DIV (2 * n) as double) / 1e6"
        " AS p_observed",
        "CASE WHEN den = 0 THEN NULL"
        " WHEN num >= 0 THEN"
        "  cast((2 * num * 1000000 + den) DIV (2 * den) as double) / 1e6"
        " ELSE"
        "  -cast((2 * -num * 1000000 + den) DIV (2 * den) as double)"
        "   / 1e6 END AS kappa",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q_wer_cer — word/character error rate against a synthesized hypothesis
# ---------------------------------------------------------------------------

_WER_TOPK = 93  # printable ASCII 33..125 for in-vocab words; 126='~' OOV


@query(
    "q_wer_cer",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    toks AS (
      SELECT d.doc_id, d.lang, gs.i AS pos, d.t[gs.i] AS word
      FROM docs d JOIN range(1, 100000) gs(i) ON gs.i <= len(d.t)
      WHERE d.t[gs.i] <> ''
    ),
    vocab AS (
      SELECT word, row_number() OVER (ORDER BY count(*) DESC, word)
               AS rnk
      FROM toks GROUP BY word
    ),
    enc AS (
      SELECT word,
             CASE WHEN rnk <= {_WER_TOPK}
                  THEN chr(cast(32 + rnk as integer))
                  ELSE chr(126) END AS c
      FROM vocab
    ),
    hyp_toks AS (
      /* deterministic ASR-style corruption: every 7th word dropped,
         every 11th substituted with 'the' */
      SELECT doc_id, lang, pos,
             CASE WHEN pos % 11 = 0 THEN 'the' ELSE word END AS word
      FROM toks WHERE pos % 7 <> 0
    ),
    ref_s AS (
      SELECT t.doc_id, t.lang,
             string_agg(e.c, '' ORDER BY t.pos) AS s,
             count(*) AS n_words
      FROM toks t JOIN enc e ON e.word = t.word
      GROUP BY 1, 2
    ),
    hyp_s AS (
      SELECT h.doc_id, string_agg(e.c, '' ORDER BY h.pos) AS s
      FROM hyp_toks h JOIN enc e ON e.word = h.word
      GROUP BY 1
    ),
    per_doc AS (
      SELECT r.lang, r.n_words,
             levenshtein(r.s, coalesce(h.s, '')) AS w_edits,
             substr(d2.text, 1, 120) AS ref_p,
             substr((SELECT string_agg(word, ' ' ORDER BY pos)
                     FROM hyp_toks hh WHERE hh.doc_id = r.doc_id),
                    1, 120) AS hyp_p
      FROM ref_s r
      LEFT JOIN hyp_s h ON h.doc_id = r.doc_id
      JOIN documents d2 ON d2.doc_id = r.doc_id
    )
    SELECT lang,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(n_words) as bigint) AS ref_words,
           cast(sum(w_edits) as bigint) AS word_edits,
           cast((2 * sum(w_edits) * 10000 + sum(n_words))
                // (2 * sum(n_words)) as double) / 1e4 AS wer,
           cast(sum(length(ref_p)) as bigint) AS ref_chars,
           cast(sum(levenshtein(ref_p, coalesce(hyp_p, '')))
                as bigint) AS char_edits,
           cast((2 * sum(levenshtein(ref_p, coalesce(hyp_p, '')))
                   * 10000 + sum(length(ref_p)))
                // (2 * sum(length(ref_p))) as double) / 1e4 AS cer
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def q_wer_cer(spark, sf_dir):
    """Word and character error rate — the ASR/translation evaluation
    pair completing the eval family (BLEU/ROUGE/NDCG/MRR/kappa exist;
    WER/CER did not). A hypothesis transcript is synthesized per
    document by deterministic corruption (every 7th word dropped,
    every 11th substituted), then scored against the reference.

    WER needs WORD-level Levenshtein, which neither engine has — both
    only align characters. The classic reduction: encode each word as
    one character and run character Levenshtein on the encodings. The
    alphabet must stay single-byte ASCII because DuckDB's levenshtein
    counts BYTES while Spark's counts CODEPOINTS (measured: chr(2000)
    substitution scores 3 vs 1) — so the encoding is a CLOSED
    top-{k} vocabulary (frequency rank -> printable ASCII) with OOV
    folded to '~', the standard closed-vocab scoring practice. CER is
    computed directly on a bounded 120-char prefix (fixture text is
    ASCII, so byte==codepoint parity holds; the bound keeps the DP
    quadratic cell count per doc constant). Both rates are exact
    half-away-from-zero integer divisions at 4dp.

    Scale: one explode, a vocab-sized rank (Heaps-bounded), two
    ordered string_aggs per doc (keyed agg, map-side combined), one
    O(len^2)-bounded DP per doc inside codegen, one per-lang rollup.
    Embarrassingly parallel over documents."""
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select("doc_id", "lang",
                     F.posexplode(F.split("text", " "))
                     .alias("pos0", "word"))
            .filter(F.col("word") != "")
            .select("doc_id", "lang",
                    (F.col("pos0") + 1).alias("pos"), "word"))
    vocab = (toks.groupBy("word").agg(F.count("*").alias("cnt"))
             .select("word", F.row_number().over(
                 W.orderBy(F.desc("cnt"), "word")).alias("rnk")))
    enc = vocab.select(
        "word",
        F.when(F.col("rnk") <= _WER_TOPK,
               F.expr("chr(32 + rnk)")).otherwise(F.lit("~")).alias("c"))
    hyp_toks = (toks.filter(F.col("pos") % 7 != 0)
                .select("doc_id", "lang", "pos",
                        F.when(F.col("pos") % 11 == 0, F.lit("the"))
                        .otherwise(F.col("word")).alias("word")))

    def _agg_str(t, out):
        return (t.join(F.broadcast(enc), "word")
                .groupBy("doc_id")
                .agg(F.array_join(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"]), "").alias(out)))

    ref_meta = toks.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_words"))
    ref_s = _agg_str(toks, "ref_enc")
    hyp_s = _agg_str(hyp_toks, "hyp_enc")
    hyp_txt = hyp_toks.groupBy("doc_id").agg(
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "word"))),
            lambda s: s["word"]), " ").alias("hyp_text"))
    per_doc = (ref_meta
               .join(ref_s, "doc_id")
               .join(hyp_s, "doc_id", "left")
               .join(hyp_txt, "doc_id", "left")
               .join(d.select("doc_id",
                              F.expr("substr(text, 1, 120)")
                              .alias("ref_p")), "doc_id")
               .select(
                   "lang", "n_words",
                   F.levenshtein("ref_enc",
                                 F.coalesce("hyp_enc", F.lit("")))
                   .alias("w_edits"),
                   "ref_p",
                   F.expr("substr(coalesce(hyp_text, ''), 1, 120)")
                   .alias("hyp_p")))
    return (per_doc.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("ref_words"),
                 F.sum("w_edits").cast("long").alias("word_edits"),
                 F.expr("cast((2 * sum(w_edits) * 10000 + sum(n_words))"
                        " DIV (2 * sum(n_words)) as double) / 1e4")
                 .alias("wer"),
                 F.sum(F.length("ref_p")).cast("long")
                 .alias("ref_chars"),
                 F.sum(F.levenshtein("ref_p", "hyp_p")).cast("long")
                 .alias("char_edits"),
                 F.expr("cast((2 * sum(levenshtein(ref_p, hyp_p))"
                        " * 10000 + sum(length(ref_p)))"
                        " DIV (2 * sum(length(ref_p))) as double) / 1e4")
                 .alias("cer"))
            .orderBy("lang"))
