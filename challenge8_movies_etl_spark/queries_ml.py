"""Round-4 wave: ML-adjacent curation / audit / analytics operators.

No reference analog (the canonical assignment is a pandas ETL); these
are the operations a large-scale training-data pipeline layers on top
(BASELINE.json:6 north star): series diagnostics (ACF), portable table
audit fingerprints, k-anonymity suppression, deterministic epoch
shuffling, bigram language-model scoring, the SQL PIVOT text surface,
and integer-geohash spatial bucketing.

Hash-stability follows registry.py conventions: integer/decimal
arithmetic end-to-end where possible; floats only as a final
round-then-cast; every computed column aliased identically on both
engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import query
from .functions.hashsafe import davg, sql_davg
from .sources.fixtures import load_table
from .session import fan_out_scan

# ---------------------------------------------------------------------------
# q_acf — autocorrelation of the daily event-count series
# ---------------------------------------------------------------------------

# ACF in n-scaled integer form: with S = Σx over the n daily counts,
# r_h = Σ_t (n·x_t − S)(n·x_{t−h} − S) / Σ_t (n·x_t − S)² — every term
# is exact bigint arithmetic (counts are integers), so both engines
# reduce identically in any order; the single double division happens
# once at the end. (The usual (x−x̄) form would put a rational mean
# inside every product.)
_ACF_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts as date) AS d, count(*) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, count(*) AS n, sum(x) AS s
  FROM daily GROUP BY 1
),
ctr AS (
  SELECT d.event_type, d.d, st.n,
         st.n * d.x - st.s AS c
  FROM daily d JOIN st ON d.event_type = st.event_type
),
lagged AS (
  SELECT event_type, n, c,
         lag(c, 1) OVER w AS c1,
         lag(c, 2) OVER w AS c2,
         lag(c, 3) OVER w AS c3
  FROM ctr
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
agg AS (
  SELECT event_type,
         sum(cast(c as decimal(18,0)) * cast(c as decimal(18,0))) AS den,
         sum(cast(c as decimal(18,0)) * cast(c1 as decimal(18,0))) AS num1,
         sum(cast(c as decimal(18,0)) * cast(c2 as decimal(18,0))) AS num2,
         sum(cast(c as decimal(18,0)) * cast(c3 as decimal(18,0))) AS num3
  FROM lagged GROUP BY 1
)
SELECT event_type, gs.lag AS lag,
       round(cast(CASE gs.lag WHEN 1 THEN num1 WHEN 2 THEN num2
                  ELSE num3 END as double)
             / cast(den as double), 6) + 0.0 AS acf
FROM agg JOIN (SELECT unnest([1, 2, 3]) AS lag) gs ON true
"""


@query("q_acf", oracle=_ACF_ORACLE)
def q_acf(spark, sf_dir):
    """Autocorrelation (lags 1–3) of each event type's daily count
    series — the seasonality/burstiness diagnostic behind ingest
    monitoring and time-based train/test splits. Computed in n-scaled
    integer form (see oracle comment): all products are exact bigints,
    so the reduction is order-independent and the only float op is the
    final division.

    Scale: the daily rollup is one map-side-combined groupBy over the
    fact table; everything after runs on the |types|×|days| series
    relation — thousands of rows at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("x")))
    st = daily.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("x").alias("s"))
    ctr = (daily.join(st, "event_type")
           .select("event_type", "d",
                   (F.col("n") * F.col("x") - F.col("s")).alias("c")))
    w = W.partitionBy("event_type").orderBy("d")
    lagged = ctr.select(
        "event_type", "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 2).over(w).alias("c2"),
        F.lag("c", 3).over(w).alias("c3"))
    cdec = F.col("c").cast("decimal(18,0)")
    agg = lagged.groupBy("event_type").agg(
        F.sum(cdec * F.col("c").cast("decimal(18,0)")).alias("den"),
        F.sum(cdec * F.col("c1").cast("decimal(18,0)")).alias("num1"),
        F.sum(cdec * F.col("c2").cast("decimal(18,0)")).alias("num2"),
        F.sum(cdec * F.col("c3").cast("decimal(18,0)")).alias("num3"))
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("lag"))
    num = (F.when(F.col("lag") == 1, F.col("num1"))
           .when(F.col("lag") == 2, F.col("num2"))
           .otherwise(F.col("num3")))
    return (agg.crossJoin(F.broadcast(lags))
            .select("event_type", "lag",
                    F.round(num.cast("double")
                            / F.col("den").cast("double"), 6).alias("acf")))


# ---------------------------------------------------------------------------
# q_table_fingerprint — portable content checksum per partition bucket
# ---------------------------------------------------------------------------


@query(
    "q_table_fingerprint",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           cast(sum(cast(cast(('0x' || substr(md5(
                 cast(o_orderkey as varchar) || '|' ||
                 cast(o_custkey as varchar) || '|' ||
                 o_orderstatus || '|' || o_orderpriority), 1, 15))
               as bigint) as decimal(38,0)))
             % 1000000000000000000 as bigint) AS content_sum
    FROM orders
    GROUP BY 1
    """,
)
def q_table_fingerprint(spark, sf_dir):
    """Order-independent table content fingerprint per priority bucket:
    each row hashes to a 60-bit md5-derived integer over its key
    columns; the bucket checksum is the exact decimal SUM of those
    hashes (reduced mod 10¹⁸ so it stays a comparable bigint in any
    client) plus the row count. Two tables (or two replicas, or the same
    table before/after a migration) agree iff every bucket's
    (n_rows, content_sum) pair agrees — the audit primitive for 100 TB
    copies, where re-sorting for a diff is impossible but a
    commutative checksum is one map-side-combined pass. md5 is
    engine-portable (unlike xxhash64/murmur), so the fingerprint is
    comparable across Spark, DuckDB, or any SQL engine."""
    o = load_table(spark, sf_dir, "orders")
    row_hash = F.conv(F.substring(F.md5(F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"))), 1, 15), 16, 10).cast("decimal(38,0)")
    return (o.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 (F.sum(row_hash) % F.lit(10 ** 18).cast("decimal(38,0)"))
                 .cast("bigint").alias("content_sum")))


# ---------------------------------------------------------------------------
# q_k_anonymity — quasi-identifier suppression
# ---------------------------------------------------------------------------

_KANON_ORACLE = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n,
         {sql_davg('c_acctbal', 'avg_bal', gdp=2)}
  FROM customer GROUP BY 1, 2
)
SELECT cast(c_nationkey as varchar) AS nation, c_mktsegment AS segment,
       n, avg_bal
FROM g WHERE n >= 10
UNION ALL
SELECT '*' AS nation, '*' AS segment,
       cast(sum(n) as bigint) AS n,
       cast(CASE WHEN sum(cast(avg_bal * n as decimal(30,10))) >= 0
            THEN (2 * cast(sum(cast(avg_bal * n as decimal(30,10))) * 10000
                           as bigint) + sum(n)) // (2 * sum(n))
            ELSE -((2 * -cast(sum(cast(avg_bal * n as decimal(30,10))) * 10000
                              as bigint) + sum(n)) // (2 * sum(n)))
            END as double) / 10000 AS avg_bal
FROM g WHERE n < 10
HAVING count(*) > 0
"""


@query("q_k_anonymity", oracle=_KANON_ORACLE)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity enforcement over the (nation, segment)
    quasi-identifier: groups with fewer than k=10 members are collapsed
    into a single '*'-generalized row (count + weighted mean), so no
    released row describes fewer than k individuals — the
    privacy-governance gate a training-data release pipeline runs
    before publishing per-cohort statistics.

    Scale: one groupBy over the dimension table; the suppressed resid
    is an aggregate of the already-aggregated group relation."""
    c = load_table(spark, sf_dir, "customer")
    # both means go through exact integer half-away-from-zero division
    # (VERDICT r9 item 3): stage 1 averages 2dp money (boundary hits
    # need only 200*S_cents = odd*C), and stage 2's weighted mean of
    # 4dp stage-1 means over small n lives on a 1e-4 lattice — the
    # per-row (avg_bal * n) double is within n*ulp < 5e-11 of the
    # exact 4dp product, so the decimal(30,10) cast recovers it
    # exactly and the bigint T4 below is the exact scaled numerator.
    g = (c.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count("*").alias("n"),
              davg("c_acctbal", "avg_bal", gdp=2))
         ).persist()
    kept = g.filter(F.col("n") >= 10).select(
        F.col("c_nationkey").cast("string").alias("nation"),
        F.col("c_mktsegment").alias("segment"), "n", "avg_bal")
    _t4 = "cast(sum(cast(avg_bal * n as decimal(30,10))) * 10000 as bigint)"
    supp = (g.filter(F.col("n") < 10)
            .agg(F.sum("n").alias("n"),
                 F.expr(
                     f"cast(CASE WHEN {_t4} >= 0"
                     f" THEN (2 * {_t4} + sum(n)) DIV (2 * sum(n))"
                     f" ELSE -((2 * -{_t4} + sum(n)) DIV (2 * sum(n)))"
                     f" END as double) / 10000").alias("avg_bal"),
                 F.count("*").alias("_g"))
            .filter(F.col("_g") > 0)
            .select(F.lit("*").alias("nation"), F.lit("*").alias("segment"),
                    "n", "avg_bal"))
    return kept.unionByName(supp)


# ---------------------------------------------------------------------------
# q_agg_string — deterministic ordered string aggregation
# ---------------------------------------------------------------------------


@query(
    "q_agg_string",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ','
                      ORDER BY o_orderstatus) AS statuses,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders GROUP BY 1
    """,
)
def q_agg_string(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/STRING_AGG parity): the
    distinct status set per priority, sorted then joined — determinism
    comes from sorting the collected set, never from collection order
    (collect_set order is partition-dependent; the sort makes the
    result hash-stable at any parallelism)."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.concat_ws(",", F.array_sort(
                     F.collect_set("o_orderstatus"))).alias("statuses"),
                 F.countDistinct("o_orderstatus").alias("n_statuses")))


# ---------------------------------------------------------------------------
# q_ngram_lm — bigram language-model scoring with add-1 smoothing
# ---------------------------------------------------------------------------

_NGRAM_LM_ORACLE = """
WITH tok AS (
  SELECT doc_id, gs.i AS pos, t[gs.i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d
  JOIN range(1, 100000) gs(i) ON gs.i <= len(t)
  WHERE t[gs.i] != ''
),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
c1 AS (SELECT w1, count(*) AS n1 FROM big GROUP BY 1),
c2 AS (SELECT w1, w2, count(*) AS n12 FROM big GROUP BY 1, 2),
v AS (SELECT count(DISTINCT w) AS vocab FROM tok),
lp AS (
  SELECT c2.w1, c2.w2,
         cast(round(ln(cast(n12 + 1 as double)
                       / cast(n1 + vocab as double)), 6)
              as decimal(18,6)) AS logp6
  FROM c2 JOIN c1 ON c2.w1 = c1.w1 CROSS JOIN v
),
summed AS (
  SELECT b.doc_id, count(*) AS n_bigrams,
         cast(sum(lp.logp6 * 1000000) as bigint) AS s6
  FROM big b JOIN lp ON b.w1 = lp.w1 AND b.w2 = lp.w2
  GROUP BY 1
)
SELECT doc_id, n_bigrams,
       cast(CASE WHEN s6 >= 0
            THEN (2 * s6 * 10000 + n_bigrams * 1000000)
                 // (2 * n_bigrams * 1000000)
            ELSE -((2 * (-s6) * 10000 + n_bigrams * 1000000)
                   // (2 * n_bigrams * 1000000)) END as double)
         / 10000.0 AS avg_logp
FROM summed
"""


@query("q_ngram_lm", oracle=_NGRAM_LM_ORACLE)
def q_ngram_lm(spark, sf_dir):
    """Bigram language-model scoring with add-1 smoothing: corpus
    bigram/unigram counts define p(w2|w1) = (c12+1)/(c1+V); each doc
    scores its mean log-probability — one rung above q_lm_score's
    unigram model (context-sensitive: scrambled word order now scores
    low even when the unigram mix is normal). Log-probs are 6dp-rounded
    then decimal-summed (registry.py discipline), so the per-doc mean
    is order-independent bit-for-bit.

    Scale: bigram extraction is posexplode + a positional self-join
    within each doc (doc-keyed, co-partitioned); the LM relation is
    vocab²-bounded in principle but corpus-bigram-bounded in practice
    and broadcastable; per-doc scoring is one groupBy(doc_id)."""
    d = load_table(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.posexplode(F.split("text", " "))
                    .alias("pos", "w"))
           .filter(F.col("w") != ""))
    a, b = tok.alias("a"), tok.alias("b")
    big = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                  & (F.col("b.pos") == F.col("a.pos") + 1))
           .select(F.col("a.doc_id").alias("doc_id"),
                   F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
           ).persist()
    c1 = big.groupBy("w1").agg(F.count("*").alias("n1"))
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    v = tok.agg(F.countDistinct("w").alias("vocab"))
    lp = (c2.join(c1, "w1").crossJoin(F.broadcast(v))
          .select("w1", "w2",
                  F.round(F.log((F.col("n12") + 1).cast("double")
                                / (F.col("n1") + F.col("vocab"))
                                .cast("double")), 6)
                  .cast("decimal(18,6)").alias("logp6")))
    summed = (big.join(lp, ["w1", "w2"])
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_bigrams"),
                   F.sum((F.col("logp6") * 1000000).cast("long"))
                   .alias("s6")))
    # exact integer half-away-from-zero mean (the q_lm_score fix —
    # both engines' 4dp rounding of a double quotient disagree when
    # the true rational sits exactly on the half boundary, which the
    # r9 sf1.0 sweep caught here too)
    avg4 = F.expr(
        "CASE WHEN s6 >= 0 THEN"
        " (2 * s6 * 10000 + n_bigrams * 1000000)"
        " DIV (2 * n_bigrams * 1000000)"
        " ELSE -((2 * (-s6) * 10000 + n_bigrams * 1000000)"
        " DIV (2 * n_bigrams * 1000000)) END")
    return summed.select(
        "doc_id", "n_bigrams",
        (avg4.cast("double") / 10000.0).alias("avg_logp"))


# ---------------------------------------------------------------------------
# q_shuffle_deterministic — seeded epoch shuffle + shard assignment
# ---------------------------------------------------------------------------

_SHUFFLE_ORACLE = """
WITH r AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY md5('s42:' || cast(doc_id as varchar)), doc_id) AS rk
  FROM documents
)
SELECT doc_id,
       cast((rk - 1) // 64 as bigint) AS shard,
       cast((rk - 1) % 64 as bigint) AS pos
FROM r
"""


@query("q_shuffle_deterministic", oracle=_SHUFFLE_ORACLE)
def q_shuffle_deterministic(spark, sf_dir):
    """Seeded deterministic epoch shuffle: every doc ranks by
    md5(seed || doc_id) (doc_id tie-break), then packs into fixed-size
    shards of 64 with an intra-shard position — reproducible global
    permutation for training-order randomization, identical on any
    engine/parallelism (no rand(), no partition dependence; change the
    seed string for the next epoch).

    Scale: one global sort by the hash — at 100 TB this is a
    range-partitioned sort (Spark's sort-shuffle machinery), the same
    cost as any total ordering; shard/pos are then pure arithmetic on
    the rank."""
    d = load_table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        W.orderBy(F.md5(F.concat(F.lit("s42:"),
                                 F.col("doc_id").cast("string"))),
                  "doc_id"))
    return (d.select("doc_id", rk.alias("rk"))
            .select("doc_id",
                    F.expr("(rk - 1) DIV 64").alias("shard"),
                    F.expr("cast((rk - 1) % 64 as bigint)").alias("pos")))


# ---------------------------------------------------------------------------
# q_sql_pivot — the textual PIVOT surface
# ---------------------------------------------------------------------------

_SQL_PIVOT_SPARK = """
SELECT * FROM (
  SELECT user_id % 50 AS cohort, event_type FROM events
)
PIVOT (
  count(event_type) FOR event_type IN
    ('click', 'view', 'purchase', 'signup', 'error')
)
ORDER BY cohort
"""


@query(
    "q_sql_pivot",
    oracle="""
    SELECT user_id % 50 AS cohort,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events
    GROUP BY 1 ORDER BY cohort
    """,
)
def q_sql_pivot(spark, sf_dir):
    """The textual PIVOT clause (SQL-surface family, beside
    q_sql_surface/_lateral/_recursive): Spark parses the PIVOT syntax
    into the same two-phase pivot plan as the DataFrame API
    (q_pivot); explicit IN-list values keep the plan single-pass (no
    distinct-scan for column discovery) — the same reason q_pivot
    passes `values=` at 100 TB. Oracle is the equivalent conditional
    aggregation."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    df = spark.sql(_SQL_PIVOT_SPARK)
    # PIVOT count(*) yields nullable counts for absent combos; align
    # with the oracle's 0-valued conditional counts
    return df.fillna(0, subset=[c for c in df.columns if c != "cohort"])


# ---------------------------------------------------------------------------
# q_spatial_geohash — integer z-order geohash bucketing
# ---------------------------------------------------------------------------

def _interleave_sql(xcol: str, ycol: str, bits: int = 12) -> str:
    """Unrolled Morton interleave expression (portable SQL arithmetic:
    shifts expressed as integer multiply/divide so the same text runs
    on Spark and DuckDB)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({xcol}) // {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"((({ycol}) // {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


_GEO_SYNTH = """
  SELECT c_custkey,
         (c_custkey * 37) % 18000 AS lat_c,
         (c_custkey * 73) % 36000 AS lon_c
  FROM customer
"""

_GEO_CELLS = f"""
  SELECT c_custkey,
         (lat_c * 4096) // 18000 AS ycell,
         (lon_c * 4096) // 36000 AS xcell
  FROM ({_GEO_SYNTH})
"""

_GEOHASH_ORACLE = f"""
WITH cells AS ({_GEO_CELLS}),
z AS (
  SELECT c_custkey, {_interleave_sql('xcell', 'ycell')} AS zcell
  FROM cells
)
SELECT zcell, count(*) AS n,
       min(c_custkey) AS first_key
FROM z
GROUP BY 1
ORDER BY n DESC, zcell
LIMIT 20
"""


@query("q_spatial_geohash", oracle=_GEOHASH_ORACLE)
def q_spatial_geohash(spark, sf_dir):
    """Integer z-order (Morton) geohash bucketing: synthetic-but-
    deterministic lat/lon per customer quantize to a 4096² grid whose
    x/y bits interleave into one 24-bit cell id; top-20 densest cells.
    The interleave is unrolled integer arithmetic — the same expression
    text runs on both engines, all exact.

    The z-cell is the standard spatial co-location key: range
    predicates on the curve approximate 2-D windows (cf. the z-order
    layout query q_zorder_layout), and a cell-equality join is the
    blocked/bucketed form of spatial join (q_spatial_join's grid
    blocking with one key instead of two). One groupBy on the cell id;
    at 100 TB the curve key doubles as the partition/sort key so cell
    scans prune."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.selectExpr(
        "c_custkey",
        "((c_custkey * 37) % 18000) * 4096 DIV 18000 AS ycell",
        "((c_custkey * 73) % 36000) * 4096 DIV 36000 AS xcell")
    z = cells.selectExpr(
        "c_custkey",
        _interleave_sql("xcell", "ycell").replace("//", "DIV") + " AS zcell")
    return (z.groupBy("zcell")
            .agg(F.count("*").alias("n"), F.min("c_custkey").alias("first_key"))
            .orderBy(F.desc("n"), "zcell").limit(20))


# ---------------------------------------------------------------------------
# q_kmeans — fixed-iteration Lloyd's over the embedding corpus
# ---------------------------------------------------------------------------

from .operators.kmeans import kmeans, kmeans_oracle_sql  # noqa: E402


@query("q_kmeans", oracle=kmeans_oracle_sql(k=4, iterations=2))
def q_kmeans(spark, sf_dir):
    """Distributed k-means (k=4, 2 Lloyd iterations, seeded by the 4
    lowest-vec_id embeddings) — the corpus-clustering primitive behind
    IVF index construction (operators/similarity.py), topic bucketing,
    and diversity sampling. Fully value-hash-checked: the iterative
    loop is deterministic enough to unroll into chained SQL CTEs
    (operators/kmeans.py kmeans_oracle_sql, same construction as
    pagerank's oracle) — distances are exact decimal sums of
    10dp-rounded per-dim terms, assignments tie-break by centroid
    index, centroid updates are decimal-sum/count means rounded 6dp.

    Scale: assignment is zero-shuffle codegen against broadcast
    centroids; each update shuffles only k x d partial sums
    (map-side-combined); the driver holds nothing beyond the k x d
    centroid matrix. Output: per-cluster size + final centroid norm."""
    e = load_table(spark, sf_dir, "embeddings")
    # fan the single-row-group scan out BEFORE the assignment folds:
    # the fixture parquet is one row group = one scan partition, so
    # the exact-decimal distance reductions (interpreted zip_with/
    # aggregate, the per-row heavy step) otherwise run on ONE core
    # (optimization round r11)
    vecs = (fan_out_scan(e, "vec_id")
            .select("vec_id", "embedding"))
    init_rows = (vecs.orderBy("vec_id").limit(4)
                 .select("embedding").collect())
    init = [[float(x) for x in r["embedding"]] for r in init_rows]
    assigned, cents = kmeans(vecs, init, iterations=2)
    cent_rows = [(idx, float(c)) for idx, cent in enumerate(cents)
                 for c in cent]
    cdf = spark.createDataFrame(cent_rows, "idx int, c double")
    c6 = F.col("c").cast("decimal(12,6)")
    norms = (cdf.groupBy("idx")
             .agg(F.round(F.sum(c6 * c6).cast("double"), 6).alias("cnorm")))
    return (assigned.groupBy("cluster")
            .agg(F.count("*").alias("n"))
            .join(norms, F.col("cluster") == F.col("idx"))
            .select("cluster", "n", "cnorm")
            .orderBy("cluster"))


# ---------------------------------------------------------------------------
# q_countmin_topk — count-min sketch frequency estimation
# ---------------------------------------------------------------------------

_CM_D, _CM_W = 4, 64

_CM_HASH_DUCK = ("cast(('0x' || substr(md5(cast(user_id as varchar) "
                 "|| ':{j}'), 1, 8)) as bigint) % 64")
_CM_ORACLE = f"""
WITH h AS (
  SELECT user_id,
         {", ".join(f"{_CM_HASH_DUCK.format(j=j)} AS b{j}"
                    for j in range(_CM_D))}
  FROM events
),
{", ".join(f'''cm{j} AS (
  SELECT b{j} AS bucket, count(*) AS cnt FROM h GROUP BY 1
)''' for j in range(_CM_D))},
keys AS (
  SELECT DISTINCT user_id,
         {", ".join(f"b{j}" for j in range(_CM_D))}
  FROM h
)
SELECT k.user_id,
       least({", ".join(f"cm{j}.cnt" for j in range(_CM_D))}) AS est
FROM keys k
{" ".join(f"JOIN cm{j} ON cm{j}.bucket = k.b{j}" for j in range(_CM_D))}
ORDER BY est DESC, k.user_id
LIMIT 20
"""


@query("q_countmin_topk", oracle=_CM_ORACLE)
def q_countmin_topk(spark, sf_dir):
    """Count-min sketch frequency estimation: a 4x64 counter matrix
    (md5-derived row hashes, so both engines build the identical
    sketch) over event user_ids; every key's estimate is the min of its
    4 counters, top-20 by estimate. Estimates overcount under
    collisions by construction — deterministically, since the hash
    family is fixed, so even the collision error is value-hash-checked.
    Completes the mergeable-sketch family (q_minhash_reagg HLL/minhash
    unions, q_percentile_approx KLL): count-min is the frequency
    member — sketches of shards ADD cell-wise.

    Scale: the sketch build is 4 map-side-combined groupBys on a
    64-cell domain (or one pass with a 4x64 array accumulator); the
    d x w matrix broadcasts for estimation — no shuffle touches the
    fact table beyond the counter reduction."""
    e = load_table(spark, sf_dir, "events")
    def bucket(j):
        return (F.conv(F.substring(F.md5(F.concat(
            F.col("user_id").cast("string"), F.lit(f":{j}"))), 1, 8),
            16, 10).cast("bigint") % _CM_W)
    h = e.select("user_id", *[bucket(j).alias(f"b{j}")
                              for j in range(_CM_D)]).persist()
    keys = h.distinct()
    est = None
    out = keys
    for j in range(_CM_D):
        cm = (h.groupBy(F.col(f"b{j}").alias("bucket"))
              .agg(F.count("*").alias(f"cnt{j}")))
        out = out.join(F.broadcast(cm), out[f"b{j}"] == cm["bucket"]) \
                 .drop("bucket")
    est = F.least(*[F.col(f"cnt{j}") for j in range(_CM_D)])
    return (out.select("user_id", est.alias("est"))
            .orderBy(F.desc("est"), "user_id").limit(20))


# ---------------------------------------------------------------------------
# q_bloom_prefilter — explicit Bloom-filter runtime join filter
# ---------------------------------------------------------------------------

_BLOOM_M, _BLOOM_K = 2048, 3

_BLOOM_HASH_DUCK = ("cast(('0x' || substr(md5(cast({key} as varchar) "
                    "|| ':bf{j}'), 1, 8)) as bigint) % 2048")

_BLOOM_ORACLE = f"""
WITH hi AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
),
bits AS (
  {" UNION ".join(f"SELECT DISTINCT {_BLOOM_HASH_DUCK.format(key='o_custkey', j=j)} AS pos FROM hi"
                  for j in range(_BLOOM_K))}
),
cand AS (
  SELECT c.c_custkey FROM customer c
  {" ".join(f"JOIN bits b{j} ON b{j}.pos = {_BLOOM_HASH_DUCK.format(key='c.c_custkey', j=j)}"
            for j in range(_BLOOM_K))}
)
SELECT count(*) AS n_candidates,
       count(CASE WHEN hi.o_custkey IS NOT NULL THEN 1 END) AS n_true,
       count(CASE WHEN hi.o_custkey IS NULL THEN 1 END) AS n_false_pos
FROM cand LEFT JOIN hi ON hi.o_custkey = cand.c_custkey
"""


@query("q_bloom_prefilter", oracle=_BLOOM_ORACLE)
def q_bloom_prefilter(spark, sf_dir):
    """Explicit Bloom-filter join prefilter: the distinct high-value
    order custkeys set 3 md5-derived bits each in a 2048-bit filter;
    customers whose 3 bits are all set become join candidates. Reports
    candidate/true/false-positive counts — the false positives are
    deterministic (fixed hash family), so the filter's soundness
    (n_true == |actual matches|, candidates ⊇ matches) is value-hash-
    checked, not just tested. This is Spark's runtime bloom-filter
    pushdown (spark.sql.optimizer.runtime.bloomFilter) made explicit
    and portable: at 100 TB the bit set (256 B here, KBs generally)
    broadcasts to pre-filter the probe scan so the join shuffles only
    ~matching rows.

    Scale: bit positions are a distinct-agg over the build side; the
    membership check is k broadcast semi-joins (equivalently one
    broadcast bitmask map) — no fact-table shuffle."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def hpos(col, j):
        return (F.conv(F.substring(F.md5(F.concat(
            col.cast("string"), F.lit(f":bf{j}"))), 1, 8),
            16, 10).cast("bigint") % _BLOOM_M)

    hi = (o.filter(F.col("o_totalprice") > 400000)
          .select("o_custkey").distinct().persist())
    bits = None
    for j in range(_BLOOM_K):
        b = hi.select(hpos(F.col("o_custkey"), j).alias("pos")).distinct()
        bits = b if bits is None else bits.unionByName(b)
    bits = bits.distinct()
    cand = c.select("c_custkey")
    for j in range(_BLOOM_K):
        bj = bits.select(F.col("pos").alias(f"pos{j}"))
        cand = cand.join(F.broadcast(bj),
                         hpos(F.col("c_custkey"), j) == F.col(f"pos{j}")) \
                   .drop(f"pos{j}")
    joined = cand.join(hi, cand.c_custkey == hi.o_custkey, "left")
    return joined.agg(
        F.count("*").alias("n_candidates"),
        F.count(F.when(F.col("o_custkey").isNotNull(), 1)).alias("n_true"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_false_pos"))


# ---------------------------------------------------------------------------
# q_naive_bayes — Bernoulli NB: distributed training + inference
# ---------------------------------------------------------------------------

_NB_VOCAB = ("fast", "slow", "table", "value", "the",
             "a", "data", "join", "row", "spark")


def _nb_score(prefix: str) -> str:
    """Fixed-order log-likelihood sum; `prefix` resolves the model
    columns (dialect-neutral). Left-associated additions of lns of
    integer-derived doubles — identical IEEE sequence on both
    engines."""
    terms = [f"ln(cast({prefix}n_l as double) / n_train)"]
    for i in range(len(_NB_VOCAB)):
        p = f"(({prefix}df_{i} + 1.0) / ({prefix}n_l + 2.0))"
        terms.append(f"(CASE WHEN has_{i} = 1 THEN ln({p}) "
                     f"ELSE ln(1.0 - {p}) END)")
    return " + ".join(terms)


def _nb_oracle() -> str:
    has = ",\n             ".join(
        f"CASE WHEN list_contains(string_split(text, ' '), "
        f"'{t}') THEN 1 ELSE 0 END AS has_{i}"
        for i, t in enumerate(_NB_VOCAB))
    dfs = ",\n             ".join(
        f"sum(has_{i}) AS df_{i}" for i in range(len(_NB_VOCAB)))
    return f"""
    WITH feat AS (
      SELECT doc_id, lang, doc_id % 5 = 4 AS is_test,
             {has}
      FROM documents
    ),
    model AS (
      SELECT lang AS m_lang, count(*) AS n_l,
             {dfs},
             sum(count(*)) OVER () AS n_train
      FROM feat WHERE NOT is_test GROUP BY lang
    ),
    scored AS (
      SELECT f.doc_id, f.lang AS true_lang, m.m_lang,
             row_number() OVER (
               PARTITION BY f.doc_id
               ORDER BY ({_nb_score('m.')}) DESC, m.m_lang) AS rk
      FROM feat f CROSS JOIN model m
      WHERE f.is_test
    )
    SELECT true_lang, m_lang AS pred_lang,
           cast(count(*) as bigint) AS n
    FROM scored WHERE rk = 1
    GROUP BY true_lang, m_lang
    ORDER BY true_lang, pred_lang
    """


@query("q_naive_bayes", oracle=_nb_oracle())
def q_naive_bayes(spark, sf_dir):
    """Bernoulli Naive Bayes, trained AND applied in one plan: token-
    presence features over a fixed 10-token vocabulary, per-class
    document frequencies from the 80% train split (ONE aggregation —
    the sufficient statistics of NB), Laplace-smoothed log-likelihood
    scoring of the 20% test split against the broadcast 5-row model,
    argmax with a class tie-break, and the confusion matrix out.

    Training a model at 100 TB is exactly this shape: sufficient
    statistics by aggregation, model broadcast back for inference —
    no parameter server needed for count-based models. The fixture
    corpus draws tokens language-independently, so the learned model
    is honestly close to a prior classifier here; the query verifies
    the COMPUTATION (the oracle re-derives the same model and argmax;
    outputs are pure integers, so the hash carries no float-rounding
    exposure — the only float is the ln-sum ORDER, generated
    left-associated on both engines)."""
    d = load_table(spark, sf_dir, "documents")
    feat = d.select(
        "doc_id", "lang", (F.col("doc_id") % 5 == 4).alias("is_test"),
        *[F.array_contains(F.split("text", " "), t).cast("int")
          .alias(f"has_{i}") for i, t in enumerate(_NB_VOCAB)])
    train = feat.filter(~F.col("is_test"))
    w = W.partitionBy()
    model = (train.groupBy(F.col("lang").alias("m_lang"))
             .agg(F.count("*").alias("n_l"),
                  *[F.sum(f"has_{i}").alias(f"df_{i}")
                    for i in range(len(_NB_VOCAB))])
             .withColumn("n_train", F.sum("n_l").over(w)))
    test = feat.filter("is_test")
    scored = (test.crossJoin(F.broadcast(model))
              .withColumn("score", F.expr(_nb_score(""))))
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("score"), "m_lang"))
    return (scored.withColumn("rk", rk).filter(F.col("rk") == 1)
            .groupBy(F.col("lang").alias("true_lang"),
                     F.col("m_lang").alias("pred_lang"))
            .agg(F.count("*").alias("n"))
            .orderBy("true_lang", "pred_lang"))


# ---------------------------------------------------------------------------
# q_ridge_2feat — closed-form ridge regression via Gram sufficient stats
# ---------------------------------------------------------------------------

_RIDGE_LAM = "100.0"


@query(
    "q_ridge_2feat",
    oracle=f"""
    WITH pts AS (
      SELECT value AS x1,
             cast(event_id % 100 as double) AS x2,
             value * 2.0 + (event_id % 100) * 0.5
               + (event_id % 9) AS y
      FROM events
    ),
    g AS (
      SELECT count(*) AS n,
             cast(sum(cast(x1 * x1 as decimal(30,10))) as double) AS g11,
             cast(sum(cast(x1 * x2 as decimal(30,10))) as double) AS g12,
             cast(sum(cast(x2 * x2 as decimal(30,10))) as double) AS g22,
             cast(sum(cast(x1 * y as decimal(30,10))) as double) AS b1,
             cast(sum(cast(x2 * y as decimal(30,10))) as double) AS b2
      FROM pts
    )
    SELECT n,
           round((b1 * (g22 + {_RIDGE_LAM})
                  - g12 * b2)
                 / ((g11 + {_RIDGE_LAM}) * (g22 + {_RIDGE_LAM})
                    - g12 * g12), 6) + 0.0 AS w1,
           round((b2 * (g11 + {_RIDGE_LAM})
                  - g12 * b1)
                 / ((g11 + {_RIDGE_LAM}) * (g22 + {_RIDGE_LAM})
                    - g12 * g12), 6) + 0.0 AS w2
    FROM g
    """,
)
def q_ridge_2feat(spark, sf_dir):
    """Closed-form ridge regression (no intercept, 2 features): ONE
    aggregation pass collects the Gram matrix and moment vector as
    decimal-exact sums, then w = (G + λI)⁻¹ b via the explicit 2x2
    inverse — identical double algebra on both engines from identical
    exact sums. This is the sketch-and-solve template every
    linear-model fit at 100 TB follows: sufficient statistics by
    map-side-combining aggregation (d² + d values total, independent
    of row count), solve on the driver-sized result. The y synthesis
    (2·x1 + 0.5·x2 + uniform{0..8} noise) gives a well-conditioned
    system whose recovered weights the tests pin near truth; λ = 100
    is large enough to measurably shrink w1 (test-asserted) so the
    regularization path is exercised, not decorative."""
    e = load_table(spark, sf_dir, "events")
    lam = float(_RIDGE_LAM)
    DEC = "decimal(30,10)"
    pts = e.select(
        F.col("value").alias("x1"),
        (F.col("event_id") % 100).cast("double").alias("x2"),
        (F.col("value") * 2.0 + (F.col("event_id") % 100) * 0.5
         + (F.col("event_id") % 9)).alias("y"))
    g = pts.agg(
        F.count("*").alias("n"),
        F.sum((F.col("x1") * F.col("x1")).cast(DEC)).cast("double")
         .alias("g11"),
        F.sum((F.col("x1") * F.col("x2")).cast(DEC)).cast("double")
         .alias("g12"),
        F.sum((F.col("x2") * F.col("x2")).cast(DEC)).cast("double")
         .alias("g22"),
        F.sum((F.col("x1") * F.col("y")).cast(DEC)).cast("double")
         .alias("b1"),
        F.sum((F.col("x2") * F.col("y")).cast(DEC)).cast("double")
         .alias("b2"))
    det = ((F.col("g11") + lam) * (F.col("g22") + lam)
           - F.col("g12") * F.col("g12"))
    w1 = (F.col("b1") * (F.col("g22") + lam)
          - F.col("g12") * F.col("b2")) / det
    w2 = (F.col("b2") * (F.col("g11") + lam)
          - F.col("g12") * F.col("b1")) / det
    return g.select("n",
                    (F.round(w1, 6) + 0.0).alias("w1"),
                    (F.round(w2, 6) + 0.0).alias("w2"))


# ---------------------------------------------------------------------------
# q_logistic_train — distributed Newton/IRLS logistic regression
# ---------------------------------------------------------------------------

_LOGIT_ITERS = 3
# per-row sigmoid quantization (q_quality_classifier discipline) with
# an epsilon clamp so the log-loss never sees ln(0)
_LOGIT_P = ("least(greatest(cast(round(1.0 / (1.0 + exp(-({z}))), 6)"
            " as decimal(8,6)), cast(0.000001 as decimal(8,6))),"
            " cast(0.999999 as decimal(8,6)))")


def _logit_newton_sql(prev: str, step: str) -> str:
    """One unrolled Newton step: sufficient statistics over feat with
    beta from CTE `prev`, closed-form 2x2 solve, 6dp-rounded update."""
    z = f"b.b0 + b.b1 * cast(t.xd as double)"
    return f"""
s{step} AS (
  SELECT
    sum(y - p) AS g0, sum((y - p) * xd) AS g1,
    sum(p * (1 - p)) AS h00,
    sum(p * (1 - p) * xd) AS h01,
    sum(p * (1 - p) * xd * xd) AS h11,
    max(b0) AS b0, max(b1) AS b1
  FROM (SELECT t.xd, t.y, b.b0, b.b1,
               {_LOGIT_P.format(z=z)} AS p
        FROM feat t CROSS JOIN {prev} b) q
),
b{step} AS (
  SELECT
    round(b0 + (cast(h11 as double) * cast(g0 as double)
                - cast(h01 as double) * cast(g1 as double))
               / (cast(h00 as double) * cast(h11 as double)
                  - cast(h01 as double) * cast(h01 as double)), 6) AS b0,
    round(b1 + (cast(h00 as double) * cast(g1 as double)
                - cast(h01 as double) * cast(g0 as double))
               / (cast(h00 as double) * cast(h11 as double)
                  - cast(h01 as double) * cast(h01 as double)), 6) AS b1
  FROM s{step}
)"""


def _logit_oracle() -> str:
    steps = ",".join(_logit_newton_sql(f"b{i - 1}" if i > 1 else "b0", i)
                     for i in range(1, _LOGIT_ITERS + 1))
    zf = f"b.b0 + b.b1 * cast(t.xd as double)"
    return f"""
WITH feat AS (
  SELECT cast(round((l_quantity - 25) / 25, 4) as decimal(8,4)) AS xd,
         CASE WHEN l_extendedprice % 100 < 2 * l_quantity
              THEN 1 ELSE 0 END AS y
  FROM lineitem
),
b0 AS (SELECT cast(0.0 as double) AS b0, cast(0.0 as double) AS b1),
{steps},
scored AS (
  SELECT t.y, b.b0, b.b1, {_LOGIT_P.format(z=zf)} AS p
  FROM feat t CROSS JOIN b{_LOGIT_ITERS} b
)
SELECT cast(count(*) as bigint) AS n,
       cast(sum(y) as bigint) AS n_pos,
       max(b0) AS beta0, max(b1) AS beta1,
       cast(round(sum(cast(round(CASE WHEN y = 1
                                      THEN -ln(cast(p as double))
                                      ELSE -ln(1 - cast(p as double)) END, 6)
                          as decimal(14,6))), 4) as double) AS log_loss,
       cast(sum(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END)
            as bigint) AS n_correct
FROM scored
"""


@query("q_logistic_train", oracle=_logit_oracle())
def q_logistic_train(spark, sf_dir):
    """TRAIN a logistic-regression classifier inside the engine —
    3 Newton/IRLS iterations for p(y | quantity), where the label is
    1 iff the price's uniform last-two-digits fall under 2*quantity —
    i.e. TRUE P(y=1|q) = q/50, a monotone signal the fixture's
    independent columns don't otherwise offer (fmod on doubles is
    IEEE-exact, so the label is deterministic on both engines) — the
    distributed trainer behind CCNet/GPT-3-style quality classifiers
    (q_quality_classifier runs inference with pinned weights; this is
    where such weights come from). Each iteration is ONE aggregate
    pass collecting the five sufficient statistics (gradient + 2x2
    Hessian) followed by a closed-form solve on the driver — the
    classic "statistics to the driver, never the data" pattern (same
    bounded-collect contract as kmeans' k centroids: 5 scalars/round).

    Hash-safety: the per-row sigmoid is quantized to decimal(8,6)
    (the q_quality_classifier discipline) and every SUM runs over
    exact decimals, so both engines reduce identical rationals in any
    order; the Newton solve consumes those exact sums as doubles with
    an identical operation tree, and each beta is 6dp-rounded before
    re-entering the data pass. The oracle unrolls the same 3 steps as
    chained CTEs — an ITERATIVE trainer, value-hash-checked.

    Scale: 3 aggregate-only passes + 1 metrics pass, all map-side
    partials over exact decimals; nothing but 7 scalars ever leaves
    the executors, and nothing is ever quadratic. At 100 TB you'd
    persist `feat` columnar once and reuse it across passes."""
    li = load_table(spark, sf_dir, "lineitem")
    # round-robin fan-out before the persist: lineitem scans as 3
    # single-row-group partitions, which serialized every Newton
    # pass's sigmoid + exact-decimal reduction onto 3 cores
    # (optimization round r11). Row order cannot matter: the decimal
    # sums are exact and order-independent.
    feat = li.select(
        F.round((F.col("l_quantity") - 25) / 25, 4)
        .cast("decimal(8,4)").alias("xd"),
        F.when(F.col("l_extendedprice") % 100 < 2 * F.col("l_quantity"), 1)
        .otherwise(0).alias("y"))
    feat = fan_out_scan(feat).persist()

    def p_col(b0: float, b1: float):
        z = F.lit(b0) + F.lit(b1) * F.col("xd").cast("double")
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6) \
             .cast("decimal(8,6)")
        return F.least(F.greatest(p, F.lit(0.000001).cast("decimal(8,6)")),
                       F.lit(0.999999).cast("decimal(8,6)"))

    b0, b1 = 0.0, 0.0
    for _ in range(_LOGIT_ITERS):
        s = (feat.withColumn("p", p_col(b0, b1))
             .agg(F.sum(F.col("y") - F.col("p")).alias("g0"),
                  F.sum((F.col("y") - F.col("p")) * F.col("xd")).alias("g1"),
                  F.sum(F.col("p") * (1 - F.col("p"))).alias("h00"),
                  F.sum(F.col("p") * (1 - F.col("p")) * F.col("xd"))
                  .alias("h01"),
                  F.sum(F.col("p") * (1 - F.col("p")) * F.col("xd")
                        * F.col("xd")).alias("h11"))
             .collect()[0])
        g0, g1 = float(s.g0), float(s.g1)
        h00, h01, h11 = float(s.h00), float(s.h01), float(s.h11)
        det = h00 * h11 - h01 * h01
        # SQL round() is HALF_UP, python's is banker's — they only
        # differ on exact half-boundary doubles, unreachable from a
        # Newton step's irrational-valued update (registry convention)
        b0 = _half_up6(b0 + (h11 * g0 - h01 * g1) / det)
        b1 = _half_up6(b1 + (h00 * g1 - h01 * g0) / det)

    scored = feat.withColumn("p", p_col(b0, b1))
    ll_t = F.round(
        F.when(F.col("y") == 1, -F.log(F.col("p").cast("double")))
        .otherwise(-F.log(1 - F.col("p").cast("double"))), 6) \
        .cast("decimal(14,6)")
    return scored.agg(
        F.count("*").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.lit(b0).alias("beta0"), F.lit(b1).alias("beta1"),
        F.round(F.sum(ll_t), 4).cast("double").alias("log_loss"),
        F.sum(F.when((F.col("p") >= 0.5) == (F.col("y") == 1), 1)
              .otherwise(0)).cast("long").alias("n_correct"))


def _half_up6(x: float) -> float:
    """HALF_UP 6dp round matching SQL round() semantics on doubles."""
    import decimal
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# q_dedup_semdedup — SemDeDup: kmeans-bucketed greedy semantic dedup
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.35


def _semdedup_oracle() -> str:
    from .operators.kmeans import kmeans_cte_chain
    dec = "decimal(18,10)"

    def dsum(x: str, y: str) -> str:
        return (f"cast(sum(cast(cast({x}[gs.i] as double) * "
                f"cast({y}[gs.i] as double) as {dec})) as double)")

    return f"""
WITH {kmeans_cte_chain(4, 2)},
memb AS (
  SELECT a.vec_id, a.cluster, a.dist, e.embedding
  FROM a2 a JOIN embeddings e USING (vec_id)
),
nrms AS (
  SELECT vec_id, {dsum('embedding', 'embedding')} AS nv
  FROM memb, range(1, 65) gs(i)
  GROUP BY vec_id, embedding
),
cand AS (
  SELECT x.vec_id AS kept, y.vec_id AS v,
         x.embedding AS ea, y.embedding AS eb
  FROM memb x JOIN memb y ON x.cluster = y.cluster
   AND (x.dist > y.dist OR (x.dist = y.dist AND x.vec_id < y.vec_id))
),
dots AS (
  SELECT kept, v, {dsum('ea', 'eb')} AS dot
  FROM cand, range(1, 65) gs(i)
  GROUP BY kept, v
),
dups AS (
  SELECT DISTINCT d.v
  FROM dots d
  JOIN nrms nx ON nx.vec_id = d.kept
  JOIN nrms ny ON ny.vec_id = d.v
  WHERE d.dot / sqrt(nx.nv * ny.nv) >= {_SEMDEDUP_TAU}
)
SELECT m.vec_id, m.cluster,
       (m.vec_id IN (SELECT v FROM dups)) AS is_dup
FROM memb m
"""


@query("q_dedup_semdedup", oracle=_semdedup_oracle())
def q_dedup_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means-cluster the
    embeddings, then WITHIN each cluster mark a vector duplicate when
    it is cosine-similar (tau=0.35) to any higher-priority member —
    priority = farther from the assigned centroid first (the paper
    keeps low-centroid-similarity extremes), ties toward the lower
    vec_id. The clustering makes the quadratic step per-cluster local:
    this is the published algorithm LAION/DataComp-scale pipelines
    run, sitting between q_dedup_semantic (transitive components over
    exact pairs) and q_embed_lsh (data-independent buckets) on the
    ladder. Assignment and priority reuse q_kmeans' exact-decimal
    distances (operators/kmeans.py), cosines the exact-decimal
    reduction (operators/similarity.py), so an iterative clustering
    FEEDING a pairwise dedup is still value-hash-checked end to end.

    Scale: assignment is zero-shuffle codegen against broadcast
    centroids; the pair join is cluster-blocked (k buckets bound the
    quadratic term at n_c^2, the paper's own scaling argument — k
    grows with corpus so n_c stays bounded); the dup test is one
    semi-join. The oracle chains the kmeans CTEs into the pair pass —
    one SQL statement replays the whole algorithm."""
    from .operators.kmeans import assign_clusters, kmeans

    e = load_table(spark, sf_dir, "embeddings")
    # fan the single-row-group scan out BEFORE the assignment folds:
    # the fixture parquet is one row group = one scan partition, so
    # the exact-decimal distance reductions (interpreted zip_with/
    # aggregate, the per-row heavy step) otherwise run on ONE core
    # (optimization round r11)
    vecs = (fan_out_scan(e, "vec_id")
            .select("vec_id", "embedding"))
    init_rows = (vecs.orderBy("vec_id").limit(4)
                 .select("embedding").collect())
    init = [[float(x) for x in r["embedding"]] for r in init_rows]
    from .operators.kmeans import update_centroids
    # one update round, then re-assign with kept distance: identical
    # to the oracle's a2 (assignment under the c1 centroids)
    cents = update_centroids(assign_clusters(vecs, init), 4, len(init[0]))
    from .operators.similarity import dot_col
    # per-vector norm ONCE (the q_dedup_semantic shape) — computing
    # cosine_col per pair would re-reduce both self-norms 500k times
    memb = (assign_clusters(vecs, cents, keep_dist=True)
            .withColumn("nrm", dot_col(F.col("embedding"),
                                       F.col("embedding")))
            .persist())

    from .operators.similarity import dot_fast_col
    # memb is NOT a bare scan — fan_out_scan's partition probe (.rdd)
    # would materialize its upstream exchanges as AQE planning jobs, so
    # keep the unconditional keyed fan-out here: memb is |V|-bounded
    # (cluster membership, never corpus-sized), so an extra exchange of
    # it is harmless at any scale (optimization round r12)
    from .session import fanout_partitions
    x = memb.repartition(fanout_partitions(spark), "vec_id").alias("x")
    y = memb.alias("y")
    before = ((F.col("x.cdist") > F.col("y.cdist"))
              | ((F.col("x.cdist") == F.col("y.cdist"))
                 & (F.col("x.vec_id") < F.col("y.vec_id"))))
    cos = (dot_col(F.col("x.embedding"), F.col("y.embedding"))
           / F.sqrt(F.col("x.nrm") * F.col("y.nrm")))
    fast = (dot_fast_col(F.col("x.embedding"), F.col("y.embedding"))
            / F.sqrt(F.col("x.nrm") * F.col("y.nrm")))
    dups = (x.join(y, (F.col("x.cluster") == F.col("y.cluster")) & before)
            .filter(fast >= _SEMDEDUP_TAU - 1e-6)  # codegen prefilter
            .filter(cos >= _SEMDEDUP_TAU)
            .select(F.col("y.vec_id").alias("vec_id"))
            .distinct()
            .withColumn("d", F.lit(True)))
    return (memb.join(dups, "vec_id", "left")
            .select("vec_id", "cluster",
                    F.coalesce(F.col("d"), F.lit(False)).alias("is_dup")))


# ---------------------------------------------------------------------------
# q_dbscan — density-based clustering (label-blocked exact form)
# ---------------------------------------------------------------------------

_DB_EPS2 = "1.65"   # squared-L2 radius (decimal literal, exact compare)
_DB_MINPTS = 4      # neighborhood size INCLUDING the point itself


def _dbscan_oracle() -> str:
    from .operators.kmeans import DEC_D
    diff = ("(cast(a.embedding[gs.i] as double)"
            " - cast(b.embedding[gs.i] as double))")
    return f"""
WITH RECURSIVE d2 AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         sum(cast(round({diff} * {diff}, 10) as {DEC_D})) AS d2
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id,
       range(1, 65) gs(i)
  GROUP BY 1, 2
),
neigh AS MATERIALIZED (SELECT va, vb FROM d2 WHERE d2 <= {_DB_EPS2}),
sym AS MATERIALIZED (
  SELECT va AS u, vb AS v FROM neigh
  UNION ALL
  SELECT vb, va FROM neigh
),
cnt AS (SELECT u, count(*) AS c FROM sym GROUP BY 1),
core AS (SELECT u FROM cnt WHERE c + 1 >= {_DB_MINPTS}),
core_edges AS (
  SELECT s.u AS a, s.v AS b FROM sym s
  JOIN core c1 ON c1.u = s.u
  JOIN core c2 ON c2.u = s.v
),
reach AS (
  SELECT u AS id, u AS r FROM core
  UNION
  SELECT e.a, reach.r FROM core_edges e JOIN reach ON reach.id = e.b
),
comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
border AS (
  SELECT s.u AS id, min(comp.cluster) AS cluster
  FROM sym s JOIN comp ON comp.id = s.v
  WHERE s.u NOT IN (SELECT u FROM core)
  GROUP BY s.u
)
SELECT e.vec_id,
       CASE WHEN comp.id IS NOT NULL THEN 'core'
            WHEN border.id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       cast(coalesce(comp.cluster, border.cluster, -1) as bigint)
         AS cluster
FROM embeddings e
LEFT JOIN comp ON comp.id = e.vec_id
LEFT JOIN border ON border.id = e.vec_id
"""


@query("q_dbscan", oracle=_dbscan_oracle())
def q_dbscan(spark, sf_dir):
    """DBSCAN (Ester et al. 1996) over the embedding corpus,
    label-blocked exact form: points with >= {minPts}-sized
    eps-neighborhoods (squared L2, exact-decimal per-dim reduction like
    kmeans') are CORE; core points within eps of each other merge into
    clusters via the same connected-components operator the dedup
    ladder uses; non-core points adjacent to a core become BORDER
    (assigned the minimum adjacent cluster — deterministic), the rest
    are NOISE. The density complement to q_kmeans (centroidal) and
    q_dedup_semdedup (greedy threshold): DBSCAN finds arbitrary-shape
    clusters and, unlike both, an explicit outlier set — the "weird
    embeddings" audit for corpus curation.

    Scale: the pair pass is label-blocked exactly like
    q_dedup_semantic's (ground-truth form; at 100 TB the IVF/LSH
    bucketed candidate pairs of q_knn_join_blocked/q_embed_lsh slot in
    unchanged); components run iteration-capped pointer hops on the
    core-core edge list; everything else is group-bys on the
    |V|-sized neighbor relation."""
    from functools import reduce

    from .operators.cluster import connected_components
    from .operators.kmeans import DEC_D

    e = load_table(spark, sf_dir, "embeddings")
    # sf1.0 scale fix (SCALE_RUN r7): the original zip_with/aggregate
    # distance is a CodegenFallback — interpreted per PAIR inside the
    # broadcast join, which also inherited the scan's ~4 partitions,
    # so the 40 M-pair eps-graph serialized onto a few cores for tens
    # of minutes. Two-phase replacement with IDENTICAL results (the
    # oracle is unchanged): (1) a whole-stage-codegen 64-term DOUBLE
    # prefilter with a safety margin that dwarfs the worst summation
    # + per-term-rounding error (~3e-9; margin 1e-5), then (2) the
    # original exact-decimal reduction re-verifies only the ~|E|
    # survivors. The explicit repartition restores pair-pass
    # parallelism.
    a = fan_out_scan(e, "vec_id").alias("a")
    b = e.alias("b")

    def dim_dd(i: int):
        x = F.element_at(F.col("a.embedding"), i).cast("double")
        y = F.element_at(F.col("b.embedding"), i).cast("double")
        return (x - y) * (x - y)

    dd2 = reduce(lambda acc, i: acc + dim_dd(i), range(2, 65),
                 dim_dd(1))
    term = F.zip_with(
        F.col("a.embedding"), F.col("b.embedding"),
        lambda x, y: F.round((x.cast("double") - y.cast("double"))
                             * (x.cast("double") - y.cast("double")), 10)
        .cast(DEC_D))
    d2 = F.aggregate(term, F.lit(0).cast(DEC_D),
                     lambda acc, x: (acc + x).cast(DEC_D))
    neigh = (a.join(b, (F.col("a.label") == F.col("b.label"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .filter(dd2 <= float(_DB_EPS2) + 1e-5)  # codegen prefilter
             .select(F.col("a.vec_id").alias("va"),
                     F.col("b.vec_id").alias("vb"),
                     d2.alias("d2"))
             .filter(F.col("d2") <= F.lit(_DB_EPS2).cast(DEC_D)))
    sym = (neigh.select(F.col("va").alias("u"), F.col("vb").alias("v"))
           .unionByName(neigh.select(F.col("vb").alias("u"),
                                     F.col("va").alias("v")))
           .persist())
    core = (sym.groupBy("u").agg(F.count("*").alias("c"))
            .filter(F.col("c") + 1 >= _DB_MINPTS).select("u")
            .persist())
    c1 = core.select(F.col("u").alias("cu"))
    c2 = core.select(F.col("u").alias("cv"))
    core_edges = (sym.join(c1, sym.u == F.col("cu"))
                  .join(c2, sym.v == F.col("cv"))
                  .select(F.col("u").alias("va"), F.col("v").alias("vb")))
    comp = connected_components(
        core.select(F.col("u").alias("vec_id")), core_edges,
        id_col="vec_id", src="va", dst="vb")
    comp = comp.select(F.col("id").alias("cid"), "cluster")
    border = (sym.join(comp, sym.v == F.col("cid"))
              .join(core, sym.u == core.u, "left_anti")
              .groupBy(sym.u.alias("bid"))
              .agg(F.min("cluster").alias("bcluster")))
    return (e.select("vec_id")
            .join(comp, F.col("vec_id") == F.col("cid"), "left")
            .join(border, F.col("vec_id") == F.col("bid"), "left")
            .select("vec_id",
                    F.when(F.col("cid").isNotNull(), "core")
                    .when(F.col("bid").isNotNull(), "border")
                    .otherwise("noise").alias("role"),
                    F.coalesce(F.col("cluster"), F.col("bcluster"),
                               F.lit(-1)).cast("long").alias("cluster")))


# ---------------------------------------------------------------------------
# q_pacf — partial autocorrelation via Durbin-Levinson (lags 1-3)
# ---------------------------------------------------------------------------

_PACF_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts as date) AS d, count(*) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, count(*) AS n, sum(x) AS s
  FROM daily GROUP BY 1
),
ctr AS (
  SELECT d.event_type, d.d, st.n * d.x - st.s AS c
  FROM daily d JOIN st ON d.event_type = st.event_type
),
lagged AS (
  SELECT event_type, c,
         lag(c, 1) OVER w AS c1,
         lag(c, 2) OVER w AS c2,
         lag(c, 3) OVER w AS c3
  FROM ctr
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
agg AS (
  SELECT event_type,
         sum(cast(c as decimal(18,0)) * cast(c as decimal(18,0))) AS den,
         sum(cast(c as decimal(18,0)) * cast(c1 as decimal(18,0))) AS num1,
         sum(cast(c as decimal(18,0)) * cast(c2 as decimal(18,0))) AS num2,
         sum(cast(c as decimal(18,0)) * cast(c3 as decimal(18,0))) AS num3
  FROM lagged GROUP BY 1
),
r AS (
  SELECT event_type,
         round(cast(num1 as double) / cast(den as double), 6) AS r1,
         round(cast(num2 as double) / cast(den as double), 6) AS r2,
         round(cast(num3 as double) / cast(den as double), 6) AS r3
  FROM agg
),
dl AS (
  SELECT event_type, r1, r2, r3,
         (r2 - r1 * r1) / (1 - r1 * r1) AS p22
  FROM r
),
dl2 AS (
  SELECT event_type, r1, r2, r3, p22,
         r1 * (1 - p22) AS p21
  FROM dl
),
dl3 AS (
  SELECT event_type, r1, p22,
         (r3 - p21 * r2 - p22 * r1)
           / (1 - p21 * r1 - p22 * r2) AS p33
  FROM dl2
)
SELECT event_type, gs.lag AS lag,
       round(CASE gs.lag WHEN 1 THEN r1 WHEN 2 THEN p22
             ELSE p33 END, 6) + 0.0 AS pacf
FROM dl3 JOIN (SELECT unnest([1, 2, 3]) AS lag) gs ON true
"""


@query("q_pacf", oracle=_PACF_ORACLE)
def q_pacf(spark, sf_dir):
    """Partial autocorrelation (lags 1-3) of each event type's daily
    count series by the Durbin-Levinson recursion — the AR-order
    diagnostic that separates direct lag effects from ones inherited
    through shorter lags (the companion plot to q_acf when picking
    AR(p) features for forecast models). The acf inputs r1..r3 are
    the same n-scaled exact-integer ratios as q_acf, quantized to
    6dp BEFORE the recursion so both engines run the identical
    float expression tree: phi11 = r1, phi22 = (r2-r1^2)/(1-r1^2),
    phi33 from the k=3 step with phi21 = r1(1-phi22).

    Scale: identical to q_acf — one map-side-combined daily rollup,
    then |types|-row algebra; the recursion adds no shuffle (it is
    pure column math on the aggregated row)."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("x")))
    st = daily.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("x").alias("s"))
    ctr = (daily.join(st, "event_type")
           .select("event_type", "d",
                   (F.col("n") * F.col("x") - F.col("s")).alias("c")))
    w = W.partitionBy("event_type").orderBy("d")
    lagged = ctr.select(
        "event_type", "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 2).over(w).alias("c2"),
        F.lag("c", 3).over(w).alias("c3"))
    cdec = F.col("c").cast("decimal(18,0)")
    agg = lagged.groupBy("event_type").agg(
        F.sum(cdec * F.col("c").cast("decimal(18,0)")).alias("den"),
        F.sum(cdec * F.col("c1").cast("decimal(18,0)")).alias("num1"),
        F.sum(cdec * F.col("c2").cast("decimal(18,0)")).alias("num2"),
        F.sum(cdec * F.col("c3").cast("decimal(18,0)")).alias("num3"))
    r = agg.select(
        "event_type",
        F.round(F.col("num1").cast("double")
                / F.col("den").cast("double"), 6).alias("r1"),
        F.round(F.col("num2").cast("double")
                / F.col("den").cast("double"), 6).alias("r2"),
        F.round(F.col("num3").cast("double")
                / F.col("den").cast("double"), 6).alias("r3"))
    p22 = ((F.col("r2") - F.col("r1") * F.col("r1"))
           / (1 - F.col("r1") * F.col("r1")))
    dl = r.withColumn("p22", p22).withColumn(
        "p21", F.col("r1") * (1 - F.col("p22")))
    p33 = ((F.col("r3") - F.col("p21") * F.col("r2")
            - F.col("p22") * F.col("r1"))
           / (1 - F.col("p21") * F.col("r1")
              - F.col("p22") * F.col("r2")))
    dl = dl.withColumn("p33", p33)
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("lag"))
    val = (F.when(F.col("lag") == 1, F.col("r1"))
           .when(F.col("lag") == 2, F.col("p22"))
           .otherwise(F.col("p33")))
    return (dl.crossJoin(F.broadcast(lags))
            .select("event_type", "lag",
                    F.round(val, 6).alias("pacf")))


# ---------------------------------------------------------------------------
# q_decision_stump — exact best-split search (depth-1 CART, Gini)
# ---------------------------------------------------------------------------


@query(
    "q_decision_stump",
    oracle="""
    WITH obs AS (
      SELECT l_quantity AS f_quantity, l_discount AS f_discount,
             l_extendedprice AS f_price,
             CASE WHEN l_extendedprice * (1 - l_discount) > 50000
                  THEN 1 ELSE 0 END AS label
      FROM lineitem
    ),
    long AS (
      SELECT 'quantity' AS feature, f_quantity AS v, label FROM obs
      UNION ALL
      SELECT 'discount', f_discount, label FROM obs
      UNION ALL
      SELECT 'price', f_price, label FROM obs
    ),
    grp AS (
      SELECT feature, v, count(*) AS c, sum(label) AS a
      FROM long GROUP BY 1, 2
    ),
    cum AS (
      SELECT feature, v,
             sum(c) OVER w AS nl, sum(a) OVER w AS al,
             sum(c) OVER (PARTITION BY feature) AS n,
             sum(a) OVER (PARTITION BY feature) AS atot
      FROM grp
      WINDOW w AS (PARTITION BY feature ORDER BY v
                   ROWS UNBOUNDED PRECEDING)
    ),
    scored AS (
      SELECT feature, v, nl, n - nl AS nr,
             cast(((cast(nl as hugeint) * nl
                    - cast(al as hugeint) * al
                    - cast(nl - al as hugeint) * (nl - al)) * (n - nl)
                   + (cast(n - nl as hugeint) * (n - nl)
                      - cast(atot - al as hugeint) * (atot - al)
                      - cast((n - nl) - (atot - al) as hugeint)
                        * ((n - nl) - (atot - al))) * nl) as double)
               / cast(cast(n as hugeint) * nl * (n - nl) as double)
               AS gini,
             greatest(al, nl - al)
               + greatest(atot - al, (n - nl) - (atot - al))
               AS n_correct
      FROM cum WHERE nl < n
    )
    SELECT feature, v AS threshold, round(gini, 6) AS gini,
           cast(n_correct as bigint) AS n_correct
    FROM (
      SELECT *, row_number() OVER (PARTITION BY feature
                                   ORDER BY gini, v) AS rk
      FROM scored
    ) WHERE rk = 1
    ORDER BY feature
    """,
)
def q_decision_stump(spark, sf_dir):
    """Exact depth-1 CART split search: for each candidate feature
    (quantity, discount, price) find the threshold minimizing
    weighted Gini impurity of the split <=t / >t against a derived
    revenue label (net revenue > 50000). The real distributed tree
    algorithm: per-feature value histogram, ONE cumulative window
    per feature turns every distinct value into a candidate split
    with exact integer class counts — O(n log n), never
    candidate x rows. Gini numerators/denominators are exact wide
    integers (decimal/hugeint) divided once into identical doubles,
    so the per-feature argmin and its majority-vote accuracy count
    are engine-identical. Output: best (threshold, gini, n_correct)
    per feature — the price feature must dominate (it nearly
    determines the label; test-pinned).

    Scale: one scan -> 3x unpivot -> value-keyed partial counts
    (map-side combinable), then windows over |distinct values| rows
    per feature. Tree ensembles at 100 TB run exactly this per
    (node, feature) with binned values; the exact form here is the
    verification tier."""
    li = load_table(spark, sf_dir, "lineitem")
    label = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
             > 50000).cast("int").alias("label")
    obs = li.select(F.col("l_quantity").alias("f_quantity"),
                    F.col("l_discount").alias("f_discount"),
                    F.col("l_extendedprice").alias("f_price"), label)
    # ONE scan: the old 3-way union re-scanned lineitem (and re-derived
    # the label) once per feature; inline() unpivots in the projection
    # (optimization round r12, guide §2.3 — same (feature, v, label)
    # multiset, so the value-keyed counts below are unchanged)
    long = obs.select(
        F.inline(F.array(
            F.struct(F.lit("quantity").alias("feature"),
                     F.col("f_quantity").alias("v")),
            F.struct(F.lit("discount").alias("feature"),
                     F.col("f_discount").alias("v")),
            F.struct(F.lit("price").alias("feature"),
                     F.col("f_price").alias("v")))),
        "label")
    grp = (long.groupBy("feature", "v")
           .agg(F.count("*").alias("c"), F.sum("label").alias("a")))
    # all four running/total sums in ONE Window node (optimization
    # round r12, guide §2.4 windows sharing a partitioning): the old
    # n/atot used partitionBy(feature) with NO ordering — a second
    # Window operator and a second pass; as full-frame expressions on
    # the SAME (feature, v-ordered) spec they fuse into the cumulative
    # node and are computed once per partition in the same pass.
    wf = W.partitionBy("feature")
    wcum = wf.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wtot = wf.orderBy("v").rowsBetween(W.unboundedPreceding,
                                       W.unboundedFollowing)
    cum = grp.select(
        "feature", "v",
        F.sum("c").over(wcum).alias("nl"),
        F.sum("a").over(wcum).alias("al"),
        F.sum("c").over(wtot).alias("n"),
        F.sum("a").over(wtot).alias("atot"))
    D = "decimal(38,0)"
    nl, al, n, atot = (F.col(c) for c in ("nl", "al", "n", "atot"))
    nr, ar = n - nl, atot - al
    bl, br = nl - al, nr - ar
    num = ((nl.cast(D) * nl - al.cast(D) * al - bl.cast(D) * bl) * nr
           + (nr.cast(D) * nr - ar.cast(D) * ar - br.cast(D) * br) * nl)
    den = n.cast(D) * nl * nr
    scored = (cum.filter(nl < n)
              .select("feature", "v",
                      (num.cast("double") / den.cast("double"))
                      .alias("gini"),
                      (F.greatest(al, bl) + F.greatest(ar, br))
                      .alias("n_correct")))
    # argmin via one map-side-combinable min(struct(gini, v, ...)) —
    # identical to the old row_number() over (ORDER BY gini, v) pick
    # ((feature, v) is unique, so (gini, v) is a total order per
    # feature) WITHOUT the second full-partition sort of the scored
    # relation (optimization round r12)
    best = (scored.groupBy("feature")
            .agg(F.min(F.struct("gini", "v", "n_correct")).alias("m")))
    return (best.select("feature", F.col("m.v").alias("threshold"),
                        F.round("m.gini", 6).alias("gini"),
                        F.col("m.n_correct").cast("long")
                        .alias("n_correct"))
            .orderBy("feature"))


# ---------------------------------------------------------------------------
# q_mutual_information — MI feature ranking against a derived label
# ---------------------------------------------------------------------------


@query(
    "q_mutual_information",
    oracle="""
    WITH obs AS (
      SELECT l_quantity AS f_quantity, l_discount AS f_discount,
             l_extendedprice AS f_price,
             CASE WHEN l_extendedprice * (1 - l_discount) > 50000
                  THEN 1 ELSE 0 END AS label
      FROM lineitem
    ),
    long AS (
      SELECT 'quantity' AS feature, f_quantity AS f, label FROM obs
      UNION ALL
      SELECT 'discount', f_discount, label FROM obs
      UNION ALL
      SELECT 'price', f_price, label FROM obs
    ),
    rng AS (
      SELECT feature, min(f) AS lo, max(f) AS hi, count(*) AS n
      FROM long GROUP BY 1
    ),
    binned AS (
      SELECT l.feature, l.label,
             least(cast(floor((l.f - r.lo) * 10 / (r.hi - r.lo))
                        as bigint), 9) AS b,
             r.n
      FROM long l JOIN rng r ON r.feature = l.feature
    ),
    joint AS (
      SELECT feature, b, label, count(*) AS c_bl, max(n) AS n
      FROM binned GROUP BY 1, 2, 3
    ),
    margb AS (
      SELECT feature, b, sum(c_bl) AS c_b FROM joint GROUP BY 1, 2
    ),
    margl AS (
      SELECT feature, label, sum(c_bl) AS c_l FROM joint GROUP BY 1, 2
    ),
    terms AS (
      SELECT j.feature,
             cast(round((cast(j.c_bl as double) / j.n)
                        * ln(cast(j.c_bl as double) * j.n
                             / (cast(mb.c_b as double) * ml.c_l)), 10)
                  as decimal(20,10)) AS term
      FROM joint j
      JOIN margb mb ON mb.feature = j.feature AND mb.b = j.b
      JOIN margl ml ON ml.feature = j.feature AND ml.label = j.label
    )
    SELECT feature,
           cast(round(sum(term), 6) as double) + 0.0 AS mi_nats
    FROM terms GROUP BY feature
    ORDER BY mi_nats DESC, feature
    """,
)
def q_mutual_information(spark, sf_dir):
    """Mutual-information feature ranking: each candidate feature is
    equi-width binned to 10 buckets and scored by I(bin; label) =
    sum p(b,l)·ln(p(b,l)/(p(b)p(l))) against the derived revenue
    label — the filter-method feature selector beside
    q_decision_stump's wrapper-style split search (price must top
    both rankings; test-pinned, with MI >= 0 and bounded by label
    entropy). The q_entropy float discipline: each term's log runs
    on identically-built doubles (exact integer count ratios), terms
    are 10dp-quantized into decimal sums, the final round happens ON
    the decimal.

    Scale: one scan -> 3x unpivot -> (feature, bin, label) counts,
    all map-side combinable; marginals re-aggregate the joint table
    (30 x 2 rows per feature), so the MI algebra is constant-cost at
    any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    label = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
             > 50000).cast("int").alias("label")
    obs = li.select(F.col("l_quantity").alias("f_quantity"),
                    F.col("l_discount").alias("f_discount"),
                    F.col("l_extendedprice").alias("f_price"), label)
    long = None
    for feat, col in [("quantity", "f_quantity"),
                      ("discount", "f_discount"),
                      ("price", "f_price")]:
        part = obs.select(F.lit(feat).alias("feature"),
                          F.col(col).alias("f"), "label")
        long = part if long is None else long.unionByName(part)
    rng = (long.groupBy("feature")
           .agg(F.min("f").alias("lo"), F.max("f").alias("hi"),
                F.count("*").alias("n")))
    binned = (long.join(F.broadcast(rng), "feature")
              .select("feature", "label", "n",
                      F.least(F.floor((F.col("f") - F.col("lo")) * 10
                                      / (F.col("hi") - F.col("lo")))
                              .cast("bigint"), F.lit(9)).alias("b")))
    joint = (binned.groupBy("feature", "b", "label")
             .agg(F.count("*").alias("c_bl"), F.max("n").alias("n")))
    margb = (joint.groupBy("feature", "b")
             .agg(F.sum("c_bl").alias("c_b")))
    margl = (joint.groupBy("feature", "label")
             .agg(F.sum("c_bl").alias("c_l")))
    term = F.round(
        (F.col("c_bl").cast("double") / F.col("n"))
        * F.log(F.col("c_bl").cast("double") * F.col("n")
                / (F.col("c_b").cast("double") * F.col("c_l"))), 10) \
        .cast("decimal(20,10)")
    terms = (joint.join(F.broadcast(margb), ["feature", "b"])
             .join(F.broadcast(margl), ["feature", "label"])
             .select("feature", term.alias("term")))
    return (terms.groupBy("feature")
            .agg((F.round(F.sum("term"), 6).cast("double") + 0.0)
                 .alias("mi_nats"))
            .orderBy(F.desc("mi_nats"), "feature"))


# ---------------------------------------------------------------------------
# q_outlier_isoforest — isolation-forest-style leaf-occupancy outliers
# ---------------------------------------------------------------------------

_ISO_TREES = 4
_ISO_DEPTH = 4

def _iso_nodes_values() -> str:
    rows = []
    for t in range(1, _ISO_TREES + 1):
        rows.append(f"({t}, '')")
        for d in range(1, _ISO_DEPTH):
            for i in range(2 ** d):
                rows.append(f"({t}, '{format(i, f'0{d}b')}')")
    return ", ".join(rows)


def _iso_oracle() -> str:
    steps = []
    for d in range(1, _ISO_DEPTH + 1):
        steps.append(f""",
a{d} AS MATERIALIZED (
  SELECT a.event_id, a.f1, a.f2, a.t,
         a.path || CASE WHEN (CASE WHEN np.feat = 0 THEN a.f1
                              ELSE a.f2 END) > np.thr
                        THEN '1' ELSE '0' END AS path
  FROM a{d - 1} a
  JOIN nodep np ON np.t = a.t AND np.path = a.path
)""")
    return f"""
WITH pts AS MATERIALIZED (
  SELECT event_id,
         value + CASE WHEN event_id % 211 = 0
                      THEN 500.0 ELSE 0.0 END AS f1,
         cast((event_id * 7919) % 1000 as double) AS f2
  FROM events
),
rng AS (
  SELECT min(f1) AS lo1, max(f1) AS hi1,
         min(f2) AS lo2, max(f2) AS hi2
  FROM pts
),
nodes(t, path) AS (VALUES {_iso_nodes_values()}),
nodep AS MATERIALIZED (
  SELECT t, path,
         cast(('0x' || substr(md5(t || ':' || path || ':f'), 1, 8))
              as bigint) % 2 AS feat,
         CASE WHEN cast(('0x' || substr(md5(t || ':' || path || ':f'),
                                        1, 8)) as bigint) % 2 = 0
              THEN r.lo1 + (cast(('0x' || substr(md5(
                     t || ':' || path || ':t'), 1, 8)) as bigint)
                     / 4294967296.0) * (r.hi1 - r.lo1)
              ELSE r.lo2 + (cast(('0x' || substr(md5(
                     t || ':' || path || ':t'), 1, 8)) as bigint)
                     / 4294967296.0) * (r.hi2 - r.lo2)
         END AS thr
  FROM nodes CROSS JOIN rng r
),
a0 AS MATERIALIZED (
  SELECT p.event_id, p.f1, p.f2, t.t, '' AS path
  FROM pts p CROSS JOIN (SELECT DISTINCT t FROM nodes) t
){''.join(steps)},
occ AS (
  SELECT t, path, count(*) AS c FROM a{_ISO_DEPTH} GROUP BY 1, 2
),
score AS (
  SELECT a.event_id, cast(sum(o.c) as bigint) AS isolation_score
  FROM a{_ISO_DEPTH} a JOIN occ o ON o.t = a.t AND o.path = a.path
  GROUP BY a.event_id
)
SELECT event_id, isolation_score,
       CASE WHEN event_id % 211 = 0 THEN 1 ELSE 0 END AS injected
FROM score
ORDER BY isolation_score, event_id LIMIT 20
"""


@query("q_outlier_isoforest", oracle=_iso_oracle())
def q_outlier_isoforest(spark, sf_dir):
    """Isolation-forest-style outlier detection (Liu et al. 2008),
    derandomized and leaf-occupancy-scored: 4 random binary trees of
    depth 4 over two features (the value metric with +500 injected
    rare outliers, and a uniform hash feature), where each node's
    split feature and threshold derive from md5(tree:path) — the
    engine-portable RNG substitute — with thresholds uniform over the
    feature's global range. A point's score is the total population
    of the leaves it lands in across trees: mass-isolated extremes
    land in near-empty leaves and surface first. All scores are exact
    integer counts, so the top-20 anomaly cut is hash-identical; the
    injected % 211 points must dominate it (test-pinned).

    Scale: the node-parameter table is 60 rows broadcast against the
    point stream; each depth is one broadcast join (no shuffle until
    the leaf-occupancy count, which is map-side combinable on
    (tree, leaf)). Real iForests subsample per tree; the global-range
    simplification is documented, keeps the operator one-pass, and
    preserves the isolation signal this fixture needs."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        (F.col("value") + F.when(F.col("event_id") % 211 == 0, 500.0)
         .otherwise(0.0)).alias("f1"),
        ((F.col("event_id") * 7919) % 1000).cast("double").alias("f2"))
    rng = pts.agg(F.min("f1").alias("lo1"), F.max("f1").alias("hi1"),
                  F.min("f2").alias("lo2"), F.max("f2").alias("hi2"))
    rows = []
    for t in range(1, _ISO_TREES + 1):
        rows.append((t, ""))
        for d in range(1, _ISO_DEPTH):
            for i in range(2 ** d):
                rows.append((t, format(i, f"0{d}b")))
    nodes = e.sparkSession.createDataFrame(rows, "t int, path string")
    h = lambda suf: F.conv(F.substring(F.md5(F.concat(  # noqa: E731
        F.col("t").cast("string"), F.lit(":"), F.col("path"),
        F.lit(suf))), 1, 8), 16, 10).cast("bigint")
    frac = h(":t") / F.lit(4294967296.0)
    nodep = (nodes.crossJoin(F.broadcast(rng))
             .select("t", "path", (h(":f") % 2).alias("feat"),
                     F.when(h(":f") % 2 == 0,
                            F.col("lo1") + frac
                            * (F.col("hi1") - F.col("lo1")))
                     .otherwise(F.col("lo2") + frac
                                * (F.col("hi2") - F.col("lo2")))
                     .alias("thr")))
    trees = nodes.select("t").distinct()
    a = (pts.crossJoin(F.broadcast(trees))
         .withColumn("path", F.lit("")))
    for _ in range(_ISO_DEPTH):
        np_ = nodep.withColumnRenamed("path", "npath")
        bit = F.when(F.when(F.col("feat") == 0, F.col("f1"))
                     .otherwise(F.col("f2")) > F.col("thr"), "1") \
            .otherwise("0")
        a = (a.join(F.broadcast(np_), (np_.t == a.t)
                    & (F.col("npath") == F.col("path")))
             .select(a.event_id, a.f1, a.f2, a.t,
                     F.concat(a.path, bit).alias("path")))
    occ = a.groupBy("t", "path").agg(F.count("*").alias("c"))
    score = (a.join(occ, ["t", "path"])
             .groupBy("event_id")
             .agg(F.sum("c").cast("bigint").alias("isolation_score")))
    return (score.select(
        "event_id", "isolation_score",
        F.when(F.col("event_id") % 211 == 0, 1).otherwise(0)
        .alias("injected"))
        .orderBy("isolation_score", "event_id").limit(20))


# ---------------------------------------------------------------------------
# q_kmv_distinct — K-Minimum-Values cardinality sketch with exact merge
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE = float(1 << 60)


@query(
    "q_kmv_distinct",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT l_returnflag AS grp,
             cast(('0x' || substr(md5('kmv:' || cast(l_partkey as varchar)),
                                  1, 15)) as bigint) AS h
      FROM lineitem
    ),
    kept AS (
      SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
      FROM hashed
    ),
    groups AS (
      SELECT grp, max(h) AS h_k, cast(count(*) as bigint) AS k_used
      FROM kept WHERE rn <= {_KMV_K} GROUP BY grp
    ),
    merged_kept AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT h FROM kept WHERE rn <= {_KMV_K})
    ),
    merged AS (
      SELECT 'ALL' AS grp, max(h) AS h_k, cast(count(*) as bigint) AS k_used
      FROM merged_kept WHERE rn <= {_KMV_K}
    ),
    exact AS (
      SELECT l_returnflag AS grp,
             cast(count(DISTINCT l_partkey) as bigint) AS exact_distinct
      FROM lineitem GROUP BY 1
      UNION ALL
      SELECT 'ALL', cast(count(DISTINCT l_partkey) as bigint)
      FROM lineitem
    )
    SELECT s.grp, s.k_used,
           round((s.k_used - 1) * {_KMV_SPACE!r} / s.h_k, 2)
             AS est_distinct,
           e.exact_distinct,
           round(abs((s.k_used - 1) * {_KMV_SPACE!r} / s.h_k
                     - e.exact_distinct) / e.exact_distinct, 4)
             AS rel_err
    FROM (SELECT * FROM groups UNION ALL SELECT * FROM merged) s
    JOIN exact e ON s.grp = e.grp
    ORDER BY s.grp
    """,
)
def q_kmv_distinct(spark, sf_dir):
    """K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002):
    per group keep the k smallest 60-bit md5 hashes of the key; the
    kth minimum h_k estimates cardinality as (k-1)/(h_k/2^60). The
    third mergeable-sketch rung beside HLL (q_hll_intersection) and
    MinHash (q_minhash_reagg) — and unlike HLL's register maxima, a
    KMV merge is EXACTLY set-union-then-retruncate, shown here: the
    'ALL' row is built only from the per-group sketches, never from
    the raw data, which is precisely the two-level re-aggregation a
    100 TB rollup runs (partition sketches -> region sketches ->
    global). md5 keys both engines identically (portable-hash house
    rule), so estimates hash-match exactly; exact counts ride along
    so the oracle also pins the error the sketch actually makes.

    Scale: DISTINCT on (group, hash) with map-side combine, then a
    bounded window over at most k rows per group — the kept-set
    relation is k*|groups| rows regardless of corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    hashed = (li.select(F.col("l_returnflag").alias("grp"),
                        F.conv(F.substring(
                            F.md5(F.concat(F.lit("kmv:"),
                                           F.col("l_partkey")
                                           .cast("string"))), 1, 15),
                            16, 10).cast("bigint").alias("h"))
              .distinct())
    kept = hashed.select(
        "grp", "h",
        F.row_number().over(
            W.partitionBy("grp").orderBy("h")).alias("rn")) \
        .filter(F.col("rn") <= _KMV_K)
    groups = kept.groupBy("grp").agg(F.max("h").alias("h_k"),
                                     F.count("*").alias("k_used"))
    merged = (kept.select("h").distinct()
              .select("h", F.row_number().over(W.orderBy("h")).alias("rn"))
              .filter(F.col("rn") <= _KMV_K)
              .agg(F.max("h").alias("h_k"), F.count("*").alias("k_used"))
              .select(F.lit("ALL").alias("grp"), "h_k", "k_used"))
    sketches = groups.unionByName(merged)
    exact = (li.groupBy(F.col("l_returnflag").alias("grp"))
             .agg(F.countDistinct("l_partkey").alias("exact_distinct"))
             .unionByName(
                 li.agg(F.countDistinct("l_partkey")
                        .alias("exact_distinct"))
                 .select(F.lit("ALL").alias("grp"), "exact_distinct")))
    est = (F.col("k_used") - 1) * F.lit(_KMV_SPACE) / F.col("h_k")
    return (sketches.join(exact, "grp")
            .select("grp", "k_used",
                    F.round(est, 2).alias("est_distinct"),
                    "exact_distinct",
                    F.round(F.abs(est - F.col("exact_distinct"))
                            / F.col("exact_distinct"), 4).alias("rel_err"))
            .orderBy("grp"))


# ---------------------------------------------------------------------------
# q_ljung_box — portmanteau whiteness test on the ACF
# ---------------------------------------------------------------------------

_LJUNG_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts as date) AS d, count(*) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, count(*) AS n, sum(x) AS s
  FROM daily GROUP BY 1
),
ctr AS (
  SELECT d.event_type, d.d, st.n, st.n * d.x - st.s AS c
  FROM daily d JOIN st ON d.event_type = st.event_type
),
lagged AS (
  SELECT event_type, n, c,
         lag(c, 1) OVER w AS c1,
         lag(c, 2) OVER w AS c2,
         lag(c, 3) OVER w AS c3
  FROM ctr
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
agg AS (
  SELECT event_type, max(n) AS n,
         sum(cast(c as decimal(18,0)) * cast(c as decimal(18,0))) AS den,
         sum(cast(c as decimal(18,0)) * cast(c1 as decimal(18,0))) AS num1,
         sum(cast(c as decimal(18,0)) * cast(c2 as decimal(18,0))) AS num2,
         sum(cast(c as decimal(18,0)) * cast(c3 as decimal(18,0))) AS num3
  FROM lagged GROUP BY 1
),
terms AS (
  SELECT event_type, n,
         cast(round((cast(num1 as double) / cast(den as double))
                    * (cast(num1 as double) / cast(den as double))
                    / (n - 1), 8) as decimal(30,10))
         + cast(round((cast(num2 as double) / cast(den as double))
                      * (cast(num2 as double) / cast(den as double))
                      / (n - 2), 8) as decimal(30,10))
         + cast(round((cast(num3 as double) / cast(den as double))
                      * (cast(num3 as double) / cast(den as double))
                      / (n - 3), 8) as decimal(30,10)) AS t3
  FROM agg
)
SELECT event_type, cast(n as bigint) AS n,
       round(cast(n as double) * (n + 2) * cast(t3 as double), 6) + 0.0
         AS q_stat
FROM terms ORDER BY event_type
"""


@query("q_ljung_box", oracle=_LJUNG_ORACLE)
def q_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau test (lags 1-3) per event type: is the
    daily count series white noise, or does autocorrelation survive?
    Q = n(n+2) * sum_h r_h^2/(n-h) — the formal companion of q_acf
    (which reports the r_h themselves) used to gate ARIMA residuals
    and detect seasonality worth modeling.

    Exactness: r_h reuses q_acf's n-scaled integer form (exact decimal
    numerators/denominator); each of the three r_h^2/(n-h) terms is a
    deterministic double expression rounded 8dp and added as decimals
    (a 3-term float sum would still be engine-ordered inside sum()),
    then one scalar multiply, rounded 6dp.

    Scale: identical plan to q_acf — daily rollup shuffle, then
    series-relation windows."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("x")))
    st = daily.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("x").alias("s"))
    ctr = (daily.join(st, "event_type")
           .select("event_type", "d", "n",
                   (F.col("n") * F.col("x") - F.col("s")).alias("c")))
    w = W.partitionBy("event_type").orderBy("d")
    lagged = ctr.select(
        "event_type", "n", "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 2).over(w).alias("c2"),
        F.lag("c", 3).over(w).alias("c3"))
    cdec = F.col("c").cast("decimal(18,0)")
    agg = lagged.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(cdec * F.col("c").cast("decimal(18,0)")).alias("den"),
        F.sum(cdec * F.col("c1").cast("decimal(18,0)")).alias("num1"),
        F.sum(cdec * F.col("c2").cast("decimal(18,0)")).alias("num2"),
        F.sum(cdec * F.col("c3").cast("decimal(18,0)")).alias("num3"))

    def term(num_col, h):
        r = num_col.cast("double") / F.col("den").cast("double")
        return F.round(r * r / (F.col("n") - h), 8).cast("decimal(30,10)")

    t3 = (term(F.col("num1"), 1) + term(F.col("num2"), 2)
          + term(F.col("num3"), 3))
    return (agg.select(
        "event_type", F.col("n").cast("long").alias("n"),
        (F.round(F.col("n").cast("double") * (F.col("n") + 2)
                 * t3.cast("double"), 6) + 0.0).alias("q_stat"))
        .orderBy("event_type"))


# ---------------------------------------------------------------------------
# q_adaboost_stumps — boosted decision stumps with exact integer weights
# ---------------------------------------------------------------------------

_ADA_GRID_SQL = """
    SELECT f.feature, t.thr, p.pol
    FROM (VALUES ('e0'), ('e1')) AS f(feature),
         (VALUES (cast(-0.15 as double)), (cast(-0.05 as double)),
                 (cast(0.0 as double)), (cast(0.05 as double)),
                 (cast(0.15 as double))) AS t(thr),
         (VALUES (1), (-1)) AS p(pol)
"""

_ADA_MISS = """(CASE WHEN (CASE WHEN g.feature = 'e0' THEN p.e0
                           ELSE p.e1 END) > g.thr
                     THEN g.pol ELSE -g.pol END) <> p.y"""


@query(
    "q_adaboost_stumps",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, embedding[1] AS e0, embedding[2] AS e1,
             CASE WHEN embedding[1] + embedding[2] > 0
                  THEN 1 ELSE -1 END AS y
      FROM embeddings
    ),
    grid AS ({_ADA_GRID_SQL}),
    err1 AS (
      SELECT g.feature, g.thr, g.pol,
             sum(CASE WHEN {_ADA_MISS} THEN 1 ELSE 0 END) AS e,
             count(*) AS s
      FROM pts p, grid g GROUP BY g.feature, g.thr, g.pol
    ),
    best1 AS (SELECT * FROM err1 ORDER BY e, feature, thr, pol LIMIT 1),
    w2 AS (
      SELECT p.vec_id, p.e0, p.e1, p.y,
             CASE WHEN {_ADA_MISS} THEN g.s - g.e ELSE g.e END AS w
      FROM pts p, best1 g
    ),
    err2 AS (
      SELECT g.feature, g.thr, g.pol,
             sum(CASE WHEN {_ADA_MISS} THEN p.w ELSE 0 END) AS e,
             sum(p.w) AS s
      FROM w2 p, grid g GROUP BY g.feature, g.thr, g.pol
    ),
    best2 AS (SELECT * FROM err2 ORDER BY e, feature, thr, pol LIMIT 1),
    w3 AS (
      SELECT p.vec_id, p.e0, p.e1, p.y,
             cast(p.w as hugeint)
               * (CASE WHEN {_ADA_MISS} THEN g.s - g.e ELSE g.e END)
               AS w
      FROM w2 p, best2 g
    ),
    err3 AS (
      SELECT g.feature, g.thr, g.pol,
             sum(CASE WHEN {_ADA_MISS} THEN cast(p.w as hugeint)
                      ELSE cast(0 as hugeint) END) AS e,
             sum(cast(p.w as hugeint)) AS s
      FROM w3 p, grid g GROUP BY g.feature, g.thr, g.pol
    ),
    best3 AS (SELECT * FROM err3 ORDER BY e, feature, thr, pol LIMIT 1),
    rounds AS (
      SELECT 1 AS t, feature, thr, pol,
             cast(e as double) / cast(s as double) AS err FROM best1
      UNION ALL
      SELECT 2, feature, thr, pol,
             cast(e as double) / cast(s as double) FROM best2
      UNION ALL
      SELECT 3, feature, thr, pol,
             cast(e as double) / cast(s as double) FROM best3
    ),
    alphas AS (
      SELECT t, feature, thr, pol, err,
             round(0.5 * ln((1.0 - err) / err), 4) AS alpha
      FROM rounds
    ),
    votes AS (
      SELECT p.vec_id, p.y,
             sum(cast(a.alpha as decimal(18,4))
                 * (CASE WHEN (CASE WHEN a.feature = 'e0' THEN p.e0
                               ELSE p.e1 END) > a.thr
                         THEN a.pol ELSE -a.pol END)) AS margin
      FROM pts p, alphas a GROUP BY p.vec_id, p.y
    ),
    acc AS (
      SELECT sum(CASE WHEN (CASE WHEN margin >= 0 THEN 1 ELSE -1 END)
                       = y THEN 1 ELSE 0 END) AS n_correct,
             count(*) AS n FROM votes
    )
    SELECT a.t AS round, a.feature, a.thr AS threshold,
           a.pol AS polarity, round(a.err, 6) AS err, a.alpha,
           cast(acc.n_correct as bigint) AS ensemble_correct,
           cast(acc.n as bigint) AS n_points
    FROM alphas a, acc ORDER BY a.t
    """,
)
def q_adaboost_stumps(spark, sf_dir):
    """AdaBoost.M1 over decision stumps — the repo's first ENSEMBLE
    learner: 3 boosting rounds over a 20-stump hypothesis grid (2
    embedding features x 5 thresholds x 2 polarities), label y =
    sign(e0 + e1). The textbook algorithm keeps multiplicative exp-
    weights; those are irrational and their float sums are summation-
    order-dependent, which would break the cross-engine hash. Instead
    the weights stay EXACT INTEGERS via the equivalent unnormalized
    reweight: after a round with integer error mass E of total S,
    correct points multiply by E and errors by S-E (both sides of the
    split then carry equal mass E*(S-E) — the same 50/50 rebalance
    exp-weights achieve, up to the global factor AdaBoost normalizes
    away). Weighted errors are exact integer aggregates at every round
    (128-bit in round 3: w <= S1*S2 ~ N^3, cast to hugeint BEFORE the
    round-3 product so the int64 multiply can't overflow on a larger
    fixture — ADVICE r8 — then summed over N points), so
    stump selection is an exact argmin with a deterministic tiebreak —
    no float comparison anywhere in the training path. alpha_t =
    0.5*ln((1-err)/err) appears only as 4dp-rounded OUTPUT, and the
    ensemble vote sums the rounded alphas as exact decimals, so the
    final sign is deterministic too.

    Scale: each round is one broadcast cross-join of points x 20
    stumps into a map-side-combined agg (the classic distributed-
    boosting shape: candidate splits broadcast, sufficient statistics
    reduced); the reweight is a per-row expression. T rounds = T scans
    — no iterative shuffle growth, no driver-side data."""
    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("e0"),
        F.element_at("embedding", 2).cast("double").alias("e1"),
        F.when(F.element_at("embedding", 1).cast("double")
               + F.element_at("embedding", 2).cast("double") > 0, 1)
        .otherwise(-1).alias("y"))
    grid = spark.createDataFrame(
        [(f, t, p) for f in ("e0", "e1")
         for t in (-0.15, -0.05, 0.0, 0.05, 0.15)
         for p in (1, -1)],
        "feature string, thr double, pol int")

    fval = F.when(F.col("feature") == "e0", F.col("e0")) \
        .otherwise(F.col("e1"))
    h = F.when(fval > F.col("thr"), F.col("pol")) \
        .otherwise(-F.col("pol"))
    miss = (h != F.col("y")).cast("int")

    def round_t(wdf, wcol):
        """One boosting round: exact weighted errors, deterministic
        argmin, returns (best-stump 1-row df, joined miss flags)."""
        x = wdf.crossJoin(F.broadcast(grid))
        err = (x.groupBy("feature", "thr", "pol")
               .agg(F.sum(miss * F.col(wcol).cast("decimal(38,0)"))
                    .alias("e"),
                    F.sum(F.col(wcol).cast("decimal(38,0)")).alias("s")))
        best = err.orderBy("e", "feature", "thr", "pol").limit(1)
        joined = (wdf.crossJoin(F.broadcast(best))
                  .withColumn("miss", miss)
                  .withColumn("w_next",
                              F.col(wcol)
                              * F.when(F.col("miss") == 1,
                                       F.col("s") - F.col("e"))
                              .otherwise(F.col("e"))))
        return best, joined

    # localCheckpoint per round truncates the lineage (the established
    # iterative idiom here — queries_graph.py): without it each round's
    # jobs re-execute every PRIOR round's aggregation, turning T scans
    # into ~T^2/2.
    w1 = pts.withColumn("w", F.lit(1).cast("long"))
    best1, j1 = round_t(w1, "w")
    w2 = (j1.select("vec_id", "e0", "e1", "y",
                    F.col("w_next").cast("long").alias("w"))
          .localCheckpoint(eager=True))
    best2, j2 = round_t(w2, "w")
    w3 = (j2.select("vec_id", "e0", "e1", "y",
                    F.col("w_next").cast("decimal(38,0)").alias("w"))
          .localCheckpoint(eager=True))
    best3, _ = round_t(w3, "w")

    rounds = None
    for t, b in ((1, best1), (2, best2), (3, best3)):
        r = b.select(F.lit(t).alias("round"), "feature",
                     F.col("thr").alias("threshold"),
                     F.col("pol").alias("polarity"),
                     (F.col("e").cast("double")
                      / F.col("s").cast("double")).alias("err"))
        rounds = r if rounds is None else rounds.unionByName(r)
    alphas = rounds.withColumn(
        "alpha", F.round(0.5 * F.log((1.0 - F.col("err"))
                                     / F.col("err")), 4))
    av = (pts.crossJoin(F.broadcast(alphas))
          .select("vec_id", "y",
                  (F.col("alpha").cast("decimal(18,4)")
                   * F.when(fval > F.col("threshold"),
                            F.col("polarity"))
                   .otherwise(-F.col("polarity"))).alias("vote"))
          .groupBy("vec_id", "y")
          .agg(F.sum("vote").alias("margin")))
    acc = av.agg(
        F.sum(F.when(
            F.when(F.col("margin") >= 0, 1).otherwise(-1)
            == F.col("y"), 1).otherwise(0)).cast("long")
        .alias("ensemble_correct"),
        F.count("*").cast("long").alias("n_points"))
    return (alphas.crossJoin(F.broadcast(acc))
            .select("round", "feature", "threshold", "polarity",
                    F.round("err", 6).alias("err"), "alpha",
                    "ensemble_correct", "n_points")
            .orderBy("round"))


# ---------------------------------------------------------------------------
# q_cms_heavy_hitters — Count-Min sketch with linear (additive) merge
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256  # first md5 byte — no modulo needed


@query(
    "q_cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tok AS (SELECT lang, term FROM toks WHERE term <> ''),
    rows_j AS (SELECT unnest(range(0, {_CMS_DEPTH})) AS j),
    partial AS (
      /* per-LANG partial sketches: depth x width counters */
      SELECT t.lang, r.j,
             cast(('0x' || substr(md5('cms' || cast(r.j as string)
                                       || ':' || t.term), 1, 2))
                  as integer) AS bucket,
             count(*) AS c
      FROM tok t, rows_j r
      GROUP BY 1, 2, 3
    ),
    merged AS (
      /* CMS is a LINEAR sketch: the global structure is the
         counter-wise SUM of the per-lang partials */
      SELECT j, bucket, sum(c) AS c FROM partial GROUP BY 1, 2
    ),
    truth AS (
      SELECT term, count(*) AS cnt FROM tok GROUP BY term
    ),
    top10 AS (
      SELECT term, cnt FROM truth ORDER BY cnt DESC, term LIMIT 10
    ),
    probes AS (
      SELECT t.term, t.cnt, r.j,
             cast(('0x' || substr(md5('cms' || cast(r.j as string)
                                       || ':' || t.term), 1, 2))
                  as integer) AS bucket
      FROM top10 t, rows_j r
    ),
    est AS (
      SELECT p.term, p.cnt, min(m.c) AS est
      FROM probes p JOIN merged m
        ON m.j = p.j AND m.bucket = p.bucket
      GROUP BY 1, 2
    )
    SELECT term,
           cast(cnt as bigint) AS true_cnt,
           cast(est as bigint) AS est_cnt,
           cast(est - cnt as bigint) AS overestimate
    FROM est ORDER BY true_cnt DESC, term
    """,
)
def q_cms_heavy_hitters(spark, sf_dir):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
    heavy-hitter frequency structure missing from the sketch family
    beside KMV (q_kmv_distinct), HLL (q_hll_intersection) and MinHash
    (q_minhash_reagg). Depth {d} independent md5-derived hash rows x
    width {w} counters; every token increments one counter per row;
    estimate(term) = min over rows — always >= truth (one-sided
    error), with overestimate = collision mass. The merge story is
    the point: CMS is LINEAR, so per-lang partial sketches sum
    counter-wise into the global sketch — exactly the two-level
    rollup 1000 executors run (partition sketches -> global), shown
    here by building ONLY per-lang partials and estimating from their
    sum. md5 keys both engines identically (portable-hash house
    rule), so the sketch, the estimates, and the per-term collision
    overestimates all value-hash-match exactly; true counts ride
    along to pin the error actually made.

    Scale: one explode + a groupBy on (lang, depth, bucket) whose
    result is at most |langs| x {d} x {w} rows regardless of corpus
    size (map-side combined), then probes touch {d} counters per
    queried term. The sketch never grows with the data — the whole
    reason it exists at 100 TB."""
    d_ = load_table(spark, sf_dir, "documents")
    tok = (d_.select("lang", F.explode(F.split("text", " ")).alias("term"))
           .filter(F.col("term") != ""))
    js = F.array(*[F.lit(j) for j in range(_CMS_DEPTH)])
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("cms"), F.col("j").cast("string"),
                       F.lit(":"), F.col("term"))), 1, 2),
        16, 10).cast("int")
    # Aggregate to per-(lang, term) counts BEFORE hashing: the md5
    # bucket depends only on (j, term), so computing it per token
    # OCCURRENCE paid depth x |tokens| md5 calls where depth x |vocab|
    # suffices — sum-of-counts per bucket is identical by construction
    # (guide §2.3 "aggregate before you shuffle", applied to the hash).
    # The persisted (lang, term, tc) relation also serves the truth
    # branch, so the corpus explode runs once, not twice. Measured
    # 2.7-3.9x at sf0.1 across A/B runs (optimization round r11).
    tcnt = (tok.groupBy("lang", "term").agg(F.count("*").alias("tc"))
            .persist())
    partial = (tcnt.withColumn("j", F.explode(js))
               .groupBy("lang", "j", bucket.alias("bucket"))
               .agg(F.sum("tc").alias("c")))
    merged = partial.groupBy("j", "bucket").agg(F.sum("c").alias("c"))
    truth = tcnt.groupBy("term").agg(F.sum("tc").alias("cnt"))
    top10 = truth.orderBy(F.desc("cnt"), "term").limit(10)
    probes = top10.withColumn("j", F.explode(js)) \
                  .withColumn("bucket", bucket)
    est = (probes.join(merged, ["j", "bucket"])
           .groupBy("term", "cnt").agg(F.min("c").alias("est")))
    return (est.selectExpr(
        "term",
        "cast(cnt as bigint) AS true_cnt",
        "cast(est as bigint) AS est_cnt",
        "cast(est - cnt as bigint) AS overestimate")
        .orderBy(F.desc("true_cnt"), "term"))


# ---------------------------------------------------------------------------
# q_quantile_sketch_merge — mergeable log-bucket histogram quantiles
# ---------------------------------------------------------------------------

@query(
    "q_quantile_sketch_merge",
    oracle="""
    WITH lens AS (
      SELECT lang, length(text) + 1 AS x FROM documents
    ),
    partial AS (
      /* per-LANG partial histograms over power-of-two buckets:
         b = floor(log2(x)) + 1 via the binary-string length */
      SELECT lang, length(bin(x)) AS b, count(*) AS cnt
      FROM lens GROUP BY 1, 2
    ),
    merged AS (SELECT b, sum(cnt) AS cnt FROM partial GROUP BY b),
    cum AS (
      SELECT b, cnt,
             sum(cnt) OVER (ORDER BY b) AS cum_cnt
      FROM merged
    ),
    n AS (SELECT count(*) AS n_docs FROM lens),
    ranks AS (
      SELECT p, (p * n.n_docs + 99) // 100 AS rk, n.n_docs
      FROM (SELECT unnest([50, 90, 99]) AS p), n
    ),
    est AS (
      SELECT r.p, r.rk, r.n_docs,
             min(c.b) AS b_hit
      FROM ranks r JOIN cum c ON c.cum_cnt >= r.rk
      GROUP BY 1, 2, 3
    ),
    vhist AS (SELECT x, count(*) AS cnt FROM lens GROUP BY x),
    vcum AS (
      SELECT x, sum(cnt) OVER (ORDER BY x) AS cum_cnt FROM vhist
    ),
    exact AS (
      SELECT e.p, e.n_docs,
             cast(power(2, e.b_hit) as bigint) - 2 AS est_len_bound,
             min(v.x) - 1 AS exact_len
      FROM est e JOIN vcum v ON v.cum_cnt >= e.rk
      GROUP BY 1, 2, 3
    )
    SELECT p,
           cast(n_docs as bigint) AS n_docs,
           cast(est_len_bound as bigint) AS est_len_bound,
           cast(exact_len as bigint) AS exact_len,
           cast(est_len_bound - exact_len as bigint) AS overshoot
    FROM exact ORDER BY p
    """,
)
def q_quantile_sketch_merge(spark, sf_dir):
    """Mergeable QUANTILE sketch — the t-digest/GK-class rung of the
    sketch family (beside the CMS frequency sketch and the KMV/HLL
    cardinality sketches), in its deterministic fixed-boundary form:
    per-lang PARTIAL histograms over power-of-two length buckets
    (b = floor(log2(x))+1 via length(bin(x)) — identical on both
    engines, no float log), merged by counter ADDITION (like CMS, a
    linear structure), then the p50/p90/p99 upper BOUNDS read off the
    cumulative walk. The estimate is one-sided (bucket upper bound >=
    true order statistic); the exact discrete quantile — the value at
    rank ceil(p*n/100), well-defined regardless of tie order — rides
    along to pin the error the sketch actually makes, and the rank is
    computed by exact integer ceil division (no float p*n).

    Scale: the partial relation is at most |langs| x 64 rows whatever
    the corpus size; merge is a 64-row sum; the exact twin walks a
    cumulative over the VALUE histogram (distinct lengths, bounded by
    the value domain — no global row sort anywhere). At 100 TB the
    sketch path alone serves monitoring dashboards; the exact twin
    exists for the oracle discipline."""
    from pyspark.sql import Window as W
    d_ = load_table(spark, sf_dir, "documents")
    lens = d_.selectExpr("lang", "length(text) + 1 AS x")
    partial = (lens.selectExpr("lang", "length(bin(x)) AS b")
               .groupBy("lang", "b").agg(F.count("*").alias("cnt")))
    merged = partial.groupBy("b").agg(F.sum("cnt").alias("cnt"))
    cum = merged.select(
        "b", "cnt", F.sum("cnt").over(W.orderBy("b")).alias("cum_cnt"))
    n_docs = lens.count()  # 1-value aggregate (bounded driver data)
    ranks = spark.createDataFrame(
        [(p, (p * n_docs + 99) // 100, n_docs) for p in (50, 90, 99)],
        "p int, rk bigint, n_docs bigint")
    est = (ranks.join(cum, cum.cum_cnt >= ranks.rk)
           .groupBy("p", "rk", "n_docs").agg(F.min("b").alias("b_hit")))
    # exact discrete quantile WITHOUT a global row sort: cumulative
    # over the VALUE histogram (distinct doc lengths are bounded by
    # the value domain, like the 64-bucket sketch walk — never a
    # single-partition window over the corpus)
    vhist = lens.groupBy("x").agg(F.count("*").alias("cnt"))
    vcum = vhist.select(
        "x", F.sum("cnt").over(W.orderBy("x")).alias("cum_cnt"))
    exact = (est.join(vcum, vcum.cum_cnt >= est.rk)
             .groupBy("p", "n_docs", "b_hit")
             .agg(F.min("x").alias("x_min"))
             .selectExpr("p", "n_docs",
                         "cast(power(2, b_hit) as bigint) - 2"
                         " AS est_len_bound",
                         "x_min - 1 AS exact_len"))
    return (exact.selectExpr(
        "p",
        "cast(n_docs as bigint) AS n_docs",
        "cast(est_len_bound as bigint) AS est_len_bound",
        "cast(exact_len as bigint) AS exact_len",
        "cast(est_len_bound - exact_len as bigint) AS overshoot")
        .orderBy("p"))
