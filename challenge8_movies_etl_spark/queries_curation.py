"""Round-4 wave: curation scoring, privacy/governance, audit
statistics, and engine-internals operators.

No reference analog (the canonical assignment is a pandas ETL); these
extend the training-data-pipeline families (BASELINE.json:6 north
star): model-free quality classification, the hashing trick,
readability scoring, seeded differential-privacy noise, release
auditing (Benford, Gini, zone maps), smoothed target encoding, RFM
segmentation, l-diversity, survival analysis, change-point detection,
day-of-week seasonality, robust scaling, and exact binary (image)
deduplication over real encoded payloads.

Hash-stability follows registry.py conventions: integer/decimal
arithmetic end-to-end where possible; floats only behind declared
rounding points; decimal sums rounded AS DECIMALS before the double
cast (the q_entropy round-half-tie discipline); every computed column
aliased identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import query
from .sources.fixtures import load_table

# ---------------------------------------------------------------------------
# q_quality_classifier — logistic quality scoring (fasttext-style inference)
# ---------------------------------------------------------------------------

# Fixed published-style model: score = b + w·features. The fixture corpus
# has no natural stopwords, so the "filler" lexicon is its three
# highest-frequency function-like tokens.
_FILLERS = "('value', 'table', 'row')"

_QC_ORACLE = f"""
WITH feat AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> t != '')) AS nt,
         len(list_filter(string_split(text, ' '),
                         t -> t IN {_FILLERS})) AS n_fill,
         n_chars
  FROM documents
),
scored AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-(
             -2.0 + 0.9 * ln(1 + nt)
             - 3.0 * (cast(n_fill as double) / nt)
             + 0.1 * (cast(n_chars as double) / nt)))), 6) AS p
  FROM feat WHERE nt > 0
)
SELECT CASE WHEN p >= 0.7 THEN 'keep'
            WHEN p >= 0.4 THEN 'borderline'
            ELSE 'drop' END AS bucket,
       count(*) AS n_docs,
       cast(round(sum(cast(p as decimal(8,6))), 4) as double) AS sum_p
FROM scored GROUP BY 1
"""


@query("q_quality_classifier", oracle=_QC_ORACLE)
def q_quality_classifier(spark, sf_dir):
    """Model-free quality-classifier inference: a fixed logistic model
    over three cheap doc features (log token count, filler-token ratio,
    mean token length) scores every doc; docs bucket into
    keep/borderline/drop — the fasttext-style quality gate of CCNet/
    Gopher pipelines with the learned weights pinned as constants
    (inference is what the 100 TB pass runs; training happens offline).
    p is rounded 6dp; the bucket thresholds compare the ROUNDED p, so
    boundary docs classify identically on both engines; sum_p is a
    decimal sum rounded as a decimal (q_entropy tie discipline).

    Scale: pure per-row codegen (higher-order-function token counts, no
    explode) + one tiny groupBy — zero pre-agg shuffle, same envelope
    as q_text_quality."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(text, ' '), t -> t != '')")
    fills = F.expr(f"size(filter(split(text, ' '), t -> t IN {_FILLERS}))")
    feat = d.select(
        "doc_id", "n_chars",
        F.size(toks).alias("nt"), fills.alias("n_fill"),
    ).filter(F.col("nt") > 0)
    score = (F.lit(-2.0) + 0.9 * F.log(1 + F.col("nt"))
             - 3.0 * (F.col("n_fill").cast("double") / F.col("nt"))
             + 0.1 * (F.col("n_chars").cast("double") / F.col("nt")))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6)
    scored = feat.select("doc_id", p.alias("p"))
    bucket = (F.when(F.col("p") >= 0.7, "keep")
              .when(F.col("p") >= 0.4, "borderline")
              .otherwise("drop"))
    return (scored.groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.sum(F.col("p").cast("decimal(8,6)")), 4)
                 .cast("double").alias("sum_p")))


# ---------------------------------------------------------------------------
# q_feature_hashing — hashing-trick featurization
# ---------------------------------------------------------------------------

_FH_ORACLE = """
WITH tok AS (
  SELECT doc_id, t.w AS w
  FROM documents, unnest(string_split(text, ' ')) AS t(w)
  WHERE t.w != ''
),
hashed AS (
  SELECT doc_id, w,
         cast(('0x' || substr(md5(w || ':fh'), 1, 8)) as bigint)
           % 1024 AS bucket
  FROM tok
)
SELECT bucket,
       count(*) AS n_tokens,
       count(DISTINCT w) AS n_distinct,
       count(DISTINCT doc_id) AS doc_freq
FROM hashed
GROUP BY 1
ORDER BY n_tokens DESC, bucket
LIMIT 30
"""


@query("q_feature_hashing", oracle=_FH_ORACLE)
def q_feature_hashing(spark, sf_dir):
    """The hashing trick: every token maps to md5(token)%1024 — the
    fixed-width featurization that makes bag-of-words practical at
    100 TB (no vocabulary dictionary to build, broadcast, or keep in
    sync across shards). Reports the 30 hottest feature buckets with
    their token count, distinct-token load (collision census — n_distinct
    > 1 IS the hash collision, deterministic under the fixed md5 family
    and therefore value-hash-checked), and document frequency.

    Scale: explode → one map-side-combined groupBy on a 1024-value
    domain; the feature space never grows with the corpus, which is the
    whole point of the trick."""
    d = load_table(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
           .filter(F.col("w") != ""))
    bucket = (F.conv(F.substring(F.md5(F.concat(F.col("w"), F.lit(":fh"))),
                                 1, 8), 16, 10).cast("bigint") % 1024)
    return (tok.select("doc_id", "w", bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("n_tokens"),
                 F.countDistinct("w").alias("n_distinct"),
                 F.countDistinct("doc_id").alias("doc_freq"))
            .orderBy(F.desc("n_tokens"), "bucket").limit(30))


# ---------------------------------------------------------------------------
# q_readability — Flesch-style reading-ease scoring
# ---------------------------------------------------------------------------

_READ_ORACLE = """
WITH feat AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> t != '')) AS words,
         len(regexp_extract_all(text, '[aeiou]+')) AS syllables
  FROM documents
)
SELECT doc_id, words, syllables,
       round(206.835
             - 1.015 * (cast(words as double)
                        / greatest((words + 19) // 20, 1))
             - 84.6 * (cast(syllables as double) / words), 4) AS flesch
FROM feat WHERE words > 0
"""


@query("q_readability", oracle=_READ_ORACLE)
def q_readability(spark, sf_dir):
    """Flesch reading-ease scoring — the classic readability quality
    signal (word/sentence length + syllables/word). Syllables use the
    standard vowel-group heuristic (one syllable per [aeiou]+ run); the
    fixture corpus carries no sentence punctuation, so the sentence
    count is a DECLARED fixed-width segmentation (20 words/sentence,
    documented rather than guessed from absent periods). Integer
    features; one double formula rounded 4dp.

    Scale: per-row codegen (HOF word count + regexp_count) — zero
    shuffle, the same envelope as q_text_quality/q_text_langid."""
    d = load_table(spark, sf_dir, "documents")
    feat = d.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), t -> t != ''))").alias("words"),
        F.expr("regexp_count(text, '[aeiou]+')").alias("syllables"),
    ).filter(F.col("words") > 0)
    sentences = F.greatest(F.expr("(words + 19) DIV 20"), F.lit(1))
    flesch = F.round(
        F.lit(206.835)
        - 1.015 * (F.col("words").cast("double") / sentences)
        - 84.6 * (F.col("syllables").cast("double") / F.col("words")), 4)
    return feat.select("doc_id", "words", "syllables",
                       flesch.alias("flesch"))


# ---------------------------------------------------------------------------
# q_dp_noisy_counts — seeded Laplace differential-privacy release
# ---------------------------------------------------------------------------

_DP_ORACLE = """
WITH c AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY 1
),
noised AS (
  SELECT event_type, n,
         (cast(('0x' || substr(md5(event_type || ':dp42'), 1, 12))
               as bigint) % 999999 + 0.5) / 1000000.0 - 0.5 AS u
  FROM c
)
SELECT event_type,
       round(cast(n as double)
             - 1.0 * sign(u) * ln(1 - 2 * abs(u)), 4) AS noisy_count
FROM noised
"""


@query("q_dp_noisy_counts", oracle=_DP_ORACLE)
def q_dp_noisy_counts(spark, sf_dir):
    """Differentially-private count release: per-type event counts plus
    Laplace(1/eps) noise (eps=1, sensitivity 1) drawn by inverse-CDF
    from a SEEDED md5-derived uniform — reproducible-release DP, where
    the noise is fixed per (key, seed) so re-running the release
    pipeline yields the identical protected table (and the oracle can
    verify it bit-for-bit; true counts never appear in the output).
    u in (-0.5, 0.5) strictly (the +0.5/1e6 offset keeps ln's argument
    positive); noise = -b*sign(u)*ln(1-2|u|).

    Scale: one map-side-combined count; noise is per-GROUP codegen on
    the tiny aggregate relation."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("event_type").agg(F.count("*").alias("n"))
    u = ((F.conv(F.substring(F.md5(F.concat(F.col("event_type"),
                                            F.lit(":dp42"))), 1, 12),
                 16, 10).cast("bigint") % 999999 + 0.5) / 1000000.0 - 0.5)
    noisy = F.round(F.col("n").cast("double")
                    - 1.0 * F.signum(u) * F.log(1 - 2 * F.abs(u)), 4)
    return c.select("event_type", noisy.alias("noisy_count"))


# ---------------------------------------------------------------------------
# q_benford — first-significant-digit audit
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH d AS (
  SELECT cast(substr(cast(cast(floor(o_totalprice) as bigint) as varchar),
              1, 1) as int) AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
t AS (SELECT sum(n) AS total FROM c)
SELECT digit, n,
       round(cast(n as double) / total, 6) AS obs_frac,
       round(log10(1.0 + 1.0 / digit), 6) AS exp_frac,
       round(pow(n - total * log10(1.0 + 1.0 / digit), 2)
             / (total * log10(1.0 + 1.0 / digit)), 4) AS chi2_term
FROM c CROSS JOIN t
ORDER BY digit
"""


@query("q_benford", oracle=_BENFORD_ORACLE)
def q_benford(spark, sf_dir):
    """Benford's-law first-digit audit over order totals: observed
    first-significant-digit fractions vs the log10(1+1/d) expectation,
    with per-digit chi-square terms — the forensic screen a data-release
    / ingest-audit pipeline runs to flag fabricated or truncated numeric
    feeds. Counts are exact; the three derived columns are declared-
    rounded doubles of exact inputs.

    Scale: one map-side-combined groupBy on a 9-value domain + a
    broadcast one-row total — nothing grows with the corpus."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(F.floor("o_totalprice").cast("bigint")
                        .cast("string"), 1, 1).cast("int")
    c = (o.filter(F.col("o_totalprice") >= 1)
         .groupBy(digit.alias("digit")).agg(F.count("*").alias("n")))
    t = c.agg(F.sum("n").alias("total"))
    exp_p = F.log10(1.0 + 1.0 / F.col("digit"))
    return (c.crossJoin(F.broadcast(t))
            .select("digit", "n",
                    F.round(F.col("n").cast("double") / F.col("total"), 6)
                    .alias("obs_frac"),
                    F.round(exp_p, 6).alias("exp_frac"),
                    F.round(F.pow(F.col("n") - F.col("total") * exp_p, 2)
                            / (F.col("total") * exp_p), 4)
                    .alias("chi2_term"))
            .orderBy("digit"))


# ---------------------------------------------------------------------------
# q_gini_concentration — Lorenz/Gini spend-concentration audit
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         cast(round(sum(cast(o_totalprice as decimal(30,10))), 2) * 100
              as bigint) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT c.c_nationkey, s.cents,
         row_number() OVER (PARTITION BY c.c_nationkey
                            ORDER BY s.cents, s.o_custkey) AS i
  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
),
agg AS (
  SELECT c_nationkey, count(*) AS n,
         sum(cents) AS sx, sum(i * cents) AS six
  FROM ranked GROUP BY 1
)
SELECT c_nationkey AS nation, n,
       round(cast(sx as double) / 100, 2) AS total_spend,
       round(cast(2 * six - (n + 1) * sx as double)
             / (cast(n as double) * sx), 6) AS gini
FROM agg
"""


@query("q_gini_concentration", oracle=_GINI_ORACLE)
def q_gini_concentration(spark, sf_dir):
    """Per-nation Gini coefficient of customer spend (Lorenz-curve
    concentration): G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over
    spend ranked ascending — the inequality/concentration audit behind
    domain-mix and contributor-skew monitoring (a source where 1% of
    contributors produce 99% of bytes is a dedup/poisoning flag).
    Spend is pinned to exact integer cents (2dp decimal * 100), so
    every sum/product is exact integer arithmetic; rank ties break on
    custkey; the single double division is the last step.

    Scale: one groupBy for spend, one per-nation window for ranks
    (nation-keyed, co-partitioned with the following agg), one agg —
    the rank window is the standard Lorenz sort, partitioned by the
    report key rather than global."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (o.groupBy("o_custkey")
             .agg((F.round(F.sum(F.col("o_totalprice")
                                 .cast("decimal(30,10)")), 2) * 100)
                  .cast("bigint").alias("cents")))
    ranked = (spend.join(c, spend.o_custkey == c.c_custkey)
              .select("c_nationkey", "cents", "o_custkey")
              .withColumn("i", F.row_number().over(
                  W.partitionBy("c_nationkey")
                  .orderBy("cents", "o_custkey"))))
    agg = (ranked.groupBy("c_nationkey")
           .agg(F.count("*").alias("n"), F.sum("cents").alias("sx"),
                F.sum(F.col("i") * F.col("cents")).alias("six")))
    return agg.select(
        F.col("c_nationkey").alias("nation"), "n",
        F.round(F.col("sx").cast("double") / 100, 2).alias("total_spend"),
        F.round((2 * F.col("six") - (F.col("n") + 1) * F.col("sx"))
                .cast("double")
                / (F.col("n").cast("double") * F.col("sx")), 6)
        .alias("gini"))


# ---------------------------------------------------------------------------
# q_target_encode — smoothed mean target encoding
# ---------------------------------------------------------------------------

_TE_ORACLE = """
WITH lab AS (
  SELECT o_orderpriority,
         CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END AS y
  FROM orders
),
g AS (
  SELECT o_orderpriority, count(*) AS n, cast(sum(y) as bigint) AS pos
  FROM lab GROUP BY 1
),
t AS (SELECT cast(sum(n) as bigint) AS big_n,
             cast(sum(pos) as bigint) AS big_pos FROM g)
SELECT o_orderpriority, n, pos,
       round(cast(pos * big_n + 10 * big_pos as double)
             / (cast(big_n as double) * (n + 10)), 6) AS encoded
FROM g CROSS JOIN t
"""


@query("q_target_encode", oracle=_TE_ORACLE)
def q_target_encode(spark, sf_dir):
    """Smoothed mean target encoding of a categorical feature
    (priority -> P(high-value order)): enc = (pos + m*global_rate) /
    (n + m) with m=10 — the leakage-prone-if-done-wrong featurization
    step, here in its correct global-pass form. Kept exact as the
    rational (pos*N + m*POS) / (N*(n+m)): integer numerator and
    denominator, one declared-rounded double division.

    Scale: one map-side-combined groupBy + a broadcast one-row global —
    the encoding table is |categories| rows and broadcasts back onto
    any downstream scan for application."""
    o = load_table(spark, sf_dir, "orders")
    lab = o.select(
        "o_orderpriority",
        F.when(F.col("o_totalprice") > 200000, 1).otherwise(0).alias("y"))
    g = (lab.groupBy("o_orderpriority")
         .agg(F.count("*").alias("n"), F.sum("y").alias("pos")))
    t = g.agg(F.sum("n").alias("big_n"), F.sum("pos").alias("big_pos"))
    return (g.crossJoin(F.broadcast(t))
            .select("o_orderpriority", "n", "pos",
                    F.round((F.col("pos") * F.col("big_n")
                             + 10 * F.col("big_pos")).cast("double")
                            / (F.col("big_n").cast("double")
                               * (F.col("n") + 10)), 6).alias("encoded")))


# ---------------------------------------------------------------------------
# q_rfm_segment — recency/frequency/monetary quartile segmentation
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS freq,
         cast(round(sum(cast(o_totalprice as decimal(30,10))), 2) * 100
              as bigint) AS cents
  FROM orders GROUP BY 1
),
anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
rfm AS (
  SELECT o_custkey,
         date_diff('day', cast(last_order as date), cast(maxd as date))
           AS recency,
         freq, cents,
         ntile(4) OVER (ORDER BY date_diff('day',
             cast(last_order as date), cast(maxd as date)) DESC,
             o_custkey) AS r_tile,
         ntile(4) OVER (ORDER BY freq, o_custkey) AS f_tile,
         ntile(4) OVER (ORDER BY cents, o_custkey) AS m_tile
  FROM per_cust CROSS JOIN anchor
)
SELECT r_tile * 100 + f_tile * 10 + m_tile AS segment,
       count(*) AS n_customers,
       round(cast(sum(cents) as double) / (100 * count(*)), 2)
         AS avg_monetary
FROM rfm GROUP BY 1
"""


@query("q_rfm_segment", oracle=_RFM_ORACLE)
def q_rfm_segment(spark, sf_dir):
    """RFM segmentation: per-customer recency (days since last order,
    vs the corpus max date), frequency, monetary (exact integer cents)
    quartiled by ntile(4) each — recency DESC so tile 4 = most recent —
    and combined into the classic 3-digit segment code with per-segment
    counts and average spend. Every ntile ordering carries a custkey
    tie-break, so tile boundaries are deterministic at any parallelism.

    Scale: one groupBy builds the per-customer relation; the three
    ntiles are global sorts over |customers| rows (range-partitioned
    sorts at 100 TB — same machinery as q_shuffle_deterministic); the
    final agg is on a 64-value domain."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count("*").alias("freq"),
                     (F.round(F.sum(F.col("o_totalprice")
                                    .cast("decimal(30,10)")), 2) * 100)
                     .cast("bigint").alias("cents")))
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    rfm = (per_cust.crossJoin(F.broadcast(anchor))
           .withColumn("recency",
                       F.datediff(F.col("maxd").cast("date"),
                                  F.col("last_order").cast("date"))))
    rfm = (rfm
           .withColumn("r_tile", F.ntile(4).over(
               W.orderBy(F.desc("recency"), "o_custkey")))
           .withColumn("f_tile", F.ntile(4).over(
               W.orderBy("freq", "o_custkey")))
           .withColumn("m_tile", F.ntile(4).over(
               W.orderBy("cents", "o_custkey"))))
    return (rfm.groupBy((F.col("r_tile") * 100 + F.col("f_tile") * 10
                         + F.col("m_tile")).alias("segment"))
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum("cents").cast("double")
                         / (100 * F.count("*")), 2).alias("avg_monetary")))


# ---------------------------------------------------------------------------
# q_l_diversity — sensitive-attribute diversity audit
# ---------------------------------------------------------------------------

_LDIV_ORACLE = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n
  FROM customer GROUP BY 1, 2
),
qi AS (
  SELECT c_nationkey, cast(sum(n) as bigint) AS n_rows,
         count(*) AS l_distinct,
         max(n) AS max_sens
  FROM g GROUP BY 1
)
SELECT c_nationkey AS nation, n_rows, l_distinct,
       l_distinct >= 3 AS meets_l3,
       round(cast(max_sens as double) / n_rows, 4) AS top_sens_frac
FROM qi
"""


@query("q_l_diversity", oracle=_LDIV_ORACLE)
def q_l_diversity(spark, sf_dir):
    """l-diversity audit — the companion gate to q_k_anonymity: a
    QI group that is k-large but where (nearly) every member shares one
    sensitive value still leaks it. Per QI group (nation), reports the
    distinct sensitive values (market segment), whether l>=3 holds, and
    the top-value fraction (the homogeneity-attack surface). Exact
    counts; one declared-rounded fraction.

    Scale: two stacked map-side-combined groupBys — the second runs on
    the |QI|x|sensitive| relation, never the fact table."""
    c = load_table(spark, sf_dir, "customer")
    g = (c.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count("*").alias("n")))
    qi = (g.groupBy("c_nationkey")
          .agg(F.sum("n").alias("n_rows"),
               F.count("*").alias("l_distinct"),
               F.max("n").alias("max_sens")))
    return qi.select(
        F.col("c_nationkey").alias("nation"), "n_rows", "l_distinct",
        (F.col("l_distinct") >= 3).alias("meets_l3"),
        F.round(F.col("max_sens").cast("double") / F.col("n_rows"), 4)
        .alias("top_sens_frac"))


# ---------------------------------------------------------------------------
# q_zonemap_prune — min/max zone-map pruning simulation
# ---------------------------------------------------------------------------

_ZM_ORACLE = """
WITH laid AS (
  SELECT o_totalprice,
         o_orderkey // 1000 AS chunk_nat,
         (row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1)
           // 1000 AS chunk_clu
  FROM orders
),
both_layouts AS (
  SELECT 'natural' AS layout, chunk_nat AS chunk, o_totalprice FROM laid
  UNION ALL
  SELECT 'clustered' AS layout, chunk_clu AS chunk, o_totalprice FROM laid
),
chunks AS (
  SELECT layout, chunk,
         count(*) AS n,
         count(CASE WHEN o_totalprice > 300000 THEN 1 END) AS n_match,
         min(o_totalprice) AS mn, max(o_totalprice) AS mx
  FROM both_layouts GROUP BY 1, 2
)
SELECT layout,
       CASE WHEN mx <= 300000 THEN 'skip'
            WHEN mn > 300000 THEN 'full'
            ELSE 'partial' END AS status,
       count(*) AS n_chunks,
       cast(sum(n) as bigint) AS n_rows,
       cast(sum(n_match) as bigint) AS n_matching
FROM chunks GROUP BY 1, 2
"""


@query("q_zonemap_prune", oracle=_ZM_ORACLE)
def q_zonemap_prune(spark, sf_dir):
    """Zone-map (min/max statistics) pruning simulation under TWO
    physical layouts: 1000-row chunks carry min/max of the filter
    column; against `price > 300000` each chunk classifies skip (max
    under the predicate — never read), full (min over — no per-row
    filter needed), or partial — exactly the scan-pruning arithmetic
    parquet row-group stats and Delta/Iceberg file stats perform, made
    explicit and value-checked. The 'natural' (insertion-order) layout
    prunes nothing — every chunk spans the price range — while the
    'clustered' (price-sorted) layout skips ~all non-matching chunks:
    the measured argument for why q_zorder_layout/q_compaction_plan
    exist. The skip fraction IS the I/O a 100 TB scan avoids.

    Scale: natural chunks are pure arithmetic on the key; the clustered
    layout costs one global sort (range-partitioned at scale — a
    one-time write-path cost, which is the actual trade-off); stats are
    map-side-combined groupBys."""
    o = load_table(spark, sf_dir, "orders")
    laid = o.select(
        "o_totalprice",
        F.expr("o_orderkey DIV 1000").alias("chunk_nat"),
        F.expr("(row_number() OVER (ORDER BY o_totalprice, o_orderkey)"
               " - 1) DIV 1000").alias("chunk_clu"))
    both = (laid.select(F.lit("natural").alias("layout"),
                        F.col("chunk_nat").alias("chunk"), "o_totalprice")
            .unionAll(laid.select(F.lit("clustered").alias("layout"),
                                  F.col("chunk_clu").alias("chunk"),
                                  "o_totalprice")))
    chunks = (both.groupBy("layout", "chunk")
              .agg(F.count("*").alias("n"),
                   F.count(F.when(F.col("o_totalprice") > 300000, 1))
                   .alias("n_match"),
                   F.min("o_totalprice").alias("mn"),
                   F.max("o_totalprice").alias("mx")))
    status = (F.when(F.col("mx") <= 300000, "skip")
              .when(F.col("mn") > 300000, "full")
              .otherwise("partial"))
    return (chunks.groupBy("layout", status.alias("status"))
            .agg(F.count("*").alias("n_chunks"),
                 F.sum("n").alias("n_rows"),
                 F.sum("n_match").alias("n_matching")))


# ---------------------------------------------------------------------------
# q_survival_km — Kaplan-Meier estimator
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH durations AS (
  SELECT date_diff('day', cast(o.o_orderdate as date),
                   cast(l.l_shipdate as date)) AS t,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_t AS (
  SELECT t, count(*) AS c, cast(sum(ev) as bigint) AS d
  FROM durations GROUP BY 1
),
risk AS (
  SELECT t, d,
         cast(sum(c) OVER (ORDER BY t DESC) as bigint) AS n_risk
  FROM per_t
),
terms AS (
  SELECT t, d, n_risk,
         cast(round(ln(cast(n_risk - d as double) / n_risk), 8)
              as decimal(14,8)) AS lnterm
  FROM risk WHERE d < n_risk
)
SELECT t, n_risk, d AS d_events,
       round(exp(cast(sum(lnterm) OVER (ORDER BY t) as double)), 6)
         AS survival
FROM terms
ORDER BY t
LIMIT 25
"""


@query("q_survival_km", oracle=_KM_ORACLE)
def q_survival_km(spark, sf_dir):
    """Kaplan-Meier survival estimator over order-to-ship durations
    (event = the line was returned; non-returned lines censor at their
    ship time): S(t) = prod_{t_i<=t} (1 - d_i/n_i), the standard
    time-to-event curve for churn/retention/failure analytics. Computed
    as exp of a cumulative sum of 8dp-rounded log terms summed as exact
    decimals (the q_entropy discipline applied to a product: reduction
    order cannot move the hash); risk sets come from one reverse
    cumulative count. First 25 time points.

    Scale: the duration histogram is one map-side-combined groupBy on
    the joined fact table (AQE picks broadcast for orders at small sf;
    key-shuffle at 100 TB); everything after runs on the |distinct t|
    relation (~hundreds of rows at any corpus size, single-partition
    windows are fine there)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    dur = (l.join(o, l.l_orderkey == o.o_orderkey)
           .select(F.datediff(F.col("l_shipdate").cast("date"),
                              F.col("o_orderdate").cast("date")).alias("t"),
                   F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
                   .alias("ev")))
    per_t = dur.groupBy("t").agg(F.count("*").alias("c"),
                                 F.sum("ev").alias("d"))
    risk = per_t.select(
        "t", "d",
        F.sum("c").over(W.orderBy(F.desc("t"))).alias("n_risk"))
    terms = (risk.filter(F.col("d") < F.col("n_risk"))
             .select("t", "d", "n_risk",
                     F.round(F.log((F.col("n_risk") - F.col("d"))
                                   .cast("double") / F.col("n_risk")), 8)
                     .cast("decimal(14,8)").alias("lnterm")))
    surv = F.round(F.exp(F.sum("lnterm").over(W.orderBy("t"))
                         .cast("double")), 6)
    return (terms.select("t", "n_risk", F.col("d").alias("d_events"),
                         surv.alias("survival"))
            .orderBy("t").limit(25))


# ---------------------------------------------------------------------------
# q_changepoint — mean-shift change-point detection
# ---------------------------------------------------------------------------

_CP_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d, count(*) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT d, x,
         row_number() OVER (ORDER BY d) AS t,
         sum(x) OVER (ORDER BY d) AS s,
         sum(x) OVER () AS tot,
         count(*) OVER () AS n
  FROM daily
),
stats AS (
  SELECT d, t, n, s, tot,
         cast(s * (n - t) - (tot - s) * t as decimal(19,0)) AS num
  FROM idx WHERE t < n
),
scored AS (
  SELECT d, t, n, s, tot,
         round(cast(num * num as double)
               / (cast(t as double) * (n - t)), 6) AS stat
  FROM stats
)
SELECT cast(d as varchar) AS split_day, stat,
       round(cast(s as double) / t, 4) AS mean_left,
       round(cast(tot - s as double) / (n - t), 4) AS mean_right
FROM scored
ORDER BY stat DESC, split_day
LIMIT 1
"""


@query("q_changepoint", oracle=_CP_ORACLE)
def q_changepoint(spark, sf_dir):
    """Single change-point detection on the daily event-count series:
    for every split t the between-segment statistic
    num^2 / (t*(n-t)) with num = s_t*(n-t) - (S-s_t)*t (the n-scaled
    CUSUM/mean-shift form: every num is exact integer arithmetic on
    counts, so the argmax is engine-independent; decimal square guards
    overflow) — the ingest-monitoring primitive that flags the day a
    source's volume regime shifted. Ties break on the earlier day.

    Scale: the daily rollup is one map-side-combined groupBy; the
    split scan is windows over the |days| relation (hundreds of rows
    at any corpus size)."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("x")))
    wd = W.orderBy("d")
    idx = daily.select(
        "d", "x",
        F.row_number().over(wd).alias("t"),
        F.sum("x").over(wd).alias("s"),
        F.sum("x").over(W.partitionBy(F.lit(1))).alias("tot"),
        F.count("*").over(W.partitionBy(F.lit(1))).alias("n"))
    stats = (idx.filter(F.col("t") < F.col("n"))
             .withColumn("num", (F.col("s") * (F.col("n") - F.col("t"))
                                 - (F.col("tot") - F.col("s")) * F.col("t"))
                         .cast("decimal(19,0)")))
    scored = stats.withColumn(
        "stat", F.round((F.col("num") * F.col("num")).cast("double")
                        / (F.col("t").cast("double")
                           * (F.col("n") - F.col("t"))), 6))
    return (scored.select(F.col("d").cast("string").alias("split_day"),
                          "stat",
                          F.round(F.col("s").cast("double") / F.col("t"), 4)
                          .alias("mean_left"),
                          F.round((F.col("tot") - F.col("s")).cast("double")
                                  / (F.col("n") - F.col("t")), 4)
                          .alias("mean_right"))
            .orderBy(F.desc("stat"), "split_day").limit(1))


# ---------------------------------------------------------------------------
# q_seasonal_dow — day-of-week seasonal index
# ---------------------------------------------------------------------------

_DOW_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d, count(*) AS x
  FROM events GROUP BY 1
),
dow AS (
  SELECT date_diff('day', DATE '1970-01-01', d) % 7 AS dow,
         count(*) AS n_days, cast(sum(x) as bigint) AS sx
  FROM daily GROUP BY 1
),
t AS (SELECT cast(sum(n_days) as bigint) AS big_n,
             cast(sum(sx) as bigint) AS big_s FROM dow)
SELECT dow, n_days, sx AS n_events,
       round(cast(sx * big_n as double)
             / (cast(n_days as double) * big_s), 6) AS seasonal_index
FROM dow CROSS JOIN t
ORDER BY dow
"""


@query("q_seasonal_dow", oracle=_DOW_ORACLE)
def q_seasonal_dow(spark, sf_dir):
    """Day-of-week seasonal index of event volume: mean daily count per
    weekday over the overall mean, in the n-scaled rational form
    (sx*N)/(n_days*S) so both engines divide the same exact integers
    once. Weekday = epoch-day mod 7 (engine-portable: Spark dayofweek
    is 1-based-Sunday, DuckDB 0-based — the epoch arithmetic sidesteps
    the convention gap). The seasonal profile is the denominator for
    seasonally-adjusted anomaly gates (q_anomaly_zscore over x_t /
    index_dow).

    Scale: daily rollup groupBy, then a 7-value-domain agg + broadcast
    one-row total."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("x")))
    dow = (daily.groupBy((F.datediff("d", F.lit("1970-01-01")) % 7)
                         .alias("dow"))
           .agg(F.count("*").alias("n_days"), F.sum("x").alias("sx")))
    t = dow.agg(F.sum("n_days").alias("big_n"), F.sum("sx").alias("big_s"))
    return (dow.crossJoin(F.broadcast(t))
            .select("dow", "n_days", F.col("sx").alias("n_events"),
                    F.round((F.col("sx") * F.col("big_n")).cast("double")
                            / (F.col("n_days").cast("double")
                               * F.col("big_s")), 6)
                    .alias("seasonal_index"))
            .orderBy("dow"))


# ---------------------------------------------------------------------------
# q_robust_scale — median/IQR robust scaling
# ---------------------------------------------------------------------------

_RS_ORACLE = """
WITH q AS (
  SELECT c_nationkey,
         round(quantile_cont(c_acctbal, 0.5), 6) AS med,
         round(quantile_cont(c_acctbal, 0.75)
               - quantile_cont(c_acctbal, 0.25), 6) AS iqr
  FROM customer GROUP BY 1
)
SELECT c.c_nationkey AS nation,
       count(*) AS n,
       max(q.med) AS med, max(q.iqr) AS iqr,
       count(CASE WHEN abs(c.c_acctbal - q.med) > 2 * q.iqr THEN 1 END)
         AS n_extreme
FROM customer c JOIN q ON c.c_nationkey = q.c_nationkey
GROUP BY 1
"""


@query("q_robust_scale", oracle=_RS_ORACLE)
def q_robust_scale(spark, sf_dir):
    """Robust (median/IQR) scaling statistics per nation — the
    outlier-insensitive alternative to q_minmax_scale's min/max (one
    corrupt extreme row moves min/max arbitrarily; the median and IQR
    don't). Reports the scaling parameters and how many rows land
    beyond 2 IQRs from the median. Quantiles are pinned to a DECLARED
    6dp before any comparison (the q_outlier_iqr ulp discipline: the
    engines' interpolation formulas differ by 1 ulp).

    Scale: one exact-percentile per-nation agg (per-key sort, not
    global) broadcast back onto the dimension scan; at 100 TB swap in
    percentile_approx (q_percentile_approx pattern), plan unchanged."""
    c = load_table(spark, sf_dir, "customer")
    q = (c.groupBy("c_nationkey")
         .agg(F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("med"),
              F.round(F.expr("percentile(c_acctbal, 0.75)"
                             " - percentile(c_acctbal, 0.25)"), 6)
              .alias("iqr")))
    j = c.join(F.broadcast(q), "c_nationkey")
    return (j.groupBy(F.col("c_nationkey").alias("nation"))
            .agg(F.count("*").alias("n"),
                 F.max("med").alias("med"), F.max("iqr").alias("iqr"),
                 F.count(F.when(F.abs(F.col("c_acctbal") - F.col("med"))
                                > 2 * F.col("iqr"), 1)).alias("n_extreme")))


# ---------------------------------------------------------------------------
# q_image_dedup_exact — exact binary dedup over real encoded payloads
# ---------------------------------------------------------------------------

# The corpus knob: payloads are synthesized from doc_id % 97, so every
# ~97th doc carries a byte-identical image. The encoders are injective
# over 0..96 (fmt = d%3; dims d%13+1 x d%7+1; BMP/PPM color r = d < 256;
# JPEG gray = (d*5)%128*2 with 5 invertible mod 128), so md5-equality
# groups == residue groups and the closed-form oracle can verify the
# real binary-hash dedup without constructing a single byte.
_IMG_DEDUP_ORACLE = """
WITH g AS (
  SELECT doc_id % 97 AS synth_id, min(doc_id) AS keeper,
         count(*) AS n_copies
  FROM documents GROUP BY 1
)
SELECT keeper, n_copies,
       CASE synth_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
            ELSE 'jpeg' END AS fmt
FROM g
"""


@query("q_image_dedup_exact", oracle=_IMG_DEDUP_ORACLE)
def q_image_dedup_exact(spark, sf_dir):
    """Exact binary deduplication of an image corpus: md5 over the raw
    payload bytes groups byte-identical images; keep the min doc_id per
    group with its copy count and container format (sniffed from magic
    bytes, not trusted metadata) — the first rung of every multimodal
    dedup ladder (byte-exact before perceptual). The Spark side hashes
    REAL encoded BMP/PPM/JPEG payloads (operators/multimodal.py
    encoders, doc_id%97 duplication knob); the oracle exploits encoder
    injectivity to verify the md5 groups from the closed form — see
    module comment.

    Scale: payload synthesis/ingest is mapInPandas (no shuffle); the
    dedup is one groupBy on the 128-bit digest — the exact-dedup plan
    at any corpus size (hash, never pairwise)."""
    from .operators.jpeg import encode_jpeg_gray_uniform
    from .operators.multimodal import encode_bmp, encode_ppm

    d = load_table(spark, sf_dir, "documents")

    def synth(batches):
        import pandas as pd
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id) % 97
                w, h = k % 13 + 1, k % 7 + 1
                if k % 3 == 2:
                    payloads.append(
                        encode_jpeg_gray_uniform(w, h, (k * 5) % 128 * 2))
                else:
                    r, g, b = k % 256, (k * 7) % 256, (k * 13) % 256
                    enc = encode_bmp if k % 3 == 0 else encode_ppm
                    payloads.append(enc(w, h, r, g, b))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    media = d.select("doc_id").mapInPandas(
        synth, schema="doc_id bigint, payload binary")
    fmt = (F.when(F.expr("substring(payload, 1, 2)") == F.lit(b"BM"), "bmp")
           .when(F.expr("substring(payload, 1, 2)") == F.lit(b"P6"), "ppm")
           .otherwise("jpeg"))
    return (media.select("doc_id", F.md5("payload").alias("sig"),
                         fmt.alias("fmt"))
            .groupBy("sig", "fmt")
            .agg(F.min("doc_id").alias("keeper"),
                 F.count("*").alias("n_copies"))
            .select("keeper", "n_copies", "fmt"))


# ---------------------------------------------------------------------------
# q_t_closeness — sensitive-distribution distance audit
# ---------------------------------------------------------------------------

_TCLOSE_ORACLE = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n
  FROM customer GROUP BY 1, 2
),
seg AS (
  SELECT c_mktsegment, cast(sum(n) as bigint) AS n_i FROM g GROUP BY 1
),
grp AS (
  SELECT c_nationkey, cast(sum(n) as bigint) AS n_g FROM g GROUP BY 1
),
tot AS (
  SELECT cast(sum(n) as bigint) AS n_tot FROM g
),
cells AS (
  SELECT grp.c_nationkey, grp.n_g, seg.c_mktsegment, seg.n_i,
         coalesce(g.n, 0) AS n_gi
  FROM grp CROSS JOIN seg
  LEFT JOIN g ON g.c_nationkey = grp.c_nationkey
             AND g.c_mktsegment = seg.c_mktsegment
)
SELECT c.c_nationkey AS nation,
       max(c.n_g) AS n_rows,
       cast(sum(abs(c.n_gi * t.n_tot - c.n_i * c.n_g)) as double)
         / cast(2 * max(c.n_g) * max(t.n_tot) as double) AS tvd,
       (cast(sum(abs(c.n_gi * t.n_tot - c.n_i * c.n_g)) as double)
         / cast(2 * max(c.n_g) * max(t.n_tot) as double)) <= 0.2
         AS meets_t02
FROM cells c CROSS JOIN tot t
GROUP BY c.c_nationkey
"""


@query("q_t_closeness", oracle=_TCLOSE_ORACLE)
def q_t_closeness(spark, sf_dir):
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third rung of the privacy ladder: k-anonymity bounds group SIZE
    (q_k_anonymity), l-diversity bounds distinct sensitive VALUES
    (q_l_diversity), t-closeness bounds how far a QI group's whole
    sensitive DISTRIBUTION sits from the corpus distribution. For a
    categorical sensitive attribute EMD reduces to total variation
    distance 0.5*sum|p_i - q_i|; clearing denominators makes every
    numerator |n_gi*N - N_i*n_g| an exact integer, so tvd is one IEEE
    division of two exact integers — deterministic with no rounding
    at all (the q_graph_link_predict ppm trick, float edition).

    Scale: one fact-table groupBy to the |QI|x|sensitive| cell
    relation; everything after (marginals, the dense cell cross-join
    including zero cells, the distance) runs on that tiny relation.
    The bigint numerator product overflows around N ~ 3e9 rows —
    lift to decimal(38,0) there."""
    c = load_table(spark, sf_dir, "customer")
    g = (c.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count("*").alias("n")))
    g = g.persist()
    seg = g.groupBy("c_mktsegment").agg(F.sum("n").alias("n_i"))
    grp = g.groupBy("c_nationkey").agg(F.sum("n").alias("n_g"))
    tot = g.agg(F.sum("n").alias("n_tot"))
    cells = (grp.crossJoin(F.broadcast(seg))
             .join(g, ["c_nationkey", "c_mktsegment"], "left")
             .select("c_nationkey", "n_g", "n_i",
                     F.coalesce(F.col("n"), F.lit(0)).alias("n_gi")))
    num = F.abs(F.col("n_gi") * F.col("n_tot")
                - F.col("n_i") * F.col("n_g"))
    tvd = (F.sum(num).cast("double")
           / (2 * F.max("n_g") * F.max("n_tot")).cast("double"))
    return (cells.crossJoin(F.broadcast(tot))
            .groupBy(F.col("c_nationkey").alias("nation"))
            .agg(F.max("n_g").cast("long").alias("n_rows"),
                 tvd.alias("tvd"),
                 (tvd <= 0.2).alias("meets_t02")))


# ---------------------------------------------------------------------------
# q_coverage_select — greedy maximum-coverage data selection
# ---------------------------------------------------------------------------

_COVER_ROUNDS = 5


def _cover_oracle() -> str:
    """Unroll the greedy rounds: pick the doc with the most uncovered
    bigrams (ties to the lowest doc_id), remove its bigrams, repeat."""
    # MATERIALIZED is load-bearing (round-8 sf1.0 sweep): each round
    # references its predecessor 3× (scan, NOT-IN subquery, pick), so
    # un-materialized CTEs re-evaluate the whole chain ~3^rounds times
    # — fine at 275 k tokens, runaway at the sf1.0 decade's 2.7 M.
    parts = ["""
WITH toks0 AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i + 1] AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS t,
               unnest(range(1, len(string_split(text, ' ')))) AS i
        FROM documents)
)"""]
    prev = "toks0"
    for r in range(1, _COVER_ROUNDS + 1):
        parts.append(f""",
p{r} AS MATERIALIZED (
  SELECT doc_id, count(*) AS gain
  FROM {prev} GROUP BY doc_id
  ORDER BY gain DESC, doc_id LIMIT 1
),
toks{r} AS MATERIALIZED (
  SELECT t.doc_id, t.tok FROM {prev} t
  WHERE t.tok NOT IN (SELECT tok FROM {prev}
                      WHERE doc_id = (SELECT doc_id FROM p{r}))
    AND t.doc_id <> (SELECT doc_id FROM p{r})
)""")
        prev = f"toks{r}"
    picks = " UNION ALL ".join(
        f"SELECT {r} AS round, doc_id, gain FROM p{r}"
        for r in range(1, _COVER_ROUNDS + 1))
    parts.append(f"""
SELECT round, doc_id, cast(gain as bigint) AS gain,
       cast(sum(gain) OVER (ORDER BY round) as bigint) AS covered_total
FROM ({picks})
ORDER BY round""")
    return "".join(parts)


@query("q_coverage_select", oracle=_cover_oracle())
def q_coverage_select(spark, sf_dir):
    """Greedy maximum-coverage subset selection — the submodular
    data-selection primitive (Kirchhoff & Bilmes 2014) behind "pick
    the K documents that together cover the most vocabulary":
    5 greedy rounds, each selecting the document with the most
    not-yet-covered bigrams (ties to the lowest doc_id), then
    retiring those bigrams. Classic (1 - 1/e) greedy guarantee;
    reported gain per round is exactly the marginal coverage, so
    covered_total is its running sum. The selection loop is
    driver-orchestrated like kmeans/pagerank; the oracle unrolls all
    5 rounds into chained CTEs.

    Scale: the covered vocabulary after K rounds is at most K x (one
    document's bigrams) — driver-held and shipped back each round as an
    ARRAY LITERAL into `array_except` over per-doc distinct-bigram
    arrays (optimization round r11, replacing the broadcast-anti-join +
    groupBy + argmax-join round shape): the per-doc array is built ONCE
    by pure array expressions inside the scan projection (no explode,
    no distinct shuffle — the greedy phase plans ZERO exchanges), and
    every round is one exchange-free pass over |docs| rows ending in a
    TakeOrdered(1) whose collected row already carries the winner's
    uncovered tokens. Measured 4.1-6.7 s → 2.0-2.6 s at sf0.1
    (alternating A/B, identical picks — covered ∪ uncovered-subset
    equals the old covered ∪ full-token-set update). At 100 TB each
    round is still one full-corpus scan — now with no shuffle at all;
    if K x doc_len ever outgrows a literal/broadcast, flip the covered
    set back to a shuffle anti-join — still one exchange."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    grams = F.array_distinct(F.transform(
        F.arrays_zip(F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                     F.expr("slice(split(text, ' '), 2,"
                            " greatest(size(split(text, ' ')) - 1, 0))")),
        lambda p: F.concat(p["0"], F.lit(" "), p["1"])))
    arrs = d.select("doc_id", grams.alias("toks")).persist()

    picks = []
    covered: set[str] = set()
    picked_ids: list[int] = []
    for r in range(1, _COVER_ROUNDS + 1):
        cand = arrs
        if picked_ids:
            cand = cand.filter(~F.col("doc_id").isin(picked_ids))
            unc = F.array_except(
                F.col("toks"),
                F.lit(sorted(covered)).cast("array<string>"))
        else:
            unc = F.col("toks")
        row = (cand.select("doc_id", unc.alias("unc"))
               .select("doc_id", F.size("unc").alias("gain"), "unc")
               .orderBy(F.desc("gain"), "doc_id").limit(1)
               .collect()[0])
        doc_id, gain = int(row.doc_id), int(row.gain)
        if gain == 0:
            # Every remaining doc is fully covered. The oracle's round
            # CTE is EMPTY here (a covered doc has no rows left in
            # toks{r}), so it emits no pick for this round — stop
            # instead of appending a zero-gain row it would not have
            # (ADVICE r11; unreachable on the fixtures, which gain >0
            # in all 5 rounds — results unchanged there).
            break
        picks.append((r, doc_id, gain))
        picked_ids.append(doc_id)
        covered.update(row.unc)
    arrs.unpersist()
    out = spark.createDataFrame(picks, "round int, doc_id long, gain long")
    return out.select(
        "round", "doc_id", "gain",
        F.sum("gain").over(
            W.orderBy("round").rowsBetween(W.unboundedPreceding, 0))
        .cast("long").alias("covered_total"))


# ---------------------------------------------------------------------------
# q_erasure_purge — right-to-be-forgotten purge with tombstone audit
# ---------------------------------------------------------------------------

_ERASE_ORACLE = """
WITH erase AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
),
audit AS (
  SELECT e.event_type,
         count(*) AS n_before,
         sum(CASE WHEN x.user_id IS NOT NULL THEN 1 ELSE 0 END)
           AS n_purged
  FROM events e LEFT JOIN erase x ON x.user_id = e.user_id
  GROUP BY 1
)
SELECT event_type,
       cast(n_before as bigint) AS n_before,
       cast(n_purged as bigint) AS n_purged,
       cast(n_before - n_purged as bigint) AS n_after,
       cast((SELECT count(*) FROM erase) as bigint) AS n_users_erased
FROM audit ORDER BY event_type
"""


@query("q_erasure_purge", oracle=_ERASE_ORACLE)
def q_erasure_purge(spark, sf_dir):
    """Right-to-be-forgotten purge audit: given a deterministic
    erasure list (user_id % 97 = 0 stands in for the DSAR queue),
    report per event type how many rows existed, how many the purge
    removes, and how many remain — the tombstone record data
    governance requires BEFORE the destructive rewrite runs (the
    rewrite itself is the same anti-join feeding
    write_partitioned_parquet; q_upsert/q_cdc_apply own the
    mutation mechanics). Completes the governance family beside
    q_k_anonymity / q_l_diversity / q_t_closeness / q_dp_*.

    Scale: erasure lists are small relative to the fact table —
    broadcast the anti-join side; beyond broadcast size, prefilter
    with the bloom pass (q_bloom_prefilter) so only candidate rows
    shuffle. Either way the audit is ONE scan with map-side
    aggregation."""
    e = load_table(spark, sf_dir, "events")
    erase = (e.filter(F.col("user_id") % 97 == 0)
             .select("user_id").distinct().persist())
    n_erased = erase.count()
    audit = (e.join(F.broadcast(erase.withColumn("hit", F.lit(1))),
                    "user_id", "left")
             .groupBy("event_type")
             .agg(F.count("*").alias("n_before"),
                  F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                  .alias("n_purged")))
    return (audit.select(
        "event_type",
        F.col("n_before").cast("long").alias("n_before"),
        F.col("n_purged").cast("long").alias("n_purged"),
        (F.col("n_before") - F.col("n_purged")).cast("long")
        .alias("n_after"),
        F.lit(n_erased).cast("long").alias("n_users_erased"))
        .orderBy("event_type"))


# ---------------------------------------------------------------------------
# q_rake_keywords — RAKE keyphrase extraction (integer-degree variant)
# ---------------------------------------------------------------------------


@query(
    "q_rake_keywords",
    oracle="""
    WITH words AS (
      SELECT doc_id, u.pos, u.w,
             CASE WHEN u.w IN ('the', 'a') THEN 1 ELSE 0 END AS st
      FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS w,
                           generate_subscripts(
                             string_split(text, ' '), 1) AS pos) u
    ),
    cand AS (
      SELECT doc_id, pos, w,
             pos - row_number() OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS grp
      FROM words WHERE st = 0
    ),
    chunked AS (
      SELECT doc_id, grp, w, pos,
             (row_number() OVER (PARTITION BY doc_id, grp
                                 ORDER BY pos) - 1) // 3 AS chunk,
             (row_number() OVER (PARTITION BY doc_id, grp
                                 ORDER BY pos) - 1) % 3 + 1 AS k
      FROM cand
    ),
    plen AS (
      SELECT doc_id, grp, chunk, count(*) AS len
      FROM chunked GROUP BY 1, 2, 3
    ),
    wdeg AS (
      SELECT c.w, sum(p.len) AS deg
      FROM chunked c
      JOIN plen p ON p.doc_id = c.doc_id AND p.grp = c.grp
                 AND p.chunk = c.chunk
      GROUP BY c.w
    ),
    phrases AS (
      SELECT c.doc_id, c.grp, c.chunk,
             concat_ws(' ',
               max(CASE WHEN c.k = 1 THEN c.w END),
               max(CASE WHEN c.k = 2 THEN c.w END),
               max(CASE WHEN c.k = 3 THEN c.w END)) AS phrase,
             cast(sum(d.deg) as bigint) AS score
      FROM chunked c JOIN wdeg d ON d.w = c.w
      GROUP BY c.doc_id, c.grp, c.chunk
    ),
    uniq AS (
      SELECT phrase, max(score) AS score, count(*) AS n_occur
      FROM phrases GROUP BY phrase
    )
    SELECT phrase, score, n_occur FROM uniq
    ORDER BY score DESC, phrase LIMIT 15
    """,
)
def q_rake_keywords(spark, sf_dir):
    """RAKE keyphrase extraction (Rose et al. 2010), integer-degree
    variant: candidate phrases are stopword-delimited word runs
    capped at 3 words (the common length-capped RAKE variant — this
    corpus's 2-word stopword list would otherwise yield
    document-length runs), each word is scored by its RAKE degree
    (sum of the lengths of every phrase occurrence containing it —
    co-occurrence including self), and a phrase scores the sum of
    its words' degrees. Integer-only scoring keeps every value
    hash-exact; deg/freq (the float variant) rides the same
    sufficient statistics. Output: top-15 distinct phrases by
    (score, phrase) with occurrence counts — the zero-training
    keyphrase baseline next to q_textrank_keywords' graph ranking.

    Scale: one scan explodes to word-position rows; run/chunk ids
    are two windows partitioned by doc (bounded rows per doc); the
    degree table is vocabulary-sized and broadcast back; top-15 is
    TakeOrderedAndProject, never a full sort."""
    d = load_table(spark, sf_dir, "documents")
    words = (d.select("doc_id", F.posexplode(F.split("text", " "))
                      .alias("pos", "w"))
             .withColumn("st", F.col("w").isin("the", "a")))
    wd = W.partitionBy("doc_id").orderBy("pos")
    cand = (words.filter(~F.col("st"))
            .select("doc_id", "pos", "w",
                    (F.col("pos") - F.row_number().over(wd)).alias("grp")))
    wg = W.partitionBy("doc_id", "grp").orderBy("pos")
    rn = F.row_number().over(wg) - 1
    chunked = cand.select(
        "doc_id", "grp", "w", "pos",
        (rn / 3).cast("long").alias("chunk"),
        (rn % 3 + 1).alias("k"))
    plen = (chunked.groupBy("doc_id", "grp", "chunk")
            .agg(F.count("*").alias("len")))
    wdeg = (chunked.join(plen, ["doc_id", "grp", "chunk"])
            .groupBy("w").agg(F.sum("len").alias("deg")))
    phrases = (chunked.join(F.broadcast(wdeg), "w")
               .groupBy("doc_id", "grp", "chunk")
               .agg(F.concat_ws(
                        " ",
                        F.max(F.when(F.col("k") == 1, F.col("w"))),
                        F.max(F.when(F.col("k") == 2, F.col("w"))),
                        F.max(F.when(F.col("k") == 3, F.col("w"))))
                    .alias("phrase"),
                    F.sum("deg").cast("long").alias("score")))
    return (phrases.groupBy("phrase")
            .agg(F.max("score").alias("score"),
                 F.count("*").alias("n_occur"))
            .orderBy(F.desc("score"), "phrase").limit(15))


# ---------------------------------------------------------------------------
# q_survival_nelson_aalen — cumulative-hazard estimator
# ---------------------------------------------------------------------------


@query(
    "q_survival_nelson_aalen",
    oracle="""
    WITH durations AS (
      SELECT date_diff('day', cast(o.o_orderdate as date),
                       cast(l.l_shipdate as date)) AS t,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ev
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    per_t AS (
      SELECT t, count(*) AS c, cast(sum(ev) as bigint) AS d
      FROM durations GROUP BY 1
    ),
    risk AS (
      SELECT t, d,
             cast(sum(c) OVER (ORDER BY t DESC) as bigint) AS n_risk
      FROM per_t
    ),
    terms AS (
      SELECT t, d, n_risk,
             cast(round(cast(d as double) / n_risk, 10)
                  as decimal(16,10)) AS hterm,
             cast(round(cast(d as double) / (cast(n_risk as double)
                                             * n_risk), 10)
                  as decimal(16,10)) AS vterm
      FROM risk WHERE d > 0
    )
    SELECT t, n_risk, d AS d_events,
           round(cast(sum(hterm) OVER (ORDER BY t) as double), 6)
             AS cum_hazard,
           round(cast(sum(vterm) OVER (ORDER BY t) as double), 8)
             AS hazard_var
    FROM terms
    ORDER BY t
    LIMIT 25
    """,
)
def q_survival_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative-hazard estimator over the same
    order-to-ship time-to-return data as q_survival_km: H(t) =
    sum_{t_i<=t} d_i/n_i with its standard variance estimate
    sum d_i/n_i² — the hazard-scale companion the survival pair
    needs (KM answers 'what fraction survives', Nelson-Aalen 'how
    fast does risk accumulate', and -ln(KM) ~ H is the classic
    cross-check, test-pinned). Each increment is one IEEE division
    10dp-quantized into exact-decimal running sums, so every output
    row hash-matches.

    Scale: identical shape to q_survival_km — one joined histogram
    pass, then windows over the |distinct t| relation."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    dur = (l.join(o, l.l_orderkey == o.o_orderkey)
           .select(F.datediff(F.col("l_shipdate").cast("date"),
                              F.col("o_orderdate").cast("date"))
                   .alias("t"),
                   F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
                   .alias("ev")))
    per_t = dur.groupBy("t").agg(F.count("*").alias("c"),
                                 F.sum("ev").alias("d"))
    risk = per_t.select(
        "t", "d",
        F.sum("c").over(W.orderBy(F.desc("t"))).alias("n_risk"))
    terms = (risk.filter(F.col("d") > 0)
             .select("t", "d", "n_risk",
                     F.round(F.col("d").cast("double")
                             / F.col("n_risk"), 10)
                     .cast("decimal(16,10)").alias("hterm"),
                     F.round(F.col("d").cast("double")
                             / (F.col("n_risk").cast("double")
                                * F.col("n_risk")), 10)
                     .cast("decimal(16,10)").alias("vterm")))
    wcum = W.orderBy("t")
    return (terms.select(
        "t", "n_risk", F.col("d").alias("d_events"),
        F.round(F.sum("hterm").over(wcum).cast("double"), 6)
        .alias("cum_hazard"),
        F.round(F.sum("vterm").over(wcum).cast("double"), 8)
        .alias("hazard_var"))
        .orderBy("t").limit(25))


# ---------------------------------------------------------------------------
# q_image_phash — perceptual near-duplicate image grouping
# ---------------------------------------------------------------------------

_PHASH_ORACLE = """
WITH k AS (
  SELECT doc_id, doc_id % 97 AS kk FROM documents
),
cls AS (
  SELECT doc_id,
         CASE WHEN (kk * 11) % 200 = (kk * 17) % 200 THEN 'z'
              WHEN kk % 2 = 0 AND (kk * 11) % 200 > (kk * 17) % 200
                THEN 'v+'
              WHEN kk % 2 = 0 THEN 'v-'
              WHEN (kk * 11) % 200 > (kk * 17) % 200 THEN 'h+'
              ELSE 'h-' END AS c
  FROM k
)
SELECT cast(min(doc_id) as bigint) AS rep,
       cast(count(*) as bigint) AS n_members
FROM cls GROUP BY c ORDER BY rep
"""


@query("q_image_phash", oracle=_PHASH_ORACLE)
def q_image_phash(spark, sf_dir):
    """Perceptual-hash image dedup — the near-duplicate rung above
    q_image_dedup_exact's byte-exact md5: REAL BMP payloads (split-tone
    fixtures at varying sizes and tone pairs) are decoded, box-pooled
    to 8x8, 2D-DCT'd, and thresholded into a 64-bit pHash
    (operators/multimodal.py:phash64); images that differ in
    resolution and contrast but share perceptual structure collapse to
    one group. The oracle exploits the fixture's closed form: pooling
    + relative thresholding quotient the (width, height, ta, tb)
    fixture space down to exactly (orientation x tone-order) classes —
    'v+/v-/h+/h-' splits and 'z' uniforms — so DuckDB can derive the
    same groups from doc_id arithmetic alone, without running a DCT.

    Scale: synthesis+hash is one Arrow-batched mapInPandas pass (no
    shuffle); grouping is a hash groupBy on the 64-bit digest — the
    same plan as exact dedup, at any corpus size. Real-corpus caveat
    goes the other way: pHash grouping at 100 TB stays a single
    groupBy because the hash IS the bucket (no pairwise stage, unlike
    threshold-based hamming matching, which would LSH the 64 bits)."""
    from .operators.multimodal import (encode_bmp_hsplit,
                                       encode_bmp_vsplit, phash64)

    d = load_table(spark, sf_dir, "documents")

    def synth_hash(batches):
        import pandas as pd
        for pdf in batches:
            hashes = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id) % 97
                w, h = 8 * (k % 3 + 1), 8 * ((k // 3) % 3 + 1)
                ta, tb = (k * 11) % 200, (k * 17) % 200
                enc = encode_bmp_vsplit if k % 2 == 0 else encode_bmp_hsplit
                hashes.append(phash64(enc(w, h, ta, tb)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ph": hashes})

    hashed = d.select("doc_id").mapInPandas(
        synth_hash, schema="doc_id bigint, ph string")
    return (hashed.groupBy("ph")
            .agg(F.min("doc_id").cast("long").alias("rep"),
                 F.count("*").cast("long").alias("n_members"))
            .select("rep", "n_members")
            .orderBy("rep"))


# ---------------------------------------------------------------------------
# q_survival_logrank — two-sample log-rank test
# ---------------------------------------------------------------------------

_LOGRANK_ORACLE = """
WITH dur AS (
  SELECT datediff('day', cast(o.o_orderdate as date),
                  cast(l.l_shipdate as date)) AS t,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ev,
         CASE WHEN l.l_quantity > 25 THEN 1 ELSE 0 END AS grp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_t AS (
  SELECT t,
         cast(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) as bigint) AS a1,
         cast(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) as bigint) AS a0,
         cast(sum(CASE WHEN grp = 1 AND ev = 1 THEN 1 ELSE 0 END)
              as bigint) AS d1,
         cast(sum(CASE WHEN grp = 0 AND ev = 1 THEN 1 ELSE 0 END)
              as bigint) AS d0
  FROM dur GROUP BY t
),
risk AS (
  SELECT t, d1, d0,
         sum(a1) OVER (ORDER BY t DESC) AS n1,
         sum(a0) OVER (ORDER BY t DESC) AS n0
  FROM per_t
),
terms AS (
  SELECT d1,
         cast(round(cast(d1 + d0 as double) * n1 / (n1 + n0), 8)
              as decimal(30,10)) AS e1,
         cast(round(CASE WHEN n1 + n0 > 1
                    THEN cast(d1 + d0 as double) * n1 * n0
                         * (n1 + n0 - d1 - d0)
                         / (cast(n1 + n0 as double) * (n1 + n0)
                            * (n1 + n0 - 1))
                    ELSE 0.0 END, 8) as decimal(30,10)) AS v
  FROM risk WHERE d1 + d0 > 0
),
s AS (
  SELECT cast(sum(d1) as bigint) AS o1,
         cast(sum(e1) as decimal(30,10)) AS e1,
         cast(sum(v) as decimal(30,10)) AS v
  FROM terms
),
sizes AS (
  SELECT cast(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) as bigint) AS n1,
         cast(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) as bigint) AS n0
  FROM dur
)
SELECT n1, n0, o1,
       round(cast(e1 as double), 4) + 0.0 AS e1,
       round(cast(v as double), 4) + 0.0 AS v,
       round((o1 - cast(e1 as double)) * (o1 - cast(e1 as double))
             / cast(v as double), 6) + 0.0 AS chi2
FROM s CROSS JOIN sizes
"""


@query("q_survival_logrank", oracle=_LOGRANK_ORACLE)
def q_survival_logrank(spark, sf_dir):
    """Two-sample log-rank test completing the survival family
    (q_survival_km estimates the curve, q_survival_nelson_aalen the
    hazard; this TESTS whether two curves differ): do high-quantity
    line items (qty > 25) get returned on a different time-to-ship
    schedule than low-quantity ones? O1/E1/V accumulate the standard
    hypergeometric moments at each event time; chi2 = (O1-E1)^2/V.

    Exactness: risk sets are reverse cumulative bigint counts over the
    duration histogram; each per-time expectation/variance is one
    double expression of exact integers, rounded 8dp and summed as
    decimal(30,10) (the q_survival_km discipline), so the reduce is
    order-free.

    Scale: one fact-join histogram groupBy (the same shape as
    q_survival_km), then windows over the |distinct t| relation."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    dur = (l.join(o, l.l_orderkey == o.o_orderkey)
           .select(F.datediff(F.col("l_shipdate").cast("date"),
                              F.col("o_orderdate").cast("date")).alias("t"),
                   F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
                   .alias("ev"),
                   F.when(F.col("l_quantity") > 25, 1).otherwise(0)
                   .alias("grp")))
    per_t = (dur.groupBy("t")
             .agg(F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
                  .cast("long").alias("a1"),
                  F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
                  .cast("long").alias("a0"),
                  F.sum(F.when((F.col("grp") == 1) & (F.col("ev") == 1),
                               1).otherwise(0)).cast("long").alias("d1"),
                  F.sum(F.when((F.col("grp") == 0) & (F.col("ev") == 1),
                               1).otherwise(0)).cast("long").alias("d0")))
    wdesc = (W.orderBy(F.desc("t"))
             .rangeBetween(W.unboundedPreceding, W.currentRow))
    risk = per_t.select(
        "t", "d1", "d0",
        F.sum("a1").over(wdesc).alias("n1"),
        F.sum("a0").over(wdesc).alias("n0"))
    nt = (F.col("n1") + F.col("n0")).cast("double")
    dt = (F.col("d1") + F.col("d0")).cast("double")
    e1_t = F.round(dt * F.col("n1") / nt, 8).cast("decimal(30,10)")
    v_t = F.round(
        F.when(F.col("n1") + F.col("n0") > 1,
               dt * F.col("n1") * F.col("n0")
               * (nt - dt) / (nt * nt * (nt - 1)))
        .otherwise(0.0), 8).cast("decimal(30,10)")
    terms = (risk.filter(F.col("d1") + F.col("d0") > 0)
             .select("d1", e1_t.alias("e1"), v_t.alias("v")))
    s = terms.agg(F.sum("d1").cast("long").alias("o1"),
                  F.sum("e1").cast("decimal(30,10)").alias("e1"),
                  F.sum("v").cast("decimal(30,10)").alias("v"))
    sizes = dur.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long")
        .alias("n0"))
    e1d = F.col("e1").cast("double")
    return (s.crossJoin(F.broadcast(sizes))
            .select("n1", "n0", "o1",
                    (F.round(e1d, 4) + 0.0).alias("e1"),
                    (F.round(F.col("v").cast("double"), 4) + 0.0)
                    .alias("v"),
                    (F.round((F.col("o1") - e1d) * (F.col("o1") - e1d)
                             / F.col("v").cast("double"), 6) + 0.0)
                    .alias("chi2")))


# ---------------------------------------------------------------------------
# q_randomized_response — local differential privacy (Warner's RR)
# ---------------------------------------------------------------------------

# keep probability p = 3/4 -> epsilon = ln(p/(1-p)) = ln 3 local DP
_RR_SEED = ":rr8"


@query(
    "q_randomized_response",
    oracle=f"""
    WITH obs AS (
      SELECT event_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b,
             CASE WHEN (cast(('0x' || substr(md5(cast(event_id as varchar)
                        || '{_RR_SEED}'), 1, 6)) as bigint) % 4) < 3
                  THEN 1 ELSE 0 END AS keep
      FROM events
    ),
    rep AS (
      SELECT event_id, b, keep,
             CASE WHEN keep = 1 THEN b ELSE 1 - b END AS r
      FROM obs
    )
    SELECT count(*) AS n,
           cast(sum(b) as bigint) AS n_true,
           cast(sum(r) as bigint) AS n_reported,
           round(cast(sum(r) as double) / count(*), 6) AS reported_rate,
           round((cast(sum(r) as double) / count(*) - 0.25) / 0.5, 6)
             AS debiased_rate,
           round(cast(sum(b) as double) / count(*), 6) AS true_rate
    FROM rep
    """,
)
def q_randomized_response(spark, sf_dir):
    """Warner's randomized response — LOCAL differential privacy, the
    mechanism each data contributor applies before the collector sees
    anything (the central-DP q_dp_* family adds noise AFTER exact
    aggregation; RR is the other trust model). Each event reports its
    true bit b = (event_type = 'click') with probability p = 3/4 and
    the flipped bit otherwise — epsilon = ln(p/(1-p)) = ln 3 per
    report — and the collector debiases the observed rate with the
    standard inverse (rate - (1-p)) / (2p - 1). The coin is an
    md5-seeded uniform (the reproducible-release discipline of
    q_dp_noisy_counts), so both engines flip identically and the
    debiased estimate is hash-checkable; true_rate ships alongside so
    the test suite can pin |debiased - true| against the RR sampling
    bound.

    Scale: one scan into exact bit sums — the flip is a per-row
    expression, the aggregate map-side combines; at 100 TB the
    mechanism runs where the data lives (that is the POINT of local
    DP) and only the two counters shuffle."""
    e = load_table(spark, sf_dir, "events")
    b = (F.col("event_type") == "click").cast("int")
    keep = (F.conv(F.substring(
        F.md5(F.concat(F.col("event_id").cast("string"),
                       F.lit(_RR_SEED))), 1, 6), 16, 10)
        .cast("bigint") % 4 < 3).cast("int")
    rep = e.select(b.alias("b"), keep.alias("keep")) \
        .withColumn("r", F.when(F.col("keep") == 1, F.col("b"))
                    .otherwise(1 - F.col("b")))
    return rep.agg(
        F.count("*").alias("n"),
        F.sum("b").cast("long").alias("n_true"),
        F.sum("r").cast("long").alias("n_reported"),
        F.round(F.sum("r").cast("double") / F.count("*"), 6)
        .alias("reported_rate"),
        F.round((F.sum("r").cast("double") / F.count("*") - 0.25) / 0.5,
                6).alias("debiased_rate"),
        F.round(F.sum("b").cast("double") / F.count("*"), 6)
        .alias("true_rate"))


# ---------------------------------------------------------------------------
# q_curriculum_order — difficulty-ordered, language-stratified batches
# ---------------------------------------------------------------------------

@query(
    "q_curriculum_order",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             n_chars * 1000 + len(string_split(text, ' '))
               AS difficulty
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, difficulty,
             row_number() OVER (PARTITION BY lang
                                ORDER BY difficulty, doc_id) - 1
               AS r_in_lang,
             dense_rank() OVER (ORDER BY lang) - 1 AS lang_idx,
             count(DISTINCT lang) OVER () AS n_langs
      FROM scored
    ),
    placed AS (
      SELECT *,
             (r_in_lang * n_langs + lang_idx) // 256 AS batch_id
      FROM ranked
    )
    SELECT batch_id,
           cast(count(*) as bigint) AS n_docs,
           cast(count(DISTINCT lang) as bigint) AS n_langs_present,
           cast(min(difficulty) as bigint) AS min_difficulty,
           cast(max(difficulty) as bigint) AS max_difficulty,
           cast(sum(cast(difficulty as decimal(28,0))) as bigint)
             AS difficulty_mass
    FROM placed GROUP BY batch_id ORDER BY batch_id
    """,
)
def q_curriculum_order(spark, sf_dir):
    """Curriculum data ordering — the training-data op between mixing
    and packing: feed the model easy documents first, hard ones later,
    WITHOUT letting any batch collapse to a single language. Difficulty
    is an integer proxy (n_chars·1000 + token count — longer, denser
    docs sort later); the curriculum ranks each doc within its
    language by difficulty, then round-robin-interleaves the language
    streams (global position = within-lang rank × n_langs + lang
    index) and cuts batches of 256. Easy batches come first, every
    batch keeps the language mix, and the whole ordering is a pure
    function of the corpus — rerunnable, shardable, no RNG. The audit
    reports per batch: size, languages present, difficulty envelope,
    and exact difficulty mass (the monotone-trend column a training
    engineer eyeballs before launch).

    Scale: one window per language partition (shuffle keyed by lang)
    plus integer arithmetic — no global sort of the corpus is ever
    materialized; at 100 TB the batch assignment is a write-side
    range-partition on the computed position, the same shape as the
    zorder/hilbert writers."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W
    scored = d.select(
        "doc_id", "lang",
        (F.col("n_chars") * 1000
         + F.size(F.split("text", " "))).alias("difficulty"))
    # lang_idx comes from the driver-held sorted distinct-lang list
    # (language-count-sized, same collect budget as n_langs below) as
    # a create_map literal — NOT dense_rank().over(orderBy("lang")),
    # whose unpartitioned window would move the whole corpus through
    # one partition (ADVICE r9), contradicting the Scale contract.
    langs = sorted(r[0] for r in
                   scored.select("lang").distinct().collect())
    n_langs = len(langs)
    lang_map = F.create_map(
        *[x for i, lg in enumerate(langs) for x in (F.lit(lg), F.lit(i))])
    ranked = scored.select(
        "doc_id", "lang", "difficulty",
        (F.row_number().over(W.partitionBy("lang")
                             .orderBy("difficulty", "doc_id")) - 1)
        .alias("r_in_lang"),
        lang_map[F.col("lang")].alias("lang_idx"))
    placed = ranked.withColumn(
        "batch_id",
        ((F.col("r_in_lang") * n_langs + F.col("lang_idx"))
         / 256).cast("bigint"))
    return (placed.groupBy("batch_id")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.countDistinct("lang").cast("long")
                 .alias("n_langs_present"),
                 F.min("difficulty").cast("long").alias("min_difficulty"),
                 F.max("difficulty").cast("long").alias("max_difficulty"),
                 F.sum(F.col("difficulty").cast("decimal(28,0)"))
                 .cast("long").alias("difficulty_mass"))
            .orderBy("batch_id"))


# ---------------------------------------------------------------------------
# q_pii_redaction — regex PII scrubbing with a redaction audit
# ---------------------------------------------------------------------------

# Java regex (Spark) and RE2 (DuckDB) agree on this restricted
# character-class-only dialect — no backrefs, no lookaround.
_PII_EMAIL = r"[A-Za-z0-9]+@[A-Za-z0-9.]+\.com"
_PII_PHONE = r"\+1-555-[0-9]{4}"


@query(
    "q_pii_redaction",
    oracle=f"""
    WITH synth AS (
      /* deterministic PII is appended to every document from doc_id
         so both engines construct bit-identical inputs: one email,
         and a phone for every third doc */
      SELECT doc_id, source,
             text || ' contact user' || cast(doc_id as varchar)
                  || '@ex' || cast(doc_id % 97 as varchar) || '.com'
                  || CASE WHEN doc_id % 3 = 0
                     THEN ' tel +1-555-' || lpad(cast(doc_id % 10000
                                                      as varchar), 4, '0')
                     ELSE '' END AS text_pii
      FROM documents
    ),
    red AS (
      SELECT doc_id, source, text_pii,
             regexp_replace(
               regexp_replace(text_pii, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS text_red,
             len(regexp_extract_all(text_pii, '{_PII_EMAIL}'))
               AS n_emails,
             len(regexp_extract_all(text_pii, '{_PII_PHONE}'))
               AS n_phones
      FROM synth
    )
    SELECT source,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(n_emails) as bigint) AS total_emails,
           cast(sum(n_phones) as bigint) AS total_phones,
           cast(count(CASE WHEN n_emails + n_phones > 0 THEN 1 END)
                as bigint) AS docs_with_pii,
           cast(sum(len(text_pii) - len(text_red)) as bigint)
             AS chars_removed
    FROM red GROUP BY source ORDER BY source
    """,
)
def q_pii_redaction(spark, sf_dir):
    """PII redaction audit — the compliance pass a training corpus
    runs before release: regex detectors (email, NANP-style phone)
    replace matches with typed placeholders, and the audit reports
    per source: documents scanned, matches per detector, documents
    carrying any PII, and exactly how many characters the redaction
    removed (placeholder accounting — the number a DPO asks for).
    Deterministic PII is synthesized into every document from doc_id
    so both engines scrub bit-identical inputs; the detector dialect
    is restricted to character classes (no backrefs/lookaround), the
    subset on which Spark's Java regex and DuckDB's RE2 agree.

    Scale: pure per-row codegen string work in the scan (regexp_*
    compile once per task) + one map-side-combined rollup — zero
    shuffles beyond the final 5-group agg; a 100 TB corpus scrubs at
    scan speed. Real deployments chain more detectors (IBAN, SSN,
    addresses) onto the same shape; cf. the C4/RefinedWeb cleaning
    recipes (public papers)."""
    d = load_table(spark, sf_dir, "documents")
    text_pii = F.expr(
        "text || ' contact user' || cast(doc_id as string)"
        " || '@ex' || cast(doc_id % 97 as string) || '.com'"
        " || CASE WHEN doc_id % 3 = 0"
        " THEN ' tel +1-555-' || lpad(cast(doc_id % 10000 as string),"
        " 4, '0') ELSE '' END")
    synth = d.select("doc_id", "source", text_pii.alias("text_pii"))
    red = synth.select(
        "source", "text_pii",
        F.regexp_replace(
            F.regexp_replace("text_pii", _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>").alias("text_red"),
        # SQL string literals eat one backslash layer — escape for expr
        F.size(F.expr("regexp_extract_all(text_pii, '"
                      + _PII_EMAIL.replace("\\", "\\\\") + "', 0)"))
        .alias("n_emails"),
        F.size(F.expr("regexp_extract_all(text_pii, '"
                      + _PII_PHONE.replace("\\", "\\\\") + "', 0)"))
        .alias("n_phones"))
    return (red.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_emails").cast("long").alias("total_emails"),
                 F.sum("n_phones").cast("long").alias("total_phones"),
                 F.count(F.when(F.col("n_emails") + F.col("n_phones") > 0,
                                1)).cast("long").alias("docs_with_pii"),
                 F.sum(F.length("text_pii") - F.length("text_red"))
                 .cast("long").alias("chars_removed"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# q_chunk_overlap — RAG chunking plan (fixed window + overlap stride)
# ---------------------------------------------------------------------------

_CHUNK_W = 64   # tokens per chunk
_CHUNK_O = 16   # overlap tokens; stride = W - O = 48


@query(
    "q_chunk_overlap",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    plan AS (
      SELECT doc_id, source, n_tok,
             CASE WHEN n_tok <= {_CHUNK_W} THEN 1
                  ELSE 1 + (n_tok - {_CHUNK_W}
                            + {_CHUNK_W - _CHUNK_O} - 1)
                           // {_CHUNK_W - _CHUNK_O} END AS n_chunks
      FROM docs
    )
    SELECT source,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(n_tok) as bigint) AS total_tokens,
           cast(sum(n_chunks) as bigint) AS total_chunks,
           cast(sum(least(n_chunks * {_CHUNK_W},
                          n_tok + (n_chunks - 1) * {_CHUNK_O}))
                as bigint) AS total_chunk_tokens,
           cast((2 * sum(least(n_chunks * {_CHUNK_W},
                               n_tok + (n_chunks - 1) * {_CHUNK_O}))
                     * 10000 + sum(n_tok))
                // (2 * sum(n_tok)) as double) / 1e4
             AS expansion_ratio
    FROM plan GROUP BY source ORDER BY source
    """,
)
def q_chunk_overlap(spark, sf_dir):
    """RAG chunking plan: fixed 64-token windows with 16-token overlap
    (stride 48) — the standard retrieval-corpus preparation step. Per
    document the chunk count is the exact closed form
    1 + ceil((n-W)/(W-O)) (one chunk when the doc fits); the audit
    reports, per source: docs, raw tokens, chunks, chunk-token mass
    (overlap double-counted — capped at n + (chunks-1)*O for final
    short chunks), and the storage expansion ratio the overlap costs,
    rounded by the exact integer half-away-from-zero rule (VERDICT r9
    item 3 discipline — the ratio is a pure rational of token
    counts).

    Scale: pure per-row integer arithmetic in the scan + one map-side
    rollup; no explode, no shuffle beyond the 5-group agg. At 100 TB
    the same closed form plans chunk WRITES without materializing a
    single chunk — the planner's output is the write fan-out
    estimate."""
    d = load_table(spark, sf_dir, "documents")
    w, o, s = _CHUNK_W, _CHUNK_O, _CHUNK_W - _CHUNK_O
    docs = d.select(
        "source", F.size(F.split("text", " ")).alias("n_tok"))
    plan = docs.withColumn(
        "n_chunks",
        F.when(F.col("n_tok") <= w, F.lit(1))
        .otherwise(1 + F.expr(f"(n_tok - {w} + {s} - 1) DIV {s}")))
    chunk_toks = F.least(F.col("n_chunks") * w,
                         F.col("n_tok") + (F.col("n_chunks") - 1) * o)
    return (plan.withColumn("ct", chunk_toks)
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tok").cast("long").alias("total_tokens"),
                 F.sum("n_chunks").cast("long").alias("total_chunks"),
                 F.sum("ct").cast("long").alias("total_chunk_tokens"),
                 F.expr("cast((2 * sum(ct) * 10000 + sum(n_tok))"
                        " DIV (2 * sum(n_tok)) as double) / 1e4")
                 .alias("expansion_ratio"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# q_span_corruption — T5-style span-masking plan
# ---------------------------------------------------------------------------

# ~15% corruption at mean span 3 → one span per 20 tokens; offsets are
# a multiplicative integer hash (engine-portable, no RNG).
_SPAN_LEN = 3
_SPAN_PER = 20


@query(
    "q_span_corruption",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    planned AS (
      SELECT doc_id, source, n,
             greatest(1, n // {_SPAN_PER}) AS n_spans,
             n // greatest(1, n // {_SPAN_PER}) AS sw
      FROM docs
    ),
    spans AS (
      SELECT doc_id, source, n, n_spans, sw, gs.i AS si,
             gs.i * sw
             + ((doc_id * 2654435761 + (gs.i + 1) * 40503) % 1000003)
               % greatest(1, sw - {_SPAN_LEN} + 1) AS start
      FROM planned
      JOIN range(0, 100000) gs(i) ON gs.i < n_spans
    )
    SELECT source,
           cast(count(DISTINCT doc_id) as bigint) AS n_docs,
           cast(sum(CASE WHEN si = 0 THEN n ELSE 0 END) as bigint)
             AS total_tokens,
           cast(count(*) as bigint) AS total_spans,
           cast(sum(least({_SPAN_LEN}, sw, n - start)) as bigint)
             AS total_masked,
           cast((2 * sum(least({_SPAN_LEN}, sw, n - start)) * 10000
                 + sum(CASE WHEN si = 0 THEN n ELSE 0 END))
                // (2 * sum(CASE WHEN si = 0 THEN n ELSE 0 END))
                as double) / 1e4 AS corruption_rate
    FROM spans GROUP BY source ORDER BY source
    """,
)
def q_span_corruption(spark, sf_dir):
    """Span-corruption planning (the T5/UL2 pretraining objective's
    data-prep step): each document gets ~one 3-token mask span per 20
    tokens, placed deterministically — spans live on a slot grid (slot
    width = n DIV n_spans) with a multiplicative-integer-hash offset
    inside each slot, so spans NEVER overlap (span length is capped at
    the slot width) and the whole plan is a pure function of doc_id —
    rerunnable, shardable, no RNG. The audit reports, per source:
    docs, tokens, spans, masked tokens, and the achieved corruption
    rate as an exact integer-division 4dp rational (VERDICT r9 item 3
    discipline).

    Scale: per-row integer arithmetic plus a bounded explode (one row
    per span, ~n/20) and one map-side rollup — the same plan writes
    actual masked training examples by carrying (start, len) to a
    sentinel-substitution projection; at 100 TB nothing here shuffles
    except the 5-group rollup."""
    d = load_table(spark, sf_dir, "documents")
    planned = d.select(
        "doc_id", "source",
        F.size(F.split("text", " ")).alias("n")
    ).selectExpr(
        "doc_id", "source", "n",
        f"greatest(1, n DIV {_SPAN_PER}) AS n_spans",
    ).selectExpr("doc_id", "source", "n", "n_spans",
                 "n DIV n_spans AS sw")
    spans = planned.select(
        "doc_id", "source", "n", "n_spans", "sw",
        F.explode(F.expr("sequence(0, n_spans - 1)")).alias("si"),
    ).withColumn(
        "start",
        F.expr(f"si * sw + ((doc_id * 2654435761 + (si + 1) * 40503)"
               f" % 1000003) % greatest(1, sw - {_SPAN_LEN} + 1)"))
    masked = F.expr(f"least({_SPAN_LEN}, sw, n - start)")
    return (spans.withColumn("m", masked)
            .groupBy("source")
            .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"),
                 F.sum(F.when(F.col("si") == 0, F.col("n"))
                       .otherwise(0)).cast("long").alias("total_tokens"),
                 F.count("*").cast("long").alias("total_spans"),
                 F.sum("m").cast("long").alias("total_masked"),
                 F.expr(
                     "cast((2 * sum(least(3, sw, n - start)) * 10000"
                     " + sum(CASE WHEN si = 0 THEN n ELSE 0 END))"
                     " DIV (2 * sum(CASE WHEN si = 0 THEN n ELSE 0 END))"
                     " as double) / 1e4").alias("corruption_rate"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# q_temporal_decay — recency-weighted sampling mass (exact 2^-k)
# ---------------------------------------------------------------------------

_DECAY_HL_DAYS = 7   # half-life: weight halves every 7 days
_DECAY_SCALE = 33    # weights as integers 2^(33-k); k>33 underflows to 0


@query(
    "q_temporal_decay",
    oracle=f"""
    WITH anchor AS (SELECT max(ts) AS mx FROM events),
    aged AS (
      SELECT event_type,
             date_diff('day', cast(ts as date), cast(mx as date))
               // {_DECAY_HL_DAYS} AS k
      FROM events, anchor
    ),
    weighted AS (
      SELECT event_type, k,
             CASE WHEN k <= {_DECAY_SCALE}
                  THEN cast(1 as bigint) << ({_DECAY_SCALE} - k)
                  ELSE 0 END AS w
      FROM aged
    )
    SELECT event_type,
           cast(count(*) as bigint) AS n_events,
           cast(sum(w) as bigint) AS weight_mass,
           cast((2 * sum(w) * 10000
                 + count(*) * {2 ** _DECAY_SCALE})
                // (2 * count(*) * {2 ** _DECAY_SCALE}) as double)
             / 1e4 AS effective_fraction
    FROM weighted GROUP BY event_type ORDER BY event_type
    """,
)
def q_temporal_decay(spark, sf_dir):
    """Recency-weighted sampling mass — the freshness prior a
    continuously-crawled corpus applies when drawing training batches:
    each record's weight halves every {_DECAY_HL_DAYS} days of age
    (anchored at the corpus max timestamp — no wall clock, so the
    result is a pure function of the fixture). Weights are EXACT
    integers 2^(33-k) (never a pow() or a float decay: 2^-k cast to
    decimal(30,10) would underflow to zero past k=33 SILENTLY — here
    the cutoff is explicit), and the per-type effective fraction
    (weight mass / full-weight mass) is the exact integer 4dp
    rational. An operator reads it as: this slice contributes X% of
    its raw size under the freshness prior.

    Scale: one 1-row max aggregate broadcast back, per-row integer
    arithmetic, one map-side rollup. At 100 TB the anchor comes from
    the table's max-ts statistics (manifest-level) and nothing else
    changes."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("mx"))
    aged = (e.crossJoin(F.broadcast(anchor))
            .select("event_type",
                    F.expr(f"datediff(cast(mx as date), cast(ts as date))"
                           f" DIV {_DECAY_HL_DAYS}").alias("k")))
    weighted = aged.withColumn(
        "w",
        F.expr(f"CASE WHEN k <= {_DECAY_SCALE}"
               f" THEN shiftleft(cast(1 as bigint),"
               f"                cast({_DECAY_SCALE} - k as int))"
               f" ELSE cast(0 as bigint) END"))
    full = 2 ** _DECAY_SCALE
    return (weighted.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum("w").cast("long").alias("weight_mass"),
                 # decimal(38,0) arithmetic: 2*mass*1e4 exceeds int64
                 # at sf1.0 (the sweep caught the silent wraparound as
                 # a negative fraction; DuckDB auto-promotes to
                 # hugeint, Spark needs the explicit cast)
                 F.expr(f"cast((2 * cast(sum(w) as decimal(38,0))"
                        f" * 10000 + cast(count(*) as decimal(38,0))"
                        f" * {full})"
                        f" DIV (2 * cast(count(*) as decimal(38,0))"
                        f" * {full}) as double) / 1e4")
                 .alias("effective_fraction"))
            .orderBy("event_type"))
