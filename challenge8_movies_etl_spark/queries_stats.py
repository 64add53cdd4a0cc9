"""Round-4 wave B: statistical testing, distribution moments, data
contracts, and tokenizer operators.

Extends the audit/statistics families (BASELINE.json:6 north star):
chi-square independence testing, exact higher-moment group statistics
(skewness/kurtosis), declarative data-quality expectations (the
dbt-test/Deequ contract surface), BPE-style regex token counting, and
greedy longest-prefix wordpiece encoding — the last implemented as an
Arrow-batched pandas UDF on Spark and verified against a recursive-CTE
DuckDB oracle computing the identical greedy fold.

Hash-stability per registry.py conventions: exact integer/decimal
reductions; doubles only in closed-form finals behind declared
rounding; decimal sums rounded as decimals (q_entropy discipline).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql.types import LongType

from .registry import query
from .sources.fixtures import load_table

# ---------------------------------------------------------------------------
# q_chisq_independence — contingency-table chi-square test
# ---------------------------------------------------------------------------

_CHISQ_ORACLE = """
WITH obs AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', cast(ts as date)) % 7 AS dow,
         count(*) AS o
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT o.event_type, o.dow, o.o,
         cast(sum(o.o) OVER (PARTITION BY o.event_type) as bigint) AS rt,
         cast(sum(o.o) OVER (PARTITION BY o.dow) as bigint) AS ct,
         cast(sum(o.o) OVER () as bigint) AS n
  FROM obs o
),
terms AS (
  SELECT event_type, dow, o,
         round(cast(rt as double) * ct / n, 4) AS expected,
         cast(round(pow(cast(o * n - rt * ct as double), 2)
                    / (cast(n as double) * rt * ct * n), 6)
              as decimal(18,6)) AS term
  FROM margins
)
SELECT event_type, dow, o AS observed, expected,
       round(cast(term as double), 6) AS chi2_term,
       cast(round(sum(term) OVER (), 4) as double) AS chi2_total
FROM terms
"""


@query("q_chisq_independence", oracle=_CHISQ_ORACLE)
def q_chisq_independence(spark, sf_dir):
    """Chi-square test of independence on the event_type x day-of-week
    contingency table — the categorical-drift/association audit
    (is volume mix independent of weekday?). Each cell's term uses the
    n-scaled exact form (o*N - rt*ct)^2 / (N*rt*ct*N): the numerator is
    exact integer arithmetic, so both engines square the same integers;
    terms are 6dp-rounded decimals and the total is the decimal sum
    rounded as a decimal (q_entropy tie discipline). Weekday is epoch
    day mod 7 (portable across the engines' dayofweek conventions).

    Scale: one map-side-combined groupBy to the 35-cell table; margins
    and the test statistic are windows over those 35 rows."""
    e = load_table(spark, sf_dir, "events")
    obs = (e.groupBy("event_type",
                     (F.datediff(F.col("ts").cast("date"),
                                 F.lit("1970-01-01")) % 7).alias("dow"))
           .agg(F.count("*").alias("o")))
    m = obs.select(
        "event_type", "dow", "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(W.partitionBy("dow")).alias("ct"),
        F.sum("o").over(W.partitionBy(F.lit(1))).alias("n"))
    num = (F.col("o") * F.col("n") - F.col("rt") * F.col("ct")).cast("double")
    term = F.round(F.pow(num, 2)
                   / (F.col("n").cast("double") * F.col("rt")
                      * F.col("ct") * F.col("n")), 6).cast("decimal(18,6)")
    t = m.select(
        "event_type", "dow", F.col("o").alias("observed"),
        F.round(F.col("rt").cast("double") * F.col("ct") / F.col("n"), 4)
        .alias("expected"),
        term.alias("term"))
    return t.select(
        "event_type", "dow", "observed", "expected",
        F.round(F.col("term").cast("double"), 6).alias("chi2_term"),
        F.round(F.sum("term").over(W.partitionBy(F.lit(1))), 4)
        .cast("double").alias("chi2_total"))


# ---------------------------------------------------------------------------
# q_agg_moments — exact-reduction skewness / kurtosis per group
# ---------------------------------------------------------------------------

_MOM_ORACLE = """
WITH x AS (
  SELECT event_type,
         cast(round(value, 3) * 1000 as decimal(7,0)) AS xi
  FROM events
),
p AS (
  SELECT event_type, cast(xi as hugeint) AS xi,
         cast(xi as hugeint) * cast(xi as hugeint) AS xi2
  FROM x
),
s AS (
  SELECT event_type, count(*) AS n,
         sum(xi) AS s1, sum(xi2) AS s2,
         sum(xi2 * xi) AS s3,
         sum(xi2 * xi2) AS s4
  FROM p GROUP BY 1
)
SELECT event_type, n,
       round(cast(s1 as double) / n / 1000, 4) AS mean,
       round((cast(s2 as double)/n - pow(cast(s1 as double)/n, 2))
             / 1000000, 4) AS variance,
       round((cast(s3 as double)/n
              - 3 * (cast(s1 as double)/n) * (cast(s2 as double)/n)
              + 2 * pow(cast(s1 as double)/n, 3))
             / pow(cast(s2 as double)/n
                   - pow(cast(s1 as double)/n, 2), 1.5), 4) AS skewness,
       round((cast(s4 as double)/n
              - 4 * (cast(s1 as double)/n) * (cast(s3 as double)/n)
              + 6 * pow(cast(s1 as double)/n, 2) * (cast(s2 as double)/n)
              - 3 * pow(cast(s1 as double)/n, 4))
             / pow(cast(s2 as double)/n
                   - pow(cast(s1 as double)/n, 2), 2) - 3, 4) AS excess_kurt
FROM s
"""


@query("q_agg_moments", oracle=_MOM_ORACLE)
def q_agg_moments(spark, sf_dir):
    """Population skewness and excess kurtosis per event type from raw
    power sums — distribution-shape drift signals one moment beyond
    q_agg_stats. Values are pinned to exact integer thousandths
    (decimal(7,0), max |value| < 10^4 checked by the cast), so
    S1..S4 are exact decimal reductions in ANY order; the closed-form
    central-moment conversion happens once in doubles behind 4dp
    rounds. Built-in skewness()/kurtosis() are avoided deliberately:
    engines disagree on sample-vs-population corrections, the raw-sum
    form is engine-pinned AND mergeable (shard sums add — the sketch
    property a 100 TB rollup needs).

    Scale: one map-side-combined groupBy; four extra decimal
    accumulators per group."""
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        (F.round("value", 3) * 1000).cast("decimal(7,0)").alias("xi"))
    p = x.withColumn("xi2", (F.col("xi") * F.col("xi")).cast("decimal(15,0)"))
    s = (p.groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum("xi").alias("s1"), F.sum("xi2").alias("s2"),
              F.sum((F.col("xi2") * F.col("xi")).cast("decimal(23,0)"))
              .alias("s3"),
              F.sum((F.col("xi2") * F.col("xi2")).cast("decimal(31,0)"))
              .alias("s4")))
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n")
    m3 = F.col("s3").cast("double") / F.col("n")
    m4 = F.col("s4").cast("double") / F.col("n")
    var = m2 - F.pow(m1, 2)
    return s.select(
        "event_type", "n",
        F.round(m1 / 1000, 4).alias("mean"),
        F.round(var / 1000000, 4).alias("variance"),
        F.round((m3 - 3 * m1 * m2 + 2 * F.pow(m1, 3))
                / F.pow(var, 1.5), 4).alias("skewness"),
        F.round((m4 - 4 * m1 * m3 + 6 * F.pow(m1, 2) * m2
                 - 3 * F.pow(m1, 4)) / F.pow(var, 2) - 3, 4)
        .alias("excess_kurt"))


# ---------------------------------------------------------------------------
# q_expectations — declarative data-quality contract evaluation
# ---------------------------------------------------------------------------

_EXPECT_ORACLE = """
SELECT 'orders.o_custkey not_null' AS rule,
       count(*) AS n_checked,
       count(*) - count(o_custkey) AS n_violations,
       count(*) - count(o_custkey) = 0 AS passed
FROM orders
UNION ALL
SELECT 'orders.o_orderkey unique',
       count(*),
       count(*) - count(DISTINCT o_orderkey),
       count(*) - count(DISTINCT o_orderkey) = 0
FROM orders
UNION ALL
SELECT 'orders.o_orderstatus accepted_values',
       count(*),
       count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END),
       count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'orders.o_totalprice positive_range',
       count(*),
       count(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000
             THEN 1 END),
       count(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000
             THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'lineitem.l_orderkey ref_integrity',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) = 0
"""


@query("q_expectations", oracle=_EXPECT_ORACLE)
def q_expectations(spark, sf_dir):
    """Declarative data-quality contract evaluation (the dbt-test /
    Deequ / Great-Expectations surface): five rule families —
    not-null, uniqueness, accepted values, numeric range, referential
    integrity — each producing (rule, n_checked, n_violations, passed).
    The contract table is what a 100 TB ingest gate publishes per
    batch; a failed row blocks promotion.

    Scale: the four orders rules fold into single-pass aggregates over
    one scan; referential integrity is a broadcast/shuffle anti-join
    (the only rule that inherently needs two tables). Nothing collects
    row-level violations — counts only; a violation SAMPLE would be the
    natural follow-up query with a LIMIT."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    def rule(name, n_checked, n_viol):
        return (F.lit(name).alias("rule"), n_checked.alias("n_checked"),
                n_viol.alias("n_violations"),
                (n_viol == 0).alias("passed"))

    not_null = o.agg(*rule(
        "orders.o_custkey not_null",
        F.count("*"), F.count("*") - F.count("o_custkey")))
    uniq = o.agg(*rule(
        "orders.o_orderkey unique",
        F.count("*"), F.count("*") - F.countDistinct("o_orderkey")))
    accepted = o.agg(*rule(
        "orders.o_orderstatus accepted_values",
        F.count("*"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1))))
    rng = o.agg(*rule(
        "orders.o_totalprice positive_range",
        F.count("*"),
        F.count(F.when((F.col("o_totalprice") <= 0)
                       | (F.col("o_totalprice") > 1000000), 1))))
    orphans = (l.join(o.select(F.col("o_orderkey").alias("_ok")),
                      l.l_orderkey == F.col("_ok"), "left_anti")
               .agg(F.count("*").alias("_n")))
    n_line = l.agg(F.count("*").alias("_t"))
    ref = (orphans.crossJoin(n_line)
           .select(F.lit("lineitem.l_orderkey ref_integrity").alias("rule"),
                   F.col("_t").alias("n_checked"),
                   F.col("_n").alias("n_violations"),
                   (F.col("_n") == 0).alias("passed")))
    return not_null.unionByName(uniq).unionByName(accepted) \
                   .unionByName(rng).unionByName(ref)


# ---------------------------------------------------------------------------
# q_token_count_bpe — BPE-style regex tokenization census
# ---------------------------------------------------------------------------

# GPT-2-style pretokenizer classes, restricted to a dialect-portable
# subset (Java regex on Spark, RE2 on DuckDB agree on these):
# letter runs, digit runs, single non-alphanumeric-non-space marks.
_BPE_ALPHA = "[a-z]+"
_BPE_NUM = "[0-9]+"
_BPE_OTHER = "[^a-z0-9 ]"

_BPE_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_ALPHA}')) AS n_alpha,
       len(regexp_extract_all(text, '{_BPE_NUM}')) AS n_num,
       len(regexp_extract_all(text, '{_BPE_OTHER}')) AS n_other,
       len(regexp_extract_all(text, '{_BPE_ALPHA}'))
         + len(regexp_extract_all(text, '{_BPE_NUM}'))
         + len(regexp_extract_all(text, '{_BPE_OTHER}')) AS n_pieces
FROM documents
"""


@query("q_token_count_bpe", oracle=_BPE_ORACLE)
def q_token_count_bpe(spark, sf_dir):
    """BPE-style regex pretokenization census: the GPT-2 pretokenizer
    pattern family (letter runs | digit runs | punctuation marks)
    restricted to a regex subset where Java (Spark) and RE2 (DuckDB)
    agree, counted per class per document — the token-budget estimate
    a training-data pipeline runs before paying for real BPE encoding
    (q_wordpiece_encode is the exact follow-up). Complements
    q_token_count's whitespace counting with class structure.

    Scale: three regexp_count expressions, pure per-row codegen, zero
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    na = F.expr(f"regexp_count(text, '{_BPE_ALPHA}')")
    nn = F.expr(f"regexp_count(text, '{_BPE_NUM}')")
    no = F.expr(f"regexp_count(text, '{_BPE_OTHER}')")
    return d.select("doc_id", na.alias("n_alpha"), nn.alias("n_num"),
                    no.alias("n_other"),
                    (na + nn + no).alias("n_pieces"))


# ---------------------------------------------------------------------------
# q_wordpiece_encode — greedy longest-prefix-match subword encoding
# ---------------------------------------------------------------------------

# Fixed subword vocabulary: multi-char merges mined from the fixture
# vocab, plus every single letter (so encoding never fails and the
# greedy fold is total). Greedy longest-prefix is deterministic: ties
# in length are impossible for prefixes of the same string.
_WP_MERGES = ("val", "ue", "tab", "le", "wind", "ow", "jo", "in",
              "sc", "an", "key", "agg", "row", "ha", "sh", "fa", "st",
              "slo", "wr", "ite", "da", "ta")
_WP_VOCAB = _WP_MERGES + tuple("abcdefghijklmnopqrstuvwxyz")

_WP_ORACLE = f"""
WITH RECURSIVE vocab(p) AS (
  SELECT unnest([{", ".join(repr(p) for p in _WP_VOCAB)}])
),
tok AS (
  SELECT doc_id, gs.i AS pos, t[gs.i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d
  JOIN range(1, 100000) gs(i) ON gs.i <= len(t)
  WHERE t[gs.i] != ''
),
enc AS (
  SELECT doc_id, pos, w AS rest, 0 AS n FROM tok
  UNION ALL
  SELECT doc_id, pos,
         substr(rest, cast((SELECT max(len(p)) FROM vocab
                            WHERE starts_with(rest, p)) as int) + 1),
         n + 1
  FROM enc WHERE rest != ''
),
per_tok AS (
  SELECT doc_id, pos, max(n) AS pieces
  FROM enc GROUP BY 1, 2
)
SELECT doc_id, count(*) AS n_words,
       cast(sum(pieces) as bigint) AS n_pieces
FROM per_tok GROUP BY 1
"""


@query("q_wordpiece_encode", oracle=_WP_ORACLE)
def q_wordpiece_encode(spark, sf_dir):
    """Greedy longest-prefix-match subword (wordpiece) encoding against
    a fixed merge vocabulary — the tokenizer-APPLICATION pass of a
    training pipeline (merge mining happens offline; encoding is what
    touches all 100 TB). Spark side: an Arrow-batched pandas UDF doing
    the greedy fold per word (the declared python surface — per-char
    loops are not expressible as codegen); oracle side: a recursive
    CTE computing the IDENTICAL greedy fold, so the cross-paradigm
    agreement is value-hash-checked per document. Single letters are
    all in-vocab, making the fold total (no OOV branch to diverge on).

    Scale: the UDF is stateless per row — zero shuffle before the
    per-doc counts; vocabulary broadcasts by closure (KBs). Real BPE
    merge-table encoding swaps the match function, same plan."""
    d = load_table(spark, sf_dir, "documents")
    by_len = sorted(_WP_VOCAB, key=len, reverse=True)

    @F.pandas_udf(LongType())
    def wp_pieces(texts: pd.Series) -> pd.Series:
        def encode(text: str) -> int:
            total = 0
            for w in text.split(" "):
                while w:
                    for p in by_len:
                        if w.startswith(p):
                            w = w[len(p):]
                            break
                    total += 1
            return total
        return texts.map(encode)

    n_words = F.expr("size(filter(split(text, ' '), t -> t != ''))")
    return (d.select("doc_id", n_words.alias("n_words"),
                     wp_pieces("text").alias("n_pieces"))
            .filter(F.col("n_words") > 0))
