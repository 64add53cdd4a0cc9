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
    (decimal(7,0); the |value| < 10^4 range contract is enforced by an
    explicit raise_error branch, matching the oracle cast's throw), so
    S1..S4 are exact decimal reductions in ANY order; the closed-form
    central-moment conversion happens once in doubles behind 4dp
    rounds. Built-in skewness()/kurtosis() are avoided deliberately:
    engines disagree on sample-vs-population corrections, the raw-sum
    form is engine-pinned AND mergeable (shard sums add — the sketch
    property a 100 TB rollup needs).

    Scale: one map-side-combined groupBy; four extra decimal
    accumulators per group."""
    e = load_table(spark, sf_dir, "events")
    # Enforce the |value| < 10^4 range contract EXPLICITLY: Spark's
    # non-ANSI decimal(7,0) cast silently NULLs on overflow while the
    # DuckDB oracle's cast raises — a regenerated out-of-range fixture
    # would otherwise produce a confusing divergence instead of a
    # clear failure (round-5 advice).  raise_error fails the job fast
    # on either engine-side breach.
    v3 = F.round("value", 3)
    xi_checked = F.when(F.abs(v3) < 10000,
                        (v3 * 1000).cast("decimal(7,0)")).otherwise(
        F.raise_error(F.concat(
            F.lit("q_agg_moments data-contract breach: |value| >= 1e4: "),
            v3.cast("string"))))
    x = e.select("event_type", xi_checked.alias("xi"))
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

    # The four orders rules share one scan (optimization round r12,
    # §1.2/§2.3): the union-of-aggregates shape scanned orders 4 times;
    # all eight terms now ride ONE aggregate whose row explodes into
    # the rule grid. Referential integrity keeps its own anti-join —
    # the only rule that inherently needs two tables.
    rules = [("orders.o_custkey not_null",
              F.count("*") - F.count("o_custkey")),
             ("orders.o_orderkey unique",
              F.count("*") - F.countDistinct("o_orderkey")),
             ("orders.o_orderstatus accepted_values",
              F.count(F.when(~F.col("o_orderstatus")
                             .isin("O", "F", "P"), 1))),
             ("orders.o_totalprice positive_range",
              F.count(F.when((F.col("o_totalprice") <= 0)
                             | (F.col("o_totalprice") > 1000000), 1)))]
    orow = o.agg(F.count("*").alias("_n"),
                 *[v.alias(f"v{i}") for i, (_, v) in enumerate(rules)])
    orules = (orow.select(F.explode(F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 F.col("_n").alias("n_checked"),
                 F.col(f"v{i}").alias("n_violations"),
                 (F.col(f"v{i}") == 0).alias("passed"))
        for i, (name, _) in enumerate(rules)])).alias("p"))
        .select("p.*"))
    orphans = (l.join(o.select(F.col("o_orderkey").alias("_ok")),
                      l.l_orderkey == F.col("_ok"), "left_anti")
               .agg(F.count("*").alias("_n")))
    n_line = l.agg(F.count("*").alias("_t"))
    ref = (orphans.crossJoin(n_line)
           .select(F.lit("lineitem.l_orderkey ref_integrity").alias("rule"),
                   F.col("_t").alias("n_checked"),
                   F.col("_n").alias("n_violations"),
                   (F.col("_n") == 0).alias("passed")))
    return orules.unionByName(ref)


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
         substr(rest, cast(coalesce((SELECT max(len(p)) FROM vocab
                                     WHERE starts_with(rest, p)), 1)
                           as int) + 1),
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
    agreement is value-hash-checked per document. A character outside
    the vocab alphabet falls to an OOV branch that consumes exactly one
    character and counts one piece (both engines), so the fold is total
    on ANY input — not just the current [a-z ]-only fixtures.

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
                    else:
                        # OOV char (outside the vocab alphabet): always
                        # consume one character so the loop terminates,
                        # counting one piece — mirrored by the oracle's
                        # coalesce(max(len(p)), 1).
                        w = w[1:]
                    total += 1
            return total
        return texts.map(encode)

    n_words = F.expr("size(filter(split(text, ' '), t -> t != ''))")
    return (d.select("doc_id", n_words.alias("n_words"),
                     wp_pieces("text").alias("n_pieces"))
            .filter(F.col("n_words") > 0))


# ---------------------------------------------------------------------------
# q_bootstrap_ci — deterministic hash-replica bootstrap confidence interval
# ---------------------------------------------------------------------------

_BOOT_ORACLE = """
WITH hashed AS (
  SELECT cast(('0x' || substr(md5(cast(o_orderkey as varchar) || ':boot'),
                              1, 15)) as bigint) AS h,
         cast(round(cast(o_totalprice as decimal(30,10)), 2) * 100
              as bigint) AS cents
  FROM orders
),
reps AS (
  SELECT gs.b,
         count(*) AS n_rows,
         cast(sum(cents) as bigint) AS cents
  FROM hashed
  CROSS JOIN range(0, 20) gs(b)
  WHERE (h >> cast(gs.b as int)) % 2 = 0
  GROUP BY 1
),
means AS (
  SELECT b, n_rows,
         round(cast(cents as double) / (100 * n_rows), 6) AS mean_b,
         row_number() OVER (
           ORDER BY round(cast(cents as double) / (100 * n_rows), 6), b
         ) AS rk
  FROM reps
),
full_s AS (
  SELECT round(cast(cast(sum(cast(round(cast(o_totalprice as decimal(30,10)),
                    2) * 100 as bigint)) as bigint) as double)
               / (100 * count(*)), 6) AS est
  FROM orders
)
SELECT (SELECT est FROM full_s) AS est,
       max(CASE WHEN rk = 2 THEN mean_b END) AS ci_lo,
       max(CASE WHEN rk = 19 THEN mean_b END) AS ci_hi,
       count(*) AS n_replicas
FROM means
"""


@query("q_bootstrap_ci", oracle=_BOOT_ORACLE)
def q_bootstrap_ci(spark, sf_dir):
    """Deterministic bootstrap confidence interval for the mean order
    value: 20 half-sample replicas — replica b keeps a row iff BIT b
    of the row's single 60-bit md5 is 0 (a seeded hash instead of
    rand(): reproducible on any engine/parallelism, and ONE digest per
    row serves all 20 replicas — the per-(row, replica) re-hash form
    measured 2.3 s vs ~0.9 s at sf0.1, 3M md5s vs 150k); the CI is the
    [2nd, 19th] order statistic of the replica means (~90% interval).
    Replica means are exact integer-cents sums behind one declared
    6dp-rounded division, so the order statistics are engine-stable.

    Scale: one scan fans out to 20 replica aggregates in a single
    map-side-combined pass (the cross join is against a broadcast
    20-row range — each input row emits its ~10 surviving replica
    memberships at the mapper); no replica materializes rows. This is
    the error-bar machinery q_ab_test-style jobs need at 100 TB where
    a second full pass per replica is unaffordable."""
    o = load_table(spark, sf_dir, "orders")
    reps_dim = spark.range(0, 20).select(F.col("id").cast("int").alias("b"))
    cents = (F.round(F.col("o_totalprice").cast("decimal(30,10)"), 2)
             * 100).cast("bigint")
    h = (F.conv(F.substring(F.md5(F.concat(
        F.col("o_orderkey").cast("string"), F.lit(":boot"))), 1, 15),
        16, 10).cast("bigint"))
    hashed = o.select(h.alias("h"), cents.alias("cents"))
    keep = F.expr("shiftright(h, b) % 2 = 0")
    reps = (hashed.crossJoin(F.broadcast(reps_dim))
            .filter(keep)
            .groupBy("b")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").alias("cents")))
    mean_b = F.round(F.col("cents").cast("double")
                     / (100 * F.col("n_rows")), 6)
    means = (reps.select("b", "n_rows", mean_b.alias("mean_b"))
             .withColumn("rk", F.row_number().over(
                 W.orderBy("mean_b", "b"))))
    est = o.agg(F.round(F.sum(cents).cast("double")
                        / (100 * F.count("*")), 6).alias("est"))
    ci = means.agg(
        F.max(F.when(F.col("rk") == 2, F.col("mean_b"))).alias("ci_lo"),
        F.max(F.when(F.col("rk") == 19, F.col("mean_b"))).alias("ci_hi"),
        F.count("*").alias("n_replicas"))
    return est.crossJoin(ci).select("est", "ci_lo", "ci_hi", "n_replicas")


# ---------------------------------------------------------------------------
# q_event_ngrams — sequential pattern (trigram) mining
# ---------------------------------------------------------------------------

_EVNG_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1 || '>' || e2 || '>' || e3 AS trigram,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users
FROM seq WHERE e3 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, trigram
LIMIT 20
"""


@query("q_event_ngrams", oracle=_EVNG_ORACLE)
def q_event_ngrams(spark, sf_dir):
    """Sequential trigram mining over per-user event streams: the top
    20 three-step behavior patterns with occurrence and distinct-user
    counts — one order beyond q_markov_transitions' first-order pairs
    (funnels/Markov models miss third-order structure like
    view>click>purchase vs click>view>purchase). Window leads keep the
    extraction single-pass.

    Scale: one user-keyed window exchange (co-partitioned with any
    per-user downstream), one map-side-combined groupBy on the
    |types|^3-bounded trigram domain."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"))
    return (seq.filter(F.col("e3").isNotNull())
            .groupBy(F.concat_ws(">", "e1", "e2", "e3").alias("trigram"))
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("n_users"))
            .orderBy(F.desc("n"), "trigram").limit(20))


# ---------------------------------------------------------------------------
# q_dedup_threshold_curve — semantic-dedup operating curve
# ---------------------------------------------------------------------------

_CURVE_TAUS = (0.5, 0.35, 0.2, 0.1, 0.05)


def _threshold_curve_oracle() -> str:
    from .queries_llm import _PAIR_COS_CTE
    per_tau = ",\n         ".join(
        f"count(CASE WHEN round(cos_raw, 6) >= {t} THEN 1 END) AS np_{i},"
        f" count(DISTINCT CASE WHEN round(cos_raw, 6) >= {t} THEN vb END)"
        f" AS nd_{i}"
        for i, t in enumerate(_CURVE_TAUS))
    rows = "\n  UNION ALL\n".join(
        f"  SELECT {t} AS tau, np_{i} AS n_pairs, nd_{i} AS n_dropped"
        f" FROM agg" for i, t in enumerate(_CURVE_TAUS))
    # agg is referenced once per threshold by the curve UNION — without
    # MATERIALIZED, DuckDB v1.0 inlines it and re-runs the quadratic
    # paircos scan 5x (the q_coverage_select exponential-CTE class;
    # observed live as a multi-hour stall in the sf1.0 sweep)
    return f"""
    WITH {_PAIR_COS_CTE},
    agg AS MATERIALIZED (
      SELECT {per_tau}
      FROM paircos
    ),
    total AS (SELECT count(*) AS n_vecs FROM embeddings),
    curve AS (
    {rows}
    )
    SELECT tau, n_pairs, n_dropped,
           round(cast(n_dropped as double)
                 / (SELECT n_vecs FROM total), 4) AS drop_rate
    FROM curve WHERE n_pairs > 0
    ORDER BY tau
    """


@query("q_dedup_threshold_curve", oracle=_threshold_curve_oracle())
def q_dedup_threshold_curve(spark, sf_dir):
    """Semantic-dedup operating curve: for five cosine thresholds, the
    candidate-pair count, the documents a keep-lowest-id policy would
    drop, and the corpus drop rate — the tuning table an operator
    reads BEFORE committing a threshold to a 100 TB dedup run (pick
    tau where the curve's knee sits, not a folklore constant).

    Plan: each pair's cosine is computed ONCE behind a DECLARED 6dp
    round (both engines compare the same rounded value — the
    q_outlier_iqr fence discipline), grouped to the tiny distinct-cos
    relation, then bucketed against the threshold spine; the per-tau
    distinct-dropped count collapses to one max-cos per vb because
    the thresholds are nested. The naive forms all lose by an order
    of magnitude at sf0.1: a 5x threshold-join fan-out re-shuffles
    pairs x taus (38 s); five conditional countDistinct aggregates
    trigger Spark's Expand, 5x row multiplication before the exchange.
    What remains is the irreducible family cost: the decimal-exact
    64-dim dot itself (~50 us/pair — the DEC_SIM portability
    discipline, see operators/similarity.py), evaluated once under
    the persist and shared by both branches.

    Scale: the pair relation is the same label-blocked join as
    q_embed_neardup (per-block quadratic — the exact-verification
    tier; the IVF/LSH tiers bound candidates first); everything after
    is bucket-domain arithmetic."""
    from .queries_llm import _norm
    from .operators.similarity import dot_col

    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    a, b = n.alias("a"), n.alias("b")
    cos = (dot_col(F.col("a.embedding"), F.col("b.embedding"))
           / F.sqrt(F.col("a.nrm") * F.col("b.nrm")))
    pairs = (a.join(b, (F.col("a.label") == F.col("b.label"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("b.vec_id").alias("vb"),
                     F.round(cos, 6).alias("c6"))
             # the decimal-exact 64-dim dot dominates (~50 us/pair);
             # persist so the pair-count and per-vb branches (and the
             # CacheManager, across identical rebuilds) evaluate it
             # once, not per consumer
             ).persist()

    def bucket(col):  # index of the highest (first) threshold cleared
        expr = F.lit(len(_CURVE_TAUS))
        for i in range(len(_CURVE_TAUS) - 1, -1, -1):
            expr = F.when(col >= _CURVE_TAUS[i], i).otherwise(expr)
        return expr

    # group on the rounded-cos COLUMN first so the 64-dim cosine
    # evaluates once per pair; bucket() then runs on the small
    # distinct-cos / per-vb relations only
    pair_b = (pairs.groupBy("c6").agg(F.count("*").alias("cnt"))
              .groupBy(bucket(F.col("c6")).alias("bk"))
              .agg(F.sum("cnt").alias("pc")))
    vb_b = (pairs.groupBy("vb").agg(F.max("c6").alias("mc"))
            .groupBy(bucket(F.col("mc")).alias("bk"))
            .agg(F.count("*").alias("vc")))
    taus = spark.createDataFrame(
        [(i, float(t)) for i, t in enumerate(_CURVE_TAUS)], "i int, tau double")
    # nested thresholds: totals at tau_i = sum over buckets bk <= i
    np_ = (taus.join(F.broadcast(pair_b), F.col("bk") <= F.col("i"))
           .groupBy("i", "tau").agg(F.sum("pc").alias("n_pairs")))
    nd_ = (taus.join(F.broadcast(vb_b), F.col("bk") <= F.col("i"))
           .groupBy("i", "tau").agg(F.sum("vc").alias("n_dropped")))
    total = e.agg(F.count("*").alias("n_vecs"))
    return (np_.join(nd_, ["i", "tau"])
            .filter(F.col("n_pairs") > 0)
            .crossJoin(F.broadcast(total))
            .select("tau", "n_pairs", "n_dropped",
                    F.round(F.col("n_dropped").cast("double")
                            / F.col("n_vecs"), 4).alias("drop_rate"))
            .orderBy("tau"))


# ---------------------------------------------------------------------------
# q_quantile_normalize — cross-group distribution alignment
# ---------------------------------------------------------------------------


@query(
    "q_quantile_normalize",
    oracle="""
    WITH binned AS (
      SELECT event_type,
             ntile(100) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS pctile,
             value
      FROM events
    ),
    group_bucket AS (
      SELECT event_type, pctile, count(*) AS n,
             cast(sum(cast(value as decimal(30,10))) as double)
               / count(*) AS grp_mean_raw
      FROM binned GROUP BY event_type, pctile
    ),
    reference AS (
      SELECT pctile,
             cast(sum(cast(grp_mean_raw as decimal(30,10))) as double)
               / count(*) AS ref_raw
      FROM group_bucket GROUP BY pctile
    )
    SELECT g.event_type, g.pctile, g.n,
           round(g.grp_mean_raw, 6) AS grp_mean,
           round(r.ref_raw, 6) AS normalized
    FROM group_bucket g JOIN reference r ON g.pctile = r.pctile
    ORDER BY g.event_type, g.pctile
    """,
)
def q_quantile_normalize(spark, sf_dir):
    """Quantile normalization across groups (the genomics/batch-effect
    standard): rank each group's values into 100 within-group
    percentile bins (total order via the event_id tiebreak), average
    each bin within its group, then map every bin to the CROSS-group
    mean of that percentile — after which all five event_type
    distributions are identical by construction. The per-bin output is
    the normalization lookup a scoring pipeline broadcasts to align
    quality scores produced by different model versions.

    Hash discipline: both reductions (within-bin mean, cross-group
    reference mean) run through decimal; value+event_id is a total
    order so ntile assigns boundary ties identically on both engines.
    Rounding is at SIX decimals — the identity precision: bucket means
    are exact multiples of 0.01/n (n = 2/20/200 at the fixture
    scales), so 6dp never sits on a half-boundary. round(x, 4) did:
    at sf0.1 a mean of exactly 26.04115 rounded 26.0412 on Spark
    (BigDecimal HALF_UP over the binary expansion) but 26.0411 on
    DuckDB (multiply/nearbyint) — same double, different rounding
    algorithms. Round at a precision where the true value is exactly
    representable and both algorithms become the identity.

    Scale: one shuffle partitioned by event_type for the within-group
    ranking (per-group sort — at 100 TB swap ntile for
    percentile_approx boundaries + a broadcast range join, the
    q_winsorize pattern), then the reference table is 100 rows:
    broadcast. Nothing corpus-sized crosses groups."""
    e = load_table(spark, sf_dir, "events")
    from .functions.hashsafe import DEC
    binned = e.select(
        "event_type", "value",
        F.ntile(100).over(W.partitionBy("event_type")
                          .orderBy("value", "event_id")).alias("pctile"))
    grp = (binned.groupBy("event_type", "pctile")
           .agg(F.count("*").alias("n"),
                (F.sum(F.col("value").cast(DEC)).cast("double")
                 / F.count("*")).alias("grp_mean_raw")))
    ref = (grp.groupBy("pctile")
           .agg((F.sum(F.col("grp_mean_raw").cast(DEC)).cast("double")
                 / F.count("*")).alias("ref_raw")))
    return (grp.join(F.broadcast(ref), "pctile")
            .select("event_type", "pctile", "n",
                    F.round("grp_mean_raw", 6).alias("grp_mean"),
                    F.round("ref_raw", 6).alias("normalized"))
            .orderBy("event_type", "pctile"))


# ---------------------------------------------------------------------------
# q_mannwhitney_u — nonparametric rank-sum two-sample test
# ---------------------------------------------------------------------------

_MWU_ORACLE = """
WITH x AS (
  SELECT event_type,
         cast(round(value, 3) * 1000 as decimal(7,0)) AS v
  FROM events WHERE event_type IN ('click', 'purchase')
),
g AS (
  SELECT v,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na_v,
         count(*) AS n_v
  FROM x GROUP BY v
),
rk AS (
  SELECT v, na_v, n_v, sum(n_v) OVER (ORDER BY v) AS cum
  FROM g
),
agg AS (
  SELECT cast(sum(na_v * (2 * cum - n_v + 1)) as bigint) AS ra2,
         cast(sum(n_v * n_v * n_v - n_v) as bigint) AS ties,
         cast(sum(na_v) as bigint) AS n_a,
         cast(sum(n_v) - sum(na_v) as bigint) AS n_b,
         cast(sum(n_v) as bigint) AS n
  FROM rk
),
u AS (
  SELECT *, ra2 - n_a * (n_a + 1) AS u2 FROM agg
)
SELECT n_a, n_b,
       cast(u2 as double) / 2 AS u_stat,
       cast(u2 - n_a * n_b as double) / cast(n_a * n_b as double)
         AS rank_biserial,
       round((cast(u2 as double) / 2 - cast(n_a as double) * n_b / 2)
             / sqrt(cast(n_a as double) * n_b / 12
                    * ((n + 1) - cast(ties as double)
                                 / (cast(n as double) * (n - 1)))), 4)
         AS z_score
FROM u
"""


@query("q_mannwhitney_u", oracle=_MWU_ORACLE)
def q_mannwhitney_u(spark, sf_dir):
    """Mann-Whitney U rank-sum test: does the `value` distribution of
    'click' events stochastically dominate 'purchase' events? The
    nonparametric two-sample location test beside q_chisq_independence
    (categorical) and q_ks_drift (distributional) — the robust A/B
    readout when values are heavy-tailed and a t-test's normality
    assumption fails. Rank arithmetic is EXACT integers throughout:
    values key as milli-units via the decimal(7,0) cast (q_agg_moments
    discipline), tied ranks enter as DOUBLED average ranks
    (2*cum - n_v + 1, always an integer), so U arrives as an integer
    u2 = 2U and only the final z (tie-corrected sigma, one sqrt) and
    the rank-biserial effect size (one IEEE division of two exact
    integers — deterministic without rounding) are floats.

    Scale: one map-side-combined groupBy on the value key, one
    ordered-window cumsum over the distinct-value relation (bounded by
    value cardinality, not row count), one scalar reduce. At extreme
    corpus sizes the n_a*n_b product outgrows bigint around n ~ 3e9
    per side — lift those two factors to decimal(38,0) then."""
    e = load_table(spark, sf_dir, "events")
    x = (e.filter(F.col("event_type").isin("click", "purchase"))
         .select("event_type",
                 (F.round("value", 3) * 1000)
                 .cast("decimal(7,0)").alias("v")))
    g = (x.groupBy("v")
         .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                    .otherwise(0)).alias("na_v"),
              F.count("*").alias("n_v")))
    rk = g.select("v", "na_v", "n_v",
                  F.sum("n_v").over(
                      W.orderBy("v")
                      .rangeBetween(W.unboundedPreceding, W.currentRow))
                  .alias("cum"))
    agg = rk.agg(
        F.sum(F.col("na_v") * (2 * F.col("cum") - F.col("n_v") + 1))
        .cast("long").alias("ra2"),
        F.sum(F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v"))
        .cast("long").alias("ties"),
        F.sum("na_v").cast("long").alias("n_a"),
        (F.sum("n_v") - F.sum("na_v")).cast("long").alias("n_b"),
        F.sum("n_v").cast("long").alias("n"))
    u = agg.withColumn("u2", F.expr("ra2 - n_a * (n_a + 1)"))
    return u.select(
        "n_a", "n_b",
        F.expr("cast(u2 as double) / 2").alias("u_stat"),
        F.expr("cast(u2 - n_a * n_b as double)"
               " / cast(n_a * n_b as double)").alias("rank_biserial"),
        F.expr("round((cast(u2 as double) / 2"
               "       - cast(n_a as double) * n_b / 2)"
               " / sqrt(cast(n_a as double) * n_b / 12"
               "        * ((n + 1) - cast(ties as double)"
               "                     / (cast(n as double) * (n - 1)))), 4)")
        .alias("z_score"))


# ---------------------------------------------------------------------------
# q_anova_oneway — one-way ANOVA F over event_type groups
# ---------------------------------------------------------------------------
#
# The classical-inference ladder beside q_mannwhitney_u (two-sample
# rank), q_kruskal_wallis (k-sample rank) and q_levene_bf (variance
# homogeneity): does mean(value) differ across the five event types?
#
# Exactness device (shared by all three): values key as integer
# milli-units (decimal(7,0) cast, the q_agg_moments discipline), so
# every per-group sufficient statistic (n, sum, sum-of-squares) is an
# exact bigint. The per-group term s1_g^2/n_g is ONE double division of
# exactly-cast integers — bit-identical on both engines — and the k=5
# per-group terms are rounded to 6dp and summed as decimal(30,10), so
# the cross-group addition is exact and order-independent (a plain
# double sum over groups would inherit Spark-vs-DuckDB summation
# order). Everything after is scalar double arithmetic on identical
# operands.

_ANOVA_ORACLE = """
WITH x AS (
  SELECT event_type,
         cast(cast(round(value, 3) * 1000 as decimal(7,0)) as bigint)
           AS xi
  FROM events
),
g AS (
  SELECT event_type,
         cast(count(*) as bigint) AS n_g,
         cast(sum(xi) as bigint) AS s1,
         cast(sum(xi * xi) as bigint) AS s2
  FROM x GROUP BY event_type
),
t AS (
  SELECT n_g, s1, s2,
         cast(round(cast(s1 as double) * cast(s1 as double) / n_g, 6)
              as decimal(30,10)) AS tg
  FROM g
),
s AS (
  SELECT cast(count(*) as bigint) AS k,
         cast(sum(n_g) as bigint) AS n,
         cast(sum(s1) as bigint) AS s1_all,
         cast(sum(s2) as bigint) AS s2_all,
         cast(sum(tg) as decimal(30,10)) AS t_all
  FROM t
)
SELECT k, n,
       round((cast(t_all as double)
              - cast(s1_all as double) * cast(s1_all as double) / n)
             / 1e6, 4) + 0.0 AS ssb,
       round((cast(s2_all as double) - cast(t_all as double)) / 1e6, 4)
         + 0.0 AS ssw,
       round(((cast(t_all as double)
               - cast(s1_all as double) * cast(s1_all as double) / n)
              / (k - 1))
             / ((cast(s2_all as double) - cast(t_all as double))
                / (n - k)), 6) + 0.0 AS f_stat,
       round((cast(t_all as double)
              - cast(s1_all as double) * cast(s1_all as double) / n)
             / (cast(s2_all as double)
                - cast(s1_all as double) * cast(s1_all as double) / n),
             6) + 0.0 AS eta_sq
FROM s
"""


@query("q_anova_oneway", oracle=_ANOVA_ORACLE)
def q_anova_oneway(spark, sf_dir):
    """One-way ANOVA over event_type: F = (SSB/(k-1)) / (SSW/(N-k))
    plus the eta-squared effect size, on milli-unit integer values.
    SSB/SSW are reported in original units^2 (the /1e6 undoes the
    milli-unit scaling). See the ladder note above for the exactness
    device; the only floats are per-group s1^2/n (one division),
    rounded and decimal-summed, then scalar combinations.

    Scale: one map-side-combined groupBy(event_type) over the fact
    scan, then a k-row reduce — nothing grows with N except the
    bigint sums (lift s2 to decimal(38,0) past ~1e18 milli-units^2,
    i.e. ~1e6x this fixture)."""
    e = load_table(spark, sf_dir, "events")
    x = e.select("event_type",
                 (F.round("value", 3) * 1000).cast("decimal(7,0)")
                 .cast("long").alias("xi"))
    g = (x.groupBy("event_type")
         .agg(F.count("*").cast("long").alias("n_g"),
              F.sum("xi").cast("long").alias("s1"),
              F.sum(F.col("xi") * F.col("xi")).cast("long").alias("s2")))
    t = g.select(
        "n_g", "s1", "s2",
        F.round(F.col("s1").cast("double") * F.col("s1").cast("double")
                / F.col("n_g"), 6).cast("decimal(30,10)").alias("tg"))
    s = t.agg(F.count("*").cast("long").alias("k"),
              F.sum("n_g").cast("long").alias("n"),
              F.sum("s1").cast("long").alias("s1_all"),
              F.sum("s2").cast("long").alias("s2_all"),
              F.sum("tg").cast("decimal(30,10)").alias("t_all"))
    td = F.col("t_all").cast("double")
    s1d = F.col("s1_all").cast("double")
    s2d = F.col("s2_all").cast("double")
    ssb = td - s1d * s1d / F.col("n")
    ssw = s2d - td
    sst = s2d - s1d * s1d / F.col("n")
    f = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return s.select(
        "k", "n",
        (F.round(ssb / 1e6, 4) + 0.0).alias("ssb"),
        (F.round(ssw / 1e6, 4) + 0.0).alias("ssw"),
        (F.round(f, 6) + 0.0).alias("f_stat"),
        (F.round(ssb / sst, 6) + 0.0).alias("eta_sq"))


# ---------------------------------------------------------------------------
# q_kruskal_wallis — k-sample rank test (tie-corrected H)
# ---------------------------------------------------------------------------

_KW_ORACLE = """
WITH x AS (
  SELECT event_type,
         cast(round(value, 3) * 1000 as decimal(7,0)) AS v
  FROM events
),
gv AS (
  SELECT event_type, v, cast(count(*) as bigint) AS c
  FROM x GROUP BY event_type, v
),
nv AS (
  SELECT v, cast(sum(c) as bigint) AS n_v FROM gv GROUP BY v
),
rk AS (
  SELECT v, n_v,
         2 * sum(n_v) OVER (ORDER BY v) - n_v + 1 AS r2
  FROM nv
),
grp AS (
  SELECT gv.event_type,
         cast(sum(gv.c) as bigint) AS n_g,
         cast(sum(gv.c * rk.r2) as bigint) AS r2_g
  FROM gv JOIN rk ON rk.v = gv.v
  GROUP BY gv.event_type
),
term AS (
  SELECT n_g, r2_g,
         cast(round(cast(r2_g as double) * cast(r2_g as double)
                    / (4 * n_g), 6) as decimal(30,10)) AS tg
  FROM grp
),
ties AS (
  SELECT cast(sum(n_v * n_v * n_v - n_v) as bigint) AS tie3
  FROM nv
),
s AS (
  SELECT cast(count(*) as bigint) AS k,
         cast(sum(n_g) as bigint) AS n,
         cast(sum(tg) as decimal(30,10)) AS t_all,
         (SELECT tie3 FROM ties) AS tie3
  FROM term
)
SELECT k, n,
       round((12.0 * cast(t_all as double)
              / (cast(n as double) * (n + 1)) - 3.0 * (n + 1))
             / (1.0 - cast(tie3 as double)
                      / (cast(n as double) * cast(n as double)
                         * cast(n as double) - cast(n as double))),
             6) + 0.0 AS h_stat
FROM s
"""


@query("q_kruskal_wallis", oracle=_KW_ORACLE)
def q_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis tie-corrected H across all five event types —
    the k-sample generalization of q_mannwhitney_u, the rank-based
    sibling of q_anova_oneway for heavy-tailed values. Doubled
    average ranks (2*cum - n_v + 1, always integer) make every
    rank-sum an exact bigint; per-group R2_g^2/(4*n_g) is one double
    division, rounded and decimal-summed across the k groups; the tie
    term sum(n_v^3 - n_v) is exact. H = [12*T/(N(N+1)) - 3(N+1)] /
    (1 - ties/(N^3-N)), computed scalar-side.

    Scale: the rank window runs over the DISTINCT-value relation
    (bounded by value cardinality, not N); one groupBy(event_type,v),
    one bounded join, one k-row reduce."""
    e = load_table(spark, sf_dir, "events")
    x = e.select("event_type",
                 (F.round("value", 3) * 1000).cast("decimal(7,0)")
                 .alias("v"))
    gv = (x.groupBy("event_type", "v")
          .agg(F.count("*").cast("long").alias("c")))
    nv = gv.groupBy("v").agg(F.sum("c").cast("long").alias("n_v"))
    rk = nv.select(
        "v", "n_v",
        (2 * F.sum("n_v").over(
            W.orderBy("v")
            .rangeBetween(W.unboundedPreceding, W.currentRow))
         - F.col("n_v") + 1).alias("r2"))
    grp = (gv.join(rk.select("v", "r2"), "v")
           .groupBy("event_type")
           .agg(F.sum("c").cast("long").alias("n_g"),
                F.sum(F.col("c") * F.col("r2")).cast("long")
                .alias("r2_g")))
    term = grp.select(
        "n_g",
        F.round(F.col("r2_g").cast("double")
                * F.col("r2_g").cast("double")
                / (4 * F.col("n_g")), 6).cast("decimal(30,10)")
        .alias("tg"))
    tie3 = nv.agg(
        F.sum(F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v"))
        .cast("long").alias("tie3"))
    s = (term.agg(F.count("*").cast("long").alias("k"),
                  F.sum("n_g").cast("long").alias("n"),
                  F.sum("tg").cast("decimal(30,10)").alias("t_all"))
         .crossJoin(F.broadcast(tie3)))
    nd = F.col("n").cast("double")
    h = ((12.0 * F.col("t_all").cast("double") / (nd * (F.col("n") + 1))
          - 3.0 * (F.col("n") + 1))
         / (1.0 - F.col("tie3").cast("double") / (nd * nd * nd - nd)))
    return s.select("k", "n", (F.round(h, 6) + 0.0).alias("h_stat"))


# ---------------------------------------------------------------------------
# q_levene_bf — Brown-Forsythe variance-homogeneity test
# ---------------------------------------------------------------------------

_LEVENE_ORACLE = """
WITH x AS (
  SELECT event_type,
         cast(cast(round(value, 3) * 1000 as decimal(7,0)) as bigint)
           AS xi
  FROM events
),
gv AS (
  SELECT event_type, xi, cast(count(*) as bigint) AS c
  FROM x GROUP BY event_type, xi
),
cum AS (
  SELECT event_type, xi, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY xi) AS cm,
         sum(c) OVER (PARTITION BY event_type) AS n_g
  FROM gv
),
med AS (
  SELECT event_type,
         min(CASE WHEN 2 * cm >= n_g THEN xi END)
         + min(CASE WHEN 2 * cm >= n_g + 1 THEN xi END) AS m2
  FROM cum GROUP BY event_type
),
z AS (
  SELECT x.event_type, abs(2 * x.xi - med.m2) AS z2
  FROM x JOIN med ON med.event_type = x.event_type
),
g AS (
  SELECT event_type,
         cast(count(*) as bigint) AS n_g,
         cast(sum(z2) as bigint) AS s1,
         cast(sum(z2 * z2) as bigint) AS s2
  FROM z GROUP BY event_type
),
t AS (
  SELECT n_g, s1, s2,
         cast(round(cast(s1 as double) * cast(s1 as double) / n_g, 6)
              as decimal(30,10)) AS tg
  FROM g
),
s AS (
  SELECT cast(count(*) as bigint) AS k,
         cast(sum(n_g) as bigint) AS n,
         cast(sum(s1) as bigint) AS s1_all,
         cast(sum(s2) as bigint) AS s2_all,
         cast(sum(tg) as decimal(30,10)) AS t_all
  FROM t
)
SELECT k, n,
       round(((cast(t_all as double)
               - cast(s1_all as double) * cast(s1_all as double) / n)
              / (k - 1))
             / ((cast(s2_all as double) - cast(t_all as double))
                / (n - k)), 6) + 0.0 AS w_stat
FROM s
"""


@query("q_levene_bf", oracle=_LEVENE_ORACLE)
def q_levene_bf(spark, sf_dir):
    """Brown-Forsythe test (Levene with group MEDIANS): one-way ANOVA
    F computed over z_ij = |x_ij - median_g| — are value variances
    homogeneous across event types? The robust pre-check that decides
    whether q_anova_oneway's equal-variance assumption holds.

    Median device: per-group medians over integer milli-units are
    carried DOUBLED (m2 = lo + hi from the cumulative-count relation,
    always an integer), so z2 = |2x - m2| is an exact integer = 2z and
    the doubling cancels in F. Sufficient statistics and the
    cross-group sum follow the q_anova_oneway device exactly.

    Scale: two groupBys over the (event_type, value-key) relation
    (bounded by per-group value cardinality), one broadcast-sized
    k-row median join back onto the fact scan, one k-row reduce."""
    e = load_table(spark, sf_dir, "events")
    x = e.select("event_type",
                 (F.round("value", 3) * 1000).cast("decimal(7,0)")
                 .cast("long").alias("xi"))
    gv = (x.groupBy("event_type", "xi")
          .agg(F.count("*").cast("long").alias("c")))
    win = (W.partitionBy("event_type").orderBy("xi")
           .rangeBetween(W.unboundedPreceding, W.currentRow))
    cum = gv.select(
        "event_type", "xi",
        F.sum("c").over(win).alias("cm"),
        F.sum("c").over(W.partitionBy("event_type")).alias("n_g"))
    med = (cum.groupBy("event_type")
           .agg((F.min(F.when(2 * F.col("cm") >= F.col("n_g"),
                              F.col("xi")))
                 + F.min(F.when(2 * F.col("cm") >= F.col("n_g") + 1,
                                F.col("xi")))).alias("m2")))
    z = (x.join(F.broadcast(med), "event_type")
         .select("event_type",
                 F.abs(2 * F.col("xi") - F.col("m2")).alias("z2")))
    g = (z.groupBy("event_type")
         .agg(F.count("*").cast("long").alias("n_g"),
              F.sum("z2").cast("long").alias("s1"),
              F.sum(F.col("z2") * F.col("z2")).cast("long").alias("s2")))
    t = g.select(
        "n_g", "s1", "s2",
        F.round(F.col("s1").cast("double") * F.col("s1").cast("double")
                / F.col("n_g"), 6).cast("decimal(30,10)").alias("tg"))
    s = t.agg(F.count("*").cast("long").alias("k"),
              F.sum("n_g").cast("long").alias("n"),
              F.sum("s1").cast("long").alias("s1_all"),
              F.sum("s2").cast("long").alias("s2_all"),
              F.sum("tg").cast("decimal(30,10)").alias("t_all"))
    td = F.col("t_all").cast("double")
    s1d = F.col("s1_all").cast("double")
    ssb = td - s1d * s1d / F.col("n")
    ssw = F.col("s2_all").cast("double") - td
    w = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return s.select("k", "n", (F.round(w, 6) + 0.0).alias("w_stat"))


# ---------------------------------------------------------------------------
# q_fdr_bh — Benjamini-Hochberg step-up multiple-testing control
# ---------------------------------------------------------------------------

_FDR_ORACLE = """
WITH x AS (
  SELECT event_type, cast(ts as date) AS d,
         cast(cast(round(value, 3) * 1000 as decimal(7,0)) as bigint)
           AS xi
  FROM events
),
gstats AS (
  SELECT cast(count(*) as bigint) AS n,
         cast(sum(xi) as bigint) AS s1,
         cast(sum(xi * xi) as bigint) AS s2
  FROM x
),
cell AS (
  SELECT event_type, d,
         cast(count(*) as bigint) AS n_c,
         cast(sum(xi) as bigint) AS s1_c
  FROM x GROUP BY event_type, d
),
pv AS (
  SELECT event_type, d,
         cast(round(2.0 / (1.0 + exp(abs(
           (cast(s1_c as double) / n_c - cast(s1 as double) / n)
           / sqrt(((cast(s2 as double)
                    - cast(s1 as double) * cast(s1 as double) / n)
                   / (n - 1)) / n_c)))), 6) as decimal(8,6)) AS p
  FROM cell CROSS JOIN gstats
),
ranked AS (
  SELECT p, row_number() OVER (ORDER BY p, event_type, d) AS i,
         cast(count(*) OVER () as bigint) AS m
  FROM pv
),
kstar AS (
  SELECT max(CASE WHEN p * 20 * m <= i THEN i END) AS k,
         max(m) AS m
  FROM ranked
)
SELECT m,
       coalesce(k, 0) AS n_rejected,
       (SELECT max(p) FROM ranked
        WHERE i <= (SELECT k FROM kstar)) AS p_cutoff
FROM kstar
"""


@query("q_fdr_bh", oracle=_FDR_ORACLE)
def q_fdr_bh(spark, sf_dir):
    """Benjamini-Hochberg step-up at alpha = 0.05 over the m =
    (event_type x day) cells: each cell tests its mean value against
    the global mean. The multiple-testing controller every metrics
    platform needs once it slices by segment — reject the k* smallest
    p-values where k* = max{i : p_(i) <= alpha*i/m}, i.e. everything
    at or below the adaptive cutoff.

    The per-cell p is a LOGISTIC tail proxy 2/(1+exp(|z|)) of the
    z-score (monotone in |z|, in (0,1]) — erf/normal CDF isn't
    portable across both engines, and BH only consumes p's order and
    magnitude, so any p-source plugs in; the proxy is documented, not
    hidden. Hash discipline: z comes from exact bigint milli-unit
    sums; p is rounded to decimal(8,6) BEFORE the BH comparison, and
    the step-up inequality p*20*m <= i is evaluated in exact decimal
    x integer arithmetic, so the rejection set is engine-identical.

    Scale: one fact scan feeding one global and one per-cell reduce;
    the BH sort runs over the m-cell relation (segments, not rows)."""
    e = load_table(spark, sf_dir, "events")
    x = e.select("event_type", F.col("ts").cast("date").alias("d"),
                 (F.round("value", 3) * 1000).cast("decimal(7,0)")
                 .cast("long").alias("xi"))
    glob = x.agg(F.count("*").cast("long").alias("n"),
                 F.sum("xi").cast("long").alias("s1"),
                 F.sum(F.col("xi") * F.col("xi")).cast("long").alias("s2"))
    cell = (x.groupBy("event_type", "d")
            .agg(F.count("*").cast("long").alias("n_c"),
                 F.sum("xi").cast("long").alias("s1_c")))
    nd = F.col("n").cast("double")
    mean_g = F.col("s1").cast("double") / nd
    var_g = ((F.col("s2").cast("double")
              - F.col("s1").cast("double") * F.col("s1").cast("double")
              / nd) / (F.col("n") - 1))
    z = ((F.col("s1_c").cast("double") / F.col("n_c") - mean_g)
         / F.sqrt(var_g / F.col("n_c")))
    pv = (cell.crossJoin(F.broadcast(glob))
          .select("event_type", "d",
                  F.round(2.0 / (1.0 + F.exp(F.abs(z))), 6)
                  .cast("decimal(8,6)").alias("p")))
    ranked = pv.select(
        "p",
        F.row_number().over(W.orderBy("p", "event_type", "d")).alias("i"),
        F.count("*").over(W.partitionBy()).cast("long").alias("m"))
    kstar = ranked.agg(
        F.max(F.when(F.col("p") * 20 * F.col("m") <= F.col("i"),
                     F.col("i"))).alias("k"),
        F.max("m").alias("m"))
    cutoff = (ranked.join(F.broadcast(kstar.select("k")),
                          F.col("i") <= F.col("k"))
              .agg(F.max("p").alias("p_cutoff")))
    return (kstar.crossJoin(F.broadcast(cutoff))
            .select("m", F.coalesce(F.col("k"), F.lit(0).cast("long"))
                    .cast("long").alias("n_rejected"), "p_cutoff"))


# ---------------------------------------------------------------------------
# q_friedman — blocked rank test (tie-corrected Friedman Q)
# ---------------------------------------------------------------------------

_FRIEDMAN_ORACLE = """
WITH daily0 AS (
  SELECT cast(ts as date) AS d, event_type,
         cast(count(*) as bigint) AS c
  FROM events GROUP BY 1, 2
),
complete AS (
  SELECT d FROM daily0 GROUP BY d
  HAVING count(*) = (SELECT count(DISTINCT event_type) FROM daily0)
),
daily AS (
  SELECT daily0.* FROM daily0 JOIN complete USING (d)
),
rk AS (
  SELECT d, event_type,
         2 * rank() OVER (PARTITION BY d ORDER BY c)
           + cast(count(*) OVER (PARTITION BY d, c) as bigint) - 1 AS r2
  FROM daily
),
col AS (
  SELECT event_type,
         cast(sum(r2) as bigint) AS r2_j,
         cast(count(*) as bigint) AS n
  FROM rk GROUP BY event_type
),
a AS (
  SELECT cast(sum(r2 * r2) as bigint) AS sr22 FROM rk
),
s AS (
  SELECT cast(count(*) as bigint) AS k,
         max(n) AS n,
         cast(sum((r2_j - n * (k_all + 1))
                  * (r2_j - n * (k_all + 1))) as bigint) AS dev2,
         max(sr22) AS sr22
  FROM col CROSS JOIN a
  CROSS JOIN (SELECT cast(count(*) as bigint) AS k_all FROM col) kk
)
SELECT n, k,
       round((k - 1) * cast(dev2 as double)
             / (cast(sr22 as double)
                - cast(n as double) * k * (k + 1) * (k + 1)), 6) + 0.0
         AS q_stat
FROM s
"""


@query("q_friedman", oracle=_FRIEDMAN_ORACLE)
def q_friedman(spark, sf_dir):
    """Tie-corrected Friedman test: within each day (block), the five
    event types' daily counts are rank-ordered; Q asks whether any
    event type systematically out-ranks the others across days — the
    repeated-measures companion of q_kruskal_wallis (which pools all
    rows and loses the day blocking).

    Exactness: within-block tie-averaged ranks are carried DOUBLED
    (2*rank + ties - 1, always integer), which makes every term of the
    tie-corrected statistic Q = (k-1)*sum_j(R2_j - n(k+1))^2 /
    (sum r2^2 - n*k*(k+1)^2) an exact bigint — the doubling cancels
    between numerator and denominator, so ONE double division rounded
    6dp is the only float op.

    Balanced-panel guard (ADVICE r5): the statistic's n-cancellation
    assumes every block contains every treatment, so blocks (days)
    missing any event type are dropped — the standard complete-blocks
    restriction. The fixture is balanced, so this is a no-op there,
    but an unbalanced panel now yields the correct statistic over the
    complete blocks instead of a silently wrong one.

    Scale: the rank window partitions by day over the calendar-bounded
    daily relation; two tiny reduces follow."""
    e = load_table(spark, sf_dir, "events")
    daily0 = (e.groupBy(F.col("ts").cast("date").alias("d"), "event_type")
              .agg(F.count("*").cast("long").alias("c")))
    ktot = daily0.agg(F.countDistinct("event_type").alias("kt"))
    complete = (daily0.groupBy("d").agg(F.count("*").alias("kb"))
                .crossJoin(F.broadcast(ktot))
                .filter(F.col("kb") == F.col("kt")).select("d"))
    daily = daily0.join(F.broadcast(complete), "d")
    r2 = (2 * F.rank().over(W.partitionBy("d").orderBy("c"))
          + F.count("*").over(W.partitionBy("d", "c")).cast("long") - 1)
    rk = daily.select("d", "event_type", r2.alias("r2"))
    col = (rk.groupBy("event_type")
           .agg(F.sum("r2").cast("long").alias("r2_j"),
                F.count("*").cast("long").alias("n")))
    a = rk.agg(F.sum(F.col("r2") * F.col("r2")).cast("long")
               .alias("sr22"))
    kk = col.agg(F.count("*").cast("long").alias("k_all"))
    s = (col.crossJoin(F.broadcast(a)).crossJoin(F.broadcast(kk))
         .agg(F.count("*").cast("long").alias("k"),
              F.max("n").alias("n"),
              F.sum((F.col("r2_j") - F.col("n") * (F.col("k_all") + 1))
                    * (F.col("r2_j") - F.col("n") * (F.col("k_all") + 1)))
              .cast("long").alias("dev2"),
              F.max("sr22").alias("sr22")))
    q = ((F.col("k") - 1) * F.col("dev2").cast("double")
         / (F.col("sr22").cast("double")
            - F.col("n").cast("double") * F.col("k") * (F.col("k") + 1)
            * (F.col("k") + 1)))
    return s.select("n", "k", (F.round(q, 6) + 0.0).alias("q_stat"))


# ---------------------------------------------------------------------------
# q_hodges_lehmann — robust two-sample shift estimator
# ---------------------------------------------------------------------------

_HL_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d,
         cast(count(*) FILTER (event_type = 'click') as bigint) AS x,
         cast(count(*) FILTER (event_type = 'purchase') as bigint) AS y
  FROM events GROUP BY 1
),
diffs AS (
  SELECT a.x - b.y AS delta
  FROM daily a CROSS JOIN daily b
),
cum AS (
  SELECT delta, cast(count(*) as bigint) AS c,
         sum(count(*)) OVER (ORDER BY delta) AS cm,
         sum(count(*)) OVER () AS np
  FROM diffs GROUP BY delta
),
med AS (
  SELECT cast(max(np) as bigint) AS n_pairs,
         min(CASE WHEN 2 * cm >= np THEN delta END)
         + min(CASE WHEN 2 * cm >= np + 1 THEN delta END) AS m2
  FROM cum
)
SELECT n_pairs,
       cast(m2 as double) / 2 AS hl_shift
FROM med
"""


@query("q_hodges_lehmann", oracle=_HL_ORACLE)
def q_hodges_lehmann(spark, sf_dir):
    """Hodges-Lehmann two-sample shift estimator: the median of all
    pairwise differences x_i - y_j between the daily click and
    purchase count series — the robust effect-size companion of
    q_mannwhitney_u (it inverts the same rank statistic) that a mean
    difference can't match under heavy tails.

    Exactness: differences are exact integers; the median comes from
    the doubled-median device over the grouped difference relation
    (m2 = lo + hi, one final /2 of an exact integer — a terminating
    double). The cross join is CALENDAR x CALENDAR (30 x 30 rows at
    every sf — the series length, not the corpus), never row-pairs.

    Scale: the daily pivot is the only fact-scan stage; the pairwise
    stage is bounded by the square of the series length, so at 100 TB
    it is still ~10^3 rows (for long series, subsample time points or
    use the q_theil_sen windowed-pair device)."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).cast("long").alias("x"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast("long").alias("y")))
    a = daily.select(F.col("x").alias("ax"))
    b = daily.select(F.col("y").alias("by"))
    diffs = (a.crossJoin(b)
             .select((F.col("ax") - F.col("by")).alias("delta")))
    grouped = diffs.groupBy("delta").agg(F.count("*").cast("long")
                                         .alias("c"))
    cum = grouped.select(
        "delta",
        F.sum("c").over(
            W.orderBy("delta")
            .rangeBetween(W.unboundedPreceding, W.currentRow)).alias("cm"),
        F.sum("c").over(W.partitionBy()).alias("np"))
    med = cum.agg(
        F.max("np").cast("long").alias("n_pairs"),
        (F.min(F.when(2 * F.col("cm") >= F.col("np"), F.col("delta")))
         + F.min(F.when(2 * F.col("cm") >= F.col("np") + 1,
                        F.col("delta")))).alias("m2"))
    return med.select("n_pairs",
                      (F.col("m2").cast("double") / 2).alias("hl_shift"))


# ---------------------------------------------------------------------------
# q_signflip_test — derandomized paired randomization test
# ---------------------------------------------------------------------------

_SIGNFLIP_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d,
         cast(count(*) FILTER (event_type = 'click') as bigint)
         - cast(count(*) FILTER (event_type = 'purchase') as bigint)
           AS delta
  FROM events GROUP BY 1
),
obs AS (
  SELECT abs(cast(sum(delta) as bigint)) AS t_obs,
         cast(count(*) as bigint) AS n_days
  FROM daily
),
flips AS (
  SELECT b.b,
         abs(cast(sum(CASE WHEN ('0x' || substring(
                    md5(cast(daily.d as string) || ':' ||
                        cast(b.b as string)), 1, 1))::int % 2 = 0
                    THEN daily.delta ELSE -daily.delta END) as bigint))
           AS t_b
  FROM daily CROSS JOIN (SELECT unnest(range(1, 201)) AS b) b
  GROUP BY b.b
)
SELECT obs.n_days, obs.t_obs,
       cast(count(*) FILTER (flips.t_b >= obs.t_obs) as bigint) AS n_ge,
       round((1.0 + count(*) FILTER (flips.t_b >= obs.t_obs))
             / 201.0, 6) + 0.0 AS p_value
FROM flips CROSS JOIN obs
GROUP BY obs.n_days, obs.t_obs
"""


@query("q_signflip_test", oracle=_SIGNFLIP_ORACLE)
def q_signflip_test(spark, sf_dir):
    """Derandomized paired randomization (sign-flip) test: under H0
    the daily click-purchase difference is symmetric around zero, so
    flipping each day's sign is distribution-preserving; the p-value
    is the fraction of 200 md5-derived sign assignments whose
    |sum| >= |observed sum| (with the +1 add-one correction). The
    assumption-free sibling of q_mannwhitney_u for PAIRED designs —
    and, like q_sample_stratified, the "randomness" is a hash of
    (day, replicate), so both engines enumerate the identical flip
    matrix: exact bigint sums, zero Monte-Carlo drift.

    Scale: the flip relation is |days| x B (calendar x constant —
    6,000 rows here), generated AFTER the fact-scan rollup; B scales
    the small side only."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg((F.sum(F.when(F.col("event_type") == "click", 1)
                         .otherwise(0))
                   - F.sum(F.when(F.col("event_type") == "purchase", 1)
                           .otherwise(0))).cast("long").alias("delta")))
    obs = daily.agg(
        F.abs(F.sum("delta")).cast("long").alias("t_obs"),
        F.count("*").cast("long").alias("n_days"))
    bs = daily.sparkSession.range(1, 201).select(
        F.col("id").cast("int").alias("b"))
    flip = F.when(
        F.conv(F.substring(
            F.md5(F.concat(F.col("d").cast("string"), F.lit(":"),
                           F.col("b").cast("string"))), 1, 1),
            16, 10).cast("int") % 2 == 0,
        F.col("delta")).otherwise(-F.col("delta"))
    flips = (daily.crossJoin(F.broadcast(bs))
             .groupBy("b")
             .agg(F.abs(F.sum(flip)).cast("long").alias("t_b")))
    return (flips.crossJoin(F.broadcast(obs))
            .groupBy("n_days", "t_obs")
            .agg(F.sum(F.when(F.col("t_b") >= F.col("t_obs"), 1)
                       .otherwise(0)).cast("long").alias("n_ge"))
            .select("n_days", "t_obs", "n_ge",
                    (F.round((1.0 + F.col("n_ge")) / 201.0, 6) + 0.0)
                    .alias("p_value")))


# ---------------------------------------------------------------------------
# q_welch_ttest — unequal-variance two-sample t
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH x AS (
  SELECT event_type,
         cast(cast(round(value, 3) * 1000 as decimal(7,0)) as bigint)
           AS xi
  FROM events WHERE event_type IN ('click', 'purchase')
),
g AS (
  SELECT event_type,
         cast(count(*) as bigint) AS n,
         cast(sum(xi) as bigint) AS s1,
         cast(sum(xi * xi) as bigint) AS s2
  FROM x GROUP BY event_type
),
p AS (
  SELECT max(CASE WHEN event_type = 'click' THEN n END) AS n1,
         max(CASE WHEN event_type = 'click' THEN s1 END) AS sa1,
         max(CASE WHEN event_type = 'click' THEN s2 END) AS sa2,
         max(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
         max(CASE WHEN event_type = 'purchase' THEN s1 END) AS sb1,
         max(CASE WHEN event_type = 'purchase' THEN s2 END) AS sb2
  FROM g
),
c AS (
  SELECT n1, n2,
         cast(sa1 as double) / n1 - cast(sb1 as double) / n2 AS md,
         ((cast(sa2 as double) - cast(sa1 as double) * sa1 / n1)
          / (n1 - 1)) / n1 AS va,
         ((cast(sb2 as double) - cast(sb1 as double) * sb1 / n2)
          / (n2 - 1)) / n2 AS vb
  FROM p
)
SELECT n1, n2,
       round(md / sqrt(va + vb), 4) + 0.0 AS t_stat,
       round((va + vb) * (va + vb)
             / (va * va / (n1 - 1) + vb * vb / (n2 - 1)), 2) + 0.0
         AS df_welch
FROM c
"""


@query("q_welch_ttest", oracle=_WELCH_ORACLE)
def q_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test between click and purchase
    values, with the Welch-Satterthwaite effective degrees of freedom
    — the parametric rung the inference ladder was missing between
    q_mannwhitney_u (rank) and q_anova_oneway (k-sample, pooled
    variance). The t statistic is dimensionless: the milli-unit keying
    scales the mean difference and the standard error identically, so
    no unit correction is applied (a /1000 here — ADVICE r5 — would
    report t a thousandfold too small against t-distribution critical
    values).

    Exactness: five exact bigint sufficient statistics; mean
    difference, both standard errors, t, and df are scalar double
    combinations with identical operand order on both engines.

    Scale: one filtered map-side-combined groupBy, then a 2-row
    pivot and scalar math."""
    e = load_table(spark, sf_dir, "events")
    x = (e.filter(F.col("event_type").isin("click", "purchase"))
         .select("event_type",
                 (F.round("value", 3) * 1000).cast("decimal(7,0)")
                 .cast("long").alias("xi")))
    g = (x.groupBy("event_type")
         .agg(F.count("*").cast("long").alias("n"),
              F.sum("xi").cast("long").alias("s1"),
              F.sum(F.col("xi") * F.col("xi")).cast("long").alias("s2")))
    pick = lambda et, c: F.max(F.when(F.col("event_type") == et,  # noqa: E731
                                      F.col(c)))
    p = g.agg(pick("click", "n").alias("n1"),
              pick("click", "s1").alias("sa1"),
              pick("click", "s2").alias("sa2"),
              pick("purchase", "n").alias("n2"),
              pick("purchase", "s1").alias("sb1"),
              pick("purchase", "s2").alias("sb2"))
    md = (F.col("sa1").cast("double") / F.col("n1")
          - F.col("sb1").cast("double") / F.col("n2"))
    va = ((F.col("sa2").cast("double")
           - F.col("sa1").cast("double") * F.col("sa1") / F.col("n1"))
          / (F.col("n1") - 1)) / F.col("n1")
    vb = ((F.col("sb2").cast("double")
           - F.col("sb1").cast("double") * F.col("sb1") / F.col("n2"))
          / (F.col("n2") - 1)) / F.col("n2")
    return p.select(
        "n1", "n2",
        (F.round(md / F.sqrt(va + vb), 4) + 0.0).alias("t_stat"),
        (F.round((va + vb) * (va + vb)
                 / (va * va / (F.col("n1") - 1)
                    + vb * vb / (F.col("n2") - 1)), 2) + 0.0)
        .alias("df_welch"))


# ---------------------------------------------------------------------------
# q_xi_correlation — Chatterjee's rank correlation (ties-corrected)
# ---------------------------------------------------------------------------

_XI_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d,
         cast(count(*) FILTER (event_type = 'click') as bigint) AS x,
         cast(count(*) FILTER (event_type = 'purchase') as bigint) AS y
  FROM daily_src GROUP BY 1
),
ranked AS (
  SELECT y,
         row_number() OVER (ORDER BY x, d) AS i,
         cast(count(*) OVER () as bigint) AS n
  FROM daily
),
rr AS (
  SELECT a.i, a.n,
         cast((SELECT count(*) FROM ranked b WHERE b.y <= a.y)
              as bigint) AS r,
         cast((SELECT count(*) FROM ranked b WHERE b.y >= a.y)
              as bigint) AS l
  FROM ranked a
),
diffs AS (
  SELECT n, l, abs(r - lag(r) OVER (ORDER BY i)) AS dr
  FROM rr
),
num AS (
  SELECT max(n) AS n,
         cast(sum(dr) as bigint) AS s,
         cast(sum(l * (n - l)) as bigint) AS den2
  FROM diffs
)
SELECT n,
       round(1.0 - cast(n as double) * s / (2.0 * den2), 6) + 0.0
         AS xi_xy
FROM num
"""


@query("q_xi_correlation",
       oracle=_XI_ORACLE.replace("daily_src", "events"))
def q_xi_correlation(spark, sf_dir):
    """Chatterjee's xi rank correlation (JASA 2021, ties-corrected
    form) from daily clicks to daily purchases: xi ~ 0 for
    independence, ~ 1 when y is a measurable FUNCTION of x — unlike
    Pearson/Spearman/Kendall it detects non-monotone dependence, which
    completes the correlation ladder (q_rolling_corr / q_spearman_corr
    / q_kendall_tau). The usual random tie-break on x is derandomized
    by (x, date) ordering, so both engines walk the same permutation.

    Exactness: r_i = #{y_j <= y_i} and l_i = #{y_j >= y_i} are exact
    integer ranks; xi = 1 - n*sum|r_{i+1}-r_i| / (2*sum l_i(n-l_i))
    is ONE double division of exact bigints, rounded 6dp.

    Scale: the daily pivot bounds everything; rank counts are windows
    over the calendar relation."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).cast("long").alias("x"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast("long").alias("y")))
    ranked = daily.select(
        "y",
        F.row_number().over(W.orderBy("x", "d")).alias("i"),
        F.count("*").over(W.partitionBy()).cast("long").alias("n"))
    # exact y-ranks via the cumulative device over grouped y values
    yc = ranked.groupBy("y").agg(F.count("*").cast("long").alias("c"))
    cum = yc.select(
        "y",
        F.sum("c").over(W.orderBy("y")
                        .rangeBetween(W.unboundedPreceding,
                                      W.currentRow)).alias("r"),
        (F.sum("c").over(W.partitionBy())
         - F.sum("c").over(W.orderBy("y")
                           .rangeBetween(W.unboundedPreceding,
                                         W.currentRow))
         + F.col("c")).alias("l"))
    rr = ranked.join(cum, "y").select("i", "n", "r", "l")
    s = rr.select(
        "n", "l",
        F.abs(F.col("r") - F.lag("r").over(W.orderBy("i"))).alias("dr"))
    num = s.agg(F.max("n").alias("n"),
                F.sum("dr").cast("long").alias("s"),
                F.sum(F.col("l") * (F.col("n") - F.col("l")))
                .cast("long").alias("den2"))
    return num.select(
        "n",
        (F.round(1.0 - F.col("n").cast("double") * F.col("s")
                 / (2.0 * F.col("den2")), 6) + 0.0).alias("xi_xy"))


# ---------------------------------------------------------------------------
# q_cronbach_alpha — internal-consistency reliability
# ---------------------------------------------------------------------------

_CRONBACH_ORACLE = """
WITH daily0 AS (
  SELECT cast(ts as date) AS d, event_type,
         cast(count(*) as bigint) AS x
  FROM events GROUP BY 1, 2
),
complete AS (
  SELECT d FROM daily0 GROUP BY d
  HAVING count(*) = (SELECT count(DISTINCT event_type) FROM daily0)
),
daily AS (
  SELECT daily0.* FROM daily0 JOIN complete USING (d)
),
items AS (
  SELECT event_type,
         cast(count(*) as bigint) AS n,
         cast(sum(x) as bigint) AS s1,
         cast(sum(x * x) as bigint) AS s2
  FROM daily GROUP BY event_type
),
tot AS (
  SELECT cast(count(*) as bigint) AS n,
         cast(sum(t) as bigint) AS s1,
         cast(sum(t * t) as bigint) AS s2
  FROM (SELECT d, sum(x) AS t FROM daily GROUP BY d)
),
s AS (
  SELECT cast(count(*) as bigint) AS k,
         cast(sum(items.n * items.s2 - items.s1 * items.s1) as bigint)
           AS var_items,
         max(tot.n * tot.s2 - tot.s1 * tot.s1) AS var_total
  FROM items CROSS JOIN tot
)
SELECT k,
       round((cast(k as double) / (k - 1))
             * (1.0 - cast(var_items as double) / var_total), 6) + 0.0
         AS alpha
FROM s
"""


@query("q_cronbach_alpha", oracle=_CRONBACH_ORACLE)
def q_cronbach_alpha(spark, sf_dir):
    """Cronbach's alpha treating the five event types' daily count
    series as items of one 'activity' scale: alpha = k/(k-1) *
    (1 - sum(var_i)/var(total)) — the internal-consistency readout
    that tells a metrics platform whether its component signals can be
    summed into one index or move independently.

    Exactness: every variance enters as the n-scaled integer
    n*sum(x^2) - (sum x)^2 — the common n cancels in the ratio, so
    alpha is ONE double division of exact bigints, rounded 6dp.

    Balanced-panel guard (ADVICE r5): the n-cancellation between
    item variances and total variance requires every item observed on
    every day, so incomplete days (any missing event type) are dropped
    — a no-op on the balanced fixture, correct on sparse panels.

    Scale: one daily rollup shuffle; items and totals are two reduces
    over the calendar-bounded relation."""
    e = load_table(spark, sf_dir, "events")
    daily0 = (e.groupBy(F.col("ts").cast("date").alias("d"), "event_type")
              .agg(F.count("*").cast("long").alias("x")))
    ktot = daily0.agg(F.countDistinct("event_type").alias("kt"))
    complete = (daily0.groupBy("d").agg(F.count("*").alias("kb"))
                .crossJoin(F.broadcast(ktot))
                .filter(F.col("kb") == F.col("kt")).select("d"))
    daily = daily0.join(F.broadcast(complete), "d")
    items = (daily.groupBy("event_type")
             .agg(F.count("*").cast("long").alias("n"),
                  F.sum("x").cast("long").alias("s1"),
                  F.sum(F.col("x") * F.col("x")).cast("long").alias("s2")))
    tot = (daily.groupBy("d").agg(F.sum("x").alias("t"))
           .agg(F.count("*").cast("long").alias("tn"),
                F.sum("t").cast("long").alias("ts1"),
                F.sum(F.col("t") * F.col("t")).cast("long").alias("ts2")))
    s = (items.crossJoin(F.broadcast(tot))
         .agg(F.count("*").cast("long").alias("k"),
              F.sum(F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
              .cast("long").alias("var_items"),
              F.max(F.col("tn") * F.col("ts2")
                    - F.col("ts1") * F.col("ts1")).alias("var_total")))
    return s.select(
        "k",
        (F.round((F.col("k").cast("double") / (F.col("k") - 1))
                 * (1.0 - F.col("var_items").cast("double")
                    / F.col("var_total")), 6) + 0.0).alias("alpha"))


# ---------------------------------------------------------------------------
# q_partial_corr — partial correlation controlling a confounder
# ---------------------------------------------------------------------------

_PARTIAL_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d,
         cast(count(*) FILTER (event_type = 'click') as bigint) AS x,
         cast(count(*) FILTER (event_type = 'purchase') as bigint) AS y,
         cast(count(*) FILTER (event_type = 'view') as bigint) AS z
  FROM events GROUP BY 1
),
s AS (
  SELECT cast(count(*) as bigint) AS n,
         cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
         cast(sum(z) as bigint) AS sz,
         cast(sum(x * x) as bigint) AS sxx,
         cast(sum(y * y) as bigint) AS syy,
         cast(sum(z * z) as bigint) AS szz,
         cast(sum(x * y) as bigint) AS sxy,
         cast(sum(x * z) as bigint) AS sxz,
         cast(sum(y * z) as bigint) AS syz
  FROM daily
),
r AS (
  SELECT n,
         (n * sxy - sx * sy)
           / sqrt(cast(n * sxx - sx * sx as double)
                  * cast(n * syy - sy * sy as double)) AS rxy,
         (n * sxz - sx * sz)
           / sqrt(cast(n * sxx - sx * sx as double)
                  * cast(n * szz - sz * sz as double)) AS rxz,
         (n * syz - sy * sz)
           / sqrt(cast(n * syy - sy * sy as double)
                  * cast(n * szz - sz * sz as double)) AS ryz
  FROM s
)
SELECT n,
       round(rxy, 6) + 0.0 AS r_xy,
       round((rxy - rxz * ryz)
             / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6) + 0.0
         AS r_xy_given_z
FROM r
"""


@query("q_partial_corr", oracle=_PARTIAL_ORACLE)
def q_partial_corr(spark, sf_dir):
    """Partial correlation of daily clicks and purchases CONTROLLING
    for daily views: r_xy.z = (r_xy - r_xz*r_yz) /
    sqrt((1-r_xz^2)(1-r_yz^2)) — the confound check that separates 'do
    clicks drive purchases' from 'busy days have more of everything',
    the first-order version of what q_iv_wald/q_diff_in_diff answer
    with designs.

    Exactness: all ten sufficient statistics are exact bigints; the
    three pairwise correlations and the partial are scalar double
    combinations with identical operand order on both engines.

    Scale: one calendar-bounded pivot, one 10-sum reduce."""
    e = load_table(spark, sf_dir, "events")
    cnt = lambda et: F.sum(F.when(F.col("event_type") == et, 1)  # noqa: E731
                           .otherwise(0)).cast("long")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(cnt("click").alias("x"), cnt("purchase").alias("y"),
                  cnt("view").alias("z")))
    s = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("long").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("long").alias("syz"))

    def corr(sab, sa, sb, saa, sbb):
        return ((F.col("n") * F.col(sab) - F.col(sa) * F.col(sb))
                / F.sqrt((F.col("n") * F.col(saa)
                          - F.col(sa) * F.col(sa)).cast("double")
                         * (F.col("n") * F.col(sbb)
                            - F.col(sb) * F.col(sb)).cast("double")))

    rxy = corr("sxy", "sx", "sy", "sxx", "syy")
    rxz = corr("sxz", "sx", "sz", "sxx", "szz")
    ryz = corr("syz", "sy", "sz", "syy", "szz")
    return s.select(
        "n",
        (F.round(rxy, 6) + 0.0).alias("r_xy"),
        (F.round((rxy - rxz * ryz)
                 / F.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
         + 0.0).alias("r_xy_given_z"))


# ---------------------------------------------------------------------------
# q_chisq_residuals — adjusted Pearson residuals + Cramer's V
# ---------------------------------------------------------------------------

_CHISQ_RES_ORACLE = """
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
  SELECT event_type, dow, o, rt, ct, n,
         cast(round(pow(cast(o * n - rt * ct as double), 2)
                    / (cast(n as double) * rt * ct * n), 6)
              as decimal(18,6)) AS term
  FROM margins
),
dims AS (
  SELECT cast(count(DISTINCT event_type) as bigint) AS nr,
         cast(count(DISTINCT dow) as bigint) AS nc
  FROM obs
)
SELECT event_type, dow, o AS observed,
       round((o - cast(rt as double) * ct / n)
             / sqrt(cast(rt as double) * ct / n
                    * (1.0 - cast(rt as double) / n)
                    * (1.0 - cast(ct as double) / n)), 4) + 0.0
         AS adj_residual,
       round(sqrt(cast(sum(term) OVER () as double)
                  / (cast(n as double)
                     * least(nr - 1, nc - 1))), 6) + 0.0 AS cramers_v
FROM terms CROSS JOIN dims
ORDER BY event_type, dow
"""


@query("q_chisq_residuals", oracle=_CHISQ_RES_ORACLE)
def q_chisq_residuals(spark, sf_dir):
    """Cell-level diagnosis of the q_chisq_independence table: the
    ADJUSTED Pearson residual (o-e)/sqrt(e(1-rt/n)(1-ct/n)) per
    (event_type, day-of-week) cell — approximately N(0,1) under
    independence, so |r| > 2 points at exactly WHICH cells drive the
    dependence — plus Cramer's V as the bounded effect size the raw
    chi2 lacks. The drill-down every 'chi2 says significant' readout
    needs next.

    Exactness: margins are exact bigints; each residual is one scalar
    double expression; V reuses the chi2 decimal-summed terms (order-
    free) and one sqrt. Sign-of-zero guarded — balanced cells sit at
    residual ~ 0 exactly where -0.0 lives.

    Scale: identical plan to q_chisq_independence (one cell rollup,
    margin windows over the |cells| relation)."""
    e = load_table(spark, sf_dir, "events")
    obs = (e.groupBy("event_type",
                     (F.datediff(F.col("ts").cast("date"),
                                 F.lit("1970-01-01").cast("date")) % 7)
                     .alias("dow"))
           .agg(F.count("*").alias("o")))
    margins = obs.select(
        "event_type", "dow", "o",
        F.sum("o").over(W.partitionBy("event_type")).cast("long")
        .alias("rt"),
        F.sum("o").over(W.partitionBy("dow")).cast("long").alias("ct"),
        F.sum("o").over(W.partitionBy()).cast("long").alias("n"))
    term = F.round(
        F.pow((F.col("o") * F.col("n")
               - F.col("rt") * F.col("ct")).cast("double"), 2)
        / (F.col("n").cast("double") * F.col("rt") * F.col("ct")
           * F.col("n")), 6).cast("decimal(18,6)")
    terms = margins.withColumn("term", term)
    dims = obs.agg(
        F.count_distinct("event_type").cast("long").alias("nr"),
        F.count_distinct("dow").cast("long").alias("nc"))
    ed = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    adj = ((F.col("o") - ed)
           / F.sqrt(ed * (1.0 - F.col("rt").cast("double") / F.col("n"))
                    * (1.0 - F.col("ct").cast("double") / F.col("n"))))
    v = F.sqrt(F.sum("term").over(W.partitionBy()).cast("double")
               / (F.col("n").cast("double")
                  * F.least(F.col("nr") - 1, F.col("nc") - 1)))
    return (terms.crossJoin(F.broadcast(dims))
            .select("event_type", "dow", F.col("o").alias("observed"),
                    (F.round(adj, 4) + 0.0).alias("adj_residual"),
                    (F.round(v, 6) + 0.0).alias("cramers_v"))
            .orderBy("event_type", "dow"))


# ---------------------------------------------------------------------------
# q_effect_size — Cohen's d / Hedges' g standardized mean difference
# ---------------------------------------------------------------------------

_EFFECT_ORACLE = """
WITH x AS (
  SELECT event_type,
         cast(cast(round(value, 3) * 1000 as decimal(7,0)) as bigint)
           AS xi
  FROM events WHERE event_type IN ('click', 'purchase')
),
g AS (
  SELECT event_type,
         cast(count(*) as bigint) AS n,
         cast(sum(xi) as bigint) AS s1,
         cast(sum(xi * xi) as bigint) AS s2
  FROM x GROUP BY event_type
),
p AS (
  SELECT max(CASE WHEN event_type = 'click' THEN n END) AS n1,
         max(CASE WHEN event_type = 'click' THEN s1 END) AS sa1,
         max(CASE WHEN event_type = 'click' THEN s2 END) AS sa2,
         max(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
         max(CASE WHEN event_type = 'purchase' THEN s1 END) AS sb1,
         max(CASE WHEN event_type = 'purchase' THEN s2 END) AS sb2
  FROM g
),
c AS (
  SELECT n1, n2,
         cast(sa1 as double) / n1 - cast(sb1 as double) / n2 AS md,
         sqrt(((cast(sa2 as double) - cast(sa1 as double) * sa1 / n1)
               + (cast(sb2 as double) - cast(sb1 as double) * sb1 / n2))
              / (n1 + n2 - 2)) AS sp
  FROM p
)
SELECT n1, n2,
       round(md / sp, 6) + 0.0 AS cohens_d,
       round((md / sp)
             * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) + 0.0
         AS hedges_g
FROM c
"""


@query("q_effect_size", oracle=_EFFECT_ORACLE)
def q_effect_size(spark, sf_dir):
    """Standardized mean difference between click and purchase values:
    Cohen's d over the pooled SD, plus Hedges' g (the small-sample
    bias correction 1 - 3/(4N-9)) — the effect-size companion that
    turns q_welch_ttest's 'is it significant' into 'does it matter'.
    Scale-free, so the milli-unit keying cancels.

    Exactness: the same five exact bigint sufficient statistics as
    q_welch_ttest; pooled SD, d, and g are scalar double
    combinations, rounded 6dp with the sign-of-zero guard.

    Scale: one filtered map-side-combined groupBy, a 2-row pivot,
    scalar math."""
    e = load_table(spark, sf_dir, "events")
    x = (e.filter(F.col("event_type").isin("click", "purchase"))
         .select("event_type",
                 (F.round("value", 3) * 1000).cast("decimal(7,0)")
                 .cast("long").alias("xi")))
    g = (x.groupBy("event_type")
         .agg(F.count("*").cast("long").alias("n"),
              F.sum("xi").cast("long").alias("s1"),
              F.sum(F.col("xi") * F.col("xi")).cast("long").alias("s2")))
    pick = lambda et, c: F.max(F.when(F.col("event_type") == et,  # noqa: E731
                                      F.col(c)))
    p = g.agg(pick("click", "n").alias("n1"),
              pick("click", "s1").alias("sa1"),
              pick("click", "s2").alias("sa2"),
              pick("purchase", "n").alias("n2"),
              pick("purchase", "s1").alias("sb1"),
              pick("purchase", "s2").alias("sb2"))
    md = (F.col("sa1").cast("double") / F.col("n1")
          - F.col("sb1").cast("double") / F.col("n2"))
    sp = F.sqrt(((F.col("sa2").cast("double")
                  - F.col("sa1").cast("double") * F.col("sa1")
                  / F.col("n1"))
                 + (F.col("sb2").cast("double")
                    - F.col("sb1").cast("double") * F.col("sb1")
                    / F.col("n2")))
                / (F.col("n1") + F.col("n2") - 2))
    d_ = md / sp
    corr = 1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n2")) - 9.0)
    return p.select("n1", "n2",
                    (F.round(d_, 6) + 0.0).alias("cohens_d"),
                    (F.round(d_ * corr, 6) + 0.0).alias("hedges_g"))


# ---------------------------------------------------------------------------
# q_inequality_indices — Theil T, HHI, top-share concentration
# ---------------------------------------------------------------------------

_INEQ_ORACLE = """
WITH per AS (
  SELECT source, cast(count(*) as bigint) AS c
  FROM documents GROUP BY source
),
tot AS (
  SELECT cast(sum(c) as bigint) AS n,
         cast(count(*) as bigint) AS k,
         cast(max(c) as bigint) AS cmax,
         cast(sum(c * c) as bigint) AS c2
  FROM per
),
terms AS (
  SELECT cast(round(cast(per.c as double) / tot.n
                    * ln(cast(per.c as double) * tot.k / tot.n), 9)
              as decimal(30,12)) AS theil_t
  FROM per CROSS JOIN tot
)
SELECT (SELECT k FROM tot) AS k,
       round(cast(sum(theil_t) as double), 6) + 0.0 AS theil,
       round((SELECT cast(c2 as double) / (cast(n as double) * n)
              FROM tot), 6) + 0.0 AS hhi,
       round((SELECT cast(cmax as double) / n FROM tot), 6) + 0.0
         AS top_share
FROM terms
"""


@query("q_inequality_indices", oracle=_INEQ_ORACLE)
def q_inequality_indices(spark, sf_dir):
    """Source-concentration indices over the corpus: Theil T entropy
    index (0 = perfectly even, ln k = one source owns everything),
    Herfindahl-Hirschman index (sum of squared shares), and the
    single largest source share — the contributor-skew audit beside
    q_gini_concentration (Lorenz form) that data-mix planning
    (q_domain_mix / q_mixture_temperature) consumes.

    Exactness: counts and the HHI numerator are exact bigints (HHI =
    sum(c^2)/n^2 — one division); Theil's per-source c/N*ln(c*k/N)
    terms are rounded 9dp and decimal-summed so the k-term reduction
    is order-free.

    Scale: one groupBy(source) to a |domains|-row relation; all
    indices reduce that."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count("*").cast("long").alias("c"))
    tot = per.agg(F.sum("c").cast("long").alias("n"),
                  F.count("*").cast("long").alias("k"),
                  F.max("c").cast("long").alias("cmax"),
                  F.sum(F.col("c") * F.col("c")).cast("long").alias("c2"))
    j = per.crossJoin(F.broadcast(tot))
    theil_t = F.round(
        F.col("c").cast("double") / F.col("n")
        * F.log(F.col("c").cast("double") * F.col("k") / F.col("n")),
        9).cast("decimal(30,12)")
    terms = j.select("k", "n", "c2", "cmax", theil_t.alias("theil_t"))
    return (terms.groupBy("k", "n", "c2", "cmax")
            .agg(F.sum("theil_t").cast("decimal(30,12)").alias("tt"))
            .select("k",
                    (F.round(F.col("tt").cast("double"), 6) + 0.0)
                    .alias("theil"),
                    (F.round(F.col("c2").cast("double")
                             / (F.col("n").cast("double") * F.col("n")),
                             6) + 0.0).alias("hhi"),
                    (F.round(F.col("cmax").cast("double") / F.col("n"),
                             6) + 0.0).alias("top_share")))


# ---------------------------------------------------------------------------
# q_tost_equivalence — two one-sided tests (equivalence testing)
# ---------------------------------------------------------------------------

_TOST_DELTA_MILLI = 2000  # equivalence margin: ±2.0 value units


@query(
    "q_tost_equivalence",
    oracle=f"""
    WITH x AS (
      SELECT event_type,
             cast(cast(round(value, 3) * 1000 as decimal(7,0)) as bigint)
               AS xi
      FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (
      SELECT event_type,
             cast(count(*) as bigint) AS n,
             cast(sum(xi) as bigint) AS s1,
             cast(sum(xi * xi) as bigint) AS s2
      FROM x GROUP BY event_type
    ),
    p AS (
      SELECT max(CASE WHEN event_type = 'click' THEN n END) AS n1,
             max(CASE WHEN event_type = 'click' THEN s1 END) AS sa1,
             max(CASE WHEN event_type = 'click' THEN s2 END) AS sa2,
             max(CASE WHEN event_type = 'view' THEN n END) AS n2,
             max(CASE WHEN event_type = 'view' THEN s1 END) AS sb1,
             max(CASE WHEN event_type = 'view' THEN s2 END) AS sb2
      FROM g
    ),
    c AS (
      SELECT n1, n2,
             cast(sa1 as double) / n1 - cast(sb1 as double) / n2 AS md,
             sqrt(((cast(sa2 as double) - cast(sa1 as double) * sa1 / n1)
                   / (n1 - 1)) / n1
                  + ((cast(sb2 as double) - cast(sb1 as double) * sb1 / n2)
                     / (n2 - 1)) / n2) AS se
      FROM p
    )
    SELECT n1, n2,
           round(md / 1000.0, 4) + 0.0 AS mean_diff,
           round((md + {_TOST_DELTA_MILLI}) / se, 4) + 0.0 AS t_lower,
           round(({_TOST_DELTA_MILLI} - md) / se, 4) + 0.0 AS t_upper,
           CASE WHEN (md + {_TOST_DELTA_MILLI}) / se > 1.6449
                 AND ({_TOST_DELTA_MILLI} - md) / se > 1.6449
                THEN 1 ELSE 0 END AS equivalent
    FROM c
    """,
)
def q_tost_equivalence(spark, sf_dir):
    """TOST equivalence test (Schuirmann's two one-sided tests) between
    click and view mean values with margin ±2.0 — the procedure A/B
    platforms run to declare two variants EQUIVALENT, which a plain
    t-test can never do (failing to reject H0 is not evidence of
    equality). Both one-sided statistics share q_welch_ttest's exact
    milli-unit sufficient statistics; equivalence holds iff BOTH
    t_lower = (d+δ)/se and t_upper = (δ-d)/se clear the one-sided
    normal critical value 1.6449 (df is in the thousands here, where
    t ≈ z). The decision column is computed from the unrounded
    statistics — bit-identical across engines because every operand
    and operation order matches.

    Scale: one filtered scan into five exact bigint sufficient
    statistics (map-side combined), then scalar math — the same
    100 TB shape as every sufficient-statistics test in this module."""
    e = load_table(spark, sf_dir, "events")
    x = (e.filter(F.col("event_type").isin("click", "view"))
         .select("event_type",
                 F.round(F.col("value"), 3).cast("decimal(7,3)")
                 .cast("double").alias("v")))
    x = x.select("event_type",
                 (F.col("v") * 1000).cast("decimal(7,0)").cast("bigint")
                 .alias("xi"))
    g = (x.groupBy("event_type")
         .agg(F.count("*").cast("long").alias("n"),
              F.sum("xi").cast("long").alias("s1"),
              F.sum(F.col("xi") * F.col("xi")).cast("long").alias("s2")))
    p = g.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("n")))
        .alias("n1"),
        F.max(F.when(F.col("event_type") == "click", F.col("s1")))
        .alias("sa1"),
        F.max(F.when(F.col("event_type") == "click", F.col("s2")))
        .alias("sa2"),
        F.max(F.when(F.col("event_type") == "view", F.col("n")))
        .alias("n2"),
        F.max(F.when(F.col("event_type") == "view", F.col("s1")))
        .alias("sb1"),
        F.max(F.when(F.col("event_type") == "view", F.col("s2")))
        .alias("sb2"))
    md = (F.col("sa1").cast("double") / F.col("n1")
          - F.col("sb1").cast("double") / F.col("n2"))
    se = F.sqrt(
        ((F.col("sa2").cast("double")
          - F.col("sa1").cast("double") * F.col("sa1") / F.col("n1"))
         / (F.col("n1") - 1)) / F.col("n1")
        + ((F.col("sb2").cast("double")
            - F.col("sb1").cast("double") * F.col("sb1") / F.col("n2"))
           / (F.col("n2") - 1)) / F.col("n2"))
    d = float(_TOST_DELTA_MILLI)
    return p.select(
        "n1", "n2",
        (F.round(md / 1000.0, 4) + 0.0).alias("mean_diff"),
        (F.round((md + d) / se, 4) + 0.0).alias("t_lower"),
        (F.round((d - md) / se, 4) + 0.0).alias("t_upper"),
        F.when(((md + d) / se > 1.6449) & ((d - md) / se > 1.6449), 1)
        .otherwise(0).alias("equivalent"))


# ---------------------------------------------------------------------------
# q_sprt — Wald's sequential probability ratio test
# ---------------------------------------------------------------------------

# H0: p = 0.4 vs H1: p = 0.6 on x = (value > 10); alpha = beta = 0.05
# -> log bounds ln(19) and -ln(19); per-observation increments
# ln(p1/p0) and ln(q1/q0) are the only floats, applied to exact counts.
_SPRT_LO, _SPRT_HI = "(-ln(19.0))", "ln(19.0)"
_SPRT_INC1, _SPRT_INC0 = "ln(0.6 / 0.4)", "ln(0.4 / 0.6)"


@query(
    "q_sprt",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, ts, event_id,
             CASE WHEN value > 10 THEN 1 ELSE 0 END AS x
      FROM events
    ),
    walk AS (
      SELECT event_type,
             row_number() OVER w AS n,
             sum(x) OVER w AS k
      FROM obs
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    crossed AS (
      SELECT event_type, n, k,
             k * {_SPRT_INC1} + (n - k) * {_SPRT_INC0} AS llr
      FROM walk
    ),
    hits AS (
      SELECT event_type, n, k, llr,
             CASE WHEN llr >= {_SPRT_HI} THEN 'accept_h1'
                  WHEN llr <= {_SPRT_LO} THEN 'accept_h0' END AS decision,
             row_number() OVER (PARTITION BY event_type ORDER BY n)
               AS rn
      FROM crossed
      WHERE llr >= {_SPRT_HI} OR llr <= {_SPRT_LO}
    )
    SELECT event_type, decision,
           cast(n as bigint) AS n_at_decision,
           cast(k as bigint) AS successes,
           round(llr, 4) + 0.0 AS llr
    FROM hits WHERE rn = 1 ORDER BY event_type
    """,
)
def q_sprt(spark, sf_dir):
    """Wald's SPRT — the sequential test streaming experimentation
    platforms run instead of fixed-horizon t-tests: per event_type the
    observations arrive in (ts, event_id) order, the log-likelihood
    ratio for H1: p=0.6 vs H0: p=0.4 on x = (value > 10) accumulates,
    and the test STOPS at the first crossing of ±ln((1-β)/α) = ±ln 19
    (α = β = 0.05). The walk is LLR(n) = k·ln(p1/p0) + (n-k)·ln(q1/q0)
    with (n, k) exact window counts, so each LLR is two float
    multiplies of exact integers in identical operand order — the
    crossing row is deterministic across engines, and the first-
    crossing argmin is an exact row_number over n.

    Scale: one shuffle on event_type for the ordered window, then a
    filtered argmin on the same key — the sequential semantics cost
    nothing extra; at 100 TB the partition key is the experiment id
    and each arm's walk stays within its partition."""
    e = load_table(spark, sf_dir, "events")
    wseq = (W.partitionBy("event_type").orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    walk = e.select(
        "event_type",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("n"),
        F.sum(F.when(F.col("value") > 10, 1).otherwise(0)).over(wseq)
        .alias("k"))
    inc1, inc0 = F.expr(_SPRT_INC1), F.expr(_SPRT_INC0)
    hi, lo = F.expr(_SPRT_HI), F.expr(_SPRT_LO)
    crossed = walk.select(
        "event_type", "n", "k",
        (F.col("k") * inc1 + (F.col("n") - F.col("k")) * inc0)
        .alias("llr"))
    hits = (crossed.filter((F.col("llr") >= hi) | (F.col("llr") <= lo))
            .withColumn("decision",
                        F.when(F.col("llr") >= hi, "accept_h1")
                        .otherwise("accept_h0"))
            .withColumn("rn", F.row_number().over(
                W.partitionBy("event_type").orderBy("n"))))
    return (hits.filter(F.col("rn") == 1)
            .select("event_type", "decision",
                    F.col("n").cast("long").alias("n_at_decision"),
                    F.col("k").cast("long").alias("successes"),
                    (F.round("llr", 4) + 0.0).alias("llr"))
            .orderBy("event_type"))
