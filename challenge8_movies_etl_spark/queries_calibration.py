"""Model-calibration operators over the quality-classifier surface:
expected calibration error (ECE), split-conformal prediction
thresholds, and isotonic (PAV) calibration curves.

No reference analog — these are the eval-side companions a
training-data pipeline needs once it scores documents with a model
(q_quality_classifier): ECE tells you whether the scores are usable as
probabilities, the conformal threshold converts them into a coverage
guarantee for downstream filtering, and isotonic regression repairs a
miscalibrated scorer without retraining.

Synthesis discipline (FIXTURES.md / functions/synth.py): predictions
and labels are built from `event_id` with INTEGER-only arithmetic so
both engines construct bit-identical inputs; the only floats are
single deterministic IEEE divisions, and every reduction over doubles
goes through decimal (functions/hashsafe.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


from .registry import query
from .sources.fixtures import load_table

# p = (event_id % 1000) / 1000 — a deterministic "predicted probability";
# label = 1 iff an independent integer hash lands under p's numerator, so
# P(label=1 | p) ~ p with per-bin noise: realistic, nonzero ECE.
_P_NUM = "event_id % 1000"
_LABEL = f"CASE WHEN (event_id * 7919) % 1000 < {_P_NUM} THEN 1 ELSE 0 END"


@query(
    "q_calibration_ece",
    oracle=f"""
    WITH scored AS (
      SELECT ({_P_NUM}) // 100 AS bin,
             ({_P_NUM}) AS k,
             {_LABEL} AS label
      FROM events
    ),
    per_bin AS (
      SELECT bin, count(*) AS n, sum(k) AS sk, sum(label) AS sl,
             abs(1000 * sum(label) - sum(k)) AS d
      FROM scored GROUP BY bin
    )
    SELECT bin, cast(n as bigint) AS n_events,
           cast((2 * sk * 100000 + n) // (2 * n) as double) / 1e8
             AS confidence,
           cast((2 * sl * 100000000 + n) // (2 * n) as double) / 1e8
             AS accuracy,
           cast((2 * d * 100000 + n) // (2 * n) as double) / 1e8 AS gap,
           cast((2 * sum(d) OVER () * 100000 + sum(n) OVER ())
                // (2 * sum(n) OVER ()) as double) / 1e8 AS ece
    FROM per_bin
    ORDER BY bin
    """,
)
def q_calibration_ece(spark, sf_dir):
    """Expected calibration error in one pass: bin predictions into 10
    equal-width confidence bins (integer-derived bin id — no float
    boundary ambiguity), per-bin confidence vs empirical accuracy, and
    the n-weighted ECE as a whole-frame window aggregate.

    Scale: one shuffle on the 10-value bin key (map-side combine does
    almost all the work), then a 10-row window — the ECE of a 100 TB
    eval set costs exactly one aggregation pass. Every reported value
    is EXACT INTEGER arithmetic (VERDICT r9 item 3): p's numerator and
    the 0/1 labels are integers, so confidence = K/(1000n), accuracy =
    L/n, gap = |1000L-K|/(1000n) and the n-weighted ece =
    Σ|1000L-K| / (1000·N) are all rationals rounded at 8dp by integer
    half-away-from-zero division — no decimal sum, no double quotient,
    no half-boundary exposure on either engine."""
    e = load_table(spark, sf_dir, "events")
    num = F.col("event_id") % 1000
    scored = e.select(
        (num / F.lit(100)).cast("bigint").alias("bin"),
        num.alias("k"),
        F.when((F.col("event_id") * 7919) % 1000 < num, 1)
         .otherwise(0).alias("label"))
    per_bin = (scored.groupBy("bin")
               .agg(F.count("*").alias("n"),
                    F.sum("k").alias("sk"),
                    F.sum("label").alias("sl"))
               .withColumn("d", F.abs(1000 * F.col("sl") - F.col("sk"))))

    def r8(num_expr: str, den: str = "n") -> F.Column:
        return F.expr(
            f"cast((2 * {num_expr} + {den}) DIV (2 * {den})"
            f" as double) / 1e8")

    return (per_bin.select(
        "bin", F.col("n").cast("long").alias("n_events"),
        r8("sk * 100000").alias("confidence"),
        r8("sl * 100000000").alias("accuracy"),
        r8("d * 100000").alias("gap"),
        F.expr(
            "cast((2 * sum(d) over () * 100000 + sum(n) over ())"
            " DIV (2 * sum(n) over ()) as double) / 1e8").alias("ece"))
        .orderBy("bin"))


# nonconformity score: deterministic integer in [0, 100] from an
# independent multiplicative hash; calibration/test split 80/20 on
# event_id so both engines partition identically.
_SCORE = "abs(((event_id * 2654435761) % 201) - 100)"
_IS_CAL = "event_id % 5 < 4"


@query(
    "q_conformal_threshold",
    oracle=f"""
    WITH scored AS (
      SELECT event_type, {_SCORE} AS score, {_IS_CAL} AS is_cal
      FROM events
    ),
    cal_ranked AS (
      SELECT event_type, score,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY score) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n_cal
      FROM scored WHERE is_cal
    ),
    thresholds AS (
      SELECT event_type, n_cal, score AS threshold
      FROM cal_ranked
      WHERE rk = cast(ceil(0.9 * (n_cal + 1)) as bigint)
    )
    SELECT t.event_type, t.n_cal, count(*) AS n_test, t.threshold,
           round(cast(sum(CASE WHEN s.score <= t.threshold
                               THEN 1 ELSE 0 END) as double)
                 / count(*), 6) AS coverage
    FROM scored s JOIN thresholds t ON s.event_type = t.event_type
    WHERE NOT s.is_cal
    GROUP BY t.event_type, t.n_cal, t.threshold
    ORDER BY t.event_type
    """,
)
def q_conformal_threshold(spark, sf_dir):
    """Split-conformal prediction per group: the ceil(0.9·(n+1))-th
    smallest calibration nonconformity score becomes the group's
    threshold, then empirical coverage is measured on the held-out 20%.
    The rank-k VALUE is deterministic even under score ties (the sorted
    value sequence is unique), so no tie-break key is needed.

    Scale: one shuffle on event_type for the calibration ranking (a
    sort within each group's partition), then the tiny threshold table
    broadcasts back onto the test side — coverage is a plain
    aggregation. At 100 TB the order-statistic would swap to
    approx_percentile with a rank guarantee; the exact form here is
    the oracle-checkable baseline."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        "event_type",
        F.abs(((F.col("event_id") * F.lit(2654435761)) % 201) - 100)
         .alias("score"),
        (F.col("event_id") % 5 < 4).alias("is_cal"))
    cal = scored.filter("is_cal")
    w = Window.partitionBy("event_type")
    ranked = cal.select(
        "event_type", "score",
        F.row_number().over(w.orderBy("score")).alias("rk"),
        F.count("*").over(w).alias("n_cal"))
    thresholds = (ranked
                  .filter(F.col("rk") ==
                          F.ceil(0.9 * (F.col("n_cal") + 1))
                           .cast("bigint"))
                  .select("event_type", "n_cal",
                          F.col("score").alias("threshold")))
    test = scored.filter(~F.col("is_cal"))
    return (test.join(F.broadcast(thresholds), "event_type")
            .groupBy("event_type", "n_cal", "threshold")
            .agg(F.count("*").alias("n_test"),
                 F.round(F.sum(F.when(F.col("score") <= F.col("threshold"),
                                      1).otherwise(0)).cast("double")
                         / F.count("*"), 6).alias("coverage"))
            .select("event_type", "n_cal", "n_test", "threshold",
                    "coverage")
            .orderBy("event_type"))


def pav_blocks(y_sums, ns):
    """Pool-adjacent-violators block structure on pre-aggregated
    (sum(y), n) rows in x order. Returns (blocks, sizes): blocks is a
    list of [sum, n] pooled pairs (exact when inputs are ints ≤ 2^53),
    sizes the number of input rows pooled into each block. Merging is
    STRICT (left mean > right mean), so adjacent equal-mean blocks stay
    separate — which makes the first block exactly the shortest argmin
    prefix and the last block the shortest argmax suffix (the
    SQL-expressible identities q_isotonic_check pins)."""
    blocks: list[list[float]] = []
    sizes: list[int] = []
    for s, n in zip(y_sums, ns):
        blocks.append([float(s), int(n)])
        sizes.append(1)
        while len(blocks) > 1 and (blocks[-2][0] * blocks[-1][1]
                                   > blocks[-1][0] * blocks[-2][1]):
            s2, n2 = blocks.pop()
            k2 = sizes.pop()
            blocks[-1][0] += s2
            blocks[-1][1] += n2
            sizes[-1] += k2
    return blocks, sizes


def pav_fit(xs, y_sums, ns):
    """Pool-adjacent-violators on pre-aggregated (x, sum(y), n) rows
    (xs strictly increasing). Returns the isotonic fitted rate for each
    x. Pure python so the Spark UDF and the tests share one twin."""
    blocks, sizes = pav_blocks(y_sums, ns)
    out: list[float] = []
    for (s, n), k in zip(blocks, sizes):
        out.extend([s / n] * k)
    return out


@query("q_isotonic_pav")  # no SQL oracle: PAV's pooling loop is
# data-dependent and not SQL-expressible; correctness is pinned by
# tests/test_calibration.py (monotonicity, mass preservation, exact
# small-case fit) against the shared pure-python twin above.
def q_isotonic_pav(spark, sf_dir):
    """Isotonic calibration curve per event_type: PAV over the
    (score-bucket → empirical rate) profile. The heavy reduction —
    per-bucket label sums over the full corpus — is a plain Spark
    aggregation; PAV itself runs in applyInPandas on ≤100 pre-pooled
    rows per group (declared python surface, PLANS.md).

    Scale: the grouped UDF input is bounded by distinct(group) ×
    distinct(bucket), independent of corpus row count — at 100 TB the
    shuffle carries only the pre-aggregated profile, and each PAV call
    is microseconds."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    num = F.col("event_id") % 1000
    prof = (e.select("event_type",
                     (num / F.lit(100)).cast("bigint").alias("bucket"),
                     F.when((F.col("event_id") * 7919) % 1000 < num, 1)
                      .otherwise(0).alias("label"))
            .groupBy("event_type", "bucket")
            .agg(F.sum("label").alias("y_sum"),
                 F.count("*").alias("n")))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket").reset_index(drop=True)
        iso = pav_fit(pdf["bucket"].tolist(), pdf["y_sum"].tolist(),
                      pdf["n"].tolist())
        return pd.DataFrame({
            "event_type": pdf["event_type"],
            "bucket": pdf["bucket"],
            "n": pdf["n"],
            "raw_rate": [round(s / n, 6)
                         for s, n in zip(pdf["y_sum"], pdf["n"])],
            "iso_rate": [round(v, 6) for v in iso],
        })

    return (prof.groupBy("event_type")
            .applyInPandas(fit, "event_type string, bucket bigint, "
                                "n bigint, raw_rate double, "
                                "iso_rate double")
            .orderBy("event_type", "bucket"))


_ISO_CHECK_ORACLE = """
WITH prof AS (
  SELECT event_type,
         (event_id % 1000) // 100 AS bucket,
         cast(sum(CASE WHEN (event_id * 7919) % 1000 < event_id % 1000
                       THEN 1 ELSE 0 END) as bigint) AS y_sum,
         cast(count(*) as bigint) AS n
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT event_type,
         sum(y_sum) OVER w AS cy, sum(n) OVER w AS cn
  FROM prof WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
),
suf AS (
  SELECT event_type,
         sum(y_sum) OVER w AS sy, sum(n) OVER w AS sn
  FROM prof WINDOW w AS (PARTITION BY event_type ORDER BY bucket DESC)
),
firsts AS (
  SELECT event_type, cast(cy as bigint) AS iso_first_num,
         cast(cn as bigint) AS iso_first_den
  FROM pre
  QUALIFY row_number() OVER (PARTITION BY event_type
            ORDER BY cast(cy as double) / cn ASC, cn ASC) = 1
),
lasts AS (
  SELECT event_type, cast(sy as bigint) AS iso_last_num,
         cast(sn as bigint) AS iso_last_den
  FROM suf
  QUALIFY row_number() OVER (PARTITION BY event_type
            ORDER BY cast(sy as double) / sn DESC, sn ASC) = 1
),
stats AS (
  SELECT event_type, cast(count(*) as bigint) AS n_buckets,
         cast(sum(n) as bigint) AS n_total,
         cast(sum(y_sum) as bigint) AS y_total,
         cast(sum((bucket + 1) * (y_sum * 1000003 + n)) as bigint)
           AS profile_checksum
  FROM prof GROUP BY 1
)
SELECT stats.*, iso_first_num, iso_first_den, iso_last_num, iso_last_den
FROM stats
JOIN firsts USING (event_type)
JOIN lasts USING (event_type)
"""


@query("q_isotonic_check", oracle=_ISO_CHECK_ORACLE)
def q_isotonic_check(spark, sf_dir):
    """Hash-checked companion of q_isotonic_pav (the q_embed_pca_check
    pattern, VERDICT r5 item 4): PAV's pooling loop is not
    SQL-expressible, but its BOUNDARY blocks are — with strict merging
    the first PAV block is exactly the shortest prefix minimizing the
    prefix mean, and the last block the shortest suffix maximizing the
    suffix mean (every proper prefix of a pooled block has mean ≥ the
    block mean, so ties resolve to the shorter span on both engines).
    Emitting those blocks as exact (numerator, denominator) bigint
    pairs — no float rounding anywhere — lets DuckDB recompute them
    with window cumsums while Spark reads them off the ACTUAL python
    PAV block structure, converting the PAV surface from rows-only to
    hash-checked. A pooled-profile checksum additionally pins the
    (event_type, bucket, y_sum, n) input that feeds PAV.

    Scale: identical to q_isotonic_pav — the grouped-UDF input is the
    pre-aggregated profile (groups × ≤10 buckets), never corpus rows."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    num = F.col("event_id") % 1000
    prof = (e.select("event_type",
                     (num / F.lit(100)).cast("bigint").alias("bucket"),
                     F.when((F.col("event_id") * 7919) % 1000 < num, 1)
                      .otherwise(0).alias("label"))
            .groupBy("event_type", "bucket")
            .agg(F.sum("label").cast("long").alias("y_sum"),
                 F.count("*").cast("long").alias("n")))

    def boundary(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket").reset_index(drop=True)
        blocks, _ = pav_blocks(pdf["y_sum"].tolist(), pdf["n"].tolist())
        return pd.DataFrame({
            "event_type": [pdf["event_type"].iloc[0]],
            "iso_first_num": [int(round(blocks[0][0]))],
            "iso_first_den": [int(blocks[0][1])],
            "iso_last_num": [int(round(blocks[-1][0]))],
            "iso_last_den": [int(blocks[-1][1])],
        })

    fl = (prof.groupBy("event_type")
          .applyInPandas(boundary,
                         "event_type string, iso_first_num bigint, "
                         "iso_first_den bigint, iso_last_num bigint, "
                         "iso_last_den bigint"))
    stats = (prof.groupBy("event_type")
             .agg(F.count("*").cast("long").alias("n_buckets"),
                  F.sum("n").cast("long").alias("n_total"),
                  F.sum("y_sum").cast("long").alias("y_total"),
                  F.sum((F.col("bucket") + 1)
                        * (F.col("y_sum") * F.lit(1000003) + F.col("n")))
                  .cast("long").alias("profile_checksum")))
    return (stats.join(F.broadcast(fl), "event_type")
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# q_brier_murphy — Brier score with the Murphy decomposition
# ---------------------------------------------------------------------------

_BRIER_ORACLE = """
WITH scored AS (
  SELECT (event_id % 1000) // 100 AS bin,
         event_id % 1000 AS pm,
         CASE WHEN (event_id * 7919) % 1000 < event_id % 1000
              THEN 1 ELSE 0 END AS label
  FROM events
),
g AS (
  SELECT cast(count(*) as bigint) AS n,
         cast(sum((pm - 1000 * label) * (pm - 1000 * label)) as bigint)
           AS sq,
         cast(sum(label) as bigint) AS y1
  FROM scored
),
per_bin AS (
  SELECT bin,
         cast(count(*) as bigint) AS n_b,
         cast(sum(pm) as bigint) AS s1,
         cast(sum(label) as bigint) AS yb,
         cast(sum(pm * pm) as bigint) AS spp,
         cast(sum(pm * label) as bigint) AS spy
  FROM scored GROUP BY bin
),
res_parts AS (
  SELECT
    cast(round(cast((s1 - 1000 * yb) * (s1 - 1000 * yb) as double)
               / (cast(n_b as double) * 1000000), 8)
         as decimal(30,10)) AS rel_t,
    cast(round(cast(n_b as double)
               * (cast(yb as double) / n_b - cast(g.y1 as double) / g.n)
               * (cast(yb as double) / n_b - cast(g.y1 as double) / g.n),
               8) as decimal(30,10)) AS res_t,
    cast(round((cast(spp as double)
                - cast(s1 as double) * s1 / n_b) / 1000000, 8)
         as decimal(30,10)) AS wbv_t,
    cast(round((cast(spy as double)
                - cast(s1 as double) * yb / n_b) / 1000, 8)
         as decimal(30,10)) AS wbc_t
  FROM per_bin CROSS JOIN g
)
SELECT g.n,
       round(cast(g.sq as double) / (cast(g.n as double) * 1000000), 6)
         + 0.0 AS brier,
       round(cast(sum(rp.rel_t) as double) / g.n, 6) + 0.0
         AS reliability,
       round(cast(sum(rp.res_t) as double) / g.n, 6) + 0.0
         AS resolution,
       round(cast(g.y1 as double) / g.n
             * (1.0 - cast(g.y1 as double) / g.n), 6) + 0.0
         AS uncertainty,
       round(cast(sum(rp.wbv_t) as double) / g.n, 6) + 0.0 AS wb_var,
       round(cast(sum(rp.wbc_t) as double) / g.n, 6) + 0.0 AS wb_cov
FROM res_parts rp CROSS JOIN g
GROUP BY g.n, g.sq, g.y1
"""


@query("q_brier_murphy", oracle=_BRIER_ORACLE)
def q_brier_murphy(spark, sf_dir):
    """Brier score with the GENERALIZED Murphy decomposition over the
    same 10 confidence bins as q_calibration_ece: brier = reliability
    - resolution + uncertainty + wb_var - 2*wb_cov, where the last two
    are the within-bin variance/covariance terms that appear whenever
    continuous predictions are binned (the textbook three-term
    identity only holds for discrete forecasts — pinned exactly by a
    test here, not waved at). Reliability isolates mis-calibration,
    which recalibration (q_isotonic_pav) can fix; resolution isolates
    discrimination, which it cannot.

    Exactness: with milli-unit predictions pm and 0/1 labels, N*1e6 *
    brier = sum((pm - 1000*label)^2) is an exact bigint; each bin's
    reliability/resolution term is one double expression of exact
    integer sums, rounded 8dp and decimal-summed (10 bins), then
    scaled scalar-side. The decomposition identity is pinned by a
    test, not trusted.

    Scale: one pass for the global sums, one 10-bin groupBy — same
    cost envelope as q_calibration_ece."""
    e = load_table(spark, sf_dir, "events")
    num = F.col("event_id") % 1000
    scored = e.select(
        (num / F.lit(100)).cast("bigint").alias("bin"),
        num.cast("long").alias("pm"),
        F.when((F.col("event_id") * 7919) % 1000 < num, 1)
         .otherwise(0).alias("label"))
    g = scored.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("pm") - 1000 * F.col("label"))
              * (F.col("pm") - 1000 * F.col("label"))).cast("long")
        .alias("sq"),
        F.sum("label").cast("long").alias("y1"))
    per_bin = (scored.groupBy("bin")
               .agg(F.count("*").cast("long").alias("n_b"),
                    F.sum("pm").cast("long").alias("s1"),
                    F.sum("label").cast("long").alias("yb"),
                    F.sum(F.col("pm") * F.col("pm")).cast("long")
                    .alias("spp"),
                    F.sum(F.col("pm") * F.col("label")).cast("long")
                    .alias("spy")))
    joined = per_bin.crossJoin(F.broadcast(g))
    ybar = F.col("y1").cast("double") / F.col("n")
    rel_t = F.round(
        ((F.col("s1") - 1000 * F.col("yb"))
         * (F.col("s1") - 1000 * F.col("yb"))).cast("double")
        / (F.col("n_b").cast("double") * 1e6), 8).cast("decimal(30,10)")
    acc_b = F.col("yb").cast("double") / F.col("n_b")
    res_t = F.round(F.col("n_b").cast("double")
                    * (acc_b - ybar) * (acc_b - ybar), 8)\
        .cast("decimal(30,10)")
    wbv_t = F.round((F.col("spp").cast("double")
                     - F.col("s1").cast("double") * F.col("s1")
                     / F.col("n_b")) / 1e6, 8).cast("decimal(30,10)")
    wbc_t = F.round((F.col("spy").cast("double")
                     - F.col("s1").cast("double") * F.col("yb")
                     / F.col("n_b")) / 1e3, 8).cast("decimal(30,10)")
    s = (joined.select("n", "sq", "y1",
                       rel_t.alias("rel_t"), res_t.alias("res_t"),
                       wbv_t.alias("wbv_t"), wbc_t.alias("wbc_t"))
         .groupBy("n", "sq", "y1")
         .agg(F.sum("rel_t").cast("decimal(30,10)").alias("rel"),
              F.sum("res_t").cast("decimal(30,10)").alias("res"),
              F.sum("wbv_t").cast("decimal(30,10)").alias("wbv"),
              F.sum("wbc_t").cast("decimal(30,10)").alias("wbc")))
    nd = F.col("n").cast("double")
    yb_all = F.col("y1").cast("double") / nd
    return s.select(
        "n",
        (F.round(F.col("sq").cast("double") / (nd * 1e6), 6) + 0.0)
        .alias("brier"),
        (F.round(F.col("rel").cast("double") / nd, 6) + 0.0)
        .alias("reliability"),
        (F.round(F.col("res").cast("double") / nd, 6) + 0.0)
        .alias("resolution"),
        (F.round(yb_all * (1.0 - yb_all), 6) + 0.0).alias("uncertainty"),
        (F.round(F.col("wbv").cast("double") / nd, 6) + 0.0)
        .alias("wb_var"),
        (F.round(F.col("wbc").cast("double") / nd, 6) + 0.0)
        .alias("wb_cov"))


# ---------------------------------------------------------------------------
# q_label_noise — confident-joint label-noise estimate
# ---------------------------------------------------------------------------

_NOISE_ORACLE = """
WITH scored AS (
  SELECT event_id % 1000 AS pm,
         CASE WHEN (event_id * 7919) % 1000 < event_id % 1000
              THEN 1 ELSE 0 END AS label
  FROM events
),
th AS (
  SELECT
    cast(sum(CASE WHEN label = 1 THEN pm END) as bigint) AS s1,
    cast(count(*) FILTER (label = 1) as bigint) AS n1,
    cast(sum(CASE WHEN label = 0 THEN 1000 - pm END) as bigint) AS s0,
    cast(count(*) FILTER (label = 0) as bigint) AS n0
  FROM scored
),
cj AS (
  SELECT
    cast(count(*) FILTER (label = 1 AND pm * n1 >= s1) as bigint)
      AS c11,
    cast(count(*) FILTER (label = 0 AND pm * n1 >= s1) as bigint)
      AS c01,
    cast(count(*) FILTER (label = 0 AND (1000 - pm) * n0 >= s0)
         as bigint) AS c00,
    cast(count(*) FILTER (label = 1 AND (1000 - pm) * n0 >= s0)
         as bigint) AS c10
  FROM scored CROSS JOIN th
)
SELECT c00, c01, c10, c11,
       round(cast(c01 + c10 as double) / (c00 + c01 + c10 + c11), 6)
         + 0.0 AS noise_rate
FROM cj
"""


@query("q_label_noise", oracle=_NOISE_ORACLE)
def q_label_noise(spark, sf_dir):
    """Confident-joint label-noise estimate (the confident-learning
    construction): per class j, the confidence threshold t_j is the
    mean predicted probability of class j among examples LABELED j;
    C[i][j] counts examples labeled i whose class-j probability clears
    t_j — off-diagonal mass is the estimated label-noise rate, the
    signal that drives relabel-or-drop curation of a weakly-labeled
    corpus (q_weak_supervision builds such labels; this audits them).

    Exactness: with milli-unit probabilities, the threshold compare
    p_j >= t_j becomes the INTEGER inequality pm * n_j >= sum_pm_j
    (and (1000-pm) * n_0 >= s_0 for the negative class) — no division
    ever happens, so the confident joint is bit-exact on both engines;
    the noise rate is one rounded scalar division.

    Scale: one pass for thresholds, one for the joint (both map-side
    combinable); the 100 TB plan is two scans or one with a broadcast
    re-use of the threshold row."""
    e = load_table(spark, sf_dir, "events")
    num = F.col("event_id") % 1000
    scored = e.select(
        num.cast("long").alias("pm"),
        F.when((F.col("event_id") * 7919) % 1000 < num, 1)
         .otherwise(0).alias("label"))
    th = scored.agg(
        F.sum(F.when(F.col("label") == 1, F.col("pm"))).cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("label") == 0, 1000 - F.col("pm")))
        .cast("long").alias("s0"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).cast("long")
        .alias("n0"))
    j = scored.crossJoin(F.broadcast(th))
    conf1 = F.col("pm") * F.col("n1") >= F.col("s1")
    conf0 = (1000 - F.col("pm")) * F.col("n0") >= F.col("s0")
    cj = j.agg(
        F.sum(F.when((F.col("label") == 1) & conf1, 1).otherwise(0))
        .cast("long").alias("c11"),
        F.sum(F.when((F.col("label") == 0) & conf1, 1).otherwise(0))
        .cast("long").alias("c01"),
        F.sum(F.when((F.col("label") == 0) & conf0, 1).otherwise(0))
        .cast("long").alias("c00"),
        F.sum(F.when((F.col("label") == 1) & conf0, 1).otherwise(0))
        .cast("long").alias("c10"))
    total = (F.col("c00") + F.col("c01") + F.col("c10") + F.col("c11"))
    return cj.select(
        "c00", "c01", "c10", "c11",
        (F.round((F.col("c01") + F.col("c10")).cast("double") / total, 6)
         + 0.0).alias("noise_rate"))
