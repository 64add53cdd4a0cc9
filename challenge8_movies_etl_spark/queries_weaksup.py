"""Weak supervision (round 5) — labeling-function aggregation in the
Snorkel style (Ratner et al., VLDB'18): three deterministic labeling
functions vote {1, 0, abstain} per document, a majority vote (ties →
abstain) produces the programmatic label, and the query emits the
diagnostics a label-model practitioner actually reads: per-LF
coverage/polarity balance and pairwise agreement/conflict on jointly
labeled docs. This is the data-labeling pass of a training pipeline —
it runs over the full corpus, so it must be one scan + one aggregate.

LFs here are lexicon-count comparisons (operators/text.lexicon_count
and its SQL twin), so both engines compute identical votes and the
WHOLE diagnostic table is value-hash-checked.

Scale: every LF and the vote are per-row codegen expressions; the
summary is ONE map-side-combined aggregate over constants — no join,
no shuffle beyond the final 7-row reduction. Adding LFs is adding
columns, not passes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.text import lexicon_count, lexicon_count_sql
from .registry import query
from .sources.fixtures import load_table

_LF1_POS = ("query", "filter", "join", "group", "window")
_LF1_NEG = ("scan", "table", "batch", "merge")
_LF2_POS = ("stream", "row", "value")
_LF2_NEG = ("sort", "hash", "key")
_LF3_POS = ("fast", "small")
_LF3_NEG = ("slow", "big")


def _lf_sql(pos, neg, expr="text"):
    p = lexicon_count_sql(expr, pos)
    n = lexicon_count_sql(expr, neg)
    return (f"CASE WHEN {p} > {n} THEN 1 "
            f"WHEN {n} > {p} THEN 0 ELSE -1 END")


_WS_ORACLE = f"""
WITH votes AS (
  SELECT doc_id,
         {_lf_sql(_LF1_POS, _LF1_NEG)} AS lf1,
         {_lf_sql(_LF2_POS, _LF2_NEG)} AS lf2,
         {_lf_sql(_LF3_POS, _LF3_NEG)} AS lf3
  FROM documents
),
voted AS (
  SELECT doc_id, lf1, lf2, lf3,
         (CASE WHEN lf1 = 1 THEN 1 ELSE 0 END
          + CASE WHEN lf2 = 1 THEN 1 ELSE 0 END
          + CASE WHEN lf3 = 1 THEN 1 ELSE 0 END) AS ones,
         (CASE WHEN lf1 = 0 THEN 1 ELSE 0 END
          + CASE WHEN lf2 = 0 THEN 1 ELSE 0 END
          + CASE WHEN lf3 = 0 THEN 1 ELSE 0 END) AS zeros
  FROM votes
),
labeled AS (
  SELECT *,
         CASE WHEN ones > zeros THEN 1
              WHEN zeros > ones THEN 0 ELSE -1 END AS label
  FROM voted
),
tot AS (SELECT cast(count(*) as bigint) AS n FROM labeled)
SELECT 'lf1' AS name,
       cast(sum(CASE WHEN lf1 = 1 THEN 1 ELSE 0 END) as bigint) AS n_pos,
       cast(sum(CASE WHEN lf1 = 0 THEN 1 ELSE 0 END) as bigint) AS n_neg,
       cast(sum(CASE WHEN lf1 = -1 THEN 1 ELSE 0 END) as bigint)
         AS n_abstain,
       round(cast(sum(CASE WHEN lf1 <> -1 THEN 1 ELSE 0 END) as double)
             / (SELECT n FROM tot), 4) AS rate
FROM labeled
UNION ALL
SELECT 'lf2',
       cast(sum(CASE WHEN lf2 = 1 THEN 1 ELSE 0 END) as bigint),
       cast(sum(CASE WHEN lf2 = 0 THEN 1 ELSE 0 END) as bigint),
       cast(sum(CASE WHEN lf2 = -1 THEN 1 ELSE 0 END) as bigint),
       round(cast(sum(CASE WHEN lf2 <> -1 THEN 1 ELSE 0 END) as double)
             / (SELECT n FROM tot), 4)
FROM labeled
UNION ALL
SELECT 'lf3',
       cast(sum(CASE WHEN lf3 = 1 THEN 1 ELSE 0 END) as bigint),
       cast(sum(CASE WHEN lf3 = 0 THEN 1 ELSE 0 END) as bigint),
       cast(sum(CASE WHEN lf3 = -1 THEN 1 ELSE 0 END) as bigint),
       round(cast(sum(CASE WHEN lf3 <> -1 THEN 1 ELSE 0 END) as double)
             / (SELECT n FROM tot), 4)
FROM labeled
UNION ALL
SELECT 'vote',
       cast(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) as bigint),
       cast(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) as bigint),
       cast(sum(CASE WHEN label = -1 THEN 1 ELSE 0 END) as bigint),
       round(cast(sum(CASE WHEN label <> -1 THEN 1 ELSE 0 END) as double)
             / (SELECT n FROM tot), 4)
FROM labeled
UNION ALL
SELECT 'agree_12',
       cast(sum(CASE WHEN lf1 = lf2 AND lf1 <> -1 THEN 1 ELSE 0 END)
            as bigint),
       cast(sum(CASE WHEN lf1 <> lf2 AND lf1 <> -1 AND lf2 <> -1
                THEN 1 ELSE 0 END) as bigint),
       cast(sum(CASE WHEN lf1 <> -1 AND lf2 <> -1 THEN 1 ELSE 0 END)
            as bigint),
       round(cast(sum(CASE WHEN lf1 = lf2 AND lf1 <> -1 THEN 1 ELSE 0 END)
                  as double)
             / greatest(1, sum(CASE WHEN lf1 <> -1 AND lf2 <> -1
                               THEN 1 ELSE 0 END)), 4)
FROM labeled
UNION ALL
SELECT 'agree_13',
       cast(sum(CASE WHEN lf1 = lf3 AND lf1 <> -1 THEN 1 ELSE 0 END)
            as bigint),
       cast(sum(CASE WHEN lf1 <> lf3 AND lf1 <> -1 AND lf3 <> -1
                THEN 1 ELSE 0 END) as bigint),
       cast(sum(CASE WHEN lf1 <> -1 AND lf3 <> -1 THEN 1 ELSE 0 END)
            as bigint),
       round(cast(sum(CASE WHEN lf1 = lf3 AND lf1 <> -1 THEN 1 ELSE 0 END)
                  as double)
             / greatest(1, sum(CASE WHEN lf1 <> -1 AND lf3 <> -1
                               THEN 1 ELSE 0 END)), 4)
FROM labeled
UNION ALL
SELECT 'agree_23',
       cast(sum(CASE WHEN lf2 = lf3 AND lf2 <> -1 THEN 1 ELSE 0 END)
            as bigint),
       cast(sum(CASE WHEN lf2 <> lf3 AND lf2 <> -1 AND lf3 <> -1
                THEN 1 ELSE 0 END) as bigint),
       cast(sum(CASE WHEN lf2 <> -1 AND lf3 <> -1 THEN 1 ELSE 0 END)
            as bigint),
       round(cast(sum(CASE WHEN lf2 = lf3 AND lf2 <> -1 THEN 1 ELSE 0 END)
                  as double)
             / greatest(1, sum(CASE WHEN lf2 <> -1 AND lf3 <> -1
                               THEN 1 ELSE 0 END)), 4)
FROM labeled
"""


def _lf_col(pos, neg):
    p = lexicon_count(F.col("text"), pos)
    n = lexicon_count(F.col("text"), neg)
    return (F.when(p > n, 1).when(n > p, 0).otherwise(-1))


@query("q_weak_supervision", oracle=_WS_ORACLE)
def q_weak_supervision(spark, sf_dir):
    """Labeling-function aggregation diagnostics (module docstring):
    rows lf1/lf2/lf3/vote carry (n_pos, n_neg, n_abstain, coverage);
    rows agree_ij carry (n_agree, n_conflict, n_jointly_voted,
    agreement_rate) in the same columns — the grid that tells a
    practitioner which LF to fix before training on the votes."""
    d = load_table(spark, sf_dir, "documents")
    v = d.select(
        _lf_col(_LF1_POS, _LF1_NEG).alias("lf1"),
        _lf_col(_LF2_POS, _LF2_NEG).alias("lf2"),
        _lf_col(_LF3_POS, _LF3_NEG).alias("lf3"))
    ones = sum(F.when(F.col(c) == 1, 1).otherwise(0)
               for c in ("lf1", "lf2", "lf3"))
    zeros = sum(F.when(F.col(c) == 0, 1).otherwise(0)
                for c in ("lf1", "lf2", "lf3"))
    # ONE aggregation pass (optimization round r12, §1.2/§2.3): the
    # union-of-7-aggregates shape scanned the labeled relation 7 times
    # (which is why it was persisted — a leak VERDICT r11 flagged);
    # every output row is a set of conditional sums over the same rows,
    # so compute all 28 terms in one agg and explode the single row
    # into the 7-row grid. No persist needed at all.
    lab = v.withColumn("label",
                       F.when(ones > zeros, 1)
                       .when(zeros > ones, 0).otherwise(-1))
    n = F.count("*")

    def summary(name, col):
        c = F.col(col)
        return (name,
                F.sum(F.when(c == 1, 1).otherwise(0)).cast("bigint"),
                F.sum(F.when(c == 0, 1).otherwise(0)).cast("bigint"),
                F.sum(F.when(c == -1, 1).otherwise(0)).cast("bigint"),
                F.round(F.sum(F.when(c != -1, 1).otherwise(0))
                        .cast("double") / n, 4))

    def agreement(name, a, b):
        ca, cb = F.col(a), F.col(b)
        joint = F.sum(F.when((ca != -1) & (cb != -1), 1).otherwise(0))
        agree = F.sum(F.when((ca == cb) & (ca != -1), 1).otherwise(0))
        conflict = F.sum(F.when((ca != cb) & (ca != -1) & (cb != -1),
                                1).otherwise(0))
        return (name,
                agree.cast("bigint"),
                conflict.cast("bigint"),
                joint.cast("bigint"),
                F.round(agree.cast("double")
                        / F.greatest(F.lit(1), joint), 4))

    parts = [summary("lf1", "lf1"), summary("lf2", "lf2"),
             summary("lf3", "lf3"), summary("vote", "label"),
             agreement("agree_12", "lf1", "lf2"),
             agreement("agree_13", "lf1", "lf3"),
             agreement("agree_23", "lf2", "lf3")]
    row = lab.agg(*[e.alias(f"x{i}{j}")
                    for i, p in enumerate(parts)
                    for j, e in enumerate(p[1:])])
    return (row.select(F.explode(F.array(*[
        F.struct(F.lit(p[0]).alias("name"),
                 F.col(f"x{i}0").alias("n_pos"),
                 F.col(f"x{i}1").alias("n_neg"),
                 F.col(f"x{i}2").alias("n_abstain"),
                 F.col(f"x{i}3").alias("rate"))
        for i, p in enumerate(parts)])).alias("p")).select("p.*"))
