"""Exact duplicated-substring detection — the suffix-array dedup of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") re-expressed as a distributed k-gram pipeline.

The reference algorithm builds one giant suffix array and reports
every substring of >= k tokens that occurs twice anywhere in the
corpus.  A suffix array is inherently single-machine; the
shuffle-native equivalent used here observes that a duplicated run of
L >= k tokens is exactly a maximal chain of duplicated k-grams at
consecutive positions, so:

  1. explode every document into its word-level k-grams (k=8) with
     positions — one narrow generator, no shuffle;
  2. group by gram, keep grams seen in >= 2 distinct documents (the
     cross-document duplication predicate);
  3. semi-join positions back, then merge per-document position
     intervals [p, p+k-1] with the gaps-and-islands break test
     (pos - lag(pos) > k starts a new island) — the union of
     interval coverage is exact, overlapping grams are not
     double-counted.

Everything is integer arithmetic end-to-end, so the result value-hashes
identically on both engines.  Grams are md5-keyed on BOTH engines: at
100 TB the 16-byte digest (not the gram text) is what shuffles, and the
group-by + semi-join pair touches each gram key twice total.  The
pair-attribution view applies the same df-valve discipline as
q_dedup_containment (grams shared by > _MAX_DF docs are boilerplate —
q_boilerplate_passages territory — and would otherwise go quadratic).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import query
from .sources.fixtures import load_table
from .session import fan_out_scan

K = 8          # minimum duplicated-run length, in tokens
_MAX_DF = 10   # pair-attribution valve: grams in more docs are boilerplate

# Shared gram derivation (DuckDB side). Positions are 0-based to match
# Spark's sequence(0, size(t)-K); DuckDB list slicing is 1-based
# inclusive, hence t[i:i+K-1] for the K tokens starting at pos i-1.
_GRAMS_CTE = f"""
toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents
  WHERE len(string_split(text, ' ')) >= {K}
),
poss AS (
  SELECT doc_id, t, len(t) AS n_tokens,
         unnest(range(1, len(t) - {K} + 2)) AS i
  FROM toks
),
grams AS (
  /* 60-bit md5-derived gram keys (the md5_hash60 house pattern):
     only digests ever shuffle or compare, and 8-byte ints beat
     32-char strings through every exchange. A truncation collision
     is ~n^2/2^60 AND identical on both engines (same digest fn),
     so the hash gate is unaffected. */
  SELECT doc_id, n_tokens, i - 1 AS pos,
         cast(('0x' || substr(md5(array_to_string(t[i:i+{K - 1}], ' ')),
                              1, 15)) as bigint) AS h
  FROM poss
)"""


def _grams(spark, sf_dir):
    """(doc_id, n_tokens, pos, h) for every word-level K-gram."""
    d = load_table(spark, sf_dir, "documents")
    # fan the single-row-group scan out: the per-gram md5 digests are
    # the dominant per-row cost and otherwise run on one core
    # (optimization round r11)
    toks = (fan_out_scan(d, "doc_id")
            .select("doc_id", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= K))
    gexpr = F.expr(
        f"transform(sequence(0, size(t) - {K}),"
        f" i -> cast(conv(substring(md5(array_join("
        f"slice(t, i + 1, {K}), ' ')), 1, 15), 16, 10) as bigint))")
    return toks.select(
        "doc_id", F.size("t").cast("long").alias("n_tokens"),
        F.posexplode(gexpr).alias("pos", "h"))


_SUBSTR_ORACLE = f"""
WITH {_GRAMS_CTE},
dpos AS (
  /* >= 2 distinct docs iff min(doc_id) != max(doc_id) over the gram
     key — ONE pass over grams, no groupBy + semi-join re-walk */
  SELECT doc_id, n_tokens, pos FROM (
    SELECT doc_id, n_tokens, pos,
           min(doc_id) OVER (PARTITION BY h) AS d0,
           max(doc_id) OVER (PARTITION BY h) AS d1
    FROM grams
  ) WHERE d0 <> d1
),
mark AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                        ORDER BY pos) <= {K}
              THEN 0 ELSE 1 END AS brk
  FROM dpos
),
isl AS (
  SELECT doc_id, n_tokens, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM mark
),
spans AS (
  SELECT doc_id, n_tokens, island,
         max(pos) + {K} - min(pos) AS span_tokens
  FROM isl GROUP BY 1, 2, 3
)
SELECT doc_id,
       cast(n_tokens AS bigint) AS n_tokens,
       cast(count(*) AS bigint) AS dup_spans,
       cast(sum(span_tokens) AS bigint) AS dup_tokens
FROM spans
GROUP BY 1, 2
ORDER BY dup_tokens DESC, doc_id
LIMIT 20
"""


@query("q_dedup_substring", oracle=_SUBSTR_ORACLE)
def q_dedup_substring(spark, sf_dir):
    """Per-document exact duplicated-substring coverage: the number of
    maximal cross-document duplicated runs of >= K tokens and the
    total tokens they cover (interval-union exact — overlapping
    duplicated grams are merged, never double-counted).  Top-20
    documents by duplicated-token mass; the downstream dedup action is
    "cut these spans out of the training set", exactly the Lee et al.
    ExactSubstr policy.

    Scale: one generator (no shuffle) -> ONE gram-keyed exchange where
    the cross-document predicate is the window identity
    "min(doc_id) != max(doc_id) over h" -> one doc-keyed window + two
    stacked doc-keyed group-bys sharing a single exchange.  The r10
    shape (groupBy h + semi-join back) walked the generator TWICE and
    shuffled the gram stream twice; profiled at sf1.0 the second walk
    + shuffle was ~60% of the wall (SCALE.md r11), and the window
    identity deletes both for the same exact dup set.  Only 8-byte
    60-bit digests ever shuffle; gram text dies inside the
    generator's project."""
    grams = _grams(spark, sf_dir)
    wh = W.partitionBy("h")
    dpos = (grams
            .withColumn("d0", F.min("doc_id").over(wh))
            .withColumn("d1", F.max("doc_id").over(wh))
            .filter(F.col("d0") != F.col("d1"))
            .select("doc_id", "n_tokens", "pos"))
    w = W.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= K,
                 F.lit(0)).otherwise(F.lit(1))
    isl = (dpos.withColumn("brk", brk)
           .withColumn("island", F.sum("brk").over(
               w.rowsBetween(W.unboundedPreceding, W.currentRow))))
    spans = (isl.groupBy("doc_id", "n_tokens", "island")
             .agg((F.max("pos") + K - F.min("pos")).alias("span_tokens")))
    return (spans.groupBy("doc_id", "n_tokens")
            .agg(F.count("*").alias("dup_spans"),
                 F.sum("span_tokens").cast("long").alias("dup_tokens"))
            .orderBy(F.desc("dup_tokens"), "doc_id")
            .limit(20))


_SUBSTR_PAIRS_ORACLE = f"""
WITH {_GRAMS_CTE},
dd AS (
  SELECT DISTINCT h, doc_id FROM grams
),
keep AS (
  SELECT h FROM dd GROUP BY h
  HAVING count(*) BETWEEN 2 AND {_MAX_DF}
),
cand AS (
  SELECT dd.h, dd.doc_id FROM dd JOIN keep USING (h)
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cand a JOIN cand b ON a.h = b.h AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, cast(count(*) AS bigint) AS shared_grams
FROM pairs
GROUP BY 1, 2
ORDER BY shared_grams DESC, doc_a, doc_b
LIMIT 20
"""


@query("q_dedup_substring_pairs", oracle=_SUBSTR_PAIRS_ORACLE)
def q_dedup_substring_pairs(spark, sf_dir):
    """Provenance attribution for exact-substring duplication: the
    top-20 document PAIRS by shared duplicated-K-gram count — "who
    copied whom" for audit and source-weighting, the pair view that
    q_dedup_substring's per-document view cannot answer.

    Scale: the per-gram doc-list join is quadratic in a gram's
    document frequency, so grams with df > _MAX_DF are excluded by
    the same valve q_dedup_containment uses (an ultra-common gram is
    boilerplate, not plagiarism — q_boilerplate_passages owns that
    signal).  With the valve, per-gram work is <= C(_MAX_DF, 2) and
    the equi-join on the digest never goes all-pairs."""
    dd = _grams(spark, sf_dir).select("h", "doc_id").distinct()
    keep = (dd.groupBy("h").agg(F.count("*").alias("df"))
            .filter((F.col("df") >= 2) & (F.col("df") <= _MAX_DF))
            .select("h"))
    cand = dd.join(keep, "h", "left_semi")
    a, b = cand.alias("a"), cand.alias("b")
    pairs = a.join(b, (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
    return (pairs.groupBy(F.col("a.doc_id").alias("doc_a"),
                          F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("shared_grams"))
            .orderBy(F.desc("shared_grams"), "doc_a", "doc_b")
            .limit(20))
