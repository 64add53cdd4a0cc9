"""Category H+ — LLM-data-pipeline extensions (SURVEY.md §2.H and the
north star's dedup / similarity / multimodal / text-analysis mandate).

Operators live in operators/{dedup,similarity,text,multimodal}.py;
these queries wire them to the documents/embeddings fixtures with
DuckDB oracles wherever the computation is engine-portable (md5,
exact set arithmetic, decimal-exact cosine). Murmur/xxhash-based
sketches (MinHash-LSH, SimHash) and approximate ANN are rows-only by
nature — their hash functions are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .operators import multimodal
from .operators import similarity
from .operators.similarity import DEC_SIM as DEC  # cosine CTE decimals
from .operators.dedup import (
    jaccard,
    ngram_jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    simhash64,
    tokenset_signature,
    word_ngrams,
)
from .operators.similarity import brute_force_topk, cosine_col, dot_col, ivf_topk
from .session import fan_out_scan
from .operators.text import (
    BPE_ISH,
    EN_STOPWORDS,
    NEGATIVE,
    POSITIVE,
    bpe_ish_count,
    bpe_ish_count_sql,
    fingerprint_exact,
    fingerprint_tokenset,
    lexicon_count,
    lexicon_count_sql,
    quality_score,
    quality_score_sql,
    sentiment_score,
    stopword_count,
    token_count,
    tokens,
    weighted_sentiment,
    weighted_sentiment_sql,
)
from .registry import query
from .sources.fixtures import load_table

# ---------------------------------------------------------------------------
# shared oracle CTEs
# ---------------------------------------------------------------------------

# exact-decimal norms for every vector (embedding FLOAT[64])
_NORMS_CTE = f"""
norms AS (
  SELECT vec_id, label, embedding,
         cast(sum(cast(cast(embedding[gs.i] as double)
                       * cast(embedding[gs.i] as double)
                       as {DEC})) as double) AS nrm
  FROM embeddings, range(1, 65) gs(i)
  GROUP BY vec_id, label, embedding
)
"""

# same-label pair cosines (a.vec_id < b.vec_id), decimal-exact
_PAIR_COS_CTE = f"""
{_NORMS_CTE},
dots AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, a.label AS label,
         cast(sum(cast(cast(a.embedding[gs.i] as double)
                       * cast(b.embedding[gs.i] as double)
                       as {DEC})) as double) AS dot,
         max(a.nrm) AS na, max(b.nrm) AS nb
  FROM norms a
  JOIN norms b ON a.label = b.label AND a.vec_id < b.vec_id,
       range(1, 65) gs(i)
  GROUP BY a.vec_id, b.vec_id, a.label
),
paircos AS (
  SELECT va, vb, label, dot / sqrt(na * nb) AS cos_raw FROM dots
)
"""


def _norm(e):  # Spark twin of the norms CTE
    return dot_col(e, e)


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

@query(
    "q_dedup_tokenset",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(
             string_split(text, ' '))), ' ')) AS sig,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_members
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_tokenset(spark, sf_dir):
    """Exact near-dup dedup by canonical token-set signature: md5 of the
    sorted distinct tokens; keep min doc_id per signature (SURVEY.md
    §2.H). One hash-groupBy — shuffle carries (16-byte sig, id) pairs
    only, never document text; the 100 TB-safe exact-dedup shape."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select(tokenset_signature(F.col("text")).alias("sig"), "doc_id")
            .groupBy("sig")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_members")))


@query(
    "q_dedup_ngram",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT d.doc_id, d.lang,
             list_sort(list_distinct(list(d.t[gs.i] || ' ' || d.t[gs.i + 1])))
               AS g
      FROM toks d JOIN range(1, 100000) gs(i) ON gs.i <= len(d.t) - 1
      GROUP BY d.doc_id, d.lang
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(cast(len(list_intersect(a.g, b.g)) as double)
                 / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 4)
             AS jac
    FROM grams a
    JOIN grams b ON a.lang = b.lang AND a.doc_id < b.doc_id
                AND abs(len(a.g) - len(b.g)) <= 10
    WHERE cast(len(list_intersect(a.g, b.g)) as double)
          / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.2
    """,
)
def q_dedup_ngram(spark, sf_dir):
    """Exact word-bigram Jaccard near-dup pairs, blocked by lang with a
    shingle-count band (|Δ|≤10 — implied by Jaccard≥0.2 up to slack, and
    part of the declared semantics so both engines agree exactly).

    This is the exact ground truth the MinHash path approximates; the
    lang+size blocking keeps the pairwise step per-block quadratic.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.select("doc_id", "lang",
                 word_ngrams(F.col("text"), 2).alias("g"))
    return ngram_jaccard_pairs(g, "doc_id", "lang", "g",
                               tau=0.2, size_band=10)


_MINHASH_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT d.doc_id,
             list_sort(list_distinct(list(d.t[gs.i] || ' ' || d.t[gs.i + 1])))
               AS g
      FROM toks d JOIN range(1, 100000) gs(i) ON gs.i <= len(d.t) - 1
      GROUP BY d.doc_id
    ),
    gexp AS (SELECT doc_id, unnest(g) AS gram FROM grams),
    sig AS (
      SELECT doc_id,
             min(cast(('0x' || substring(md5(gram || ':0'), 1, 15)) as bigint)) AS s0,
             min(cast(('0x' || substring(md5(gram || ':1'), 1, 15)) as bigint)) AS s1,
             min(cast(('0x' || substring(md5(gram || ':2'), 1, 15)) as bigint)) AS s2,
             min(cast(('0x' || substring(md5(gram || ':3'), 1, 15)) as bigint)) AS s3,
             min(cast(('0x' || substring(md5(gram || ':4'), 1, 15)) as bigint)) AS s4,
             min(cast(('0x' || substring(md5(gram || ':5'), 1, 15)) as bigint)) AS s5,
             min(cast(('0x' || substring(md5(gram || ':6'), 1, 15)) as bigint)) AS s6,
             min(cast(('0x' || substring(md5(gram || ':7'), 1, 15)) as bigint)) AS s7,
             min(cast(('0x' || substring(md5(gram || ':8'), 1, 15)) as bigint)) AS s8,
             min(cast(('0x' || substring(md5(gram || ':9'), 1, 15)) as bigint)) AS s9,
             min(cast(('0x' || substring(md5(gram || ':10'), 1, 15)) as bigint)) AS s10,
             min(cast(('0x' || substring(md5(gram || ':11'), 1, 15)) as bigint)) AS s11,
             min(cast(('0x' || substring(md5(gram || ':12'), 1, 15)) as bigint)) AS s12,
             min(cast(('0x' || substring(md5(gram || ':13'), 1, 15)) as bigint)) AS s13,
             min(cast(('0x' || substring(md5(gram || ':14'), 1, 15)) as bigint)) AS s14,
             min(cast(('0x' || substring(md5(gram || ':15'), 1, 15)) as bigint)) AS s15
      FROM gexp GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, 0 AS band, md5(cast(s0 as varchar) || ',' || cast(s1 as varchar) || ',' || cast(s2 as varchar) || ',' || cast(s3 as varchar)) AS bucket FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band, md5(cast(s4 as varchar) || ',' || cast(s5 as varchar) || ',' || cast(s6 as varchar) || ',' || cast(s7 as varchar)) AS bucket FROM sig
      UNION ALL
      SELECT doc_id, 2 AS band, md5(cast(s8 as varchar) || ',' || cast(s9 as varchar) || ',' || cast(s10 as varchar) || ',' || cast(s11 as varchar)) AS bucket FROM sig
      UNION ALL
      SELECT doc_id, 3 AS band, md5(cast(s12 as varchar) || ',' || cast(s13 as varchar) || ',' || cast(s14 as varchar) || ',' || cast(s15 as varchar)) AS bucket FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(cast(len(list_intersect(ga.g, gb.g)) as double)
                 / (len(ga.g) + len(gb.g)
                    - len(list_intersect(ga.g, gb.g))), 4) AS jac
    FROM cand c
    JOIN grams ga ON ga.doc_id = c.id_a
    JOIN grams gb ON gb.doc_id = c.id_b
    WHERE cast(len(list_intersect(ga.g, gb.g)) as double)
          / (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) >= 0.2
    ORDER BY c.id_a, c.id_b
    """


def _minhash_lsh_verified(spark, sf_dir, portable: bool):
    d = load_table(spark, sf_dir, "documents")
    # the gram relation feeds three branches (signatures + both verify
    # sides); persist so shingling runs once, not three times (measured
    # 9.3s -> 2.6s at sf0.1). No unpersist: the returned DataFrame is
    # lazy, and the cached relation is a few MB — LRU eviction handles
    # it. At scale this is a persist-to-disk checkpoint of the shingle
    # table, the standard shape for multi-pass dedup.
    # fan the single-row-group scan out before shingling: one scan
    # partition would serialize the n_hashes-per-shingle signature
    # hashing onto one core (optimization round r11)
    g = (fan_out_scan(d, "doc_id")
         .select("doc_id", word_ngrams(F.col("text"), 2).alias("g"))
         .persist())
    cand = lsh_candidate_pairs(g, "doc_id", "g", n_hashes=16, bands=4,
                               portable=portable)
    ga = g.select(F.col("doc_id").alias("id_a"), F.col("g").alias("g_a"))
    gb = g.select(F.col("doc_id").alias("id_b"), F.col("g").alias("g_b"))
    verified = (cand.join(ga, "id_a").join(gb, "id_b")
                .select("id_a", "id_b",
                        F.round(jaccard(F.col("g_a"), F.col("g_b")), 4)
                        .alias("jac"))
                .filter(F.col("jac") >= 0.2))
    return verified.orderBy("id_a", "id_b")


@query("q_dedup_minhash")  # rows-only: murmur3 sketch (production path)
def q_dedup_minhash(spark, sf_dir):
    """MinHash(16) + 4-band LSH candidate pairs, exact-Jaccard verified
    at >= 0.2 — the scale path for q_dedup_ngram: candidate generation
    is an equi-join on band buckets (shuffle = (id, bucket) pairs), the
    quadratic step is per-bucket only. Rows-only: murmur3 seeds are
    engine-internal (~8x cheaper than the portable hash — 1.3 s vs
    10 s at sf0.1); tests assert candidates ⊇ high-Jaccard truth
    (tests/test_llm_ops.py), and the IDENTICAL pipeline is value-hash-
    checked end-to-end via q_dedup_minhash_portable."""
    return _minhash_lsh_verified(spark, sf_dir, portable=False)


@query("q_dedup_minhash_portable", oracle=_MINHASH_ORACLE)
def q_dedup_minhash_portable(spark, sf_dir):
    """The q_dedup_minhash pipeline with the engine-PORTABLE md5-derived
    per-seed hash (operators/dedup.minhash_signature portable=True):
    signatures, band buckets, candidate set, and verified pairs are all
    value-hash-checked against a DuckDB oracle computing the identical
    sketch — the probabilistic dedup rung graduated from rows-only to
    fully oracle-checked. The murmur3 twin stays the production path;
    this one exists to PROVE the pipeline, at ~8x hash cost."""
    return _minhash_lsh_verified(spark, sf_dir, portable=True)


@query("q_dedup_simhash")  # rows-only: xxhash64-based sketch
def q_dedup_simhash(spark, sf_dir):
    """64-bit SimHash signatures per document (pure array expressions,
    no UDF) + per-doc count of same-lang signatures within Hamming
    distance 3 — the constant-size sketch that replaces pairwise
    Jaccard when shingle sets are large. Candidates come from the
    Manku-banded equi-join (4 bands x 16 bits, pigeonhole-exact for
    distance <= 3), NOT an all-pairs hamming predicate — the shuffle
    carries (doc_id, 16-bit chunk) and per-bucket work is quadratic
    only within 2^16-way buckets."""
    from .operators.dedup import simhash_candidate_pairs
    d = load_table(spark, sf_dir, "documents")
    s = d.select("doc_id", "lang",
                 simhash64(tokens(F.col("text"))).alias("sh"))
    pairs = simhash_candidate_pairs(s, "doc_id", "sh", block_col="lang",
                                    max_dist=3, bands=4)
    both = (pairs.select(F.col("id_a").alias("doc_id"))
            .unionAll(pairs.select(F.col("id_b").alias("doc_id"))))
    close = both.groupBy("doc_id").agg(F.count("*").alias("n_close"))
    return (s.join(close, "doc_id", "left")
            .select("doc_id", "sh",
                    F.coalesce("n_close", F.lit(0)).alias("n_close"))
            .orderBy("doc_id"))


def _simhash_portable_oracle() -> str:
    return """
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id, lang,
             cast(('0x' || substring(md5(t), 1, 15)) as bigint) AS hv
      FROM tok
    ),
    bits AS (
      SELECT doc_id, lang,
             sum(CASE WHEN (hv >> 0) & 1 = 1 THEN 1 ELSE -1 END) AS b0,
             sum(CASE WHEN (hv >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS b1,
             sum(CASE WHEN (hv >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS b2,
             sum(CASE WHEN (hv >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS b3,
             sum(CASE WHEN (hv >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS b4,
             sum(CASE WHEN (hv >> 5) & 1 = 1 THEN 1 ELSE -1 END) AS b5,
             sum(CASE WHEN (hv >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS b6,
             sum(CASE WHEN (hv >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS b7,
             sum(CASE WHEN (hv >> 8) & 1 = 1 THEN 1 ELSE -1 END) AS b8,
             sum(CASE WHEN (hv >> 9) & 1 = 1 THEN 1 ELSE -1 END) AS b9,
             sum(CASE WHEN (hv >> 10) & 1 = 1 THEN 1 ELSE -1 END) AS b10,
             sum(CASE WHEN (hv >> 11) & 1 = 1 THEN 1 ELSE -1 END) AS b11,
             sum(CASE WHEN (hv >> 12) & 1 = 1 THEN 1 ELSE -1 END) AS b12,
             sum(CASE WHEN (hv >> 13) & 1 = 1 THEN 1 ELSE -1 END) AS b13,
             sum(CASE WHEN (hv >> 14) & 1 = 1 THEN 1 ELSE -1 END) AS b14,
             sum(CASE WHEN (hv >> 15) & 1 = 1 THEN 1 ELSE -1 END) AS b15,
             sum(CASE WHEN (hv >> 16) & 1 = 1 THEN 1 ELSE -1 END) AS b16,
             sum(CASE WHEN (hv >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS b17,
             sum(CASE WHEN (hv >> 18) & 1 = 1 THEN 1 ELSE -1 END) AS b18,
             sum(CASE WHEN (hv >> 19) & 1 = 1 THEN 1 ELSE -1 END) AS b19,
             sum(CASE WHEN (hv >> 20) & 1 = 1 THEN 1 ELSE -1 END) AS b20,
             sum(CASE WHEN (hv >> 21) & 1 = 1 THEN 1 ELSE -1 END) AS b21,
             sum(CASE WHEN (hv >> 22) & 1 = 1 THEN 1 ELSE -1 END) AS b22,
             sum(CASE WHEN (hv >> 23) & 1 = 1 THEN 1 ELSE -1 END) AS b23,
             sum(CASE WHEN (hv >> 24) & 1 = 1 THEN 1 ELSE -1 END) AS b24,
             sum(CASE WHEN (hv >> 25) & 1 = 1 THEN 1 ELSE -1 END) AS b25,
             sum(CASE WHEN (hv >> 26) & 1 = 1 THEN 1 ELSE -1 END) AS b26,
             sum(CASE WHEN (hv >> 27) & 1 = 1 THEN 1 ELSE -1 END) AS b27,
             sum(CASE WHEN (hv >> 28) & 1 = 1 THEN 1 ELSE -1 END) AS b28,
             sum(CASE WHEN (hv >> 29) & 1 = 1 THEN 1 ELSE -1 END) AS b29,
             sum(CASE WHEN (hv >> 30) & 1 = 1 THEN 1 ELSE -1 END) AS b30,
             sum(CASE WHEN (hv >> 31) & 1 = 1 THEN 1 ELSE -1 END) AS b31,
             sum(CASE WHEN (hv >> 32) & 1 = 1 THEN 1 ELSE -1 END) AS b32,
             sum(CASE WHEN (hv >> 33) & 1 = 1 THEN 1 ELSE -1 END) AS b33,
             sum(CASE WHEN (hv >> 34) & 1 = 1 THEN 1 ELSE -1 END) AS b34,
             sum(CASE WHEN (hv >> 35) & 1 = 1 THEN 1 ELSE -1 END) AS b35,
             sum(CASE WHEN (hv >> 36) & 1 = 1 THEN 1 ELSE -1 END) AS b36,
             sum(CASE WHEN (hv >> 37) & 1 = 1 THEN 1 ELSE -1 END) AS b37,
             sum(CASE WHEN (hv >> 38) & 1 = 1 THEN 1 ELSE -1 END) AS b38,
             sum(CASE WHEN (hv >> 39) & 1 = 1 THEN 1 ELSE -1 END) AS b39,
             sum(CASE WHEN (hv >> 40) & 1 = 1 THEN 1 ELSE -1 END) AS b40,
             sum(CASE WHEN (hv >> 41) & 1 = 1 THEN 1 ELSE -1 END) AS b41,
             sum(CASE WHEN (hv >> 42) & 1 = 1 THEN 1 ELSE -1 END) AS b42,
             sum(CASE WHEN (hv >> 43) & 1 = 1 THEN 1 ELSE -1 END) AS b43,
             sum(CASE WHEN (hv >> 44) & 1 = 1 THEN 1 ELSE -1 END) AS b44,
             sum(CASE WHEN (hv >> 45) & 1 = 1 THEN 1 ELSE -1 END) AS b45,
             sum(CASE WHEN (hv >> 46) & 1 = 1 THEN 1 ELSE -1 END) AS b46,
             sum(CASE WHEN (hv >> 47) & 1 = 1 THEN 1 ELSE -1 END) AS b47,
             sum(CASE WHEN (hv >> 48) & 1 = 1 THEN 1 ELSE -1 END) AS b48,
             sum(CASE WHEN (hv >> 49) & 1 = 1 THEN 1 ELSE -1 END) AS b49,
             sum(CASE WHEN (hv >> 50) & 1 = 1 THEN 1 ELSE -1 END) AS b50,
             sum(CASE WHEN (hv >> 51) & 1 = 1 THEN 1 ELSE -1 END) AS b51,
             sum(CASE WHEN (hv >> 52) & 1 = 1 THEN 1 ELSE -1 END) AS b52,
             sum(CASE WHEN (hv >> 53) & 1 = 1 THEN 1 ELSE -1 END) AS b53,
             sum(CASE WHEN (hv >> 54) & 1 = 1 THEN 1 ELSE -1 END) AS b54,
             sum(CASE WHEN (hv >> 55) & 1 = 1 THEN 1 ELSE -1 END) AS b55,
             sum(CASE WHEN (hv >> 56) & 1 = 1 THEN 1 ELSE -1 END) AS b56,
             sum(CASE WHEN (hv >> 57) & 1 = 1 THEN 1 ELSE -1 END) AS b57,
             sum(CASE WHEN (hv >> 58) & 1 = 1 THEN 1 ELSE -1 END) AS b58,
             sum(CASE WHEN (hv >> 59) & 1 = 1 THEN 1 ELSE -1 END) AS b59
      FROM h GROUP BY 1, 2
    ),
    sig AS (
      SELECT doc_id, lang, CASE WHEN b0 > 0 THEN (1::BIGINT << 0) ELSE 0 END + CASE WHEN b1 > 0 THEN (1::BIGINT << 1) ELSE 0 END + CASE WHEN b2 > 0 THEN (1::BIGINT << 2) ELSE 0 END + CASE WHEN b3 > 0 THEN (1::BIGINT << 3) ELSE 0 END + CASE WHEN b4 > 0 THEN (1::BIGINT << 4) ELSE 0 END + CASE WHEN b5 > 0 THEN (1::BIGINT << 5) ELSE 0 END + CASE WHEN b6 > 0 THEN (1::BIGINT << 6) ELSE 0 END + CASE WHEN b7 > 0 THEN (1::BIGINT << 7) ELSE 0 END + CASE WHEN b8 > 0 THEN (1::BIGINT << 8) ELSE 0 END + CASE WHEN b9 > 0 THEN (1::BIGINT << 9) ELSE 0 END + CASE WHEN b10 > 0 THEN (1::BIGINT << 10) ELSE 0 END + CASE WHEN b11 > 0 THEN (1::BIGINT << 11) ELSE 0 END + CASE WHEN b12 > 0 THEN (1::BIGINT << 12) ELSE 0 END + CASE WHEN b13 > 0 THEN (1::BIGINT << 13) ELSE 0 END + CASE WHEN b14 > 0 THEN (1::BIGINT << 14) ELSE 0 END + CASE WHEN b15 > 0 THEN (1::BIGINT << 15) ELSE 0 END + CASE WHEN b16 > 0 THEN (1::BIGINT << 16) ELSE 0 END + CASE WHEN b17 > 0 THEN (1::BIGINT << 17) ELSE 0 END + CASE WHEN b18 > 0 THEN (1::BIGINT << 18) ELSE 0 END + CASE WHEN b19 > 0 THEN (1::BIGINT << 19) ELSE 0 END + CASE WHEN b20 > 0 THEN (1::BIGINT << 20) ELSE 0 END + CASE WHEN b21 > 0 THEN (1::BIGINT << 21) ELSE 0 END + CASE WHEN b22 > 0 THEN (1::BIGINT << 22) ELSE 0 END + CASE WHEN b23 > 0 THEN (1::BIGINT << 23) ELSE 0 END + CASE WHEN b24 > 0 THEN (1::BIGINT << 24) ELSE 0 END + CASE WHEN b25 > 0 THEN (1::BIGINT << 25) ELSE 0 END + CASE WHEN b26 > 0 THEN (1::BIGINT << 26) ELSE 0 END + CASE WHEN b27 > 0 THEN (1::BIGINT << 27) ELSE 0 END + CASE WHEN b28 > 0 THEN (1::BIGINT << 28) ELSE 0 END + CASE WHEN b29 > 0 THEN (1::BIGINT << 29) ELSE 0 END + CASE WHEN b30 > 0 THEN (1::BIGINT << 30) ELSE 0 END + CASE WHEN b31 > 0 THEN (1::BIGINT << 31) ELSE 0 END + CASE WHEN b32 > 0 THEN (1::BIGINT << 32) ELSE 0 END + CASE WHEN b33 > 0 THEN (1::BIGINT << 33) ELSE 0 END + CASE WHEN b34 > 0 THEN (1::BIGINT << 34) ELSE 0 END + CASE WHEN b35 > 0 THEN (1::BIGINT << 35) ELSE 0 END + CASE WHEN b36 > 0 THEN (1::BIGINT << 36) ELSE 0 END + CASE WHEN b37 > 0 THEN (1::BIGINT << 37) ELSE 0 END + CASE WHEN b38 > 0 THEN (1::BIGINT << 38) ELSE 0 END + CASE WHEN b39 > 0 THEN (1::BIGINT << 39) ELSE 0 END + CASE WHEN b40 > 0 THEN (1::BIGINT << 40) ELSE 0 END + CASE WHEN b41 > 0 THEN (1::BIGINT << 41) ELSE 0 END + CASE WHEN b42 > 0 THEN (1::BIGINT << 42) ELSE 0 END + CASE WHEN b43 > 0 THEN (1::BIGINT << 43) ELSE 0 END + CASE WHEN b44 > 0 THEN (1::BIGINT << 44) ELSE 0 END + CASE WHEN b45 > 0 THEN (1::BIGINT << 45) ELSE 0 END + CASE WHEN b46 > 0 THEN (1::BIGINT << 46) ELSE 0 END + CASE WHEN b47 > 0 THEN (1::BIGINT << 47) ELSE 0 END + CASE WHEN b48 > 0 THEN (1::BIGINT << 48) ELSE 0 END + CASE WHEN b49 > 0 THEN (1::BIGINT << 49) ELSE 0 END + CASE WHEN b50 > 0 THEN (1::BIGINT << 50) ELSE 0 END + CASE WHEN b51 > 0 THEN (1::BIGINT << 51) ELSE 0 END + CASE WHEN b52 > 0 THEN (1::BIGINT << 52) ELSE 0 END + CASE WHEN b53 > 0 THEN (1::BIGINT << 53) ELSE 0 END + CASE WHEN b54 > 0 THEN (1::BIGINT << 54) ELSE 0 END + CASE WHEN b55 > 0 THEN (1::BIGINT << 55) ELSE 0 END + CASE WHEN b56 > 0 THEN (1::BIGINT << 56) ELSE 0 END + CASE WHEN b57 > 0 THEN (1::BIGINT << 57) ELSE 0 END + CASE WHEN b58 > 0 THEN (1::BIGINT << 58) ELSE 0 END + CASE WHEN b59 > 0 THEN (1::BIGINT << 59) ELSE 0 END AS sh FROM bits
    ),
    banded AS (
      SELECT doc_id, lang, sh, 0 AS band, (sh >> 0) & 32767 AS bv FROM sig
      UNION ALL
      SELECT doc_id, lang, sh, 1 AS band, (sh >> 15) & 32767 AS bv FROM sig
      UNION ALL
      SELECT doc_id, lang, sh, 2 AS band, (sh >> 30) & 32767 AS bv FROM sig
      UNION ALL
      SELECT doc_id, lang, sh, 3 AS band, (sh >> 45) & 32767 AS bv FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sh AS sh_a, b.sh AS sh_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bv = b.bv AND a.lang = b.lang
       AND a.doc_id < b.doc_id
    ),
    close_pairs AS (
      SELECT id_a, id_b FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
    ),
    cnt AS (
      SELECT doc_id, count(*) AS n_close FROM (
        SELECT id_a AS doc_id FROM close_pairs
        UNION ALL
        SELECT id_b AS doc_id FROM close_pairs
      ) GROUP BY 1
    )
    SELECT s.doc_id, s.sh, coalesce(c.n_close, 0) AS n_close
    FROM sig s LEFT JOIN cnt c ON s.doc_id = c.doc_id
    ORDER BY s.doc_id
    """


@query("q_dedup_simhash_portable", oracle=_simhash_portable_oracle())
def q_dedup_simhash_portable(spark, sf_dir):
    """The q_dedup_simhash pipeline with a 60-bit md5-derived token
    hash (operators/dedup.md5_hash60): signature bits, Manku band
    buckets, candidate pairs, hamming verification and the per-doc
    neighbor counts are all value-hash-checked against a DuckDB oracle
    computing the identical sketch — the SimHash rung's portable twin
    (cf. q_dedup_minhash_portable). The xxhash64 form stays the
    production path (cheaper hash). The token-hash array is
    pre-materialized as a real column so the 60 per-bit aggregates
    read an attribute instead of re-hashing every token per bit
    (SCALE.md HOF re-evaluation trap)."""
    from .operators.dedup import (
        md5_hash60,
        simhash_candidate_pairs,
        simhash_from_hashes,
    )
    d = load_table(spark, sf_dir, "documents")
    h = d.select("doc_id", "lang",
                 F.transform(tokens(F.col("text")),
                             md5_hash60).alias("hv"))
    s = h.select("doc_id", "lang",
                 simhash_from_hashes("hv", 60).alias("sh"))
    pairs = simhash_candidate_pairs(s, "doc_id", "sh", block_col="lang",
                                    max_dist=3, bands=4, sig_bits=60)
    both = (pairs.select(F.col("id_a").alias("doc_id"))
            .unionAll(pairs.select(F.col("id_b").alias("doc_id"))))
    close = both.groupBy("doc_id").agg(F.count("*").alias("n_close"))
    return (s.join(close, "doc_id", "left")
            .select("doc_id", "sh",
                    F.coalesce("n_close", F.lit(0)).alias("n_close"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

@query(
    "q_similarity_topk",
    oracle=similarity.cosine_topk_fast_sql(
        similarity.ELEM_DUCK_E, similarity.ELEM_DUCK_P,
        similarity.ELEM_DUCK_P_SELF),
)
def q_similarity_topk(spark, sf_dir):
    """Exact top-10 cosine neighbors of probe vec_id=0 (SURVEY.md §2.H).

    Plan: broadcast the 1-row probe against the corpus — one scan, one
    codegen'd cosine per row, TakeOrderedAndProject for the top-k. At
    100 TB this stays a single pass with no shuffle; the approximate
    escape hatch is q_similarity_ann (IVF cells).

    Round 5: the cosine is a GENERATED fixed-order double expression
    (operators/similarity.cosine_topk_fast_sql) — the same left-
    associated 64-term sums on both engines, hash-stable because a
    per-row fold has no ordering freedom, ~2x faster than the decimal
    reduction it replaces (which remains the right tool for sums
    ACROSS rows, e.g. the norms in q_similarity_pairs). The
    brute_force_topk Column-API form stays the library surface."""
    load_table(spark, sf_dir, "embeddings") \
        .createOrReplaceTempView("embeddings")
    return spark.sql(similarity.cosine_topk_fast_sql(
        similarity.ELEM_SPARK_E, similarity.ELEM_SPARK_P,
        similarity.ELEM_SPARK_P_SELF))



@query(
    "q_similarity_pairs",
    oracle=f"""
    WITH {_PAIR_COS_CTE}
    SELECT label, count(*) AS n_pairs,
           round(max(cos_raw), 4) AS max_cos
    FROM paircos WHERE cos_raw >= 0.3
    GROUP BY label
    """,
)
def q_similarity_pairs(spark, sf_dir):
    """Blocked similarity self-join: count same-label pairs with cosine
    >= 0.3 (labels are the blocking key, so the pairwise step is
    per-block quadratic — the REPOSE-style partitioned-candidates shape,
    PAPERS.md ICDE'21). Norms are computed once per vector before the
    join, not per pair."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    a = fan_out_scan(n, "vec_id").alias("a")
    b = n.alias("b")
    cos = (dot_col(F.col("a.embedding"), F.col("b.embedding"))
           / F.sqrt(F.col("a.nrm") * F.col("b.nrm")))
    fast = (similarity.dot_fast_col(F.col("a.embedding"),
                                    F.col("b.embedding"))
            / F.sqrt(F.col("a.nrm") * F.col("b.nrm")))
    return (a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .filter(fast >= 0.3 - 1e-6)  # codegen prefilter (SCALE.md r7)
            .select(F.col("a.label").alias("label"), cos.alias("cos_raw"))
            .filter(F.col("cos_raw") >= 0.3)
            .groupBy("label")
            .agg(F.count("*").alias("n_pairs"),
                 F.round(F.max("cos_raw"), 4).alias("max_cos")))


@query(
    "q_embed_neardup",
    oracle=f"""
    WITH {_PAIR_COS_CTE},
    hits AS (
      SELECT va AS vec_id, vb AS other FROM paircos WHERE cos_raw >= 0.35
      UNION ALL
      SELECT vb AS vec_id, va AS other FROM paircos WHERE cos_raw >= 0.35
    ),
    agg AS (
      SELECT vec_id, count(*) AS n_neighbors,
             max(CASE WHEN other < vec_id THEN 1 ELSE 0 END) = 1 AS is_dup
      FROM hits GROUP BY vec_id
    )
    SELECT e.vec_id,
           coalesce(a.n_neighbors, 0) AS n_neighbors,
           coalesce(a.is_dup, false) AS is_dup
    FROM embeddings e LEFT JOIN agg a ON e.vec_id = a.vec_id
    """,
)
def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup marking: per vector, the count of
    same-label neighbors with cosine >= 0.35, and the greedy dedup flag
    (is_dup ⇔ a lower-id neighbor exists — keep-first semantics, the
    deterministic form of drop_duplicates)."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    a = fan_out_scan(n, "vec_id").alias("a")
    b = n.alias("b")
    cos = (dot_col(F.col("a.embedding"), F.col("b.embedding"))
           / F.sqrt(F.col("a.nrm") * F.col("b.nrm")))
    fast = (similarity.dot_fast_col(F.col("a.embedding"),
                                    F.col("b.embedding"))
            / F.sqrt(F.col("a.nrm") * F.col("b.nrm")))
    pairs = (a.join(b, (F.col("a.label") == F.col("b.label"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .filter(fast >= 0.35 - 1e-6)  # codegen prefilter (r7)
             .select(F.col("a.vec_id").alias("va"),
                     F.col("b.vec_id").alias("vb"),
                     cos.alias("cos_raw"))
             .filter(F.col("cos_raw") >= 0.35))
    hits = (pairs.select(F.col("va").alias("vec_id"), F.col("vb").alias("other"))
            .unionByName(
                pairs.select(F.col("vb").alias("vec_id"),
                             F.col("va").alias("other"))))
    agg = hits.groupBy("vec_id").agg(
        F.count("*").alias("n_neighbors"),
        (F.max(F.when(F.col("other") < F.col("vec_id"), 1).otherwise(0)) == 1)
        .alias("is_dup"),
    )
    return (e.select("vec_id").join(agg, "vec_id", "left")
            .select("vec_id",
                    F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
                    F.coalesce("is_dup", F.lit(False)).alias("is_dup")))


@query("q_similarity_ann")  # rows-only: approximate (IVF recall < 1)
def q_similarity_ann(spark, sf_dir):
    """IVF-bucketed approximate top-10 for probe vec_id=0 — the scale
    path: assign vectors to coarse cells once, probe only the nearest
    cells (~n_probe/n_cells of the corpus scanned). Rows-only; recall
    vs the exact answer is asserted in tests/test_llm_ops.py."""
    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, probe_id=0, k=10, n_cells=8, n_probe_cells=3)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@query(
    "q_text_sentiment",
    oracle=f"""
    SELECT lang,
           cast(sum({lexicon_count_sql('text', POSITIVE)}) as bigint) AS n_pos,
           cast(sum({lexicon_count_sql('text', NEGATIVE)}) as bigint) AS n_neg,
           cast(sum({lexicon_count_sql('text', POSITIVE)})
             - sum({lexicon_count_sql('text', NEGATIVE)}) as bigint) AS sentiment
    FROM documents GROUP BY lang
    """,
)
def q_text_sentiment(spark, sf_dir):
    """Lexicon sentiment per language: word-bounded counts of the
    positive/negative lexicons, aggregated per lang (the EDBT'16
    Spark-sentiment pattern, PAPERS.md)."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select(
                "lang",
                lexicon_count(F.col("text"), POSITIVE).alias("p"),
                lexicon_count(F.col("text"), NEGATIVE).alias("n"))
            .groupBy("lang")
            .agg(F.sum("p").alias("n_pos"),
                 F.sum("n").alias("n_neg"),
                 (F.sum("p") - F.sum("n")).alias("sentiment")))


@query(
    "q_text_sentiment_weighted",
    oracle=f"""
    SELECT lang,
           cast(sum({weighted_sentiment_sql('text')}) as bigint)
             AS valence,
           round(cast(sum({weighted_sentiment_sql('text')}) as double)
                 / count(*), 4) + 0.0 AS avg_valence
    FROM documents GROUP BY lang
    """,
)
def q_text_sentiment_weighted(spark, sf_dir):
    """AFINN-weighted sentiment per language: per-document valence is a
    literal-map token-fold (operators/text.weighted_sentiment — one
    codegen pass over the token array, no regex/UDF/shuffle before the
    final per-lang agg), summed and averaged per lang. The unweighted
    q_text_sentiment counts lexicon hits; this is the valence-weighted
    AFINN form the EDBT'16 pattern actually scores with."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select("lang", weighted_sentiment(F.col("text")).alias("v"))
            .groupBy("lang")
            .agg(F.sum("v").alias("valence"),
                 F.round(F.sum("v").cast("double") / F.count("*"), 4)
                 .alias("avg_valence")))


@query(
    "q_text_stats",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           cast(sum(len(string_split(text, ' '))) as bigint) AS sum_tokens,
           cast(sum(len(list_distinct(string_split(text, ' ')))) as bigint)
             AS sum_distinct,
           cast(sum(n_chars) as bigint) AS sum_chars,
           round(cast(sum(len(string_split(text, ' '))) as double)
                 / count(*), 4) AS avg_tokens
    FROM documents GROUP BY source
    """,
)
def q_text_stats(spark, sf_dir):
    """Corpus stats per source: token/distinct-token/char totals (the
    multimodal-column profiling row of SURVEY.md §2.H)."""
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    return (d.select(
                "source", "n_chars",
                F.size(tok).cast("bigint").alias("nt"),
                F.size(F.array_distinct(tok)).cast("bigint").alias("nd"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("nt").alias("sum_tokens"),
                 F.sum("nd").alias("sum_distinct"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.round(F.sum("nt").cast("double") / F.count("*"), 4)
                 .alias("avg_tokens")))


@query(
    "q_text_langid",
    oracle=f"""
    SELECT doc_id,
           {lexicon_count_sql('text', EN_STOPWORDS)} AS n_stop,
           len(string_split(text, ' ')) AS n_tokens,
           CASE WHEN cast({lexicon_count_sql('text', EN_STOPWORDS)} as double)
                     / len(string_split(text, ' ')) >= 0.05
                THEN 'en' ELSE 'unknown' END AS pred_lang
    FROM documents
    """,
)
def q_text_langid(spark, sf_dir):
    """Heuristic language ID: English function-word rate threshold —
    the n-gram/stopword-profile classifier shape (real deployments swap
    in per-language profiles; the operator structure — lexicon rate →
    argmax/threshold — is what scales)."""
    d = load_table(spark, sf_dir, "documents")
    n_stop = stopword_count(F.col("text"))
    n_tok = token_count(F.col("text"))
    return d.select(
        "doc_id",
        n_stop.alias("n_stop"),
        n_tok.alias("n_tokens"),
        F.when(n_stop.cast("double") / n_tok >= 0.05, "en")
        .otherwise("unknown").alias("pred_lang"),
    )


@query(
    "q_text_quality",
    oracle=f"""
    SELECT doc_id,
           {quality_score_sql(
               "len(string_split(text, ' '))",
               "len(list_distinct(string_split(text, ' ')))",
               "n_chars",
               lexicon_count_sql('text', EN_STOPWORDS))} AS quality
    FROM documents
    """,
)
def q_text_quality(spark, sf_dir):
    """Per-document quality score: type-token ratio + stopword rate +
    length band (rational arithmetic only; the filter-threshold form of
    training-data quality gates)."""
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    return d.select(
        "doc_id",
        quality_score(
            F.size(tok), F.size(F.array_distinct(tok)),
            F.col("n_chars"), stopword_count(F.col("text")),
        ).alias("quality"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
             AS fp_exact,
           md5(array_to_string(list_sort(list_distinct(
             string_split(lower(text), ' '))), ' ')) AS fp_tokenset
    FROM documents
    """,
)
def q_text_fingerprint(spark, sf_dir):
    """Document fingerprinting: exact content hash (normalized text)
    and order-insensitive token-set hash — the two cheap signatures a
    dedup pipeline keys on before anything fuzzy."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint_exact(F.col("text")).alias("fp_exact"),
        fingerprint_tokenset(F.col("text")).alias("fp_tokenset"),
    )


@query(
    "q_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           {bpe_ish_count_sql('text')} AS n_bpe_ish
    FROM documents
    """,
)
def q_token_count(spark, sf_dir):
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (letter runs | digit runs | single punctuation) — the budget
    estimator for LLM training-token accounting."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_ws_tokens"),
        bpe_ish_count(F.col("text")).alias("n_bpe_ish"),
    )


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           cast(octet_length(encode(text)) as bigint) AS n_bytes,
           (cast(octet_length(encode(text)) as bigint) % 64) * 16
             AS fake_width,
           (cast(octet_length(encode(text)) as bigint) % 48) * 16
             AS fake_height,
           'fake/raw' AS fmt
    FROM documents
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Multimodal column plumbing, end to end: text bytes stand in as
    the opaque binary payload; an Arrow-batched mapInPandas 'decoder'
    (operators/multimodal.py — decode stubbed, deterministic byte
    arithmetic) emits typed metadata that the oracle reproduces in SQL.
    Proves schema/batch/partitioning plumbing while the codec itself is
    absent from the container."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_payload(d)
    return multimodal.decode_features(media)


@query(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                ELSE 'jpeg' END AS fmt,
           doc_id % 13 + 1 AS width,
           doc_id % 7 + 1 AS height,
           round(cast(CASE WHEN doc_id % 3 = 2 THEN (doc_id * 5) % 128 * 2
                           ELSE doc_id % 256 END as double), 4) AS mean_r,
           round(cast(CASE WHEN doc_id % 3 = 2 THEN (doc_id * 5) % 128 * 2
                           ELSE (doc_id * 7) % 256 END as double), 4)
             AS mean_g,
           round(cast(CASE WHEN doc_id % 3 = 2 THEN (doc_id * 5) % 128 * 2
                           ELSE (doc_id * 13) % 256 END as double), 4)
             AS mean_b
    FROM documents
    """,
)
def q_multimodal_decode(spark, sf_dir):
    """REAL image decode, no codec libraries: deterministic
    BMP / P6-PPM / baseline-grayscale-JPEG payloads are synthesized per
    doc (uniform color, dimensions closed-form in doc_id), then an
    Arrow-batched mapInPandas decoder parses them — BMP strides/
    bottom-up rows/BGR, PPM headers, and for JPEG the full baseline
    path: marker segments, canonical Huffman, DC prediction,
    dequantization, IDCT (operators/multimodal.py + operators/jpeg.py).
    The oracle knows the closed form, so any decode mistake — stride
    padding, BGR vs RGB, a Huffman mis-read, a wrong IDCT constant —
    breaks the value hash. JPEG gray values are even, making Annex-K DC
    quantization exact (jpeg.py encode_jpeg_gray_uniform docstring).
    Formats/variants without a dependency-free decoder still raise
    NotImplementedError (honest-stub policy)."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_images(d)
    feats = multimodal.decode_image_features(media)
    return feats.select(
        "doc_id", "fmt", "width", "height",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"))


@query(
    "q_multimodal_decode_color",
    oracle="""
    WITH ycc AS (
      SELECT doc_id,
             'jpeg' AS fmt,
             doc_id % 13 + 1 AS width,
             doc_id % 7 + 1 AS height,
             cast(2 * ((doc_id * 5) % 128) as double) AS y,
             cast(128 + 17 * (doc_id % 9 - 4) as double) AS cb,
             cast(128 + 17 * ((doc_id * 3) % 9 - 4) as double) AS cr
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id, fmt, width, height,
           round(least(255.0, greatest(0.0,
             floor(y + 1.402 * (cr - 128) + 0.5))), 4) AS mean_r,
           round(least(255.0, greatest(0.0,
             floor(y - 0.344136 * (cb - 128)
                     - 0.714136 * (cr - 128) + 0.5))), 4) AS mean_g,
           round(least(255.0, greatest(0.0,
             floor(y + 1.772 * (cb - 128) + 0.5))), 4) AS mean_b
    FROM ycc
    """,
)
def q_multimodal_decode_color(spark, sf_dir):
    """REAL color JPEG decode, no codec libraries (round-5 verdict
    item 7): baseline YCbCr streams — alternating 4:4:4 and 4:2:0
    subsampling — are synthesized per doc with uniform DC-exact
    (y, cb, cr) (operators/jpeg.encode_jpeg_color_uniform), then the
    Arrow-batched decoder runs the full color path: chrominance
    quant/Huffman tables (T.81 K.2/K.4/K.6), three per-component DC
    predictors, interleaved MCUs (4Y+Cb+Cr at 4:2:0), nearest 2x2
    chroma upsampling, and the floor(x+0.5) JFIF YCbCr→RGB transform.
    The oracle reproduces the decoded channel means in closed form —
    any mistake in chroma table selection, MCU interleave order, a
    predictor mix-up, or the color matrix breaks the value hash.

    Scale: identical shape to q_multimodal_decode — zero shuffle,
    Arrow-streamed mapInPandas, decode parallelism == partitions."""
    # the doc_id%3==0 slice: the same per-payload decode volume as the
    # gray row's JPEG third, so the two rows are bench-comparable
    # (decoding EVERY doc tripled the like-for-like cost for no extra
    # coverage — the color path is fully exercised either way)
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0)
    media = multimodal.synthesize_color_images(d)
    feats = multimodal.decode_image_features(media)
    return feats.select(
        "doc_id", "fmt", "width", "height",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"))


@query(
    "q_multimodal_decode_chroma422",
    oracle="""
    WITH ycc AS (
      SELECT doc_id,
             'jpeg' AS fmt,
             doc_id % 13 + 1 AS width,
             doc_id % 7 + 1 AS height,
             cast(2 * ((doc_id * 5) % 128) as double) AS y,
             cast(128 + 17 * (doc_id % 9 - 4) as double) AS cb,
             cast(128 + 17 * ((doc_id * 3) % 9 - 4) as double) AS cr
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT doc_id, fmt, width, height,
           round(least(255.0, greatest(0.0,
             floor(y + 1.402 * (cr - 128) + 0.5))), 4) AS mean_r,
           round(least(255.0, greatest(0.0,
             floor(y - 0.344136 * (cb - 128)
                     - 0.714136 * (cr - 128) + 0.5))), 4) AS mean_g,
           round(least(255.0, greatest(0.0,
             floor(y + 1.772 * (cb - 128) + 0.5))), 4) AS mean_b
    FROM ycc
    """,
)
def q_multimodal_decode_chroma422(spark, sf_dir):
    """REAL rectangular-chroma JPEG decode (round 6): baseline YCbCr
    streams alternating 4:2:2 (2x1) and 4:4:0 (1x2) subsampling — the
    remaining chroma geometries after q_multimodal_decode_color's
    4:4:4/4:2:0 — with the same uniform DC-exact colors, so the oracle
    reuses the closed-form floor(x+0.5) JFIF transform. 4:2:2 MCUs
    interleave 2 Y blocks + Cb + Cr across a 16x8 region with chroma
    replicated horizontally only; 4:4:0 is the transpose. Any per-axis
    replication or MCU-geometry slip decodes the wrong pixels and
    breaks the hash (uniform color makes means subsampling-invariant
    — what the oracle checks is that the decode SUCCEEDS and lands on
    the exact transform, incl. per-component predictors and chroma
    table selection at the rectangular MCU layout).

    Scale: identical shape to q_multimodal_decode — zero shuffle,
    Arrow-streamed mapInPandas."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1)
    media = multimodal.synthesize_color_images_422(d)
    feats = multimodal.decode_image_features(media)
    return feats.select(
        "doc_id", "fmt", "width", "height",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"))


@query(
    "q_multimodal_decode_progressive",
    oracle="""
    SELECT doc_id,
           'jpeg' AS fmt,
           doc_id % 13 + 1 AS width,
           doc_id % 7 + 1 AS height,
           round(cast(2 * ((doc_id * 11) % 128) as double), 4) AS mean_g
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q_multimodal_decode_progressive(spark, sf_dir):
    """REAL progressive (SOF2) JPEG decode — the last JPEG variant
    that was an honest stub (round-4 verdict item 4): six-scan
    spectral-selection + successive-approximation streams
    (operators/jpeg.py Annex-G path: DC first/refine, AC first with
    EOB runs, AC refinement with correction bits, cross-scan
    coefficient accumulation) are synthesized per doc with even
    uniform gray, so DC quantization is exact and the decoded plane
    equals the closed form. Any mistake in scan sequencing, band
    bookkeeping, the refinement walk, or EOB-run handling breaks the
    value hash. Pixel-exact equivalence with the baseline decoder on
    ARBITRARY coefficients is pinned in tests/test_jpeg_progressive.py.

    Scale: identical shape to q_multimodal_decode — zero shuffle,
    Arrow-streamed mapInPandas, decode parallelism == partitions."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1)
    media = multimodal.synthesize_progressive_images(d)
    feats = multimodal.decode_image_features(media)
    return feats.select(
        "doc_id", "fmt", "width", "height",
        F.round("mean_r", 4).alias("mean_g"))


@query(
    "q_multimodal_decode_png",
    oracle="""
    SELECT doc_id,
           'png' AS fmt,
           doc_id % 13 + 1 AS width,
           doc_id % 7 + 1 AS height,
           round(cast(doc_id % 200 as double)
                 + (doc_id % 13) / 2.0 + (doc_id % 7) / 2.0, 4)
             AS mean_r,
           round(cast((doc_id * 7) % 200 as double)
                 + (doc_id % 13) / 2.0 + (doc_id % 7) / 2.0, 4)
             AS mean_g,
           round(cast((doc_id * 13) % 200 as double)
                 + (doc_id % 13) / 2.0 + (doc_id % 7) / 2.0, 4)
             AS mean_b
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def q_multimodal_decode_png(spark, sf_dir):
    """REAL PNG decode, no codec libraries (round 5: the zlib rung of
    the decode ladder): 8-bit RGB gradient PNGs — pixel(x,y) = c0+x+y
    per channel, each row forward-filtered with rotating filter types
    0..4 — are synthesized per doc (operators/png.py), then the
    Arrow-batched decoder walks chunks with CRC-32 verification,
    inflates the multi-IDAT stream via stdlib zlib, and reverses all
    five PNG scanline filters including the Paeth predictor. The
    channel mean of the gradient is the closed form
    c0 + (w-1)/2 + (h-1)/2 — a dyadic rational that double arithmetic
    represents exactly on both engines, so any unfilter slip (wrong
    left/up reference, Paeth tie-break, stride bug) breaks the value
    hash. Palette, 16-bit, and Adam7 variants are real decode paths
    with their own queries (round 6); alpha color types and sub-byte
    depths raise NotImplementedError (honest-stub policy).

    Scale: identical shape to q_multimodal_decode — zero shuffle,
    Arrow-streamed mapInPandas, decode parallelism == partitions."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 2)
    media = multimodal.synthesize_png_images(d)
    feats = multimodal.decode_image_features(media)
    return feats.select(
        "doc_id", "fmt", "width", "height",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"))


@query(
    "q_multimodal_decode_palette",
    oracle="""
    SELECT doc_id,
           'png' AS fmt,
           doc_id % 13 + 1 AS width,
           doc_id % 7 + 1 AS height,
           round(cast(doc_id % 200 as double)
                 + (doc_id % 13) / 2.0 + (doc_id % 7) / 2.0, 4)
             AS mean_r,
           round(cast((doc_id * 7) % 200 + (doc_id % 13)
                      + (doc_id % 7) as double), 4) AS mean_g,
           round(cast((doc_id * 13) % 200 as double)
                 + (doc_id % 13) / 2.0 + (doc_id % 7) / 2.0, 4)
             AS mean_b
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q_multimodal_decode_palette(spark, sf_dir):
    """REAL palette-PNG decode (round 6, VERDICT item 5: color-type 3
    is the most common real-crawl PNG variant previously refused):
    per-doc PNGs store 1-byte indices x+y filtered with rotating row
    filters, plus a PLTE whose entry j is (r0+j, g0+2j, b0+j); the
    decoder walks chunks with CRC-32 verification, inflates, reverses
    all five scanline filters at bpp=1, and expands indices through
    the PLTE. Channel means are closed-form — mean_r/b = c0 + (w-1)/2
    + (h-1)/2 (dyadic rationals), mean_g = g0 + (w-1) + (h-1) — and
    the g-channel's doubled slope breaks the hash if indices are read
    as gray instead of looked up, while any unfilter/stride slip
    breaks all three.

    Scale: identical shape to q_multimodal_decode — zero shuffle,
    Arrow-streamed mapInPandas, decode parallelism == partitions."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0)
    media = multimodal.synthesize_palette_images(d)
    feats = multimodal.decode_image_features(media)
    return feats.select(
        "doc_id", "fmt", "width", "height",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"))


@query(
    "q_multimodal_decode_png16",
    oracle="""
    SELECT doc_id,
           'png' AS fmt,
           doc_id % 13 + 1 AS width,
           doc_id % 7 + 1 AS height,
           round(cast((doc_id * 11) % 50000 as double)
                 + (doc_id % 13) / 2.0 + (doc_id % 7) / 2.0, 4)
             AS mean_gray
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q_multimodal_decode_png16(spark, sf_dir):
    """REAL 16-bit PNG decode (round 6: closing the named refusal
    list): grayscale gradients with samples base + x + y, base up to
    ~50k, stored as big-endian u16 pairs. The byte-level scanline
    filters run at bpp=2 — Sub/Average/Paeth reference the
    counterpart byte two positions left — so any 8-bit assumption
    (bpp=1, wrong stride, little-endian reassembly) corrupts samples
    and breaks the closed-form mean base + (w-1)/2 + (h-1)/2.

    Scale: identical shape to q_multimodal_decode — zero shuffle,
    Arrow-streamed mapInPandas."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1)
    media = multimodal.synthesize_png16_images(d)
    feats = multimodal.decode_image_features(media)
    return feats.select(
        "doc_id", "fmt", "width", "height",
        F.round("mean_r", 4).alias("mean_gray"))


@query(
    "q_multimodal_decode_adam7",
    oracle="""
    SELECT doc_id,
           'png' AS fmt,
           doc_id % 13 + 1 AS width,
           doc_id % 7 + 1 AS height,
           round(cast(doc_id % 200 as double)
                 + (doc_id % 13) / 2.0 + (doc_id % 7) / 2.0, 4)
             AS mean_r,
           round(cast((doc_id * 7) % 200 as double)
                 + (doc_id % 13) / 2.0 + (doc_id % 7) / 2.0, 4)
             AS mean_g,
           doc_id % 200 AS px_tl,
           doc_id % 200 + (doc_id % 13) + (doc_id % 7) AS px_br,
           (doc_id * 7) % 200 + (doc_id % 7 + 1) // 2
                              + (doc_id % 13 + 1) // 2 AS px_center_g
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def q_multimodal_decode_adam7(spark, sf_dir):
    """REAL Adam7-interlaced PNG decode (round 6): the same RGB
    gradient as q_multimodal_decode_png but stored as seven interlace
    passes, each with an independent scanline filter chain. Channel
    means alone are permutation-invariant — a decoder that unfilters
    every pass correctly but scatters them to wrong (x, y) offsets
    would still produce the right means — so the oracle additionally
    pins PROBE PIXELS: top-left R (= r0, pass 1's first sample),
    bottom-right R (= r0 + (w-1) + (h-1)), and center G
    (= g0 + w//2 + h//2; note width = d%13+1 so w//2 =
    (d%13+1)//2). Any pass-origin or stride slip moves a probe.

    Scale: identical shape to q_multimodal_decode — zero shuffle,
    Arrow-streamed mapInPandas."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 2)
    media = multimodal.synthesize_adam7_images(d)
    feats = multimodal.decode_image_probes(media)
    return feats.select(
        "doc_id", "fmt", "width", "height",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        "px_tl", "px_br", "px_center_g")


@query(
    "q_multimodal_framesample",
    oracle="""
    SELECT doc_id, i AS frame_idx,
           least(32, nb - i * 32) AS frame_len
    FROM (
      SELECT doc_id,
             cast(octet_length(encode(text)) as bigint) AS nb,
             unnest(range(0, cast((octet_length(encode(text)) + 31) // 32
                                  as bigint))) AS i
      FROM documents
    )
    WHERE i % 4 = 0
    """,
)
def q_multimodal_framesample(spark, sf_dir):
    """Frame sampling over opaque media payloads: every 4th 32-byte
    'frame' per document via a row-exploding mapInPandas
    (operators/multimodal.py frame_sample) — the video-pipeline shape
    where one input row fans out to many frames executor-side. The
    oracle reproduces the fan-out with a lateral range()."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_payload(d)
    return multimodal.frame_sample(media, frame_bytes=32, every=4)


@query(
    "q_quality_pipeline",
    oracle=rf"""
    WITH scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             {quality_score_sql(
                 "len(string_split(text, ' '))",
                 "len(list_distinct(string_split(text, ' ')))",
                 "n_chars",
                 lexicon_count_sql('text', EN_STOPWORDS))} AS quality,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    )
    SELECT doc_id, n_tokens, quality FROM scored
    WHERE quality >= 1.0 AND n_tokens BETWEEN 5 AND 1000
    QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    """,
)
def q_quality_pipeline(spark, sf_dir):
    """The composite C4-style cleaning pass: quality-score gate +
    token-length band + exact-fingerprint dedup (keep min doc_id), in
    one declarative pipeline — the form a pre-training corpus filter
    actually ships as. Everything stays codegen'd expressions + one
    window; the filter prunes BEFORE the dedup exchange so the shuffle
    carries survivors only."""
    from pyspark.sql import Window as W
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    scored = d.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        quality_score(
            F.size(tok), F.size(F.array_distinct(tok)),
            F.col("n_chars"), stopword_count(F.col("text")),
        ).alias("quality"),
        fingerprint_exact(F.col("text")).alias("fp"),
    )
    kept = scored.filter((F.col("quality") >= 1.0)
                         & F.col("n_tokens").between(5, 1000))
    w = W.partitionBy("fp").orderBy("doc_id")
    return (kept.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("doc_id", "n_tokens", "quality"))


@query(
    "q_knn_join",
    oracle=f"""
    WITH {_PAIR_COS_CTE},
    both_dirs AS (
      SELECT va AS vec_id, vb AS neighbor, cos_raw FROM paircos
      UNION ALL
      SELECT vb AS vec_id, va AS neighbor, cos_raw FROM paircos
    )
    SELECT vec_id, neighbor, round(cos_raw, 4) AS cos
    FROM both_dirs
    QUALIFY row_number() OVER (
      PARTITION BY vec_id ORDER BY cos_raw DESC, neighbor) <= 3
    """,
)
def q_knn_join(spark, sf_dir):
    """kNN join: top-3 same-label cosine neighbors for EVERY vector —
    the all-pairs generalization of q_similarity_topk (the shape of
    near-dup clustering and retrieval-index bootstrap jobs).

    Blocked by label, pair cosines computed once (a<b) and mirrored,
    then one window per vec_id. Ordering uses the raw (un-rounded)
    cosine — bit-identical across engines by the decimal-exact
    construction — with the neighbor id as total-order tie-break.

    PLANNED physical strategy (round 8, VERDICT r7 item 6): the
    plans/similarity_planner.plan_knn_join cost model is consulted
    with allow_approx=False, so this query resolves to 'exact_pairs'
    at EVERY scale — round 8 measured the sized IVF-blocked
    alternative at sf1.0 (13.4 s vs 145 s exact, 2.8× slope) but
    also measured its recall there: 0.397, because the isotropic
    fixture has no cluster structure for cells to exploit, and an
    oracle that states exact kNN must not silently lose 60% of its
    edges (the sf1.0 hash sweep would rightly flag it). The linear
    blocked plan stays available to callers that opt in
    (q_knn_join_blocked, recall-pinned at its own configuration);
    see SCALE.md round 8 for the full measurement trail.
    """
    from pyspark.sql import Window as W
    from .plans.similarity_planner import plan_knn_join
    e = load_table(spark, sf_dir, "embeddings")
    n_vec, n_lab = e.agg(
        F.count("*"), F.countDistinct("label")).first()
    plan = plan_knn_join(int(n_vec), int(n_lab), allow_approx=False)
    if plan.strategy == "ivf_blocked":  # pragma: no cover — opt-in only
        from .operators.similarity import ivf_knn_join
        return ivf_knn_join(e, k=3, n_cells=plan.n_cells, n_assign=3)
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    # Two-phase top-k (SCALE.md r7 — same fix family as q_dbscan):
    # phase 1 ranks ALL pairs by the whole-stage-codegen DOUBLE cosine
    # (|fast − exact| ≤ ~3e-9: the exact arm's per-term decimal(18,10)
    # quantization dominates — see dot_fast_col — not the ~1e-13
    # double summation error) and keeps a top-13 superset per vector
    # — the exact top-3 can only escape it if ≥ 11 cosines tie within
    # ~6e-9 of the 3rd-best, impossible for the continuous fixture
    # values short of bit-identical vectors; phase 2 re-scores only
    # the ≤13 survivors per vector with the exact decimal reduction
    # and takes the final top-3, so results are bit-identical to the
    # all-decimal form (oracle unchanged) at ~1/1000th the decimal
    # work. The 40 M-pair sf1.0 pass dropped 788 s → seconds.
    a = fan_out_scan(n, "vec_id").alias("a")
    b = n.alias("b")
    fast = (similarity.dot_fast_col(F.col("a.embedding"),
                                    F.col("b.embedding"))
            / F.sqrt(F.col("a.nrm") * F.col("b.nrm")))
    pairs = (a.join(b, (F.col("a.label") == F.col("b.label"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("va"),
                     F.col("b.vec_id").alias("vb"),
                     fast.alias("fast_cos")))
    both = (pairs.select(F.col("va").alias("vec_id"),
                         F.col("vb").alias("neighbor"), "fast_cos")
            .unionByName(
                pairs.select(F.col("vb").alias("vec_id"),
                             F.col("va").alias("neighbor"), "fast_cos")))
    wf = W.partitionBy("vec_id").orderBy(F.col("fast_cos").desc(),
                                         "neighbor")
    cand = (both.withColumn("_rn", F.row_number().over(wf))
            .filter(F.col("_rn") <= 13)
            .select("vec_id", "neighbor"))
    va = n.select(F.col("vec_id"),
                  F.col("embedding").alias("_ea"),
                  F.col("nrm").alias("_na"))
    vb = n.select(F.col("vec_id").alias("neighbor"),
                  F.col("embedding").alias("_eb"),
                  F.col("nrm").alias("_nb"))
    exact = (cand.join(F.broadcast(va), "vec_id")
             .join(F.broadcast(vb), "neighbor")
             .select("vec_id", "neighbor",
                     (dot_col(F.col("_ea"), F.col("_eb"))
                      / F.sqrt(F.col("_na") * F.col("_nb")))
                     .alias("cos_raw")))
    w = W.partitionBy("vec_id").orderBy(F.col("cos_raw").desc(),
                                        "neighbor")
    return (exact.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 3)
            .select("vec_id", "neighbor",
                    F.round("cos_raw", 4).alias("cos")))


@query("q_knn_join_blocked")  # rows-only: IVF-blocked approximation
def q_knn_join_blocked(spark, sf_dir):
    """Approximate kNN join: q_knn_join's scale path. Candidates come
    from an equi-join on (IVF cell, label) with redundant top-3-cell
    assignment — per-cell quadratic only — instead of the exact
    per-label all-pairs join. Recall vs the exact join is pinned in
    tests/test_llm_ops.py (0.92 observed at sf0.001 AND sf0.01 with
    these parameters)."""
    from .operators.similarity import ivf_knn_join
    e = load_table(spark, sf_dir, "embeddings")
    # n_cells stays at the 8 the recall pin was measured at. Round 8
    # measured the alternatives on this isotropic fixture (SCALE.md):
    # occupancy-sized cells (N/250) make candidate work LINEAR in N
    # (13.4 s at sf1.0 vs 171 s with 8 cells) but recall falls to
    # 0.397 — clusterless 64-d data gives cells no structure, so
    # recall ≈ coverage n_assign/n_cells. 3-of-8 coverage is what
    # holds the 0.92 pin; on clustered production embeddings the
    # occupancy-sized plan (plan_knn_join allow_approx=True) is the
    # deployment path, recall re-measured on the target corpus.
    return ivf_knn_join(e, k=3, n_cells=8, n_assign=3)


@query(
    "q_text_redact",
    oracle=r"""
    SELECT doc_id, raw,
           regexp_replace(
             regexp_replace(raw, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>',
                            'g'),
             '\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
    FROM (
      SELECT doc_id,
             'contact user' || cast(doc_id as string)
               || '@example.com or ' || cast(doc_id % 900 + 100 as string)
               || '-' || lpad(cast((doc_id * 7) % 10000 as string), 4, '0')
               || ' re: ' || substring(text, 1, 40) AS raw
      FROM documents
    )
    """,
)
def q_text_redact(spark, sf_dir):
    """PII-style scrubbing: email and phone-shaped spans replaced with
    typed placeholder tokens — the standard pre-training redaction pass.
    Synthesized PII is embedded deterministically (integer-only) so
    both engines construct identical inputs; patterns are global
    regexp_replace (Spark replaces all matches by default, DuckDB needs
    the 'g' flag)."""
    d = load_table(spark, sf_dir, "documents")
    raw = d.selectExpr(
        "doc_id",
        "'contact user' || cast(doc_id as string)"
        " || '@example.com or ' || cast(doc_id % 900 + 100 as string)"
        " || '-' || lpad(cast((doc_id * 7) % 10000 as string), 4, '0')"
        " || ' re: ' || substring(text, 1, 40) AS raw",
    )
    red = F.regexp_replace(
        F.regexp_replace("raw", r"[A-Za-z0-9._]+@[A-Za-z0-9.]+", "<EMAIL>"),
        r"\d{3}-\d{4}", "<PHONE>")
    return raw.select("doc_id", "raw", red.alias("redacted"))


@query(
    "q_embed_normalize",
    oracle=f"""
    WITH {_NORMS_CTE}
    SELECT vec_id,
           round(sqrt(nrm), 4) AS l2_norm,
           round(cast(embedding[1] as double) / sqrt(nrm), 4) + 0.0 AS unit_e0,
           round(cast(embedding[64] as double) / sqrt(nrm), 4) + 0.0 AS unit_e63
    FROM norms
    """,
)
def q_embed_normalize(spark, sf_dir):
    """L2 normalization — the preprocessing step every cosine-based
    retrieval index wants done once at write time (then similarity is a
    plain dot product). Projected to scalars (norm + first/last unit
    components) for the oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(_norm(F.col("embedding")))
    return e.select(
        "vec_id",
        F.round(nrm, 4).alias("l2_norm"),
        F.round(F.element_at("embedding", 1).cast("double") / nrm, 4)
        .alias("unit_e0"),
        F.round(F.element_at("embedding", 64).cast("double") / nrm, 4)
        .alias("unit_e63"),
    )


_NGRAM_PAIRS_SQL = """
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT d.doc_id, d.lang,
             list_sort(list_distinct(list(d.t[gs.i] || ' ' || d.t[gs.i + 1])))
               AS g
      FROM toks d JOIN range(1, 100000) gs(i) ON gs.i <= len(d.t) - 1
      GROUP BY d.doc_id, d.lang
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM grams a
      JOIN grams b ON a.lang = b.lang AND a.doc_id < b.doc_id
                  AND abs(len(a.g) - len(b.g)) <= 10
      WHERE cast(len(list_intersect(a.g, b.g)) as double)
            / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.2
    )
"""


@query(
    "q_dedup_clusters",
    oracle=f"""
    {_NGRAM_PAIRS_SQL.replace("WITH toks", "WITH RECURSIVE toks", 1)},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
    )
    SELECT id AS doc_id, min(r) AS cluster,
           (min(r) <> id) AS is_dup
    FROM reach GROUP BY id
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING: transitive closure of the exact n-gram
    Jaccard pairs (q_dedup_ngram) via iterative min-label propagation
    (operators/cluster.py) — every document labeled with the min doc_id
    of its duplicate component; is_dup marks everything but the keeper.
    The oracle computes the same components with a recursive CTE —
    a genuinely iterative distributed algorithm, still hash-checked.
    """
    from .operators.cluster import connected_components
    d = load_table(spark, sf_dir, "documents")
    g = d.select("doc_id", "lang", word_ngrams(F.col("text"), 2).alias("g"))
    pairs = ngram_jaccard_pairs(g, "doc_id", "lang", "g",
                                tau=0.2, size_band=10)
    labels = connected_components(
        d.select("doc_id"), pairs.select("doc_a", "doc_b"),
        id_col="doc_id", src="doc_a", dst="doc_b")
    return labels.select(
        F.col("id").alias("doc_id"),
        "cluster",
        (F.col("cluster") != F.col("id")).alias("is_dup"),
    )


@query(
    "q_split_train_test",
    oracle="""
    WITH assigned AS (
      SELECT doc_id,
             cast(('0x' || substring(md5(cast(doc_id as string) || ':split'),
                                     1, 4)) as integer) % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'valid'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM assigned GROUP BY 1
    """,
)
def q_split_train_test(spark, sf_dir):
    """Deterministic train/valid/test assignment (90/5/5) by hashing the
    stable document key — the reproducible-split primitive every
    training pipeline needs (rand()-based sampling is neither
    reproducible across runs nor engine-portable; keyed md5 buckets are
    both). Spark conv() and DuckDB '0x' cast read the same hex nibble,
    so assignments match bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))),
        1, 4), 16, 10).cast("int") % 100)
    assigned = d.select("doc_id", bucket.alias("bucket"))
    split = (F.when(F.col("bucket") < 90, "train")
             .when(F.col("bucket") < 95, "valid")
             .otherwise("test"))
    return (assigned.select("doc_id", split.alias("split"))
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc")))


@query(
    "q_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM tok WHERE term != '' GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             tf.tf * cast(round(ln((n.n_docs + 1.0) / (df.df + 1.0)), 6)
                          as decimal(18,6)) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tf, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rnk
      FROM scored
    )
    SELECT doc_id, term, tf,
           cast(round(score, 4) as double) AS tfidf, rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def q_tfidf(spark, sf_dir):
    """Top-3 terms per document by TF-IDF — the classic keyword/term-
    weighting pass of a text-analysis pipeline. Shuffle shape: one
    explode + groupBy (doc_id, term) for TF (map-side combinable), one
    tiny re-agg of THAT relation for DF (vocab-sized, not corpus-
    sized), broadcast back. Ranking is exact: idf is ln() rounded to
    6dp then widened to decimal, so score = tf x idf6 is an exact
    decimal — the per-doc top-3 ordering cannot be perturbed by float
    summation order on either engine."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
           .filter(F.col("term") != ""))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    idf6 = F.round(
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
    ).cast("decimal(18,6)")
    # no broadcast hint on the DF relation: AQE broadcasts it while the
    # vocabulary fits the threshold and falls back to a shuffled hash
    # join for web-scale vocabularies — a forced hint would pin the
    # wrong strategy at exactly the scale that needs the fallback
    scored = (tf.join(df, "term")
              .crossJoin(F.broadcast(n))
              .select("doc_id", "term", "tf",
                      (F.col("tf") * idf6).alias("score")))
    rnk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("score"), "term"))
    return (scored.withColumn("rnk", rnk)
            .filter(F.col("rnk") <= 3)
            .select("doc_id", "term", "tf",
                    # round the DECIMAL score, then cast (q_entropy
                    # sf0.1 lesson): tf x idf6 can end exactly in
                    # ...50, and rounding the double cast flips that
                    # tie differently per engine
                    F.round(F.col("score"), 4).cast("double")
                    .alias("tfidf"),
                    "rnk"))


@query(
    "q_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    toks AS (SELECT doc_id, term FROM tok WHERE term != ''),
    vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
    tot AS (SELECT sum(cnt) AS total FROM vocab),
    logp AS (
      SELECT term,
             cast(round(ln(cast(cnt as double) / cast(total as double)), 6)
                  as decimal(18,6)) AS logp6
      FROM vocab CROSS JOIN tot
    ),
    summed AS (
      SELECT t.doc_id AS doc_id, count(*) AS n_tokens,
             cast(sum(l.logp6 * 1000000) as bigint) AS s6
      FROM toks t JOIN logp l USING (term)
      GROUP BY 1
    )
    SELECT doc_id, n_tokens,
           cast(CASE WHEN s6 >= 0
                THEN (2 * s6 * 10000 + n_tokens * 1000000)
                     // (2 * n_tokens * 1000000)
                ELSE -((2 * (-s6) * 10000 + n_tokens * 1000000)
                       // (2 * n_tokens * 1000000)) END as double)
             / 10000.0 AS avg_logp
    FROM summed
    """,
)
def q_lm_score(spark, sf_dir):
    """Unigram language-model scoring: corpus term frequencies define
    p(w); each document gets its mean log-probability — the cheap
    fluency / outlier signal used to filter pretraining corpora (a
    gibberish or wrong-language doc scores far below the mode). The
    vocabulary is corpus-global but vocab-sized, so it broadcasts; the
    per-doc score is one explode + one groupBy(doc_id). Log-probs are
    rounded to 6dp and summed as exact decimals, and the 4dp mean is
    computed by EXACT INTEGER half-away-from-zero division — the r9
    sf1.0 sweep caught a doc whose true mean sat exactly on the 4dp
    half boundary (-4.555050), where Spark's decimal HALF_UP and
    DuckDB's double round() disagree; integer arithmetic makes the
    half case identical on both engines (the q_holt_smoothing
    discipline applied to a quotient)."""
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
            .filter(F.col("term") != ""))
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    logp = (vocab.crossJoin(F.broadcast(tot))
            .select("term",
                    F.round(F.log(F.col("cnt").cast("double")
                                  / F.col("total").cast("double")), 6)
                    .cast("decimal(18,6)").alias("logp6")))
    # same rationale as q_tfidf: vocab-sized relation, AQE chooses
    summed = (toks.join(logp, "term")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_tokens"),
                   F.sum((F.col("logp6") * 1000000).cast("long"))
                   .alias("s6")))
    avg4 = F.expr(
        "CASE WHEN s6 >= 0 THEN"
        " (2 * s6 * 10000 + n_tokens * 1000000)"
        " DIV (2 * n_tokens * 1000000)"
        " ELSE -((2 * (-s6) * 10000 + n_tokens * 1000000)"
        " DIV (2 * n_tokens * 1000000)) END")
    return summed.select(
        "doc_id", "n_tokens",
        (avg4.cast("double") / 10000.0).alias("avg_logp"))


@query(
    "q_dedup_fuzzy",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang, n_chars // 20 AS band,
             substring(text, 1, 40) AS pfx
      FROM documents
    )
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           a.lang AS lang,
           levenshtein(a.pfx, c.pfx) AS edit_dist
    FROM b a JOIN b c
      ON a.lang = c.lang AND a.doc_id < c.doc_id
     AND c.band BETWEEN a.band - 1 AND a.band + 1
    WHERE levenshtein(a.pfx, c.pfx) <= 15
    """,
)
def q_dedup_fuzzy(spark, sf_dir):
    """Edit-distance near-dup pairs — the fuzzy rung of the dedup
    ladder (exact sig -> ngram Jaccard -> MinHash -> SimHash -> edit
    distance), for the typo-level mutations token-set methods miss.
    Levenshtein is O(len^2) per pair, so it NEVER runs all-pairs: docs
    are blocked on (lang, 20-char length band) with ADJACENT-band
    probing — each left row probes bands {b-1, b, b+1} via explode, so
    the blocking stays a pure equi-join (shuffle on (lang, band)) yet
    is lossless for any pair within 20 chars of each other (a pair
    straddling a band boundary lands in adjacent bands and is still
    probed; each qualifying pair matches exactly one probe, so no
    dedup pass is needed). The quadratic work happens only inside
    bands on a 40-char prefix. Both engines implement classic
    unit-cost Levenshtein, so the distances hash-match exactly."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select("doc_id", "lang",
                 F.expr("n_chars DIV 20").alias("band"),
                 F.substring("text", 1, 40).alias("pfx"))
    a = (b.withColumn("probe", F.explode(F.array(
            F.col("band") - 1, F.col("band"), F.col("band") + 1)))
         .select(F.col("doc_id").alias("a_id"), F.col("lang").alias("a_lang"),
                 F.col("pfx").alias("a_pfx"), "probe"))
    c = b
    dist = F.levenshtein(F.col("a_pfx"), F.col("pfx"))
    return (a.join(c, (F.col("a_lang") == F.col("lang"))
                   & (F.col("probe") == F.col("band"))
                   & (F.col("a_id") < F.col("doc_id")))
            .filter(dist <= 15)
            .select(F.col("a_id").alias("doc_a"),
                    F.col("doc_id").alias("doc_b"),
                    F.col("a_lang").alias("lang"),
                    dist.alias("edit_dist")))


@query(
    "q_multimodal_chunk",
    oracle="""
    WITH p AS (
      SELECT doc_id, lower(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    idx AS (
      SELECT doc_id, hx,
             unnest(range(0, cast(ceil(n_bytes / 64.0) as bigint)))
               AS chunk_idx
      FROM p
    )
    SELECT doc_id, chunk_idx,
           cast(length(substring(hx, chunk_idx * 128 + 1, 128)) / 2
                as bigint) AS chunk_bytes,
           md5(substring(hx, chunk_idx * 128 + 1, 128)) AS chunk_md5
    FROM idx
    """,
)
def q_multimodal_chunk(spark, sf_dir):
    """Fixed-size chunking of opaque binary payloads with per-chunk
    content fingerprints — the content-addressable-storage primitive
    (dedup at the CHUNK level is how petabyte media stores shrink:
    identical 64-byte chunks share storage regardless of which blob
    they sit in). Pure expressions end-to-end: sequence+explode makes
    the chunk index (no UDF), substring slices the binary column
    JVM-side, md5 fingerprints it — embarrassingly parallel, zero
    shuffle. Companion to q_multimodal_meta's mapInPandas decode path:
    chunking needs no Python at all."""
    d = load_table(spark, sf_dir, "documents")
    p = (multimodal.attach_payload(d)
         # hex-encode once: DuckDB has no BLOB slicing/md5, so the
         # cross-engine chunk identity is the lowercase hex rendering
         # (injective — equal hex slices <=> equal byte chunks); Spark
         # slices the binary's hex the same way, JVM-side
         .select("doc_id",
                 F.lower(F.hex("payload")).alias("hx"),
                 F.octet_length("payload").alias("n_bytes")))
    n_chunks = F.ceil(F.col("n_bytes") / F.lit(64.0)).cast("bigint")
    sub = "substring(hx, cast(chunk_idx * 128 + 1 as int), 128)"
    return (p.select("doc_id", "hx",
                     F.explode(F.sequence(F.lit(0).cast("bigint"),
                                          n_chunks - 1)).alias("chunk_idx"))
            .select("doc_id", "chunk_idx",
                    (F.length(F.expr(sub)) / 2).cast("bigint")
                    .alias("chunk_bytes"),
                    F.md5(F.expr(sub)).alias("chunk_md5")))


@query(
    "q_boilerplate_passages",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(range(0, cast(ceil(len(w) / 4.0) as bigint))) AS i
      FROM t
    ),
    p AS (
      SELECT doc_id,
             md5(array_to_string(w[(i*4+1):(i*4+4)], ' ')) AS h
      FROM idx
    ),
    c AS (
      SELECT h, count(distinct doc_id) AS nd FROM p GROUP BY h
    )
    SELECT p.doc_id,
           count(*) AS n_passages,
           cast(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) as bigint)
             AS n_boiler,
           cast(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) * 10000
                as bigint) // count(*) AS boiler_bp
    FROM p JOIN c USING (h)
    GROUP BY p.doc_id
    """,
)
def q_boilerplate_passages(spark, sf_dir):
    """Cross-document boilerplate detection, C4/RefinedWeb-style: chop
    every document into non-overlapping 4-token passages, count how
    many DISTINCT documents each exact passage occurs in, and score
    each document by its share of shared passages (headers, footers,
    cookie banners at web scale). The global frequency table groups by
    the passage's md5, so the shuffle carries (16-byte hash, doc_id) —
    never passage text — and the per-doc rollup joins back on the same
    hash. Both shuffles are plain hash exchanges on high-cardinality
    keys; map-side partial counts keep the frequency agg skew-safe.
    boiler_bp is integer basis points (exact div, engine-portable)."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    n_pass = F.ceil(F.size("w") / F.lit(4.0)).cast("bigint")
    p = (w.select("doc_id", "w",
                  F.explode(F.sequence(F.lit(0).cast("bigint"),
                                       n_pass - 1)).alias("i"))
         .select("doc_id",
                 F.md5(F.array_join(
                     F.slice("w", (F.col("i") * 4 + 1).cast("int"), 4),
                     " ")).alias("h")))
    c = p.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    return (p.join(c, "h")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_passages"),
                 F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
                 .cast("bigint").alias("n_boiler"))
            .select("doc_id", "n_passages", "n_boiler",
                    F.expr("n_boiler * 10000 div n_passages")
                    .alias("boiler_bp")))


@query(
    "q_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             cast(len(string_split(text, ' ')) as bigint) AS n_tok
      FROM documents
    )
    SELECT doc_id, lang, n_tok,
           (cast(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as bigint) - n_tok) // 256 AS bin_id
    FROM t
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing — the batch-assembly step of LLM
    training: assign documents to fixed-budget bins (256 tokens) by
    cumulative token count within each language stream, ordered by
    doc_id. bin_id = floor(tokens_before_this_doc / budget) is the
    standard streaming-concat packing (a doc may straddle its bin
    boundary; the trainer's concat-then-chunk consumes exactly this
    layout). One shuffle — the same partition-by-lang exchange any
    per-lang groupBy pays — and the running sum is integer-exact, so
    bin assignment is reproducible across engines and partitionings.
    At 100 TB the window partitions by (lang, shard) to bound state."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", token_count(F.col("text")).alias("n_tok"))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (t.withColumn("cum", F.sum("n_tok").over(w))
            .select("doc_id", "lang", "n_tok",
                    F.expr("(cum - n_tok) div 256").alias("bin_id")))


@query(
    "q_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             list_distinct(list(t[gs.i] || ' ' || t[gs.i + 1]
                                || ' ' || t[gs.i + 2])) AS g
      FROM toks JOIN range(1, 100000) gs(i) ON gs.i <= len(t) - 2
      GROUP BY doc_id, source
    ),
    x AS (SELECT doc_id, source, unnest(g) AS gram FROM grams),
    bench AS (SELECT DISTINCT gram FROM x WHERE source = 'src0'),
    tr AS (SELECT doc_id, gram FROM x WHERE source <> 'src0')
    SELECT tr.doc_id, count(*) AS n_grams,
           cast(sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END)
                as bigint) AS n_hits,
           cast(max(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END)
                as bigint) AS contaminated
    FROM tr LEFT JOIN bench ON tr.gram = bench.gram
    GROUP BY tr.doc_id
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination — the eval-integrity gate every LLM
    training pipeline runs before the dedup ladder: flag any training
    document sharing an exact word 3-gram with the held-out benchmark
    corpus (here: source 'src0' stands in for the eval set). Distinct
    from near-dup detection: this is cross-corpus MEMBERSHIP, not
    within-corpus similarity. The benchmark gram set is tiny relative
    to the corpus (eval suites are ~1e5 docs even when training data
    is 100 TB), so it broadcasts and the full-corpus side never
    shuffles grams — the only exchange is the per-doc rollup of
    (doc_id, partial counts). If the benchmark ever outgrows
    broadcast, the same query degrades gracefully to a shuffled hash
    join on the gram key."""
    d = load_table(spark, sf_dir, "documents")
    g = d.select("doc_id", "source",
                 F.explode(word_ngrams(F.col("text"), 3)).alias("gram"))
    bench = (g.filter(F.col("source") == "src0")
             .select("gram").distinct().withColumn("hit", F.lit(1)))
    tr = g.filter(F.col("source") != "src0")
    hit = F.coalesce(F.col("hit"), F.lit(0))
    return (tr.join(F.broadcast(bench), "gram", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.sum(hit).cast("bigint").alias("n_hits"),
                 F.max(hit).cast("bigint").alias("contaminated")))


@query(
    "q_token_pmi",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    big AS (
      SELECT t[gs.i] AS w1, t[gs.i + 1] AS w2, count(*) AS c_ab
      FROM toks JOIN range(1, 100000) gs(i) ON gs.i <= len(t) - 1
      GROUP BY w1, w2
    ),
    uni AS (
      SELECT u.w AS w, count(*) AS c
      FROM (SELECT unnest(t) AS w FROM toks) u
      GROUP BY u.w
    ),
    tot AS (
      SELECT (SELECT cast(sum(c_ab) as bigint) FROM big) AS nb,
             (SELECT cast(sum(c) as bigint) FROM uni) AS nu
    )
    SELECT w1, w2, c_ab,
           round(ln((cast(c_ab as double) * nu * nu)
                    / (cast(nb as double) * ua.c * ub.c)), 6) AS pmi
    FROM big
    JOIN uni ua ON ua.w = w1
    JOIN uni ub ON ub.w = w2
    CROSS JOIN tot
    WHERE c_ab >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 40
    """,
)
def q_token_pmi(spark, sf_dir):
    """Pointwise mutual information over adjacent token pairs — the
    collocation / phrase-mining primitive behind tokenizer merge rules
    and multi-word-expression detection. All counts are exact bigints
    from two map-side-combinable aggregations (positional bigrams via
    sequence+explode, unigrams via explode); the PMI itself is ONE
    ln() over a ratio of exact integers — both engines compute the
    identical IEEE double before the 6dp edge rounding (hashsafe
    discipline for transcendentals). Unigram totals broadcast back
    onto the bigram relation; the top-40 cut orders by (pmi, w1, w2)
    for a deterministic boundary, compiling to TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("t"))
    big = (toks.select(
        F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t")
        .select(F.element_at("t", F.col("i")).alias("w1"),
                F.element_at("t", F.col("i") + 1).alias("w2"))
        .groupBy("w1", "w2").agg(F.count("*").alias("c_ab")))
    uni = (toks.select(F.explode("t").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c")))
    tot = big.agg(F.sum("c_ab").cast("bigint").alias("nb")).crossJoin(
        uni.agg(F.sum("c").cast("bigint").alias("nu")))
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("ca"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    pmi = F.round(F.log(
        (F.col("c_ab").cast("double") * F.col("nu") * F.col("nu"))
        / (F.col("nb").cast("double") * F.col("ca") * F.col("cb"))), 6)
    return (big.filter(F.col("c_ab") >= 5)
            .join(F.broadcast(ua), "w1")
            .join(F.broadcast(ub), "w2")
            .crossJoin(F.broadcast(tot))
            .select("w1", "w2", "c_ab", pmi.alias("pmi"))
            .orderBy(F.desc("pmi"), "w1", "w2")
            .limit(40))


@query(
    "q_dedup_keep_best",
    oracle="""
    WITH sig AS (
      SELECT doc_id, n_chars,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS sig
      FROM documents
    ),
    ranked AS (
      SELECT sig, doc_id, n_chars,
             row_number() OVER (PARTITION BY sig
                                ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY sig) AS n_members
      FROM sig
    )
    SELECT sig, doc_id AS keep_doc_id, n_chars AS keep_chars, n_members
    FROM ranked WHERE rn = 1 AND n_members > 1
    """,
)
def q_dedup_keep_best(spark, sf_dir):
    """Dedup with a keep-BEST policy: within each exact token-set
    duplicate group, survive the longest document (ties to the lowest
    doc_id) — the curation form of q_dedup_tokenset, which keeps
    min-id. One hash-groupBy with a struct-max aggregate
    (max(struct(n_chars, -doc_id)) — lexicographic struct comparison
    gives the deterministic argmax without a window sort); only
    multi-member groups are emitted.

    Scale: identical shuffle shape to q_dedup_tokenset — (16 B sig,
    id, chars) triples, map-side-combinable aggregate, never document
    text; the oracle uses the window formulation to prove the argmax
    semantics match."""
    d = load_table(spark, sf_dir, "documents")
    best = F.max(F.struct(F.col("n_chars"),
                          (-F.col("doc_id")).alias("neg_id")))
    return (d.select(tokenset_signature(F.col("text")).alias("sig"),
                     "doc_id", "n_chars")
            .groupBy("sig")
            .agg(best.alias("b"), F.count("*").alias("n_members"))
            .filter(F.col("n_members") > 1)
            .select("sig",
                    (-F.col("b.neg_id")).alias("keep_doc_id"),
                    F.col("b.n_chars").alias("keep_chars"),
                    "n_members"))


@query(
    "q_text_normalize",
    oracle="""
    WITH norm AS (
      SELECT lang, text, n_chars,
             trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g')) AS ntext
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           count(CASE WHEN ntext <> text THEN 1 END) AS n_changed,
           cast(sum(n_chars) as bigint) AS chars_before,
           cast(sum(length(ntext)) as bigint) AS chars_after,
           count(DISTINCT md5(ntext)) AS n_distinct_norm
    FROM norm GROUP BY lang
    """,
)
def q_text_normalize(spark, sf_dir):
    """Text normalization pass (lowercase → strip non-alphanumerics →
    collapse runs of spaces → trim) with per-lang change accounting and
    the post-normalization distinct count — the canonicalization stage
    that runs before exact dedup so near-identical casings/punctuation
    collapse into one signature.

    Scale: the normalization chain is pure codegen string expressions
    (one scan, no UDF); the only shuffle is the per-lang agg, and the
    distinct-count ships 16 B md5s, not text."""
    d = load_table(spark, sf_dir, "documents")
    ntext = F.trim(F.regexp_replace(F.regexp_replace(
        F.lower(F.col("text")), "[^a-z0-9 ]+", ""), " +", " "))
    n = d.select("lang", "text", "n_chars", ntext.alias("ntext"))
    return (n.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.count(F.when(F.col("ntext") != F.col("text"), 1))
                 .alias("n_changed"),
                 F.sum("n_chars").alias("chars_before"),
                 F.sum(F.length("ntext")).alias("chars_after"),
                 F.countDistinct(F.md5("ntext")).alias("n_distinct_norm")))


def _minhash_reagg_oracle(k: int = 16) -> str:
    mins = ",\n             ".join(
        f"min(cast(('0x' || substring(md5(g || ':{i}'), 1, 15)) as bigint))"
        f" AS s{i}" for i in range(k))
    matches = " + ".join(
        f"CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END" for i in range(k))
    return f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT DISTINCT d.source, d.t[gs.i] || ' ' || d.t[gs.i + 1] AS g
      FROM toks d JOIN range(1, 100000) gs(i) ON gs.i <= len(d.t) - 1
    ),
    sig AS (
      SELECT source,
             {mins}
      FROM grams GROUP BY source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           round(({matches}) / {k}.0, 4) AS est_jaccard
    FROM sig a JOIN sig b ON a.source < b.source
    """


def minhash_source_signatures(g, k: int = 16):
    """16 md5-derived MinHash components per source over the distinct
    (source, shingle) relation — ONE map-side-combinable groupBy, no
    row multiplication (the per-component hash is an expression, not an
    explode)."""
    def h(i):
        return F.conv(F.substring(
            F.md5(F.concat(F.col("g"), F.lit(f":{i}"))), 1, 15),
            16, 10).cast("bigint")
    return g.groupBy("source").agg(
        *[F.min(h(i)).alias(f"s{i}") for i in range(k)])


@query("q_minhash_reagg", oracle=_minhash_reagg_oracle())
def q_minhash_reagg(spark, sf_dir):
    """Mergeable MinHash signatures, re-aggregated: a 16-component
    md5-derived MinHash signature per SOURCE (over the union of its
    docs' bigram shingles), then pairwise source similarity estimated
    as the fraction of matching components — the sketch-rollup pattern
    (cf. q_agg_sketch_reagg's HLL form): per-shard signatures combine
    by elementwise min, so corpus-level similarity never rescans
    documents. md5-derived hashing (unlike the murmur3 doc-level
    q_dedup_minhash) makes every component engine-portable, so the
    estimates hash-check exactly. Mergeability itself
    (sig(A∪B) == elementwise_min(sig(A), sig(B))) is asserted in
    tests/test_llm_ops.py.

    Scale: distinct (source, shingle) relation → ONE map-side-
    combinable groupBy producing 16 mins per source; the pair join
    runs on the |sources|-row sketch relation, never the corpus."""
    k = 16
    d = load_table(spark, sf_dir, "documents")
    g = (d.select("source", F.explode(word_ngrams(F.col("text"), 2))
                  .alias("g")).distinct())
    # persist the |sources|-row sketch relation: without it the
    # self-join re-shingles and re-aggregates the corpus on BOTH sides
    # (plan gate: tests/test_plans.py)
    sig = minhash_source_signatures(g, k).persist()
    a, b = sig.alias("a"), sig.alias("b")
    matches = " + ".join(
        f"(CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END)" for i in range(k))
    return (a.join(b, F.col("a.source") < F.col("b.source"))
            .select(F.col("a.source").alias("source_a"),
                    F.col("b.source").alias("source_b"),
                    F.round(F.expr(matches) / k, 4).alias("est_jaccard")))


@query(
    "q_dedup_semantic",
    oracle=f"""
    WITH RECURSIVE {_PAIR_COS_CTE.lstrip().removeprefix("WITH ") if _PAIR_COS_CTE.lstrip().startswith("WITH ") else _PAIR_COS_CTE},
    sem_pairs AS (
      SELECT va, vb FROM paircos WHERE cos_raw >= 0.35
    ),
    edges AS (
      SELECT va AS a, vb AS b FROM sem_pairs
      UNION ALL
      SELECT vb AS a, va AS b FROM sem_pairs
    ),
    reach AS (
      SELECT vec_id AS id, vec_id AS r FROM embeddings
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
    )
    SELECT id AS vec_id, min(r) AS cluster,
           (min(r) <> id) AS is_dup
    FROM reach GROUP BY id
    """,
)
def q_dedup_semantic(spark, sf_dir):
    """SEMANTIC dedup, end to end: embedding-cosine near-dup pairs
    (label-blocked, cos >= 0.35 — the q_embed_neardup predicate) closed
    transitively into duplicate components (operators/cluster.py
    min-label propagation), every vector labeled with its component's
    min vec_id. The cluster form collapses similarity CHAINS (a~b~c
    with cos(a,c) < tau) that the greedy pairwise flag in
    q_embed_neardup cannot — this is the dedup actually applied before
    training on embedding-near-duplicate corpora. Oracle: recursive-CTE
    components over the same decimal-exact cosine pairs, hash-checked.

    Scale: the pairwise step is the label-blocked exact form (ground
    truth); at 100 TB swap in the IVF-blocked candidate pairs
    (q_knn_join_blocked) and the component step is unchanged —
    iteration-capped, localCheckpointed, shuffle = (id, label) pairs."""
    from .operators.cluster import connected_components
    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    a = fan_out_scan(n, "vec_id").alias("a")
    b = n.alias("b")
    cos = (dot_col(F.col("a.embedding"), F.col("b.embedding"))
           / F.sqrt(F.col("a.nrm") * F.col("b.nrm")))
    fast = (similarity.dot_fast_col(F.col("a.embedding"),
                                    F.col("b.embedding"))
            / F.sqrt(F.col("a.nrm") * F.col("b.nrm")))
    pairs = (a.join(b, (F.col("a.label") == F.col("b.label"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .filter(fast >= 0.35 - 1e-6)  # codegen prefilter (r7)
             .select(F.col("a.vec_id").alias("va"),
                     F.col("b.vec_id").alias("vb"),
                     cos.alias("cos_raw"))
             .filter(F.col("cos_raw") >= 0.35))
    labels = connected_components(
        e.select("vec_id"), pairs.select("va", "vb"),
        id_col="vec_id", src="va", dst="vb")
    return labels.select(
        F.col("id").alias("vec_id"), "cluster",
        (F.col("cluster") != F.col("id")).alias("is_dup"))


@query(
    "q_dedup_url",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://WWW.' || source || '.example.com/p/'
               || cast(doc_id % 40 as varchar)
               || CASE WHEN doc_id % 3 = 0
                       THEN '/?utm_source=feed&ref=' || cast(doc_id as varchar)
                       WHEN doc_id % 3 = 1 THEN '/'
                       ELSE '' END AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(url), '^https?://(www\\.)?', ''),
                 '[?#].*$', ''),
               '/+$', '') AS curl
      FROM urls
    )
    SELECT curl, count(*) AS n_docs, min(doc_id) AS keep_doc_id
    FROM canon GROUP BY curl HAVING count(*) > 1
    """,
)
def q_dedup_url(spark, sf_dir):
    """URL canonicalization dedup — the first pass of every web-corpus
    pipeline: scheme/www-prefix strip, lowercase, query/fragment strip,
    trailing-slash trim, then exact group on the canonical form (keep
    min doc_id). Fixture docs carry no URL column, so deterministic
    messy URLs (case, www, utm params, trailing slashes varying by
    doc_id) are synthesized in-query from (source, doc_id) — both
    engines build the identical strings, so the oracle checks the
    CANONICALIZER, not the synthesis.

    Scale: canonicalization is a codegen regex chain in the scan
    projection; the group ships canonical-url + id only (same shuffle
    shape as q_dedup_tokenset). Regexes stay in the Java∩RE2 subset."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://WWW."), F.col("source"), F.lit(".example.com/p/"),
        (F.col("doc_id") % 40).cast("string"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("/?utm_source=feed&ref="),
                        F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 3 == 1, F.lit("/"))
        .otherwise(F.lit("")))
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(url), r"^https?://(www\.)?", ""),
            r"[?#].*$", ""),
        r"/+$", "")
    return (d.select("doc_id", curl.alias("curl"))
            .groupBy("curl")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1))


@query(
    "q_tfidf_cosine_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM tok WHERE term != '' GROUP BY 1, 2
    ),
    stats AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln((stats.n + 1.0) / (df.df + 1.0)) AS w
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats
    ),
    nrm AS (
      SELECT doc_id,
             sqrt(cast(sum(cast(w * w as {DEC})) as double)) AS nrm
      FROM w GROUP BY 1
    ),
    u AS (
      SELECT w.doc_id, w.term, w.w / nrm.nrm AS u
      FROM w JOIN nrm ON w.doc_id = nrm.doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(cast(sum(cast(a.u * b.u as {DEC})) as double), 4) AS cos
    FROM u a JOIN u b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING cast(sum(cast(a.u * b.u as {DEC})) as double) >= 0.9
    """,
)
def q_tfidf_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine similarity join — the weighted-set rung of
    the similarity ladder (dense embeddings: q_similarity_pairs; binary
    token sets: q_dedup_ngram; THIS: tf-idf-weighted terms, the
    classic sparse-vector near-dup/plagiarism detector). Per-doc
    weights w = tf·ln((N+1)/(df+1)) are l2-normalized, pairwise cosine
    is the posting equi-join on term summing u_a·u_b — the SAME
    inverted-index economics as the co-count dedup (Σ|posting|² work,
    hot terms down-weighted by idf exactly where they are posting-list
    hot), with decimal-exact reductions so the scores hash-match.

    Scale: idf needs one |vocab|-row aggregate; norms one |docs|-row
    aggregate. The pair computation is PLANNED (VERDICT r8 item 4):
    on sparse real vocabularies the prefix filter (Chaudhuri/Ganti/
    Kaushik ICDE'06; Bayardo/Ma/Srikant "Scaling Up All Pairs
    Similarity Search", WWW'07) indexes only each doc's head under a
    GLOBAL term order (ascending df, tie term — rarest-first, so
    prefix postings are the SHORTEST lists and idf puts the weight
    mass in the head) — the minimal head whose remaining tail has
    l2 norm < t. With a global order the filter is SYMMETRIC: for
    any pair with cos >= t the two prefixes must share a term (if
    P(x) and P(y) are disjoint, every shared term sorts after the
    shorter prefix's boundary, i.e. lies in that doc's tail, so
    cos = x_tail·y <= ||x_tail|| < t) — so candidates come from the
    prefix-vs-prefix self-join, quadratically smaller than
    prefix-vs-full on low-similarity corpora, and only candidate
    pairs are exactly verified. The
    filter is LOSSLESS (a 1e-6 threshold margin covers the float
    tail-norm computation), so the quadratic-twin oracle is unchanged
    and the hash check doubles as the losslessness test. The planner
    valve is the measured prefix shrink ratio |prefix|/|postings|
    (two bounded counts on persisted frames): below 0.5 the filtered
    plan runs (sparse corpora — prefixes are a vanishing fraction as
    df falls, the df-bound that makes this near-linear); above it the
    direct partial-aggregated posting join is cheaper (dense fixture:
    candidates ~ all co-occurring pairs, and materializing the
    distinct candidate set just adds a shuffle). At 100 TB real
    vocabularies are Heaps-sparse, so the prefix path is the default
    in practice; hot terms additionally carry ~zero idf weight, so a
    max_df valve composes for adversarial skew."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(F.split("text", " ")).alias("term"))
    tf = (tok.filter(F.col("term") != "")
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    tf = tf.persist()
    stats = tf.select(F.countDistinct("doc_id").alias("n"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (tf.join(dfreq, "term").crossJoin(F.broadcast(stats))
         .select("doc_id", "term", "df",
                 (F.col("tf") * F.log((F.col("n") + 1.0)
                                      / (F.col("df") + 1.0))).alias("w")))
    nrm = (w.groupBy("doc_id")
           .agg(F.sqrt(F.sum((F.col("w") * F.col("w")).cast(DEC))
                       .cast("double")).alias("nrm")))
    u = (w.join(nrm, "doc_id")
         .select("doc_id", "term", "df",
                 (F.col("w") / F.col("nrm")).alias("u"))
         .persist())

    t = 0.9
    # Global term order = (df asc, term asc): tail2 is the l2 mass of
    # the doc's common-term tail; keep a posting in the prefix index
    # while the tail STARTING at it still reaches t (1e-6 margin
    # covers the float tail-norm computation, so the filter is
    # lossless and the unchanged quadratic oracle doubles as the
    # losslessness check).
    win = (W.partitionBy("doc_id").orderBy("df", "term")
           .rowsBetween(W.currentRow, W.unboundedFollowing))
    tail2 = (F.sum((F.col("u") * F.col("u")).cast(DEC)).over(win)
             .cast("double"))
    prefix = (u.withColumn("_t2", tail2)
              .filter(F.col("_t2") >= (t - 1e-6) ** 2)
              .select("doc_id", "term").persist())
    n_post = u.count()
    n_pre = prefix.count()

    if n_pre < 0.5 * n_post:
        # Sparse corpus: symmetric prefix-vs-prefix candidates +
        # exact verify of candidate pairs only.
        cand = (prefix.alias("p").join(prefix.alias("q"), "term")
                .filter(F.col("p.doc_id") < F.col("q.doc_id"))
                .select(F.col("p.doc_id").alias("doc_a"),
                        F.col("q.doc_id").alias("doc_b"))
                .distinct())
        av = (cand.join(u.alias("a"), F.col("a.doc_id") == F.col("doc_a"))
              .select("doc_a", "doc_b", F.col("a.term").alias("_term"),
                      F.col("a.u").alias("ua")))
        return (av.join(u.alias("b"),
                        (F.col("b.doc_id") == F.col("doc_b"))
                        & (F.col("b.term") == F.col("_term")))
                .groupBy("doc_a", "doc_b")
                .agg(F.sum((F.col("ua") * F.col("b.u")).cast(DEC))
                     .cast("double").alias("_c"))
                .filter(F.col("_c") >= t)
                .select("doc_a", "doc_b", F.round("_c", 4).alias("cos")))

    a, b = u.alias("ua"), u.alias("ub")
    return (a.join(b, (F.col("ua.term") == F.col("ub.term"))
                   & (F.col("ua.doc_id") < F.col("ub.doc_id")))
            .groupBy(F.col("ua.doc_id").alias("doc_a"),
                     F.col("ub.doc_id").alias("doc_b"))
            .agg(F.sum((F.col("ua.u") * F.col("ub.u")).cast(DEC))
                 .cast("double").alias("_c"))
            .filter(F.col("_c") >= t)
            .select("doc_a", "doc_b", F.round("_c", 4).alias("cos")))


@query(
    "q_text_winnowing",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(text) - 7, 1) + 1),
               i -> list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(range(0, 8),
                     j -> ascii(substring(text, i + j, 1))::BIGINT)),
                 (acc, x) -> (acc * 131 + x) % 1000000007)) AS hs
      FROM documents WHERE length(text) >= 11
    ),
    fp AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(hs) - 2),
               i -> list_min(hs[i:i+3]))) AS fps
      FROM g
    )
    SELECT doc_id,
           len(fps) AS n_fps,
           list_min(fps) AS fp_min,
           list_max(fps) AS fp_max,
           cast(list_sum(fps) as bigint) AS fp_sum
    FROM fp
    """,
)
def q_text_winnowing(spark, sf_dir):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS local fingerprinting algorithm): polynomial rolling-hash
    values over character 8-grams (h = fold (acc·131 + code) mod 1e9+7
    — the Karp-Rabin hash family), then the minimum hash of every
    window of 4 consecutive gram hashes, deduplicated — the guarantee
    is that any substring match of length >= w+k-1 = 11 shares at least
    one selected fingerprint between documents. Exact integer
    arithmetic end-to-end, so the fingerprint sets hash-match across
    engines (summarized as count/min/max/checksum per doc).

    Scale: pure per-row array expressions, zero shuffle. The per-gram
    fold here is O(k) per position (columnar engines can't express the
    O(1) rolling recurrence); the mapInPandas path would vectorize the
    true O(n) prefix-hash recurrence when k grows — same fingerprints,
    same downstream."""
    d = load_table(spark, sf_dir, "documents")
    d = d.filter(F.length("text") >= 11)
    hs = F.expr("""
        transform(sequence(1, greatest(length(text) - 7, 1)),
          i -> aggregate(sequence(0, 7), 0L,
                 (acc, j) -> (acc * 131
                              + ascii(substring(text, i + j, 1)))
                             % 1000000007))
    """)
    fps = F.expr("""
        array_distinct(transform(sequence(1, size(hs) - 3),
          i -> array_min(slice(hs, i, 4))))
    """)
    return (d.select("doc_id", hs.alias("hs"))
            .select("doc_id", fps.alias("fps"))
            .select("doc_id",
                    F.size("fps").alias("n_fps"),
                    F.array_min("fps").alias("fp_min"),
                    F.array_max("fps").alias("fp_max"),
                    F.expr("aggregate(fps, 0L, (a, x) -> a + x)")
                    .alias("fp_sum")))


def _corpus_pipeline_oracle() -> str:
    stop = lexicon_count_sql("text", EN_STOPWORDS)
    qual = quality_score_sql("n_tok", "n_dist", "n_chars", "n_stop")
    return f"""
    WITH base AS (
      SELECT doc_id, text, source, n_chars,
             len(string_split(text, ' ')) AS n_tok,
             len(list_distinct(string_split(text, ' '))) AS n_dist,
             {stop} AS n_stop
      FROM documents
    ),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY text
                                     ORDER BY doc_id) AS rn
        FROM base) WHERE rn = 1
    ),
    lang AS (
      SELECT * FROM dedup
      WHERE cast(n_stop as double) / n_tok >= 0.05
    ),
    qual AS (SELECT * FROM lang WHERE {qual} >= 0.9),
    toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
             FROM base),
    x AS (
      SELECT doc_id, source,
             t[gs.i] || ' ' || t[gs.i + 1] || ' ' || t[gs.i + 2] AS gram
      FROM toks JOIN range(1, 100000) gs(i) ON gs.i <= len(t) - 2
    ),
    bench AS (SELECT DISTINCT gram FROM x WHERE source = 'src0'),
    contaminated AS (
      SELECT DISTINCT x.doc_id FROM x JOIN bench USING (gram)
      WHERE x.source <> 'src0'
    ),
    clean AS (
      SELECT q.* FROM qual q
      WHERE q.source <> 'src0'
        AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT '1_input' AS stage, cast(count(*) as bigint) AS n_docs,
           cast(sum(n_tok) as bigint) AS n_tokens FROM base
    UNION ALL SELECT '2_dedup', count(*), cast(sum(n_tok) as bigint)
    FROM dedup
    UNION ALL SELECT '3_langid', count(*), cast(sum(n_tok) as bigint)
    FROM lang
    UNION ALL SELECT '4_quality', count(*), cast(sum(n_tok) as bigint)
    FROM qual
    UNION ALL SELECT '5_decontaminated', count(*),
              cast(sum(n_tok) as bigint)
    FROM clean
    """


@query("q_corpus_pipeline", oracle=_corpus_pipeline_oracle())
def q_corpus_pipeline(spark, sf_dir):
    """The END-TO-END curation funnel as ONE DAG — what a user of this
    engine actually ships nightly: exact dedup (min-id per text) →
    language gate (stopword-rate heuristic) → quality gate (score ≥
    0.9) → benchmark decontamination (drop eval-source docs and any
    doc sharing a word 3-gram with them). Emits the funnel table
    (stage, surviving docs, surviving tokens) — the attrition report
    every data-curation review reads; each stage reuses the exact
    semantics of its standalone query (q_dropdup_key, q_text_langid,
    q_text_quality, q_decontaminate), so the composition is
    value-hash-checked end to end.

    Scale: the per-doc stages are one scan + one text-keyed dedup
    window; contamination broadcasts the (tiny) benchmark gram set;
    the funnel rollup aggregates constants. No stage is quadratic; the
    5 stage summaries share the persisted lineage instead of
    rescanning."""
    from pyspark.sql import Window as W

    from .operators.text import (
        quality_score,
        stopword_count,
        token_count,
    )

    d = load_table(spark, sf_dir, "documents")
    # fan-out before the per-doc text measures and the 3-gram explode
    # (single-row-group scan — optimization round r11)
    d = fan_out_scan(d, "doc_id")
    base = d.select(
        "doc_id", "text", "source", "n_chars",
        token_count(F.col("text")).alias("n_tok"),
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint")
        .alias("n_dist"),
        stopword_count(F.col("text")).alias("n_stop")).persist()

    grams = base.select(
        "doc_id", "source",
        F.explode(word_ngrams(F.col("text"), 3)).alias("gram"))
    bench = (grams.filter(F.col("source") == "src0")
             .select("gram").distinct())
    contaminated = (grams.filter(F.col("source") != "src0")
                    .join(F.broadcast(bench), "gram")
                    .select("doc_id").distinct())

    # One funnel pass (optimization round r12, §1.2/§2.3): the
    # union-of-5-stage-aggregates shape re-executed the text-keyed
    # dedup window 3x and scanned the cached base 5x (no subtree reuse
    # across union branches). Survival of each stage is a cumulative
    # per-doc predicate, so compute all flags in ONE window pass, mark
    # contamination with one left join against the (tiny) contaminated
    # id set, and fold the whole funnel into a single conditional
    # aggregation whose 1 row explodes into the 5 stage rows. Stage
    # semantics (and the standalone-query equivalences) are unchanged.
    is_d = F.row_number().over(
        W.partitionBy("text").orderBy("doc_id")) == 1
    lang_ok = F.col("n_stop").cast("double") / F.col("n_tok") >= 0.05
    qual_ok = quality_score(F.col("n_tok"), F.col("n_dist"),
                            F.col("n_chars"), F.col("n_stop")) >= 0.9
    flags = (base.withColumn("s2", is_d)
             .withColumn("s3", F.col("s2") & lang_ok)
             .withColumn("s4", F.col("s3") & qual_ok)
             .join(contaminated.withColumn("_ct", F.lit(1)),
                   "doc_id", "left")
             .withColumn("s5", F.col("s4") & (F.col("source") != "src0")
                         & F.col("_ct").isNull()))

    def cnt(flag):
        n = (F.count(F.when(flag, 1)) if flag is not None
             else F.count("*")).cast("bigint")
        t = (F.sum(F.when(flag, F.col("n_tok"))) if flag is not None
             else F.sum("n_tok")).cast("bigint")
        return n, t
    names = ["1_input", "2_dedup", "3_langid", "4_quality",
             "5_decontaminated"]
    sums = [cnt(None)] + [cnt(F.col(f"s{i}")) for i in range(2, 6)]
    row = flags.agg(*[e.alias(f"x{i}{j}") for i, (a, b)
                      in enumerate(sums) for j, e in ((0, a), (1, b))])
    return (row.select(F.explode(F.array(*[
        F.struct(F.lit(names[i]).alias("stage"),
                 F.col(f"x{i}0").alias("n_docs"),
                 F.col(f"x{i}1").alias("n_tokens"))
        for i in range(5)])).alias("p")).select("p.*"))


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH {_NORMS_CTE},
    probes AS (
      SELECT vec_id AS probe_id, label AS probe_label,
             embedding AS pe, nrm AS pn
      FROM norms WHERE vec_id < 8
    )
    SELECT probe_id, vec_id, cos, rk FROM (
      SELECT probes.probe_id, n.vec_id,
             round(cast(sum(cast(cast(n.embedding[gs.i] as double)
                                 * cast(probes.pe[gs.i] as double)
                                 as decimal(18,10))) as double)
                   / sqrt(max(n.nrm) * max(probes.pn)), 4) AS cos,
             row_number() OVER (
               PARTITION BY probes.probe_id
               ORDER BY round(cast(sum(cast(cast(n.embedding[gs.i]
                                   as double)
                                 * cast(probes.pe[gs.i] as double)
                                 as decimal(18,10))) as double)
                   / sqrt(max(n.nrm) * max(probes.pn)), 4)
                 DESC, n.vec_id) AS rk
      FROM norms n CROSS JOIN probes, range(1, 65) gs(i)
      WHERE n.vec_id <> probes.probe_id
        AND n.label <> probes.probe_label
      GROUP BY probes.probe_id, n.vec_id
    ) WHERE rk <= 5
    ORDER BY probe_id, rk
    """,
)
def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each of 8
    anchor vectors, the 5 highest-cosine corpus vectors with a
    DIFFERENT label — the near-miss negatives that make embedding
    models actually learn boundaries (random negatives are too easy).
    The label filter sits below the similarity ranking, so candidates
    are pruned before the top-k, and the cosine is the H-family
    decimal-exact 4dp form with vec_id tie-breaks.

    Scale: identical shape to q_similarity_batch — one corpus scan
    against a broadcast anchor set, per-anchor TakeOrdered; at 100 TB
    the mining pass typically runs per training epoch over the
    freshest embedding snapshot, and this plan's cost is one scan
    regardless of anchor count until the broadcast outgrows memory
    (then: IVF cells per anchor, q_similarity_ann)."""
    from pyspark.sql import Window as W

    from .operators.similarity import dot_col

    e = load_table(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    probes = (n.filter(F.col("vec_id") < 8)
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("label").alias("probe_label"),
                      F.col("embedding").alias("pe"),
                      F.col("nrm").alias("pn")))
    scored = (n.crossJoin(F.broadcast(probes))
              .filter((F.col("vec_id") != F.col("probe_id"))
                      & (F.col("label") != F.col("probe_label")))
              .select("probe_id", "vec_id",
                      F.round(dot_col(F.col("embedding"), F.col("pe"))
                              / F.sqrt(F.col("nrm") * F.col("pn")), 4)
                      .alias("cos")))
    rk = F.row_number().over(
        W.partitionBy("probe_id").orderBy(F.desc("cos"), "vec_id"))
    return (scored.withColumn("rk", rk).filter(F.col("rk") <= 5)
            .select("probe_id", "vec_id", "cos", "rk")
            .orderBy("probe_id", "rk"))


# ---------------------------------------------------------------------------
# q_zipf_slope — power-law fit of the token frequency distribution
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH freq AS (
  SELECT token, cast(count(*) as bigint) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r
  FROM freq
),
top AS (SELECT r, f FROM ranked WHERE r <= 500),
terms AS (
  SELECT cast(round(ln(cast(r as double)), 8) as decimal(30,10)) AS x,
         cast(round(ln(cast(f as double)), 8) as decimal(30,10)) AS y,
         cast(round(ln(cast(r as double)) * ln(cast(r as double)), 8)
              as decimal(30,10)) AS xx,
         cast(round(ln(cast(r as double)) * ln(cast(f as double)), 8)
              as decimal(30,10)) AS xy,
         cast(round(ln(cast(f as double)) * ln(cast(f as double)), 8)
              as decimal(30,10)) AS yy
  FROM top
),
s AS (
  SELECT cast(count(*) as bigint) AS n,
         cast(sum(x) as double) AS sx, cast(sum(y) as double) AS sy,
         cast(sum(xx) as double) AS sxx, cast(sum(xy) as double) AS sxy,
         cast(sum(yy) as double) AS syy
  FROM terms
)
SELECT n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + 0.0
         AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             4) + 0.0 AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) + 0.0
         AS r_sq
FROM s
"""


@query("q_zipf_slope", oracle=_ZIPF_ORACLE)
def q_zipf_slope(spark, sf_dir):
    """Zipf power-law fit over the corpus vocabulary: OLS of
    ln(frequency) on ln(rank) across the top-500 tokens (rank ties
    broken by token, the q_vocab_topk order). A natural-language
    corpus sits near slope -1; a synthetic or template-spammed corpus
    doesn't — the distributional health check beside q_entropy and
    q_token_pmi in the curation suite.

    Hash discipline: ln() is the only transcendental — each per-row
    term is rounded to 8dp and accumulated as decimal(30,10), so the
    cross-row sums are exact and order-independent (a raw double sum
    would inherit engine summation order); slope/intercept/R^2 are
    scalar double combinations of those exact sums, rounded 4dp with
    the sign-of-zero guard.

    Scale: token counting is the map-side-combined vocab build; the
    rank window runs over the vocabulary relation (not the corpus) and
    the fit reduces 500 rows. At 100 TB the vocab groupBy is the only
    real shuffle."""
    d = load_table(spark, sf_dir, "documents")
    freq = (d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
            .groupBy("token").agg(F.count("*").cast("long").alias("f")))
    r = F.row_number().over(W.orderBy(F.desc("f"), "token"))
    top = (freq.withColumn("r", r).filter(F.col("r") <= 500)
           .select("r", "f"))
    lx = F.log(F.col("r").cast("double"))
    ly = F.log(F.col("f").cast("double"))
    dec = lambda c: F.round(c, 8).cast("decimal(30,10)")  # noqa: E731
    terms = top.select(dec(lx).alias("x"), dec(ly).alias("y"),
                       dec(lx * lx).alias("xx"), dec(lx * ly).alias("xy"),
                       dec(ly * ly).alias("yy"))
    s = terms.agg(F.count("*").cast("long").alias("n"),
                  F.sum("x").cast("double").alias("sx"),
                  F.sum("y").cast("double").alias("sy"),
                  F.sum("xx").cast("double").alias("sxx"),
                  F.sum("xy").cast("double").alias("sxy"),
                  F.sum("yy").cast("double").alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "n",
        (F.round(slope, 4) + 0.0).alias("slope"),
        (F.round((sy - slope * sx) / n, 4) + 0.0).alias("intercept"),
        (F.round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
         + 0.0).alias("r_sq"))


# ---------------------------------------------------------------------------
# q_bigram_entropy — conditional entropy rate of the token stream
# ---------------------------------------------------------------------------

_BIGRAM_H_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bigrams AS (
  SELECT t[i] AS a, t[i + 1] AS b
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
),
ab AS (
  SELECT a, b, cast(count(*) as bigint) AS c_ab
  FROM bigrams GROUP BY a, b
),
ag AS (
  SELECT a, cast(sum(c_ab) as bigint) AS c_a FROM ab GROUP BY a
),
tot AS (SELECT cast(sum(c_ab) as bigint) AS n FROM ab),
terms AS (
  SELECT cast(round(cast(ab.c_ab as double)
                    * ln(cast(ag.c_a as double) / ab.c_ab), 9)
              as decimal(30,12)) AS h_t,
         cast(round(cast(ab.c_ab as double)
                    * ln(cast(tot.n as double) / ab.c_ab), 9)
              as decimal(30,12)) AS hj_t
  FROM ab JOIN ag ON ag.a = ab.a CROSS JOIN tot
)
SELECT (SELECT n FROM tot) AS n_bigrams,
       round(cast(sum(h_t) as double) / (SELECT n FROM tot), 6) + 0.0
         AS cond_entropy,
       round(cast(sum(hj_t) as double) / (SELECT n FROM tot), 6) + 0.0
         AS joint_entropy
FROM terms
"""


@query("q_bigram_entropy", oracle=_BIGRAM_H_ORACLE)
def q_bigram_entropy(spark, sf_dir):
    """Conditional entropy rate of the corpus token stream,
    H(next | current) = sum_ab c_ab/N * ln(c_a/c_ab), plus the joint
    bigram entropy — the predictability score that separates natural
    text (low rate) from shuffled or template-generated text, sitting
    between q_entropy (unigram, per-user) and q_ngram_lm (scoring) in
    the distributional suite; q_zipf_slope checks the marginal, this
    checks the transitions.

    Exactness: bigram and unigram-context counts are exact bigints;
    each count's c*ln(ratio) term is one deterministic double
    expression rounded 9dp and decimal-summed over the bigram
    vocabulary, so the reduction is order-free; two scalar divisions
    close it out.

    Scale: one zip_with bigram generation per doc (array-slice pairing
    in the scan projection, exploded once), then two map-side-combined
    groupBys on (a, b) and (a) — vocabulary-sized relations, not
    corpus-sized."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("t"))
    bigrams = toks.select(
        F.explode(F.zip_with(
            F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
            F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("a"), b.alias("b"))))
        .alias("p")).select("p.a", "p.b")
    ab = (bigrams.groupBy("a", "b")
          .agg(F.count("*").cast("long").alias("c_ab")))
    ag = ab.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    tot = ab.agg(F.sum("c_ab").cast("long").alias("n"))
    joined = ab.join(ag, "a").crossJoin(F.broadcast(tot))
    h_t = F.round(F.col("c_ab").cast("double")
                  * F.log(F.col("c_a").cast("double") / F.col("c_ab")),
                  9).cast("decimal(30,12)")
    hj_t = F.round(F.col("c_ab").cast("double")
                   * F.log(F.col("n").cast("double") / F.col("c_ab")),
                   9).cast("decimal(30,12)")
    terms = joined.select(F.col("n"), h_t.alias("h_t"),
                          hj_t.alias("hj_t"))
    return (terms.groupBy("n")
            .agg((F.round(F.sum("h_t").cast("double") / F.max("n"), 6)
                  + 0.0).alias("cond_entropy"),
                 (F.round(F.sum("hj_t").cast("double") / F.max("n"), 6)
                  + 0.0).alias("joint_entropy"))
            .select(F.col("n").alias("n_bigrams"), "cond_entropy",
                    "joint_entropy"))


# ---------------------------------------------------------------------------
# q_chao1_richness — unseen-vocabulary estimate
# ---------------------------------------------------------------------------

_CHAO1_ORACLE = """
WITH freq AS (
  SELECT token, cast(count(*) as bigint) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
s AS (
  SELECT cast(count(*) as bigint) AS d,
         cast(count(*) FILTER (f = 1) as bigint) AS f1,
         cast(count(*) FILTER (f = 2) as bigint) AS f2,
         cast(sum(f) as bigint) AS n_tokens
  FROM freq
)
SELECT d, f1, f2, n_tokens,
       round(d + CASE WHEN f2 > 0
                      THEN cast(f1 * f1 as double) / (2 * f2)
                      ELSE cast(f1 * (f1 - 1) as double) / 2 END, 4)
         + 0.0 AS chao1,
       round(1.0 - cast(f1 as double) / n_tokens, 6) + 0.0
         AS coverage_good_turing
FROM s
"""


@query("q_chao1_richness", oracle=_CHAO1_ORACLE)
def q_chao1_richness(spark, sf_dir):
    """Chao1 species-richness estimate of the corpus vocabulary —
    observed distinct tokens D plus the f1^2/(2 f2) correction from
    singleton/doubleton counts (bias-corrected form when f2 = 0) —
    with Good-Turing sample coverage (1 - f1/N). Answers 'how much
    vocabulary has this crawl NOT seen yet', the saturation signal
    that tells a collection pipeline whether more of the same source
    still adds diversity (q_zipf_slope checks shape; this checks
    completeness).

    Exactness: D, f1, f2, N are exact bigints over the vocabulary
    relation; both estimates are one guarded scalar division each.

    Scale: the vocab groupBy is the only corpus-sized stage; the
    frequency-of-frequencies reduce runs on the vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    freq = (d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
            .groupBy("token").agg(F.count("*").cast("long").alias("f")))
    s = freq.agg(
        F.count("*").cast("long").alias("d"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).cast("long")
        .alias("f2"),
        F.sum("f").cast("long").alias("n_tokens"))
    corr = F.when(
        F.col("f2") > 0,
        (F.col("f1") * F.col("f1")).cast("double") / (2 * F.col("f2"))
    ).otherwise((F.col("f1") * (F.col("f1") - 1)).cast("double") / 2)
    return s.select(
        "d", "f1", "f2", "n_tokens",
        (F.round(F.col("d") + corr, 4) + 0.0).alias("chao1"),
        (F.round(1.0 - F.col("f1").cast("double") / F.col("n_tokens"),
                 6) + 0.0).alias("coverage_good_turing"))


@query("q_similarity_ann_check",
       oracle=similarity.ivf_check_sql(probe_id=0, k=10, n_cells=8,
                                       n_probe_cells=3))
def q_similarity_ann_check(spark, sf_dir):
    """Hash-checked companion of q_similarity_ann (round 7, VERDICT r6
    item 4) — and strictly stronger than the usual companion booleans:
    the ORACLE REPLICATES THE WHOLE IVF PIPELINE in SQL (centroid
    pick, decimal-exact assignment with the struct-max tie-breaks,
    probe-cell ranking, candidate filter, rounded-cosine top-k), so
    every ANN result row (vec_id, cos) is value-hash-checked, and the
    per-row `hit` flag (membership in the exact brute-force top-k)
    pins recall@10 into the hash as well. Both engines run the same
    decimal(18,10)-exact cosine reduction → identical doubles →
    identical argmax/ordering decisions.

    Scale: the Spark arms are the deployed plans themselves —
    ivf_topk scans ~n_probe/n_cells of the corpus, brute_force_topk
    is the one-probe broadcast scan (the eval arm, sampled at
    100 TB); the check adds one 10-row broadcast join."""
    e = load_table(spark, sf_dir, "embeddings")
    ann = ivf_topk(e, probe_id=0, k=10, n_cells=8, n_probe_cells=3)
    exact = brute_force_topk(e, probe_id=0, k=10).select(
        "vec_id", F.lit(True).alias("hit"))
    return (ann.join(F.broadcast(exact), "vec_id", "left")
            .select("vec_id", "cos",
                    F.coalesce("hit", F.lit(False)).alias("hit")))


_MINHASH_INC_ORACLE = _MINHASH_ORACLE.replace(
    """    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )""",
    """    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
    )""").replace(
    """    SELECT c.id_a, c.id_b,""",
    """    SELECT c.id_a, c.id_b,
           CASE WHEN c.id_a % 5 = 0 AND c.id_b % 5 = 0
                THEN 'new-new' ELSE 'new-old' END AS pair_type,""")


@query("q_dedup_incremental", oracle=_MINHASH_INC_ORACLE)
def q_dedup_incremental(spark, sf_dir):
    """Incremental MinHash-LSH dedup — the mode a 100 TB corpus
    actually runs: a new ingest batch (every 5th doc here) probes the
    standing band index, so candidates are new-vs-corpus and
    new-vs-new ONLY; the old-vs-old mass (already deduplicated in
    prior runs) is never re-joined
    (operators/dedup.py:lsh_candidate_pairs_incremental — the probe
    side of the band equi-join carries only the batch's bands).
    Candidates verify by exact bigram Jaccard >= 0.2, tagged new-old
    (batch doc duplicates the standing corpus — droppable) vs new-new
    (intra-batch duplicate — keep one). Same portable md5 minhash as
    q_dedup_minhash_portable, so the full pipeline — signatures,
    bands, incremental candidate rule, verified pairs — is
    value-hash-checked.

    Scale: batch cost is O(|new| bands + collisions), independent of
    corpus size for the probe side; the standing index at 100 TB is a
    bucketed table the batch's shuffle joins against — the same plan
    this query compiles to."""
    d = load_table(spark, sf_dir, "documents")
    from .operators.dedup import lsh_candidate_pairs_incremental
    # no persist: g is a cheap column-pruned projection (one split +
    # ngram transform per row), and caching a CORPUS-sized projection
    # is the 100 TB anti-pattern — it can't fit executor storage and
    # would accumulate across a 450-query sweep session (ADVICE r9).
    # The three consumers re-derive it from the pruned parquet scan;
    # Catalyst reuses the identical subplan exchanges where it can.
    # fan-out before shingling (one scan partition otherwise
    # serializes the 16-md5-per-shingle signature pass onto one core;
    # the identical exchange is reused by all three g consumers —
    # optimization round r11: 6.3 s -> measured below)
    g = (fan_out_scan(d, "doc_id")
         .select("doc_id", word_ngrams(F.col("text"), 2).alias("g")))
    cand = lsh_candidate_pairs_incremental(
        g, "doc_id", "g", F.col("doc_id") % 5 == 0,
        n_hashes=16, bands=4, portable=True)
    ga = g.select(F.col("doc_id").alias("id_a"), F.col("g").alias("g_a"))
    gb = g.select(F.col("doc_id").alias("id_b"), F.col("g").alias("g_b"))
    return (cand.join(ga, "id_a").join(gb, "id_b")
            .select("id_a", "id_b",
                    F.when((F.col("id_a") % 5 == 0)
                           & (F.col("id_b") % 5 == 0), "new-new")
                    .otherwise("new-old").alias("pair_type"),
                    F.round(jaccard(F.col("g_a"), F.col("g_b")), 4)
                    .alias("jac"))
            .filter(F.col("jac") >= 0.2)
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# q_negative_sampling — unigram^0.75 negative-sampling distribution
# ---------------------------------------------------------------------------

@query(
    "q_negative_sampling",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (
      SELECT term, count(*) AS cnt FROM toks
      WHERE term <> '' GROUP BY term
    ),
    weighted AS (
      /* c^0.75 computed as sqrt(c * sqrt(c)): sqrt is correctly
         rounded by IEEE-754 on BOTH engines while pow() is libm-
         dependent — the q_minhash_band_tuning no-pow discipline.
         The 6dp quantization goes THROUGH decimal(18,6): a double
         round() result can land at j-eps (cnt=41 does), and
         double->bigint truncates on Spark but rounds on DuckDB;
         decimal casts round HALF_UP identically on both engines
         and the decimal*1e6 multiply is exact (r10 ADVICE). */
      SELECT term, cnt,
             cast(cast(round(sqrt(cnt * sqrt(cnt)), 6)
                       as decimal(18,6)) * 1000000 as bigint)
               AS w6
      FROM vocab
    ),
    tot AS (SELECT sum(w6) AS s FROM weighted)
    SELECT term, cast(cnt as bigint) AS cnt,
           cast(w6 as double) / 1e6 AS weight,
           cast((2 * w6 * 1000000 + tot.s) // (2 * tot.s) as double)
             / 1e6 AS p_sample
    FROM weighted, tot
    ORDER BY cnt DESC, term
    LIMIT 20
    """,
)
def q_negative_sampling(spark, sf_dir):
    """Negative-sampling distribution (word2vec / contrastive
    training): the corpus unigram distribution flattened by the 3/4
    power, p(w) = c_w^0.75 / Σ c^0.75 — the standard trick that keeps
    frequent words from dominating sampled negatives. Two exactness
    disciplines make it hash-stable: c^0.75 is computed as
    sqrt(c·sqrt(c)) (sqrt is IEEE-correctly-rounded on both engines;
    pow() is libm-dependent and banned per the q_minhash_band_tuning
    precedent), and each probability is an exact integer
    half-away-from-zero division of 6dp-scaled weights (VERDICT r9
    item 3 — the quotient's numerator lives on the 1e-6 lattice, so a
    round() tie is reachable). Top-20 by (count DESC, term).

    Scale: one explode + one vocab-sized groupBy (map-side combined);
    the normalizer is a 1-row aggregate broadcast back; the cut is
    TakeOrderedAndProject. A 100 TB corpus's vocab is Heaps-bounded
    (millions of rows) — the actual sampling table (alias method)
    builds driver-side from exactly this relation."""
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select(F.explode(F.split("text", " ")).alias("term"))
            .filter(F.col("term") != ""))
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    weighted = vocab.withColumn(
        "w6",
        F.expr("cast(cast(round(sqrt(cnt * sqrt(cnt)), 6)"
               " as decimal(18,6)) * 1000000 as bigint)"))
    tot = weighted.agg(F.sum("w6").alias("s"))
    return (weighted.crossJoin(F.broadcast(tot))
            .select("term", F.col("cnt").cast("long").alias("cnt"),
                    (F.col("w6").cast("double") / 1e6).alias("weight"),
                    F.expr("cast((2 * w6 * 1000000 + s) DIV (2 * s)"
                           " as double) / 1e6").alias("p_sample"))
            .orderBy(F.desc("cnt"), "term").limit(20))


# ---------------------------------------------------------------------------
# q_entity_resolution — blocked record linkage with edit-distance verify
# ---------------------------------------------------------------------------

@query(
    "q_entity_resolution",
    oracle="""
    WITH clean AS (
      SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nat
      FROM customer
    ),
    dirty AS (
      /* every fifth record gets a dirty twin: the 10th character (a
         leading zero of the numeric part - asserted '0' fixture-wide)
         is dropped, so edit distance to the source is exactly 1 and
         the last-4-digit blocking key is preserved */
      SELECT c_custkey + 100000000 AS rec_id,
             substr(c_name, 1, 9) || substr(c_name, 11) AS name,
             c_nationkey AS nat
      FROM customer WHERE c_custkey % 5 = 0
    ),
    recs AS (
      SELECT *, right(name, 4) AS blk FROM clean
      UNION ALL
      SELECT *, right(name, 4) AS blk FROM dirty
    ),
    cand AS (
      SELECT a.nat, a.rec_id AS id_a, b.rec_id AS id_b,
             levenshtein(a.name, b.name) AS dist
      FROM recs a JOIN recs b
        ON a.nat = b.nat AND a.blk = b.blk AND a.rec_id < b.rec_id
    )
    SELECT nat,
           cast(count(*) as bigint) AS n_candidates,
           cast(sum(CASE WHEN dist <= 2 THEN 1 ELSE 0 END) as bigint)
             AS n_matches,
           cast(min(dist) as bigint) AS min_dist,
           cast(max(dist) as bigint) AS max_dist
    FROM cand GROUP BY nat ORDER BY nat
    """,
)
def q_entity_resolution(spark, sf_dir):
    """Entity resolution (record linkage) — the structured-data twin
    of document dedup: records block on (nation, last-4-of-name), the
    per-block self-join emits candidate pairs, and Levenshtein
    distance ≤ 2 verifies matches (both engines implement the same
    Wagner-Fischer distance — parity asserted by this query's hash).
    Dirty twins are synthesized for every fifth customer by dropping
    the name's 10th character (a leading zero, so distance is exactly
    1 and the twin co-blocks with its source). The audit reports, per
    nation: candidate volume, verified matches, and the distance
    envelope — candidates vs matches IS the blocking-quality readout
    (precision of the cheap key before the expensive verify).

    Scale: the self-join key (nat, blk) bounds every block to
    name-suffix collisions (~n/10^4 per nation), so pair volume is
    sum-of-squares over SMALL blocks — never corpus-quadratic; the
    verify is per-pair scalar work inside codegen, and the rollup
    map-side combines. The same plan at 100 TB swaps the block key
    for phonetic/sorted-neighborhood keys; cf. the q_dedup_* ladder
    for the unstructured side."""
    c = load_table(spark, sf_dir, "customer")
    clean = c.select(F.col("c_custkey").alias("rec_id"),
                     F.col("c_name").alias("name"),
                     F.col("c_nationkey").alias("nat"))
    dirty = (c.filter(F.col("c_custkey") % 5 == 0)
             .select((F.col("c_custkey") + 100000000).alias("rec_id"),
                     F.expr("substr(c_name, 1, 9) || substr(c_name, 11)")
                     .alias("name"),
                     F.col("c_nationkey").alias("nat")))
    recs = (clean.unionByName(dirty)
            .withColumn("blk", F.expr("right(name, 4)")))
    a, b = recs.alias("a"), recs.alias("b")
    cand = (a.join(b, (F.col("a.nat") == F.col("b.nat"))
                   & (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.rec_id") < F.col("b.rec_id")))
            .select(F.col("a.nat").alias("nat"),
                    F.levenshtein(F.col("a.name"), F.col("b.name"))
                    .alias("dist")))
    return (cand.groupBy("nat")
            .agg(F.count("*").cast("long").alias("n_candidates"),
                 F.sum(F.when(F.col("dist") <= 2, 1).otherwise(0))
                 .cast("long").alias("n_matches"),
                 F.min("dist").cast("long").alias("min_dist"),
                 F.max("dist").cast("long").alias("max_dist"))
            .orderBy("nat"))


# ---------------------------------------------------------------------------
# q_sorted_neighborhood — windowed ER blocking (the other classic)
# ---------------------------------------------------------------------------

_SN_WINDOW = 3  # compare each record to its next w-1 sorted neighbors


@query(
    "q_sorted_neighborhood",
    oracle=f"""
    WITH clean AS (
      SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nat
      FROM customer
    ),
    dirty AS (
      SELECT c_custkey + 100000000 AS rec_id,
             substr(c_name, 1, 9) || substr(c_name, 11) AS name,
             c_nationkey AS nat
      FROM customer WHERE c_custkey % 5 = 0
    ),
    recs AS (SELECT * FROM clean UNION ALL SELECT * FROM dirty),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY nat
                                   ORDER BY name, rec_id) AS rn
      FROM recs
    ),
    pairs AS (
      SELECT a.nat, levenshtein(a.name, b.name) AS dist
      FROM ranked a
      JOIN ranked b ON b.nat = a.nat
                   AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SN_WINDOW - 1}
    ),
    twins AS (
      SELECT nat, count(*) AS n_twins
      FROM (SELECT c_nationkey AS nat FROM customer
            WHERE c_custkey % 5 = 0)
      GROUP BY nat
    )
    SELECT p.nat,
           cast(count(*) as bigint) AS n_pairs,
           cast(sum(CASE WHEN p.dist <= 2 THEN 1 ELSE 0 END) as bigint)
             AS n_matches,
           cast(t.n_twins as bigint) AS n_twins,
           cast((2 * sum(CASE WHEN p.dist <= 2 THEN 1 ELSE 0 END)
                 * 10000 + t.n_twins) // (2 * t.n_twins) as double)
             / 1e4 AS twin_recall
    FROM pairs p JOIN twins t ON t.nat = p.nat
    GROUP BY p.nat, t.n_twins ORDER BY p.nat
    """,
)
def q_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood record linkage (Hernandez & Stolfo '95) —
    the OTHER classical ER blocking, complementing
    q_entity_resolution's key blocking: records sort by name within
    each nation and every record compares only against its next
    {_SN_WINDOW - 1} sorted neighbors, so candidate volume is
    O(n·w) regardless of key-collision structure. Each injected dirty
    twin differs from its source by one dropped leading zero, so the
    pair sorts adjacent and the window catches it — twin_recall
    (verified matches / injected twins, exact integer 4dp rational)
    reads out the window's effectiveness, slightly above 1.0 where
    unrelated near-names also land inside the edit threshold.

    Scale: the sort is per-nation (partitioned window, never global);
    the neighbor join equi-keys on the BUCKETED band (nat, rn DIV w)
    — each left row probes its own and the next rank-bucket (the band
    [rn+1, rn+w-1] spans exactly those two), so the join enumerates at
    most 2w build rows per probe row before the band filter: executed
    WORK is O(n·w), not the per-nation O(n²) a bare nat-key join with
    a post-join rank filter would enumerate (VERDICT r10 item 2 —
    tests/test_llm_ops.py pins the pre-filter enumeration bound). The
    verify is per-pair codegen scalar work. At 100 TB the sort key
    becomes a phonetic/normalized key and w grows with expected
    cluster size — the plan shape is unchanged."""
    c = load_table(spark, sf_dir, "customer")
    clean = c.select(F.col("c_custkey").alias("rec_id"),
                     F.col("c_name").alias("name"),
                     F.col("c_nationkey").alias("nat"))
    dirty = (c.filter(F.col("c_custkey") % 5 == 0)
             .select((F.col("c_custkey") + 100000000).alias("rec_id"),
                     F.expr("substr(c_name, 1, 9) || substr(c_name, 11)")
                     .alias("name"),
                     F.col("c_nationkey").alias("nat")))
    from pyspark.sql import Window as W
    ranked = (clean.unionByName(dirty)
              .withColumn("rn", F.row_number().over(
                  W.partitionBy("nat").orderBy("name", "rec_id"))))
    from .operators.dedup import sorted_neighborhood_pairs
    pairs = sorted_neighborhood_pairs(ranked, _SN_WINDOW).select(
        "nat", F.levenshtein(F.col("a_name"), F.col("b_name"))
        .alias("dist"))
    twins = (c.filter(F.col("c_custkey") % 5 == 0)
             .groupBy(F.col("c_nationkey").alias("tnat"))
             .agg(F.count("*").alias("n_twins")))
    return (pairs.join(F.broadcast(twins), pairs.nat == twins.tnat)
            .groupBy("nat", "n_twins")
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.sum(F.when(F.col("dist") <= 2, 1).otherwise(0))
                 .cast("long").alias("n_matches"))
            .selectExpr(
                "nat", "n_pairs", "n_matches",
                "cast(n_twins as bigint) AS n_twins",
                "cast((2 * n_matches * 10000 + n_twins)"
                " DIV (2 * n_twins) as double) / 1e4 AS twin_recall")
            .orderBy("nat"))


# ---------------------------------------------------------------------------
# q_er_clusters — ER match pairs composed into transitive clusters with a
# canonical survivor record (the output a real MDM pipeline materializes)
# ---------------------------------------------------------------------------

# The customer fixture's c_name is "Customer#<digits>" — letters are
# IDENTICAL across records, so any honest phonetic key over the raw
# name degenerates to one block per nation (quadratic). The ER cluster
# query therefore synthesizes pronounceable surnames by SPELLING the
# key's last four digits ("0417" -> "zerofouroneseven"), which
# gives the phonetic arm real consonant structure while keeping
# ~10^4-way block selectivity. Corruption is a dropped vowel — exactly
# the edit a consonant-skeleton (Soundex-class) key is silent to.
_ER_DIGIT_WORDS = (("0", "zero"), ("1", "one"), ("2", "two"),
                   ("3", "three"), ("4", "four"), ("5", "five"),
                   ("6", "six"), ("7", "seven"), ("8", "eight"),
                   ("9", "nine"))


def _er_surname_sql(key: str) -> str:
    """Portable SQL: spell the last-4 digits of `key` as words. The
    replace chain is safe because no digit word contains a digit."""
    s = f"lpad(cast({key} % 10000 as string), 4, '0')"
    for d, w in _ER_DIGIT_WORDS:
        s = f"replace({s}, '{d}', '{w}')"
    return s


def _er_drop_vowel_sql(nm: str) -> str:
    """Portable SQL: drop the first 'e' (else 'o', else 'i') from
    `nm` — a Levenshtein-1 edit that is SILENT under the consonant
    skeleton. Every digit word contains at least one of e/o/i, so the
    fallback chain always finds a position."""
    pos = (f"CASE WHEN instr({nm}, 'e') > 0 THEN instr({nm}, 'e') "
           f"WHEN instr({nm}, 'o') > 0 THEN instr({nm}, 'o') "
           f"ELSE instr({nm}, 'i') END")
    return (f"concat(substr({nm}, 1, {pos} - 1), "
            f"substr({nm}, {pos} + 1))")


_ER_SUR = _er_surname_sql("c_custkey")


@query(
    "q_er_clusters",
    oracle=f"""
    WITH RECURSIVE clean AS (
      SELECT c_custkey AS rec_id, {_ER_SUR} AS nm,
             c_nationkey AS nat, c_custkey AS okey
      FROM customer
    ),
    t1 AS (
      SELECT c_custkey + 100000000 AS rec_id,
             {_er_drop_vowel_sql(_ER_SUR)} AS nm,
             c_nationkey AS nat, c_custkey AS okey
      FROM customer WHERE c_custkey % 5 = 0
    ),
    t2 AS (
      SELECT okey + 200000000 AS rec_id, {_er_drop_vowel_sql("nm")} AS nm,
             nat, okey
      FROM t1 WHERE okey % 25 = 0
    ),
    recs AS (
      SELECT rec_id, nm, nat FROM clean
      UNION ALL SELECT rec_id, nm, nat FROM t1
      UNION ALL SELECT rec_id, nm, nat FROM t2
    ),
    sfx AS (
      SELECT a.nat, a.rec_id AS id_a, b.rec_id AS id_b,
             a.nm AS nm_a, b.nm AS nm_b
      FROM recs a JOIN recs b
        ON a.nat = b.nat AND right(a.nm, 6) = right(b.nm, 6)
       AND a.rec_id < b.rec_id
    ),
    ph AS (
      SELECT a.nat, a.rec_id AS id_a, b.rec_id AS id_b,
             a.nm AS nm_a, b.nm AS nm_b
      FROM recs a JOIN recs b
        ON a.nat = b.nat
       AND regexp_replace(a.nm, '[aeiou]', '', 'g')
           = regexp_replace(b.nm, '[aeiou]', '', 'g')
       AND a.rec_id < b.rec_id
    ),
    cand AS (
      /* explicit DISTINCT, NOT a bare `sfx UNION ph`: inside a WITH
         RECURSIVE list DuckDB gives ANY union-bodied CTE recursive
         iteration semantics (no set dedup) even without a
         self-reference — verified: WITH RECURSIVE u AS (SELECT 1
         UNION SELECT 1) yields 2 rows where plain WITH yields 1 */
      SELECT DISTINCT * FROM (
        SELECT * FROM sfx UNION ALL SELECT * FROM ph)
    ),
    matches AS (
      SELECT * FROM cand WHERE levenshtein(nm_a, nm_b) <= 2
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM matches
      UNION ALL SELECT id_b AS a, id_a AS b FROM matches
    ),
    reach AS (
      SELECT rec_id AS id, rec_id AS r FROM recs
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
    ),
    labels AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
    lab_nat AS (
      SELECT l.id, l.cluster, r.nat
      FROM labels l JOIN recs r ON r.rec_id = l.id
    ),
    sizes AS (
      SELECT nat, cluster, count(*) AS sz FROM lab_nat GROUP BY 1, 2
    ),
    clus AS (
      SELECT nat, count(*) AS n_clusters, max(sz) AS max_sz,
             sum(cluster) AS surv_sum
      FROM sizes GROUP BY nat
    ),
    base AS (SELECT nat, count(*) AS n_records FROM recs GROUP BY nat),
    sfx_cnt AS (SELECT nat, count(*) AS n FROM sfx GROUP BY nat),
    ph_cnt AS (SELECT nat, count(*) AS n FROM ph GROUP BY nat),
    cand_cnt AS (SELECT nat, count(*) AS n FROM cand GROUP BY nat),
    m_cnt AS (SELECT nat, count(*) AS n FROM matches GROUP BY nat)
    SELECT base.nat,
           cast(base.n_records as bigint) AS n_records,
           cast(coalesce(sfx_cnt.n, 0) as bigint) AS n_cand_sfx,
           cast(coalesce(ph_cnt.n, 0) as bigint) AS n_cand_ph,
           cast(coalesce(cand_cnt.n, 0) as bigint) AS n_cand_all,
           cast(coalesce(m_cnt.n, 0) as bigint) AS n_matches,
           cast(clus.n_clusters as bigint) AS n_clusters,
           cast(base.n_records - clus.n_clusters as bigint) AS n_merged,
           cast(clus.max_sz as bigint) AS max_cluster_size,
           cast(clus.surv_sum as bigint) AS survivor_id_sum
    FROM base
    JOIN clus ON clus.nat = base.nat
    LEFT JOIN sfx_cnt ON sfx_cnt.nat = base.nat
    LEFT JOIN ph_cnt ON ph_cnt.nat = base.nat
    LEFT JOIN cand_cnt ON cand_cnt.nat = base.nat
    LEFT JOIN m_cnt ON m_cnt.nat = base.nat
    ORDER BY base.nat
    """,
)
def q_er_clusters(spark, sf_dir):
    """ER match pairs composed into transitive MATCH CLUSTERS with a
    canonical survivor record — the output a real MDM pipeline
    materializes (VERDICT r10 item 7), closing the entity-resolution
    family begun by q_entity_resolution (key blocking) and
    q_sorted_neighborhood (windowed blocking).

    Records carry synthesized spelled-digit surnames (see module
    comment); every 5th gets a dropped-vowel twin and every 25th a
    SECOND-generation twin (vowel dropped from the first twin), so
    true components are chains clean—t1—t2 whose closure genuinely
    needs transitivity (clean↔t2 is distance 2 only via t1).
    Candidates come from TWO blocking arms — the suffix key
    right(nm, 6) and a dependency-free Soundex-class PHONETIC key
    (the consonant skeleton: vowels stripped; repeat-squeeze omitted
    because DuckDB's RE2 has no backreferences, documented
    simplification) — unioned DISTINCT, then Levenshtein ≤ 2 verify,
    then iterative min-label propagation (operators/cluster.py, as
    q_dedup_clusters) labels every record with its component's min
    rec_id = the SURVIVOR (clean ids sort below twin ids by
    construction). Per nation: record/candidate/match volumes per
    arm, cluster count, merged-record count, max component size, and
    the survivor-id checksum that pins WHICH record each cluster
    elects. The oracle recomputes the closure with a recursive CTE.

    Scale: both arms are fine-grained equi-joins (suffix ~10^2-4
    classes per nation, skeleton ~10^4) — per-block quadratic over
    SMALL blocks, never corpus-quadratic; the verify is codegen
    scalar work; components converge in O(chain length)=2 rounds of
    keyed joins. All-integer output — no float hash risk."""
    from .operators.cluster import connected_components
    c = load_table(spark, sf_dir, "customer")
    clean = c.selectExpr("c_custkey AS rec_id", f"{_ER_SUR} AS nm",
                         "c_nationkey AS nat", "c_custkey AS okey")
    t1 = (c.filter("c_custkey % 5 = 0")
          .selectExpr("c_custkey + 100000000 AS rec_id",
                      f"{_er_drop_vowel_sql(_ER_SUR)} AS nm",
                      "c_nationkey AS nat", "c_custkey AS okey"))
    t2 = (t1.filter("okey % 25 = 0")
          .selectExpr("okey + 200000000 AS rec_id",
                      f"{_er_drop_vowel_sql('nm')} AS nm",
                      "nat", "okey"))
    # materialize the standardized records ONCE: the spelled-surname +
    # chained vowel-drop SQL expands textually (the drop CASE
    # references its input 7x), and with projection collapse Catalyst
    # re-inlines that tree into every join key — past janino's 64 KB
    # codegen limit, so the arms fell back to interpreted eval (~9 s
    # of the r11 bench row's 11 s). The checkpoint is the standard
    # "standardize, then block" ER materialization: |records| rows of
    # (id, name, key), trivially bounded.
    recs = (clean.unionByName(t1).unionByName(t2)
            .select("rec_id", "nm", "nat")
            .localCheckpoint(eager=True))

    def _arm_pairs(keyed):
        a, b = keyed.alias("a"), keyed.alias("b")
        return (a.join(b, (F.col("a.nat") == F.col("b.nat"))
                       & (F.col("a.blk") == F.col("b.blk"))
                       & (F.col("a.rec_id") < F.col("b.rec_id")))
                .select(F.col("a.nat").alias("nat"),
                        F.col("a.rec_id").alias("id_a"),
                        F.col("b.rec_id").alias("id_b"),
                        F.col("a.nm").alias("nm_a"),
                        F.col("b.nm").alias("nm_b")))

    # ONE pass over both blocking arms: tag each arm's pairs, dedup by
    # pair key with max() flags, score Levenshtein once, and derive
    # every per-nation count from the same materialized frame. The
    # first shape computed four separate per-nation counts, each
    # re-executing its self-join from scratch — 4 redundant arm walks
    # that put the sf0.1 bench row 1.67x over its gate (r11).
    sfx = (_arm_pairs(recs.withColumn("blk", F.expr("right(nm, 6)")))
           .withColumn("in_sfx", F.lit(1)).withColumn("in_ph", F.lit(0)))
    ph = (_arm_pairs(recs.withColumn(
              "blk", F.expr("regexp_replace(nm, '[aeiou]', '')")))
          .withColumn("in_sfx", F.lit(0)).withColumn("in_ph", F.lit(1)))
    pairs = (sfx.unionByName(ph)
             .groupBy("nat", "id_a", "id_b", "nm_a", "nm_b")
             .agg(F.max("in_sfx").alias("has_sfx"),
                  F.max("in_ph").alias("has_ph"))
             .withColumn("dist", F.levenshtein("nm_a", "nm_b"))
             # candidate volume is output-bounded (blocked pairs);
             # materialize once — reused by the stats rollup AND the
             # component loop
             .localCheckpoint(eager=True))
    matches = pairs.filter(F.col("dist") <= 2)

    labels = connected_components(
        recs.select("rec_id"), matches.select("id_a", "id_b"),
        id_col="rec_id", src="id_a", dst="id_b")
    lab_nat = labels.join(recs.select(F.col("rec_id").alias("id"), "nat"),
                          "id")
    sizes = lab_nat.groupBy("nat", "cluster").agg(F.count("*").alias("sz"))
    clus = sizes.groupBy("nat").agg(
        F.count("*").alias("n_clusters"),
        F.max("sz").alias("max_sz"),
        F.sum("cluster").alias("surv_sum"))

    arm_stats = pairs.groupBy("nat").agg(
        F.sum("has_sfx").alias("c_sfx"),
        F.sum("has_ph").alias("c_ph"),
        F.count("*").alias("c_all"),
        F.sum(F.when(F.col("dist") <= 2, 1).otherwise(0)).alias("c_m"))

    base = recs.groupBy("nat").agg(F.count("*").alias("n_records"))
    out = (base
           .join(clus, "nat")
           .join(arm_stats, "nat", "left"))
    return out.selectExpr(
        "nat",
        "cast(n_records as bigint) AS n_records",
        "cast(coalesce(c_sfx, 0) as bigint) AS n_cand_sfx",
        "cast(coalesce(c_ph, 0) as bigint) AS n_cand_ph",
        "cast(coalesce(c_all, 0) as bigint) AS n_cand_all",
        "cast(coalesce(c_m, 0) as bigint) AS n_matches",
        "cast(n_clusters as bigint) AS n_clusters",
        "cast(n_records - n_clusters as bigint) AS n_merged",
        "cast(max_sz as bigint) AS max_cluster_size",
        "cast(surv_sum as bigint) AS survivor_id_sum",
    ).orderBy("nat")
