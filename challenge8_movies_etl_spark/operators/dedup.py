"""Deduplication operators for training-data pipelines.

No reference analog beyond drop_duplicates (challenge.py≈L85 [R]) —
mandated by the north star (BASELINE.json:6). Ladder of fidelity:

- exact / signature dedup  → hash-groupBy (oracle-checkable)
- n-gram Jaccard           → exact pairwise within blocks (oracle-checkable)
- MinHash + LSH            → probabilistic candidates, exact verify
- SimHash                  → 64-bit sketch + hamming banding

MinHash/SimHash production paths use Spark's engine-internal hashes
(murmur3 F.hash / F.xxhash64 — cheap, rows-only queries with
candidates ⊇ truth tests); each has a PORTABLE md5-derived twin
(q_dedup_minhash_portable / q_dedup_simhash_portable) whose entire
sketch pipeline is value-hash-checked against the DuckDB oracle.

Scale: every variant is blocked (signature / band / length) so the
worst case is per-block quadratic, never global — the property that
survives 100 TB (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import fan_out_scan

# ---------------------------------------------------------------------------
# signatures
# ---------------------------------------------------------------------------


def tokenset_signature(text: Column) -> Column:
    """Canonical token-bag signature: md5 of the sorted distinct token
    list. md5 is identical across engines → oracle-checkable."""
    toks = F.sort_array(F.array_distinct(F.split(text, " ")))
    return F.md5(F.concat_ws(" ", toks))


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles (sorted for determinism).

    Built as an n-way zip_with over shifted slices of the token array:
    higher-order lambdas re-evaluate any non-attribute argument
    expression PER ELEMENT, so the earlier element_at(split(text),...)
    formulation re-split the text for every gram (measured 6.7 s for
    5000 x 54-token docs at sf0.1 — ~40 core-ms per tiny doc); slices
    evaluate their argument once per row, making shingling ~linear."""
    toks = F.split(text, " ")
    shifted = [F.slice(toks, 1 + j, F.size(toks) - (n - 1))
               for j in range(n)]
    grams = shifted[0]
    for nxt in shifted[1:]:
        grams = F.zip_with(grams, nxt,
                           lambda a, b: F.concat(a, F.lit(" "), b))
    return F.sort_array(F.array_distinct(grams))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays (integer set
    sizes → one double division, deterministic)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return inter / union


# ---------------------------------------------------------------------------
# MinHash + LSH (scale path; rows-only)
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, n_hashes: int = 16,
                      portable: bool = False) -> Column:
    """n_hashes-wide MinHash signature: per seed, the min hash over the
    shingle set. Array column.

    Two hash families, same pipeline:
    - default (murmur3 ``F.hash(s, seed)``): engine-internal, ~8x
      cheaper — the production path (q_dedup_minhash, rows-only with a
      candidates ⊇ truth test).
    - ``portable=True`` (60-bit md5-derived: first 15 hex nibbles of
      md5(shingle':'k)): identical on any engine, so the ENTIRE LSH
      pipeline — signatures, band buckets, candidates, verified pairs —
      value-hash-checks against the DuckDB oracle
      (q_dedup_minhash_portable). Measured 1.3 s vs 10 s at sf0.1 —
      the price of cross-engine verifiability, paid only where wanted.
    """
    if portable:
        def h(k: int):
            return lambda s: F.conv(
                F.substring(F.md5(F.concat(s, F.lit(f":{k}"))), 1, 15),
                16, 10).cast("bigint")
    else:
        def h(k: int):
            return lambda s: F.hash(s, F.lit(k))
    return F.array(*[
        F.array_min(F.transform(shingles, h(seed)))
        for seed in range(n_hashes)
    ])


def lsh_candidate_pairs(docs: DataFrame, id_col: str, shingle_col: str,
                        n_hashes: int = 16, bands: int = 4,
                        portable: bool = False) -> DataFrame:
    """Banded LSH: split the signature into ``bands`` bands of
    n_hashes/bands rows each; docs sharing any band bucket become
    candidate pairs.

    The band join is an equi-join on (band_idx, band_hash) — at 100 TB
    this shuffles only (id, 64-bit bucket) pairs, and each bucket is a
    small block; the quadratic step is per-bucket only. Returns
    (id_a, id_b) with id_a < id_b, deduplicated across bands.
    """
    if n_hashes % bands:
        raise ValueError(
            f"n_hashes ({n_hashes}) must divide evenly into bands "
            f"({bands}): {n_hashes % bands} trailing signature "
            "positions would be silently ignored")
    rows = n_hashes // bands
    sig = docs.select(id_col, minhash_signature(
        F.col(shingle_col), n_hashes, portable=portable).alias("sig"))
    banded = sig.select(
        id_col,
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *[
                    F.element_at("sig", b * rows + r + 1).cast("string")
                    for r in range(rows)
                ])).alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col(f"a.band") == F.col(f"b.band"))
                   & (F.col(f"a.bucket") == F.col(f"b.bucket"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


# ---------------------------------------------------------------------------
# SimHash (rows-only; portable twin below is oracle-checked)
# ---------------------------------------------------------------------------


def md5_hash60(t: Column) -> Column:
    """60-bit engine-portable token hash: first 15 hex nibbles of md5."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")


def simhash_from_hashes(hashes_col: str, bits: int = 60) -> Column:
    """SimHash signature from a PRE-MATERIALIZED hash array column
    (named attribute): ONE aggregate with an array-of-counters
    accumulator — per token, zip-add its ±1 bit contributions; then
    fold the counter signs into the signature long. A per-bit-aggregate
    formulation (``bits`` separate aggregates) was measured 10x slower
    (6.5 s vs 0.6 s at sf0.01): each aggregate re-walks the array and
    the 60-way expression tree blows up codegen. The hash array must be
    a real column so the single pass reads an attribute, not a
    re-hashed transform (SCALE.md HOF re-evaluation trap)."""
    return F.expr(f"""
        aggregate(
          zip_with(
            aggregate({hashes_col}, array_repeat(0L, {bits}),
                      (acc, h) -> zip_with(acc,
                          transform(sequence(0, {bits - 1}),
                                    i -> CASE WHEN (h >> i) & 1 = 1
                                         THEN 1L ELSE -1L END),
                          (a, c) -> a + c)),
            sequence(0, {bits - 1}),
            (b, i) -> CASE WHEN b > 0 THEN shiftleft(1L, i) ELSE 0L END),
          0L, (acc, x) -> acc + x)
    """)


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash over a token array: per bit, sign of the sum of
    ±1 contributions from each token's 64-bit murmur hash (F.xxhash64).
    Pure array expressions — no UDF, stays in codegen."""
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    bits = [
        F.when(
            F.aggregate(
                hashes, F.lit(0).cast("long"),
                lambda acc, h: (acc + F.when(
                    h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0,
                    F.lit(1)).otherwise(F.lit(-1))).cast("long"),
            ) > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidate_pairs(sigs: DataFrame, id_col: str, sig_col: str,
                            block_col: str | None = None,
                            max_dist: int = 3, bands: int = 4,
                            sig_bits: int = 64) -> DataFrame:
    """Banded SimHash near-neighbor pairs (Manku et al., WWW'07 §3
    fingerprint-block design). Split the 64-bit signature into
    ``bands`` equal chunks; any pair within Hamming distance
    ``max_dist`` <= bands-1 leaves at least one chunk untouched
    (pigeonhole), so an equi-join on (band_idx, chunk_value[, block])
    yields a candidate superset and the exact hamming test runs on
    candidates only — never an all-pairs predicate join. With 4 bands
    of 16 bits there are 2^16 buckets per band: the shuffle carries
    (id, chunk) pairs and each bucket's quadratic step stays tiny at
    any corpus size.

    Returns (id_a, id_b, sig_a, sig_b) with id_a < id_b, exact-verified
    ``hamming64 <= max_dist``, deduplicated across bands.
    """
    if max_dist >= bands:
        raise ValueError(
            f"pigeonhole guarantee needs bands > max_dist "
            f"(got bands={bands}, max_dist={max_dist})")
    width = sig_bits // bands
    mask = (1 << width) - 1
    keep = [id_col, sig_col] + ([block_col] if block_col else [])
    banded = sigs.select(
        *keep,
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col(sig_col), i * width)
                .bitwiseAND(F.lit(mask)).alias("bval"),
            )
            for i in range(bands)
        ])).alias("bb"),
    ).select(*keep, "bb.band", "bb.bval")
    a, b = banded.alias("sa"), banded.alias("sb")
    cond = ((F.col("sa.band") == F.col("sb.band"))
            & (F.col("sa.bval") == F.col("sb.bval"))
            & (F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}")))
    if block_col:
        cond = cond & (F.col(f"sa.{block_col}") == F.col(f"sb.{block_col}"))
    return (a.join(b, cond)
            .select(F.col(f"sa.{id_col}").alias("id_a"),
                    F.col(f"sb.{id_col}").alias("id_b"),
                    F.col(f"sa.{sig_col}").alias("sig_a"),
                    F.col(f"sb.{sig_col}").alias("sig_b"))
            .distinct()
            .filter(hamming64(F.col("sig_a"), F.col("sig_b")) <= max_dist))


# auto-valve thresholds (see _co_count_pairs): the valve engages only
# when the df histogram is genuinely skewed — max df both >= this
# multiple of the median AND above this absolute floor. The dense
# fixture corpus (max df 152 ≈ 3x median) stays exact, which round-3
# measurements showed is ~2x faster there (re-verification pays per-pair
# array_intersect on a candidate set prefix-style pruning barely shrinks);
# a Zipfian web corpus (stopword shingle df ~ N >> median) trips it.
_AUTO_SKEW_RATIO = 32
_AUTO_DF_FLOOR = 1024


def _co_count_pairs(docs: DataFrame, id_col: str, block_col: str,
                    shingle_col: str,
                    max_df: int | None | str = None) -> tuple[DataFrame, bool]:
    """Inverted-index co-occurrence counts per unordered doc pair: the
    all-pairs similarity-join core shared by the Jaccard and
    containment operators. Explode shingles into postings, equi-join
    postings, count matches per (doc_a, doc_b).

    Tokens are joined as ``xxhash64(block, shingle)`` int64 keys rather
    than raw bigram strings: the shuffle carries 8 B per posting
    instead of the ~16-20 B bigram text and the join/groupBy compare
    longs, not strings. (A cross-token hash collision within one block
    would overcount one pair's intersection; for vocab V the chance of
    ANY collision is ~V²/2⁶⁵ — < 1e-12 for realistic shingle vocabs —
    and the DuckDB value-hash oracle would catch it.)

    ``max_df`` is the 100 TB skew valve (round-2 verdict item): with it
    set, shingles whose document frequency exceeds ``max_df`` are
    dropped from the POSTING JOIN ONLY, bounding every posting list —
    the joined row count becomes Σ min(|posting|, max_df)² and a
    stopword-like shingle can no longer produce an O(N²) hot key. The
    co-count is then an UNDERCOUNT (second return value False); callers
    must re-verify candidates on the full shingle arrays (the pair set
    itself can only lose pairs whose overlap is ENTIRELY hot shingles —
    see test_skew_and_load.py recall test).

    ``max_df="auto"`` (round-3 verdict item) decides from a cheap
    df-sketch instead of relying on the caller: one map-side-combined
    groupBy over the postings yields the df histogram; a single scalar
    collect of (median, p99, max) classifies the corpus. Skewed (max
    >= 32x median AND >= 1024) → valve at the p99 cap; dense/uniform
    (the fixture corpus: max 152 ≈ 3x median) or tiny → exact co-count,
    which is measured-best there. The sketch pass is ~|postings| cheap
    codegen rows — noise next to the quadratic join it protects.

    Returns (pairs(doc_a, doc_b, _c), exact) with doc_a < doc_b.
    """
    posts = (docs.select(F.col(id_col),
                         F.col(block_col).alias("_blk"),
                         F.explode(shingle_col).alias("_sh"))
             .select(F.col(id_col), F.xxhash64("_blk", "_sh").alias("_tk")))
    exact = True
    dfreq = None
    if max_df == "auto":
        posts = posts.persist()
        dfreq = posts.groupBy("_tk").agg(F.count("*").alias("_df")).persist()
        s = dfreq.agg(
            F.expr("approx_percentile(_df, array(0.5, 0.99))").alias("q"),
            F.max("_df").alias("mx")).first()
        p50, p99 = (s["q"] or [1, 1])
        mx = s["mx"] or 0
        if mx >= _AUTO_SKEW_RATIO * max(p50 or 1, 1) and mx >= _AUTO_DF_FLOOR:
            max_df = max(int(p99 or 1), _AUTO_SKEW_RATIO)
        else:
            max_df = None
    if max_df is not None:
        if dfreq is None:
            dfreq = posts.groupBy("_tk").agg(F.count("*").alias("_df"))
        # the HOT token set (df > max_df) is tiny by construction
        # (above the p99/skew cap) — broadcast anti-join beats the
        # old equi-join against the full surviving vocab
        hot = dfreq.filter(F.col("_df") > max_df).select("_tk")
        posts = posts.join(F.broadcast(hot), "_tk", "left_anti")
        exact = False
    a, b = posts.alias("pa"), posts.alias("pb")
    co = (a.join(b, (F.col("pa._tk") == F.col("pb._tk"))
                 & (F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}")))
          .groupBy(F.col(f"pa.{id_col}").alias("doc_a"),
                   F.col(f"pb.{id_col}").alias("doc_b"))
          .agg(F.count("*").alias("_c")))
    return co, exact


def ngram_jaccard_pairs(docs: DataFrame, id_col: str, block_col: str,
                        shingle_col: str, tau: float,
                        size_band: int | None = None,
                        max_df: int | None | str = "auto") -> DataFrame:
    """Exact-Jaccard pair join via an inverted index (the all-pairs
    similarity-join shape): explode shingles into postings, equi-join
    postings on hashed (block, shingle), count co-occurrences per pair,
    derive Jaccard from |A∩B| = co-count and the per-doc set sizes.

    Equivalent to the naive pairwise array_intersect join, but the work
    is Σ|posting|² cheap codegen rows instead of per-pair array
    intersections — measured ~20x at sf0.1 (126 s → ~6 s). (A
    ppjoin-style prefix-filter+verify variant was measured in round 3
    and REJECTED for the default path: this corpus's shingle vocab is
    small/dense — 4.6k tokens over 256k postings at sf0.1 — so prefix
    pruning left 2.4M candidates each paying an array_intersect, ~2x
    slower than co-counting.)

    At 100 TB the posting join shuffles on the token key: hot shingles
    are the skew risk. ``max_df`` is the valve — it bounds every
    posting list (see :func:`_co_count_pairs`), after which candidate
    pairs are re-verified EXACTLY on the full shingle arrays, so
    precision is unaffected and recall loses only pairs whose entire
    overlap is df>max_df shingles (recall + skew test:
    tests/test_skew_and_load.py).

    Returns (doc_a, doc_b, jac) with doc_a < doc_b, jac rounded 4dp.
    """
    # shingling feeds three branches (sizes + both posting sides);
    # persist so the split→ngram→distinct pipeline runs once, not
    # three times (same license as q_dedup_minhash's gram persist —
    # measured 15.6 s → ~5 s at sf0.1, shingling was 6.7 s/pass).
    # The repartition fans the single-row-group fixture scan out of
    # its one partition before shingling + posting explode
    # (optimization round r11).
    docs = fan_out_scan(docs, id_col).persist()
    co, exact = _co_count_pairs(docs, id_col, block_col, shingle_col,
                                max_df=max_df)
    sizes = docs.select(F.col(id_col), F.size(shingle_col).alias("sz"))
    if exact:
        sa = sizes.select(F.col(id_col).alias("doc_a"),
                          F.col("sz").alias("_sza"))
        sb = sizes.select(F.col(id_col).alias("doc_b"),
                          F.col("sz").alias("_szb"))
        j = co.join(sa, "doc_a").join(sb, "doc_b")
    else:
        # max_df path: co-count is a lower bound — recompute the true
        # intersection on the full arrays for the surviving candidates
        ga = docs.select(F.col(id_col).alias("doc_a"),
                         F.col(shingle_col).alias("_ga"))
        gb = docs.select(F.col(id_col).alias("doc_b"),
                         F.col(shingle_col).alias("_gb"))
        j = (co.drop("_c").join(ga, "doc_a").join(gb, "doc_b")
             .withColumn("_c", F.size(F.array_intersect("_ga", "_gb")))
             .withColumn("_sza", F.size("_ga"))
             .withColumn("_szb", F.size("_gb")))
    j = j.withColumn("_jac", F.col("_c").cast("double")
                     / (F.col("_sza") + F.col("_szb") - F.col("_c")))
    if size_band is not None:
        j = j.filter(F.abs(F.col("_sza") - F.col("_szb")) <= size_band)
    return (j.filter(F.col("_jac") >= tau)
            .select("doc_a", "doc_b", F.round("_jac", 4).alias("jac")))


def ngram_containment_pairs(docs: DataFrame, id_col: str, block_col: str,
                            shingle_col: str, tau: float,
                            max_df: int | None | str = "auto") -> DataFrame:
    """Directed containment pairs |A∩B| / |A| >= tau via the same
    inverted-index co-count as :func:`ngram_jaccard_pairs` — the
    asymmetric dedup predicate that catches sub-document duplication
    (a short doc quoted inside a long one), which symmetric Jaccard
    misses because the union in its denominator is dominated by the
    long side.

    One posting equi-join on the hashed token computes the co-count
    for each unordered pair; both directed containments derive from it
    by dividing by the respective source size, so the quadratic step is
    paid once, not twice. ``max_df`` (100 TB skew valve): see
    :func:`ngram_jaccard_pairs` — bounded posting lists, exact
    re-verification, recall documented + tested. Returns
    (src_doc, dst_doc, cont) with cont = |src∩dst| / |src| rounded 4dp.
    """
    # see ngram_jaccard_pairs: shingling runs once, not three times,
    # fanned out of the single scan partition (optimization round r11)
    docs = fan_out_scan(docs, id_col).persist()
    co, exact = _co_count_pairs(docs, id_col, block_col, shingle_col,
                                max_df=max_df)
    if exact:
        sizes = docs.select(F.col(id_col), F.size(shingle_col).alias("sz"))
        sa = sizes.select(F.col(id_col).alias("doc_a"),
                          F.col("sz").alias("_sza"))
        sb = sizes.select(F.col(id_col).alias("doc_b"),
                          F.col("sz").alias("_szb"))
        j = co.join(sa, "doc_a").join(sb, "doc_b")
    else:
        ga = docs.select(F.col(id_col).alias("doc_a"),
                         F.col(shingle_col).alias("_ga"))
        gb = docs.select(F.col(id_col).alias("doc_b"),
                         F.col(shingle_col).alias("_gb"))
        j = (co.drop("_c").join(ga, "doc_a").join(gb, "doc_b")
             .withColumn("_c", F.size(F.array_intersect("_ga", "_gb")))
             .withColumn("_sza", F.size("_ga"))
             .withColumn("_szb", F.size("_gb")))
    # both directions in ONE pass over the co-count relation: a
    # union of two projections would execute the posting join +
    # groupBy subtree twice (measured 15.7 s vs 7.9 s at sf0.1)
    both = j.select(F.explode(F.array(
        F.struct(F.col("doc_a").alias("src_doc"),
                 F.col("doc_b").alias("dst_doc"),
                 (F.col("_c").cast("double") / F.col("_sza"))
                 .alias("_cont")),
        F.struct(F.col("doc_b").alias("src_doc"),
                 F.col("doc_a").alias("dst_doc"),
                 (F.col("_c").cast("double") / F.col("_szb"))
                 .alias("_cont")),
    )).alias("p")).select("p.*")
    return (both.filter(F.col("_cont") >= tau)
            .select("src_doc", "dst_doc",
                    F.round("_cont", 4).alias("cont")))


def lsh_candidate_pairs_incremental(docs: DataFrame, id_col: str,
                                    shingle_col: str, is_new,
                                    n_hashes: int = 16, bands: int = 4,
                                    portable: bool = False) -> DataFrame:
    """Incremental banded LSH: candidates are band-bucket matches with
    AT LEAST ONE side in the new batch — the probe side carries only
    the new docs' bands, so old-vs-old pairs (the overwhelming mass of
    a mature corpus) are never materialized. This is the 100 TB dedup
    economics: a daily crawl batch probes the standing band index at
    cost O(|new| + collisions), not O(|corpus|^2). ``is_new`` is a
    boolean Column over ``docs``. Returns canonical (id_a < id_b)
    pairs, deduplicated across bands."""
    if n_hashes % bands:
        # a silent floor here would drop trailing signature positions
        # and flatten the S-curve without any signal (ADVICE r9); the
        # full-corpus lsh_candidate_pairs has the same contract
        raise ValueError(
            f"n_hashes ({n_hashes}) must divide evenly into bands "
            f"({bands}): {n_hashes % bands} trailing signature "
            "positions would be silently ignored")
    rows = n_hashes // bands
    sig = docs.select(id_col, is_new.alias("_new"), minhash_signature(
        F.col(shingle_col), n_hashes, portable=portable).alias("sig"))
    # Materialize the band index ONCE (bands rows of (id, flag, band,
    # 32-char bucket) per doc — the "standing band index" a production
    # incremental dedup keeps on disk). Without this the probe side
    # (filtered+renamed, so NOT exchange-reusable against the build
    # side) re-executes the whole minhash pipeline — n_hashes md5
    # evaluations per shingle, the dominant cost — a second time
    # (plan-verified: 32 conv(substring(md5 ...)) pipelines before,
    # 16 after). Wall-clock at sf0.1 moves only ~1.0-1.15x because
    # the duplicate subtrees ran in parallel on idle cores; the CPU
    # halving is the 100 TB win (optimization round r11).
    banded = sig.select(
        id_col, "_new",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *[
                    F.element_at("sig", b * rows + r + 1).cast("string")
                    for r in range(rows)
                ])).alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select(id_col, "_new", "bb.band", "bb.bucket").localCheckpoint(
        eager=True)
    probe = banded.filter(F.col("_new")).select(
        F.col(id_col).alias("_nid"), "band", "bucket")
    return (probe.join(banded,
                       ["band", "bucket"])
            .filter(F.col("_nid") != F.col(id_col))
            .select(F.least("_nid", F.col(id_col)).alias("id_a"),
                    F.greatest("_nid", F.col(id_col)).alias("id_b"))
            .distinct())


def sorted_neighborhood_pairs(ranked: DataFrame, window: int,
                              key_col: str = "nat",
                              rank_col: str = "rn") -> DataFrame:
    """Sorted-neighborhood candidate pairs over a pre-ranked frame —
    each record pairs with its next `window - 1` sort neighbors within
    `key_col`, via a BUCKETED band join (VERDICT r10 item 2).

    A bare equi-join on `key_col` with the rank band as a post-join
    filter enumerates each key's full intra-key cross product — O(n²)
    executed work per key even though candidate OUTPUT is O(n·w). Here
    the equi-key is the fine-grained `(key, rank DIV w)` bucket: the
    band [rn+1, rn+w-1] spans exactly the probe row's own bucket and
    the next one, so each probe row is exploded into those two bucket
    probes and the join enumerates at most 2w build rows per probe
    row BEFORE the band filter — executed work O(n·w), matching the
    output bound. A (band-satisfying) pair can match in only one
    bucket probe (the build row's bucket is unique), so no dedup pass
    is needed.

    Returns columns: `key_col`, a_rn, b_rn, a_name, b_name (plus any
    extra columns prefixed a_/b_ from `extra_cols`). Requires `ranked`
    to carry `key_col`, `rank_col`, and `name`.
    """
    w = int(window)
    probe = ranked.select(
        F.col(key_col),
        F.col(rank_col).alias("a_rn"),
        F.col("name").alias("a_name"),
        F.explode(F.array(
            F.expr(f"{rank_col} DIV {w}"),
            F.expr(f"{rank_col} DIV {w} + 1"))).alias("_bkt"))
    build = ranked.select(
        F.col(key_col),
        F.col(rank_col).alias("b_rn"),
        F.col("name").alias("b_name"),
        F.expr(f"{rank_col} DIV {w}").alias("_bkt"))
    return (probe.join(build, [key_col, "_bkt"])
            .filter((F.col("b_rn") > F.col("a_rn"))
                    & (F.col("b_rn") <= F.col("a_rn") + w - 1))
            .drop("_bkt"))


def sorted_neighborhood_enumeration(ranked: DataFrame, window: int,
                                    key_col: str = "nat",
                                    rank_col: str = "rn") -> int:
    """Count of rows the bucketed band join ENUMERATES before the band
    filter — the cost gate for sorted_neighborhood_pairs' linearity
    claim (must be ≤ 2·w·n; a nat-only equi-key would be Σ n_k²)."""
    w = int(window)
    probe = ranked.select(
        F.col(key_col),
        F.explode(F.array(
            F.expr(f"{rank_col} DIV {w}"),
            F.expr(f"{rank_col} DIV {w} + 1"))).alias("_bkt"))
    build = ranked.select(
        F.col(key_col), F.expr(f"{rank_col} DIV {w}").alias("_bkt"))
    return probe.join(build, [key_col, "_bkt"]).count()
