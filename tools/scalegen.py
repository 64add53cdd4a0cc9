"""Generate sf-scaled synthetic fixtures for scale-slope measurement.

The driver's /root/testdata is read-only and tops out at sf0.1, so the
empirical evidence for every "survives 100 TB" docstring claim stops
one decade short (VERDICT r6 item 5). This tool regenerates the same
star schema one decade up (default sf1.0 = 10x sf0.1: 6 M lineitem,
50 k documents, 20 k embeddings, 1 M events) with marginals matched to
the driver fixtures (profiled via DuckDB over sf0.1: uniform 30-word
document vocabulary + rare 'dup', unit-norm 64-d embeddings with 10
labels, 1..7 lineitems per order, the same flag/priority/segment
value sets). Determinism comes from xxhash64 of (row id, salt) — no
RNG, so regeneration is reproducible bit-for-bit. Round 8: the
document vocabulary grows by Heaps' law (V ∝ N^0.5, anchored at the
30 words observed at sf0.1) so dedup-family slopes measure the
operators, not a fixed-vocab collision artifact (VERDICT r7 item 3).

Usage: python tools/scalegen.py [--sf 1.0] [--out /tmp/scale_sf1]
Then:  python tools/scalerun.py --dirs /root/testdata/sf0.1,/tmp/scale_sf1
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

VOCAB = ["spark", "window", "merge", "table", "column", "vector",
         "stream", "value", "data", "small", "join", "filter", "big",
         "group", "hash", "customer", "sort", "order", "slow", "line",
         "part", "fast", "the", "row", "agg", "key", "query", "a",
         "scan", "batch"]  # the 30 uniform words observed at sf0.1
LANGS = ["en", "en", "de", "es", "fr", "zh"]  # en ~2x the others
SEGMENTS = None  # read from sf0.1 at runtime (5 values)


def _u(col, salt: int):
    """Deterministic uniform double in [0, 1) from a bigint column."""
    return (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000))
            / 1_000_000.0)


def _pick(col, salt: int, n: int):
    """Deterministic uniform int in [0, n)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(n))


def _ids(spark: SparkSession, n: int, name: str = "id") -> DataFrame:
    return spark.range(n).withColumnRenamed("id", name)


def gen_all(spark: SparkSession, sf: float, out: Path,
            base: str = "/root/testdata/sf0.1",
            sparse_vocab: bool = False) -> None:
    k = sf / 0.1  # row multiplier vs the profiled base
    out.mkdir(parents=True, exist_ok=True)

    def write(df: DataFrame, name: str, parts: int = 1) -> None:
        t0 = time.perf_counter()
        (df.coalesce(parts).write.mode("overwrite")
         .parquet(str(out / f"{name}.parquet")))
        print(f"  {name}: {time.perf_counter()-t0:.1f}s")

    # dims: identical at every sf (the driver keeps them fixed)
    for dim in ("region", "nation"):
        write(spark.read.parquet(f"{base}/{dim}.parquet"), dim)

    seg = [r[0] for r in spark.read.parquet(f"{base}/customer.parquet")
           .select("c_mktsegment").distinct().collect()]
    seg.sort()
    n_cust = int(15000 * k)
    c = _ids(spark, n_cust, "c_custkey")
    write(c.select(
        "c_custkey",
        F.format_string("Customer#%09d", "c_custkey").alias("c_name"),
        _pick(F.col("c_custkey"), 1, 25).cast("int").alias("c_nationkey"),
        F.round(-1000 + _u(F.col("c_custkey"), 2) * 11000, 2)
        .alias("c_acctbal"),
        F.array(*[F.lit(s) for s in seg])[
            _pick(F.col("c_custkey"), 3, len(seg))].alias("c_mktsegment")),
        "customer")

    n_supp = int(1000 * k)
    s = _ids(spark, n_supp, "s_suppkey")
    write(s.select(
        "s_suppkey",
        F.format_string("Supplier#%09d", "s_suppkey").alias("s_name"),
        _pick(F.col("s_suppkey"), 4, 25).cast("int").alias("s_nationkey"),
        F.round(-1000 + _u(F.col("s_suppkey"), 5) * 11000, 2)
        .alias("s_acctbal")), "supplier")

    brands = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
    types = [r[0] for r in spark.read.parquet(f"{base}/part.parquet")
             .select("p_type").distinct().collect()]
    types.sort()
    n_part = int(20000 * k)
    p = _ids(spark, n_part, "p_partkey")
    write(p.select(
        "p_partkey",
        F.format_string("Part#%09d", "p_partkey").alias("p_name"),
        F.array(*[F.lit(b) for b in brands])[
            _pick(F.col("p_partkey"), 6, 25)].alias("p_brand"),
        F.array(*[F.lit(t) for t in types])[
            _pick(F.col("p_partkey"), 7, len(types))].alias("p_type"),
        (1 + _pick(F.col("p_partkey"), 8, 50)).cast("int").alias("p_size"),
        F.round(900 + _u(F.col("p_partkey"), 9) * 100, 2)
        .alias("p_retailprice")), "part")

    n_ord = int(150000 * k)
    o = _ids(spark, n_ord, "o_orderkey")
    orders = o.select(
        "o_orderkey",
        _pick(F.col("o_orderkey"), 10, n_cust).alias("o_custkey"),
        F.array(F.lit("F"), F.lit("O"), F.lit("P"))[
            _pick(F.col("o_orderkey"), 11, 3)].alias("o_orderstatus"),
        F.round(1000 + _u(F.col("o_orderkey"), 12) * 499000, 2)
        .alias("o_totalprice"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("1995-01-01 00:00:00"))
            + (_pick(F.col("o_orderkey"), 13, 2404) * 86400))
        .cast("timestamp_ntz").alias("o_orderdate"),
        F.array(*[F.lit(x) for x in
                  ("1-URGENT", "2-HIGH", "3-MEDIUM",
                   "4-NOT SPECIFIED", "5-LOW")])[
            _pick(F.col("o_orderkey"), 14, 5)].alias("o_orderpriority"))
    write(orders, "orders")

    # lineitem: 1..7 lines per order (avg 4 -> n_ord * 4 rows)
    li = (o.select(
        "o_orderkey",
        F.explode(F.sequence(
            F.lit(1),
            (1 + _pick(F.col("o_orderkey"), 15, 7)).cast("int")))
        .alias("l_linenumber")))
    key = F.xxhash64("o_orderkey", "l_linenumber")
    write(li.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.pmod(key, F.lit(n_part)).alias("l_partkey"),
        F.pmod(F.xxhash64(key, F.lit(16)), F.lit(n_supp))
        .alias("l_suppkey"),
        F.col("l_linenumber").cast("int"),
        (1 + F.pmod(F.xxhash64(key, F.lit(17)), F.lit(50)))
        .cast("double").alias("l_quantity"),
        F.round(900 + (F.pmod(F.xxhash64(key, F.lit(18)),
                              F.lit(1_000_000)) / 1_000_000.0)
                * 104100, 2).alias("l_extendedprice"),
        (F.pmod(F.xxhash64(key, F.lit(19)), F.lit(11)) / 100.0)
        .alias("l_discount"),
        (F.pmod(F.xxhash64(key, F.lit(20)), F.lit(9)) / 100.0)
        .alias("l_tax"),
        F.array(F.lit("A"), F.lit("N"), F.lit("R"))[
            F.pmod(F.xxhash64(key, F.lit(21)), F.lit(3)).cast("int")]
        .alias("l_returnflag"),
        F.array(F.lit("F"), F.lit("O"))[
            F.pmod(F.xxhash64(key, F.lit(22)), F.lit(2)).cast("int")]
        .alias("l_linestatus"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("1995-01-02 00:00:00"))
            + F.pmod(F.xxhash64(key, F.lit(23)), F.lit(2498)) * 86400)
        .cast("timestamp_ntz").alias("l_shipdate")),
        "lineitem", parts=max(1, int(k)))

    n_ev = int(100000 * k)
    n_users = int(1500 * k)
    ev = _ids(spark, n_ev, "event_id")
    write(ev.select(
        "event_id",
        F.timestamp_micros(
            (F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
             * 1_000_000
             + F.pmod(F.xxhash64("event_id", F.lit(24)),
                      F.lit(30 * 86400 * 1_000_000)))
        ).cast("timestamp_ntz").alias("ts"),
        _pick(F.col("event_id"), 25, n_users).alias("user_id"),
        F.array(*[F.lit(t) for t in
                  ("click", "view", "purchase", "signup", "error")])[
            _pick(F.col("event_id"), 26, 5)].alias("event_type"),
        F.round(_u(F.col("event_id"), 27) * 560, 2).alias("value"),
        F.format_string(
            '{"k": %d}', _pick(F.col("event_id"), 28, 100))
        .alias("props")), "events")

    # documents: 10..100 words per doc, 'dup' injected at the
    # observed ~1/600 token rate. Vocabulary follows HEAPS' LAW
    # (V ∝ N^0.5 — VERDICT r7 item 3): at k=1 exactly the 30 words
    # profiled from sf0.1, one decade up ~95 words (30·√10), so the
    # shingle/n-gram collision rate falls with corpus growth the way
    # real text's does instead of the fixed-vocab fixture's
    # quadratic candidate-pair blowup. Capped at 600 (the dup-slot
    # modulus) — reached ~3 decades up, far past what this host can
    # hold anyway.
    n_doc = int(5000 * k)
    n_vocab = min(600, max(30, int(30 * k ** 0.5)))
    vocab = VOCAB + [f"hw{i:03d}" for i in range(n_vocab - 30)]
    d = _ids(spark, n_doc, "doc_id")
    widx = F.pmod(
        F.xxhash64("doc_id", F.col("i"), F.lit(29)), F.lit(601))
    word = (F.when(widx >= 600, F.lit("dup"))
            .otherwise(F.array(*[F.lit(w) for w in vocab])[
                F.pmod(widx, F.lit(n_vocab)).cast("int")]))
    if sparse_vocab:
        # Sparse-vocabulary mode (VERDICT r8 item 4): a realistic
        # Heaps type count (V = 20000·√k ≈ 44·N_tokens^0.49, the
        # empirical law for real text — tens of thousands of types,
        # not ~95) so per-term document frequencies are LOW and the
        # WWW'07 prefix filter has the sparsity it exploits in real
        # corpora. Same dup-slot rate; synthetic word ids from an
        # independent hash (widx only spans 0..600).
        n_sparse = max(2000, int(20000 * k ** 0.5))
        word = (F.when(widx >= 600, F.lit("dup"))
                .otherwise(F.format_string(
                    "w%06d",
                    F.pmod(F.xxhash64("doc_id", F.col("i"), F.lit(35)),
                           F.lit(n_sparse)).cast("int"))))
    docs = (d.select(
        "doc_id",
        F.explode(F.sequence(
            F.lit(1),
            (10 + _pick(F.col("doc_id"), 30, 91)).cast("int")))
        .alias("i"))
        .select("doc_id", word.alias("w"), "i")
        .groupBy("doc_id")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("i", "w"))),
                        lambda s: s["w"]), " ").alias("text"))
        .select(
            "doc_id", "text",
            F.array(*[F.lit(x) for x in LANGS])[
                _pick(F.col("doc_id"), 31, len(LANGS))].alias("lang"),
            F.concat(F.lit("src"),
                     _pick(F.col("doc_id"), 32, 20).cast("string"))
            .alias("source"),
            F.length("text").cast("long").alias("n_chars")))
    # Controlled duplicate injection (VERDICT r8 item 5): 2% of
    # documents are duplicates of their immediate predecessor — 1%
    # exact copies (doc_id % 100 == 1) and 1% near-duplicates with a
    # single token appended (doc_id % 100 == 51) — so the dedup
    # family's VERIFY stage processes a nonzero, scale-proportional
    # final pair count at every sf instead of only exercising the
    # candidate/prefilter machinery (SCALE_RUN_r8 big_rows=0).
    pred = docs.select(F.col("doc_id").alias("_sid"),
                       F.col("text").alias("_stext"))
    docs = (docs.join(pred, docs.doc_id - 1 == pred._sid, "left")
            .select(
                "doc_id",
                F.when((F.col("doc_id") % 100 == 1)
                       & F.col("_stext").isNotNull(), F.col("_stext"))
                .when((F.col("doc_id") % 100 == 51)
                      & F.col("_stext").isNotNull(),
                      F.concat(F.col("_stext"), F.lit(" dup")))
                .otherwise(F.col("text")).alias("text"),
                "lang", "source")
            .withColumn("n_chars", F.length("text").cast("long")))
    write(docs, "documents")

    # embeddings: unit-norm 64-d float vectors, 10 labels
    n_emb = int(2000 * k)
    e = _ids(spark, n_emb, "vec_id")
    raw = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (F.pmod(F.xxhash64("vec_id", i, F.lit(33)),
                          F.lit(2001)) - 1000) / 1000.0)
    nrm = F.sqrt(F.aggregate(raw, F.lit(0.0),
                             lambda acc, x: acc + x * x))
    write(e.select(
        "vec_id",
        F.transform(raw, lambda x: (x / nrm).cast("float"))
        .alias("embedding"),
        _pick(F.col("vec_id"), 34, 10).cast("int").alias("label")),
        "embeddings")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sparse-vocab", action="store_true",
                    help="realistic Heaps type count (thousands) for "
                         "the documents table — the prefix-filter "
                         "fixture (VERDICT r8 item 4)")
    args = ap.parse_args()
    out = Path(args.out or f"/tmp/scale_sf{args.sf:g}"
               + ("_sparse" if args.sparse_vocab else ""))
    spark = (SparkSession.builder.master("local[16]")
             .appName("scalegen")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    t0 = time.perf_counter()
    gen_all(spark, args.sf, out, sparse_vocab=args.sparse_vocab)
    print(f"sf{args.sf:g} fixtures at {out} "
          f"in {time.perf_counter()-t0:.0f}s")


if __name__ == "__main__":
    main()
