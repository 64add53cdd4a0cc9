"""Query over the custom Python DataSource (sources/pydatasource.py)
— proves the Spark-4 source-extension surface end to end: format
registration, executor-parallel range partitions, filter pushdown
into the Python reader, then ordinary Catalyst aggregation on top.
The DuckDB oracle regenerates the deterministic corpus with
generate_series, so content, pushdown bounds, and aggregation are all
value-hash-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from .session import apply_required_conf
from .sources.pydatasource import register


@query(
    "q_pysource_scan",
    oracle="""
    WITH d AS (
      SELECT unnest(generate_series(1000, 3999)) AS doc_id
    ), src AS (
      SELECT doc_id,
             'synthetic document ' || doc_id || ' body ' ||
               rtrim(repeat('word ', doc_id % 7 + 1)) AS text,
             CASE doc_id % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                  WHEN 2 THEN 'fr' WHEN 3 THEN 'es' ELSE 'it' END
               AS lang,
             doc_id % 97 AS quality_bucket
      FROM d
    )
    SELECT lang,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(length(text)) as bigint) AS total_chars,
           cast(sum(quality_bucket) as bigint) AS bucket_sum,
           cast(min(doc_id) as bigint) AS min_id,
           cast(max(doc_id) as bigint) AS max_id
    FROM src GROUP BY lang
    """,
)
def q_pysource_scan(spark, sf_dir):
    """Scan the ``synthcorpus`` Python DataSource with a range
    predicate that the reader absorbs via pushFilters (both bounds),
    then aggregate per language.  The 16 planned range partitions
    collapse to the ~10 that can overlap [1000, 3999] — partitions
    outside the bounds are never scheduled (the Python-source analog
    of parquet min/max pruning; pruning behavior unit-tested in
    tests/test_pydatasource.py).  sf_dir is unused: the source IS the
    data (deterministic, closed-form), which is exactly the
    reproducible-ingest shape a synthetic-benchmark or API-backed
    source has in production."""
    apply_required_conf(spark)  # enables python filter pushdown
    register(spark)
    df = (spark.read.format("synthcorpus")
          .option("n_docs", 5000).option("numPartitions", 16).load()
          .filter((F.col("doc_id") >= 1000) & (F.col("doc_id") <= 3999)))
    return df.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum("quality_bucket").alias("bucket_sum"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"))


@query(
    "q_pysource_stream",
    oracle="""
    WITH d AS (
      SELECT unnest(generate_series(0, 4999)) AS doc_id
    ), src AS (
      SELECT doc_id,
             CASE doc_id % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                  WHEN 2 THEN 'fr' WHEN 3 THEN 'es' ELSE 'it' END
               AS lang,
             doc_id % 97 AS quality_bucket
      FROM d
    )
    SELECT lang,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(quality_bucket) as bigint) AS bucket_sum,
           cast(min(doc_id) as bigint) AS min_id,
           cast(max(doc_id) as bigint) AS max_id
    FROM src GROUP BY lang
    """,
)
def q_pysource_stream(spark, sf_dir):
    """STREAM from the custom Python DataSource
    (`spark.readStream.format("synthcorpus")`) — the Spark 4
    DataSourceStreamReader surface: row-id offsets advance 1000 rows
    per micro-batch, each batch's range splits into executor-parallel
    partitions, and the engine's offset checkpointing makes delivery
    exactly-once. All 5000 docs arrive over 5 micro-batches into a
    memory sink; the final per-language aggregate must be value-hash
    identical to the closed-form corpus — any dropped, duplicated, or
    re-ordered offset range breaks count/min/max/sum.

    Scale: this is the skeleton of a custom ingest connector (queue,
    API, change feed) — offsets bound replay, partitions bound
    parallelism, and the aggregation below is ordinary Catalyst."""
    import uuid as _uuid

    apply_required_conf(spark)
    register(spark)
    stream = (spark.readStream.format("synthcorpus")
              .option("n_docs", 5000).option("batch_rows", 1000)
              .option("numPartitions", 4).load())
    name = f"pystream_{_uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(processingTime="0 seconds")
         .start())
    import time as _time
    deadline = _time.time() + 120
    while _time.time() < deadline:
        q.processAllAvailable()
        if spark.table(name).count() >= 5000:
            break
        _time.sleep(0.2)
    q.stop()
    return (spark.table(name).groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("quality_bucket").alias("bucket_sum"),
                 F.min("doc_id").alias("min_id"),
                 F.max("doc_id").alias("max_id")))
