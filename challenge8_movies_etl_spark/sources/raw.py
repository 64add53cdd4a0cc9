"""Raw sources & sinks beyond parquet — the reference's I/O surface
(SURVEY.md §2.A): ragged JSON, CSV with explicit schema, chunked/
partitioned sinks, JDBC.

The fixtures are parquet-only, so these are exercised by unit tests on
temp files (tests/test_sources.py), not by the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json_ragged(spark: SparkSession, path: str,
                     schema: T.StructType | None = None) -> DataFrame:
    """JSON source for ragged records (the wikipedia.movies.json shape,
    challenge.py≈L64 [R]): every key a nullable column.

    With an explicit schema there is NO inference pass over the data —
    mandatory at scale (schema inference = an extra full scan).
    multiLine=False assumes JSON-lines; the reference's single big JSON
    array needs multiLine=True (slower: file-at-a-time parsing).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True) -> DataFrame:
    """CSV with explicit schema — the pd.read_csv(low_memory=False)
    analog (challenge.py≈L62 [R]) without the inference scan."""
    return (spark.read.schema(schema)
            .option("header", str(header).lower())
            .option("mode", "PERMISSIVE")
            .csv(path))


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_by: list[str] | None = None,
                              mode: str = "overwrite") -> None:
    """The engine's sink. The reference loaded ratings to PostgreSQL in
    1M-row chunks with progress prints (≈L203-210 [R]); Spark's
    executor-parallel partitioned write is the distributed equivalent —
    'chunking' is the task partitioning itself."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jdbc(df: DataFrame, url: str, table: str,
               mode: str = "append", batchsize: int = 1_000_000,
               **options: str) -> None:
    """JDBC sink (the to_sql analog, ≈L197-201 [R]). No database exists
    in this environment — wiring kept real, call sites must try/except.
    batchsize mirrors the reference's 1M-row chunks."""
    (df.write.mode(mode)
     .format("jdbc")
     .option("url", url)
     .option("dbtable", table)
     .option("batchsize", str(batchsize))
     .options(**options)
     .save())


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — Spark-native columnar alternative to parquet, same
    pushdown/pruning behavior (predicate pushdown + column pruning
    reach the ORC reader exactly as they do the parquet one)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (executor-parallel, like the parquet sink)."""
    df.write.mode(mode).orc(path)


def read_xml(spark: SparkSession, path: str, row_tag: str = "row",
             schema: T.StructType | None = None) -> DataFrame:
    """XML source — native in Spark 4 (the spark-xml package was
    upstreamed): StAX row-boundary splitting keeps ingest
    executor-parallel even on large files. Pass an explicit schema in
    production; inference costs a full extra pass at 100 TB."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              root_tag: str = "rows", mode: str = "overwrite") -> None:
    """XML sink (executor-parallel, one document per partition file)."""
    (df.write.mode(mode).format("xml")
     .option("rowTag", row_tag).option("rootTag", root_tag).save(path))


def read_text(spark: SparkSession, path: str,
              whole: bool = False) -> DataFrame:
    """Line-oriented text source → one `value` string column; the raw
    ingest shape for unstructured corpora before parsing (at scale:
    line splitting is parallel per HDFS block, so a single huge file
    still fans out). whole=True reads file-per-row instead
    (wholetext) — for formats that cannot split."""
    return spark.read.option("wholetext", str(whole).lower()).text(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite",
               compression: str | None = None) -> None:
    """Text sink: df must be a single string column (the JSONL/plain
    export path; callers to_json() structured rows first)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def write_jsonl_sharded(df: DataFrame, path: str,
                        shard_rows: int = 100_000,
                        compression: str | None = "gzip",
                        mode: str = "overwrite") -> dict:
    """Training-data export: gzip JSONL shards of ~shard_rows each plus
    a manifest (shard count, row count, schema) — the hand-off format
    LLM training loaders consume. Shard sizing rides repartition on the
    exact row count (one cheap count job), so shards are balanced
    regardless of upstream partitioning; each executor writes its shard
    independently (no driver funnel).

    At 100 TB: identical code — the count becomes a metadata lookup
    when the source is a table, and shard_rows controls loader-side
    parallelism granularity.
    """
    import json as _json
    import os as _os

    from pyspark.sql import functions as _F

    n = df.count()
    n_shards = max(1, (n + shard_rows - 1) // shard_rows)
    out = df.select(_F.to_json(_F.struct(*df.columns)).alias("value")) \
            .repartition(n_shards)
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.text(path)
    manifest = {
        "format": "jsonl",
        "compression": compression,
        "n_rows": n,
        "n_shards": n_shards,
        "columns": df.columns,
    }
    with open(_os.path.join(path, "_manifest.json"), "w") as fh:
        _json.dump(manifest, fh)
    return manifest


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """Raw-file ingest for multimodal corpora: Spark's `binaryFile`
    source yields (path, modificationTime, length, content) per file —
    the entry point that feeds operators/multimodal.py's decoders when
    images/audio arrive as object-store files rather than a binary
    parquet column. `glob` filters by pattern (e.g. ``*.bmp``) AT THE
    LISTING, so non-matching files are never opened.

    At 100 TB: file listing is driver-parallelized by the source;
    content is read executor-side one file per row — pair with
    `spark.sql.files.maxPartitionBytes` so a partition holds a bounded
    byte budget of payloads, and repartition after reading tiny files
    (the small-files problem is the real hazard; compaction —
    q_compaction_plan — is the upstream fix)."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_json_with_quarantine(spark: SparkSession, path: str,
                              schema: T.StructType) -> DataFrame:
    """PERMISSIVE JSON ingestion with an explicit corrupt-record
    quarantine column — the first line of defense of a real crawl
    pipeline: malformed rows land whole in ``_corrupt_record`` instead
    of killing the job (FAILFAST) or vanishing (DROPMALFORMED), so the
    bad payloads can be counted, sampled, and re-driven.

    The returned frame carries the declared columns plus
    ``_corrupt_record`` (NULL for clean rows). Callers split:
    ``df.filter("_corrupt_record IS NULL")`` is the clean feed,
    the complement is the quarantine sink. At 100 TB the quarantine
    fraction is the ingest health metric you alert on.

    Spark caveat encoded here: a schema that wants the corrupt column
    must INCLUDE it (Spark refuses to emit it otherwise), and
    PERMISSIVE mode needs the column type to be string."""
    full = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)])
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))
