"""Custom Python DataSource (sources/pydatasource.py): value
exactness, partition planning, and filter-pushdown pruning."""

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
)

from challenge8_movies_etl_spark.sources.pydatasource import (
    SynthCorpusReader,
    register,
)


def test_values_exact_and_parallel(spark):
    register(spark)
    df = (spark.read.format("synthcorpus")
          .option("n_docs", 100).option("numPartitions", 5).load())
    assert df.rdd.getNumPartitions() == 5
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [SynthCorpusReader.expected_row(d) for d in range(100)]


def test_pushdown_prunes_partitions():
    r = SynthCorpusReader({"n_docs": "100", "numPartitions": "5"})
    remaining = list(r.pushFilters([
        GreaterThanOrEqual(("doc_id",), 40),
        LessThan(("doc_id",), 60),
        IsNotNull(("lang",)),          # not range-on-doc_id: returned
    ]))
    assert len(remaining) == 1 and isinstance(remaining[0], IsNotNull)
    parts = [(p.start, p.end) for p in r.partitions()]
    # 5 slices of 20 -> only [40,59] overlaps survive, clamped
    assert parts == [(40, 59)]


def test_pushdown_empty_range_reads_nothing(spark):
    register(spark)
    df = (spark.read.format("synthcorpus")
          .option("n_docs", 50).load()
          .filter((F.col("doc_id") > 200)))
    assert df.count() == 0


def test_filtered_read_end_to_end(spark):
    register(spark)
    df = (spark.read.format("synthcorpus")
          .option("n_docs", 200).option("numPartitions", 8).load()
          .filter((F.col("doc_id") >= 150) & (F.col("lang") == "en")))
    got = sorted(r.doc_id for r in df.collect())
    assert got == [d for d in range(150, 200) if d % 5 == 0]


def test_stream_reader_exactly_once_and_batched(spark):
    """The streaming reader must deliver each doc exactly once across
    micro-batches (offset ranges partition the id space) and advance
    in batch_rows steps."""
    from pyspark.sql import functions as F

    from challenge8_movies_etl_spark.queries_pysource import (
        q_pysource_stream,
    )

    out = q_pysource_stream(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_docs for r in out) == 5000
    assert {r.lang for r in out} == {"en", "de", "fr", "es", "it"}
    for r in out:
        assert r.n_docs == 1000
        assert 0 <= r.min_id <= 4 and 4995 <= r.max_id <= 4999


def test_stream_reader_offset_protocol():
    from challenge8_movies_etl_spark.sources.pydatasource import (
        SynthCorpusStreamReader,
    )

    r = SynthCorpusStreamReader({"n_docs": "1000", "batch_rows": "300",
                                 "numPartitions": "4"})
    assert r.initialOffset() == {"offset": 0}
    offs = [r.latestOffset()["offset"] for _ in range(5)]
    assert offs == [300, 600, 900, 1000, 1000]  # clamps, then idles
    parts = r.partitions({"offset": 300}, {"offset": 600})
    covered = sorted(i for p in parts
                     for i in range(p.start, p.end + 1))
    assert covered == list(range(300, 600))  # exact, no overlap
