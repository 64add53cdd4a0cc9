"""Fixture sources: the driver-generated TPC-H-ish parquet tables.

Every table is read with an explicit repair/normalization step where the
raw parquet type is not directly usable (``events.ts`` nanos). All reads
are plain ``spark.read.parquet`` scans — columnar, predicate-pushdown and
column-pruning friendly; at 100 TB these become partitioned/ bucketed
table scans with identical downstream code.

Reference parity: the reference's extract stage is ``pd.read_csv`` x2 +
``json.load`` (challenge.py≈L62-66 [R], see SURVEY.md §0 for the [R]
citation legend); here the equivalent sources are Parquet (primary),
plus CSV/JSON readers in sources/raw.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_required_conf

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying type repairs.

    ``events.ts`` is parquet TIMESTAMP(NANOS): with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it scans as bigint
    nanoseconds; we convert with *integer* division (``ts DIV 1000``) —
    float division loses sub-microsecond bits (53-bit mantissa vs the
    ~61 bits a ns epoch needs) and can flip a microsecond.
    """
    apply_required_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = repair_events_ts(df)
    return df


def repair_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP regardless of the fixture
    generation's physical parquet type (shared by the batch loader and
    the streaming replay source):

    - bigint — TIMESTAMP(NANOS) scanned under nanosAsLong: integer-
      divide to micros (float division loses sub-µs bits).
    - timestamp_ntz — round-3 regenerated fixtures store plain
      timestamp[us] (no zone): cast NTZ -> TIMESTAMP under the pinned
      UTC session zone — value-preserving, and downstream
      unix_micros()/window() require TIMESTAMP (DuckDB reads the same
      column as naive TIMESTAMP, so semantics match).
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for the SQL API path."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
