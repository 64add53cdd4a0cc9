"""Bucketing: pre-partitioned co-located joins (SURVEY.md §4.2 /
pyspark guide). Writing both join sides bucketed by the key lets later
joins skip the exchange entirely — at 100 TB this converts every
repeated fact-fact join on the same key into a zero-shuffle merge."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark):
    # spark.sql.warehouse.dir is static — bucketed tables land in the
    # default ./spark-warehouse (gitignored) and are dropped after
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    (o.write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").saveAsTable("orders_b"))
    (c.write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").saveAsTable("customer_b"))
    try:
        ob = spark.table("orders_b")
        cb = spark.table("customer_b")
        # disable broadcast so the join would need a shuffle WITHOUT
        # bucketing; with bucketing both sides are already co-located
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
            "o_orderkey", "c_name")
        p = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert not re.search(r"^\(\d+\) Exchange$", p, re.M), p
        assert j.count() == o.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_q_join_bucketed_plan_joins_without_exchange(spark):
    """The registered query's sort-merge join must consume the bucket
    layout directly: no Exchange may feed the SortMergeJoin (the only
    allowed exchange is the post-join rollup on c_mktsegment)."""
    from challenge8_movies_etl_spark.queries_joins import q_join_bucketed

    df = q_join_bucketed(spark, SF_SMOKE)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "SortMergeJoin" in p, p
    # formatted plan lists operators top-down; everything at or below
    # the SMJ must be exchange-free (bucketed scan feeds the sort)
    below_smj = p.split("SortMergeJoin", 1)[1].split("\n\n", 1)[0]
    join_inputs = [ln for ln in below_smj.splitlines()
                   if "Exchange" in ln]
    assert not join_inputs, below_smj
    assert df.count() == 5
