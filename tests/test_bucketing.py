"""Bucketed co-located joins: the shuffle-elimination strategy for
repeatedly-joined fact tables at 100 TB (SURVEY.md §4 / README scale
notes).  Verifies on the physical plan that bucketed scans satisfy the
join distribution (no pre-join Exchange) and that results match the
plain shuffle join."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from hive_udf_neologd_spark.sources import read_table, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    write_bucketed(read_table(spark, SF_DIR, "orders"), "b_orders", "o_custkey", 8)
    write_bucketed(read_table(spark, SF_DIR, "customer"), "b_customer", "c_custkey", 8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def _exchange_nodes(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


def test_bucketed_join_has_no_prejoin_shuffle(spark, bucketed_tables):
    orders_t, cust_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(orders_t)
            .join(spark.table(cust_t), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert plan.count("Bucketed: true") == 2
    assert "SelectedBucketsCount: 8 out of 8" in plan
    assert "SortMergeJoin" in plan
    # The ONLY exchange is the post-join aggregation; both join inputs are
    # satisfied by the bucketed scans.
    assert _exchange_nodes(plan) == 1


def test_bucketed_join_matches_shuffle_join(spark, bucketed_tables):
    orders_t, cust_t = bucketed_tables
    bucketed = dict(
        spark.table(orders_t)
        .join(spark.table(cust_t), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    plain = dict(
        read_table(spark, SF_DIR, "orders")
        .join(
            read_table(spark, SF_DIR, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert bucketed == plain
