"""Bucketed co-located join: the shuffle must disappear."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.plans.inspect import count_shuffles, simple_plan
from decision_tree_analytics_spark.sources.bucketing import bucketed_join, write_bucketed
from decision_tree_analytics_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    write_bucketed(orders, "orders_b", ["custkey"], n_buckets=8)
    write_bucketed(customer, "customer_b", ["custkey"], n_buckets=8)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force sort-merge so the test proves bucketing (not broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "orders_b", "customer_b", ["custkey"])
        plan = simple_plan(joined)
        assert "SortMergeJoin" in plan
        assert count_shuffles(plan) == 0, plan

        # and the answer matches the plain-join answer
        want = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
