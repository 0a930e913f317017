"""Partition-pruning locks: a month-partitioned parquet sink must give
readers static partition pruning (literal filter) and dynamic
partition pruning (selective dim join) — the mechanism that keeps a
100 TB fact scan from reading every partition."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from decision_tree_analytics_spark.plans.inspect import formatted_plan
from decision_tree_analytics_spark.sources.formats import write_parquet
from decision_tree_analytics_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def month_partitioned_orders(spark, sf_dir, tmp_path_factory):
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path_factory.mktemp("dpp") / "orders_by_month")
    write_parquet(o, path, partition_by=["order_month"], target_files=4)
    return path


def test_static_partition_pruning(spark, month_partitioned_orders):
    fact = spark.read.parquet(month_partitioned_orders)
    df = fact.filter(F.col("order_month") == "1996-03").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = formatted_plan(df)
    # The literal month must land in PartitionFilters, not a post-scan Filter.
    assert "PartitionFilters" in plan
    assert "1996-03" in plan


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Fact⋈selective-dim shuffle joins must be eligible for Spark's
    runtime bloom filter (probe rows dropped before the shuffle).  At
    100 TB the default thresholds (10 GB probe scan) let it fire on
    its own; here they're lowered to demonstrate the plan shape."""
    saved = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    for k in saved:
        saved[k] = spark.conf.get(k)
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).agg(
            F.sum("l_extendedprice").alias("s")
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt  # built on the selective side
        assert "might_contain" in opt  # probes filtered pre-shuffle
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning(spark, month_partitioned_orders):
    fact = spark.read.parquet(month_partitioned_orders)
    # Independent calendar dim; the quarter filter is only knowable at
    # runtime through the join, so pruning must be *dynamic*.
    months = [
        (f"{y}-{m:02d}", f"Q{(m - 1) // 3 + 1}")
        for y in range(1995, 2002)
        for m in range(1, 13)
    ]
    dim = spark.createDataFrame(months, "order_month string, quarter string")
    joined = (
        fact.join(F.broadcast(dim.filter(F.col("quarter") == "Q1")), "order_month")
        .agg(F.sum("o_totalprice").alias("q1_total"))
    )
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower()
