"""Source/sink roundtrip tests: csv, json, partitioned parquet."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from decision_tree_analytics_spark.sources.formats import (
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_parquet,
)
from decision_tree_analytics_spark.sources.tables import load_table


def _orders_sample(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    df = _orders_sample(spark, sf_dir)
    p = str(tmp_path / "orders_csv")
    write_csv(df, p)
    back = read_csv(spark, p, df.schema, header=True)
    assert sorted(back.collect()) == sorted(df.collect())


def test_json_roundtrip(spark, sf_dir, tmp_path):
    df = _orders_sample(spark, sf_dir)
    p = str(tmp_path / "orders_json")
    write_json(df, p)
    back = read_json(spark, p, df.schema)
    assert sorted(back.collect()) == sorted(df.collect())


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    df = _orders_sample(spark, sf_dir)
    p = str(tmp_path / "orders_part")
    write_parquet(df, p, partition_by=["o_orderstatus"], target_files=2)
    statuses = [d for d in os.listdir(p) if d.startswith("o_orderstatus=")]
    assert len(statuses) >= 2  # hive-style layout → partition pruning

    back = spark.read.parquet(p).filter(F.col("o_orderstatus") == "F")
    from decision_tree_analytics_spark.plans.inspect import formatted_plan

    plan = formatted_plan(back)
    # the status predicate must become a partition filter, not a scan filter
    assert "PartitionFilters" in plan
    want = df.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == want


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from decision_tree_analytics_spark.plans.inspect import simple_plan
    from decision_tree_analytics_spark.sources.formats import read_orc, write_orc

    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = write_orc(src, str(tmp_path / "nation_orc"))
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = simple_plan(read_orc(spark, path).filter("n_nationkey = 3").select("n_name"))
    assert "PushedFilters" in plan and "n_nationkey" in plan  # reaches the ORC scan


def test_clustered_write_layout_and_pruning(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from decision_tree_analytics_spark.plans.inspect import simple_plan
    from decision_tree_analytics_spark.sources.formats import write_clustered_parquet
    from decision_tree_analytics_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    path = write_clustered_parquet(
        ev, str(tmp_path / "events_clustered"), ["event_type"], ["value"]
    )
    files = glob.glob(f"{path}/event_type=*/*.parquet")
    assert files  # hive-style directories exist
    for f in files[:3]:  # every file internally sorted on the sort col
        vals = [
            v
            for v in pq.read_table(f, columns=["value"]).column("value").to_pylist()
            if v is not None
        ]
        assert vals == sorted(vals)
    plan = simple_plan(spark.read.parquet(path).filter("event_type = 'click'"))
    assert "PartitionFilters" in plan and "event_type" in plan  # dir pruning


def test_parquet_schema_evolution_merges_additive_column(spark, tmp_path):
    """Files written before a column existed read back with NULLs for
    it, and both generations' rows survive the merged scan."""
    from decision_tree_analytics_spark.sources.formats import (
        read_parquet_evolved,
        write_parquet,
    )

    base = str(tmp_path / "evolved")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    write_parquet(v1, base, mode="overwrite")
    write_parquet(v2, base, mode="append")
    got = read_parquet_evolved(spark, base)
    assert set(got.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in got.collect()}
    assert rows[1].score is None and rows[2].score == 9.5
