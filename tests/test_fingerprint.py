"""rel_table_fingerprint's mergeability — the property that makes it
an audit primitive: shard fingerprints combine associatively to the
whole-table fingerprint (count adds, sum adds, xor xors)."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.operators.relational import (
    rel_table_fingerprint,
)
from decision_tree_analytics_spark.sources.tables import load_table


def _fp_of(df):
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    "o_orderkey",
                    "o_custkey",
                    "o_orderstatus",
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("h").cast("long").alias("s"),
        F.expr("bit_xor(h)").cast("long").alias("x"),
    ).first()


def test_shard_fingerprints_merge_to_table_fingerprint(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    whole = rel_table_fingerprint(spark, sf_dir).first()
    a = _fp_of(o.filter(F.col("o_orderkey") % 2 == 0))
    b = _fp_of(o.filter(F.col("o_orderkey") % 2 == 1))
    assert a.n + b.n == whole.n_rows
    assert a.s + b.s == whole.sum_hash
    assert a.x ^ b.x == whole.xor_hash


def test_fingerprint_detects_a_single_changed_row(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    base = _fp_of(o)
    mutated = _fp_of(
        o.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") == o.agg(F.min("o_orderkey")).first()[0],
                   F.col("o_totalprice") + 0.01).otherwise(F.col("o_totalprice")),
        )
    )
    assert base.n == mutated.n
    assert (base.s, base.x) != (mutated.s, mutated.x)
