"""Small-file compaction: a fragmented table must compact to few
files with bit-identical content (row parity + per-row equality)."""

from __future__ import annotations

import pyspark.sql.functions as F

from decision_tree_analytics_spark.sources.maintenance import (
    compact_parquet,
    data_file_count,
)
from decision_tree_analytics_spark.sources.tables import load_table


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    fragmented = str(tmp_path / "fragmented")
    compacted = str(tmp_path / "compacted")

    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(64).write.mode("overwrite").parquet(fragmented)
    assert data_file_count(fragmented) == 64  # the small-file storm

    out = compact_parquet(spark, fragmented, compacted)
    # Tiny table → a single ~target-size file.
    assert data_file_count(compacted) == 1
    assert out.count() == docs.count()
    # Content equality (order-independent): anti-joins empty both ways.
    a, b = spark.read.parquet(fragmented), out
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # Scan of the compacted table yields the same aggregate.
    assert (
        a.agg(F.sum("n_chars")).first()[0] == b.agg(F.sum("n_chars")).first()[0]
    )
