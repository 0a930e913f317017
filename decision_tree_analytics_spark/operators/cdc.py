"""CDC merge — MERGE INTO (upsert + delete) semantics as one
full-outer join.

The batch twin of the streaming foreachBatch upsert sink
(streaming/dedup_sink.py): a base snapshot merges a change batch
carrying an op column (U = upsert, D = delete):

* key in both, op U  → the change's values win (update);
* key only in changes, op U → new row (insert);
* op D → the key is dropped whether or not the base has it;
* key only in base → unchanged.

One full-outer join on the key + a post-join CASE — at 100 TB both
sides shuffle once on the merge key (zero-shuffle if the base is
bucket-stored on it, sources/bucketing.py), deletes are a filter, and
the result is written write-audit-publish style next to the old
snapshot (sources/maintenance.py compaction pattern).  This is the
Delta/Iceberg MERGE core without a table format: the join IS the
merge.

The contract fixture derives both sides from ``documents`` (base =
doc_id < 400; changes = 300–499 with uppercased text, every 10th id a
delete), so the query exercises all four merge outcomes at every SF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from decision_tree_analytics_spark.sources.tables import load_table

BASE_MAX = 400
CHANGE_MIN, CHANGE_MAX = 300, 500


def merge_changes(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Generic MERGE: ``base(key, ...)`` + ``changes(key, ..., op)``
    with op ∈ {U, D}.  Column sets must match apart from ``op``;
    change columns win on key collision."""
    value_cols = [c for c in base.columns if c != key]
    c = changes.select(
        F.col(key).alias("__ck__"),
        "op",
        *[F.col(v).alias(f"__c_{v}__") for v in value_cols],
    )
    joined = base.join(c, base[key] == c["__ck__"], "full_outer")
    survived = joined.filter(F.col("op").isNull() | (F.col("op") != "D"))
    return survived.select(
        F.coalesce(base[key], F.col("__ck__")).alias(key),
        *[
            F.coalesce(F.col(f"__c_{v}__"), base[v]).alias(v)
            for v in value_cols
        ],
        F.when(F.col("op").isNull(), F.lit("base"))
        .otherwise(F.lit("applied"))
        .alias("source"),
    )


def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query: merge the derived change batch into the derived
    base snapshot; returns the merged table with row provenance."""
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") < BASE_MAX).select("doc_id", "text")
    changes = d.filter(
        (F.col("doc_id") >= CHANGE_MIN) & (F.col("doc_id") < CHANGE_MAX)
    ).select(
        "doc_id",
        F.upper("text").alias("text"),
        F.when(F.col("doc_id") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    merged = merge_changes(base, changes, "doc_id")
    return merged.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
    )


def snap_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style incremental consumption: a SnapshotTable of events
    is committed in two appends (v1 = event_id % 4 != 0, v2 adds the
    % 4 == 0 rows); the query reads ONLY the delta between the two
    manifests (`SnapshotTable.read_incremental`) and aggregates it —
    the downstream-pipeline shape where each run pays for new files
    only, never a full-table scan or diff.

    The snapshot directory is keyed by the source file identity
    (path+size+mtime), so a regenerated corpus misses and rebuilds;
    the oracle is the batch definition of the delta (the % 4 == 0
    slice), proving manifest-diff planning returns exactly the
    appended rows."""
    import hashlib
    import os

    from decision_tree_analytics_spark.sources.snapshots import (
        NoPublishedSnapshot,
        SnapshotTable,
    )

    ev_path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(ev_path)
    tag = hashlib.md5(
        f"{os.path.abspath(ev_path)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    root = os.environ.get(
        "SPARK_GRAFT_SNAPSHOT_DIR", "/root/repo/spark-warehouse/snapshots"
    )
    table = SnapshotTable(spark, os.path.join(root, f"events_incr_{tag}"))
    try:
        table.latest_id()
    except NoPublishedSnapshot:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        table.append(ev.filter(F.col("event_id") % 4 != 0))
        table.append(ev.filter(F.col("event_id") % 4 == 0))
    v1, v2 = table.snapshot_ids()[:2]
    delta = table.read_incremental(v1, v2)
    return delta.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_new"),
        (F.floor(F.sum("value") * 1e6 + 0.5) / 1e6).alias("sum_value"),
    )


def snap_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style TIME TRAVEL: the same two-commit SnapshotTable
    shape as snap_incremental_read, but consumed through
    ``SnapshotTable.read(snapshot_id=v1)`` — reading the table as of
    an older committed version while later appends exist, and
    reconciling it against the latest version (per-type row counts
    then vs now, plus the delta).  This is the reproducibility
    primitive a training pipeline needs: re-run yesterday's manifest
    against yesterday's table version while ingestion keeps
    committing.

    Scale: a snapshot read plans only the files in that version's
    manifest (no diff/undo log to replay), so the old-version scan
    costs what the old version cost; both aggregates are mergeable
    per-type partials and the final reconciliation joins |event_type|
    rows.  The oracle replays the parity arithmetic (v1 = even
    event_ids) on the raw table."""
    import hashlib
    import os

    from decision_tree_analytics_spark.sources.snapshots import (
        NoPublishedSnapshot,
        SnapshotTable,
    )

    ev_path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(ev_path)
    tag = hashlib.md5(
        f"{os.path.abspath(ev_path)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    root = os.environ.get(
        "SPARK_GRAFT_SNAPSHOT_DIR", "/root/repo/spark-warehouse/snapshots"
    )
    table = SnapshotTable(spark, os.path.join(root, f"events_tt_{tag}"))
    # Fixture readiness = BOTH commits exist AND the pointer is on the
    # last one (a crash between the two appends, or between a commit
    # and its publish, must self-heal on the next run instead of
    # freezing the table at v1 forever — ADVICE r03).  With exactly
    # one snapshot present only the odd half is still missing.
    snaps = table.snapshot_ids()
    if len(snaps) < 2:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        if not snaps:
            table.append(ev.filter(F.col("event_id") % 2 == 0))
        table.append(ev.filter(F.col("event_id") % 2 == 1))
    else:
        try:
            stale = table.latest_id() != snaps[-1]
        except NoPublishedSnapshot:
            stale = True
        if stale:  # commit landed, publish didn't — finish it
            table.publish(snaps[-1])
    v1 = table.snapshot_ids()[0]
    old = table.read(v1).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_v1"),
        (F.floor(F.sum("value") * 1e6 + 0.5) / 1e6).alias("sum_v1"),
    )
    cur = (
        table.read()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_latest"))
    )
    return cur.join(old, ["event_type"], "left").select(
        "event_type",
        F.coalesce(F.col("n_v1"), F.lit(0)).cast("long").alias("n_v1"),
        F.col("n_latest").cast("long").alias("n_latest"),
        (F.col("n_latest") - F.coalesce(F.col("n_v1"), F.lit(0)))
        .cast("long")
        .alias("n_added"),
        F.coalesce(F.col("sum_v1"), F.lit(0.0)).alias("sum_v1"),
    )


QUERIES = {
    "cdc_merge_upsert": cdc_merge_upsert,
    "snap_incremental_read": snap_incremental_read,
    "snap_time_travel": snap_time_travel,
}

ORACLES = {
    "cdc_merge_upsert": (
        f"WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < {BASE_MAX}),"
        " changes AS (SELECT doc_id AS c_id, upper(text) AS c_text,"
        "   CASE WHEN doc_id % 10 = 0 THEN 'D' ELSE 'U' END AS op"
        f"   FROM documents WHERE doc_id >= {CHANGE_MIN} AND doc_id < {CHANGE_MAX})"
        " SELECT CAST(COALESCE(doc_id, c_id) AS BIGINT) AS doc_id,"
        "   COALESCE(c_text, text) AS text,"
        "   CASE WHEN op IS NULL THEN 'base' ELSE 'applied' END AS source"
        " FROM base FULL JOIN changes ON doc_id = c_id"
        " WHERE op IS NULL OR op <> 'D'"
    ),
    "snap_incremental_read": (
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_new,"
        " floor(sum(value) * 1e6 + 0.5) / 1e6 AS sum_value"
        " FROM events WHERE event_id % 4 = 0 GROUP BY event_type"
    ),
    "snap_time_travel": (
        "WITH v1 AS (SELECT event_type, count(*) AS n_v1,"
        "   floor(sum(value) * 1e6 + 0.5) / 1e6 AS sum_v1"
        "   FROM events WHERE event_id % 2 = 0 GROUP BY 1),"
        " cur AS (SELECT event_type, count(*) AS n_latest"
        "   FROM events GROUP BY 1)"
        " SELECT c.event_type, CAST(coalesce(v.n_v1, 0) AS BIGINT) AS n_v1,"
        "   CAST(c.n_latest AS BIGINT) AS n_latest,"
        "   CAST(c.n_latest - coalesce(v.n_v1, 0) AS BIGINT) AS n_added,"
        "   coalesce(v.sum_v1, 0.0) AS sum_v1"
        " FROM cur c LEFT JOIN v1 v USING (event_type)"
    ),
}
