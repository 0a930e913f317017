"""Snapshot table: atomic commits, time travel, write-audit-publish,
rollback, and expiry over plain parquet."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from decision_tree_analytics_spark.sources.snapshots import (
    NoPublishedSnapshot,
    SnapshotNotFound,
    SnapshotTable,
)
from decision_tree_analytics_spark.sources.tables import load_table


@pytest.fixture()
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")


def test_append_history_and_time_travel(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    first = docs.filter(F.col("doc_id") < 50)
    second = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 80))
    s1 = t.append(first)
    s2 = t.append(second)
    assert t.latest_id() == s2
    assert t.read().count() == first.count() + second.count()
    # Time travel: snapshot 1 still reads exactly the first batch.
    assert t.read(s1).count() == first.count()
    assert t.read(s1).exceptAll(first).count() == 0
    ops = [m["operation"] for m in t.history()]
    assert ops == ["append", "append"]
    assert t.manifest(s2)["parent_id"] == s1


def test_overwrite_keeps_old_snapshot_readable(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.append(docs.filter(F.col("doc_id") < 50))
    s2 = t.overwrite(docs.filter(F.col("doc_id") >= 90))
    assert t.read().count() == docs.filter(F.col("doc_id") >= 90).count()
    assert t.read(s1).count() == 50
    assert t.manifest(s2)["operation"] == "overwrite"


def test_write_audit_publish(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(docs.filter(F.col("doc_id") < 50))
    published = t.latest_id()
    # Stage without publishing: readers still see the old snapshot.
    staged = t.append(docs.filter(F.col("doc_id") >= 50), publish=False)
    assert t.latest_id() == published
    assert t.read().count() == 50
    # Audit the staged snapshot directly, then publish atomically.
    audit = t.read(staged)
    assert audit.count() == docs.count()
    t.publish(staged)
    assert t.latest_id() == staged
    assert t.read().count() == docs.count()


def test_rollback(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.append(docs.filter(F.col("doc_id") < 50))
    t.overwrite(docs.filter(F.col("doc_id") < 10))
    assert t.read().count() == 10
    t.rollback(s1)
    assert t.read().count() == 50


def test_expire_drops_orphans_keeps_live(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(docs.filter(F.col("doc_id") < 30))
    t.overwrite(docs.filter(F.col("doc_id") < 20))
    s3 = t.overwrite(docs.filter(F.col("doc_id") < 10))
    deleted = t.expire(keep_last=1)
    assert deleted  # two manifests + their now-orphaned data files
    assert t.snapshot_ids() == [s3]
    assert t.read().count() == 10  # published snapshot untouched


def test_missing_snapshot_and_empty_table_errors(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    with pytest.raises(NoPublishedSnapshot):
        t.read()
    t.append(docs.limit(5))
    with pytest.raises(SnapshotNotFound):
        t.read(99)


def test_staged_then_never_published_is_invisible_to_append(spark, docs, tmp_path):
    # An append on top of a table with an unpublished staged snapshot
    # chains from the PUBLISHED state, not the staged one.
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(docs.filter(F.col("doc_id") < 10))
    t.append(docs.filter(F.col("doc_id") >= 95), publish=False)  # staged
    t.append(docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)))
    assert t.read().count() == 20


def test_incremental_read_returns_only_the_delta(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.append(docs.filter(F.col("doc_id") < 10))
    s2 = t.append(docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 25)))
    delta = t.read_incremental(s1, s2)
    got = sorted(r.doc_id for r in delta.select("doc_id").collect())
    assert got == list(range(10, 25))
    # same snapshot on both sides → empty delta, schema preserved
    empty = t.read_incremental(s2, s2)
    assert empty.count() == 0
    assert empty.columns == t.read().columns
    # an overwrite rewrites the file set → the whole new set is the delta
    s3 = t.overwrite(docs.filter(F.col("doc_id") < 5))
    assert t.read_incremental(s2, s3).count() == 5


def test_compact_reduces_files_preserves_content_and_history(spark, sf_dir, tmp_path):
    """compact() must collapse a fragmented published file set into
    few files in a NEW snapshot, keep the table content identical,
    and leave the pre-compaction snapshot time-travel-readable."""
    import pyspark.sql.functions as F

    from decision_tree_analytics_spark.sources.snapshots import SnapshotTable
    from decision_tree_analytics_spark.sources.tables import load_table

    t = SnapshotTable(spark, str(tmp_path / "cmp"))
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    t.append(ev.filter(F.col("event_id") % 2 == 0).repartition(8))
    v2 = t.append(ev.filter(F.col("event_id") % 2 == 1).repartition(8))
    before = t.manifest(t.latest_id())["files"]
    assert len(before) == 16
    want = t.read().agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]
    v3 = t.compact()
    after = t.manifest(v3)["files"]
    assert len(after) < len(before)
    got = t.read().agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (want.n, want.s)
    # the pre-compaction snapshot still reads its original files
    assert t.read(v2).count() == want.n
    assert t.latest_id() == v3


def test_parquet_footer_tag_identity(sf_dir, tmp_path):
    """Snapshot cache identity is CONTENT-derived (parquet footer
    md5): a byte-identical rewrite at a new path and mtime keeps the
    tag (no stale-miss on object-storage-style copies/replicas), a
    regenerated corpus with different data changes it (can never
    serve stale labels)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from decision_tree_analytics_spark.sources.tables import (
        parquet_footer_tag,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    orig = parquet_footer_tag(src)
    # rewritten-identical: new path, new mtime, same bytes → same tag
    copy = tmp_path / "copy.parquet"
    shutil.copyfile(src, copy)
    os.utime(copy, (1, 1))
    assert parquet_footer_tag(str(copy)) == orig
    # regenerated-different: same schema, one row fewer → new tag
    t = pq.read_table(src)
    regen = tmp_path / "regen.parquet"
    pq.write_table(t.slice(0, t.num_rows - 1), regen)
    assert parquet_footer_tag(str(regen)) != orig
    # non-parquet input is rejected, not silently tagged
    bogus = tmp_path / "bogus.parquet"
    bogus.write_bytes(b"0" * 64)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parquet_footer_tag(str(bogus))


def test_torn_claim_is_invisible_and_never_blocks_commits(spark, docs, tmp_path):
    """A writer that died between the O_EXCL claim and the manifest
    write leaves an EMPTY snap-N.json.  The store must stay fully
    usable: reads serve the published snapshot, history skips the torn
    claim, a new commit allocates PAST the burned id and chains from
    the last valid parent, and addressing the torn id directly raises
    SnapshotNotFound (so publish can never move the pointer onto it)."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.append(docs.filter(F.col("doc_id") < 50))
    # Simulate the crash: claim id 2, die before writing content.
    open(os.path.join(t.meta_dir, "snap-00002.json"), "w").close()
    assert t.latest_id() == s1
    assert t.read().count() == 50
    assert [m["snapshot_id"] for m in t.history()] == [s1]
    with pytest.raises(SnapshotNotFound):
        t.read(2)
    with pytest.raises(SnapshotNotFound):
        t.publish(2)
    # The next commit burns past the torn id and chains from s1.
    s3 = t.append(docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 80)))
    assert s3 == 3
    assert t.manifest(s3)["parent_id"] == s1
    assert t.read().count() == 80


def test_torn_claim_as_staging_parent_aged_vs_live(spark, docs, tmp_path):
    """On an UNPUBLISHED table the append chain walks staged
    snapshots.  A YOUNG torn claim may be a LIVE writer mid-commit —
    chaining past it would silently omit its rows, so the commit
    aborts loudly (and releases its own claim).  Once the claim ages
    past the orphan grace it is a crashed writer: skipped, never the
    parent (its manifest has no file list)."""
    import os
    import time

    from decision_tree_analytics_spark.sources.snapshots import (
        ORPHAN_GRACE_SECONDS,
        ConcurrentStagedCommit,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.append(docs.filter(F.col("doc_id") < 10), publish=False)
    torn = os.path.join(t.meta_dir, "snap-00002.json")
    open(torn, "w").close()
    second = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    with pytest.raises(ConcurrentStagedCommit):
        t.append(second, publish=False)
    # The aborted commit released its own id-3 claim.
    assert t.snapshot_ids() == [s1, 2]
    # Age the torn claim past the grace: now it is a crashed writer.
    old = time.time() - 2 * ORPHAN_GRACE_SECONDS
    os.utime(torn, (old, old))
    s3 = t.append(second, publish=False)
    assert s3 == 3
    assert t.manifest(s3)["parent_id"] == s1
    assert t.read(s3).count() == 20  # chained s1's files + its own


def test_crashed_first_build_self_heals_for_overwrite(spark, docs, tmp_path):
    """The WAP publishers (dedup component labels, the IVF index)
    stage OVERWRITE commits whose snapshots contain only df's files —
    a crashed first build's YOUNG torn claim must not block the next
    build for the orphan grace (review finding: that would turn every
    self-healing path into a day-long outage)."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"))
    # Simulate a first build SIGKILLed mid-_write_files: a fresh torn
    # claim on a never-published table.
    open(os.path.join(t.meta_dir, "snap-00001.json"), "w").close()
    sid = t.overwrite(docs.filter(F.col("doc_id") < 10))
    assert sid == 2
    assert t.latest_id() == 2
    assert t.read().count() == 10


def test_corrupt_manifest_raises_and_is_never_expired(spark, docs, tmp_path):
    """A NON-empty manifest that fails to parse may be a damaged
    COMMITTED snapshot — unlike an empty torn claim it must surface
    loudly everywhere and expire() must refuse to garbage-collect
    anything rather than destroy state that might be repairable."""
    import os

    from decision_tree_analytics_spark.sources.snapshots import (
        CorruptSnapshotManifest,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(docs.filter(F.col("doc_id") < 30))
    s2 = t.overwrite(docs.filter(F.col("doc_id") < 10))
    corrupt = os.path.join(t.meta_dir, "snap-00001.json")
    with open(corrupt, "w") as fh:
        fh.write('{"snapshot_id": 1, "files": [')  # truncated write
    with pytest.raises(CorruptSnapshotManifest):
        t.read(1)
    with pytest.raises(CorruptSnapshotManifest):
        t.history()
    with pytest.raises(CorruptSnapshotManifest):
        t.expire(keep_last=1, orphan_grace_seconds=0.0)
    # Nothing was reclaimed; the published snapshot still reads.
    assert os.path.exists(corrupt)
    assert t.latest_id() == s2
    assert t.read().count() == 10


def test_expire_age_gates_unreferenced_orphans(spark, docs, tmp_path):
    """expire() must NOT reclaim what might belong to an in-flight
    commit — a young torn claim and young unreferenced data files
    survive the default grace, while files of expired manifests go
    immediately; grace 0 reclaims the crashed writer's leftovers."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(docs.filter(F.col("doc_id") < 30))
    s2 = t.overwrite(docs.filter(F.col("doc_id") < 10))
    # A racing writer mid-commit: torn claim + data landing on disk.
    torn = os.path.join(t.meta_dir, "snap-00003.json")
    open(torn, "w").close()
    inflight_dir = os.path.join(t.data_dir, "s00003")
    os.makedirs(inflight_dir)
    inflight = os.path.join(inflight_dir, "part-0.parquet")
    with open(inflight, "wb") as fh:
        fh.write(b"not-yet-committed")
    deleted = t.expire(keep_last=1)
    # snapshot 1's manifest + files are known-dead: gone immediately.
    assert any("snap-00001" in p for p in deleted)
    # The possible in-flight commit survived the default grace.
    assert os.path.exists(torn) and os.path.exists(inflight)
    assert t.read().count() == 10  # published snapshot untouched
    # A crashed writer's leftovers reclaim once past the grace.
    deleted2 = t.expire(keep_last=1, orphan_grace_seconds=0.0)
    assert not os.path.exists(torn) and not os.path.exists(inflight)
    assert torn in deleted2 and inflight in deleted2
    assert t.snapshot_ids() == [s2]
    assert t.read().count() == 10


def test_concurrent_appends_all_commit_with_distinct_ids(spark, docs, tmp_path):
    """The optimistic-concurrency claim tested directly: N threads
    race append(publish=True) on one published table.  Every commit
    must win a DISTINCT snapshot id (O_EXCL claim + retry), every
    manifest must parse with the committer's own files present, and
    the published pointer must land on one of the winners — no torn
    state, no lost commit, no id collision."""
    import threading

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(docs.filter(F.col("doc_id") < 5))
    N = 6
    sids: list[int | None] = [None] * N
    errors: list[Exception] = []

    def writer(i):
        try:
            lo, hi = 10 + 10 * i, 20 + 10 * i
            sids[i] = t.append(
                docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            )
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(N)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert None not in sids
    assert len(set(sids)) == N  # no id collision ever
    # Every manifest parses and includes the committer's own files
    # on top of SOME published ancestor (append base is whatever was
    # published at claim time — the race only affects how much of the
    # chain each snapshot carries, never its own rows).
    for i, s in enumerate(sids):
        m = t.manifest(s)
        assert m["operation"] == "append" and m["summary"]["added_files"] > 0
        lo, hi = 10 + 10 * i, 20 + 10 * i
        got = sorted(
            r.doc_id
            for r in t.read(s)
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select("doc_id")
            .collect()
        )
        assert got == list(range(lo, hi)), f"writer {i} rows missing"
    # The pointer landed on one winner, and the table reads cleanly.
    assert t.latest_id() in sids
    assert t.read().count() >= 15  # base 5 + at least the winner's 10


def test_real_driver_sigkill_mid_commit_self_heals(spark, docs, tmp_path, sf_dir):
    """End-to-end crash proof (not a hand-made empty file): a REAL
    writer process is SIGKILLed between its O_EXCL claim and commit
    completion, then the same store must (a) show the torn claim and
    no published pointer, (b) accept a fresh overwrite that burns past
    the dead id, and (c) reclaim the leftovers under a zero grace."""
    import os
    import signal
    import subprocess
    import sys
    import time

    store = str(tmp_path / "t")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = f"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
from decision_tree_analytics_spark.sources.snapshots import SnapshotTable
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
t = SnapshotTable(spark, {store!r})
def slow(batches):
    import time as _t
    _t.sleep(30)
    for b in batches:
        yield b
df = spark.range(0, 1000, 1, 4).mapInPandas(slow, "id long")
t.overwrite(df)  # never completes — parent SIGKILLs us mid-write
"""
    proc = subprocess.Popen([sys.executable, "-c", code])
    claim = os.path.join(store, "metadata", "snap-00001.json")
    try:
        for _ in range(1200):  # wait for the O_EXCL claim, then kill
            if os.path.exists(claim):
                break
            time.sleep(0.1)
        assert os.path.exists(claim), "writer never claimed an id"
        os.kill(proc.pid, signal.SIGKILL)
    finally:
        proc.wait(timeout=60)
    # (a) torn claim on disk, nothing published, nothing readable yet
    assert os.path.getsize(claim) == 0
    t = SnapshotTable(spark, store)
    with pytest.raises(NoPublishedSnapshot):
        t.read()
    assert t.history() == []
    # (b) the next build self-heals: burns past id 1, publishes id 2
    sid = t.overwrite(docs.filter(F.col("doc_id") < 10))
    assert sid == 2 and t.latest_id() == 2
    assert t.read().count() == 10
    # (c) zero-grace maintenance reclaims the dead writer's leftovers
    t.expire(keep_last=1, orphan_grace_seconds=0.0)
    assert not os.path.exists(claim)
    assert t.snapshot_ids() == [2]
    assert t.read().count() == 10


def test_valid_ids_excludes_torn_claims(spark, docs, tmp_path):
    """valid_ids() is the READABLE history: torn (empty) claims are
    absent from it while snapshot_ids() still lists them for id
    allocation — state derivation must use the former (ADVICE r13)."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.overwrite(docs.filter(F.col("doc_id") < 10))
    open(os.path.join(t.meta_dir, "snap-00002.json"), "w").close()
    assert t.snapshot_ids() == [s1, 2]
    assert t.valid_ids() == [s1]


def test_manifest_blob_lands_whole_under_short_writes(
    spark, docs, tmp_path, monkeypatch
):
    """A short os.write would leave a NON-empty unparseable manifest —
    which the torn/corrupt split deliberately refuses to GC — so the
    commit path must loop the blob to completion (ADVICE r13).  Force
    every JSON-looking write to land at most a third of its buffer
    and the manifest must still read back complete."""
    import os as _os

    import decision_tree_analytics_spark.sources.snapshots as S

    real_write = _os.write

    def short_write(fd, data):
        if isinstance(data, (bytes, bytearray)) and data[:1] == b"{":
            return real_write(fd, data[: max(1, len(data) // 3)])
        return real_write(fd, data)

    monkeypatch.setattr(S.os, "write", short_write)
    t = SnapshotTable(spark, str(tmp_path / "t"))
    sid = t.overwrite(docs.filter(F.col("doc_id") < 10))
    monkeypatch.undo()
    m = t.manifest(sid)  # parses => the blob landed whole
    assert m["snapshot_id"] == sid and m["files"]
    assert t.read().count() == 10


def test_aborted_commit_releases_claim_and_data(
    spark, docs, tmp_path, monkeypatch
):
    """A commit that fails AFTER its data landed must release both the
    claim and the data directory, so the freed id recommits cleanly
    instead of dying on PATH_ALREADY_EXISTS (ADVICE r13)."""
    import os

    import decision_tree_analytics_spark.sources.snapshots as S

    t = SnapshotTable(spark, str(tmp_path / "t"))

    def boom(*_a, **_k):
        raise RuntimeError("abort-after-data-write")

    monkeypatch.setattr(S.json, "dumps", boom)
    with pytest.raises(RuntimeError, match="abort-after-data-write"):
        t.overwrite(docs.filter(F.col("doc_id") < 10))
    monkeypatch.undo()
    assert t.snapshot_ids() == []  # claim released
    assert not os.path.exists(os.path.join(t.data_dir, "s00001"))
    sid = t.overwrite(docs.filter(F.col("doc_id") < 10))
    assert sid == 1 and t.read().count() == 10


def test_write_files_clears_orphan_debris_dir(spark, docs, tmp_path):
    """Leftover data/s<NN> debris from a crashed writer whose claim is
    gone must not fail the next commit that reuses the id: the O_EXCL
    claim proves no manifest can reference the directory, so the
    writer clears it (ADVICE r13)."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"))
    ddir = os.path.join(t.data_dir, "s00001")
    os.makedirs(ddir)
    open(os.path.join(ddir, "_SUCCESS"), "w").close()
    with open(os.path.join(ddir, "part-0.parquet"), "wb") as fh:
        fh.write(b"crashed-writer-debris")
    sid = t.overwrite(docs.filter(F.col("doc_id") < 10))
    assert sid == 1 and t.read().count() == 10


def test_expired_torn_claim_frees_id_and_its_data_dir(spark, docs, tmp_path):
    """expire() reclaiming an aged torn claim must also remove the
    crashed writer's data/s<NN> directory (incl. non-parquet debris
    the file walk never touches) — otherwise the freed id's next
    commit hits the leftover directory (ADVICE r13)."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.overwrite(docs.filter(F.col("doc_id") < 10))
    torn = os.path.join(t.meta_dir, "snap-00002.json")
    open(torn, "w").close()
    ddir = os.path.join(t.data_dir, "s00002")
    os.makedirs(ddir)
    open(os.path.join(ddir, "_SUCCESS"), "w").close()
    part = os.path.join(ddir, "part-0.parquet")
    with open(part, "wb") as fh:
        fh.write(b"dead-writer-partial-output")
    deleted = t.expire(keep_last=1, orphan_grace_seconds=0.0)
    assert torn in deleted and part in deleted and ddir in deleted
    assert not os.path.exists(ddir)
    # max(existing) dropped from 2 back to 1 — the next commit REUSES
    # id 2 and must succeed on the now-clean directory.
    s2 = t.overwrite(docs.filter(F.col("doc_id") < 20))
    assert s2 == 2
    assert t.read().count() == 20 and t.read(s1).count() == 10


def test_expire_keeps_torn_claim_and_dir_with_young_contents(
    spark, docs, tmp_path
):
    """Claim + data dir reclaim AS A UNIT under one age gate: an aged
    claim whose files are still fresh reads as a pathologically slow
    LIVE writer — BOTH survive (freeing the id alone would hand it to
    a new writer whose _write_files clears the live writer's output;
    review finding).  Once the contents also age out, both go, and
    the freed id recommits cleanly."""
    import os
    import time

    from decision_tree_analytics_spark.sources.snapshots import (
        ORPHAN_GRACE_SECONDS,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(docs.filter(F.col("doc_id") < 10))
    torn = os.path.join(t.meta_dir, "snap-00002.json")
    open(torn, "w").close()
    old = time.time() - 2 * ORPHAN_GRACE_SECONDS
    os.utime(torn, (old, old))  # the claim is long dead...
    ddir = os.path.join(t.data_dir, "s00002")
    os.makedirs(ddir)
    part = os.path.join(ddir, "part-0.parquet")
    with open(part, "wb") as fh:
        fh.write(b"still-landing")  # ...but data is landing NOW
    deleted = t.expire(keep_last=1)
    assert os.path.exists(torn) and torn not in deleted  # id stays burned
    assert os.path.exists(part) and part not in deleted
    # Age the data too: now claim AND dir reclaim together.
    os.utime(part, (old, old))
    deleted2 = t.expire(keep_last=1)
    assert torn in deleted2 and part in deleted2 and ddir in deleted2
    assert not os.path.exists(torn) and not os.path.exists(ddir)
    s2 = t.overwrite(docs.filter(F.col("doc_id") < 20))
    assert s2 == 2 and t.read().count() == 20
