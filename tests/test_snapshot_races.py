"""Reader-vs-maintenance and maintenance-vs-maintenance races on the
SnapshotTable store — the surface the writer-crash suite (torn claims,
SIGKILLed commits) never exercises.

Three contracts under test:

* **Snapshot isolation vs writers**: a DataFrame pinned to a manifest
  keeps reading exactly its snapshot while commits race ahead — data
  files are immutable, so this must hold unconditionally.
* **Retention vs readers** (the Iceberg expire contract): expire()
  that RETAINS the pinned snapshot never disturbs the reader; expire()
  that drops it breaks the reader LOUDLY (typed error on a fresh
  time-travel, an execution error on the already-built plan) — never
  silently wrong rows.  Retention must exceed reader runtime; that is
  the documented trade, not a bug.
* **Concurrent expire is idempotent**: two maintenance runs racing on
  the same store must both complete (the loser tolerates the winner
  having already reclaimed a manifest), leave the same final state,
  and never wedge the store for subsequent commits.
"""

from __future__ import annotations

import os
import threading

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


def test_pinned_reader_isolated_from_racing_writers(spark, docs, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.overwrite(docs.filter(F.col("doc_id") < 20))
    pinned = t.read(s1)
    assert pinned.count() == 20
    # Writers race ahead: the pinned plan must keep serving snapshot 1
    # exactly — its files are immutable and no commit touches them.
    t.append(docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 35)))
    t.overwrite(docs.filter(F.col("doc_id") >= 95))
    assert pinned.count() == 20
    assert t.read().count() == docs.filter(F.col("doc_id") >= 95).count()
    # expire() that RETAINS s1 leaves the pinned reader untouched too.
    t.expire(keep_last=10, orphan_grace_seconds=0.0)
    assert pinned.count() == 20
    assert t.read(s1).count() == 20


def test_expire_past_pinned_snapshot_breaks_reader_loudly(
    spark, docs, tmp_path
):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.overwrite(docs.filter(F.col("doc_id") < 20))
    pinned = t.read(s1)
    assert pinned.count() == 20
    t.overwrite(docs.filter(F.col("doc_id") >= 90))
    deleted = t.expire(keep_last=1, orphan_grace_seconds=0.0)
    assert any(p.endswith(".parquet") for p in deleted)
    # Fresh time-travel to the dropped snapshot: typed error.
    with pytest.raises(SnapshotNotFound):
        t.read(s1)
    # The already-built plan references deleted files: execution must
    # ERROR (ignoreMissingFiles is off), never return partial rows.
    with pytest.raises(Exception):
        pinned.count()
    # The published snapshot and future commits are unaffected.
    assert t.read().count() == docs.filter(F.col("doc_id") >= 90).count()
    t.append(docs.filter(F.col("doc_id") < 5))
    assert t.read().count() == docs.filter(F.col("doc_id") >= 90).count() + 5


def test_expire_tolerates_concurrent_expire_deterministically(
    spark, docs, tmp_path, monkeypatch
):
    """Deterministic injection of the exact race window: between one
    expire()'s manifest listing and its removal loop, a 'concurrent'
    expire reclaims an expired manifest first.  The loser must finish
    the rest of its maintenance instead of crashing mid-run."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    sids = [t.overwrite(docs.filter(F.col("doc_id") < n)) for n in (10, 20, 30)]
    real = SnapshotTable._valid_manifests
    state = {"fired": False}

    def racing(self):
        out = real(self)
        if not state["fired"] and len(out) > 1:
            state["fired"] = True
            # The racing expire wins on the OLDEST expired manifest.
            os.remove(self._manifest_path(out[0][0]))
        return out

    monkeypatch.setattr(SnapshotTable, "_valid_manifests", racing)
    deleted = t.expire(keep_last=1, orphan_grace_seconds=0.0)
    monkeypatch.setattr(SnapshotTable, "_valid_manifests", real)
    assert state["fired"]
    # The loser still reclaimed the REMAINING expired manifest and the
    # dead data files of BOTH (the winner only removed a manifest).
    assert t._manifest_path(sids[1]) in deleted
    assert any(p.endswith(".parquet") for p in deleted)
    assert t.valid_ids() == [sids[2]]
    assert t.read().count() == 30
    t.append(docs.filter(F.col("doc_id") >= 95))
    assert t.read().count() == 30 + docs.filter(F.col("doc_id") >= 95).count()


def test_two_threads_racing_expire_both_complete(spark, docs, tmp_path):
    """A REAL unsynchronized race: two threads run zero-grace expire on
    one store concurrently.  Both must return (no FileNotFoundError
    from either loser's remove), the union of their deletions covers
    every expired manifest, and the store stays commit-able."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    for n in (5, 10, 15, 20, 25, 30):
        t.overwrite(docs.filter(F.col("doc_id") < n))
    last = t.latest_id()
    errors: list[BaseException] = []
    results: list[list[str]] = []
    barrier = threading.Barrier(2)

    def run():
        try:
            barrier.wait()
            results.append(t.expire(keep_last=1, orphan_grace_seconds=0.0))
        except BaseException as e:  # noqa: BLE001 - the assert IS the test
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert len(results) == 2
    assert t.valid_ids() == [last]
    assert t.read().count() == 30
    # Every expired manifest was reclaimed by exactly one of the two.
    reclaimed = [p for r in results for p in r if p.endswith(".json")]
    assert len(set(reclaimed)) == len(reclaimed)
    t.append(docs.filter(F.col("doc_id") >= 95))
    assert t.read().count() == 30 + docs.filter(F.col("doc_id") >= 95).count()


def test_vanished_manifest_and_pointer_raise_typed_errors(
    spark, docs, tmp_path
):
    """manifest()/latest_id() are single-open (no exists-then-open
    window): a file reclaimed by concurrent maintenance surfaces as
    the typed absence error at ANY interleaving, so
    _valid_manifests()'s SnapshotNotFound filter can never leak a raw
    FileNotFoundError out of a reader."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.overwrite(docs.limit(5))
    os.remove(t._manifest_path(s1))
    with pytest.raises(SnapshotNotFound):
        t.manifest(s1)
    assert t._valid_manifests() == []
    os.remove(os.path.join(t.meta_dir, "_latest"))
    with pytest.raises(NoPublishedSnapshot):
        t.latest_id()


def test_expire_killed_mid_run_is_resumable(spark, docs, tmp_path, monkeypatch):
    """Maintenance itself crashing is a crash surface: an expire()
    that dies right after reclaiming its FIRST expired manifest (driver
    OOM/SIGKILL mid-maintenance) must leave the store readable, and a
    later expire must finish the job — remaining expired manifests AND
    the now-orphaned data files of the half-done run."""
    import decision_tree_analytics_spark.sources.snapshots as snap_mod

    t = SnapshotTable(spark, str(tmp_path / "t"))
    for n in (10, 20, 30):
        t.overwrite(docs.filter(F.col("doc_id") < n))
    last = t.latest_id()
    real_remove = os.remove
    calls = {"n": 0}

    def dying_remove(path):
        real_remove(path)
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt  # the maintenance process dies here

    monkeypatch.setattr(snap_mod.os, "remove", dying_remove)
    with pytest.raises(KeyboardInterrupt):
        t.expire(keep_last=1, orphan_grace_seconds=0.0)
    monkeypatch.setattr(snap_mod.os, "remove", real_remove)
    # Half-done: one expired manifest gone, its data files NOT walked.
    assert calls["n"] == 1
    assert t.read().count() == 30  # published snapshot untouched
    # The next maintenance run completes the reclaim.
    t.expire(keep_last=1, orphan_grace_seconds=0.0)
    assert t.valid_ids() == [last]
    live = set(t.manifest(last)["files"])
    on_disk = {
        os.path.relpath(os.path.join(r, f), t.path)
        for r, _d, fs in os.walk(t.data_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    assert on_disk == live  # every orphaned data file reclaimed
    t.append(docs.filter(F.col("doc_id") >= 95))


def test_compact_crash_between_stage_and_publish_self_heals(
    spark, docs, tmp_path
):
    """compact() = overwrite(publish=False) + publish: a crash between
    the two leaves a staged-but-unpublished rewrite.  Readers must stay
    on the published snapshot, a retried compact() must succeed, and
    expire must age the crashed rewrite out."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(docs.filter(F.col("doc_id") < 25))
    published = t.latest_id()
    # The crash leaves exactly this state: staged rewrite, old pointer.
    crashed = t.overwrite(t.read().coalesce(1), publish=False)
    assert t.latest_id() == published
    assert t.read().count() == 25
    # Retry: a fresh compact publishes and serves identical content.
    healed = t.compact()
    assert t.latest_id() == healed and healed != crashed
    assert t.read().count() == 25
    # The crashed rewrite is reclaimable once past grace.
    t.expire(keep_last=1, orphan_grace_seconds=0.0)
    assert crashed not in t.valid_ids()
    assert t.read().count() == 25


_LABEL_RACER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
os.environ["PYSPARK_PYTHON"] = sys.executable
os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable
os.environ["SPARK_GRAFT_SNAPSHOT_DIR"] = {snaps!r}
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from decision_tree_analytics_spark.operators import dedup

open({ready!r}, "w").close()
while not os.path.exists({go!r}):
    time.sleep(0.05)

labels = dedup.component_labels_snapshot(spark, {sf!r})
row = labels.select(
    F.sum(F.crc32(F.concat_ws("|", "doc_id", "component_id"))).alias("c"),
    F.count(F.lit(1)).alias("n"),
    F.countDistinct("component_id").alias("k"),
).first()
print("RACED", row["c"], row["n"], row["k"], flush=True)
spark.stop()
print("RACER-OK")
"""


def test_two_processes_racing_label_publish_converge(spark, sf_dir, tmp_path):
    """The single-version WAP consumers (dedup component labels, the
    IVF index) deliberately have NO build lock — the r14 audit's claim
    is that racers CONVERGE: the labeling is content-derived (md5
    minhash over the corpus), so two sessions that both miss, both
    compute, and both overwrite-publish must serve bit-identical
    labels whoever wins the pointer.  Proven here with two REAL driver
    processes released onto one fresh snapshot root by a go-file
    barrier: same label checksum from both, the published table passes
    the coverage audit, and the parent session reads the same content
    through the normal query path."""
    import subprocess
    import sys
    import time

    from decision_tree_analytics_spark.operators import dedup
    from decision_tree_analytics_spark.sources.tables import (
        parquet_footer_tag,
    )
    from decision_tree_analytics_spark.sources.snapshots import SnapshotTable

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snaps = str(tmp_path / "snaps")
    procs, readies = [], []
    for i in (1, 2):
        ready = str(tmp_path / f"ready{i}")
        readies.append(ready)
        code = _LABEL_RACER.format(
            repo=repo, snaps=snaps, sf=sf_dir,
            ready=ready, go=str(tmp_path / "go"),
        )
        # Spark's stderr volume can fill a pipe buffer while the OTHER
        # racer is being drained — route stderr to files (the
        # driver-kill-stream gotcha applies to any multi-child drain).
        errf = open(str(tmp_path / f"err{i}.log"), "w")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, "-c", code],
                    stdout=subprocess.PIPE,
                    stderr=errf,
                    text=True,
                ),
                errf,
            )
        )
    deadline = time.time() + 300
    while not all(os.path.exists(r) for r in readies):
        assert time.time() < deadline, "racers never reached the barrier"
        time.sleep(0.1)
    open(str(tmp_path / "go"), "w").close()
    outs = []
    for p, errf in procs:
        out, _ = p.communicate(timeout=600)
        errf.close()
        assert p.returncode == 0 and "RACER-OK" in out, out[-2000:]
        outs.append(
            next(line for line in out.splitlines() if line.startswith("RACED"))
        )
    # CONVERGENCE: both racers computed the identical labeling.
    assert outs[0] == outs[1], outs
    _tag, chk, n, _k = outs[0].split()
    # The published table passes the coverage audit in the parent too.
    import pyspark.sql.functions as F2

    tag = parquet_footer_tag(os.path.join(sf_dir, "documents.parquet"))
    t = SnapshotTable(spark, os.path.join(snaps, f"dedup_labels_{tag}"))
    # Racers may both have committed (distinct ids, O_EXCL) — one or
    # two valid versions, identical content; the pointer names one.
    assert 1 <= len(t.valid_ids()) <= 2
    assert t.latest_id() in t.valid_ids()
    got = t.read().select(
        F2.sum(
            F2.crc32(F2.concat_ws("|", "doc_id", "component_id"))
        ).alias("c"),
        F2.count(F2.lit(1)).alias("n"),
        F2.countDistinct("doc_id").alias("d"),
    ).first()
    assert str(got["c"]) == chk and str(got["n"]) == n
    assert got["n"] == got["d"]  # every doc labeled exactly once


def test_compact_refuses_to_clobber_a_concurrent_publish(
    spark, docs, tmp_path, monkeypatch
):
    """A writer publishing BETWEEN compact()'s rewrite and its publish
    must not lose its rows: compact detects the moved tip and raises
    StaleCompaction (Iceberg's validate-current-snapshot semantics for
    RewriteFiles — peer writers race last-publish-wins, maintenance
    never un-publishes data).  The staged rewrite stays unpublished
    and a retried compact against the new tip succeeds."""
    from decision_tree_analytics_spark.sources.snapshots import (
        StaleCompaction,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(docs.filter(F.col("doc_id") < 25))
    t2 = SnapshotTable(spark, str(tmp_path / "t"))
    late = docs.filter(F.col("doc_id") >= 90)
    n_late = late.count()
    state = {"fired": False, "staged": None}
    real = SnapshotTable.overwrite

    def racing(self, df, publish=True):
        sid = real(self, df, publish=publish)
        if not state["fired"] and not publish:
            # The rewrite just staged: a concurrent writer lands and
            # publishes before compact()'s currency check.
            state["fired"] = True
            state["staged"] = sid
            t2.append(late)
        return sid

    monkeypatch.setattr(SnapshotTable, "overwrite", racing)
    with pytest.raises(StaleCompaction):
        t.compact()
    assert state["fired"]
    # The concurrent append's rows are still published — nothing lost.
    assert t.read().count() == 25 + n_late
    # The stale rewrite is staged-not-published and reclaimable.
    assert state["staged"] in t.valid_ids()
    assert t.latest_id() != state["staged"]
    # Retry against the new tip: succeeds and preserves every row.
    healed = t.compact()
    assert t.latest_id() == healed
    assert t.read().count() == 25 + n_late
    t.expire(keep_last=1, orphan_grace_seconds=0.0)
    assert state["staged"] not in t.valid_ids()
    assert t.read().count() == 25 + n_late


def test_expire_tolerates_commit_published_after_listing(
    spark, docs, tmp_path, monkeypatch
):
    """A commit+publish landing BETWEEN expire()'s manifest listing
    and its keep-set resolution must neither crash maintenance (the
    published sid is missing from the stale dict) nor — worse, under
    zero grace — let the orphan walk reclaim the just-published
    snapshot's data files: expire re-reads the published manifest at
    decision time and counts its files live (review finding).

    keep_last=0 makes the live-counting half LOAD-BEARING (second
    review pass): every pre-race snapshot is expired, so the racing
    append's inherited parent files land in `dead` — only the fresh
    re-read's live set keeps the orphan walk off them.  With
    keep_last=1 the parent stays in keep and the walk could never
    reach those files, so a regression that merely skipped the
    missing sid would pass."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(docs.filter(F.col("doc_id") < 10))
    t.overwrite(docs.filter(F.col("doc_id") < 20))
    t2 = SnapshotTable(spark, str(tmp_path / "t"))
    late = docs.filter(F.col("doc_id") >= 90)
    n_late = late.count()
    state = {"fired": False, "new": None}
    real = SnapshotTable._valid_manifests

    def racing(self):
        out = real(self)
        if not state["fired"]:
            state["fired"] = True
            state["new"] = t2.append(late)  # lands AND publishes
        return out

    monkeypatch.setattr(SnapshotTable, "_valid_manifests", racing)
    t.expire(keep_last=0, orphan_grace_seconds=0.0)
    monkeypatch.setattr(SnapshotTable, "_valid_manifests", real)
    assert state["fired"]
    # The just-published snapshot is intact and FULLY readable — its
    # file list includes the expired parent's files, which survive
    # the zero-grace orphan walk only because the re-read counted
    # them live.
    assert t.latest_id() == state["new"]
    assert t.read().count() == 20 + n_late
    t.append(docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 25)))
    assert t.read().count() == 25 + n_late
