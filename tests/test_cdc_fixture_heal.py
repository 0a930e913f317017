"""The two-commit events fixtures must self-heal from TORN-CLAIM
crash points (ADVICE r13): a writer SIGKILLed between its O_EXCL id
claim and the manifest write leaves an empty claim file that
``snapshot_ids()`` counts but no reader can serve.  The old fixture
derived readiness and v1/v2 from ``snapshot_ids()``, so such a crash
either published the torn id (permanent SnapshotNotFound) or skipped
the seed half entirely.  ``_two_commit_events_table`` now derives
everything from ``valid_ids()`` — these tests inject a torn claim at
each crash point and assert the healed table serves the exact
two-commit content."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from decision_tree_analytics_spark.operators import cdc
from decision_tree_analytics_spark.sources.snapshots import SnapshotTable
from decision_tree_analytics_spark.sources.tables import load_table


def _counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_even = ev.filter(F.col("event_id") % 2 == 0).count()
    return n_even, ev.count()


def test_fixture_heals_when_first_writer_died_mid_claim(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash point: first build claimed id 1 then died (torn claim,
    nothing valid).  The heal must seed v1 via overwrite — burning
    past the young torn claim an unpublished-table append would
    refuse — then append v2, and both versions must read exactly."""
    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_DIR", str(tmp_path / "snaps"))
    store = os.path.join(
        str(tmp_path / "snaps"), f"events_tt_{cdc._events_tag(sf_dir)}"
    )
    meta = os.path.join(store, "metadata")
    os.makedirs(meta)
    open(os.path.join(meta, "snap-00001.json"), "w").close()  # young torn

    table, v1, v2 = cdc._events_tt_table(spark, sf_dir)
    n_even, n_all = _counts(spark, sf_dir)
    assert 1 not in table.valid_ids()  # the torn id stays burned
    assert [v1, v2] == table.valid_ids()[:2]
    assert table.latest_id() == v2
    assert table.read(v1).count() == n_even
    assert table.read().count() == n_all


def test_fixture_heals_when_second_writer_died_mid_claim(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash point: v1 committed+published, the SECOND append claimed
    an id then died.  The old snapshot_ids()-based heal called
    publish(torn_id) here — raising SnapshotNotFound on every later
    call, permanently.  The heal must instead append the missing odd
    half and publish the VALID second commit."""
    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_DIR", str(tmp_path / "snaps"))
    store = os.path.join(
        str(tmp_path / "snaps"), f"events_tt_{cdc._events_tag(sf_dir)}"
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    seed = SnapshotTable(spark, store)
    s1 = seed.overwrite(ev.filter(F.col("event_id") % 2 == 0))
    open(os.path.join(seed.meta_dir, "snap-00002.json"), "w").close()

    table, v1, v2 = cdc._events_tt_table(spark, sf_dir)
    n_even, n_all = _counts(spark, sf_dir)
    assert v1 == s1 and v2 > 2  # healed past the burned torn id
    assert table.latest_id() == v2
    assert table.read(v1).count() == n_even
    assert table.read().count() == n_all
    # Idempotent: a second call finds the table ready and untouched.
    table2, w1, w2 = cdc._events_tt_table(spark, sf_dir)
    assert (w1, w2) == (v1, v2) and table2.valid_ids() == table.valid_ids()


def test_fixture_heals_commit_without_publish(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash point: both commits landed but the publish pointer move
    didn't (or a torn claim sits above the finished pair).  The heal
    must re-point at the newest VALID id — never a torn one."""
    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_DIR", str(tmp_path / "snaps"))
    table, v1, v2 = cdc._events_tt_table(spark, sf_dir)
    # Simulate: a later writer claims an id and dies; the pointer is
    # also lost.  snapshot_ids()[-1] is now the torn id.
    open(
        os.path.join(table.meta_dir, f"snap-{v2 + 1:05d}.json"), "w"
    ).close()
    os.remove(os.path.join(table.meta_dir, "_latest"))

    healed, w1, w2 = cdc._events_tt_table(spark, sf_dir)
    n_even, n_all = _counts(spark, sf_dir)
    assert (w1, w2) == (v1, v2)
    assert healed.latest_id() == v2  # republished the VALID tip
    assert healed.read(w1).count() == n_even
    assert healed.read().count() == n_all


def test_fixture_build_ages_out_a_stale_lock(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A crashed builder's leftover _build.lock must not wedge the
    fixture: locks older than the age-out are removed and the build
    proceeds."""
    import time

    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_DIR", str(tmp_path / "snaps"))
    store = os.path.join(
        str(tmp_path / "snaps"), f"events_tt_{cdc._events_tag(sf_dir)}"
    )
    meta = os.path.join(store, "metadata")
    os.makedirs(meta)
    lock = os.path.join(meta, "_build.lock")
    open(lock, "w").close()
    old = time.time() - 400.0
    os.utime(lock, (old, old))

    table, v1, v2 = cdc._events_tt_table(spark, sf_dir)
    _n_even, n_all = _counts(spark, sf_dir)
    assert table.read().count() == n_all
    assert not os.path.exists(lock)  # released after the build


def test_fixture_build_waits_for_a_live_lock_holder(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A FRESH lock means another session is mid-build: the caller
    must wait (not double-build) and proceed once the lock is
    released — proven by releasing it from a timer thread and
    asserting the built table is the normal two-commit shape, not a
    duplicated seed."""
    import threading
    import time

    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_DIR", str(tmp_path / "snaps"))
    store = os.path.join(
        str(tmp_path / "snaps"), f"events_tt_{cdc._events_tag(sf_dir)}"
    )
    meta = os.path.join(store, "metadata")
    os.makedirs(meta)
    lock = os.path.join(meta, "_build.lock")
    open(lock, "w").close()
    released_at = {}

    def release():
        time.sleep(1.0)
        released_at["t"] = time.time()
        os.remove(lock)

    threading.Thread(target=release).start()
    t0 = time.time()
    table, v1, v2 = cdc._events_tt_table(spark, sf_dir)
    assert released_at["t"] - t0 >= 0.9  # it really waited
    n_even, n_all = _counts(spark, sf_dir)
    assert table.read(v1).count() == n_even  # one seed, not two
    assert table.read().count() == n_all
    assert len(table.valid_ids()) == 2


_RACE_DRIVER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
os.environ["PYSPARK_PYTHON"] = sys.executable
os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable
os.environ["SPARK_GRAFT_SNAPSHOT_DIR"] = {snaps!r}
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from decision_tree_analytics_spark.operators import cdc

# Barrier: both racers signal ready, then wait for the parent's go —
# maximizing the overlap window on the fresh store.
open({ready!r}, "w").close()
while not os.path.exists({go!r}):
    time.sleep(0.05)

table, v1, v2 = cdc._events_tt_table(spark, {sf!r})
print("RACED", v1, v2, table.read(v1).count(), table.read().count(),
      len(table.valid_ids()), flush=True)
spark.stop()
print("RACER-OK")
"""


def test_two_processes_racing_a_fresh_store_build_it_once(
    spark, sf_dir, tmp_path
):
    """The build lock under a REAL race: two separate driver processes
    (own JVMs, own SparkSessions) hit the SAME fresh fixture store at
    the same instant, released by a shared go-file barrier.  Exactly
    one may build; both must come back with the SAME (v1, v2), a
    store holding exactly TWO valid snapshots, and exact two-commit
    content — the double-build failure mode (two duplicated seed
    commits as valid[:2], a permanent oracle mismatch) is what the
    lock exists to prevent."""
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snaps = str(tmp_path / "snaps")
    procs, readies = [], []
    for i in (1, 2):
        ready = str(tmp_path / f"ready{i}")
        readies.append(ready)
        code = _RACE_DRIVER.format(
            repo=repo, snaps=snaps, sf=sf_dir,
            ready=ready, go=str(tmp_path / "go"),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    deadline = time.time() + 300
    while not all(os.path.exists(r) for r in readies):
        assert time.time() < deadline, "racers never reached the barrier"
        time.sleep(0.1)
    open(str(tmp_path / "go"), "w").close()
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0 and "RACER-OK" in out, (
            f"stdout tail: {out[-2000:]}\nstderr tail: {err[-2000:]}"
        )
        outs.append(
            next(line for line in out.splitlines() if line.startswith("RACED"))
        )
    # Both racers agree on (v1, v2, counts, n_valid).
    assert outs[0] == outs[1], outs
    _tag, v1, v2, n_v1, n_all, n_valid = outs[0].split()
    assert int(n_valid) == 2  # built ONCE, never double-seeded
    ev = load_table(spark, sf_dir, "events")
    assert int(n_v1) == ev.filter(F.col("event_id") % 2 == 0).count()
    assert int(n_all) == ev.count()
