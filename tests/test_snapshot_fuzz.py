"""Property fuzz over SnapshotTable op sequences — the generalization
of the hand-picked crash-point tests: ANY interleaving of commits,
torn-claim injections (crashed writers, young or aged), expiry, and
id reuse must keep the published read exactly equal to a pure-Python
model, keep torn claims invisible to valid_ids()/history(), and never
wedge the store (the PATH_ALREADY_EXISTS class ADVICE r13 closed).

Each op publishes, so the model is a per-version row-count dict:
overwrite starts a version at its size, append extends the published
tip, expire shrinks the model to the survivors — and TIME TRAVEL to
every surviving version must serve its exact modeled count after
every op (expiry must never break a kept snapshot).
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from decision_tree_analytics_spark.sources.snapshots import (
    ORPHAN_GRACE_SECONDS,
    SnapshotTable,
)
from decision_tree_analytics_spark.sources.tables import load_table

# Op alphabet: (kind, size).  Sizes are tiny — every commit is a real
# Spark parquet write, so the fuzz budget goes to SEQUENCE diversity,
# not data volume.
_OPS = st.one_of(
    st.tuples(st.just("overwrite"), st.integers(1, 4)),
    st.tuples(st.just("append"), st.integers(1, 4)),
    st.tuples(st.just("torn"), st.just(0)),  # young crashed writer
    st.tuples(st.just("torn_aged"), st.just(0)),  # long-dead writer
    st.tuples(st.just("torn_with_debris"), st.just(0)),  # died mid-write
    st.tuples(st.just("expire"), st.integers(1, 2)),  # keep_last
    st.tuples(st.just("rollback"), st.integers(0, 7)),  # index into valid
    st.tuples(st.just("compact"), st.just(0)),  # OPTIMIZE rewrite
    # The race class found twice in r14 review: a commit+publish
    # landing INSIDE expire's listing-to-keep-resolution gap, under
    # zero grace, composed with arbitrary prior store states.
    st.tuples(st.just("expire_vs_publish"), st.integers(1, 2)),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_OPS, min_size=1, max_size=7))
# Pinned example: every maintenance op composed with the r14 race
# injection runs on EVERY test execution, independent of what the
# generated examples happen to cover.
@example(
    ops=[
        ("overwrite", 3),
        ("expire_vs_publish", 1),
        ("compact", 0),
        ("append", 2),
        ("torn_aged", 0),
        ("expire_vs_publish", 2),
        ("rollback", 1),
    ]
)
def test_snapshot_store_invariants_under_op_sequences(
    spark, sf_dir, tmp_path_factory, ops
):
    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(8)
    root = str(tmp_path_factory.mktemp("snap-fuzz"))
    t = SnapshotTable(spark, os.path.join(root, "t"))
    # Per-version model: sid -> expected row count.  Every op below
    # publishes, so `published` tracks the tip; expire() shrinks the
    # model to the surviving valid ids, and TIME TRAVEL to any
    # surviving version must still serve its exact model count.
    published = t.overwrite(docs.limit(2))
    model = {published: 2}
    for kind, arg in ops:
        if kind == "overwrite":
            published = t.overwrite(docs.limit(arg))
            model[published] = arg
        elif kind == "append":
            prev = model[published]
            published = t.append(docs.limit(arg))
            model[published] = prev + arg
        elif kind in ("torn", "torn_aged", "torn_with_debris"):
            sid = (t.snapshot_ids() or [0])[-1] + 1
            claim = os.path.join(t.meta_dir, f"snap-{sid:05d}.json")
            open(claim, "w").close()
            if kind == "torn_with_debris":
                ddir = os.path.join(t.data_dir, f"s{sid:05d}")
                os.makedirs(ddir, exist_ok=True)
                open(os.path.join(ddir, "_SUCCESS"), "w").close()
                with open(
                    os.path.join(ddir, "part-0.parquet"), "wb"
                ) as fh:
                    fh.write(b"partial")
            if kind == "torn_aged":
                old = time.time() - 2 * ORPHAN_GRACE_SECONDS
                os.utime(claim, (old, old))
        elif kind == "expire":
            t.expire(keep_last=arg, orphan_grace_seconds=0.0)
            model = {s: model[s] for s in t.valid_ids()}
        elif kind == "rollback":
            # Atomically move the pointer to any surviving version —
            # a later append must chain from IT, and expire must keep
            # protecting the (now older) published snapshot.
            versions = sorted(model)
            published = versions[arg % len(versions)]
            t.publish(published)
        elif kind == "compact":
            # Content-preserving maintenance rewrite: a new published
            # version with the SAME row count.
            prev = model[published]
            published = t.compact()
            model[published] = prev
        elif kind == "expire_vs_publish":
            # Deterministic injection of the r14 race: an append
            # commits AND publishes between expire's manifest listing
            # and its keep-set resolution.  expire must re-read the
            # moved tip at decision time and count its files live —
            # under zero grace, a stale live set would let the orphan
            # walk eat files the new tip inherits, and every
            # time-travel invariant below would catch it.
            prev = model[published]
            race: dict = {}
            real = SnapshotTable._valid_manifests

            def racing(self):
                out = real(self)
                if "new" not in race:
                    race["new"] = t.append(docs.limit(1))
                return out

            SnapshotTable._valid_manifests = racing
            try:
                t.expire(keep_last=arg, orphan_grace_seconds=0.0)
            finally:
                SnapshotTable._valid_manifests = real
            published = race["new"]
            model[published] = prev + 1
            model = {s: model[s] for s in t.valid_ids()}
        # Invariants after EVERY op:
        # 1. The published read serves exactly the model, and TIME
        #    TRAVEL to every surviving valid version serves ITS exact
        #    model count (expiry must never break a kept snapshot).
        assert t.read().count() == model[published], (kind, arg, ops)
        valid = t.valid_ids()
        for s in valid:
            assert t.read(s).count() == model[s], (s, kind, arg, ops)
        # 2. Torn claims are invisible to the readable history and
        #    every valid manifest parses.
        assert set(valid) <= set(t.snapshot_ids())
        assert set(valid) == set(model)
        assert t.latest_id() == published and published in valid
        for m in t.history():
            assert isinstance(m["files"], list)
        # 3. Every torn claim on disk is exactly empty (never a
        #    partial manifest — the empty-or-complete invariant).
        for s in set(t.snapshot_ids()) - set(valid):
            assert (
                os.path.getsize(t._manifest_path(s)) == 0
            ), f"non-empty unreadable manifest for {s}"
    # The store must never be wedged: one more commit always succeeds
    # (id reuse after zero-grace expiry of torn claims included).
    t.append(docs.limit(1))
    assert t.read().count() == model[published] + 1
