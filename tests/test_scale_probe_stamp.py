"""Corpus-generation stamps on scale_probe's derived corpora
(ADVICE r12): each derived dir carries a ``.base_tag`` — md5 over the
base tables' parquet FOOTER tags — written at generation time, and
``_stale`` flags the dir whenever the stamp is missing or the base
testdata has rotated since.  Without this, a probe run without
--generate could time sf1/sf10 corpora derived from an OLDER base
than the sf0.1 point, producing a silently inconsistent scale curve.

Pure-Python tests (no Spark session): they exercise the stamp
round-trip against synthetic parquet files in a tmp BASE.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import scale_probe


@pytest.fixture()
def fake_base(tmp_path, monkeypatch):
    """A miniature base-testdata dir holding every table _base_tag
    fingerprints, plus a derived dir to stamp."""
    base = tmp_path / "base"
    derived = tmp_path / "derived"
    base.mkdir()
    derived.mkdir()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "customer", "orders",
              "lineitem", "events", "supplier", "nation", "region",
              "part"):
        con.execute(
            f"COPY (SELECT range AS id, '{t}' AS name FROM range(10))"
            f" TO '{base}/{t}.parquet' (FORMAT parquet)"
        )
    monkeypatch.setattr(scale_probe, "BASE", str(base))
    return base, derived, con


def _touch_corpus(derived) -> None:
    # _stale first requires the corpus data itself to exist.
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT range AS vec_id FROM range(5))"
        f" TO '{derived}/embeddings.parquet' (FORMAT parquet)"
    )


def test_stamp_roundtrip_marks_fresh(fake_base):
    base, derived, _ = fake_base
    _touch_corpus(derived)
    assert scale_probe._stale(str(derived))  # no stamp yet
    scale_probe._stamp(str(derived))
    assert not scale_probe._stale(str(derived))


def test_missing_corpus_is_stale_even_with_stamp(fake_base):
    base, derived, _ = fake_base
    scale_probe._stamp(str(derived))  # stamp but no embeddings.parquet
    assert scale_probe._stale(str(derived))


def test_base_rotation_invalidates_stamp(fake_base):
    base, derived, con = fake_base
    _touch_corpus(derived)
    scale_probe._stamp(str(derived))
    assert not scale_probe._stale(str(derived))
    # Rotate ONE base table (new content → new footer stats → new tag).
    con.execute(
        f"COPY (SELECT range AS id, 'rotated' AS name FROM range(20))"
        f" TO '{base}/events.parquet' (FORMAT parquet)"
    )
    assert scale_probe._stale(str(derived))


def test_dim_only_rotation_invalidates_stamp(fake_base):
    """The fingerprint covers the COPIED dims too (review finding): a
    rotation touching only supplier/nation/region/part must flag the
    derived corpora stale."""
    base, derived, con = fake_base
    _touch_corpus(derived)
    scale_probe._stamp(str(derived))
    con.execute(
        f"COPY (SELECT range AS id, 'rotated-dim' AS name FROM range(7))"
        f" TO '{base}/part.parquet' (FORMAT parquet)"
    )
    assert scale_probe._stale(str(derived))


def test_tag_is_content_derived_not_mtime(fake_base):
    base, derived, _ = fake_base
    tag1 = scale_probe._base_tag()
    # Touch every file's mtime without changing bytes.
    for f in os.listdir(base):
        os.utime(os.path.join(base, f))
    assert scale_probe._base_tag() == tag1
