"""Multimodal plumbing tests: decoder stub contract + batch shape."""

from __future__ import annotations

import pytest
from pyspark.sql.types import BinaryType

from decision_tree_analytics_spark.operators.multimodal import (
    META_SCHEMA,
    MultimodalDecoder,
    mm_binary_meta,
    with_binary_payload,
)
from decision_tree_analytics_spark.sources.tables import load_table


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        MultimodalDecoder().decode(b"\x89PNG...")


def test_fake_metadata_deterministic():
    a = MultimodalDecoder.fake_metadata(b"hello")
    assert a == MultimodalDecoder.fake_metadata(b"hello")
    n, digest, w, h, c = a
    assert n == 5 and len(digest) == 32 and 64 <= w < 256 and 64 <= h < 256 and c == 3


def test_payload_column_is_binary(spark, sf_dir):
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    assert isinstance(d.schema["payload"].dataType, BinaryType)


def test_meta_schema_stable(spark, sf_dir):
    out = mm_binary_meta(spark, sf_dir)
    assert out.schema == META_SCHEMA
    row = out.orderBy("doc_id").first()
    assert row.n_bytes > 0 and len(row.content_md5) == 32
