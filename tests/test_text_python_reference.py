"""Engine-independent reference check for text operators.

The DuckDB oracles prove Spark↔DuckDB agreement; this test checks the
*semantics* against a pure-Python reference implementation on random
inputs, so a shared misunderstanding of a SQL function can't hide."""

from __future__ import annotations

import hashlib
import random

from decision_tree_analytics_spark.operators.text import (
    STOPWORDS,
    ns_text_fingerprint,
    ns_text_quality,
)

WORDS = ["the", "fast", "key", "order", "sort", "merge", "a", "of", "scan", "härte", "データ"]


def _random_corpus(n=40, seed=99):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        text = " ".join(rng.choices(WORDS, k=rng.randrange(3, 30)))
        rows.append((i, text, "en", "src", len(text)))
    return rows


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_fingerprint_matches_python(spark, tmp_path):
    rows = _random_corpus()
    sf_dir = _write(spark, tmp_path, rows)
    got = {r.doc_id: r.fingerprint for r in ns_text_fingerprint(spark, sf_dir).collect()}
    for doc_id, text, *_ in rows:
        norm = " ".join(sorted(set(text.strip().lower().split(" "))))
        want = hashlib.md5(norm.encode("utf-8")).hexdigest()
        assert got[doc_id] == want, doc_id


def test_quality_matches_python(spark, tmp_path):
    rows = _random_corpus(seed=7)
    sf_dir = _write(spark, tmp_path, rows)
    got = {r.doc_id: r for r in ns_text_quality(spark, sf_dir).collect()}
    for doc_id, text, *_ in rows:
        toks = text.strip().lower().split(" ")
        n = len(toks)
        stop = sum(1 for t in toks if t in STOPWORDS["en"])
        r = got[doc_id]
        assert r.n_tokens == n
        assert abs(r.avg_token_len - sum(map(len, toks)) / n) < 1e-9
        assert abs(r.stopword_ratio - stop / n) < 1e-9


def test_subword_tokens_properties_and_goldens():
    """The pair-merge tokenizer itself, checked without Spark: exact
    goldens plus the three invariants (conservation, token lengths,
    merge criterion) on random words."""
    import random

    from decision_tree_analytics_spark.operators.udf_inventory import (
        _MERGE_HEX,
        subword_tokens,
    )

    # Hand-verified goldens (merge iff md5(pair) first hex digit even).
    def merged(pair):
        return hashlib.md5(pair.encode()).hexdigest()[0] in _MERGE_HEX

    assert subword_tokens("") == []
    assert subword_tokens("a") == ["a"]
    assert subword_tokens("ab") == (["ab"] if merged("ab") else ["a", "b"])

    rng = random.Random(11)
    for _ in range(200):
        w = "".join(rng.choices("abcdefghijklmnopqrstuvwxyzü0123456789", k=rng.randrange(0, 15)))
        toks = subword_tokens(w)
        assert "".join(toks) == w  # conservation
        assert all(1 <= len(t) <= 2 for t in toks)
        # Replay the block scan: each 2-char token must sit at an even
        # offset and satisfy the merge criterion; unmerged full blocks
        # must fail it.
        i = 0
        for t in toks:
            if len(t) == 2:
                assert i % 2 == 0 and merged(t), (w, t, i)
            i += len(t)


def test_subword_query_matches_python(spark, tmp_path):
    from decision_tree_analytics_spark.operators.udf_inventory import (
        ns_text_subword,
        subword_tokens,
    )

    rows = _random_corpus(seed=23)
    sf_dir = _write(spark, tmp_path, rows)
    got = {r.doc_id: r for r in ns_text_subword(spark, sf_dir).collect()}
    for doc_id, text, *_ in rows:
        words = text.strip(" ").lower().split(" ")
        want = sum(len(subword_tokens(w)) for w in words)
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_subwords == want, doc_id


def test_subword_invariants_hypothesis():
    """Hypothesis sweep of the tokenizer invariants over arbitrary
    unicode words (not just the random-corpus alphabet)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from decision_tree_analytics_spark.operators.udf_inventory import (
        _MERGE_HEX,
        subword_tokens,
    )

    @given(st.text(max_size=40))
    @settings(max_examples=300, deadline=None)
    def check(w):
        toks = subword_tokens(w)
        assert "".join(toks) == w  # conservation
        assert all(1 <= len(t) <= 2 for t in toks)
        i = 0
        for t in toks:
            if len(t) == 2:
                assert i % 2 == 0
                assert hashlib.md5(t.encode("utf-8")).hexdigest()[0] in _MERGE_HEX
            i += len(t)

    check()


def test_seq_spans_tile_sequences_and_split_straddlers(spark, sf_dir):
    """ns_seq_spans: within every (source, seq_index), spans tile the
    sequence exactly (span k+1 starts where span k ends, from 0), no
    span exceeds the capacity, and a document's total span length
    across sequences equals its token count."""
    from decision_tree_analytics_spark.operators.text import (
        PACK_CAPACITY,
        ns_seq_pack,
        ns_seq_spans,
    )

    sp = ns_seq_spans(spark, sf_dir).toPandas()
    for _, grp in sp.groupby(["source", "seq_index"]):
        grp = grp.sort_values("span_ord")
        pos = 0
        for _, r in grp.iterrows():
            assert r.span_start == pos
            assert 1 <= r.span_len <= PACK_CAPACITY
            pos = r.span_start + r.span_len
        assert pos <= PACK_CAPACITY
    per_doc = sp.groupby("doc_id")["span_len"].sum()
    toks = ns_seq_pack(spark, sf_dir).toPandas().set_index("doc_id")["n_tokens"]
    assert (per_doc == toks.loc[per_doc.index]).all()


def test_pack_efficiency_consistent_with_spans(spark, sf_dir):
    """ns_pack_efficiency must agree with the span manifest it
    audits: per source, n_seqs covers the max seq_index and
    n_straddlers equals the docs appearing in >1 sequence."""
    from decision_tree_analytics_spark.operators.text import (
        ns_pack_efficiency,
        ns_seq_spans,
    )

    eff = {r.source: r.asDict() for r in ns_pack_efficiency(spark, sf_dir).collect()}
    sp = ns_seq_spans(spark, sf_dir).toPandas()
    for src, grp in sp.groupby("source"):
        assert eff[src]["n_seqs"] == grp.seq_index.max() + 1
        multi = (grp.groupby("doc_id").seq_index.nunique() > 1).sum()
        assert eff[src]["n_straddlers"] == multi
        assert 0 < eff[src]["fill_rate"] <= 1.0


def test_incremental_manifest_appends_after_existing_corpus(spark, sf_dir):
    """New sequences must CONTINUE each source's packing: the first
    arriving doc per source lands exactly at the existing corpus's
    running token total (seq_index/offset derived from it), never
    inside already-shipped sequences."""
    import pyspark.sql.functions as F

    from decision_tree_analytics_spark.operators.dedup import DELTA_SPLIT
    from decision_tree_analytics_spark.operators.text import (
        PACK_CAPACITY,
        ns_incremental_manifest,
    )
    from decision_tree_analytics_spark.sources.tables import load_table

    inc = ns_incremental_manifest(spark, sf_dir).toPandas()
    base = {
        r.source: r.base_tok
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < DELTA_SPLIT)
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.col("text"), " "))).alias("base_tok")
        )
        .collect()
    }
    for src, grp in inc.groupby("source"):
        first = grp.sort_values("doc_id").iloc[0]
        start = base.get(src, 0)
        assert first.seq_index == start // PACK_CAPACITY
        assert first.offset == start % PACK_CAPACITY
