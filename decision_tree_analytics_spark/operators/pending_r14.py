"""The Spark 4 arrow-optimized Python UDTF lane — REGISTERED r14.

VERDICT r11 identified the ``@udtf`` surface as the one uncovered
Python-extension lane (the batch Python DataSource API is covered by
src_python_datasource).  Built and oracle-verified in r12-r13
(3-SF oracle compare, 2-JVM cluster evidence, SIGKILL-mid-stage
recovery, partition invariance, sf1+sf10 probe rows), then merged
into the contract in r14 alongside pending_r12's
mm_video_frame_plan, exactly filling r14's 2 fresh window slots.

Follows the repo's cross-engine determinism rules: pure code-point
string arithmetic (Python ``len``/``str.split`` ≡ DuckDB ``length``/
``string_split`` on code points), BIGINT outputs, rule-5 unique
ordering keys (doc_id, seg_idx).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from decision_tree_analytics_spark.sources.tables import (
    load_table,
    size_aware_parallelism,
)

# Bounded slice: the compare stays ~10% of the corpus at any SF (the
# dedup_lsh_recall_eval idiom — the restriction commutes with the
# per-document span generation).
UDTF_DOC_MOD = 10
UDTF_DOC_REM = 3


def udf_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-span manifest via a Spark 4 **arrow-optimized Python
    UDTF** (``@udtf(useArrow=True)`` + SQL ``LATERAL`` join) — the
    per-row one-to-many Python extension point: one input document,
    N output span rows, without an intermediate array column or an
    explode.  The span semantics themselves are deliberately
    SQL-expressible (split into single-space-separated token spans,
    emit per-token index / start offset / length — the byte-offset
    manifest a span-annotation or highlight pipeline ships) so the
    DuckDB oracle can hash-check the lane: ~60 output rows per input
    row exercises real one-to-many fan-out across Arrow batch
    boundaries, and
    a UDTF that dropped a row, reordered eval calls, or mangled Arrow
    batch boundaries breaks the hash.

    Scale: the UDTF is a NARROW per-row stage — no shuffle; input
    sized by ``size_aware_parallelism`` (Arrow worker round-trips are
    the fixed cost, ns_text_subword lesson).  The plan must show
    ``ArrowEvalPythonUDTF`` (the Arrow lane), never
    ``BatchEvalPythonUDTF`` (row-pickling) — plan-locked in
    tests/test_plans.py.  Registration (``spark.udtf.register``
    + temp view) is idempotent per session, driver's vanilla session
    included."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="seg_idx: bigint, seg_start: bigint, seg_len: bigint",
        useArrow=True,
    )
    class _SegSpans:
        def eval(self, text):  # noqa: ANN001 — UDTF protocol signature
            if text is None:
                return
            off = 0
            for i, part in enumerate(text.split(' ')):
                yield (i, off, len(part))
                off += len(part) + 1

    spark.udtf.register("dta_seg_spans", _SegSpans)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % UDTF_DOC_MOD == UDTF_DOC_REM)
            & F.col("text").isNotNull()
        )
        .select("doc_id", "text")
        .repartition(size_aware_parallelism(spark, sf_dir, "documents"))
    )
    docs.createOrReplaceTempView("dta_seg_docs")
    return spark.sql(
        "SELECT d.doc_id, s.seg_idx, s.seg_start, s.seg_len"
        " FROM dta_seg_docs d, LATERAL dta_seg_spans(d.text) s"
    )


_TOKEN_SPANS_ORACLE = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS parts
  FROM documents
  WHERE doc_id % {UDTF_DOC_MOD} = {UDTF_DOC_REM} AND text IS NOT NULL),
z AS (SELECT doc_id,
    unnest(range(len(parts))) AS seg_idx,
    unnest(parts) AS seg
  FROM d),
m AS (SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
    CAST(length(seg) AS BIGINT) AS seg_len FROM z)
SELECT doc_id, seg_idx,
  CAST(coalesce(sum(seg_len + 1) OVER (PARTITION BY doc_id
    ORDER BY seg_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    0) AS BIGINT) AS seg_start,
  seg_len
FROM m
"""

QUERIES = {
    "udf_token_spans": udf_token_spans,
}

ORACLES = {
    "udf_token_spans": _TOKEN_SPANS_ORACLE,
}
