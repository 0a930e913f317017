"""Physical-plan inspection helpers.

The engine's scale claims are only real if the plans Catalyst produces
actually have the shape we designed for — filters reaching the parquet
scan, projections pruning the read schema, bounded dims broadcast,
expressions inside whole-stage codegen.  These helpers turn explain
output into assertable facts; tests/test_plans.py locks the plan shape
of every headline query so a regression that silently de-optimizes a
plan (e.g. a UDF sneaking into a hot path and breaking codegen) fails
CI, not the 100 TB run.

Capture note: plans are read in *simple* mode with AQE disabled just
for the explain call — the AdaptiveSparkPlan wrapper hides codegen
stages and join strategies until runtime, while the non-adaptive plan
shows the static strategy AQE starts from.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def simple_plan(df: DataFrame, adaptive: bool = False) -> str:
    """Simple-mode physical plan; AQE toggled off (default) so the
    static plan (codegen stars, join strategy) is visible."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", str(adaptive).lower())
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scan_read_schemas(plan: str) -> list[list[str]]:
    """Column lists of every parquet scan's ReadSchema."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        out.append([f.split(":")[0] for f in m.group(1).split(",") if f])
    return out


def pushed_filters(plan: str) -> str:
    return "; ".join(m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan))


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def count_shuffles(plan: str) -> int:
    """Data shuffles only — broadcast exchanges don't count."""
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )


def has_whole_stage_codegen(plan: str) -> bool:
    """Codegen stages appear as '*(n)' markers in simple mode."""
    return re.search(r"\*\(\d+\)", plan) is not None


def has_python_eval(plan: str) -> bool:
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan


def uncached_scans(plan: str, table: str) -> int:
    """Number of parquet scans of ``table`` that are NOT inside a
    cached (InMemoryRelation) subtree — i.e. scans that would really
    re-read the file at execution time.

    explain() reprints the cached child plan under every
    InMemoryRelation consumer (and, once the cache is materialized
    under AQE, prints BOTH the initial and the final adaptive plan),
    so raw FileScan counts over-report.  This walks the tree prefix
    indentation instead: a scan line is "cached" iff an
    InMemoryRelation line above it sits at a strictly smaller
    indentation depth and no intervening line closed that subtree."""
    active: int | None = None
    n = 0
    for line in plan.splitlines():
        m = re.search(r"[A-Za-z*]", line)
        if not m:
            continue
        offset = m.start()
        if active is not None and offset <= active:
            active = None
        if "InMemoryRelation" in line and active is None:
            active = offset
            continue
        if "FileScan" in line and table in line and active is None:
            n += 1
    return n


def uses_top_k_sort(plan: str) -> bool:
    """orderBy().limit() should plan as TakeOrderedAndProject — a
    per-partition heap + driver merge, never a global sort."""
    return "TakeOrderedAndProject" in plan
