"""Unit tests for plans/inspect.py's indentation-walking heuristics.

uncached_scans is a load-bearing text heuristic (first [A-Za-z*] char
as tree depth, subtree-close on offset <= active, AQE initial-plan
reprints) backing two plan locks — a Spark explain-format change that
silently flipped it to always-0 would turn those locks vacuous.  These
canned-string tests pin the expected counts (ADVICE r14)."""

from decision_tree_analytics_spark.plans.inspect import uncached_scans

# A cached scan: the FileScan sits under an InMemoryRelation reprint,
# so it must NOT count.
CACHED_ONLY = """\
*(2) HashAggregate(keys=[k#1], functions=[sum(v#2)])
+- InMemoryTableScan [k#1, v#2]
      +- InMemoryRelation [k#1, v#2], StorageLevel(disk, memory)
            +- *(1) ColumnarToRow
               +- FileScan parquet [k#1,v#2] ... lineitem.parquet
"""

# A sibling uncached FileScan at the same depth as the cached subtree:
# the InMemoryRelation subtree closed (offset <= active), so the
# second scan MUST count.
CACHED_PLUS_SIBLING = """\
*(5) SortMergeJoin [k#1], [k#9], Inner
:- InMemoryTableScan [k#1]
:     +- InMemoryRelation [k#1], StorageLevel(disk, memory)
:           +- FileScan parquet [k#1] ... lineitem.parquet
+- *(4) Sort [k#9 ASC NULLS FIRST], false, 0
   +- FileScan parquet [k#9] ... lineitem.parquet
"""

# AQE reprints the whole tree under '== Initial Plan ==' after the
# final plan; the walker must count the initial-plan scan too unless
# it is under its own InMemoryRelation (both reprints carry one here,
# so the count stays 0).
AQE_REPRINT_CACHED = """\
AdaptiveSparkPlan isFinalPlan=true
+- == Final Plan ==
   *(1) HashAggregate(keys=[k#1], functions=[])
   +- InMemoryTableScan [k#1]
         +- InMemoryRelation [k#1], StorageLevel(disk, memory)
               +- FileScan parquet [k#1] ... lineitem.parquet
+- == Initial Plan ==
   HashAggregate(keys=[k#1], functions=[])
   +- InMemoryTableScan [k#1]
         +- InMemoryRelation [k#1], StorageLevel(disk, memory)
               +- FileScan parquet [k#1] ... lineitem.parquet
"""

UNCACHED_ONLY = """\
*(1) HashAggregate(keys=[k#1], functions=[])
+- FileScan parquet [k#1] ... lineitem.parquet
"""


def test_cached_scan_does_not_count():
    assert uncached_scans(CACHED_ONLY, "lineitem") == 0


def test_sibling_uncached_scan_counts():
    assert uncached_scans(CACHED_PLUS_SIBLING, "lineitem") == 1


def test_aqe_reprint_cached_scans_do_not_count():
    assert uncached_scans(AQE_REPRINT_CACHED, "lineitem") == 0


def test_plain_uncached_scan_counts():
    assert uncached_scans(UNCACHED_ONLY, "lineitem") == 1


def test_other_table_not_matched():
    assert uncached_scans(UNCACHED_ONLY, "orders") == 0
