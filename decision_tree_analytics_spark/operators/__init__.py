"""Operator inventory.

Each operator module exports:

* ``QUERIES``: dict[name -> callable(spark, sf_dir) -> DataFrame]
* ``ORACLES``: dict[name -> ANSI SQL string runnable by DuckDB on the
  same parquet tables]  (a query without an oracle entry is checked
  rows-only by the driver — reserved for genuinely non-SQL ops).

``__spark_entry__.py`` merges these dicts for the driver contract.
"""

from decision_tree_analytics_spark.operators import (  # noqa: F401
    analytics,
    cdc,
    dedup,
    graph,
    ml_inventory,
    multimodal,
    relational,
    similarity,
    skew,
    stats_ext,
    streaming_inventory,
    text,
    tpch,
    udf_inventory,
)

ALL_MODULES = (
    relational,
    analytics,
    ml_inventory,
    dedup,
    similarity,
    text,
    multimodal,
    streaming_inventory,
    udf_inventory,
    tpch,
    skew,
    cdc,
    graph,
    stats_ext,
)

# Extra bench queries beyond bench.py's HEADLINE set.
BENCH_EXTRAS = [
    "q26_dt_train_predict",
    "dedup_minhash_lsh_pairs",
    "dedup_incremental",
    "sim_cosine_topk",
    "ns_text_quality",
    "ns_text_subword",
    "ns_corpus_curate",
    "tpch_q5_local_supplier_volume",
    "tpch_q12_priority_shipping",
    "tpch_q1_pricing_summary",
    "tpch_q21_waiting_suppliers",
    "rel_grouped_topk",
    "rel_asof_join",
    "sim_pq_topk",
    "rel_gap_fill",
    "udf_secondary_sort",
    "rel_kmv_setops",
    "dedup_canonical",
    "ns_seq_pack",
    "rel_seq_patterns",
    "ns_train_manifest",
]


def all_queries():
    out = {}
    for m in ALL_MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise RuntimeError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLES)
    return out
