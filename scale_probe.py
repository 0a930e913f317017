"""Scale-validation probe (BASELINE.md "sf1 scale validation").

Generates a local 10x corpus at .scale/sf1 (gitignored) — 10 replicas
of sf0.1 with structure preserved: documents get per-replica token
suffixes (each replica keeps sf0.1's internal near-dup structure,
replicas stay mutually disjoint), the relational fact chain gets
FK-preserving key offsets, dims are shared — then times the heavy
dedup/text/graph paths best-of-two on the bench session.

Usage:
    python scale_probe.py            # generate if missing, then time
    python scale_probe.py --generate # force regeneration
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale", "sf1")

NAMES = [
    "dedup_substring",
    "dedup_minhash_lsh_pairs",
    "dedup_canonical_snapshot",
    "ns_text_subword",
    "graph_pagerank",
    "graph_label_propagation",
    "graph_khop",
]


def generate() -> None:
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    md = con.sql(
        f"SELECT max(doc_id)+1 FROM read_parquet('{BASE}/documents.parquet')"
    ).fetchone()[0]
    con.execute(f"""
    COPY (
      SELECT r * {md} + doc_id AS doc_id,
        CASE WHEN r = 0 THEN text
             ELSE array_to_string(list_transform(string_split(text, ' '),
                    t -> t || 'q' || CAST(r AS VARCHAR)), ' ') END AS text,
        lang, source,
        CAST(len(CASE WHEN r = 0 THEN text
             ELSE array_to_string(list_transform(string_split(text, ' '),
                    t -> t || 'q' || CAST(r AS VARCHAR)), ' ') END) AS BIGINT)
          AS n_chars
      FROM read_parquet('{BASE}/documents.parquet'), range(10) t(r)
      ORDER BY doc_id
    ) TO '{OUT}/documents.parquet' (FORMAT parquet)""")
    mo = con.sql(
        f"SELECT max(o_orderkey)+1 FROM read_parquet('{BASE}/orders.parquet')"
    ).fetchone()[0]
    mc = con.sql(
        f"SELECT max(c_custkey)+1 FROM read_parquet('{BASE}/customer.parquet')"
    ).fetchone()[0]
    con.execute(f"""
    COPY (SELECT c_custkey + r * {mc} AS c_custkey, c_name, c_nationkey,
        c_acctbal, c_mktsegment
      FROM read_parquet('{BASE}/customer.parquet'), range(10) t(r)
      ORDER BY c_custkey) TO '{OUT}/customer.parquet' (FORMAT parquet)""")
    con.execute(f"""
    COPY (SELECT o_orderkey + r * {mo} AS o_orderkey,
        o_custkey + r * {mc} AS o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority
      FROM read_parquet('{BASE}/orders.parquet'), range(10) t(r)
      ORDER BY o_orderkey) TO '{OUT}/orders.parquet' (FORMAT parquet)""")
    con.execute(f"""
    COPY (SELECT l_orderkey + r * {mo} AS l_orderkey, * EXCLUDE (l_orderkey)
      FROM read_parquet('{BASE}/lineitem.parquet'), range(10) t(r)
      ORDER BY l_orderkey) TO '{OUT}/lineitem.parquet' (FORMAT parquet)""")
    for t in ("supplier", "nation", "region", "part"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{BASE}/{t}.parquet'))"
            f" TO '{OUT}/{t}.parquet' (FORMAT parquet)"
        )


def main() -> None:
    if "--generate" in sys.argv or not os.path.exists(
        os.path.join(OUT, "lineitem.parquet")
    ):
        generate()
    from decision_tree_analytics_spark import operators
    from decision_tree_analytics_spark.session import get_spark
    from decision_tree_analytics_spark.sources.tables import load_table

    spark = get_spark(app_name="dta-spark-scale-probe")
    queries = operators.all_queries()
    out = {}
    for sf_dir, tag in [(BASE, "sf0.1"), (OUT, "sf1")]:
        for t in ("documents", "customer", "orders", "lineitem",
                  "supplier", "nation"):
            load_table(spark, sf_dir, t).count()
        spark.range(32).repartition(32).mapInPandas(
            lambda it: it, "id long"
        ).count()
        for name in NAMES:
            best = None
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = queries[name](spark, sf_dir).count()
                dt = round(time.perf_counter() - t0, 2)
                best = dt if best is None or dt < best else best
            out[f"{tag}:{name}"] = {"sec": best, "rows": rows}
            print(json.dumps({tag: name, "sec": best, "rows": rows}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
