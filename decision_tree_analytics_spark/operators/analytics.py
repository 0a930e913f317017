"""Product-analytics operators — cohort retention, time-series gap
fill, and declarative data-quality checks.

The reference has no analytics surface (it delegates every relational
step to its host pipeline); these are the standard warehouse shapes a
user of a query engine expects on an events table, expressed so every
stage is a Catalyst-planned shuffle on bounded keys:

* cohort retention groups on (cohort_day, day_offset) — cardinality
  is days², not users;
* gap fill generates the missing time buckets with ``sequence`` +
  ``explode`` per key (never a driver-side calendar), so the densify
  step scales with keys × span, co-partitioned with the left join
  that follows;
* data-quality checks are ONE aggregate pass over the table unpivoted
  into a constraint report — the Deequ pattern: N constraints must
  not mean N scans.

Cross-engine notes (CLAUDE.md rules): the day key is
``(ts div 1000) div 86_400_000_000`` ≡ DuckDB
``epoch_us(ts) // 86400000000``; all ratios floor-rounded at 1e-6 on
both sides; count-ish columns cast to BIGINT.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from decision_tree_analytics_spark.sources.tables import load_table

US_PER_DAY = 86_400_000_000


def _day():
    """Epoch-day key: int64-ns → µs → day, all integer division
    (CLAUDE.md rule 1; a column expression must be built lazily —
    no active SparkContext at import time)."""
    return F.expr(f"(ts div 1000) div {US_PER_DAY}")


def rel_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: cohort = day of the user's first
    event; for each (cohort_day, day_offset) count the distinct users
    still active.

    One shuffle on user_id computes the per-user cohort via a window
    min (no self-join back to the events table); the final aggregate
    groups on (cohort_day, day_offset) — bounded by span², regardless
    of user count."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", _day().alias("day")
    )
    w = Window.partitionBy("user_id")
    c = e.withColumn("cohort_day", F.min("day").over(w))
    return (
        c.groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


def rel_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify each user's daily series over their active span and
    forward-fill the last seen daily value — the time-series
    gap-fill / LOCF operator (TimescaleDB's time_bucket_gapfill +
    locf as one DataFrame plan).

    Scale shape: the calendar is generated per key with
    ``sequence(min_day, max_day)`` and exploded — keys × span rows,
    distributed, never a driver-side date range.  The left join back
    to the daily aggregate and the forward-fill window both partition
    on user_id, so AQE coalesces them onto one exchange lineage.  The
    first day of every span exists by construction (the span came
    from the data), so the running ``last(ignorenulls)`` never leaves
    a leading NULL."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", _day().alias("day"), "value"
    )
    daily = e.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value").alias("day_value"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    days = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = days.join(daily, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day")
    filled = F.last("day_value", ignorenulls=True).over(w)
    return j.select(
        "user_id",
        "day",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        (F.floor(filled * 1e6 + 0.5) / 1e6).alias("filled_value"),
    )


def rel_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint report over orders —
    completeness, key uniqueness, a value bound, and a categorical
    domain check — computed in ONE aggregate pass and unpivoted into
    a (check_name, observed, passed) report (the Deequ pattern: the
    number of constraints must not multiply the number of scans)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderkey").alias("n_distinct_orderkey"),
        F.min("o_totalprice").alias("min_price"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 0).otherwise(1)
        ).alias("n_bad_status"),
    )
    r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    checks = a.select(
        F.expr(
            "stack(4,"
            " 'completeness_o_custkey', CAST(n_custkey AS DOUBLE) / n_rows,"
            "   CAST(n_custkey = n_rows AS BIGINT),"
            " 'uniqueness_o_orderkey',"
            "   CAST(n_distinct_orderkey AS DOUBLE) / n_rows,"
            "   CAST(n_distinct_orderkey = n_rows AS BIGINT),"
            " 'min_o_totalprice_nonneg', CAST(min_price AS DOUBLE),"
            "   CAST(min_price >= 0 AS BIGINT),"
            " 'domain_o_orderstatus', CAST(n_bad_status AS DOUBLE),"
            "   CAST(n_bad_status = 0 AS BIGINT)"
            ") AS (check_name, observed, passed)"
        )
    )
    return checks.select(
        "check_name", r6(F.col("observed")).alias("observed"), "passed"
    )


QUERIES = {
    "rel_cohort_retention": rel_cohort_retention,
    "rel_gap_fill": rel_gap_fill,
    "rel_data_quality": rel_data_quality,
}

ORACLES = {
    "rel_cohort_retention": (
        f"WITH e AS (SELECT user_id, epoch_us(ts) // {US_PER_DAY} AS day"
        "   FROM events),"
        " c AS (SELECT user_id, day,"
        "   min(day) OVER (PARTITION BY user_id) AS cohort_day FROM e)"
        " SELECT cohort_day, day - cohort_day AS day_offset,"
        " CAST(count(DISTINCT user_id) AS BIGINT) AS n_users"
        " FROM c GROUP BY 1, 2"
    ),
    "rel_gap_fill": (
        f"WITH e AS (SELECT user_id, epoch_us(ts) // {US_PER_DAY} AS day,"
        "   value FROM events),"
        " daily AS (SELECT user_id, day,"
        "   CAST(count(*) AS BIGINT) AS n_events, sum(value) AS day_value"
        "   FROM e GROUP BY 1, 2),"
        " span AS (SELECT user_id, min(day) AS d0, max(day) AS d1"
        "   FROM daily GROUP BY 1),"
        " days AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day"
        "   FROM span),"
        " j AS (SELECT days.user_id, days.day, daily.n_events,"
        "   daily.day_value FROM days LEFT JOIN daily"
        "   ON days.user_id = daily.user_id AND days.day = daily.day)"
        " SELECT user_id, day, coalesce(n_events, 0) AS n_events,"
        " floor(last_value(day_value IGNORE NULLS) OVER ("
        "   PARTITION BY user_id ORDER BY day) * 1e6 + 0.5) / 1e6"
        "   AS filled_value"
        " FROM j"
    ),
    "rel_data_quality": (
        "WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,"
        "   CAST(count(o_custkey) AS BIGINT) AS n_custkey,"
        "   CAST(count(DISTINCT o_orderkey) AS BIGINT)"
        "     AS n_distinct_orderkey,"
        "   min(o_totalprice) AS min_price,"
        "   CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')"
        "     THEN 0 ELSE 1 END) AS BIGINT) AS n_bad_status"
        "   FROM orders)"
        " SELECT check_name,"
        " floor(observed * 1e6 + 0.5) / 1e6 AS observed, passed FROM ("
        "   SELECT 'completeness_o_custkey' AS check_name,"
        "     CAST(n_custkey AS DOUBLE) / n_rows AS observed,"
        "     CAST(n_custkey = n_rows AS BIGINT) AS passed FROM a"
        "   UNION ALL SELECT 'uniqueness_o_orderkey',"
        "     CAST(n_distinct_orderkey AS DOUBLE) / n_rows,"
        "     CAST(n_distinct_orderkey = n_rows AS BIGINT) FROM a"
        "   UNION ALL SELECT 'min_o_totalprice_nonneg',"
        "     CAST(min_price AS DOUBLE),"
        "     CAST(min_price >= 0 AS BIGINT) FROM a"
        "   UNION ALL SELECT 'domain_o_orderstatus',"
        "     CAST(n_bad_status AS DOUBLE),"
        "     CAST(n_bad_status = 0 AS BIGINT) FROM a"
        " ) t"
    ),
}
