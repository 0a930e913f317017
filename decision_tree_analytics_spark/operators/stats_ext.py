"""Extended statistics operators — regression aggregates, Markov
transition matrices, robust (MAD) anomaly detection, and a
chi-square independence test.

The reference delegates all statistics to its host (its only model is
MLlib's decision tree, SURVEY §2.1 O8); these are the classic
SQL-native statistical shapes a warehouse user expects, each one or
two bounded-key aggregate passes:

* regression aggregates are single-pass mergeable moments
  (``regr_*`` lowers to count/sum/covar/var partials) — the map-side
  combine does almost all the work, the shuffle carries |groups| rows;
* the Markov matrix is one user-keyed window (lag) plus one
  |states|²-bounded aggregate;
* MAD anomaly scoring needs two exact-median passes; group medians
  are computed with ``percentile`` over |event_type| groups (bounded
  state per group) and rebroadcast — the events table itself is
  scanned, never shuffled on its full width;
* chi-square reduces to the |types|×|dow| contingency table, then a
  handful of single-row joins — all post-contingency tables are tiny.

Cross-engine notes (CLAUDE.md rules): time keys via ``ts div 1000``;
doubles floor-rounded at 1e-6 on both sides; counts cast BIGINT;
Spark exact ``percentile`` ≡ DuckDB ``quantile_cont`` (both
interpolate at rank p·(n-1)).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from decision_tree_analytics_spark.sources.tables import load_table

US_PER_DAY = 86_400_000_000


def _r6(c):
    return F.floor(c * 1e6 + 0.5) / 1e6


def rel_regression_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares via SQL regression aggregates:
    regress l_extendedprice on l_quantity within each l_returnflag.

    One aggregate pass: every ``regr_*`` is a mergeable moment
    (count / Σx / Σy / Σxy / Σx²), so partial aggregation happens
    map-side and the shuffle moves |groups| rows.  The intercept is
    rounded at 1e-2 (its magnitude is ~1e4 — finer would demand
    1e-10 relative agreement between the engines' summation orders);
    slope/r²/means at 1e-6."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    r2c = lambda c: F.floor(c * 1e2 + 0.5) / 1e2  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        F.expr("CAST(regr_count(y, x) AS BIGINT)").alias("n"),
        _r6(F.expr("regr_slope(y, x)")).alias("slope"),
        r2c(F.expr("regr_intercept(y, x)")).alias("intercept"),
        _r6(F.expr("regr_r2(y, x)")).alias("r2"),
        _r6(F.expr("regr_avgx(y, x)")).alias("avg_x"),
        r2c(F.expr("regr_avgy(y, x)")).alias("avg_y"),
    )


def rel_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's
    event-type sequence: P(next = b | current = a), with counts.

    One user-keyed shuffle for the lag window, then a |states|²-row
    aggregate; the row-normalizing total comes from a window over the
    tiny matrix, not a second scan.  The classic funnel/behavior
    model build — at 100 TB the matrix is still 25 rows."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    pairs = e.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    m = pairs.groupBy(
        F.col("event_type").alias("from_state"),
        F.col("next_type").alias("to_state"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = Window.partitionBy("from_state")
    return m.select(
        "from_state",
        "to_state",
        "n",
        _r6(F.col("n") / F.sum("n").over(tot)).alias("p"),
    )


def rel_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type anomaly detection: modified z-score
    0.6745·(x − median)/MAD, flagging |z| > 3.5 (the Iglewicz-Hoaglin
    rule).  Mean/stddev-based scoring (udf_grouped_zscore) breaks
    under the very outliers it hunts; medians don't.

    Two exact-median aggregate passes over bounded groups (5 event
    types), each result broadcast-joined back to the scan — the
    events table is never shuffled.  Returns the per-type summary
    (medians plus outlier counts), so output stays |groups|-bounded
    at any scale."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
    )
    z = e.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "med",
        "mad",
        _r6(
            F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
        ).alias("z"),
    )
    return z.groupBy("event_type").agg(
        _r6(F.first("med")).alias("med"),
        _r6(F.first("mad")).alias("mad"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.abs(F.col("z")) > 3.5, 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
        _r6(F.max(F.abs(F.col("z")))).alias("max_abs_z"),
    )


def rel_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence: is event_type independent of
    day-of-week?  Builds the |types|×7 contingency table in one
    aggregate pass, then computes per-cell (observed − expected)²/
    expected with window-summed marginals — every post-contingency
    step runs over ≤35 rows.  Returns the per-cell contributions plus
    the cell's share of the statistic (the drill-down an analyst
    actually reads); the global χ² is the sum of `contrib`."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type"),
        ((F.expr(f"(ts div 1000) div {US_PER_DAY}") + 4) % 7).alias("dow"),
    )
    cells = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wn = Window.partitionBy()
    x = cells.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        F.col("o").cast("long").alias("observed"),
        (
            F.sum("o").over(wr) * F.sum("o").over(wc) / F.sum("o").over(wn)
        ).alias("e"),
        ((F.col("o") - F.sum("o").over(wr) * F.sum("o").over(wc) / F.sum("o").over(wn))
         ** 2).alias("d2"),
    )
    return x.select(
        "event_type",
        "dow",
        "observed",
        _r6(F.col("e")).alias("expected"),
        _r6(F.col("d2") / F.col("e")).alias("contrib"),
    )


QUERIES = {
    "rel_regression_fns": rel_regression_fns,
    "rel_markov_transitions": rel_markov_transitions,
    "rel_anomaly_mad": rel_anomaly_mad,
    "rel_chi_square": rel_chi_square,
}

ORACLES = {
    "rel_regression_fns": (
        "SELECT l_returnflag,"
        " CAST(regr_count(y, x) AS BIGINT) AS n,"
        " floor(regr_slope(y, x) * 1e6 + 0.5) / 1e6 AS slope,"
        " floor(regr_intercept(y, x) * 1e2 + 0.5) / 1e2 AS intercept,"
        " floor(regr_r2(y, x) * 1e6 + 0.5) / 1e6 AS r2,"
        " floor(regr_avgx(y, x) * 1e6 + 0.5) / 1e6 AS avg_x,"
        " floor(regr_avgy(y, x) * 1e2 + 0.5) / 1e2 AS avg_y"
        " FROM (SELECT l_returnflag, l_quantity AS x, l_extendedprice AS y"
        "   FROM lineitem) GROUP BY l_returnflag"
    ),
    "rel_markov_transitions": (
        "WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t"
        "   FROM events),"
        " p AS (SELECT event_type AS from_state,"
        "   lead(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id)"
        "     AS to_state FROM e),"
        " m AS (SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n"
        "   FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2)"
        " SELECT from_state, to_state, n,"
        " floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_state)"
        "   * 1e6 + 0.5) / 1e6 AS p"
        " FROM m"
    ),
    "rel_anomaly_mad": (
        "WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med"
        "   FROM events GROUP BY 1),"
        " mad AS (SELECT e.event_type, any_value(med) AS med,"
        "   quantile_cont(abs(value - med), 0.5) AS mad"
        "   FROM events e JOIN med USING (event_type) GROUP BY 1),"
        " z AS (SELECT e.event_type, med, mad,"
        "   floor(0.6745 * (value - med) / mad * 1e6 + 0.5) / 1e6 AS z"
        "   FROM events e JOIN mad USING (event_type))"
        " SELECT event_type,"
        " floor(any_value(med) * 1e6 + 0.5) / 1e6 AS med,"
        " floor(any_value(mad) * 1e6 + 0.5) / 1e6 AS mad,"
        " CAST(count(*) AS BIGINT) AS n,"
        " CAST(sum(CASE WHEN abs(z) > 3.5 THEN 1 ELSE 0 END) AS BIGINT)"
        "   AS n_outliers,"
        " floor(max(abs(z)) * 1e6 + 0.5) / 1e6 AS max_abs_z"
        " FROM z GROUP BY 1"
    ),
    "rel_chi_square": (
        f"WITH e AS (SELECT event_type,"
        f"   (epoch_us(ts) // {US_PER_DAY} + 4) % 7 AS dow FROM events),"
        " cells AS (SELECT event_type, dow,"
        "   CAST(count(*) AS DOUBLE) AS o FROM e GROUP BY 1, 2),"
        " x AS (SELECT event_type, CAST(dow AS BIGINT) AS dow,"
        "   CAST(o AS BIGINT) AS observed,"
        "   sum(o) OVER (PARTITION BY event_type) * sum(o) OVER (PARTITION BY dow)"
        "     / sum(o) OVER () AS e,"
        "   o FROM cells)"
        " SELECT event_type, dow, observed,"
        " floor(e * 1e6 + 0.5) / 1e6 AS expected,"
        " floor((o - e) * (o - e) / e * 1e6 + 0.5) / 1e6 AS contrib"
        " FROM x"
    ),
}
