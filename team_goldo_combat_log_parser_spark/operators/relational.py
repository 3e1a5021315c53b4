"""Generic relational operators, DuckDB-cross-checkable.

Each combat-pipeline operator family (SURVEY.md par.2) has a counterpart
here expressed over the driver's TPC-H-ish tables, so the exact same Spark
patterns (conditional hash aggregation, window sessionization, broadcast
enrich joins, window dedup, as-of carry-forward, top-k, pivot, collect_set)
are verified value-for-value against an independent SQL engine.

Numeric discipline: aggregates are computed in DECIMAL (exact, order-
independent) and only cast to DOUBLE at the end, so Spark and DuckDB hash
identically despite parallel summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


# --------------------------------------------------------------- aggregation


def q1_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the damage-done rollup analogue (A2/A3):
    conditional counts + exact sums per low-cardinality key, plus the
    fight start/stop analogue (A11: min/max timestamp per group —
    absorbed the former minmax_month_rollup entry so every queries()
    entry fits the driver's 50-row correctness cap, VERDICT r6 item 3).
    One map-side-combining hash aggregate either way."""
    li = load(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                      - _dec("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
            F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0))
            .alias("big_qty_rows"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd")
            .alias("first_ship"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd")
            .alias("last_ship"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------- joins


def broadcast_enrich_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash-join enrichment (J1/J2): fact x small dims, plus
    the players_set analogue (A9: deterministic distinct-set aggregation
    — absorbed the former collect_set_sorted entry, VERDICT r6 item 3).
    collect_set is order-free; array_sort + array_join makes the string
    deterministic under any shuffle order.

    Round 8 (the A/B the r7 verdict asked for, BENCH/ENRICH_IVF_AB.md):
    the absorbed aggregates fully explained the r7 1.33->2.14s shift
    (median 2.01x the pre-merge body over 3 gated ABBA rounds — not a
    plan regression), and most of that cost was the SECOND distinct
    aggregate: collect_set + countDistinct in one agg forces an Expand
    (every input row duplicated per distinct-agg group). n_suppliers is
    now derived as size(collect_set) from the ONE set — identical
    values and schema, no Expand, measured 1.77x faster (2.80->1.58s
    same-window)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                     - _dec("l_discount"))
    agged = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"),
             F.array_sort(F.collect_set("s_name")).alias("supp_set"))
    )
    return (
        agged.select(
            "r_name", "n_name", "revenue", "n_items",
            F.array_join("supp_set", "|").alias("suppliers"),
            F.size("supp_set").cast("long").alias("n_suppliers"))
        .orderBy("r_name", "n_name")
    )


def customer_order_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: 3-way join + agg + deterministic top-k (O1 + limit)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                     - _dec("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# ------------------------------------------------------------------- windows


def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (A1 analogue): gap>30min starts a new session —
    running-sum window, the same construct that derives fight ids."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; session tz is pinned UTC so the cast is
    # a no-op reinterpretation matching DuckDB's epoch_us on naive ts
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("session_id",
                         F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


def asof_carry_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Healer-attribution shape (J5): last signup ts at-or-before each
    purchase per user — as-of join as a carry-forward window. Also
    carries the threat-accumulation shape (A7: exact DECIMAL running sum
    over the same window spec — absorbed the former running_value_sum
    entry, VERDICT r6 item 3); the sum accumulates over ALL events, the
    purchase filter only selects which rows are reported."""
    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    signup_ts = F.max(F.when(F.col("event_type") == "signup",
                             F.col("ts"))).over(w)
    running = F.sum(_dec("value")).over(w).cast("double")
    return (
        ev.withColumn("last_signup_ts", signup_ts)
        .withColumn("running_value", running)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
                F.date_format("last_signup_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("last_signup_s"),
                "running_value")
        .orderBy("event_id")
    )


def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-pull suppression shape (J4): keep the first row per key
    in a deterministic order (window dedup)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .orderBy("o_custkey")
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (report-layer sort/limit)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rnk")
    )


# ------------------------------------------------------------ pivot / unpivot


def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gviz table pivot + dict->rows unpivot (O4), both directions in one
    plan (merged the former pivot_status_counts and unpivot_stack entries,
    VERDICT r6 item 3): counts are pivoted to a wide (priority x status)
    frame — zero-filled, exactly what the reference's gviz tables render —
    then stacked back to long form, so the result value-checks BOTH the
    pivot fill semantics and the stack unpivot against the oracle's
    cross-join reconstruction."""
    o = load(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )
    return (
        wide.selectExpr(
            "o_orderpriority",
            "stack(3, 'F', `F`, 'O', `O`, 'P', `P`) AS (o_orderstatus, n)")
        .orderBy("o_orderpriority", "o_orderstatus")
    )


# ---------------------------------------------------------------- oracle SQL

def point_lookup_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 point lookup (reference /chart/<id>, main.py:379-382 analogue):
    fetch one entity by primary key. The equality predicate must reach the
    parquet scan as a pushed filter (asserted in
    tests/test_plan_shape.py) so at scale only matching row groups are
    read — min/max statistics prune everything else."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") == F.lit(32))
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
                F.col("o_orderdate").cast("string").alias("o_orderdate"))
    )


ORACLE_SQL: dict[str, str] = {
    "point_lookup_order": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) AS total,
               CAST(o_orderdate AS VARCHAR) AS o_orderdate
        FROM orders WHERE o_orderkey = 32
    """,
    "q1_pricing_rollup": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS sum_disc_price,
               COUNT(*) AS count_order,
               CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_qty_rows,
               strftime(MIN(l_shipdate), '%Y-%m-%d') AS first_ship,
               strftime(MAX(l_shipdate), '%Y-%m-%d') AS last_ship
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "broadcast_enrich_revenue": """
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_items,
               string_agg(DISTINCT s_name, '|' ORDER BY s_name) AS suppliers,
               COUNT(DISTINCT s_name) AS n_suppliers
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    "customer_order_join_topk": """
        SELECT o_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    "sessionize_gap": """
        WITH g AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM g
        )
        SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM s GROUP BY user_id ORDER BY user_id
    """,
    "asof_carry_forward": """
        WITH x AS (
          SELECT event_id, user_id, ts, event_type,
                 MAX(CASE WHEN event_type = 'signup' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS last_signup_ts,
                 CAST(SUM(CAST(value AS DECIMAL(18,2)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
          FROM events
        )
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
               strftime(last_signup_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_signup_s,
               running_value
        FROM x WHERE event_type = 'purchase' ORDER BY event_id
    """,
    "dedup_first_wins": """
        SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date FROM (
          SELECT *, row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders
        ) WHERE rn = 1 ORDER BY o_custkey
    """,
    "topk_per_group": """
        SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders
        ) WHERE rnk <= 3 ORDER BY o_custkey, rnk
    """,
    "pivot_unpivot_roundtrip": """
        WITH p AS (SELECT DISTINCT o_orderpriority FROM orders),
        s AS (SELECT unnest(['F', 'O', 'P']) AS o_orderstatus),
        c AS (
          SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
          FROM orders GROUP BY 1, 2
        )
        SELECT p.o_orderpriority, s.o_orderstatus,
               COALESCE(c.n, 0) AS n
        FROM p CROSS JOIN s
        LEFT JOIN c ON c.o_orderpriority = p.o_orderpriority
                   AND c.o_orderstatus = s.o_orderstatus
        ORDER BY p.o_orderpriority, s.o_orderstatus
    """,
}

# Sized with the rest of the engine to keep the TOTAL queries() registry
# at <= 50 entries (the driver's per-round correctness cap), so EVERY
# entry gets a rows+schema+hash row in CORRECTNESS_r{N}.json every round
# (VERDICT r6 item 3). Former entries route_fanout_counts (S7/P1 — now
# covered authoritatively by combat_route_counts), running_value_sum
# (-> asof_carry_forward), collect_set_sorted (-> broadcast_enrich_
# revenue), minmax_month_rollup (-> q1_pricing_rollup), and
# pivot_status_counts/unpivot_stack (-> pivot_unpivot_roundtrip) were
# merged, not dropped: their operator semantics are value-checked inside
# the absorbing entries.
QUERIES = {
    "q1_pricing_rollup": q1_pricing_rollup,
    "broadcast_enrich_revenue": broadcast_enrich_revenue,
    "customer_order_join_topk": customer_order_join_topk,
    "sessionize_gap": sessionize_gap,
    "asof_carry_forward": asof_carry_forward,
    "dedup_first_wins": dedup_first_wins,
    "topk_per_group": topk_per_group,
    "pivot_unpivot_roundtrip": pivot_unpivot_roundtrip,
    "point_lookup_order": point_lookup_order,
}
