"""Grouped-aggregation queries (SURVEY.md §2.4 extension surface).

Conventions for exact hash-matching vs DuckDB (SURVEY.md §7.4):
floating SUMs rounded to 2, AVGs to 6; DuckDB integer aggregates cast
``::BIGINT`` (DuckDB widens to HUGEINT, Spark stays LongType).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators import aggregates as A
from oracle_to_cassandra_spark.functions import exactnum as X
from oracle_to_cassandra_spark.operators import relational as R
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {X.exact_sum_sql("l_quantity")}                                  AS sum_qty,
           {X.exact_sum_sql("l_extendedprice")}                             AS sum_base_price,
           {X.exact_sum_sql("l_extendedprice * (1 - l_discount)")}          AS sum_disc_price,
           {X.exact_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
           {X.exact_avg_units_sql("l_quantity")}                            AS avg_qty_e2,
           {X.exact_avg_units_sql("l_extendedprice")}                       AS avg_price_e2,
           {X.exact_avg_units_sql("l_discount")}                            AS avg_disc_e2,
           count(*)::BIGINT                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical scan → filter → 8-way grouped
    aggregate, with every float aggregate in the integer-units compare
    form (`functions/exactnum.py`) so partition merge order cannot
    move a rounded digit. Scale: map-side partial aggregation means
    the shuffle carries ≤ (partitions × 6 groups) rows regardless of
    input size; the filter pushes down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return A.grouped_summary(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")),
        ["l_returnflag", "l_linestatus"],
        [
            X.exact_sum(F.col("l_quantity")).alias("sum_qty"),
            X.exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            X.exact_sum(disc_price).alias("sum_disc_price"),
            X.exact_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            X.exact_avg_units("l_quantity").alias("avg_qty_e2"),
            X.exact_avg_units("l_extendedprice").alias("avg_price_e2"),
            X.exact_avg_units("l_discount").alias("avg_disc_e2"),
            F.count("*").alias("count_order"),
        ],
    )


@query(
    "group_customer_stats",
    oracle="""
    SELECT c_mktsegment,
           count(*)::BIGINT            AS n_customers,
           (sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT
            // count(c_acctbal)) AS avg_bal_c,
           round(min(c_acctbal), 2)    AS min_bal,
           round(max(c_acctbal), 2)    AS max_bal,
           round(sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT
                 / 100.0, 2)           AS sum_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def group_customer_stats(spark, sf_dir):
    """groupBy + count/avg/min/max/sum — the basic grouped surface."""
    return A.grouped_summary(
        load_table(spark, sf_dir, "customer"),
        ["c_mktsegment"],
        [
            F.count("*").alias("n_customers"),
            X.exact_avg_units("c_acctbal").alias("avg_bal_c"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            X.exact_sum(F.col("c_acctbal")).alias("sum_bal"),
        ],
    )


@query(
    "count_distinct_custkeys",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)::BIGINT AS n_custs,
           count(*)::BIGINT                  AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def count_distinct_custkeys(spark, sf_dir):
    """Exact distinct count per group. Scale: exact distinct expands to
    a two-phase aggregate (distinct keys shuffled first) — prefer the
    HLL variant below when the answer tolerates ~2% error."""
    return A.grouped_summary(
        load_table(spark, sf_dir, "orders"),
        ["o_orderstatus"],
        [
            F.count_distinct(F.col("o_custkey")).alias("n_custs"),
            F.count("*").alias("n_orders"),
        ],
    )


@query(
    "rollup_region_nation",
    oracle="""
    SELECT r.r_name AS r_name, n.n_name AS n_name,
           count(*)::BIGINT         AS n_customers,
           round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT))::BIGINT
                 / 100.0, 2)          AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    HAVING count(*) > 0
    """,
)
def rollup_region_nation(spark, sf_dir):
    """ROLLUP over the dimension hierarchy — region subtotals and the
    grand total in one pass (expands to 3 grouping sets, still one
    shuffle). Empty-input semantics pinned to Spark's via ``HAVING
    count(*) > 0`` — see cube_order_status_priority."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = R.fk_chain_join(
        c,
        [
            (n, c.c_nationkey == n.n_nationkey, True),
            (r, n.n_regionkey == r.r_regionkey, True),
        ],
    )
    return A.rollup_summary(
        joined,
        ["r_name", "n_name"],
        [
            F.count("*").alias("n_customers"),
            X.exact_sum(F.col("c_acctbal")).alias("sum_bal"),
        ],
    )


@query(
    "cube_order_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)::BIGINT              AS n_orders,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
                 / 100.0, 2)             AS sum_price
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    HAVING count(*) > 0
    """,
)
def cube_order_status_priority(spark, sf_dir):
    """CUBE: all four grouping sets of (status, priority).

    Empty-input semantics are pinned to Spark's: CUBE over an empty
    relation yields NO rows (DuckDB, per the standard, emits the ()
    grouping set's grand-total row with count 0). ``HAVING count(*)
    > 0`` filters exactly that row and nothing else — every grouping-
    set row over non-empty input has count ≥ 1 (empty-dataset stress
    sweep, EMPTY_SWEEP.json)."""
    return A.cube_summary(
        load_table(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_orderpriority"],
        [
            F.count("*").alias("n_orders"),
            X.exact_sum(F.col("o_totalprice")).alias("sum_price"),
        ],
    )


@query(
    "grouping_sets_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_status_priority(spark, sf_dir):
    """Explicit GROUPING SETS — two independent one-key aggregations in
    a single shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "pivot_user_event_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'view')::BIGINT     AS view,
           count(*) FILTER (WHERE event_type = 'click')::BIGINT    AS click,
           count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')::BIGINT   AS signup,
           count(*) FILTER (WHERE event_type = 'error')::BIGINT    AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_user_event_counts(spark, sf_dir):
    """Pivot long→wide (pinned pivot values; empty cells → 0 to match
    conditional aggregation)."""
    return A.pivot_counts(
        load_table(spark, sf_dir, "events"),
        "user_id",
        "event_type",
        ["view", "click", "purchase", "signup", "error"],
    )


@query(
    "stats_dispersion_per_segment",
    oracle="""
    SELECT c_mktsegment,
           -- sample dispersion is UNDEFINED at n = 1 (the n-1 Bessel
           -- divisor is 0): NULL on both sides, where Spark's ANSI
           -- division would abort (single-row-group stress sweep)
           CASE WHEN n > 1 THEN
             CAST(floor(sqrt(greatest((s2 - s1 * 1.0 * s1 / n) / (n - 1), 0))
                        / 100.0 * 10000 + 0.5) AS BIGINT)
           END AS sd_bal_e4,
           CASE WHEN n > 1 THEN
             CAST(floor(greatest((s2 - s1 * 1.0 * s1 / n) / (n - 1), 0)
                        / 100.0 + 0.5) AS BIGINT)
           END AS var_bal_e2,
           round(med, 6) AS median_bal
    FROM (
      -- n counts NON-NULL balances (count(bal_c), not count(*)): s1/s2
      -- skip NULLs, so a count(*) n deflates the mean under injected
      -- NULLs and the n>1 guard passes with one non-null value
      SELECT c_mktsegment, count(bal_c)::BIGINT AS n,
             sum(bal_c)::BIGINT AS s1,
             sum(bal_c * bal_c)::BIGINT AS s2,
             quantile_cont(c_acctbal, 0.5) AS med
      FROM (
        SELECT c_mktsegment, c_acctbal,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
      )
      GROUP BY c_mktsegment
    )
    """,
)
def stats_dispersion_per_segment(spark, sf_dir):
    """stddev / variance / exact interpolated median per group.
    Dispersion comes from exact integer-cent sums (s1, s2) reduced in
    closed form — sample variance = (s2 - s1^2/n)/(n-1) — with one
    identical float expression at the end in both engines, so the
    rounded compare cannot move with partition accumulation order
    (``round(stddev_samp(double))`` can: the float sum of squares is
    order-dependent). The exact interpolated median is order-free by
    construction (same sorted multiset in both engines).

    Scale: both aggregates are map-side combinable; exact percentile
    collects per-group sorted values — at 100 TB switch to
    ``percentile_approx`` (one-pass sketch, same plan shape)."""
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    sums = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            # count the NON-NULL balances — s1/s2/med all skip NULLs,
            # so count(*) would deflate the mean when NULLs are present
            F.count(bal_c).alias("n"),
            F.sum(bal_c).alias("s1"),
            F.sum(bal_c * bal_c).alias("s2"),
            F.percentile("c_acctbal", F.lit(0.5)).alias("med"),
        )
    )
    var_cents = F.greatest(
        (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n"))
        / (F.col("n") - 1),
        F.lit(0.0),
    )
    n_gt_1 = F.col("n") > 1  # Bessel divisor n-1: undefined at n = 1
    return sums.select(
        "c_mktsegment",
        # deterministic fixed-point emission: floor(x*10^nd + 0.5) on
        # the IDENTICAL double is the same in both engines (floor has
        # no repr-vs-binary tie ambiguity; round does)
        F.when(
            n_gt_1,
            F.floor(F.sqrt(var_cents) / 100.0 * 10000 + 0.5).cast("long"),
        ).alias("sd_bal_e4"),
        F.when(
            n_gt_1, F.floor(var_cents / 100.0 + 0.5).cast("long")
        ).alias("var_bal_e2"),
        F.round(F.col("med"), 6).alias("median_bal"),
    )


@query(
    "having_filter_hot_parts",
    oracle="""
    SELECT l_partkey, count(*)::BIGINT AS n_lines,
           round(sum(CAST(round(l_quantity) AS BIGINT))::BIGINT / 1.0, 2)
             AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 40
    """,
)
def having_filter_hot_parts(spark, sf_dir):
    """GROUP BY + HAVING — post-aggregation predicate."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.round(F.col("l_quantity")).cast("long")) / 1.0, 2
            ).alias("total_qty"),
        )
        .filter(F.col("n_lines") >= 40)
    )


@query(
    "conditional_aggregation",
    oracle="""
    SELECT n.n_name AS n_name,
           count(*)::BIGINT AS n_orders,
           count(*) FILTER (WHERE o.o_orderstatus = 'F')::BIGINT AS n_filled,
           round(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                          THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                          ELSE 0 END)::BIGINT / 100.0, 2) AS urgent_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def conditional_aggregation(spark, sf_dir):
    """Conditional aggregates (FILTER / CASE WHEN inside agg) after a
    broadcast-dimension join — the revenue-by-nation shape."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = R.fk_chain_join(
        o,
        [
            (c, o.o_custkey == c.c_custkey, True),
            (n, c.c_nationkey == n.n_nationkey, True),
        ],
    )
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.round(
            F.sum(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT",
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            )
            / 100.0,
            2,
        ).alias("urgent_value"),
    )


@query(
    "revenue_per_nation",
    oracle="""
    SELECT n.n_name AS n_name, r.r_name AS r_name,
           (sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 10000) AS BIGINT))::BIGINT // 100)
             AS revenue_c
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def revenue_per_nation(spark, sf_dir):
    """TPC-H Q5 shape: fact⋈fact shuffle join + three broadcast
    dimension hops + grouped revenue. The headline analytical query.

    Scale: the only exchange is lineitem⋈orders on the order key
    (AQE-planned); dimensions broadcast; partial aggregation collapses
    the output to 25 rows before the final shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = R.fk_chain_join(
        li,
        [
            (o, li.l_orderkey == o.o_orderkey, False),
            (c, o.o_custkey == c.c_custkey, True),
            (n, c.c_nationkey == n.n_nationkey, True),
            (r, n.n_regionkey == r.r_regionkey, True),
        ],
    )
    return joined.groupBy("n_name", "r_name").agg(
        # integer CENTS via int64 div of the exact 1e-4-unit sum — a
        # final round(sum/1e4, 2) ties at half-cents, where Spark
        # (shortest-repr HALF_UP) and DuckDB (binary) disagree
        F.expr(
            """sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) div 100"""
        ).alias("revenue_c")
    )


@query(
    "pareto_revenue_concentration",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_c
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, rev_c,
             sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_c,
             sum(rev_c) OVER ()::BIGINT AS tot_c,
             count(*) OVER () AS n_cust
      FROM per_cust
    )
    SELECT count(*)::BIGINT AS n_customers_for_80pct,
           any_value(n_cust)::BIGINT AS n_customers_total,
           (count(*) * 10000 // any_value(n_cust))::BIGINT
             AS share_of_customers_e4,
           round(any_value(tot_c) / 100.0, 2) AS total_revenue
    FROM ranked WHERE (cum_c - rev_c) * 10 < 8 * tot_c
    """,
)
def pareto_revenue_concentration(spark, sf_dir):
    """Pareto / 80-20 concentration: how many top customers carry 80%
    of order revenue (a customer is IN while the revenue accumulated
    BEFORE them is still under the threshold, so the set is the
    minimal prefix crossing 80%). The one-row answer an account team
    actually asks for, plus the share of the customer base it
    represents.

    Scale: per-customer revenue is a keyed aggregate (map-side
    partials); the cumulative ranking is a single total-order window
    over CUSTOMER-count rows (not orders) — bounded, and at 100 TB
    replaced by a two-pass block-offset cumsum exactly like
    dense_global_ids. Revenues are integer CENTS end-to-end — the
    ranking order, the cumulative sum, and the 80% threshold test
    ((cum − rev)·10 < 8·tot) are all exact int64 arithmetic, so no
    accumulation order or rounding boundary can move the answer."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    w_ord = Window.orderBy(F.desc("rev_c"), "o_custkey")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = per_cust.select(
        "rev_c",
        F.sum("rev_c").over(w_cum).alias("cum_c"),
        F.sum("rev_c").over(w_all).alias("tot_c"),
        F.count("*").over(w_all).alias("n_cust"),
    )
    hit = ranked.filter(
        (F.col("cum_c") - F.col("rev_c")) * 10 < 8 * F.col("tot_c")
    )
    return hit.agg(
        F.count("*").alias("n_customers_for_80pct"),
        F.any_value("n_cust").cast("long").alias("n_customers_total"),
        F.expr("count(*) * 10000 div any_value(n_cust)").alias(
            "share_of_customers_e4"
        ),
        F.round(F.any_value("tot_c") / 100.0, 2).alias("total_revenue"),
    )


@query(
    "supplier_concentration_hhi",
    oracle="""
    WITH shares AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS q,
             sum(sum(CAST(round(l_quantity) AS BIGINT)))
               OVER (PARTITION BY l_partkey)::BIGINT AS tot
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    hhi AS (
      SELECT l_partkey,
             count(*)::BIGINT AS n_suppliers,
             sum(CAST(round((q * 1.0 / tot) * (q * 1.0 / tot)
                            * 1000000000000) AS BIGINT))::BIGINT AS hhi_pico
      FROM shares GROUP BY l_partkey
    )
    SELECT CASE WHEN hhi_pico >= 250000000000 THEN 'concentrated'
                WHEN hhi_pico >= 150000000000 THEN 'moderate'
                ELSE 'competitive' END AS concentration_band,
           count(*)::BIGINT AS n_parts,
           min(hhi_pico)::BIGINT AS min_hhi_pico,
           max(hhi_pico)::BIGINT AS max_hhi_pico
    FROM hhi GROUP BY 1
    """,
)
def supplier_concentration_hhi(spark, sf_dir):
    """Supply-chain concentration: per part the Herfindahl–Hirschman
    index over its suppliers' quantity shares, banded at the standard
    antitrust thresholds (0.15 / 0.25) — the single-source-risk
    report a procurement review starts from. HHI = Σ share², 1.0 =
    sole-sourced.

    Scale: one (part, supplier) aggregate with map-side partials; the
    per-part share normalization is a window over the SAME partition
    key (no extra exchange); banding is a 3-key rollup. Shares are
    exact-integer-quantity ratios, squared and summed in identical
    operand order per part group — rounded at 6 dp both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    shares = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("q")
    )
    w = Window.partitionBy("l_partkey")
    # per-supplier squared share in integer PICO units (share² ≤ 1 →
    # ≤ 10¹²): the per-part sum, the band thresholds, and min/max are
    # all exact int64 — only the final /10¹² display op is float
    share = F.col("q") * 1.0 / F.col("tot")
    hhi = (
        shares.withColumn("tot", F.sum("q").over(w))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum(
                F.round(share * share * 1000000000000).cast("long")
            ).alias("hhi_pico"),
        )
    )
    band = (
        F.when(F.col("hhi_pico") >= 250000000000, "concentrated")
        .when(F.col("hhi_pico") >= 150000000000, "moderate")
        .otherwise("competitive")
    )
    return hhi.groupBy(band.alias("concentration_band")).agg(
        F.count("*").alias("n_parts"),
        # raw pico-units: exact int64, no display division to tie
        F.min("hhi_pico").alias("min_hhi_pico"),
        F.max("hhi_pico").alias("max_hhi_pico"),
    )


@query(
    "distinct_set_sorted_rollup",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
             AS event_types,
           len(list_distinct(list(event_type)))::BIGINT AS n_types
    FROM events GROUP BY user_id
    """,
)
def distinct_set_sorted_rollup(spark, sf_dir):
    """Deterministic SET aggregation: per user the distinct event
    types as a SORTED joined string. ``collect_set`` alone is
    arrival-order nondeterministic — the same data hashes differently
    per partitioning and rerun — so every stored/compared set column
    must pass through ``array_sort`` first; this query certifies the
    sorted form is a pure function of the data (the hash compare
    fails on any order leak).

    Scale: set state is bounded by type cardinality per user; the
    aggregate is map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), ","
        ).alias("event_types"),
        F.size(F.collect_set("event_type")).cast("long").alias("n_types"),
    )
