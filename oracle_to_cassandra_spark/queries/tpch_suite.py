"""The rest of the TPC-H suite as shapes on the test star schema —
Q2/Q4/Q5/Q7/Q8/Q9/Q11-Q22 (Q1 lives in queries/aggregates.py, Q3/Q6/Q10
in queries/tpch_shapes.py). Together they cover all 22 classic shapes.

The reference repo frames its workload as "Oracle SQL → Spark SQL on
the migrated tables" (`/root/reference/README.md:694-872` runs joins,
filters, aggregates over the HR schema); TPC-H is the standard
completion of that analytical surface. The test schema is a slimmed
TPC-H (no partsupp, no commit/receipt dates, no comment/phone/container
columns), so each query keeps its canonical *plan shape* — the join
graph, subquery structure, and aggregation pattern — with predicates
adapted to the columns that exist. Every adaptation is noted on the
query.

Cross-engine determinism (SURVEY.md §7.4): revenue sums over
thousands of rows round to 0 dp (2-dp boundaries flip under
accumulation order — see tpch_q10); sums of integer-valued doubles
(l_quantity) are EXACT in IEEE754 (< 2^53), so HAVING/compare on them
is safe unrounded; ratio-of-sums rounds at 4 dp (relative drift ~1e-14
cannot move a 5e-5 boundary); scalar thresholds (avg/max subqueries)
are compared unrounded — a flip requires a value within float-drift
distance (~1e-9 relative) of the threshold, impossible for this data's
value spacing.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table

_TS = "yyyy-MM-dd"


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(round(min(l_extendedprice / l_quantity) * 10000) AS BIGINT)
               AS supplycost_tmil
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), cand AS (
      SELECT p.p_partkey, p.p_name, ps.l_suppkey, ps.supplycost_tmil,
             min(ps.supplycost_tmil) OVER (PARTITION BY p.p_partkey) AS best
      FROM part p JOIN ps ON ps.l_partkey = p.p_partkey
      WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
    )
    SELECT s.s_name, c.p_partkey, c.p_name, c.supplycost_tmil
    FROM cand c JOIN supplier s ON s.s_suppkey = c.l_suppkey
    WHERE c.supplycost_tmil = c.best
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: cheapest supplier per qualifying part.

    Adaptation: no partsupp table — the part-supplier cost relation is
    derived from lineitem (min observed unit price per pair). The
    canonical correlated-min subquery is expressed as a partition
    window, the scale-correct rewrite: one shuffle on p_partkey
    instead of a per-row re-aggregation.

    Scale: ps is a groupBy on (partkey, suppkey) — the shuffle carries
    one row per pair, not per lineitem (map-side partial min). The
    part filter broadcasts; supplier broadcasts. Equality on the integer
    tenth-mil cost is engine-exact (see the scaling comment below).
    """
    li = load_table(spark, sf_dir, "lineitem")
    # integer tenth-mil units, scaled BEFORE the decimal round:
    # round(x, 4) disagrees between engines by 1 ulp at a 4-dp
    # boundary (Spark rounds the exact decimal expansion, DuckDB
    # rescales in doubles — observed once at sf0.1), while
    # round(x * 10000) to an integer rounds the SAME product double
    # in both
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 10000
        )
        .cast("long")
        .alias("supplycost_tmil")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    cand = ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey).withColumn(
        "best", F.min("supplycost_tmil").over(Window.partitionBy("p_partkey"))
    )
    return (
        cand.filter(F.col("supplycost_tmil") == F.col("best"))
        .join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .select("s_name", "p_partkey", "p_name", "supplycost_tmil")
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: priority counts for orders with a late line.

    Adaptation: no l_commitdate/l_receiptdate — "late" is a shipment
    more than 45 days after the order date.

    Scale: EXISTS plans as a left-semi hash join on l_orderkey with
    the date comparison as the residual; the quarter filter pushes
    into the orders scan first, shrinking the build side.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 45 DAYS")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS n_name,
           (sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                           * 10000) AS BIGINT))::BIGINT // 10000)
             AS revenue_whole
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: revenue where customer and supplier share a nation,
    per Asian nation — the classic 6-way join.

    Scale: the only big⋈big edge is lineitem⋈orders (shuffle on
    orderkey, AQE-sized); customer joins next on custkey (Catalyst
    broadcasts at test scale, shuffles at 100 TB — no forced hint);
    supplier/nation/region are broadcast. The same-nation predicate
    rides the supplier join as an equi-key, not a post-filter.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.expr(
            """sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) div 10000"""
        ).alias("revenue_whole")
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(l.l_shipdate)::INT AS l_year,
           (sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 10000) AS BIGINT))::BIGINT // 100)
             AS revenue_c
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey  = l.l_orderkey
    JOIN customer c ON c.c_custkey   = o.o_custkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_8')
        OR (ns.n_name = 'NATION_8' AND nc.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: trade volume between two nations by direction and
    ship year. The nation pair is a disjunctive cross-filter applied
    AFTER both nation joins (it needs both sides bound).

    Scale: supplier+nation broadcast onto lineitem before the
    lineitem⋈orders shuffle — the supplier-side filter then prunes
    ~92% of lineitem rows (1 nation of 25, 2 directions) ahead of the
    only big shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_3", "NATION_8"))
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_3", "NATION_8"))
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
            | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.expr(
            """sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) div 100"""
        ).alias("revenue_c")
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH all_nations AS (
      SELECT year(o.o_orderdate)::INT AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey   = l.l_partkey
      JOIN orders o   ON o.o_orderkey  = l.l_orderkey
      JOIN customer c ON c.c_custkey   = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey   = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    -- cent-scale sums (// 100) before the *1e4 multiply: same int64
    -- headroom hardening as tpch_q14_promo_revenue's numerator
    SELECT o_year,
           ((sum(CASE WHEN supp_nation = 'NATION_5'
                      THEN CAST(round(volume * 10000) AS BIGINT)
                      ELSE 0 END)::BIGINT // 100) * 10000
            // (sum(CAST(round(volume * 10000) AS BIGINT))::BIGINT // 100))
             AS mkt_share_e4
    FROM all_nations GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8: one nation's share of ECONOMY-part revenue among
    AMERICA-region customers, per order year — conditional-sum ratio.

    Scale: the part filter broadcasts onto lineitem first (20% of
    parts → 20% of lineitem survives before the orders shuffle). The
    ratio of two same-group sums is computed post-aggregation, one
    row per year.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
    )
    vol_i = F.round(vol * 10000).cast("long")
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        # exact e4 share: nation-sum ·1e4, one int64 div by the total;
        # both sums drop to cents (div 100) first for int64 headroom
        F.sum(
            F.when(F.col("supp_nation") == "NATION_5", vol_i).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("_nation"),
        F.sum(vol_i).alias("_total"),
    ).select(
        "o_year",
        F.expr(
            "(_nation div 100) * 10000 div (_total div 100)"
        ).alias("mkt_share_e4"),
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate)::INT AS o_year,
           (sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                            - 0.5 * p.p_retailprice * l.l_quantity)
                           * 10000) AS BIGINT))::BIGINT // 10000)
             AS sum_profit_whole
    FROM lineitem l
    JOIN part p     ON p.p_partkey  = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9: profit on widget-like parts per supplier nation and
    year. Adaptation: no ps_supplycost — cost is modeled as half the
    part's retail price per unit, preserving the
    revenue-minus-joined-cost expression shape.

    Scale: the p_name LIKE filter broadcasts onto lineitem (~13% of
    parts) before the orders shuffle; supplier/nation broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(F.round(amount * 10000).cast("long")).alias("profit_i"))
        # profit can be negative: `div` truncates toward zero in BOTH
        # engines (verified -7 div 2 == -7 // 2 == -3), so the forms match
        .select(
            "nation",
            "o_year",
            F.expr("profit_i div 10000").alias("sum_profit_whole"),
        )
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH value_per_part AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * l_quantity * 100)
                 AS BIGINT))::BIGINT AS part_c
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, part_c AS part_value_c
    FROM value_per_part
    WHERE part_c > (SELECT (sum(part_c)::BIGINT / count(*)) * 1.2
                    FROM value_per_part)
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose traded value stands above the
    corpus — group-by guarded by a global-scalar subquery.
    Adaptations: value is lineitem turnover, not partsupp stock value;
    the canonical fraction-of-total threshold (sum·0.0001) is
    SF-dependent (at 10× the parts, every part falls below it), so the
    cutoff is 1.2× the mean per-part value — same plan shape, non-empty
    at every SF.

    Scale: the threshold is a second pass over the SAME one-row-per
    -part aggregate (not the raw table), cross-joined as a broadcast
    scalar — no unpartitioned window, no second lineitem scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_quantity") * 100).cast(
                "long"
            )
        ).alias("part_c")
    )
    # threshold from exact integer cents: ONE long/long division (->
    # double) then one multiply, the same two ops the oracle runs
    total = per_part.agg(
        ((F.sum("part_c") / F.count("*")) * 1.2).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_c") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_c").alias("part_value_c"),
        )
    )


@query(
    "tpch_q12_shipping_lateness",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90 THEN 'LATE'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 30 THEN 'SLOW'
                ELSE 'ONTIME' END AS ship_bucket,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def tpch_q12_shipping_lateness(spark, sf_dir):
    """TPC-H Q12 shape: priority mix per shipping bucket. Adaptation:
    no l_shipmode — lines bucket by ship lag (days from order to
    shipment) instead, keeping the derived-group + dual conditional
    count pattern.

    Scale: one lineitem⋈orders shuffle; the year filter pushes into
    the lineitem scan; the 3-row aggregate is map-side partial.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag > 90, "LATE").when(lag > 30, "SLOW").otherwise("ONTIME")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of per-customer order counts — left
    outer join with an ON-clause filter (customers with zero matching
    orders must appear with count 0), then a second aggregation over
    the first. Adaptation: the o_comment NOT LIKE filter becomes a
    priority exclusion.

    Scale: outer join shuffles on custkey; the first aggregate reuses
    that partitioning (no second exchange until the tiny c_count
    regroup).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    -- ratio computed over cent-scale sums (exact 1e-4-unit sums // 100)
    -- so the *1e6 numerator keeps ~2 orders of int64 headroom beyond
    -- the largest swept SF (at 1e-4 units the sf0.1 month sum is
    -- 3.6e12 and *1e6 sits only 2.56x under int64 max)
    SELECT ((sum(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(round(l.l_extendedprice
                            * (1 - l.l_discount) * 10000) AS BIGINT)
                      ELSE 0 END)::BIGINT // 100) * 1000000
            // (sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 10000) AS BIGINT))::BIGINT // 100))
             AS promo_pct_e4
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promo-part revenue share for one month — a
    conditional-sum ratio over a broadcast part join.

    Scale: month filter pushes into the lineitem scan (~1.5% of
    rows); part broadcasts; the global ratio is one partial-agg row
    per partition.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            # e4 percent units: promo-sum ·1e6, one int64 div by the
            # total (== percent at 4 dp, with no float round to tie).
            # Both exact sums drop to cent scale (div 100) BEFORE the
            # ·1e6 multiply so the numerator keeps int64 headroom well
            # past the largest swept SF (see oracle comment).
            F.sum(
                F.when(
                    F.col("p_type") == "PROMO",
                    F.round(vol * 10000).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("_promo"),
            F.sum(F.round(vol * 10000).cast("long")).alias("_total"),
        )
        .select(
            F.expr(
                "(_promo div 100) * 1000000 div (_total div 100)"
            ).alias("promo_pct_e4")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                 AS BIGINT))::BIGINT AS rev_i
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           (r.rev_i // 10000) AS total_revenue_whole
    FROM supplier s JOIN revenue r ON r.l_suppkey = s.s_suppkey
    WHERE r.rev_i = (SELECT max(rev_i) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: the quarter's top-revenue supplier(s) — a derived
    view compared against its own max (keeps ties, unlike LIMIT 1).

    Scale: revenue is one row per supplier; the max re-aggregates
    that tiny relation and broadcasts back as a scalar. Revenue is an
    exact integer-unit sum, so the max-equality match is int64-exact.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            ).cast("long")
        ).alias("rev_i")
    )
    best = revenue.agg(F.max("rev_i").alias("best"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("rev_i") == F.col("best"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.expr("rev_i div 10000").alias("total_revenue_whole"),
        )
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type  <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 1000)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size)
    excluding a supplier denylist. Adaptations: the part-supplier
    relation is lineitem (no partsupp); the "complaints" comment
    filter becomes a low-balance filter.

    Scale: the denylist is a broadcast anti-join (s_suppkey is
    non-null, so NOT IN ≡ anti-join); the part filter broadcasts;
    count(DISTINCT) shuffles once on the 3-part group key.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH brand_lines AS (
      SELECT l.l_quantity, l.l_extendedprice,
             avg(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#23'
    )
    SELECT (sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT // 7)
             AS avg_yearly_c,
           count(*)::BIGINT AS n_small_lines
    FROM brand_lines WHERE l_quantity < 0.5 * avg_qty
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue from below-half-average-quantity lines of
    one brand. The canonical per-part correlated AVG subquery is a
    partition window — same row set (all lineitems of the part),
    one pass. Adaptation: no p_container, brand filter only.

    Determinism: l_quantity is integer-valued, so the windowed sum
    (hence avg) is IEEE-exact and the 0.5·avg comparison cannot flip
    between engines.

    Scale: brand filter broadcasts first (~3.5% of parts), the window
    shuffles only surviving lineitems on l_partkey.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).withColumn(
        "avg_qty", F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    )
    return (
        lines.filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            # exact cents-per-year: int64 cents sum div 7 — the float
            # (sum/100)/7 form ties at half-cents across engines
            F.expr(
                "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) div 7"
            ).alias("avg_yearly_c"),
            F.count("*").alias("n_small_lines"),
        )
    )


@query(
    "tpch_q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    """,
)
def tpch_q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 250 units, with
    their customers — HAVING-filtered aggregate joined back to the
    dimensions (the IN-subquery of the original, expressed as the
    join Catalyst would rewrite it to).

    Determinism: total_qty sums integer-valued doubles — exact, so
    the HAVING threshold is engine-stable unrounded.

    Scale: the aggregate shrinks lineitem to one row per order before
    any join; the orders join shuffles on orderkey, customer joins on
    custkey.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", _TS).alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle="""
    SELECT (sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                           * 10000) AS BIGINT))::BIGINT // 100)
             AS revenue_c,
           count(*)::BIGINT AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 20 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19: revenue under three disjunctive brand/size/quantity
    branches — the classic test that an OR across join-dependent
    predicates still plans as an equi-join with a residual filter,
    not a nested-loop. Adaptation: no p_container/l_shipmode legs.

    Scale: equi-join on partkey (part broadcasts), disjunction
    evaluates as the join residual; a derived brand-only filter
    (union of the three brands) is pushed to the part scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#15")
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.expr(
                """sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                           AS BIGINT)) div 100"""
            ).alias("revenue_c"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q20_excess_shipping",
    oracle="""
    WITH pair AS (
      SELECT l.l_suppkey,
             sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                      THEN l.l_quantity ELSE 0 END) AS qty96,
             sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                      THEN l.l_quantity ELSE 0 END) AS qty97
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
      GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM pair JOIN supplier s ON s.s_suppkey = pair.l_suppkey
    WHERE pair.qty96 > 2 * pair.qty97 AND pair.qty96 > 0
    """,
)
def tpch_q20_excess_shipping(spark, sf_dir):
    """TPC-H Q20 shape: suppliers holding excess stock of small parts.
    Adaptation: no ps_availqty — "excess" is a pair whose 1996
    shipments more than double its 1997 shipments. The canonical
    nested IN + correlated-sum subqueries collapse into ONE
    conditional-sum aggregate per (part, supplier) pair — same
    semantics, one pass instead of a per-row re-scan.

    Determinism: both sums are integer-valued — exact comparison.

    Scale: the small-parts filter is a broadcast semi-join before the
    pair aggregate; output is DISTINCT suppliers (≤ |supplier| rows).
    """
    sp = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    in96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    in97 = (
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    pair = (
        li.join(F.broadcast(sp), li.l_partkey == sp.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in96, F.col("l_quantity")).otherwise(0.0)).alias("qty96"),
            F.sum(F.when(in97, F.col("l_quantity")).otherwise(0.0)).alias("qty97"),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        pair.filter((F.col("qty96") > 2 * F.col("qty97")) & (F.col("qty96") > 0))
        .join(F.broadcast(s), pair.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH fl AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS is_late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
      FROM fl GROUP BY l_orderkey
    )
    SELECT s.s_name, count(DISTINCT fl.l_orderkey)::BIGINT AS numwait
    FROM fl
    JOIN per_order po ON po.l_orderkey = fl.l_orderkey
    JOIN supplier s  ON s.s_suppkey   = fl.l_suppkey
    WHERE fl.is_late AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21: suppliers who alone held up a multi-supplier
    finalized order. The canonical EXISTS (another supplier) AND NOT
    EXISTS (another LATE supplier) pair becomes one per-order
    aggregate — n_supp > 1 ≡ EXISTS, n_late = 1 (with this row late)
    ≡ NOT EXISTS another late. Adaptation: "late" is shipdate more
    than 60 days after orderdate (no receipt/commit dates).

    Scale: lineitem⋈orders shuffles once on orderkey; per_order and
    the final fl join REUSE that partitioning (AQE coalesces);
    supplier broadcasts; output is one row per supplier.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    fl = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("is_late"),
    )
    per_order = fl.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late"),
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        fl.filter(F.col("is_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), fl.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH active AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    SELECT (c.c_custkey % 5)::INT AS cntrycode,
           count(*)::BIGINT AS numcust,
           round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT))::BIGINT
                 / 100.0, 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT (sum(CAST(round(c_acctbal * 100) AS BIGINT))
                                 ::BIGINT / 100.0) / count(c_acctbal)
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM active a WHERE a.o_custkey = c.c_custkey)
    GROUP BY (c.c_custkey % 5)::INT
    """,
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22: well-funded customers with no recent orders, grouped
    by country code — scalar-AVG subquery + NOT EXISTS anti-join.
    Adaptations: no c_phone, the code is c_custkey mod 5; "never
    ordered" is empty here (every customer has orders), so the anti
    side is orders since 2000.

    Scale: the avg is a broadcast scalar; the anti-join build side is
    DISTINCT custkeys (pre-shrunk); group count is 5 rows.
    """
    c = load_table(spark, sf_dir, "customer")
    avg_pos = c.filter(F.col("c_acctbal") > 0).agg(
        (
            (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0)
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    active = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(active), c.c_custkey == active.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0,
                2,
            ).alias("totacctbal"),
        )
    )
