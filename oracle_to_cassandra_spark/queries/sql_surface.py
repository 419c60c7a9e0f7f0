"""Pure-SQL surface: the same engine driven entirely through
``spark.sql`` text (CTEs, GROUP BY ALL) — parity evidence that the SQL
entry point (the reference's ``sqlContext.sql``, README.md:781,931)
exposes the full operator set, and null-imputation (na.fill/na.drop).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table, register_views

_CTE_SQL = """
WITH seg_orders AS (
  SELECT c.c_mktsegment, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
seg_stats AS (
  SELECT c_mktsegment,
         count(*) AS n_orders,
         (sum(CAST(round(o_totalprice * 100) AS BIGINT))
          div count(o_totalprice)) AS avg_price_c
  FROM seg_orders GROUP BY c_mktsegment
)
SELECT * FROM seg_stats WHERE n_orders > 50
"""


@query(
    "cte_sql_text_pipeline",
    oracle="""
    WITH seg_orders AS (
      SELECT c.c_mktsegment, o.o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    seg_stats AS (
      SELECT c_mktsegment,
             count(*)::BIGINT AS n_orders,
             (sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
              // count(o_totalprice)) AS avg_price_c
      FROM seg_orders GROUP BY c_mktsegment
    )
    SELECT * FROM seg_stats WHERE n_orders > 50
    """,
)
def cte_sql_text_pipeline(spark, sf_dir):
    """Multi-CTE pipeline expressed as ONE SQL string through
    ``spark.sql`` — the text entry point produces the same Catalyst
    plan as the DataFrame API (E2 lifecycle, SURVEY.md §3)."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_CTE_SQL)


@query(
    "na_fill_drop_imputation",
    oracle="""
    SELECT c_custkey,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END,
                    0.0) AS bal_filled,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END IS NULL)::INT
             AS was_imputed
    FROM customer
    """,
)
def na_fill_drop_imputation(spark, sf_dir):
    """Null imputation via ``df.na.fill``: negative balances nulled
    (data-quality rule), then filled with a default, flagged — the
    DataFrameNaFunctions surface under an exact oracle."""
    c = load_table(spark, sf_dir, "customer")
    nulled = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.round("c_acctbal", 2))
        .alias("bal_filled"),
    ).withColumn("was_imputed", F.col("bal_filled").isNull().cast("int"))
    return nulled.na.fill({"bal_filled": 0.0})


@query(
    "unpivot_order_measures",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS measure,
           round(o_totalprice, 2) AS value
    FROM orders WHERE o_orderkey < 100
    UNION ALL
    SELECT o_orderkey, 'days_since_epoch',
           date_diff('day', DATE '1992-01-01', o_orderdate) * 1.0
    FROM orders WHERE o_orderkey < 100
    """,
)
def unpivot_order_measures(spark, sf_dir):
    """Wide→long reshaping via the DataFrame ``unpivot`` (melt) API —
    the inverse of the pivot queries: each order's measures become
    (key, measure-name, value) rows, the shape metric stores and ML
    feature tables ingest. Bounded to a key range so the oracle stays
    order-insensitive-comparable.

    Scale: unpivot is a row-local explode of column values — no
    shuffle, output rows = input rows × measures; the filter pushes
    to the scan."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
            ).cast("double").alias("days_since_epoch"),
        )
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "days_since_epoch"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "lateral_top2_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) o
    WHERE c.c_custkey < 20
    """,
)
def lateral_top2_orders_per_customer(spark, sf_dir):
    """Correlated LATERAL subquery — the SQL-surface twin of the
    per-group top-k window: for each customer its two largest orders,
    expressed as a per-row dependent subquery with ORDER BY + LIMIT
    (the form ORMs and hand-written report SQL actually use). Spark
    plans the correlation as a join + per-key limit, which is why
    this belongs in the surface inventory: users migrating such SQL
    need it to parse AND to plan sanely.

    Scale: Catalyst de-correlates into a ranked join over custkey —
    the same WindowGroupLimit shape as the window formulation, not
    N executions of the inner query."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               round(o.o_totalprice, 2) AS o_totalprice
        FROM customer_v c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_v
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) o
        WHERE c.c_custkey < 20
        """
    )


@query(
    "keyset_pagination_page3",
    oracle="""
    WITH ordered AS (
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od,
             round(o_totalprice, 2) AS o_totalprice,
             row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderkey, od AS o_orderdate, o_totalprice,
           (rn - 40)::BIGINT AS row_in_page
    FROM ordered WHERE rn > 40 AND rn <= 60
    """,
)
def keyset_pagination_page3(spark, sf_dir):
    """Keyset (seek-method) pagination: page 3 of the order book at
    page size 20 — fetched by SEEKING past the last key of page 2
    with a (o_orderdate, o_orderkey) > (anchor) predicate, never by
    OFFSET. OFFSET n scans-and-discards n rows on every page (O(n²)
    over a pagination session, and unstable under concurrent
    inserts); the keyset predicate pushes into the scan and reads
    only the page. The anchor is computed in-engine here (a real API
    stores the last key client-side); the oracle pins the same 20
    rows via the row_number formulation, proving the seek predicate
    selects EXACTLY the page.

    Scale: the anchor probe is a 40-row TakeOrdered; the page fetch
    is a pushed-down range predicate + 20-row TakeOrdered."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    # anchor = last key of page 2 (rows 1..40 in (date, key) order)
    anchor = (
        o.orderBy("o_orderdate", "o_orderkey")
        .limit(40)
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(1)
        .select(
            F.col("o_orderdate").alias("a_date"),
            F.col("o_orderkey").alias("a_key"),
        )
    )
    page = (
        o.crossJoin(F.broadcast(anchor))
        .filter(
            (F.col("o_orderdate") > F.col("a_date"))
            | (
                (F.col("o_orderdate") == F.col("a_date"))
                & (F.col("o_orderkey") > F.col("a_key"))
            )
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
    )
    from pyspark.sql import Window

    w = Window.orderBy("o_orderdate", "o_orderkey")
    return page.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("row_in_page"),
    )


@query(
    "parameterized_sql_query",
    oracle="""
    SELECT c_mktsegment, count(*)::BIGINT AS n_custs,
           (sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT
            // count(*)) AS avg_bal_c
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
    GROUP BY c_mktsegment
    """,
)
def parameterized_sql_query(spark, sf_dir):
    """Parameterized ``spark.sql`` with named markers (Spark 3.4+):
    the injection-safe SQL entry point — parameters bind as TYPED
    literals in the parser, never via string concatenation, which is
    what the reference's string-built ``sqlContext.sql`` calls
    (README.md:781) should become in any exposed service. Catalyst
    still constant-folds the bound literals, so pushdown/pruning are
    identical to inlined text."""
    register_views(spark, sf_dir, ("customer",))
    # integer-cents mean (exact int64 sum, one int64 div) — the
    # accumulation-order-proof compare form with no final float round
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_custs,
               (sum(CAST(round(c_acctbal * 100) AS BIGINT))
                div count(*)) AS avg_bal_c
        FROM customer
        WHERE c_mktsegment = :seg AND c_acctbal > :min_bal
        GROUP BY c_mktsegment
        """,
        args={"seg": "BUILDING", "min_bal": 1000.0},
    )


@query(
    "collation_ci_grouping",
    oracle="""
    SELECT lower(o_orderpriority) AS priority_ci,
           count(*)::BIGINT AS n_orders
    FROM (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN upper(o_orderpriority)
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders
    )
    GROUP BY 1
    """,
)
def collation_ci_grouping(spark, sf_dir):
    """String COLLATION (Spark 4): grouping under UTF8_LCASE compares
    case-insensitively in the JVM comparator itself — the engine-level
    answer to dirty categorical columns (the reference's Oracle
    extract would arrive with mixed-case codes after any manual CSV
    hop). The planted mixed-case column groups to the SAME buckets as
    the explicit lower() twin, proving collation-aware grouping
    matches normalize-then-group semantics; the output key is
    lower()ed on both sides because a collated group's REPRESENTATIVE
    string is arrival-order nondeterministic, while its identity is
    not.

    Scale: collation lives in the comparator — no extra projection,
    and the shuffle hash respects it, so the group-by plan is
    unchanged vs a binary-collated column."""
    o = load_table(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 3 == 0, F.upper("o_orderpriority")
        )
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority")
    )
    ci = o.select(
        F.collate(F.col("o_orderpriority"), "UTF8_LCASE").alias("pri_ci")
    )
    return ci.groupBy("pri_ci").agg(F.count("*").alias("n_orders")).select(
        # normalize the nondeterministic representative for the compare
        F.lower(F.col("pri_ci")).cast("string").alias("priority_ci"),
        "n_orders",
    )


@query(
    "hinted_shuffle_hash_join",
    oracle="""
    SELECT n.n_name, count(*)::BIGINT AS n_custs,
           round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT))::BIGINT
                 / 100.0, 2) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def hinted_shuffle_hash_join(spark, sf_dir):
    """Join-strategy HINTS: the explicit override lane for when the
    optimizer's size estimates are wrong (a common 100 TB reality —
    stale stats after a backfill). SHUFFLE_HASH forces a hash join
    without the sort phase of sort-merge — the right call when one
    side is modest but above the broadcast threshold; the plan-shape
    test pins ShuffledHashJoin so a silent fallback to SMJ (hint
    ignored) is caught, not assumed."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").hint("shuffle_hash")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0,
                2,
            ).alias("total_bal"),
        )
    )


_REACH_EDGES = """
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
"""


@query(
    "recursive_cte_trade_reachability",
    oracle=f"""
    WITH RECURSIVE edges AS ({_REACH_EDGES}),
    reach(node, hops) AS (
      SELECT 0, 0
      UNION ALL
      SELECT e.dst, r.hops + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.hops < 3
    )
    SELECT node AS nationkey, min(hops)::BIGINT AS min_hops,
           count(*)::BIGINT AS n_paths
    FROM reach GROUP BY node
    """,
)
def recursive_cte_trade_reachability(spark, sf_dir):
    """RECURSIVE CTE (Spark 4.0, SPARK-24497): breadth-bounded
    reachability over the nation trade graph from nation 0 — which
    nations its goods can reach within 3 shipping hops, with the
    shortest hop count and the path multiplicity. Recursion is the one
    relational shape the reference's SQL surface could never express
    (its Oracle source has CONNECT BY; Spark 4 closes that parity
    gap with the standard WITH RECURSIVE form, identical text in
    DuckDB).

    The hop bound is the termination guarantee on a CYCLIC graph —
    unbounded closure would diverge; production reachability either
    bounds depth (as here) or dedups per level (semi-naive
    evaluation, the connected-components operator's approach at
    `operators/graph.py`).

    Scale: each recursion level is one self-join against the
    edge list — the same per-round movement as the PageRank loop,
    planned by the engine instead of a Python driver loop. The edge
    DERIVATION (the 4-table lineitem join) is staged once behind a
    temp view before the recursion (r13, guide §2.4): referenced
    inline, the recursive evaluator re-executes the non-recursive
    CTE's subplan at every level, re-running the corpus-sized join
    per hop; staged, each level joins against the tiny materialized
    nation-to-nation edge list."""
    from oracle_to_cassandra_spark.sources import register_views
    from oracle_to_cassandra_spark.staging import stage

    register_views(
        spark, sf_dir, ("lineitem", "orders", "customer", "supplier")
    )
    edges = stage(spark.sql(_REACH_EDGES))
    edges.createOrReplaceTempView("reach_edges_staged")
    return spark.sql(
        """
        WITH RECURSIVE reach(node, hops) AS (
          SELECT 0, 0
          UNION ALL
          SELECT e.dst, r.hops + 1
          FROM reach r JOIN reach_edges_staged e ON e.src = r.node
          WHERE r.hops < 3
        )
        SELECT node AS nationkey, CAST(min(hops) AS BIGINT) AS min_hops,
               count(*) AS n_paths
        FROM reach GROUP BY node
        """
    )


@query(
    "listagg_ordered_rollup",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_custkey)
             FILTER (c_acctbal > 9000) AS top_names,
           count(*) FILTER (c_acctbal > 9000)::BIGINT AS n_top
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def listagg_ordered_rollup(spark, sf_dir):
    """LISTAGG (SQL:2023, Spark 4) — deterministic ordered string
    aggregation WITHIN GROUP: per segment, the names of
    high-balance customers concatenated in explicit (balance DESC,
    key) order. The WITHIN GROUP ordering is the point — an unordered
    collect produces arrival-order strings that differ per
    partitioning and rerun; listagg's result is a FUNCTION of the
    data alone, which is what makes a concatenated column hashable,
    diffable, and safe to store. DuckDB's ordered string_agg is the
    literal twin.

    Scale: sort-based aggregation per group; the filter prunes before
    any string concatenation buffers."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.expr(
            "listagg(CASE WHEN c_acctbal > 9000 THEN c_name END, ',') "
            "WITHIN GROUP (ORDER BY c_acctbal DESC, c_custkey)"
        ).alias("top_names"),
        F.sum(F.when(F.col("c_acctbal") > 9000, 1).otherwise(0)).alias(
            "n_top"
        ),
    )
