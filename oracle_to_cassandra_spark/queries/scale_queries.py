"""Scale-technique operators as driver-checkable queries: the two
manual levers SURVEY.md §4 reserves for 100 TB — bucketed co-located
joins and salted skew aggregation — each proving its RESULT is
identical to the naive form (the technique changes the physical plan,
never the answer).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oracle_to_cassandra_spark import scratch
from oracle_to_cassandra_spark.operators.scale import write_bucketed_table
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.staging import stage
from oracle_to_cassandra_spark.sources import load_table

#: sf_dirs whose bucketed tables were already built this session —
#: the build is the ONE-TIME write-side cost; the query below is the
#: repeatable probe. Keeping them separate means the bench (min of
#:  two passes) times the join, not the table write.
_BUCKETED_BUILT: set[str] = set()


def _bucketed_names(sf_dir: str) -> tuple[str, str]:
    sf = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_") or "default"
    return (
        scratch.session_table(f"orders_bkt_{sf}"),
        scratch.session_table(f"customer_bkt_{sf}"),
    )


def _ensure_bucketed_tables(spark, sf_dir: str, n_buckets: int = 8) -> tuple[str, str]:
    """Idempotent build step: persist orders/customer bucketed on the
    join key, once per (session, sf_dir) — the sf name is part of the
    table identity, so a session that probes several SFs never reads a
    stale build. Session-token names + paths make concurrent sessions
    collision-free (no DROP of shared state)."""
    orders_t, cust_t = _bucketed_names(sf_dir)
    if sf_dir in _BUCKETED_BUILT:
        return orders_t, cust_t
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    spark.sql(f"DROP TABLE IF EXISTS {orders_t}")
    spark.sql(f"DROP TABLE IF EXISTS {cust_t}")
    write_bucketed_table(
        orders.withColumnRenamed("o_custkey", "bkey"),
        orders_t,
        "bkey",
        n_buckets,
        path=scratch.session_path(orders_t),
    )
    write_bucketed_table(
        cust.withColumnRenamed("c_custkey", "bkey"),
        cust_t,
        "bkey",
        n_buckets,
        path=scratch.session_path(cust_t),
    )
    _BUCKETED_BUILT.add(sf_dir)
    return orders_t, cust_t


@query(
    "bucketed_join_orders_customers",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name,
           round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def bucketed_join_orders_customers(spark, sf_dir):
    """Co-located join via bucketing: both tables are persisted
    bucketed (hash-partitioned + sorted) on the join key, and the join
    plans as SortMergeJoin with ZERO Exchange on either side —
    Spark's analog of Cassandra token-range co-location
    (`/root/reference/README.md:668` keyspace locality). At 100 TB
    this converts the nightly fact⋈dim shuffle into a local merge per
    bucket; the write-side bucketing cost is paid once, not per query.

    The oracle is the plain join — bucketing must not change the
    answer, only the plan (asserted in tests/test_plan_shape.py).
    Build and probe are SPLIT: ``_ensure_bucketed_tables`` pays the
    write-side cost once per session; this function is only the join,
    so repeat runs (and the bench's min-of-two) measure the probe."""
    orders_t, cust_t = _ensure_bucketed_tables(spark, sf_dir)
    joined = spark.table(orders_t).join(spark.table(cust_t), "bkey")
    return joined.select(
        "o_orderkey",
        F.col("bkey").alias("o_custkey"),
        "c_name",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@query(
    "salted_skew_aggregate",
    oracle="""
    SELECT o_orderstatus,
           count(*)::BIGINT           AS n_orders,
           (sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT // 100)
             AS total_price_whole
    FROM orders GROUP BY o_orderstatus
    """,
)
def salted_skew_aggregate(spark, sf_dir):
    """Skewed-key aggregation by salting: o_orderstatus has 3 values
    ('O' and 'F' each hold ~half the table — a textbook hot key), so a
    direct groupBy sends half the rows to one reducer. Two-stage form:
    stage 1 groups on (key, salt) — 16-way spread of each hot key,
    map-side combine still applies — stage 2 re-aggregates the 3×16
    partials. Counts and sums re-aggregate losslessly, so the result
    is bit-identical to the direct groupBy (the oracle).

    AQE cannot split a skewed AGGREGATION (only skewed join sides);
    explicit salting is the remaining lever at 100 TB. The salt is
    derived from o_orderkey, not random — reruns are deterministic."""
    o = load_table(spark, sf_dir, "orders")
    n_salt = 16
    stage1 = (
        o.withColumn("_salt", F.pmod(F.col("o_orderkey"), F.lit(n_salt)))
        .groupBy("o_orderstatus", "_salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "ps_c"
            ),
        )
    )
    return stage1.groupBy("o_orderstatus").agg(
        F.sum("pn").alias("n_orders"),
        # integer whole-dollar units (cents div 100): a 0-dp round of
        # cents/100.0 ties at the half-dollar across engines
        F.expr("sum(ps_c) div 100").alias("total_price_whole"),
    )


def _bloom_join_plan(spark, sf_dir):
    """The lazily-planned join the runtime bloom filter targets:
    lineitem (fact, shuffle side) ⋈ selectively-filtered orders.
    Planned under confs the caller sets; split out so the plan test
    can assert injection on the UN-materialized plan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                / 100.0,
                2,
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


_BLOOM_CONFS = {
    # at 100 TB the fact-side scan exceeds the 10 GiB default and the
    # filter injects on its own; locally the thresholds are forced so
    # the plan under test IS the at-scale plan
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # broadcast would bypass the bloom path entirely (a broadcast join
    # already prunes map-side); the technique matters exactly when the
    # dim side is too big to broadcast, which -1 simulates
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@query(
    "runtime_bloom_filtered_join",
    oracle="""
    SELECT l.l_returnflag, count(*)::BIGINT AS n_items,
           round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT
                 / 100.0, 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def runtime_bloom_filtered_join(spark, sf_dir):
    """Runtime bloom-filter join pruning: Catalyst's InjectRuntimeFilter
    builds a bloom filter from the FILTERED dim side (urgent orders)
    and applies ``might_contain`` to the fact side BEFORE its shuffle —
    at 100 TB the ~75% of lineitem rows whose order is not urgent are
    dropped at the scan instead of being shuffled for the sort-merge
    join. The technique is declarative (a conf, not a rewrite): the
    result is proven identical to the naive join by the oracle.

    The confs are scoped to the eager materialization and restored
    before returning — leaving autoBroadcastJoinThreshold=-1 set would
    silently degrade every later plan in the session (and the bench).
    The returned frame is the staged copy (``staging.stage``) of the tiny (3-row)
    aggregate; tests/test_plan_shape.py asserts might_contain on the
    pre-materialization plan."""
    prev = {k: spark.conf.get(k) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        return stage(_bloom_join_plan(spark, sf_dir), eager=True)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


@query(
    "quantile_cutpoint_bucketing",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS cs FROM orders
    )
    SELECT (1 + len(list_filter(c.cs, x -> x < o.o_totalprice)))::BIGINT AS bucket,
           count(*)::BIGINT AS n_orders,
           round(min(o.o_totalprice), 2) AS lo,
           round(max(o.o_totalprice), 2) AS hi
    FROM orders o CROSS JOIN cuts c
    GROUP BY 1 ORDER BY bucket
    """,
)
def quantile_cutpoint_bucketing(spark, sf_dir):
    """The scale-safe alternative to a global ntile window (the trap
    ntile_quartiles documents): compute the quartile CUTPOINTS once
    (an aggregate — map-side partials, no row buffering), broadcast
    the 3-element array, and bucket each row map-side by counting
    cutpoints below it. The corpus is never globally sorted and never
    funnels through one task; per-bucket stats verify the assignment.

    Exact `percentile` keeps the oracle deterministic (Spark's linear
    interpolation matches DuckDB quantile_cont bit-for-bit here); at
    100 TB swap in approx_percentile(..., accuracy) — same plan shape,
    sketch-mergeable, with bucket-boundary tolerance instead of
    equality."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    cuts = o.agg(
        F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").alias("cs")
    )
    v = F.col("o_totalprice")
    bucket = (
        1 + F.size(F.filter("cs", lambda x: x < v))
    ).cast("long").alias("bucket")
    return (
        o.crossJoin(F.broadcast(cuts))
        .select(bucket, v)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min(v), 2).alias("lo"),
            F.round(F.max(v), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "skew_diagnostics_orders_custkey",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, count(*)::BIGINT AS c FROM orders GROUP BY o_custkey
    )
    SELECT count(*)::BIGINT AS n_keys,
           max(c) AS max_per_key,
           (sum(c) * 1000000 // count(*))::BIGINT AS avg_per_key_e6,
           round(quantile_cont(c, 0.5), 6) AS p50,
           round(quantile_cont(c, 0.99), 6) AS p99,
           (max(c) * 1000000000 // sum(c))::BIGINT AS top1_share_e9
    FROM per_key
    """,
)
def skew_diagnostics_orders_custkey(spark, sf_dir):
    """Pre-join skew audit on a join key: per-key row counts reduced
    to the distribution stats (max, p50/p99, heaviest key's share of
    all rows) that decide whether the downstream join needs salting,
    AQE skew splitting, or nothing. Run this BEFORE burning a cluster
    on a skewed shuffle — it is the cheap probe behind the salting
    factor chosen in salted_skew_aggregate.

    Scale: first aggregation is map-side combined so the shuffle
    carries one row per distinct key; the second collapses key counts
    (already small) to a single stats row. Nothing is collected until
    the final 1-row result. Exact percentiles over the key-count
    table are fine at any corpus scale — the table is |keys|-sized,
    not |rows|-sized; if even that is too wide, swap approx_percentile
    (same plan shape, mergeable sketch)."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    per_key = o.groupBy("o_custkey").agg(F.count("*").alias("c"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.max("c").alias("max_per_key"),
        # exact integer e6/e9 ratios (int64 div; max·1e9 stays inside
        # int64 up to ~9e9 rows on the heaviest key). The interpolated
        # percentiles keep their rounds: quantile interpolation of
        # integer counts lands ON the 6-dp grid (denominators divide
        # 1e6), so no tie exists
        F.expr("sum(c) * 1000000 div count(*)").alias("avg_per_key_e6"),
        F.round(F.expr("percentile(c, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(c, 0.99)"), 6).alias("p99"),
        F.expr("max(c) * 1000000000 div sum(c)").alias("top1_share_e9"),
    )


#: compaction target: characters per output bin (the small-files
#: knob; in production this is bytes per output file, e.g. 512 MB)
COMPACT_TARGET_CHARS = 4000


@query(
    "compaction_bin_packing",
    oracle=f"""
    WITH placed AS (
      SELECT source, n_chars,
             (sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_chars)
               // {COMPACT_TARGET_CHARS} AS bin
      FROM documents
    )
    SELECT source, bin::BIGINT AS bin,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars
    FROM placed GROUP BY source, bin
    """,
)
def compaction_bin_packing(spark, sf_dir):
    """Small-files compaction planner: assign each document to an
    output bin by running-size within its source partition — bin =
    floor(preceding cumulative size / target) — then report per-bin
    doc counts and sizes. This is the planning half of the nightly
    compaction job that rewrites a day's millions of tiny files into
    ~target-sized ones; the execution half is a repartition on
    (source, bin) followed by a partitioned write.

    Scale: ONE window, partitioned by source and ordered by doc_id —
    per-source sequential packing is exactly what a per-prefix
    compactor wants, and no global order exists anywhere (the trap
    ntile_quartiles documents). Deterministic: doc_id is a total
    order within source, so bin assignment is reproducible run to
    run — a compaction plan you can diff before executing."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = d.select(
        "source",
        "n_chars",
        F.floor(
            (F.sum("n_chars").over(w) - F.col("n_chars")) / COMPACT_TARGET_CHARS
        ).alias("bin"),
    )
    return placed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "salt_balance_audit",
    oracle="""
    WITH salted AS (
      SELECT o_orderstatus, o_orderkey % 16 AS salt,
             count(*)::BIGINT AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus,
           count(*)::BIGINT AS n_salts,
           sum(n)::BIGINT AS n_rows,
           min(n)::BIGINT AS min_salt_rows,
           max(n)::BIGINT AS max_salt_rows,
           ((max(n) - min(n)) * 1000000 // greatest(max(n), 1))::BIGINT
             AS imbalance_ppm
    FROM salted GROUP BY o_orderstatus
    """,
)
def salt_balance_audit(spark, sf_dir):
    """The measurement behind `salted_skew_aggregate`'s claim: per hot
    key, how evenly the 16-way salt actually spreads its rows —
    min/max rows per (key, salt) cell and the relative imbalance in
    ppm. A salt derived from a SKEWED column (user error: salting on
    a correlated value) shows up here as a high imbalance before it
    shows up as one straggler task in a 1000-executor stage; near-zero
    imbalance certifies the salt column is independent of the key.

    Scale: this audit is exactly the stage-1 aggregate of the salted
    plan itself (map-side combined, one row per key×salt) plus a
    key-sized re-aggregate — it costs what the real job's first stage
    costs and can piggyback on it."""
    o = load_table(spark, sf_dir, "orders")
    salted = o.groupBy(
        "o_orderstatus", (F.col("o_orderkey") % 16).alias("salt")
    ).agg(F.count("*").alias("n"))
    return salted.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_salts"),
        F.sum("n").alias("n_rows"),
        F.min("n").alias("min_salt_rows"),
        F.max("n").alias("max_salt_rows"),
        F.floor(
            (F.max("n") - F.min("n"))
            * 1000000
            / F.greatest(F.max("n"), F.lit(1))
        )
        .cast("long")
        .alias("imbalance_ppm"),
    )
