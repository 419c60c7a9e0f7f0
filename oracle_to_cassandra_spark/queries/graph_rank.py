"""Weighted PageRank over the nation-level trade graph — the second
iterative graph operator next to connected components
(`operators/graph.py`), demonstrating the declarative-loop pattern on
a DIFFERENT recurrence (weighted matrix-vector product per round
rather than min-label contraction).

Graph: one edge supplier-nation → customer-nation per shipping
relationship, weighted by line-item count (the TPC-H Q7 join shape
collapsed to nation granularity). PageRank over it answers "which
nation is the gravitational center of the trade network" — the same
centrality a corpus pipeline runs over citation/link graphs to score
source authority (the classic crawl-prioritization signal).

Cross-engine exactness: the entire recurrence is INTEGER arithmetic —
ranks live in 10⁻⁹ units of probability mass (S = 10⁹), every
per-edge contribution is ``r·w // W`` (int64-safe: r ≤ S and Σw per
node < 10⁹ keeps the product under 2⁶³ through petabyte-scale edge
counts), damping 0.85 is applied as ``(85·x) // 100``. Both engines
run the identical floor-division recurrence, so the driver hash
compare works on raw rank integers with no float tolerance anywhere.

Scale: the edge list aggregates once from the fact join (staged — it
feeds every iteration); each iteration joins the 25-row rank vector
(broadcast) to the edges and re-aggregates per destination — the
standard distributed PageRank round, where edges shuffle ONCE at
build and only the rank vector moves per iteration. Dangling nodes (no
outgoing edges — at small SFs most nations have customers but no
suppliers) spray their whole rank uniformly over the node set, as one
extra broadcast scalar per round; without it ~60% of total mass
bleeds away in 3 rounds (measured on the sf0.001 fixture).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table
from oracle_to_cassandra_spark.staging import stage

PR_SCALE = 1_000_000_000
PR_ITERATIONS = 3
_D_NUM, _D_DEN = 85, 100  # damping 0.85 as exact integers

_EDGES_SQL = """
    edges AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             count(*)::BIGINT AS w
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, sum(w)::BIGINT AS w_out FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges)
"""


def _round_sql(k: int) -> str:
    return f"""
    dang{k} AS (
      SELECT coalesce(sum(r.pr), 0)::BIGINT AS dmass
      FROM r{k - 1} r LEFT JOIN outw o ON o.src = r.node
      WHERE o.src IS NULL
    ),
    r{k} AS (
      SELECT n.node,
             ({(100 - _D_NUM) * PR_SCALE} // {_D_DEN})
               // (SELECT count(*) FROM nodes)
             + ({_D_NUM} * (coalesce(m.mass, 0)
                            + (SELECT dmass FROM dang{k})
                              // (SELECT count(*) FROM nodes)))
               // {_D_DEN} AS pr
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum((r.pr * e.w) // o.w_out)::BIGINT AS mass
        FROM edges e
        JOIN r{k - 1} r ON r.node = e.src
        JOIN outw o     ON o.src = e.src
        GROUP BY e.dst
      ) m ON m.node = n.node
    )"""


_PR_SQL = (
    "WITH "
    + _EDGES_SQL
    + f""",
    r0 AS (SELECT node,
                  {PR_SCALE} // (SELECT count(*) FROM nodes) AS pr
           FROM nodes),
    """
    + ",\n    ".join(_round_sql(k) for k in range(1, PR_ITERATIONS + 1))
    + f"""
    SELECT node AS nationkey, pr::BIGINT AS pagerank_nano
    FROM r{PR_ITERATIONS}
    """
)


@query("trade_graph_pagerank", oracle=_PR_SQL)
def trade_graph_pagerank(spark, sf_dir):
    """3-round weighted PageRank over the supplier-nation →
    customer-nation trade graph; see the module docstring for the
    integer recurrence and the 100 TB movement analysis."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = stage(
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # the node count and teleport mass are scalars of a 25-row table;
    # carry them as a broadcast 1-row frame, not a driver constant
    n_nodes = nodes.agg(F.count("*").alias("n_nodes"))
    # `div` is Spark's INTEGRAL division (long div long -> long) — the
    # exact twin of DuckDB's `//`.  A `/` here would cast both sides to
    # double and round once pr*w exceeds 2^53 (~sf1000 edge counts),
    # silently diverging from the oracle's int64 recurrence.
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.expr(f"{PR_SCALE}L div n_nodes").alias("pr")
    )
    weighted = edges.join(outw, "src")
    for _ in range(PR_ITERATIONS):
        mass = (
            weighted.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("(pr * w) div w_out")).alias("mass"))
        )
        # dangling nodes (no outgoing edges) spray their whole rank
        # uniformly — dropping it instead bleeds ~60% of total mass in
        # 3 rounds when only part of the node set has out-edges (the
        # sf0.001 fixture has 10 supplier nations vs 25 nodes)
        dangling = (
            ranks.join(
                outw.select(F.col("src").alias("node")), "node", "left_anti"
            )
            .agg(F.coalesce(F.sum("pr"), F.lit(0)).alias("dmass"))
        )
        teleport = F.expr(
            f"({(100 - _D_NUM) * PR_SCALE}L div {_D_DEN}L) div n_nodes"
        )
        ranks = (
            nodes.join(mass, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    teleport
                    + F.expr(
                        f"({_D_NUM}L * (coalesce(mass, 0L) + dmass div n_nodes))"
                        f" div {_D_DEN}L"
                    )
                ).alias("pr"),
            )
        )
        # each iteration reads `ranks` TWICE (mass join + dangling
        # anti-join), so an unstaged rank vector doubles the plan per
        # round — 80 exchanges by iteration 3. Stage the 25-row vector
        # (the iterative-state handoff, as in operators/graph.py) so
        # every round starts from a materialized leaf: 6 exchanges
        # total and per-round cost independent of round number.
        # LAZY (r13): the iteration count is FIXED — no driver
        # decision between rounds — so the stage can materialize
        # inside the single consuming job instead of launching one
        # job per round (each round's RDD is still computed exactly
        # once: both consumers share the RDD identity). Measured
        # 1.83 → 1.33 s at sf0.1; CC keeps its eager rounds because
        # its convergence probe IS a per-round driver decision.
        ranks = stage(ranks)
    return ranks.select(
        F.col("node").alias("nationkey"), F.col("pr").alias("pagerank_nano")
    )
