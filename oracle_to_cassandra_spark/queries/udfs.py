"""Pandas-UDF queries — Python stages with exact SQL twins, so the
Arrow path itself is under the driver's hash check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.operators.udfs import log_price_score, zscore_per_group
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "pandas_udf_scalar_score",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(ln(l_extendedprice + 1) * sqrt(l_quantity), 6) AS score
    FROM lineitem
    """,
)
def pandas_udf_scalar_score(spark, sf_dir):
    """Scalar pandas UDF (Arrow-vectorized numpy) vs the same formula
    in SQL — verifies the Python batch path bit-for-bit (both sides
    compute in IEEE double; round 6)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(log_price_score(F.col("l_extendedprice"), F.col("l_quantity")), 6).alias(
            "score"
        ),
    )


@query(
    "grouped_map_zscore",
    oracle="""
    SELECT c_mktsegment, c_acctbal,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 6)
             AS zscore
    FROM customer
    """,
)
def grouped_map_zscore(spark, sf_dir):
    """applyInPandas grouped-map z-score vs the window-function twin —
    the custom-per-group-algorithm template under an exact check."""
    return zscore_per_group(
        load_table(spark, sf_dir, "customer"), "c_mktsegment", "c_acctbal"
    )


@query(
    "udtf_chunk_documents",
    oracle="""
    SELECT doc_id, s.i::INT AS chunk_idx,
           array_to_string(t[s.i * 50 + 1 : s.i * 50 + 50], ' ') AS chunk_text
    FROM (
      SELECT doc_id, t,
             unnest(list_transform(range(0, greatest((len(t) + 49) // 50, 1)),
                                   i -> struct_pack(i := i))) AS s
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
    )
    """,
)
def udtf_chunk_documents(spark, sf_dir):
    """Python UDTF (Spark 4 user-defined TABLE function, Arrow path):
    split each document into 50-token training chunks via LATERAL —
    the sequence-chunking primitive of an LLM data pipeline, expressed
    as a table function so one input row yields many output rows with
    imperative chunking logic.

    The DuckDB twin chunks by list slicing — equality puts the whole
    UDTF execution path (Arrow batches, lateral join, Python iterator
    protocol) under the hash check. Scale: the UDTF is a per-row map —
    embarrassingly parallel, no shuffle; chunk explosion multiplies
    rows ~(tokens/50)× which is why it runs AFTER curation filters in
    a real pipeline."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, chunk_idx int, chunk_text string",
        useArrow=True,
    )
    class ChunkDocs:
        def eval(self, doc_id, text):
            # the pinned fold (operators/text.py fold_text_py),
            # inlined: the UDTF body ships to Python workers where
            # the repo package may not be importable
            toks = (
                text.replace("İ", "i").replace("Σ", "σ").lower().split(" ")
            )
            for i in range(0, len(toks), 50):
                yield doc_id, i // 50, " ".join(toks[i : i + 50])

    spark.udtf.register("chunk_docs", ChunkDocs)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk_text
        FROM udtf_docs_v d, LATERAL chunk_docs(d.doc_id, d.text) c
        """
    )


@query(
    "map_in_arrow_token_stats",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           len(string_split(text, ' '))::BIGINT AS n_ws_tokens
    FROM documents
    """,
)
def map_in_arrow_token_stats(spark, sf_dir):
    """``mapInArrow``: the zero-copy end of the Python surface — the
    UDF receives raw ``pyarrow.RecordBatch``es and answers with
    batches, no pandas materialization at all. The right tier when
    the Python side is itself Arrow-native (tokenizers, parquet
    re-writers, Arrow-IPC shippers): pandas conversion would only add
    a copy. Here each batch's text column is byte- and token-counted
    with pyarrow compute kernels.

    Completes the Python tiering alongside pandas_udf (scalar),
    applyInPandas (grouped), mapInPandas (stream-of-frames), and the
    row-UDTF — every tier under the same exact SQL twin discipline."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def batch_stats(batches):
        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
                    ),
                ],
                ["doc_id", "n_bytes", "n_ws_tokens"],
            )

    return d.mapInArrow(
        batch_stats, "doc_id long, n_bytes long, n_ws_tokens long"
    )


_COGROUP_BUCKETS = 64


@query(
    "cogrouped_order_reconciliation",
    oracle="""
    SELECT o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_total_cents,
           coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)),
                    0)::BIGINT AS lines_total_cents,
           count(l.l_orderkey)::BIGINT AS n_lines
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 5 = 0
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
)
def cogrouped_order_reconciliation(spark, sf_dir):
    """``cogroup(...).applyInPandas`` — the LAST tier of the Python
    surface: both sides of a key are delivered to Python ALIGNED (one
    pandas frame per side per key group), the escape hatch for
    per-key logic that needs simultaneous access to two tables
    (sequence alignment, per-entity model fitting, custom as-of
    semantics). The demonstrator is deliberately SQL-checkable:
    per order, the header total vs the sum of its line items in
    integer cents — so the exact LEFT JOIN twin certifies that
    cogroup delivered every key exactly once with ALL rows of both
    sides (headers with zero lines included).

    The cogroup key is a BUCKET (orderkey % 64), not the raw order
    key: applyInPandas pays a fixed Python invocation per KEY GROUP,
    so cogrouping 30k individual orders costs 30k tiny pandas calls
    (measured 33 s at sf0.1 — 20× the whole-join cost), while 64
    bucket groups amortize that to 64 calls with the per-order
    logic VECTORIZED inside each (0.9 s). Same shuffle movement, same
    alignment guarantee — the bucket width is the knob that trades
    per-call overhead against per-call memory, sized so a bucket's
    rows fit an Arrow batch.

    Scale: both sides shuffle once on the bucket — identical movement
    to the equivalent join; order keys stay together because bucket =
    f(orderkey). The % 5 key filter is pushed below the cogroup into
    both scans."""
    import numpy as np
    import pandas as pd

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("o_orderkey") % _COGROUP_BUCKETS).alias("bucket"),
        )
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select(
            "l_orderkey",
            "l_extendedprice",
            (F.col("l_orderkey") % _COGROUP_BUCKETS).alias("bucket"),
        )
    )

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:  # line items without a header: not this audit's row
            return pd.DataFrame(
                columns=[
                    "o_orderkey", "o_total_cents", "lines_total_cents", "n_lines"
                ]
            )
        # floor(x*100 + 0.5), NOT .round()/round(): numpy and Python
        # round half-to-EVEN while Spark/DuckDB round half AWAY from
        # zero — for positive prices floor(+0.5) matches the engines
        lines = pd.DataFrame(
            {
                "o_orderkey": right["l_orderkey"],
                "cents": np.floor(
                    right["l_extendedprice"].to_numpy() * 100 + 0.5
                ).astype("int64"),
            }
        )
        per_order = (
            lines.groupby("o_orderkey")
            .agg(lines_total_cents=("cents", "sum"), n_lines=("cents", "size"))
            .reset_index()
        )
        # the left-merge below would upcast these int64 columns to
        # float64 (NaN for orders with no lines), silently rounding
        # any total past 2^53 BEFORE the fillna — the same hazard
        # class as the r11 stateful-sum fix (streaming/stateful.py
        # _int_sum). Nullable Int64 survives the merge exactly.
        per_order["lines_total_cents"] = per_order["lines_total_cents"].astype(
            "Int64"
        )
        per_order["n_lines"] = per_order["n_lines"].astype("Int64")
        out = pd.DataFrame(
            {
                "o_orderkey": left["o_orderkey"].astype("int64"),
                "o_total_cents": np.floor(
                    left["o_totalprice"].to_numpy() * 100 + 0.5
                ).astype("int64"),
            }
        ).merge(per_order, on="o_orderkey", how="left")
        out["lines_total_cents"] = (
            out["lines_total_cents"].fillna(0).astype("int64")
        )
        out["n_lines"] = out["n_lines"].fillna(0).astype("int64")
        return out

    return (
        o.groupBy("bucket")
        .cogroup(l.groupBy("bucket"))
        .applyInPandas(
            reconcile,
            schema="o_orderkey long, o_total_cents long, "
            "lines_total_cents long, n_lines long",
        )
    )


@query(
    "arrow_udf_embedding_l1_norm",
    oracle="""
    SELECT vec_id,
           list_sum(list_transform(embedding::DOUBLE[],
                                   v -> abs(CAST(round(v * 1000000) AS BIGINT))
                    ))::BIGINT AS l1_micro
    FROM embeddings
    """,
)
def arrow_udf_embedding_l1_norm(spark, sf_dir):
    """``arrow_udf`` (Spark 4) — the Arrow-NATIVE scalar UDF tier: the
    function receives ``pyarrow.Array`` columns directly (here a
    ListArray of floats) and answers with an Array, skipping the
    pandas materialization ``pandas_udf`` pays. The body flattens the
    list column ONCE (zero-copy offsets + values view), rounds to
    integer micro-units, and re-aggregates per list with
    numpy ``add.reduceat`` over the offsets — no per-row Python.

    The JVM twin (`functions/vector.py` does this with
    ``aggregate``/``transform``) is the preferred path; this query
    certifies the Arrow tier gives bit-identical integers for when a
    kernel genuinely needs Python (a tokenizer, a codec).

    Scale: same Arrow-batch economics as mapInArrow — vectorized
    compute per batch, batch size bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    # the module's `from __future__ import annotations` stringifies
    # hints, which arrow_udf's eval-type inference can't resolve —
    # attach REAL type objects to the function instead
    def _l1_micro(emb):
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False)
        # abs BEFORE rounding: floor(x+0.5) is half-UP, which equals
        # the engines' half-away-from-zero only for non-negative x;
        # |round(v)| == round(|v|) because away-from-zero is symmetric
        micro = np.floor(np.abs(flat) * 1000000 + 0.5).astype(np.int64)
        # lengths via compute (slice-safe), not raw offsets
        lengths = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        sums = np.add.reduceat(np.concatenate((micro, [0])), starts)[
            : len(lengths)
        ]
        sums = np.where(lengths == 0, 0, sums)  # reduceat empty-slice quirk
        return pa.array(sums, type=pa.int64())

    _l1_micro.__annotations__ = {"emb": pa.Array, "return": pa.Array}
    l1_micro = arrow_udf(_l1_micro, "long")

    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        l1_micro(F.col("embedding").cast("array<double>")).alias("l1_micro"),
    )
