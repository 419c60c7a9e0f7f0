"""Scalar-function surface: string / date / math / JSON / conditional /
array (SURVEY.md §2.6 — absent in the reference, required by the
extension surface; the reference's only scalar transform is the rename
P4 and the implicit timestamp→text cast at README.md:691,839).

All expressions are JVM built-ins inside whole-stage codegen — no
Python UDFs on these paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table


@query(
    "string_functions_part",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                    AS brand_upper,
           lower(p_type)                     AS type_lower,
           substr(p_name, 1, 8)              AS name_prefix,
           length(p_name)::INT               AS name_len,
           concat(p_brand, '|', p_type)      AS brand_type,
           replace(p_name, ' ', '_')         AS name_snake,
           trim(p_name)                      AS name_trim,
           reverse(p_brand)                  AS brand_rev
    FROM part
    """,
)
def string_functions_part(spark, sf_dir):
    """String surface: case, substring, length, concat, replace, trim,
    reverse."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim("p_name").alias("name_trim"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@query(
    "like_in_between_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_size
    FROM part
    WHERE p_name LIKE '%gold%'
       OR (p_size BETWEEN 10 AND 20 AND p_brand IN ('Brand#1', 'Brand#2'))
    """,
)
def like_in_between_predicates(spark, sf_dir):
    """Predicate surface beyond equality: LIKE / IN / BETWEEN /
    compound booleans (none appear in the reference — SURVEY.md §2.2
    notes the gap)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%gold%")
        | (
            F.col("p_size").between(10, 20)
            & F.col("p_brand").isin("Brand#1", "Brand#2")
        )
    ).select("p_partkey", "p_name", "p_size")


@query(
    "date_functions_orders",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)::INT                                    AS order_year,
           month(o_orderdate)::INT                                   AS order_month,
           day(o_orderdate)::INT                                     AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')    AS month_start,
           datediff('day', DATE '1995-01-01', o_orderdate::DATE)::INT AS days_since_95,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')                AS order_ts_str
    FROM orders
    """,
)
def date_functions_orders(spark, sf_dir):
    """Date/time surface: extract, truncate, diff, format. Timestamps
    are emitted as formatted strings so both engines hash identically
    (SURVEY.md §7.4 hard part #2)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts_str"),
    )


@query(
    "math_functions_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 1000.0), 2)       AS abs_diff,
           ceil(l_discount * 100)::BIGINT                AS disc_pct_ceil,
           floor(l_tax * 100)::BIGINT                    AS tax_pct_floor,
           round(sqrt(l_quantity), 6)                    AS qty_sqrt,
           round(ln(l_extendedprice + 1), 6)             AS price_ln,
           round(pow(l_quantity, 2), 2)                  AS qty_sq,
           (l_linenumber % 3)::INT                       AS line_mod
    FROM lineitem
    """,
)
def math_functions_lineitem(spark, sf_dir):
    """Math surface: abs/ceil/floor/sqrt/ln/pow/mod. Spark ceil/floor
    on double return LONG; DuckDB returns DOUBLE — both cast to BIGINT
    explicitly."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).cast("long").alias("tax_pct_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
    )


@query(
    "json_extract_events",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')::INT AS k_val,
           (json_extract_string(props, '$.k')::INT % 10)::INT AS k_mod
    FROM events
    WHERE json_extract_string(props, '$.k')::INT > 50
    """,
)
def json_extract_events(spark, sf_dir):
    """JSON surface over the ``events.props`` string column
    (FIXTURES.md): extract, cast, filter on the extracted value.
    ``get_json_object`` evaluates JVM-side; for repeated multi-field
    extraction prefer ``from_json`` with an explicit schema (one parse
    per row instead of one per field)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(
            "event_id",
            k.alias("k_val"),
            (k % 10).alias("k_mod"),
        )
        .filter(F.col("k_val") > 50)
    )


@query(
    "from_json_struct_events",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k')::INT AS k_val
    FROM events
    """,
)
def from_json_struct_events(spark, sf_dir):
    """``from_json`` with a declared schema → typed struct column, then
    field access — the scalable one-parse path for multi-field JSON."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "props_struct", F.from_json("props", "k INT")
    )
    return parsed.select("event_id", F.col("props_struct.k").alias("k_val"))


@query(
    "case_when_coalesce_nullif",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 100000 THEN 'large'
                WHEN o_totalprice >= 10000  THEN 'medium'
                ELSE 'small' END                       AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_resolved
    FROM orders
    """,
)
def case_when_coalesce_nullif(spark, sf_dir):
    """Conditional scalar surface: CASE WHEN ladder, NULLIF, COALESCE."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 100000, "large")
        .when(F.col("o_totalprice") >= 10000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_resolved"
        ),
    )


@query(
    "array_functions_embeddings",
    oracle="""
    SELECT vec_id,
           len(embedding)::INT                                   AS dim,
           round(embedding[1]::DOUBLE, 6)                        AS first_component,
           round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6) AS self_dot,
           array_to_string(list_transform(embedding[1:3],
               x -> (round(x::DOUBLE, 4)::DECIMAL(14,4))::VARCHAR), ',') AS head3
    FROM embeddings
    """,
)
def array_functions_embeddings(spark, sf_dir):
    """Array surface over ArrayType(FloatType): size, element_at,
    slice, transform, and an aggregate fold (self dot product) — all
    codegen'd higher-order functions, no UDF.

    ``head3`` is serialized to a comma-joined DECIMAL(14,4) string:
    the driver's pandas-based hasher cannot hash list cells, and a
    fixed-scale decimal renders identically in Spark and DuckDB
    (trailing zeros kept, no scientific notation)."""
    from oracle_to_cassandra_spark.functions.vector import dot_sx

    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_component"),
        F.expr(f"round({dot_sx('embedding', 'embedding')}, 6)").alias("self_dot"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: F.round(x.cast("double"), 4)
                .cast("decimal(14,4)")
                .cast("string"),
            ),
        ).alias("head3"),
    )


@query(
    "explode_collect_roundtrip",
    oracle="""
    SELECT l_orderkey,
           count(*)::BIGINT AS n_parts,
           min(l_partkey)   AS min_part,
           max(l_partkey)   AS max_part
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    GROUP BY l_orderkey
    """,
)
def explode_collect_roundtrip(spark, sf_dir):
    """collect_set → explode round-trip: build an array per group, then
    flatten it back and summarize — exercising ArrayType aggregation
    both directions. The summary (not the raw array) is compared, since
    set order is engine-specific."""
    li = load_table(spark, sf_dir, "lineitem")
    arrays = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    exploded = arrays.select("l_orderkey", F.explode("parts").alias("l_partkey"))
    return exploded.groupBy("l_orderkey").agg(
        F.count("*").alias("n_parts"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
    )


@query(
    "try_arithmetic_null_semantics",
    oracle="""
    SELECT o_orderstatus,
           count(*)::BIGINT AS n_rows,
           sum(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_null_div,
           coalesce(sum(CASE WHEN o_orderkey % 10 <> 0 THEN
             CAST(round(round(o_totalprice * 100)
                        / (o_orderkey % 10)) AS BIGINT)
           END), 0)::BIGINT AS sum_div_cents,
           sum(CASE WHEN o_totalprice >= 100000 THEN 1 ELSE 0 END)::BIGINT
             AS n_null_cast
    FROM orders GROUP BY o_orderstatus
    """,
)
def try_arithmetic_null_semantics(spark, sf_dir):
    """ANSI-mode error containment — Spark 4 runs under ANSI SQL by
    default, where division by zero and overflowing casts THROW and
    kill the job; the ``try_*`` family (try_divide, try_cast, ...)
    converts those to NULL per row, which is the only viable contract
    for a 100 TB batch (one poisoned row must not cost a 1000-executor
    stage retry loop). Planted hazards: every 10th key divides by
    zero (try_divide → NULL), prices at or over 100000.00 overflow a
    deliberately narrow decimal cast (try_cast → NULL). The oracle
    states the NULL pattern in closed form, so the query certifies
    BOTH that errors became NULLs and that no healthy row was
    nulled.

    Scale: all codegen expressions; the point IS the absence of a
    failure path."""
    o = load_table(spark, sf_dir, "orders")
    div = F.try_divide(
        F.round(F.col("o_totalprice") * 100),
        (F.col("o_orderkey") % 10).cast("double"),
    )
    narrow = F.try_to_number(
        F.format_string("%.2f", F.col("o_totalprice")),
        F.lit("99999.99"),
    )
    return o.select(
        "o_orderstatus",
        F.round(div).cast("long").alias("div_cents"),
        narrow.alias("narrow_price"),
    ).groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(F.col("div_cents").isNull(), 1).otherwise(0)
        ).alias("n_null_div"),
        F.coalesce(F.sum("div_cents"), F.lit(0)).cast("long").alias(
            "sum_div_cents"
        ),
        F.sum(
            F.when(F.col("narrow_price").isNull(), 1).otherwise(0)
        ).alias("n_null_cast"),
    )


@query(
    "multibyte_length_semantics",
    oracle="""
    SELECT (doc_id % 5)::BIGINT AS n_accents,
           count(*)::BIGINT AS n_docs,
           sum(length(repeat('é', doc_id % 5) || lang))::BIGINT
             AS char_len_sum,
           sum(octet_length(encode(repeat('é', doc_id % 5) || lang)))::BIGINT
             AS byte_len_sum
    FROM documents GROUP BY 1
    """,
)
def multibyte_length_semantics(spark, sf_dir):
    """CHARACTER vs BYTE length under multibyte UTF-8 — the i18n
    pitfall every 'truncate to N' pipeline hits: planted accented
    prefixes make the two lengths diverge ('é' is 1 character, 2
    bytes), and the query certifies both engines agree on BOTH
    measures (length() counts codepoints, octet_length counts
    encoded bytes). A tokenizer byte budget sized with character
    lengths over-admits exactly the byte_len − char_len gap this
    reports.

    Scale: per-row string expressions, one aggregate."""
    d = load_table(spark, sf_dir, "documents")
    s = F.concat(
        F.expr("repeat('é', CAST(doc_id % 5 AS INT))"), F.col("lang")
    )
    return d.groupBy((F.col("doc_id") % 5).alias("n_accents")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(s)).alias("char_len_sum"),
        F.sum(F.octet_length(s)).alias("byte_len_sum"),
    )


@query(
    "url_parse_host_rollup",
    oracle="""
    SELECT 'crawl-' || source || '.example.com' AS host,
           count(*)::BIGINT AS n_pages,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
           sum(doc_id)::BIGINT AS id_checksum
    FROM documents GROUP BY source
    """,
)
def url_parse_host_rollup(spark, sf_dir):
    """URL structural parsing (``parse_url``) — the first operator of
    every crawl pipeline (per-host quotas, robots gating, domain
    mixing all key on the parsed HOST, never on string prefixes):
    planted URLs are built from the source columns, then HOST, the
    path's document id, and a QUERY parameter are parsed back out for
    a per-host rollup the oracle states from the columns directly —
    a parser that mangles any component (scheme confusion, query
    splitting, path decoding) breaks a count or the checksum.

    Scale: parse_url is JVM codegen; host extraction at scan speed
    feeds the same broadcast-quota join `quota_cap_per_source`
    demonstrates.

    A NULL lang must not null the whole URL (``concat`` propagates
    NULL through every argument — a null-lang page would silently
    fall out of its host's rollup into a NULL-host group): the query
    parameter is coalesced to the empty value, the serialization a
    real URL builder produces for a missing field."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://crawl-"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.coalesce(F.col("lang"), F.lit("")),
    )
    parsed = d.select(url.alias("u")).select(
        F.parse_url(F.col("u"), F.lit("HOST")).alias("host"),
        F.regexp_extract(
            F.parse_url(F.col("u"), F.lit("PATH")), r"/docs/(\d+)", 1
        )
        .cast("long")
        .alias("doc_id"),
        F.parse_url(F.col("u"), F.lit("QUERY"), F.lit("lang")).alias("lang"),
    )
    return parsed.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.sum("doc_id").alias("id_checksum"),
    )
