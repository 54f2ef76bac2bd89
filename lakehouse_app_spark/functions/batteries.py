"""Scalar-function batteries: one projection per family exercising
string / date / math / array / map-struct functions (SURVEY.md §2.2
"Scalar functions"). Each stays a single whole-stage-codegen'd map
over the scan — the cheapest possible plan shape at any scale.

Cross-engine dialect notes (verified): Spark regexp refs are ``$1``
vs DuckDB ``\\1``; Spark ``ceil(double)`` → BIGINT vs DuckDB DOUBLE
(cast); DuckDB ``date_trunc('month', ts)`` → DATE (cast back to
TIMESTAMP); transcendental results rounded to 6 dp (libm last-ulp
differences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_app_spark.registry import query
from lakehouse_app_spark.sources.tables import load_tables


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_name, 1, 3) AS name_pfx,
           length(p_name) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           lpad(p_type, 12, '.') AS type_padded,
           replace(p_name, ' ', '_') AS name_snake,
           string_split(p_name, ' ')[1] AS first_word,
           strpos(p_name, 'e') AS pos_e,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           trim('  ' || p_type || ' ') AS trimmed
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery (ref R9/R23 family: substring/replace/concat/
    regexp on rendered columns)."""
    t = load_tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 3).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad("p_type", 12, ".").alias("type_padded"),
        F.expr("replace(p_name, ' ', '_')").alias("name_snake"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.instr("p_name", "e").alias("pos_e"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           EXTRACT(day FROM o_orderdate) AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 7 DAY AS plus_week,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_95,
           CAST(epoch(o_orderdate) AS BIGINT) AS uts,
           strftime(o_orderdate, '%Y-%m-%d') AS odate_str
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("timestamp_ntz")
        .alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("plus_week"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("days_since_epoch_95"),
        F.unix_timestamp(F.col("o_orderdate")).alias("uts"),
        # string, not DATE: Spark DATE collects as python date objects
        # while DuckDB DATE arrives as datetime64 — a value-hash hazard
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate_str"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05::DOUBLE) AS disc_dev,
           CAST(ceil(l_quantity / 7.0::DOUBLE) AS BIGINT) AS qty_ceil7,
           CAST(floor(l_quantity / 7.0::DOUBLE) AS BIGINT) AS qty_floor7,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(exp(l_discount), 6) AS disc_exp,
           CAST(sign(l_tax - 0.04::DOUBLE) AS DOUBLE) AS tax_sign,
           l_orderkey % 7 AS key_mod7,
           greatest(l_quantity, l_discount * 100.0::DOUBLE) AS g,
           least(l_quantity, l_tax * 100.0::DOUBLE) AS l
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil7"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_floor7"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.signum(F.col("l_tax") - 0.04).alias("tax_sign"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_mod7"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100.0).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100.0).alias("l"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS n_dims,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'min'), 6) AS min_elem,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS max_elem,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 6) AS elem_sum,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INTEGER)
             AS n_pos,
           round(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> x * x), 'sum'), 6) AS sq_norm
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order battery over the embedding column (NS
    'multimodal columns'): size/index/min/max/fold/filter/transform."""
    t = load_tables(spark, sf_dir)
    emb = F.col("embedding").cast("array<double>")
    fold_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return t.embeddings.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(F.element_at(emb, 1), 6).alias("first_elem"),
        F.round(F.array_min(emb), 6).alias("min_elem"),
        F.round(F.array_max(emb), 6).alias("max_elem"),
        F.round(fold_sum(emb), 6).alias("elem_sum"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(fold_sum(F.transform(emb, lambda x: x * x)), 6).alias("sq_norm"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT c_custkey,
           c_name AS name_from_map,
           c_mktsegment AS segment_from_map,
           c_acctbal AS bal_from_struct,
           2 AS n_keys
    FROM customer
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/struct battery (ref R10/R19: metadata-map and nested-struct
    access): build a map and a struct, then extract back out. The
    oracle is the algebraic identity of pack-then-extract."""
    t = load_tables(spark, sf_dir)
    m = F.create_map(
        F.lit("name"), F.col("c_name"), F.lit("segment"), F.col("c_mktsegment")
    )
    s = F.struct(F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("bal"))
    return t.customer.select(
        "c_custkey",
        F.element_at(m, "name").alias("name_from_map"),
        F.element_at(m, "segment").alias("segment_from_map"),
        s.getField("bal").alias("bal_from_struct"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "q_try_funcs",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0
                         THEN CAST(o_orderkey AS VARCHAR)
                         ELSE CAST(o_orderkey AS VARCHAR) || 'x' END
                    AS BIGINT) AS parsed_key,
           o_totalprice / (o_orderkey % 5) AS price_per_bucket,
           round(o_totalprice / nullif(o_orderkey % 5, 0), 4)
             AS price_per_bucket_r
    FROM orders
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-input handling: TRY semantics that turn parse failures
    and division-by-zero into NULLs instead of job aborts — the
    contract an ingest pipeline over scraped data needs. Spark 4
    runs under ANSI mode where ``/ 0`` raises, so ``try_divide`` is
    the production idiom; DuckDB's plain division already yields
    NULL on zero (verified), so the oracle pairs them directly.
    Every third key parses, the rest carry a trailing junk char."""
    t = load_tables(spark, sf_dir)
    dirty = F.when(
        F.col("o_orderkey") % 3 == 0, F.col("o_orderkey").cast("string")
    ).otherwise(F.concat(F.col("o_orderkey").cast("string"), F.lit("x")))
    div = F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5)
    return t.orders.select(
        "o_orderkey",
        F.try_to_number(dirty, F.lit("999999999999999999")).cast("bigint").alias(
            "parsed_key"
        ),
        div.alias("price_per_bucket"),
        F.round(div, 4).alias("price_per_bucket_r"),
    )


@query(
    "q_bitwise_hash_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 15 AS or15,
           xor(o_orderkey, 255) AS xor255,
           CAST(bit_count(o_orderkey) AS INTEGER) AS popcount,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 2 AS shr2,
           md5(CAST(o_orderkey AS VARCHAR)) AS key_md5,
           sha256(CAST(o_orderkey AS VARCHAR)) AS key_sha256
    FROM orders
    """,
)
def q_bitwise_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation + cryptographic-hash battery: the primitives
    under bucketing, Morton/z-order keys ([[zorder_key]]), bloom
    filters, and content-addressed dedup. All JVM-side codegen'd
    expressions; both engines agree bit-for-bit with no rounding."""
    t = load_tables(spark, sf_dir)
    k = F.col("o_orderkey")
    return t.orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(15)).alias("or15"),
        k.bitwiseXOR(F.lit(255)).alias("xor255"),
        F.bit_count(k).alias("popcount"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 2).alias("shr2"),
        F.md5(k.cast("string")).alias("key_md5"),
        F.sha2(k.cast("string"), 256).alias("key_sha256"),
    )


@query(
    "q_array_setops",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
      FROM documents
    )
    SELECT a.doc_id,
           coalesce(array_to_string(list_sort(list_filter(a.tk,
             x -> list_contains(b.tk, x))), '|'), '') AS common_toks,
           coalesce(array_to_string(list_sort(list_distinct(a.tk || b.tk)),
             '|'), '') AS all_toks,
           coalesce(array_to_string(list_sort(list_filter(a.tk,
             x -> NOT list_contains(b.tk, x))), '|'), '') AS only_a,
           CAST(len(list_filter(a.tk, x -> list_contains(b.tk, x)))
                AS INTEGER) AS n_common
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect / union / except) between each
    document's distinct token set and its successor's — the
    vocabulary-overlap primitive under Jaccard and retrieval-overlap
    metrics. Results are sort-normalized (set ops carry no element
    order) and serialized to '|'-joined strings: the value-hash
    compare needs hashable scalar cells, and a canonical string is
    the cross-engine-stable encoding of a set. Pure higher-order
    Catalyst expressions after one self-join on adjacent doc_ids."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("tk")
    )
    a = toks.select(F.col("doc_id"), F.col("tk").alias("a_tk"))
    b = toks.select((F.col("doc_id") - 1).alias("doc_id"), F.col("tk").alias("b_tk"))
    j = F.array_join
    return a.join(b, "doc_id").select(
        "doc_id",
        j(F.array_sort(F.array_intersect("a_tk", "b_tk")), "|").alias(
            "common_toks"
        ),
        j(F.array_sort(F.array_union("a_tk", "b_tk")), "|").alias("all_toks"),
        j(F.array_sort(F.array_except("a_tk", "b_tk")), "|").alias("only_a"),
        F.size(F.array_intersect("a_tk", "b_tk")).alias("n_common"),
    )
