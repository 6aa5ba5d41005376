"""Group G — scalar function library (SURVEY.md §2.2 G).

Everything here is a built-in pyspark.sql.functions expression — JVM-
side, inside whole-stage codegen. No Python UDFs in this module.
Dual-dialect notes are inline where Spark and DuckDB syntax diverge
(0- vs 1-based array indexing, strftime vs date_format, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from . import register


@register(
    "g1_string_basics",
    oracle="""
SELECT UPPER(r_name) AS up, LOWER(r_name) AS lo, LENGTH(r_name) AS len,
       SUBSTR(r_name, 1, 3) AS sub, TRIM('  ' || r_name || ' ') AS trimmed,
       r_name || '_x' AS concatted
FROM region ORDER BY r_name
""",
    group="G",
)
def g1_string_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    return region.select(
        F.upper("r_name").alias("up"),
        F.lower("r_name").alias("lo"),
        F.length("r_name").cast("long").alias("len"),  # DuckDB LENGTH -> BIGINT
        F.substring("r_name", 1, 3).alias("sub"),
        F.trim(F.concat(F.lit("  "), F.col("r_name"), F.lit(" "))).alias("trimmed"),
        F.concat(F.col("r_name"), F.lit("_x")).alias("concatted"),
    ).orderBy("r_name")


@register(
    "g2_split_regexp_extract",
    oracle="""
SELECT p_partkey,
       str_split(p_type, ' ')[2] AS second_word,
       regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word
FROM part ORDER BY p_partkey LIMIT 200
""",
    group="G",
)
def g2_split_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark arrays are 0-based; DuckDB lists are 1-based — the oracle
    uses [2] for Spark's getItem(1)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.get(F.split("p_type", " "), 1).alias("second_word"),  # NULL-safe index
            F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("last_word"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


@register(
    "g3_datetime",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS m,
       EXTRACT(YEAR FROM MIN(o_orderdate))::BIGINT AS min_yr,
       COUNT(*) AS cnt
FROM orders GROUP BY 1 ORDER BY 1
""",
    group="G",
)
def g3_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("m")
        )
        .agg(
            F.year(F.min("o_orderdate")).cast("long").alias("min_yr"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("m")
    )


@register(
    "g4_math",
    oracle="""
SELECT ROUND(SQRT(ABS(SUM(l_discount - 0.05))), 4) AS sq,
       MOD(MAX(l_orderkey), 97) AS md,
       FLOOR(AVG(l_quantity))::BIGINT AS fl,
       CEIL(AVG(l_tax) * 100)::BIGINT AS ce,
       ROUND(LN(MAX(l_extendedprice)), 4) AS lg,
       ROUND(POWER(AVG(l_discount), 2), 6) AS pw
FROM lineitem
""",
    group="G",
)
def g4_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sqrt(F.abs(F.sum(F.col("l_discount") - 0.05))), 4).alias("sq"),
        (F.max("l_orderkey") % 97).alias("md"),
        F.floor(F.avg("l_quantity")).alias("fl"),
        F.ceil(F.avg("l_tax") * 100).alias("ce"),
        F.round(F.log(F.max("l_extendedprice")), 4).alias("lg"),
        F.round(F.pow(F.avg("l_discount"), 2), 6).alias("pw"),
    )


@register(
    "g5_truncate_transform",
    oracle="""
SELECT (l_orderkey - (l_orderkey % 600)) AS bucket, COUNT(*) AS cnt
FROM lineitem GROUP BY 1 ORDER BY 1
""",
    group="G",
)
def g5_truncate_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's partition transform (truncate width) as plain
    integer math: v - (v % w). Mirrors FileBasedBookkeeper.java:186 and
    Constants.java:33-35; the same function drives the engine table
    layer's partitioning (table/transforms.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (F.col("l_orderkey") - (F.col("l_orderkey") % 600)).alias("bucket")
    return li.groupBy(bucket).agg(F.count(F.lit(1)).alias("cnt")).orderBy("bucket")


@register(
    "g6_array_basics",
    oracle="""
SELECT vec_id, len(embedding) AS dim,
       ROUND(embedding[1]::DOUBLE, 4) AS first_elem
FROM embeddings ORDER BY vec_id LIMIT 10
""",
    group="G",
)
def g6_array_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),  # DuckDB len() -> BIGINT
            F.round(F.col("embedding").getItem(0).cast("double"), 4).alias("first_elem"),
        )
        .orderBy("vec_id")
        .limit(10)
    )


@register(
    "g7_explode_unnest",
    oracle="""
SELECT COUNT(*) AS cnt, ROUND(SUM(e::DOUBLE), 2) AS total
FROM (SELECT UNNEST(embedding) AS e FROM embeddings)
""",
    group="G",
)
def g7_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(F.explode("embedding").alias("e")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(F.col("e").cast("double")), 2).alias("total"),
    )


@register(
    "g8_struct_map_access",
    oracle="""
SELECT {'a': n_nationkey, 'b': n_name}.a AS a,
       map {'k': n_name}['k'][1] AS mv  -- DuckDB map extract yields a list

FROM nation ORDER BY n_nationkey LIMIT 10
""",
    group="G",
)
def g8_struct_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.select(
            F.struct(F.col("n_nationkey").alias("a"), F.col("n_name").alias("b"))
            .getField("a")
            .alias("a"),
            F.create_map(F.lit("k"), F.col("n_name")).getItem("k").alias("mv"),
            "n_nationkey",
        )
        .orderBy("n_nationkey")
        .select("a", "mv")
        .limit(10)
    )


@register(
    "g9_json_extract",
    oracle="""
SELECT SUM(json_extract(props, '$.k')::BIGINT)::BIGINT AS total_k,
       COUNT(*) AS cnt
FROM events
""",
    group="G",
)
def g9_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string field extraction (the reference's queue-message
    parse shape, StorageQueueBasedBookkeeper.java:178-212)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("total_k"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "g10_base64_roundtrip",
    oracle="""
SELECT COUNT(*) AS cnt FROM region
WHERE from_base64(to_base64(r_name::BLOB))::VARCHAR = r_name
""",
    group="G",
)
def g10_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64/unbase64 round trip — the decode step of the reference's
    queue-message path (StorageQueueBasedBookkeeper.java:181)."""
    region = load_table(spark, sf_dir, "region")
    return region.filter(
        F.unbase64(F.base64(F.col("r_name").cast("binary"))).cast("string")
        == F.col("r_name")
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "g11_url_rewrite",
    oracle="""
SELECT 'abfss://' || regexp_extract(url, 'https://([^/]+)/([^/]+)/(.*)', 2) || '@'
       || regexp_extract(url, 'https://([^/]+)/([^/]+)/(.*)', 1) || '/'
       || regexp_extract(url, 'https://([^/]+)/([^/]+)/(.*)', 3) AS abfss_url
FROM (
  SELECT 'https://acct.dfs.core.windows.net/container/data/part-' || o_orderkey || '.parquet' AS url
  FROM orders ORDER BY o_orderkey LIMIT 100
)
""",
    group="G",
)
def g11_url_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's https->abfss URI rebuild
    (StorageQueueBasedBookkeeper.java:45,197-204) as a pure-expression
    pipeline: regexp_extract x3 + concat."""
    orders = load_table(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://acct.dfs.core.windows.net/container/data/part-"),
        F.col("o_orderkey").cast("string"),
        F.lit(".parquet"),
    )
    pat = r"https://([^/]+)/([^/]+)/(.*)"
    base = orders.orderBy("o_orderkey").limit(100).select(url.alias("url"))
    return base.select(
        F.concat(
            F.lit("abfss://"),
            F.regexp_extract("url", pat, 2),
            F.lit("@"),
            F.regexp_extract("url", pat, 1),
            F.lit("/"),
            F.regexp_extract("url", pat, 3),
        ).alias("abfss_url")
    )


@register(
    "g12_coalesce_nullif",
    oracle="""
SELECT COUNT(*) AS cnt FROM orders
WHERE COALESCE(NULLIF(o_orderstatus, 'O'), 'X') = 'X'
""",
    group="G",
)
def g12_coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("X")) == "X"
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "g13_casts",
    oracle="""
SELECT (o_orderdate::DATE)::VARCHAR AS d_str,
       o_orderkey::VARCHAR AS key_str,
       FLOOR(o_totalprice)::BIGINT AS price_int,  -- DuckDB ::BIGINT rounds; Spark CAST truncates

       epoch_us(o_orderdate) AS ts_us
FROM orders ORDER BY o_orderkey LIMIT 50
""",
    group="G",
)
def g13_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderdate").cast("date").cast("string").alias("d_str"),
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.floor("o_totalprice").alias("price_int"),
            # parquet ts w/o tz infers as TIMESTAMP_NTZ in Spark 4; cast
            # to LTZ (session tz is UTC) before unix_micros
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts_us"),
            "o_orderkey",
        )
        .orderBy("o_orderkey")
        .select("d_str", "key_str", "price_int", "ts_us")
        .limit(50)
    )


@register(
    "g14_text_functions",
    oracle="""
SELECT r_name,
       lpad(r_name, 12, '*') AS padded,
       reverse(r_name) AS rev,
       repeat(substr(r_name, 1, 2), 3) AS rep,
       translate(r_name, 'AE', 'ae') AS tr,
       levenshtein(r_name, 'EUROPE') AS lev,
       greatest(length(r_name), 6)::BIGINT AS g
FROM region ORDER BY r_name
""",
    group="G",
)
def g14_text_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string library incl. levenshtein — the edit-distance
    primitive for fuzzy dedup pipelines."""
    region = load_table(spark, sf_dir, "region")
    return region.select(
        "r_name",
        F.lpad("r_name", 12, "*").alias("padded"),
        F.reverse("r_name").alias("rev"),
        F.repeat(F.substring("r_name", 1, 2), 3).alias("rep"),
        F.translate("r_name", "AE", "ae").alias("tr"),
        F.levenshtein("r_name", F.lit("EUROPE")).cast("long").alias("lev"),
        F.greatest(F.length("r_name").cast("long"), F.lit(6).cast("long")).alias("g"),
    ).orderBy("r_name")


@register(
    "g15_levenshtein_fuzzy",
    oracle="""
SELECT a.doc_id AS doc_id,
       levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS dist,
       levenshtein(a.lang, b.lang) AS lang_dist
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id < 100
ORDER BY doc_id
""",
    group="G",
)
def g15_levenshtein_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (levenshtein — identical semantics
    in Spark and DuckDB): the character-level near-match primitive for
    fuzzy key joins and typo-tolerant dedup, complementing the
    token-set (Jaccard) and bit-signature (SimHash) families. Bounded
    to 30-char prefixes because edit distance is O(len^2) per pair —
    at scale it runs as the VERIFY step on candidate pairs from
    blocking (LSH buckets / sorted neighborhoods), never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.alias("a")
    b = docs.alias("b")
    return (
        a.filter(F.col("a.doc_id") < 100)
        .join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.levenshtein(
                F.substring("a.text", 1, 30), F.substring("b.text", 1, 30)
            )
            .cast("long")
            .alias("dist"),
            F.levenshtein(F.col("a.lang"), F.col("b.lang"))
            .cast("long")
            .alias("lang_dist"),
        )
        .orderBy("doc_id")
    )


@register(
    "g16_split_part",
    oracle="""
SELECT p_partkey,
       split_part(p_type, ' ', 1) AS first_word,
       split_part(p_type, ' ', -1) AS last_word
FROM part ORDER BY p_partkey LIMIT 200
""",
    group="G",
)
def g16_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part (1-based field extraction, negative = from the end)
    — identical semantics in Spark (3.4+) and DuckDB, the delimiter
    workhorse for log/URL/path fields without a full split+index."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.split_part("p_type", F.lit(" "), F.lit(1)).alias("first_word"),
            F.split_part("p_type", F.lit(" "), F.lit(-1)).alias("last_word"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


@register(
    "g17_variant_json",
    oracle="""
SELECT event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'k' AS INTEGER)) AS min_k,
       MAX(CAST(props->>'k' AS INTEGER)) AS max_k
FROM events
WHERE CAST(props->>'k' AS INTEGER) >= 50
GROUP BY event_type
ORDER BY event_type
""",
    group="G",
)
def g17_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through Spark 4's VARIANT type:
    ``parse_json`` builds the binary variant once, ``variant_get``
    extracts typed paths — both JVM-side expressions inside codegen,
    the engine-native answer to schemaless event payloads (no
    per-row Python, no regex). At 100 TB the variant encode beats
    repeated ``get_json_object`` string re-parsing because the parse
    happens once per row regardless of how many paths are read."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "g18_higher_order_array_functions",
    oracle="""
WITH base AS (SELECT l_orderkey,
                     list_sort(list(CAST(l_quantity AS DOUBLE))) AS q
              FROM lineitem GROUP BY l_orderkey)
SELECT l_orderkey,
       CAST(len(q) AS BIGINT) AS n_items,
       ROUND(list_aggregate(q, 'sum'), 4) AS total_qty,
       CAST(len(list_filter(q, x -> x >= 25)) AS BIGINT) AS n_big,
       ROUND(list_aggregate(list_transform(q, x -> x * 2), 'sum'), 4)
         AS doubled_total,
       ROUND(q[1] + q[-1], 4) AS ends_sum
FROM base ORDER BY l_orderkey LIMIT 20
""",
    group="G",
)
def g18_higher_order_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over array columns — transform / filter /
    aggregate lambdas plus negative indexing, all JVM-side expressions
    inside whole-stage codegen (the reason embeddings/token arrays
    never need Python in this repo: every per-element loop is a
    Catalyst lambda). The per-order quantity array is sorted first so
    the left-fold sums are order-deterministic against DuckDB's list
    lambdas."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.col("l_quantity").cast("double"))
        ).alias("q")
    )
    return (
        base.select(
            "l_orderkey",
            F.size("q").cast("long").alias("n_items"),
            F.round(
                F.aggregate("q", F.lit(0.0), lambda a, x: a + x), 4
            ).alias("total_qty"),
            F.size(F.filter("q", lambda x: x >= 25)).cast("long").alias("n_big"),
            F.round(
                F.aggregate(
                    F.transform("q", lambda x: x * 2),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                4,
            ).alias("doubled_total"),
            F.round(
                F.element_at("q", 1) + F.element_at("q", -1), 4
            ).alias("ends_sum"),
        )
        .orderBy("l_orderkey")
        .limit(20)
    )
