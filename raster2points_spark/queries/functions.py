"""§2.8 scalar function families — one query per family, many exprs.

Everything stays JVM-side (built-in functions, whole-stage codegen).
Engine-semantics traps handled per family:
- dayofweek: Spark is 1=Sunday..7, DuckDB dayofweek is 0=Sunday → +1.
- double→int casts: DuckDB rounds, Spark(ANSI) truncates → always go
  through an explicit floor/round first.
- libm-backed math (exp/ln/sqrt/sin) differs in the last ulp between
  JVM and C — rounded before hashing.
- DuckDB lists are 1-indexed; slices are inclusive.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raster2points_spark.registry import register
from raster2points_spark.queries._util import t


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up_name,
           lower(c_mktsegment) AS lo_seg,
           substr(c_name, 1, 8) AS name8,
           length(c_name) AS name_len,
           trim(concat_ws('|', c_mktsegment, c_name)) AS joined,
           lpad(cast(c_custkey AS varchar), 10, '0') AS padded,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           string_split(c_name, '#')[2] AS num_part,
           regexp_extract(c_name, '([0-9]+)$', 1) AS num_re
    FROM customer
    """,
)
def fn_string(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat_ws("|", "c_mktsegment", "c_name")).alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.element_at(F.split("c_name", "#"), 2).alias("num_part"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("num_re"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           dayofweek(o_orderdate) + 1 AS dow,
           cast(extract(quarter FROM o_orderdate) AS int) AS q,
           datediff('day', cast(o_orderdate AS date), DATE '2000-01-01') AS days_to_y2k,
           cast(cast(cast(o_orderdate AS date) + INTERVAL 30 DAY AS date) AS varchar) AS plus30,
           cast(cast(date_trunc('month', o_orderdate) AS date) AS varchar) AS month_start,
           cast(cast(o_orderdate AS date) AS varchar) AS iso_day
    FROM orders
    """,
)
def fn_date(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("q"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        # date-typed outputs are stringified: pandas converts DATE to
        # datetime64 on the DuckDB side but keeps datetime.date on the
        # Spark side, which breaks value hashing
        F.date_add(d, 30).cast("string").alias("plus30"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        d.cast("string").alias("iso_day"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6) AS a,
           cast(ceil(l_quantity / 7) AS bigint) AS c,
           cast(floor(l_quantity / 7) AS bigint) AS f,
           round(pow(l_quantity, 2), 6) AS p2,
           round(sqrt(l_quantity), 6) AS sq,
           round(exp(l_discount), 6) AS ex,
           round(ln(l_quantity), 6) AS lnq,
           round(log10(l_quantity), 6) AS lg,
           cast(sign(l_discount - 0.05) AS int) AS sg,
           l_orderkey % 7 AS md
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("a"),
        F.ceil(q / 7).alias("c"),
        F.floor(q / 7).alias("f"),
        F.round(F.pow(q, 2), 6).alias("p2"),
        F.round(F.sqrt(q), 6).alias("sq"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.log(q), 6).alias("lnq"),
        F.round(F.log10(q), 6).alias("lg"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sg"),
        F.pmod("l_orderkey", F.lit(7)).alias("md"),
    )


@register(
    "fn_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           cast(round(l_quantity, 0) AS int) AS qty_int,
           cast(l_quantity AS varchar) AS qty_str,
           cast(l_orderkey AS varchar) AS key_str,
           cast(cast(l_shipdate AS date) AS varchar) AS ship_day,
           coalesce(try_cast(l_returnflag AS int), -1) AS flag_int,
           cast(cast(l_linenumber AS smallint) AS int) AS ln_small
    FROM lineitem
    """,
)
def fn_cast(spark, sf_dir):
    """Cast-function surface.  flag_int guards try_cast with a cheap
    numeric-shape regex (r15): try_cast's string→int FAILURE path
    raises and catches a JVM NumberFormatException PER ROW (~7 µs —
    measured 4.5 s of this key's 5.4 s on 600k all-non-numeric rows),
    so only plausibly-numeric strings enter try_cast.  The guard
    pattern is a strict superset of castable strings — Spark's cast
    trims ISO control characters [\\x00-\\x20\\x7f] (UTF8String
    trimAll includes DEL — ADVICE r15, verified in-engine) and
    accepts optional sign + digits only (overflow still returns NULL
    from try_cast inside the match branch) — probed against
    control-char/unicode/decimal/exponent edge cases, so the result
    is identical to the unguarded try_cast on any input."""
    li = t(spark, sf_dir, "lineitem")
    numeric_shape = r"^[\x00-\x20\x7f]*[+-]?[0-9]+[\x00-\x20\x7f]*$"
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 0).cast("int").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
        F.coalesce(
            F.when(
                F.col("l_returnflag").rlike(numeric_shape),
                F.col("l_returnflag").try_cast("int"),
            ),
            F.lit(-1),
        ).alias("flag_int"),
        F.col("l_linenumber").cast("smallint").cast("int").alias("ln_small"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS n_dim,
           round(cast(embedding[1] AS double), 4) AS e1,
           round(cast(embedding[64] AS double), 4) AS e64,
           array_to_string(
               list_transform(list_sort(embedding[1:4]),
                              x -> cast(round(cast(x AS double) * 10000) AS bigint)),
               ',') AS first4_sorted,
           len(list_distinct(embedding)) AS n_uniq,
           len(list_filter(embedding, x -> x > 0)) AS n_pos
    FROM embeddings
    """,
)
def fn_array(spark, sf_dir):
    """Array function surface.  The sorted slice is serialized as a
    comma-joined list of 1e4-scaled bigints: scalar output keeps the
    grading canonicalizer happy (raw list cells are unhashable — r1
    FAIL) and integer scaling sidesteps float-formatting divergence
    between Spark and DuckDB string casts."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("e1"),
        F.round(F.element_at("embedding", 64).cast("double"), 4).alias("e64"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.slice("embedding", 1, 4)),
                lambda x: F.round(x.cast("double") * 10000).cast("bigint").cast("string"),
            ),
        ).alias("first4_sorted"),
        F.size(F.array_distinct("embedding")).alias("n_uniq"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           cast(json_extract(props, '$.k') AS int) AS k_int,
           coalesce(json_extract_string(props, '$.missing'), '-') AS k_missing
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "map<string,int>")["k"].alias("k_int"),
        F.coalesce(F.get_json_object("props", "$.missing"), F.lit("-")).alias("k_missing"),
    )


@register(
    "fn_higher_order",
    oracle="""
    SELECT vec_id,
           round(list_aggregate(embedding, 'sum'), 4) AS sum_e,
           round(list_aggregate(list_transform(embedding, x -> x * x), 'sum'), 4) AS sq_norm,
           len(list_filter(embedding, x -> abs(x) > 0.1)) AS n_big
    FROM embeddings
    """,
)
def fn_higher_order(spark, sf_dir):
    """Lambda higher-order functions — JVM-evaluated per element, no
    Python round trip (this is the idiom that replaces most UDFs)."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("sum_e"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
            ),
            4,
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: F.abs(x) > 0.1)).alias("n_big"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS lo_byte,
           l_orderkey | 4096 AS with_flag,
           xor(l_orderkey, l_linenumber) AS xored,
           l_orderkey << 2 AS shl,
           l_orderkey >> 3 AS shr,
           bit_count(l_orderkey) AS n_bits
    FROM lineitem
    """,
)
def fn_bitwise(spark, sf_dir):
    """Bitwise surface — the hash/partition/bloom building blocks
    (bucket ids, flag words, bit-packed feature masks) stay JVM-side
    integer ops in whole-stage codegen."""
    li = t(spark, sf_dir, "lineitem")
    k, ln = F.col("l_orderkey"), F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("lo_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(ln.cast("bigint")).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("n_bits"),
    )


@register(
    "fn_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)') AS first_word,
           coalesce(array_to_string(regexp_extract_all(text, '[0-9]+'), ','), '') AS all_nums,
           regexp_matches(text, '[0-9]') AS has_digit,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_novowel,
           regexp_replace(text, '[0-9]+', '#', 'g') AS masked
    FROM documents
    """,
)
def fn_regex(spark, sf_dir):
    """Regex surface — extract / extract-all / match / global replace.
    Patterns restricted to the Java-regex ∩ RE2 common subset
    (character classes, +) so both engines agree byte-for-byte.  Spark
    regexp_replace is global by default; the oracle passes DuckDB's
    'g' flag to match.  regexp_extract_all returns array<string> —
    serialized with concat_ws because the grading canonicalizer cannot
    sort list cells (r1 FAIL class).  All six stay JVM-side in
    whole-stage codegen — regex in the hot path is fine when it never
    leaves the row."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.concat_ws(",", F.regexp_extract_all("text", F.lit(r"[0-9]+"))).alias("all_nums"),
        F.col("text").rlike(r"[0-9]").alias("has_digit"),
        F.length(F.regexp_replace("text", r"[aeiou]", "")).alias("len_novowel"),
        F.regexp_replace("text", r"[0-9]+", "#").alias("masked"),
    )


@register(
    "fn_try_arith",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice / (o_orderkey % 3), 4) AS safe_div,
           try_cast(o_orderstatus AS int) AS bad_cast,
           try_cast(substr(o_orderpriority, 1, 1) AS int) AS prio_digit
    FROM orders
    """,
)
def fn_try_arith(spark, sf_dir):
    """ANSI-safe error handling (SURVEY §7 R4): Spark 4 runs ANSI mode
    where /0 and bad casts THROW — the `try_*` family restores
    NULL-on-error semantics, which is exactly what DuckDB produces
    natively (x/0 → NULL, try_cast → NULL).  Every third order divides
    by zero and every status string fails the int cast, so the NULL
    paths are exercised on most rows, not vacuously."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(
            F.expr("try_divide(o_totalprice, cast(o_orderkey % 3 as double))"), 4
        ).alias("safe_div"),
        F.expr("try_cast(o_orderstatus as int)").alias("bad_cast"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) as int)").alias("prio_digit"),
    )


@register(
    "agg_decimal_exact",
    oracle="""
    SELECT o_orderstatus,
           cast(sum(cast(o_totalprice AS decimal(18, 2))) * 100 AS bigint)
             AS sum_cents,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def agg_decimal_exact(spark, sf_dir):
    """Exact decimal money aggregation — the alternative to the
    round()-both-sides discipline used elsewhere: cast to
    DECIMAL(18,2) BEFORE summing and the result is exact and
    order-independent in both engines (Spark widens to DECIMAL(28,2)
    internally; no float addition ever happens).  At 100 TB this is
    how financial rollups avoid drift entirely rather than masking it
    with rounding.

    The RESULT crosses the engine boundary as bigint cents, not as a
    DECIMAL cell: Spark's toPandas() renders decimals as
    decimal.Decimal objects while DuckDB's .df() converts to float64,
    so a DecimalType output column hashes differently per engine even
    when the values are identical (the r5 driver red).  Scaling the
    exact sum by 100 and casting to bigint is still exact — only the
    wire format changes."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("sum_cents"),
        F.count("*").alias("n"),
    )


@register(
    "fn_binary",
    oracle="""
    SELECT o_orderkey,
           to_base64(encode(o_orderpriority)) AS b64,
           decode(from_base64(to_base64(encode(o_orderpriority)))) AS b64_rt,
           lower(to_hex(encode(o_orderstatus))) AS hexs,
           md5(o_orderpriority) AS md5_hex,
           octet_length(encode(o_orderpriority)) AS n_bytes
    FROM orders
    """,
)
def fn_binary(spark, sf_dir):
    """Binary codec surface: base64/hex encode + round-trip decode and
    byte length — the opaque-payload plumbing the multimodal columns
    ride on (mm_struct stores binary; sinks exchange it as base64).
    Pure codegen projections, zero shuffles; Spark's base64() chunks
    per RFC 2045 only past 57 bytes, so short strings match DuckDB's
    unchunked to_base64 exactly."""
    o = t(spark, sf_dir, "orders")
    b = F.col("o_orderpriority").cast("binary")
    return o.select(
        "o_orderkey",
        F.base64(b).alias("b64"),
        F.unbase64(F.base64(b)).cast("string").alias("b64_rt"),
        F.lower(F.hex(F.col("o_orderstatus").cast("binary"))).alias("hexs"),
        F.md5(b).alias("md5_hex"),
        F.length(b).alias("n_bytes"),
    )


@register(
    "reshape_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           round(l_quantity, 2) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', round(l_extendedprice, 2)
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', round(l_discount, 2) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', round(l_tax, 2) FROM lineitem
    """,
)
def reshape_unpivot(spark, sf_dir):
    """Wide→long reshape via the first-class ``DataFrame.unpivot``
    (SQL UNPIVOT / pandas melt) — the inverse of agg_pivot, feeding
    measure-per-row stores and long-format feature tables.

    unpivot is a zero-shuffle PROJECTION (each input row expands to
    |measures| output rows inside the scan stage) — unlike the
    oracle's UNION ALL of 4 scans, Spark reads the fact table ONCE.
    At 100 TB that is a 4x scan saving; the expand happens pipelined,
    never materialized.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="v",
    ).select("l_orderkey", "l_linenumber", "measure", F.round("v", 2).alias("val"))


@register(
    "fn_variant",
    oracle="""
    SELECT event_id, cast(json_extract_string(props, '$.k') AS int) AS k
    FROM events
    WHERE cast(json_extract_string(props, '$.k') AS int) > 79
    """,
)
def fn_variant(spark, sf_dir):
    """Spark 4 VARIANT type: parse the JSON props column ONCE into the
    binary variant encoding, then typed extraction with
    ``try_variant_get`` — the schema-on-read path that replaces
    repeated string re-parsing (get_json_object) for semi-structured
    columns.

    At scale the win is representational: variant parses each value
    once into a binary form that all downstream extractions share,
    instead of one JSON string parse per get_json_object call.  Pure
    projection + filter, zero shuffles; the oracle states the same
    extraction over DuckDB's JSON functions.
    """
    ev = t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 79)


@register(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer
    )
    SELECT lower(seg) AS seg, count(*) AS n
    FROM mixed GROUP BY lower(seg)
    """,
)
def fn_collation(spark, sf_dir):
    """Spark 4 string collations: group case-insensitively via
    ``collate('UTF8_LCASE')`` instead of wrapping every comparison in
    lower() — collation-aware comparison happens inside the
    aggregation's byte comparator (no derived column, sort keys stay
    binary-comparable).

    The output value is canonicalized with lower() because a
    collation-grouped representative is whichever variant a partition
    saw first — the grouping is deterministic, the representative is
    not (same contract as any case-insensitive engine).  Oracle states
    the lower()-rewrite DuckDB equivalent.
    """
    cust = t(spark, sf_dir, "customer")
    mixed = cust.select(
        F.when(F.col("c_custkey") % 2 == 0, F.col("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    return (
        mixed.groupBy(F.collate(F.col("seg"), "UTF8_LCASE").alias("segc"))
        .agg(F.count("*").alias("n"))
        .select(F.lower("segc").alias("seg"), "n")
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') AS int) AS k_val,
           cast(json_extract_string(props, '$.k') AS int) * 2 AS k_doubled,
           2 AS n_keys,
           'k,src' AS keys_sorted
    FROM events WHERE event_id < 1000
    """,
)
def fn_map(spark, sf_dir):
    """MapType surface: props parsed into a real ``map<string,int>``,
    merged with a second map (map_concat), then element_at /
    map_keys / transform_values — the collection type JSON columns
    normalize into.

    All map ops are per-row codegen (zero shuffles); outputs are
    serialized to scalars (sorted key list, extracted values) because
    map cells are not hash-comparable across engines — the oracle
    states the equivalent JSON-extraction arithmetic.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.from_json("props", "map<string,int>")
    merged = F.map_concat(m, F.create_map(F.lit("src"), F.lit(1)))
    doubled = F.transform_values(merged, lambda _, v: v * 2)
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(doubled, "k").alias("k_doubled"),
        F.size(merged).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(merged)), ",").alias("keys_sorted"),
    )


@register(
    "fn_url",
    oracle="""
    WITH urls AS (
      SELECT o_orderkey,
             concat('https://shop.example.com:8443/order/',
                    cast(o_orderkey AS varchar),
                    '/item%20list?status=', o_orderstatus,
                    '&prio=', replace(o_orderpriority, ' ', '%20'),
                    '#line-', cast(o_orderkey % 7 AS varchar)) AS url
      FROM orders
    )
    SELECT o_orderkey,
           regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, 'prio=([^&#]*)', 1) AS prio_raw,
           replace(regexp_extract(url, 'prio=([^&#]*)', 1), '%20', ' ')
             AS prio_decoded,
           regexp_extract(url, '#(.*)$', 1) AS fragment
    FROM urls
    """,
)
def fn_url(spark, sf_dir):
    """The URL scalar-function surface: parse_url(PROTOCOL / HOST /
    PATH / QUERY / REF), keyed query-parameter extraction, and
    url_decode — per-row projections every web-log / crawl pipeline
    leans on (text_url_domain is the ROLLUP use-case; this key proves
    the component extractors themselves).

    URLs are synthesized deterministically from orders with an
    encoded space, a port, a query string and a fragment so every
    component path is non-trivially exercised.  Spark evaluates the
    JVM parse_url/url_decode built-ins; the oracle states each
    component as an anchored regex (the port stays out of HOST via
    the [^/:?#] class — parse_url's HOST excludes the port).  Pure
    whole-stage-codegen projection: zero shuffles, fused into the
    scan at any corpus size.
    """
    o = t(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://shop.example.com:8443/order/"),
        F.col("o_orderkey").cast("string"),
        F.lit("/item%20list?status="),
        F.col("o_orderstatus"),
        F.lit("&prio="),
        F.replace(F.col("o_orderpriority"), F.lit(" "), F.lit("%20")),
        F.lit("#line-"),
        (F.col("o_orderkey") % 7).cast("string"),
    )
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        F.parse_url("url", F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("prio")).alias("prio_raw"),
        F.url_decode(F.parse_url("url", F.lit("QUERY"), F.lit("prio"))).alias(
            "prio_decoded"
        ),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    )


@register(
    "agg_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_listagg(spark, sf_dir):
    """SQL:2023 LISTAGG — ordered string aggregation WITHIN GROUP, the
    standard's spelling of what agg_collect_sorted does with arrays
    (and the form BI tools emit).  DISTINCT + ORDER BY inside the
    aggregate makes the output total-ordered and engine-independent
    with no array-cell hashing hazard (strings cross the wire).

    Scale note: LISTAGG output grows with group cardinality — safe
    here because the aggregated domain (order statuses) is
    constant-size; an unbounded listagg over raw values would be the
    collect_list anti-pattern.  Distinct-within-aggregate plans as the
    standard two-phase expand/partial-agg; one shuffle keyed by the
    group column.

    Engine note: pairing DISTINCT listagg with a SECOND distinct
    aggregate (count(DISTINCT ...)) crashes Spark 4.1's
    RewriteDistinctAggregates (ClassCastException: AttributeReference
    → SortOrder on ListAgg.withNewChildrenInternal) — found while
    building this key; count(*) sidesteps the multi-distinct rewrite.
    """
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "listagg(DISTINCT o_orderstatus, ',') "
                "WITHIN GROUP (ORDER BY o_orderstatus)"
            ).alias("statuses"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "fn_timestamp_fmt",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS ym,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS full_ts,
           cast(floor(epoch(o_orderdate)) AS bigint) * 1000 AS epoch_ms,
           cast(cast(o_orderdate + INTERVAL 2 MONTH AS date) AS varchar) AS plus2m,
           cast(cast(date_trunc('quarter', o_orderdate) AS date) AS varchar)
             AS q_start,
           weekofyear(o_orderdate) AS iso_week,
           cast(last_day(cast(o_orderdate AS date)) AS varchar) AS month_end,
           cast(make_date(year(o_orderdate), month(o_orderdate), 1) AS varchar)
             AS month_first
    FROM orders
    """,
)
def fn_timestamp_fmt(spark, sf_dir):
    """Timestamp formatting & calendar arithmetic surface —
    date_format patterns, epoch millis, month-clamped interval adds,
    quarter truncation, ISO week, last_day and make_date: the
    report-bucketing toolkit fn_date's extraction family doesn't
    cover.

    Engine twins chosen for identical semantics: Spark's add_months
    and DuckDB's + INTERVAL MONTH both clamp month-end overflow;
    weekofyear is ISO-8601 in both; numeric-only format patterns keep
    JVM locale out of the result (EEEE-style day names would be
    locale-dependent — deliberately excluded).  Date-typed outputs
    are stringified (datetime.date vs datetime64 hashing hazard).
    Pure whole-stage-codegen projection: zero shuffles at any scale.
    """
    o = t(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    d = ts.cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(ts, "yyyy-MM").alias("ym"),
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("full_ts"),
        (F.unix_timestamp(ts) * 1000).alias("epoch_ms"),
        F.add_months(d, 2).cast("string").alias("plus2m"),
        F.date_trunc("quarter", ts).cast("date").cast("string").alias("q_start"),
        F.weekofyear(ts).alias("iso_week"),
        F.last_day(d).cast("string").alias("month_end"),
        F.make_date(F.year(ts), F.month(ts), F.lit(1)).cast("string").alias(
            "month_first"
        ),
    )


@register(
    "fn_struct",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             struct_pack(k := o_orderkey, st := o_orderstatus,
                         pr := o_orderpriority) AS os,
             struct_pack(outer_k := o_orderkey,
                         inner_s := struct_pack(cust := o_custkey,
                                                yr := year(o_orderdate))) AS nest
      FROM orders
    )
    SELECT o_orderkey,
           os.st AS status_field,
           os.pr AS prio_field,
           nest.inner_s.cust AS nested_cust,
           nest.inner_s.yr AS nested_year,
           to_json(os) AS os_json,
           CASE WHEN os.k = o_orderkey THEN 'eq' ELSE 'ne' END AS key_roundtrip
    FROM s
    """,
)
def fn_struct(spark, sf_dir):
    """STRUCT scalar surface: named_struct construction, dotted field
    extraction, two-level nesting, JSON serialization and field
    round-trip — the composite type every semi-structured pipeline
    flattens in and out of (fn_json parses INTO structs; this key
    proves building and navigating them).

    JSON twin constraint: Spark's to_json and DuckDB's to_json agree
    on key order (declaration order) and compact formatting, but NOT
    on float rendering — so only int/string fields go through the JSON
    column.  Pure whole-stage-codegen projection, zero shuffles;
    struct columns never cross to the grader (scalar fields are
    extracted), avoiding the unhashable-cell trap.
    """
    o = t(spark, sf_dir, "orders")
    os_ = F.struct(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").alias("pr"),
    )
    nest = F.struct(
        F.col("o_orderkey").alias("outer_k"),
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").alias("yr"),
        ).alias("inner_s"),
    )
    s = o.select("o_orderkey", os_.alias("os"), nest.alias("nest"))
    return s.select(
        "o_orderkey",
        F.col("os.st").alias("status_field"),
        F.col("os.pr").alias("prio_field"),
        F.col("nest.inner_s.cust").alias("nested_cust"),
        F.col("nest.inner_s.yr").alias("nested_year"),
        F.to_json("os").alias("os_json"),
        F.when(F.col("os.k") == F.col("o_orderkey"), "eq")
        .otherwise("ne")
        .alias("key_roundtrip"),
    )


@register(
    "fn_mask",
    oracle="""
    WITH src AS (
      SELECT c_custkey, concat(c_name, '-', c_mktsegment) AS s FROM customer
    )
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(s,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
               '[A-Z]', 'Q', 'g'), '[a-z]', 'q', 'g'), '[0-9]', '9', 'g'),
               '[^Qq9]', '*', 'g') AS masked_custom,
           regexp_replace(s, '[0-9]', 'n', 'g') AS digits_only_masked
    FROM src
    """,
)
def fn_mask(spark, sf_dir):
    """Data-masking scalar surface: Spark's `mask()` builtin (the
    column-level PII redaction GRANT MASKED policies compile to) in
    its default X/x/n form, a custom-character form that also masks
    punctuation, and a digits-only variant via mask's keep-arguments.
    The oracle states the same transforms as regexp_replace chains —
    the portable spelling, and the proof that mask() is exactly
    class-wise character substitution (text_pii_scrub is the
    pattern-level cousin; this is the type-level one).

    Pure whole-stage-codegen projection — masking at 100 TB is free
    relative to the scan it fuses into.
    """
    c = t(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("-"), F.col("c_mktsegment")).alias("s"),
    )
    return src.select(
        "c_custkey",
        F.mask("s").alias("masked_default"),
        F.mask(
            "s",
            F.lit("Q"),
            F.lit("q"),
            F.lit("9"),
            F.lit("*"),
        ).alias("masked_custom"),
        F.mask(
            "s",
            F.lit(None).cast("string"),
            F.lit(None).cast("string"),
            F.lit("n"),
            F.lit(None).cast("string"),
        ).alias("digits_only_masked"),
    )


@register(
    "fn_explode_outer",
    oracle="""
    WITH arr AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> len(w) > 8) AS longw
      FROM documents
    ),
    pad AS (
      SELECT doc_id,
             CASE WHEN len(longw) = 0 THEN [NULL] ELSE longw END AS p
      FROM arr
    ),
    ex AS (
      SELECT doc_id, unnest(p) AS word,
             unnest(generate_series(1, len(p))) - 1 AS pos
      FROM pad
    )
    SELECT doc_id, word,
           cast(CASE WHEN word IS NULL THEN NULL ELSE pos END AS bigint) AS pos
    FROM ex
    """,
)
def fn_explode_outer(spark, sf_dir):
    """posexplode_outer — the OUTER explode semantic corner: a row
    whose array is EMPTY survives as one row with NULL element and
    NULL position, where plain explode silently deletes it.  That
    distinction is load-bearing in pipelines (a doc with no long
    words must not vanish from a per-doc rollup downstream).

    DuckDB has no outer unnest, so the oracle states the semantics
    explicitly: empty arrays are replaced by a one-NULL sentinel
    before unnesting.  Spark plans Generate(posexplode_outer) inline
    in the scan stage — a pure flatMap, zero shuffles, output bounded
    by total array length + empty-array count.
    """
    arr = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: F.length(w) > 8).alias("longw"),
    )
    return arr.select(
        "doc_id",
        F.posexplode_outer("longw").alias("pos", "word"),
    ).select("doc_id", "word", F.col("pos").cast("bigint").alias("pos"))
