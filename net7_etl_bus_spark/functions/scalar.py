"""Scalar function surface: string / date / math / array / map / JSON
(SURVEY.md §2.3 ``fn_*``) plus the reference's derived-key helper.

All hot-path expressions are built-in ``pyspark.sql.functions`` —
JVM-side, inside WholeStageCodegen, never Python. Functions chosen for
the oracle-checked registry are ones with identical cross-engine
semantics (no locale-, libm- or regex-dialect-sensitive behavior).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..plans.registry import register

# ASCII-only case mapping (engine spec; see operators/dedup.py _NORM
# comment: full Unicode case mapping is library-defined and diverges
# between Java and utf8proc — translate() is a pure codepoint map).
_AUC = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ALC = "abcdefghijklmnopqrstuvwxyz"


def _aupper(c):
    return F.translate(c, _ALC, _AUC)


def _alower(c):
    return F.translate(c, _AUC, _ALC)



def composite_key(zip_col: Column | str, state_col: Column | str) -> Column:
    """``f"{zip}_{stateCode}"`` — the reference's upsert/dedup key
    (reference Utilities/ZipCodeHelpers.cs:11-14). Zip codes cross
    state borders, so neither column alone is a key."""
    z = F.col(zip_col) if isinstance(zip_col, str) else zip_col
    s = F.col(state_col) if isinstance(state_col, str) else state_col
    return F.concat_ws("_", z, s)


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           translate(c_name, 'abcdefghijklmnopqrstuvwxyz', 'ABCDEFGHIJKLMNOPQRSTUVWXYZ') AS name_uc,
           translate(c_mktsegment, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS seg_lc,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           CONCAT_WS('#', c_name, c_mktsegment) AS tagged,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           TRIM('  ' || c_name || '  ') AS name_trimmed,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           CONTAINS(c_name, '001') AS has_001
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        _aupper(F.col("c_name")).alias("name_uc"),
        _alower(F.col("c_mktsegment")).alias("seg_lc"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws("#", "c_name", "c_mktsegment").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.contains(F.col("c_name"), F.lit("001")).alias("has_001"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           DATE_TRUNC('month', o_orderdate) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_dom,
           DATE_TRUNC('day', o_orderdate) + INTERVAL 30 DAY AS due_date,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_dom"),
        (F.date_trunc("day", "o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 50000.0) AS dev_from_50k,
           CAST(ROUND(l_extendedprice, 1) AS DOUBLE) AS price_r1,
           CASE WHEN isnan(l_quantity) OR abs(l_quantity) >= 9e18 THEN NULL
                ELSE CAST(FLOOR(l_quantity / 10.0) AS BIGINT) END AS qty_decile,
           CASE WHEN isnan(l_discount) OR abs(l_discount) >= 9e16 THEN NULL
                ELSE CAST(CEIL(l_discount * 100.0) AS BIGINT) END AS disc_pct_ceil,
           CASE WHEN l_extendedprice < 0 THEN CAST('NaN' AS DOUBLE)
                ELSE SQRT(l_extendedprice) END AS price_sqrt,
           CASE WHEN isnan(l_quantity) OR abs(l_quantity) >= 9e18 THEN NULL
                ELSE CAST(l_quantity AS BIGINT) % 7 END AS qty_mod7,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate,
           CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions restricted to IEEE-exact ops (abs/round/floor/
    ceil/sqrt/mod/greatest/least/sign) — transcendentals (ln, pow) are
    excluded from the oracle set because libm implementations may
    differ by 1 ulp across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("dev_from_50k"),
        F.round("l_extendedprice", 1).cast("double").alias("price_r1"),
        # try-cast posture for double->integer paths (extremes fuzz):
        # NaN/Inf/out-of-int64 values yield NULL explicitly — Spark's
        # floor/ceil/cast otherwise SATURATE at +/-2^63 silently while
        # a strict engine errors; neither is an acceptable answer.
        F.when(
            ~F.isnan("l_quantity") & (F.abs("l_quantity") < F.lit(9e18)),
            F.floor(F.col("l_quantity") / 10.0),
        ).alias("qty_decile"),
        F.when(
            ~F.isnan("l_discount") & (F.abs("l_discount") < F.lit(9e16)),
            F.ceil(F.col("l_discount") * 100.0),
        ).alias("disc_pct_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.when(
            ~F.isnan("l_quantity") & (F.abs("l_quantity") < F.lit(9e18)),
            F.col("l_quantity").cast("bigint") % 7,
        ).alias("qty_mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@register(
    "fn_array",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS tokens FROM documents
    )
    SELECT doc_id,
           CAST(len(tokens) AS INT) AS n_tokens,
           tokens[1] AS first_token,
           tokens[len(tokens)] AS last_token,
           array_to_string(tokens[1:3], ' ') AS first_trigram,
           CAST(list_contains(tokens, 'spark') AS BOOLEAN) AS mentions_spark
    FROM toks
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized text (split/size/element_at/
    slice/array_contains) — all higher-order-function-adjacent built-ins,
    no UDF."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("tokens"))
    return toks.select(
        "doc_id",
        F.size("tokens").cast("int").alias("n_tokens"),
        F.element_at("tokens", 1).alias("first_token"),
        F.element_at("tokens", -1).alias("last_token"),
        # concat_ws returns '' (never NULL) on a NULL array — the
        # engine's posture is SQL null propagation, so guard it.
        F.when(
            F.col("tokens").isNotNull(), F.concat_ws(" ", F.slice("tokens", 1, 3))
        ).alias("first_trigram"),
        F.array_contains("tokens", "spark").alias("mentions_spark"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id, event_type,
           CASE event_type
             WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 3
             WHEN 'signup' THEN 4 WHEN 'error' THEN 5 ELSE -1
           END AS type_code,
           CASE WHEN event_type IN ('click','view','purchase','signup','error')
                THEN TRUE ELSE FALSE END AS known_type
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type usage: a broadcast-literal map column with element_at
    lookup. The oracle expresses the same lookup as CASE — the check
    compares resulting values, exercising that Spark's MapType lookup
    semantics (missing key -> NULL) are handled."""
    e = load_table(spark, sf_dir, "events")
    code_map = F.create_map(
        F.lit("click"), F.lit(1),
        F.lit("view"), F.lit(2),
        F.lit("purchase"), F.lit(3),
        F.lit("signup"), F.lit(4),
        F.lit("error"), F.lit(5),
    )
    looked_up = F.element_at(code_map, F.col("event_type"))
    return e.select(
        "event_id",
        "event_type",
        F.coalesce(looked_up, F.lit(-1)).alias("type_code"),
        looked_up.isNotNull().alias("known_type"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS k_str,
           CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INT) AS k_int,
           CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.missing') END AS VARCHAR) AS missing_field
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events ``props`` payload —
    get_json_object stays JVM-side; at 100 TB prefer from_json with an
    explicit schema once the payload shape is known (single parse,
    typed struct, prunable).

    Malformed-input semantics are the ENGINE's (Spark/Jackson): a
    syntactically invalid payload yields NULL, and a payload with
    trailing garbage parses as its LEADING document. DuckDB's JSON
    parser is strict (rejects trailing garbage), so the oracle guards
    with json_valid() and agrees on valid and invalid-everywhere
    inputs; leading-document leniency is the one documented
    divergence, and the strictness is not expressible in either
    direction without a Python UDF in the hot path."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@register(
    "fn_json_typed",
    oracle="""
    SELECT event_id,
           CAST(CASE WHEN json_valid(props) THEN json_extract(props, '$.k') END AS INT) AS k
    FROM events
    """,
)
def fn_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with explicit schema — the scale path: one parse into
    a typed struct instead of N get_json_object passes."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    e = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType())])
    return e.select(
        "event_id", F.from_json("props", schema).getField("k").alias("k")
    )


@register(
    "checksum_sha256",
    oracle="""
    SELECT doc_id, sha256(text) AS text_sha256, md5(text) AS text_md5
    FROM documents
    """,
)
def checksum_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed content checksumming (the reference's SHA-256 file
    identity, Utilities/FileSystem.cs:17-24, generalized to per-record
    content hashes). Lower-hex output matches across engines."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.col("text")).alias("text_md5"),
    )


@register(
    "fn_array_hof",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS w FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(w, t -> length(t) > 4)) AS INT) AS n_long_tokens,
           array_to_string(list_transform(w[1:5], t -> translate(t, 'abcdefghijklmnopqrstuvwxyz', 'ABCDEFGHIJKLMNOPQRSTUVWXYZ')), ' ') AS first5_upper,
           CAST(CASE WHEN w IS NULL THEN NULL ELSE
                list_reduce(list_prepend(0, list_transform(w, t -> length(t))),
                            (acc, v) -> acc + v) END AS BIGINT) AS total_chars,
           CAST(length(list_filter(w, t -> t = 'the')) > 0 AS BOOLEAN) AS has_the
    FROM toks
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions with lambdas — transform / filter /
    aggregate / exists over token arrays, all JVM-side (no UDF). These
    are the per-row kernels that keep array-heavy schemas (embeddings,
    token lists, shingles) out of Python at 100 TB; the similarity
    operators build their cosine folds from the same primitives."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(_alower(F.trim(F.col("text"))), " ").alias("w")
    )
    return toks.select(
        "doc_id",
        F.size(F.filter("w", lambda t: F.length(t) > 4)).cast("int").alias(
            "n_long_tokens"
        ),
        F.when(  # concat_ws is ''-on-NULL; propagate the NULL instead
            F.col("w").isNotNull(),
            F.concat_ws(" ", F.transform(F.slice("w", 1, 5), lambda t: _aupper(t))),
        ).alias("first5_upper"),
        F.aggregate(
            F.transform("w", lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("total_chars"),
        F.exists("w", lambda t: t == "the").alias("has_the"),
    )


@register(
    "fn_try_safe",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS VARCHAR)
                         ELSE event_type END AS BIGINT) AS mixed_cast,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE CAST(10 AS DOUBLE) / (event_id % 3) END AS safe_div,
           string_split(event_type, 'i')[2] AS second_chunk,
           string_split(event_type, 'i')[99] AS oob_element
    FROM events
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant function surface (the malformed-input posture an
    ingestion bus needs): try_cast yields NULL instead of failing the
    batch (exercised on a half-numeric/half-word column so both paths
    appear), try_divide turns division-by-zero into NULL, and
    out-of-bounds element access is NULL — one malformed cell
    quarantines itself rather than aborting 10^9 good rows. Pure
    narrow map; in ANSI mode these are the only non-throwing variants,
    which is why the surface matters.
    """
    e = load_table(spark, sf_dir, "events")
    mixed = F.when(
        F.col("event_id") % 2 == 0, F.col("event_id").cast("string")
    ).otherwise(F.col("event_type"))
    chunks = F.split("event_type", "i")
    return e.select(
        "event_id",
        mixed.try_cast("bigint").alias("mixed_cast"),
        F.try_divide(F.lit(10).cast("double"), (F.col("event_id") % 3)).alias(
            "safe_div"
        ),
        F.try_element_at(chunks, F.lit(2)).alias("second_chunk"),
        F.try_element_at(chunks, F.lit(99)).alias("oob_element"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INTEGER) AS k_int,
           CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS VARCHAR) AS k_str,
           CASE WHEN json_valid(props) THEN json_extract_string(props, '$.missing') END AS absent
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse_json once into
    an open-schema variant value, then typed variant_get extraction —
    the engine-native path for JSON columns whose schema drifts, vs
    the fixed-schema from_json in extract_nested_json. Missing paths
    yield NULL, not errors. Narrow map; the variant parse happens one
    time per row regardless of how many paths are extracted.
    """
    e = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed payloads (routine in web-scale data)
    # must yield NULL variants, not task failures - the oracle
    # mirrors with json_valid() guards (DuckDB json fns THROW on
    # malformed input where Spark returns NULL; unicode fuzz-found).
    v = F.try_parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(F.parse_json("props"), "$.missing", "string").alias("absent"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS and_mask,
           CAST(l_orderkey | 15 AS BIGINT) AS or_mask,
           CAST(xor(l_orderkey, l_linenumber) AS BIGINT) AS xored,
           CAST(l_orderkey << 2 AS BIGINT) AS shl2,
           CAST(l_orderkey >> 3 AS BIGINT) AS shr3
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise integer surface (and/or/xor/shifts) — the primitives
    under bitmap indexes, bloom hashing, and bit-packed feature flags.
    Exact integer ops, so cross-engine equality is trivial; narrow
    map, codegen'd."""
    l = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("and_mask"),
        k.bitwiseOR(F.lit(15)).cast("bigint").alias("or_mask"),
        k.bitwiseXOR(F.col("l_linenumber")).cast("bigint").alias("xored"),
        F.shiftleft(k, 2).cast("bigint").alias("shl2"),
        F.shiftright(k, 3).cast("bigint").alias("shr3"),
    )


@register(
    "fn_encoding",
    oracle="""
    SELECT doc_id,
           to_base64(CAST(substring(text, 1, 24) AS BLOB)) AS head_b64,
           hex(CAST(substring(text, 1, 8) AS BLOB)) AS head_hex,
           (CAST(from_base64(to_base64(CAST(substring(text, 1, 24) AS BLOB))) AS VARCHAR)
            = substring(text, 1, 24)) AS b64_roundtrip
    FROM documents
    """,
)
def fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding surface (base64/hex + round-trip proof) — the
    transport encodings for opaque payloads (the multimodal binary
    columns ship this way through JSON APIs). ASCII fixture text means
    byte semantics are identical cross-engine; narrow map."""
    d = load_table(spark, sf_dir, "documents")
    head24 = F.substring("text", 1, 24)
    return d.select(
        "doc_id",
        F.base64(head24.cast("binary")).alias("head_b64"),
        F.hex(F.substring("text", 1, 8).cast("binary")).alias("head_hex"),
        (
            F.unbase64(F.base64(head24.cast("binary"))).cast("string") == head24
        ).alias("b64_roundtrip"),
    )


@register(
    "fn_regexp",
    oracle=r"""
    SELECT o.o_orderkey,
           regexp_extract(o.o_orderpriority, '([0-9])-([A-Z]+)', 1) AS prio_num,
           regexp_extract(o.o_orderpriority, '([0-9])-([A-Z]+)', 2) AS prio_word,
           regexp_matches(c.c_name, 'Customer#0*[17]') AS name_flag,
           regexp_replace(c.c_name, '#0+', '#') AS name_short,
           CAST(len(regexp_extract_all(o.o_orderpriority, '[A-Z]{3,}')) AS BIGINT)
             AS n_caps_words
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function surface: extract (by group), match test,
    replace, and match counting — confined to the Java/RE2 common
    subset (character classes, bounded repetition, capture groups; no
    backrefs, no lookaround) so both engines see identical matches.

    Scale shape: narrow codegen'd maps over the scan plus one
    broadcast dimension join, like fn_string.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), c.c_custkey == o.o_custkey).select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"([0-9])-([A-Z]+)", 1).alias("prio_num"),
        F.regexp_extract("o_orderpriority", r"([0-9])-([A-Z]+)", 2).alias("prio_word"),
        F.rlike(F.col("c_name"), F.lit(r"Customer#0*[17]")).alias("name_flag"),
        F.regexp_replace("c_name", r"#0+", "#").alias("name_short"),
        F.size(F.regexp_extract_all("o_orderpriority", F.lit(r"[A-Z]{3,}"), F.lit(0)))
        .cast("bigint")
        .alias("n_caps_words"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 35 THEN 'medium'
                ELSE 'large' END AS qty_band,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS return_state,
           LEAST(l_quantity, l_discount * 100) AS least_v,
           GREATEST(l_quantity, l_discount * 100) AS greatest_v,
           CASE WHEN l_tax > l_discount THEN l_tax ELSE l_discount END AS max_rate
    FROM lineitem
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-expression surface: CASE laddering, NULLIF/COALESCE
    null plumbing, LEAST/GREATEST — the branch-free conditional kernel
    every cleansing pipeline is made of. All comparisons are on exact
    doubles or on products of identical operands, so the selected
    branches agree across engines.

    Scale shape: narrow codegen'd maps, zero shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    d100 = F.col("l_discount") * 100
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 35, "medium")
        .otherwise("large")
        .alias("qty_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "return_state"
        ),
        F.least(F.col("l_quantity"), d100).alias("least_v"),
        F.greatest(F.col("l_quantity"), d100).alias("greatest_v"),
        F.when(F.col("l_tax") > F.col("l_discount"), F.col("l_tax"))
        .otherwise(F.col("l_discount"))
        .alias("max_rate"),
    )
