"""Deterministic sampling and dataset splitting.

A 100 TB training-data pipeline needs samples and train/val/test splits
that are (a) reproducible across runs and engines, (b) stable under
re-partitioning and appends, and (c) computable without any global
state. Seed-based `df.sample()` gives none of that — its output depends
on partitioning and engine RNG. Instead we bucket every row by a prefix
of ``md5(key)``: the bucket is a pure function of the row's key, so the
same row lands in the same bucket in Spark, DuckDB, or any other
engine, today and after the table doubles.

Buckets are kept as the 2-hex-char *string* prefix (``'00'``..``'ff'``,
256 buckets): fixed-width lowercase hex compares lexicographically in
every engine, which sidesteps cross-engine hex-to-int conversion
entirely. Selecting ``bucket < '10'`` is exactly 16/256 = 6.25% of keys
in expectation, with zero coordination between executors — a narrow map
over the scan, no shuffle, fully pushdown-friendly.

This is the standard web-scale practice (hash-mod sharding of URLs /
doc ids for held-out sets); the reference has no counterpart — its
whole input fits one batch (`CsvDataHandler.cs:15-22` reads the file
in full), so sampling is a capability the 100 TB target adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table, scan_parallel
from ..plans.registry import register


def hash_bucket(key_col, n_hex_chars: int = 2) -> F.Column:
    """Deterministic bucket id for a key: the first ``n_hex_chars`` of
    ``md5(CAST(key AS STRING))``, as a lowercase hex string.

    16**n_hex_chars buckets; the string is engine-portable (DuckDB:
    ``substring(md5(CAST(key AS VARCHAR)), 1, n)``)."""
    return F.substring(F.md5(key_col.cast("string").cast("binary")), 1, n_hex_chars)


def with_split(
    df: DataFrame,
    key: str,
    val_frac_buckets: int = 16,
    test_frac_buckets: int = 16,
) -> DataFrame:
    """Assign train/val/test split labels from the key's hash bucket.

    The top ``test_frac_buckets`` of the 256 buckets are test, the next
    ``val_frac_buckets`` are val, the rest train (defaults: 6.25% each
    for val and test). Membership is a pure function of the key —
    appending data, re-partitioning, or recomputing on another engine
    never moves a row across splits, which is the property that keeps
    held-out sets uncontaminated over the life of a dataset."""
    b = hash_bucket(F.col(key))
    test_lo = _hex2(256 - test_frac_buckets)
    val_lo = _hex2(256 - test_frac_buckets - val_frac_buckets)
    return df.withColumn(
        "split",
        F.when(b >= test_lo, F.lit("test"))
        .when(b >= val_lo, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def _hex2(n: int) -> str:
    return format(n, "02x")


_SAMPLE_ORACLE = """
SELECT d.doc_id, d.source, d.n_chars,
       substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) AS bucket
FROM documents d
WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < '10'
ORDER BY d.doc_id
"""


@register("sample_hash_pct", oracle=_SAMPLE_ORACLE)
def sample_hash_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~6.25% sample of documents (md5 bucket < '10').

    Scale shape: narrow map + filter over the scan — no shuffle, no
    RNG, no driver coordination; the same doc ids are selected at any
    partitioning and on any engine."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    return (
        d.withColumn("bucket", b)
        .filter(F.col("bucket") < "10")
        .select("doc_id", "source", "n_chars", "bucket")
        # no orderBy: sampled output is corpus-sized at scale; the
        # driver compare is order-insensitive and a global sort is waste
    )


_SPLIT_ORACLE = """
SELECT doc_id,
       CASE WHEN b >= 'f0' THEN 'test'
            WHEN b >= 'e0' THEN 'val'
            ELSE 'train' END AS split
FROM (
  SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b
  FROM documents
) x
ORDER BY doc_id
"""


@register("split_train_test", oracle=_SPLIT_ORACLE)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-stable train/val/test assignment for every document
    (87.5/6.25/6.25). Checked row-by-row against the oracle so the
    split function itself — not just the split sizes — is pinned."""
    d = load_table(spark, sf_dir, "documents")
    return with_split(d, "doc_id").select("doc_id", "split")  # order-insensitive compare; no global sort


_STRATA_CUTOFF = (("en", "28"), ("de", "55"))  # hex bucket cutoffs: ~15.6%, ~33%
_DEFAULT_CUTOFF = "80"  # 50% for every other language


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
          CASE lang WHEN 'en' THEN '28' WHEN 'de' THEN '55' ELSE '80' END
    ORDER BY doc_id
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: each stratum (language) gets
    its own hash-bucket cutoff — the class-rebalancing primitive for
    training mixes (downsample the dominant language, keep the tail).
    Same md5-bucket mechanics as sample_hash_pct, so membership stays
    a pure function of the key: appends, repartitioning, or another
    engine never move a row in or out of the sample.

    Scale shape: narrow map + filter over the scan, zero shuffle; the
    per-stratum rate table is a literal CASE (broadcast-join a config
    table instead when strata number in the thousands).
    """
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    cutoff = F.lit(_DEFAULT_CUTOFF)
    for lang, cut in reversed(_STRATA_CUTOFF):
        cutoff = F.when(F.col("lang") == lang, F.lit(cut)).otherwise(cutoff)
    return (
        d.select("doc_id", "lang", b.alias("bucket"))
        .filter(F.col("bucket") < cutoff)
        # no orderBy: corpus-sized at scale, compare is order-insensitive
    )


# --- sample_weighted --------------------------------------------------

_HEX = "0123456789abcdef"
# u24 = the first 6 hex digits of md5(key) folded to an integer in
# [0, 16^6). Each digit comes from instr() (1-based in both engines);
# all arithmetic is small-integer-exact in double.
_SQL_U24 = (
    "("
    + " + ".join(
        f"(instr('{_HEX}', substring(h, {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
        for i in range(6)
    )
    + ")"
)


@register(
    "sample_weighted",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity, u24
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             CAST({_SQL_U24} AS BIGINT) AS u24
      FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               md5(CAST(l_orderkey AS VARCHAR) || '_'
                   || CAST(l_linenumber AS VARCHAR)) AS h
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL) a) b
    WHERE CAST(u24 AS DOUBLE) < (l_quantity / 50.0) * 16777216.0
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sampling with a per-row keep probability
    (here ∝ l_quantity) and ZERO randomness: the row's uniform draw is
    the first 24 bits of md5(row key) — importance sampling for
    training mixes (keep long/high-quality documents with higher
    probability) that is reproducible across runs, partitionings and
    engines, because membership is a pure function of (key, weight).

    The hex→int fold uses instr() against a constant digit string —
    1-based and identical in Spark and DuckDB — so no engine-specific
    hex-parsing builtin is in the path; the keep test compares two
    exactly-computed doubles (a 24-bit integer vs weight·2^24).

    Scale shape: narrow map + filter over the scan, no shuffle; the
    filter is a deterministic expression so AQE/codegen fuse it into
    the scan stage. Expected sample rate here = avg(quantity)/50 ≈ 51%.
    """
    l = load_table(spark, sf_dir, "lineitem")
    # Membership is a pure function of the row KEY — a row with a NULL
    # key part has no deterministic draw, so it is excluded rather
    # than hashed from a partial key (concat_ws silently skips NULLs,
    # which would sample such rows from a DIFFERENT key than any
    # engine propagating NULL would use; fuzz-pinned).
    # scan_parallel (OPTIMIZATION_r13): one md5 + six instr folds per
    # row is real narrow-map CPU pinned to the scan tasks; placed
    # after the pushdown-eligible notnull filter.
    keyed = scan_parallel(
        l.filter(
            F.col("l_orderkey").isNotNull() & F.col("l_linenumber").isNotNull()
        ),
        "l_orderkey",
        "l_linenumber",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.md5(
            F.concat_ws(
                "_",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            ).cast("binary")
        ).alias("h"),
    )
    u24 = F.expr(_SQL_U24).cast("bigint")
    return (
        keyed.withColumn("u24", u24)
        .filter(
            F.col("u24").cast("double")
            < (F.col("l_quantity") / F.lit(50.0)) * F.lit(16777216.0)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "u24")
        # no orderBy: sampled output is corpus-sized at scale
    )


# --- temporal (leakage-aware) split -----------------------------------

_T_TRAIN_END = "2024-01-22 00:00:00"  # ~70% of the Jan 2024 events span
_T_VAL_END = "2024-01-27 00:00:00"    # next ~17%; rest = test


@register(
    "split_temporal",
    oracle=f"""
    SELECT event_id, user_id,
           CASE WHEN ts < TIMESTAMP '{_T_TRAIN_END}' THEN 'train'
                WHEN ts < TIMESTAMP '{_T_VAL_END}' THEN 'val'
                ELSE 'test' END AS split
    FROM events
    """,
)
def split_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/val/test assignment — the leakage-aware split
    for anything with a time axis (forecasting, ranking, event
    prediction): train strictly precedes validation strictly precedes
    test, so no future information crosses a boundary. The
    hash-stable `split_train_test` is the right tool for exchangeable
    documents; THIS is the right tool when rows are ordered by time —
    mixing them up is the classic offline/online metric gap.

    Pure narrow map (two timestamp comparisons fused into the scan);
    the boundary literals prune cleanly against partition/row-group
    min-max stats when the table is date-partitioned, so at 100 TB a
    "train only" read touches only train-range files.
    """
    e = load_table(spark, sf_dir, "events")
    split = (
        F.when(F.col("ts") < F.lit(_T_TRAIN_END).cast("timestamp"), "train")
        .when(F.col("ts") < F.lit(_T_VAL_END).cast("timestamp"), "val")
        .otherwise("test")
    )
    return e.select("event_id", "user_id", split.alias("split"))


# --- epoch-weighted source mixture ------------------------------------

def _sql_u24_of(col: str) -> str:
    """The `_SQL_U24` hex→int fold re-targeted at another md5 column."""
    return _SQL_U24.replace("(h,", f"({col},")


# The per-source epoch weight, held in 2^-24 fixed point so every step
# is integer-exact in both engines: W = w * 2^24 = 2^22 + 2*u24(source)
# ⇒ w ∈ [0.25, 2.25). floor(w) full copies plus one more iff the doc's
# own 24-bit draw falls below frac(w)·2^24.
_MIX_SQL = f"""
WITH src AS (
  SELECT doc_id, source,
         md5(source) AS hs,
         md5(CAST(doc_id AS VARCHAR) || '_mix') AS hd
  FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL),
u AS (
  SELECT doc_id, source,
         CAST({_sql_u24_of('hs')} AS BIGINT) AS us,
         CAST({_sql_u24_of('hd')} AS BIGINT) AS ud
  FROM src),
n AS (
  SELECT doc_id, source,
         CAST(((4194304 + 2*us) // 16777216)
              + CASE WHEN ud < ((4194304 + 2*us) % 16777216)
                     THEN 1 ELSE 0 END AS BIGINT) AS n_copies
  FROM u)
SELECT doc_id, source, CAST(g.copy_idx AS BIGINT) AS copy_idx
FROM n, LATERAL (SELECT UNNEST(generate_series(CAST(0 AS BIGINT),
                  n_copies - 1)) AS copy_idx) g
"""


@register("sample_mixture_epochs", oracle=_MIX_SQL)
def sample_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted source mixture — the pretraining-mix step that
    upsamples high-value sources (>1 epoch) and downsamples the rest
    (<1 epoch), emitting the replicated corpus `(doc_id, source,
    copy_idx)` a trainer would consume.

    Every decision is a pure integer function of (source, doc_id):
    the source's epoch weight lives in 2^-24 fixed point (w ∈
    [0.25, 2.25), derived here from md5(source) so the op needs no
    config table; a production mix would broadcast-join one), a doc
    gets floor(w) guaranteed copies, and the fractional remainder is
    resolved per-doc by comparing an independent 24-bit md5 draw
    against frac(w)·2^24 — so realized epochs converge to w per
    source, membership is reproducible across runs/partitionings/
    engines, and no float ever enters the path. Rows with a NULL
    doc_id or source have no deterministic draw/weight and are
    excluded by contract (same rule as sample_weighted).

    Scale shape: narrow map + explode bounded by 3 copies — zero
    shuffle, no per-row Python, fused into the scan stage. The same
    fixed-point construction extends to any weight range by widening
    the integer, never by introducing doubles.
    """
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull() & F.col("source").isNotNull()
    )
    d = d.select(
        "doc_id",
        "source",
        F.md5(F.col("source").cast("binary")).alias("hs"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit("_mix")).cast("binary")
        ).alias("hd"),
    )
    d = d.select(
        "doc_id",
        "source",
        F.expr(_sql_u24_of("hs")).cast("bigint").alias("us"),
        F.expr(_sql_u24_of("hd")).cast("bigint").alias("ud"),
    )
    w24 = F.lit(4194304) + F.lit(2) * F.col("us")
    n = (
        F.expr("(4194304 + 2*us) div 16777216")
        + (F.col("ud") < w24 % F.lit(16777216)).cast("bigint")
    ).cast("bigint")
    d = d.withColumn("n_copies", n)
    return d.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.col("n_copies") > 0,
                F.sequence(F.lit(0).cast("bigint"), F.col("n_copies") - 1),
            )
        ).alias("copy_idx"),
    )


# --- exact-K deterministic stratified sample --------------------------

_EXACT_K = 10  # rows kept per stratum


@register(
    "sample_exact_k_stratified",
    oracle=f"""
    SELECT doc_id, source, k_rank FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
             ) AS BIGINT) AS k_rank
      FROM documents WHERE doc_id IS NOT NULL) r
    WHERE k_rank <= {_EXACT_K}
    """,
)
def sample_exact_k_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY min(K, n) documents per source, chosen deterministically
    — the eval-set / spot-check carving op where a rate-based sample
    (`sample_stratified`) is the wrong tool because the contract is a
    COUNT, not a probability. The per-stratum order is md5(doc_id)
    (uniform, content-independent) with doc_id as total tiebreak, so
    the selection is a pure function of the keys: stable across runs,
    partitionings, engines, and appends of non-selected rows. NULL
    doc_id rows have no deterministic draw and are excluded; a NULL
    source forms its own stratum (same grouping rule both engines).

    Scale shape: the rank filter compiles to WindowGroupLimit
    (plan-pinned) — each input partition keeps only its local top-K
    per stratum BEFORE the shuffle, so the exchange carries at most
    K * strata * partitions rows, not the corpus."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("k_rank"))
        .where(F.col("k_rank") <= _EXACT_K)
        .select("doc_id", "source", F.col("k_rank").cast("bigint").alias("k_rank"))
    )


# --- deterministic epoch shuffle -> shard plan -------------------------

_SHUF_EPOCH = 0     # epoch salt: vary to reshuffle between epochs
_SHUF_SHARDS = 64   # shards per epoch (production: thousands)


@register(
    "shuffle_epoch_shards",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id,
             CAST(concat('0x', substring(
               md5('epoch{_SHUF_EPOCH}:' || CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) AS h,
             CAST(CEIL(LENGTH(text)/4.0) AS BIGINT) AS n_tokens
      FROM documents WHERE doc_id IS NOT NULL),
    s AS MATERIALIZED (
      SELECT doc_id, h, CAST(h % {_SHUF_SHARDS} AS BIGINT) AS shard, n_tokens
      FROM t)
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS position,
           n_tokens
    FROM s
    """,
)
def shuffle_epoch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The epoch-shuffle SHARD PLAN — the last ordering step before a
    trainer reads data: every document gets a deterministic
    pseudo-random position (shard, position-within-shard) for the
    epoch, derived purely from ``md5(epoch_salt || doc_id)``. Varying
    the salt reshuffles between epochs; nothing depends on partitioning
    or engine RNG, so the order is reproducible across runs, engines,
    appends of other docs, and restarts mid-epoch (the property
    df.orderBy(rand()) famously lacks). ``n_tokens`` (the chars/4
    estimator shared with text_pack_sequences) rides along so the
    shard writer can also budget sequences. NULL doc_id rows have no
    deterministic draw and are excluded; NULL text keeps its slot with
    NULL n_tokens (a shard writer places every document).

    Scale shape: one narrow hash map, then ONE shuffle partitioned by
    shard with a per-shard sort on the hash — which is precisely the
    physical work a production shard writer does anyway (the op IS the
    shuffle, not overhead around it). No global window: each of the
    {_SHUF_SHARDS} shards sorts independently (production uses
    thousands of shards, so per-shard sorts stay executor-sized and
    spill-friendly). Downstream, writing shard files in position order
    is a partitionBy write of this exact relation.
    """
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    return epoch_shards_frame(
        d.select(
            "doc_id",
            F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_tokens"),
        )
    )


def epoch_shards_frame(s: DataFrame) -> DataFrame:
    """:func:`shuffle_epoch_shards`'s body over an ARBITRARY
    ``(doc_id, n_tokens)`` relation (the registered key feeds the
    chars/4 estimator; real BPE counts drop in the same way as
    :func:`token_budget_frame`'s). ``doc_id`` must be non-null and
    unique; ``n_tokens`` passes through untouched (NULL keeps its
    slot — a shard writer places every document). Append contract
    (pinned by a hypothesis property in tests/test_properties.py):
    appending documents never moves an existing doc to another shard,
    never reorders existing docs within a shard, and shifts positions
    only in the shards the appended docs hash into."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"epoch{_SHUF_EPOCH}:"), F.col("doc_id").cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    s = s.select(
        "doc_id",
        h.alias("h"),
        (h % _SHUF_SHARDS).cast("bigint").alias("shard"),
        "n_tokens",
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return s.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("position"),
        "n_tokens",
    )

_BUDGET_TOKENS = 1000  # per-source token budget (chars/4 estimator)
_BUDGET_B1 = 1 << 44  # h-space per level-1 prefix-sum bucket (2^60/2^44 = 2^16 buckets/source max)


def token_budget_frame(
    s: DataFrame, budget: int = _BUDGET_TOKENS
) -> DataFrame:
    """:func:`sample_token_budget`'s body over an ARBITRARY
    ``(doc_id, source, n_tokens)`` relation — the token counter is a
    parameter, not baked in (VERDICT r8 item 3): the registered key
    feeds the chars/4 estimator, and a real pipeline feeds
    ``text_bpe_encode``'s per-document BPE token counts through the
    same plan (wired in tests/test_sampling.py). ``doc_id`` must be
    non-null (the deterministic draw hashes it) and unique; same
    two-level prefix-sum shape as documented on the registered key."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    s = s.select(
        "doc_id",
        "source",
        h.alias("h"),
        F.coalesce(F.col("n_tokens").cast("bigint"), F.lit(0)).alias("n_tokens"),
    ).withColumn("b1", F.expr(f"h div {_BUDGET_B1}"))
    w1 = (
        Window.partitionBy("source", "b1")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = s.withColumn("within", F.coalesce(F.sum("n_tokens").over(w1), F.lit(0)))
    t1 = s.groupBy("source", "b1").agg(F.sum("n_tokens").alias("btot"))
    w2 = (
        Window.partitionBy("source")
        .orderBy("b1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = t1.select(
        F.col("source").alias("o_source"),
        F.col("b1").alias("o_b1"),
        F.coalesce(F.sum("btot").over(w2), F.lit(0)).alias("off"),
    )
    joined = s.join(
        offs,
        s["source"].eqNullSafe(F.col("o_source")) & (s["b1"] == F.col("o_b1")),
    )
    cum = (F.col("off") + F.col("within") + F.col("n_tokens")).cast("bigint")
    return joined.select(
        "doc_id",
        "source",
        "n_tokens",
        cum.alias("cum_tokens"),
        (cum <= budget).alias("kept"),
    )


@register(
    "sample_token_budget",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, source,
             CAST(concat('0x', substring(
               md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) AS h,
             CAST(COALESCE(CEIL(LENGTH(text)/4.0), 0) AS BIGINT) AS n_tokens
      FROM documents WHERE doc_id IS NOT NULL)
    SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens,
           SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             <= {_BUDGET_TOKENS} AS kept
    FROM t
    """,
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN-BUDGET cap — the mixture-control primitive
    dataset curation runs after quality gates: every source (domain)
    contributes documents, in a deterministic pseudo-random order,
    only until its token budget ({_BUDGET_TOKENS} here) is spent.
    This is how over-represented domains get capped without
    per-document randomness: order within source by
    md5('budget:' || doc_id) — reproducible across runs, engines,
    partitionings, and appends of OTHER sources' docs (a new doc in
    source A never changes which of source B's docs survive) — and
    keep while the running (inclusive) token total stays inside the
    budget. Emits the full audit ledger (doc_id, source, n_tokens,
    cum_tokens, kept); the kept corpus is one filter away. n_tokens is
    the chars/4 estimator shared with text_pack_sequences /
    shuffle_epoch_shards; NULL text counts 0 (a budget gate places
    every document), NULL doc_id rows have no deterministic draw and
    are excluded (same contract as shuffle_epoch_shards). The token
    counter is a PARAMETER: :func:`token_budget_frame` takes any
    (doc_id, source, n_tokens) relation, so real BPE counts from
    text_bpe_encode drop in without a new registry key (VERDICT r8
    item 3; the wiring is exercised in tests/test_sampling.py).

    Scale shape: the running sum within each source is the
    text_pack_sequences hazard (a naive PARTITION BY source window
    puts an entire domain — possibly 30% of a 100 TB lake — in one
    partition), so it gets the same two-level distributed prefix-sum:
    within-(source, h-bucket) exclusive running sums are partitioned
    windows over ~|source|/2^16-sized slices, per-bucket totals
    prefix-sum within source over <=2^16 tiny rows, offsets join back
    null-safely on (source, bucket). Physical shape (verified via
    executedPlan at sf0.1): two NARROW scans — the window path and the
    bucket-total aggregate re-derive from the parquet scan instead of
    materializing anything corpus-sized — one shuffle each to
    (source, bucket), and the bucket-count-sized offset relation
    broadcasts back. The bucket key is h div 2^44 — a PREFIX of the
    60-bit order key, so bucket order refines h order exactly.
    """
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    return token_budget_frame(
        d.select(
            "doc_id",
            "source",
            F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_tokens"),
        )
    )
