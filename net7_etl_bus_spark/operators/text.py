"""Text analysis operators for training-data curation (SURVEY.md §2.3
/ BASELINE.json north star): stats, quality scoring, token counting,
language ID heuristic, document fingerprinting.

Everything is built-in expression work (split / higher-order functions
/ md5) — JVM-side, codegen'd, zero Python in the hot path. All outputs
are integer arithmetic or single IEEE divisions, so they are
oracle-hashable without rounding tricks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import FIXTURES_DIR, load_table, scan_parallel
from ..plans.registry import register
from .dedup import _ASCII_LC as _ALC, _ASCII_UC as _AUC, normalized_text

_NORM = "translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"  # ASCII-only case fold; see operators/dedup.py
_SQL_W = f"string_split({_NORM}, ' ')"


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id, lang, source,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_measured,
           n_chars AS n_chars_declared,
           CAST(len({_SQL_W}) AS BIGINT) AS n_words,
           CAST(LENGTH(REPLACE({_NORM}, ' ', '')) AS DOUBLE) / len({_SQL_W}) AS avg_word_len,
           CAST(len(list_distinct({_SQL_W})) AS BIGINT) AS n_distinct_words,
           CAST(len(list_distinct({_SQL_W})) AS DOUBLE) / len({_SQL_W}) AS ttr
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document statistics: char/word counts, average word length,
    type-token ratio. Narrow map over the corpus — scales with bytes
    scanned, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(normalized_text("text"), " ")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars_measured"),
        F.col("n_chars").alias("n_chars_declared"),
        F.size(w).cast("bigint").alias("n_words"),
        (
            F.length(F.replace(normalized_text("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(w)
        ).alias("avg_word_len"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct_words"),
        (F.size(F.array_distinct(w)).cast("double") / F.size(w)).alias("ttr"),
    )


_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
_SQL_STOP = ", ".join(f"'{s}'" for s in _STOPWORDS)


@register(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_W} AS w, LENGTH(text) AS nc FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(w, x -> x IN ({_SQL_STOP}))) AS BIGINT) AS n_stopwords,
           CAST(len(list_filter(w, x -> x IN ({_SQL_STOP}))) AS DOUBLE) / len(w) AS stopword_ratio,
           CAST(len(list_filter(w, x -> LENGTH(x) > 12)) AS BIGINT) AS n_long_words,
           (nc BETWEEN 100 AND 20000) AND
             (CAST(len(list_filter(w, x -> x IN ({_SQL_STOP}))) AS DOUBLE) / len(w) >= 0.01)
             AS passes_quality
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate in the Gopher/C4 style (length bounds + stopword
    ratio + long-word screen), expressed as pure column filters so it
    composes with any scan."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(normalized_text("text"), " ")
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*_STOPWORDS)))
    stop_ratio = stop_hits.cast("double") / F.size(w)
    return d.select(
        "doc_id",
        stop_hits.cast("bigint").alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        F.size(F.filter(w, lambda x: F.length(x) > 12)).cast("bigint").alias("n_long_words"),
        (
            (F.length("text") >= 100) & (F.length("text") <= 20000) & (stop_ratio >= 0.01)
        ).alias("passes_quality"),
    )


@register(
    "text_token_count",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_W} AS w, LENGTH(text) AS nc FROM documents)
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS ws_tokens,
           CAST(CEIL(nc / 4.0) AS BIGINT) AS char_est_tokens,
           CAST(CASE WHEN w IS NULL THEN NULL ELSE
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(w, x -> CAST(CEIL(LENGTH(x) / 4.0) AS BIGINT))),
                (acc, v) -> acc + v) END AS BIGINT) AS subword_est_tokens
    FROM t
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, the chars/4 heuristic, and a
    BPE-ish per-word ceil(len/4) subword estimate — integer arithmetic
    only, so cross-engine exact."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(normalized_text("text"), " ")
    subword = F.aggregate(
        F.transform(w, lambda x: F.ceil(F.length(x) / 4.0).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return d.select(
        "doc_id",
        F.size(w).cast("bigint").alias("ws_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("char_est_tokens"),
        subword.cast("bigint").alias("subword_est_tokens"),
    )


# Tiny per-language marker lists for the n-gram/stopword heuristic.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "es": ("el", "la", "que", "es"),
    "fr": ("le", "la", "et", "est"),
}


def _sql_lang_hits(lang: str) -> str:
    toks = ", ".join(f"'{t}'" for t in _LANG_MARKERS[lang])
    return f"len(list_filter(w, x -> x IN ({toks})))"


@register(
    "text_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang AS lang_declared, {_SQL_W} AS w FROM documents),
    hits AS (
      SELECT doc_id, lang_declared,
             {', '.join(f'{_sql_lang_hits(lg)} AS hits_{lg}' for lg in _LANG_MARKERS)}
      FROM t
    )
    SELECT doc_id, lang_declared,
           CASE
             WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
             WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
             WHEN hits_es >= hits_fr THEN 'es'
             ELSE 'fr'
           END AS lang_predicted,
           CAST(hits_en + hits_de + hits_es + hits_fr AS BIGINT) AS marker_hits
    FROM hits
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID heuristic with a fixed priority
    tie-break (en > de > es > fr) so the argmax is deterministic.
    A real pipeline swaps the marker lists for character-n-gram
    profiles; the operator shape (narrow map, no shuffle) is
    identical."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(normalized_text("text"), " ")
    def _hit_counter(toks):
        # one-arg lambda: a second arg would make F.filter pass the
        # element index into it
        return F.size(F.filter(w, lambda x: x.isin(*toks)))

    hits = {lg: _hit_counter(toks) for lg, toks in _LANG_MARKERS.items()}
    predicted = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]),
            "en",
        )
        .when((hits["de"] >= hits["es"]) & (hits["de"] >= hits["fr"]), "de")
        .when(hits["es"] >= hits["fr"], "es")
        .otherwise("fr")
    )
    total = hits["en"] + hits["de"] + hits["es"] + hits["fr"]
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        predicted.alias("lang_predicted"),
        total.cast("bigint").alias("marker_hits"),
    )


_FP_WINDOW = 8  # char-shingle width for the fingerprint


@register(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_NORM} AS txt FROM documents)
    SELECT doc_id,
           list_aggregate(list_transform(generate_series(1, LENGTH(txt) - {_FP_WINDOW - 1}),
                    i -> md5(substring(txt, i, {_FP_WINDOW}))), 'min') AS fingerprint
    FROM t
    WHERE LENGTH(txt) >= {_FP_WINDOW}
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-hash over all rolling 8-char shingles
    (winnowing with window = whole doc). Identical docs share the
    fingerprint; docs differing only in a small edit usually still
    share it (the global min survives unless the edit touches the
    minimal shingle). Narrow map, no shuffle; at scale group by the
    fingerprint column to bucket near-identical docs."""
    d = load_table(spark, sf_dir, "documents")
    txt = normalized_text("text")
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.length(txt) - (_FP_WINDOW - 1)),
        lambda i: F.md5(txt.substr(i, F.lit(_FP_WINDOW))),
    )
    # scan_parallel (OPTIMIZATION_r13): one md5 per CHARACTER of every
    # document — the heaviest narrow map in the registry — pinned to
    # the one scan task the single-row-group input plans. The filter
    # stays below the repartition so pushdown-eligible pruning is
    # unaffected (length() is not pushable anyway). A/B at sf0.1:
    # 14.3 s -> 1.0 s.
    return (
        scan_parallel(d.filter(F.length(txt) >= _FP_WINDOW), "doc_id")
        .select("doc_id", F.array_min(shingle_hashes).alias("fingerprint"))
    )


@register(
    "text_repetition",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_SQL_W} AS words FROM documents
      WHERE len({_SQL_W}) >= 2
    ), e AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_words,
             unnest(list_transform(generate_series(1, len(words) - 1),
                                   i -> words[i] || ' ' || words[i + 1])) AS bigram
      FROM base
    ), bc AS (
      SELECT doc_id, bigram, COUNT(*) AS cnt,
             MIN(n_words) AS n_words, MIN(n_distinct_words) AS n_distinct_words
      FROM e GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           MIN(n_words) AS n_words,
           CAST(MIN(n_distinct_words) AS DOUBLE) / MIN(n_words) AS distinct_word_frac,
           CAST(MAX(cnt) AS BIGINT) AS top_bigram_count,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_bigram_frac
    FROM bc GROUP BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (Gopher-style filters): distinct-word
    fraction and most-frequent-bigram fraction per document. Highly
    repetitive machine-generated text scores low on the first and high
    on the second; curation pipelines drop docs past thresholds.

    Scale shape: the per-doc word counts ride along the exploded-bigram
    pipeline as grouped MINs, so the whole operator is one explode and
    two hash aggregations (partial-combined (doc, bigram) counts, then
    per-doc max/sum) — no self-join back to the corpus and no second
    scan. All outputs are integer arithmetic plus single IEEE
    divisions, so the oracle hash-matches exactly.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(normalized_text("text"), " ")
    # scan_parallel (OPTIMIZATION_r13): tokenize + array_distinct
    # (O(n_words²) worst case) + bigram construction are per-row CPU
    # on the single-row-group scan task; the explode + partial
    # aggregation downstream inherit the spread.
    #
    # The >= 2-words filter is applied BEFORE the repartition as the
    # exactly-equivalent cheap predicate contains(' ') on the
    # normalized text (split on a single space yields >= 2 elements —
    # empty strings count — iff the string contains a space; NULL text
    # fails both forms). Filtering on the DERIVED size(split(...))
    # column instead re-ran the whole tokenize + bigram expression
    # chain inside the scan-side Filter: Catalyst pushes filters
    # through RepartitionByExpression and re-expands project aliases,
    # so the expensive expressions ran TWICE, the first time on the
    # one-task scan below the Exchange — 10.1 s instead of 1.4 s at
    # sf0.1 (the round's one measured-then-regressed shape; caught by
    # the final-tree allbench sweep and pinned by
    # test_physical_plans.test_text_repetition_no_expensive_scan_side_filter).
    d = scan_parallel(d.filter(normalized_text("text").contains(" ")), "doc_id")
    base = d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct_words"),
        F.transform(
            # guarded by the contains(' ') filter above (>= 2 words):
            # sequence() would run DESCENDING for 1-word docs,
            # fabricating a bogus bigram
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        ).alias("bigrams"),
    )
    bc = (
        # explode_outer, not explode: every surviving doc has
        # n_words - 1 >= 1 bigrams, so outer vs inner emit identical
        # rows — but a plain explode makes InferFiltersFromGenerate
        # fabricate size(bigrams) > 0 / isnotnull(bigrams) predicates
        # that push below the repartition Exchange and re-expand the
        # bigram construction on the one-task scan side (same
        # pathology as the derived-column filter above).
        base.select(
            "doc_id", "n_words", "n_distinct_words",
            F.explode_outer("bigrams").alias("bigram"),
        )
        .groupBy("doc_id", "bigram")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("n_words").alias("n_words"),
            F.min("n_distinct_words").alias("n_distinct_words"),
        )
    )
    return bc.groupBy("doc_id").agg(
        F.min("n_words").alias("n_words"),
        (F.min("n_distinct_words").cast("double") / F.min("n_words")).alias(
            "distinct_word_frac"
        ),
        F.max("cnt").cast("bigint").alias("top_bigram_count"),
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top_bigram_frac"),
    )


# PII redaction patterns — written to the common subset of Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition and
# \b word boundaries only, so both engines match the exact same spans.
# SSN-shaped (3-2-4) and phone-shaped (3-3-4) groups are disjoint by
# their middle-group widths; IPv4 runs after both so digit runs inside
# already-redacted tokens can't re-match.
_PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(col: Column | str = "text") -> Column:
    """Redact PII spans in-place, preserving surrounding text."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


_PII_SQL_COUNTS = ", ".join(
    f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
    for name, pat, _ in _PII_PATTERNS
)
_PII_SQL_SCRUB = "text"
for _name, _pat, _token in _PII_PATTERNS:
    _PII_SQL_SCRUB = f"regexp_replace({_PII_SQL_SCRUB}, '{_pat}', '{_token}', 'g')"


@register(
    "text_scrub_pii",
    oracle=f"""
    SELECT doc_id, {_PII_SQL_SCRUB} AS scrubbed, {_PII_SQL_COUNTS}
    FROM read_parquet('{FIXTURES_DIR}/pii_docs.parquet')
    ORDER BY doc_id
    """,
)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training corpora: replace email / SSN-shaped /
    phone-shaped / IPv4 spans with typed tokens and count each kind
    per document (the counts feed filter thresholds — documents past a
    PII density are dropped rather than scrubbed).

    Runs over the committed pii_docs fixture (the synthetic documents
    table is clean word soup, so redaction needs salted inputs; all
    fixture PII is seed-generated and matches no real person). Narrow
    map over the scan — regexp work is JVM-side codegen, no shuffle,
    scales with bytes like every other text operator.
    """
    d = spark.read.parquet(f"{FIXTURES_DIR}/pii_docs.parquet")
    counts = [
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat, _ in _PII_PATTERNS
    ]
    return d.select(
        "doc_id", scrub_pii("text").alias("scrubbed"), *counts
    ).orderBy("doc_id")


@register(
    "text_ngram_freq",
    oracle=f"""
    WITH base AS (
      SELECT {_SQL_W} AS words FROM documents WHERE len({_SQL_W}) >= 2
    ), e AS (
      SELECT unnest(list_transform(generate_series(1, len(words) - 1),
                                   i -> words[i] || ' ' || words[i + 1])) AS bigram
      FROM base
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM e GROUP BY bigram
    ORDER BY cnt DESC, bigram LIMIT 100
    """,
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram frequency table (top-100 bigrams): the
    counting pass behind tokenizer/BPE vocabulary induction and
    contamination checks. Same tokenization as every text operator
    (lower/trim/space-split), so frequencies line up across ops.

    Scale shape: one explode feeding a two-phase hash aggregate
    (map-side partial counts collapse the heavy-hitter bigrams before
    the shuffle — Zipfian n-grams are exactly the distribution where
    partial aggregation pays), then TakeOrderedAndProject for the
    top-k: no global sort of the full frequency table. Ties break on
    the bigram string so the top-100 cut is deterministic in both
    engines.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(normalized_text("text"), " ")
    base = d.select(words.alias("words")).filter(F.size("words") >= 2)
    bigrams = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("words", i), F.element_at("words", i + 1)
                ),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(100)
    )


@register(
    "text_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS w FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id, s
      FROM toks, UNNEST(list_transform(
            generate_series(1, len(w) - 2),
            i -> concat_ws(' ', w[i], w[i+1], w[i+2])
          )) AS t(s)
      WHERE len(w) >= 3
    ),
    ev AS (SELECT DISTINCT s FROM shingles WHERE doc_id < 10),
    c AS (SELECT doc_id, s FROM shingles WHERE doc_id >= 10)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(ev.s) AS BIGINT) AS n_matched,
           CAST(COUNT(ev.s) AS DOUBLE) / COUNT(*) AS contamination_frac
    FROM c LEFT JOIN ev ON ev.s = c.s
    GROUP BY c.doc_id
    HAVING COUNT(ev.s) > 0
    ORDER BY c.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    3-gram shingles with an eval set (here: doc_id < 10 stands in for
    the benchmark suite), reporting match counts and the contaminated
    fraction. Same tokenization/shingling as the dedup cascade, so a
    corpus can be deduped and decontaminated off one shingle pass.

    Scale shape: eval suites are tiny next to a 100 TB corpus, so the
    eval shingle set BROADCASTS; the corpus side is one explode and
    one left-join-then-aggregate pass — total and matched counts come
    from the same aggregate (COUNT(*) vs COUNT(match)), never a
    second scan. Work is linear in corpus shingles.
    """
    from .dedup import _shingles

    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d)
    ev = (
        sh.filter(F.col("doc_id") < 10)
        .select(F.col("s").alias("es"))
        .distinct()
    )
    c = sh.filter(F.col("doc_id") >= 10)
    return (
        c.join(F.broadcast(ev), c.s == ev.es, "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count("es").cast("bigint").alias("n_matched"),
            (F.count("es").cast("double") / F.count(F.lit(1))).alias(
                "contamination_frac"
            ),
        )
        .filter(F.col("n_matched") > 0)
        # no orderBy: contaminated set can be corpus-sized; compare is
        # order-insensitive
    )


_HASH_DIM = 16  # one hex char of md5 -> 16 feature buckets


@register(
    "text_feature_hash",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, unnest(string_split(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS tok
      FROM documents)
    SELECT doc_id,
           {', '.join(
               "CAST(COUNT(*) FILTER (WHERE substring(md5(tok), 1, 1) = '"
               + format(b, 'x')
               + f"') AS BIGINT) AS f{b}"
               for b in range(_HASH_DIM)
           )}
    FROM t GROUP BY doc_id
    """,
)
def text_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer: fixed-width bag-of-words vectors with
    bucket = md5-prefix of the token — the collision-accepting
    vectorization used when a vocabulary is too large (or too
    unstable) to materialize. md5 prefixes make bucket assignment
    engine-portable, the same property the samplers rely on.

    Scale shape: one explode + ONE hash aggregate computing all
    feature columns as conditional counts (never one pass per
    feature); width is a compile-time constant so the output schema
    is fixed. Linear in corpus tokens, shuffles only (doc_id,
    16 counters) rows.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(normalized_text("text"), " ")).alias("tok"),
    )
    bucket = F.substring(F.md5(F.col("tok").cast("binary")), 1, 1)
    return toks.groupBy("doc_id").agg(
        *[
            F.count(F.when(bucket == format(b, "x"), 1))
            .cast("bigint")
            .alias(f"f{b}")
            for b in range(_HASH_DIM)
        ]
    )


@register(
    "text_inverted_index",
    oracle=f"""
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM (
      SELECT doc_id, unnest(list_distinct({_SQL_W})) AS term FROM documents)
    WHERE term <> ''
    GROUP BY term HAVING COUNT(*) >= 2
    ORDER BY term
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term -> document frequency + sorted
    posting list — the retrieval-side primitive for corpus search,
    contamination lookup, and keyword-based filtering.

    Scale shape: one explode of per-document DISTINCT terms (dedup
    happens document-local, before the shuffle), one groupBy term.
    Postings serialize as comma-joined sorted doc_ids — bounded here
    by corpus vocabulary; at 100 TB the posting lists for stopword-like
    terms are the skew risk, so production would cap df (the HAVING
    is where that policy lands) and delta-encode postings per bucket.
    The df >= 2 floor drops the hapax tail, which at web scale is the
    bulk of the vocabulary.
    """
    d = load_table(spark, sf_dir, "documents")
    term = F.explode(F.array_distinct(F.split(normalized_text("text"), " ")))
    return (
        d.select("doc_id", term.alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= 2)
        .orderBy("term")
    )


# --- text_url_extract -------------------------------------------------

# Written to the common subset of Java regex (Spark) and RE2 (DuckDB):
# no backrefs, no lookaround. Host chars then an optional /path of
# non-space chars.
_URL_PAT = r"https?://[A-Za-z0-9.-]+(/[^ ]*)?"
_HOST_PAT = r"https?://([A-Za-z0-9.-]+)"


@register(
    "text_url_extract",
    oracle=f"""
    WITH u AS (
      SELECT doc_id,
             unnest(regexp_extract_all(text, '{_URL_PAT}')) AS url
      FROM read_parquet('{{FIX}}/web_docs.parquet')
    )
    SELECT regexp_extract(url, '{_HOST_PAT}', 1) AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM u GROUP BY domain
    ORDER BY n_urls DESC, domain
    """.replace("{FIX}", FIXTURES_DIR),
)
def text_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain frequency over a web-shaped corpus —
    the first pass of every web-crawl curation pipeline (domain
    allow/deny lists, per-domain caps, spam-domain discovery all
    consume exactly this table).

    Runs over the committed web_docs fixture (the testdata documents
    are URL-free word soup). The URL regex sticks to the Java/RE2
    common subset so both engines extract identical spans.

    Scale shape: regexp_extract_all is a narrow JVM-codegen map fused
    into the scan; the explode fans out to one row per URL; the domain
    groupBy is the only shuffle, and Zipfian domain skew is exactly
    where map-side partial aggregation collapses the heavy hitters
    before the exchange.
    """
    d = spark.read.parquet(f"{FIXTURES_DIR}/web_docs.parquet")
    urls = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(_URL_PAT), F.lit(0))).alias("url"),
    )
    return (
        urls.select(
            "doc_id", F.regexp_extract("url", _HOST_PAT, 1).alias("domain")
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy(F.col("n_urls").desc(), "domain")
    )


# --- text_url_canonicalize --------------------------------------------

# scheme://host[/path] -> lower(host) + path minus query/fragment and
# any trailing slash; scheme dropped (http and https collapse).
_CANON_STRIP = r"[?#].*$"


@register(
    "text_url_canonicalize",
    oracle=f"""
    WITH u AS (
      SELECT doc_id,
             unnest(regexp_extract_all(text, '{_URL_PAT}')) AS url
    FROM read_parquet('{{FIX}}/web_docs.parquet')),
    c AS (
      SELECT doc_id,
             translate(regexp_extract(url, '{_HOST_PAT}', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')
               || regexp_replace(regexp_replace(
                      regexp_replace(url, '{_CANON_STRIP}', ''),
                      'https?://[A-Za-z0-9.-]+', ''),
                      '/$', '')
               AS canon
      FROM u)
    SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM c GROUP BY canon
    HAVING COUNT(*) >= 2
    ORDER BY n_urls DESC, canon
    """.replace("{FIX}", FIXTURES_DIR),
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + duplicate-URL counting: scheme dropped
    (http/https collapse), host lowercased, query/fragment and
    trailing slash stripped — the normalization pass before URL-level
    dedup of a crawl (the same page fetched via different URL
    spellings must collapse to one key). Emits canonical URLs seen
    more than once, with occurrence and document counts.

    All transforms are regexp_replace/extract in the Java/RE2 common
    subset, so both engines derive byte-identical canonical keys.

    Scale shape: narrow regex maps fused into the scan; one explode;
    one groupBy on the canonical key — at crawl scale the counts
    collapse map-side exactly like the domain table.
    """
    d = spark.read.parquet(f"{FIXTURES_DIR}/web_docs.parquet")
    urls = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(_URL_PAT), F.lit(0))).alias("url"),
    )
    path = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("url", _CANON_STRIP, ""),
            r"https?://[A-Za-z0-9.-]+",
            "",
        ),
        r"/$",
        "",
    )
    canon = F.concat(
        F.translate(F.regexp_extract("url", _HOST_PAT, 1), _AUC, _ALC), path
    )
    return (
        urls.select("doc_id", canon.alias("canon"))
        .groupBy("canon")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_urls") >= 2)
        .orderBy(F.col("n_urls").desc(), "canon")
    )


# --- text_bpe_pairs ---------------------------------------------------


@register(
    "text_bpe_pairs",
    oracle=f"""
    WITH w AS (
      SELECT unnest({_SQL_W}) AS word FROM documents),
    p AS (
      SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                                   i -> substring(word, i, 2))) AS pair
      FROM w WHERE length(word) >= 2)
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM p GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 50
    """,
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent character-pair frequencies within words (top-50) — the
    counting step of one BPE merge round, the inner loop of tokenizer
    vocabulary induction. Same tokenization as every text operator so
    the counts line up with text_token_count/text_ngram_freq.

    Scale shape: two explodes (words, then in-word pairs) fused into
    the scan stage, a two-phase hash aggregate over a tiny key space
    (byte pairs), TakeOrderedAndProject for the top-k; ties break on
    the pair so the cut is deterministic.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(normalized_text("text"), " ")
    w = d.select(F.explode(words).alias("word")).filter(F.length("word") >= 2)
    pairs = w.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(50)
    )


# --- linear quality classifier over hashed features -------------------

_CLF_D = 64  # hashed feature buckets
# Quantized integer weights (fasttext-style linear model; Random(7)).
# Integer weights + integer sums keep the score EXACT cross-engine;
# only the final mean is one IEEE division on identical operands.
_CLF_W = [-9, -31, 0, 33, -44, -41, 18, -38, -4, 24, -43, 14, -23, -46, -39,
          5, 3, -42, -20, -39, 20, 4, -43, 22, -35, -22, 30, 30, 24, -43, 23,
          24, 0, -44, -22, -45, 21, -33, -13, 3, -32, 19, -35, 23, -11, 21,
          37, -27, -37, 24, 23, 31, -26, -3, -38, 20, 41, -42, 22, -43, 29,
          -24, 13, 37]
_CLF_BIAS = 120


def _clf_bucket(tok) -> Column:
    """The shared token -> feature-bucket hash (md5 prefix mod _CLF_D)
    used by text_quality_classifier, the NB trainer, and the NB scorer
    — one bucketing so trained weights plug into the scorer shape."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint") % _CLF_D


# Oracle-side twin of _clf_bucket — the ONE SQL source of truth for the
# bucket hash, substituted into every oracle that buckets tokens
# (classifier, quantile gate, NB trainer/scorer; ADVICE r10 removed the
# two older inlined copies that could drift).
_CLF_BUCKET_SQL = (
    f"(CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) % {_CLF_D})"
)


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(([{", ".join(str(w) for w in _CLF_W)}])
                 [{_CLF_BUCKET_SQL} + 1])
               AS wsum
      FROM toks GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           CAST(wsum + {_CLF_BIAS} AS BIGINT) AS raw_score,
           CAST(wsum + {_CLF_BIAS} AS DOUBLE) / n_tokens AS mean_score,
           CAST(wsum + {_CLF_BIAS} >= 0 AS BIGINT) AS is_quality
    FROM scored
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text-quality classifier over hashed bag-of-words features
    — the fasttext-style model shape used to score web documents for
    training-data inclusion (e.g. the CCNet / LLaMA quality filters):
    token -> md5 hash -> one of {_CLF_D} feature buckets -> learned
    weight; document score = bias + sum of token weights; keep/drop on
    the sign.

    Weights here are fixed quantized integers so the score is an exact
    integer sum — bit-identical cross-engine and invariant to partial-
    aggregation order. Production swaps trained float weights quantized
    the same way (int8/int16 weights are standard for inference), and
    the plumbing — broadcast weight literal, one explode, one hash-agg
    — is unchanged.

    Scale shape: the weight table is a plan literal (broadcast-sized at
    any real vocabulary hash width); scoring is one explode + one
    map-side-combining groupBy on doc_id; nothing but (doc_id, partial
    sum) ever shuffles.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    )
    # one py4j call for the 64-int literal (OPTIMIZATION_r13; same
    # driver-latency finding as the bloom bitmap — ~13 ms per F.lit)
    w_lit = F.expr("array(" + ",".join(str(w) for w in _CLF_W) + ")")
    bucket = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint") % _CLF_D
    weight = F.element_at(w_lit, (bucket + 1).cast("int"))
    scored = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(weight).alias("wsum"),
    )
    raw = F.col("wsum") + _CLF_BIAS
    return scored.select(
        "doc_id",
        "n_tokens",
        raw.cast("bigint").alias("raw_score"),
        (raw.cast("double") / F.col("n_tokens")).alias("mean_score"),
        (raw >= 0).cast("bigint").alias("is_quality"),
    )


# --- Naive-Bayes quality-classifier TRAINING ---------------------------
#
# text_quality_classifier SCORES with fixed integer weights; nothing
# trained weights (VERDICT r9 item 6). Multinomial Naive Bayes is the
# classical trainable model of that exact shape (fasttext-style linear
# scorer over hashed BoW), and — unlike SGD — its training step is
# PURE COUNTING: per-class per-bucket token counts plus class priors.
# Counting is integer, order-independent, and oracle-expressible, so
# the trained model itself carries a driver verdict; turning counts
# into log-odds weights is a |2D|-sized driver-side closed form
# (nb_score_frame), pytest-pinned against the teacher.


def nb_train_frame(docs: DataFrame, labels: DataFrame) -> DataFrame:
    """Train a multinomial Naive-Bayes quality model over hashed
    bag-of-words features: ``docs`` is any (doc_id, text) corpus,
    ``labels`` any (doc_id, is_q: boolean) supervision table (human
    annotation, an LLM judge, or a teacher model — production quality
    filters are trained exactly this way, cf. the CCNet/LLaMA
    Wikipedia-vs-CommonCrawl classifier). Emits the model as its
    sufficient statistics, one row per feature bucket:

      bucket, cnt_pos, cnt_neg   — per-class token counts in bucket
      docs_pos, docs_neg         — class priors (repeated per row so
                                   the table is a self-contained
                                   artifact a scorer can consume)

    Every bucket 0..{_CLF_D - 1} appears (zero-filled via a spine
    join), so the output schema and row count are data-independent.

    Scale shape: one corpus-token explode joined to the |docs|-sized
    label table (broadcastable while labels fit; the join key is
    doc_id, so AQE handles the rest), one {_CLF_D}-cell conditional-
    count hash aggregate, and a 1-row prior aggregate broadcast back
    by crossJoin — nothing but (bucket, 2 counters) ever shuffles.
    Training is counting; no iteration, no Python.
    """
    spark = docs.sparkSession
    toks = docs.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    )
    lt = toks.join(labels.select("doc_id", "is_q"), "doc_id")
    agg = lt.groupBy(_clf_bucket("tok").alias("bucket")).agg(
        F.count(F.when(F.col("is_q"), 1)).cast("bigint").alias("cnt_pos"),
        F.count(F.when(~F.col("is_q"), 1)).cast("bigint").alias("cnt_neg"),
    )
    pri = labels.agg(
        F.count(F.when(F.col("is_q"), 1)).cast("bigint").alias("docs_pos"),
        F.count(F.when(~F.col("is_q"), 1)).cast("bigint").alias("docs_neg"),
    )
    spine = spark.range(_CLF_D).select(F.col("id").cast("bigint").alias("bucket"))
    return (
        spine.join(agg, "bucket", "left")
        .crossJoin(F.broadcast(pri))
        .select(
            "bucket",
            F.coalesce("cnt_pos", F.lit(0)).cast("bigint").alias("cnt_pos"),
            F.coalesce("cnt_neg", F.lit(0)).cast("bigint").alias("cnt_neg"),
            "docs_pos",
            "docs_neg",
        )
        .orderBy("bucket")
    )


def teacher_labels(docs: DataFrame) -> DataFrame:
    """(doc_id, is_q) distillation labels from the fixed integer
    linear classifier's sign — the deterministic, self-contained
    supervision the registry key trains on. Docs without tokens
    (NULL/whitespace text) get no label, mirroring the classifier's
    own domain."""
    toks = docs.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    )
    # one py4j call for the 64-int literal (OPTIMIZATION_r13; same
    # driver-latency finding as the bloom bitmap — ~13 ms per F.lit)
    w_lit = F.expr("array(" + ",".join(str(w) for w in _CLF_W) + ")")
    weight = F.element_at(w_lit, (_clf_bucket("tok") + 1).cast("int"))
    return toks.groupBy("doc_id").agg(
        ((F.sum(weight) + _CLF_BIAS) >= 0).alias("is_q")
    )


# The teacher-label + per-class-count training CTEs, shared verbatim
# by the text_quality_nb_train oracle and the chained
# text_quality_nb_scored oracle (which consumes agg/pri as its trained
# model) — one source of truth, the _KM_CTES precedent.
_NB_TRAIN_CTES = f"""toks AS (
      SELECT doc_id, {_CLF_BUCKET_SQL} AS bucket,
             ([{", ".join(str(w) for w in _CLF_W)}])[{_CLF_BUCKET_SQL} + 1] AS wt
      FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
            FROM documents) t),
    lab AS (
      SELECT doc_id, (SUM(wt) + {_CLF_BIAS} >= 0) AS is_q
      FROM toks GROUP BY doc_id),
    agg AS (
      SELECT t.bucket,
             CAST(COUNT(*) FILTER (l.is_q) AS BIGINT) AS cnt_pos,
             CAST(COUNT(*) FILTER (NOT l.is_q) AS BIGINT) AS cnt_neg
      FROM toks t JOIN lab l USING (doc_id) GROUP BY t.bucket),
    pri AS (
      SELECT CAST(COUNT(*) FILTER (is_q) AS BIGINT) AS docs_pos,
             CAST(COUNT(*) FILTER (NOT is_q) AS BIGINT) AS docs_neg
      FROM lab)"""


@register(
    "text_quality_nb_train",
    oracle=f"""
    WITH {_NB_TRAIN_CTES}
    SELECT b.bucket,
           CAST(COALESCE(a.cnt_pos, 0) AS BIGINT) AS cnt_pos,
           CAST(COALESCE(a.cnt_neg, 0) AS BIGINT) AS cnt_neg,
           p.docs_pos, p.docs_neg
    FROM (SELECT unnest(generate_series(0, {_CLF_D - 1})) AS bucket) b
    LEFT JOIN agg a USING (bucket) CROSS JOIN pri p
    ORDER BY b.bucket
    """,
)
def text_quality_nb_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes quality-classifier training over the documents
    corpus, distilling the fixed integer linear classifier
    (text_quality_classifier's sign is the label — the deterministic
    stand-in for the human/LLM annotations production pipelines train
    their quality filters on). The output IS the trained model: exact
    per-class per-bucket token counts + class priors, which is all
    multinomial NB learns — so the driver's integer-exact oracle
    attests the TRAINED ARTIFACT itself, closing the train half of
    the quality-filter loop (score half: text_quality_classifier;
    weights-from-these-counts scoring: nb_score_frame, pinned to
    >= 70% teacher agreement in tests).

    Scale shape: two corpus-token passes — one |docs|-bounded label
    aggregate (the teacher), one token stream joined to it — then the
    {_CLF_D}-cell count aggregate; the production entry point
    nb_train_frame takes EXTERNAL labels and touches the corpus once.
    """
    d = load_table(spark, sf_dir, "documents")
    return nb_train_frame(d, teacher_labels(d))


def nb_score_frame(docs: DataFrame, model: DataFrame, alpha: int = 1) -> DataFrame:
    """Score a corpus with a TRAINED NB model (nb_train_frame output):
    per-token log-odds weights from the Laplace-smoothed count table,
    document score = log-prior-odds + sum of token weights, keep/drop
    on the sign — the same broadcast-literal + explode + one-hash-agg
    plan as text_quality_classifier, just with learned weights.

    The model table is the bounded tokenizer-artifact class ({_CLF_D}
    rows by construction): collected once driver-side, turned into the
    closed-form weight literal, and shipped in the plan. Emits
    (doc_id, n_tokens, nb_score, is_quality)."""
    import math

    rows = model.orderBy("bucket").collect()
    if len(rows) != _CLF_D:
        raise ValueError(
            f"NB model must have exactly {_CLF_D} bucket rows, got {len(rows)}"
        )
    # The priors are repeated per row so the table is self-contained;
    # a model whose rows DISAGREE (merged shards, a hand-edited
    # artifact) has no well-defined prior — reject it rather than
    # silently scoring with row 0's values (ADVICE r10).
    if len({(r.docs_pos, r.docs_neg) for r in rows}) != 1:
        raise ValueError(
            "NB model rows carry inconsistent (docs_pos, docs_neg) priors"
        )
    tot_pos = sum(r.cnt_pos for r in rows) + alpha * _CLF_D
    tot_neg = sum(r.cnt_neg for r in rows) + alpha * _CLF_D
    weights = [
        math.log((r.cnt_pos + alpha) / tot_pos)
        - math.log((r.cnt_neg + alpha) / tot_neg)
        for r in rows
    ]
    # prior odds; a class with zero docs gets alpha-smoothed too so the
    # scorer stays finite on degenerate (single-class) training sets
    prior = math.log(
        (rows[0].docs_pos + alpha) / (rows[0].docs_neg + alpha)
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    )
    # one py4j call for the 64-double literal (OPTIMIZATION_r13);
    # repr() round-trips each double exactly, D suffix keeps the
    # literal a double — the identical expression tree
    w_lit = F.expr("array(" + ",".join(f"{w!r}D" for w in weights) + ")")
    weight = F.element_at(w_lit, (_clf_bucket("tok") + 1).cast("int"))
    scored = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        (F.sum(weight) + F.lit(prior)).alias("nb_score"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "nb_score",
        (F.col("nb_score") >= 0).cast("bigint").alias("is_quality"),
    )


_NB_Q = 1_000_000  # likelihood-ratio quantum (the text_lm_score 1e6)


def nb_score_quantized_frame(
    docs: DataFrame, model: DataFrame, alpha: int = 1
) -> DataFrame:
    """Score a corpus with a trained NB model using EXACT INTEGER
    arithmetic — the oracle-expressible twin of :func:`nb_score_frame`
    (VERDICT r10 item 4: the float log-odds scorer can't be
    cross-engine-hashed, so the score half of the trained-NB loop had
    no driver verdict).

    Per-bucket evidence is the SYMMETRIZED Laplace-smoothed likelihood
    ratio, each direction quantized by one integer floor-division of
    positive operands (the text_lm_score precedent — floor == truncate
    for non-negative quotients, so Spark `div` and DuckDB `//` agree):

        w_q(b) = floor(r * {_NB_Q}) - floor((1/r) * {_NB_Q}),
        r = ((cnt_pos+a) * tot_neg) / ((cnt_neg+a) * tot_pos)

    Since r - 1/r = 2*ln(r) + O(ln^3 r), w_q tracks twice the NB
    log-odds for the mild per-bucket ratios a {_CLF_D}-bucket hashed
    model produces, and is exactly antisymmetric (swapping classes
    flips the sign, like log-odds — the one-sided ratio mean the first
    draft used biases positive because r + nothing cancels 1/r). The
    prior enters on the same scale: prior_q = floor(p*{_NB_Q}) -
    floor({_NB_Q}/p) with p the smoothed class-count odds. Decision:

        is_quality = prior_q + sum over tokens of w_q(bucket) >= 0

    The true-log version is nb_score_frame, which stays the production
    default; on the test corpus the quantized decision agrees with it
    on >99% of documents and with the teacher well above the float
    scorer's own 70% pin (both pinned in tests/test_retrieval_ml.py).
    ln() itself is quantization-hostile cross-engine (text_lm_score's
    documented reason), which is why the proxy — not floor(ln*Q) — is
    the oracle-expressible form. Products are carried in
    DECIMAL(38,0)/HUGEINT (the bm25 overflow rule); per-doc sums
    accumulate in DECIMAL(38,0) (a pathological single-bucket corpus
    can push |w_q| toward ratio*{_NB_Q} ~ 1e14, and int64 partials
    would wrap silently at ~1e4 such tokens).

    Scale shape: the {_CLF_D}-row model is localCheckpointed once,
    validated with one bounded aggregate (exactly {_CLF_D} distinct
    bucket rows, consistent priors — nb_score_frame's guards, ADVICE
    r11), then referenced three ways (totals, weights, priors) and
    enters the
    plan as broadcast relations — the corpus is touched once, one
    explode + bucket equi-join against the {_CLF_D}-row weight
    relation + one doc_id hash aggregate; nothing but (doc_id,
    2 counters) ever shuffles. Emits (doc_id, n_tokens, nb_score_q,
    is_quality)."""
    m = model.select("bucket", "cnt_pos", "cnt_neg", "docs_pos", "docs_neg")
    m = m.localCheckpoint(eager=False)
    # Same model validation as nb_score_frame (ADVICE r11: the scorers
    # must agree on ledger SHAPE for malformed input too — the inner
    # token->weight join silently drops tokens whose bucket row is
    # missing, deflating n_tokens AND the score, and independent
    # MAX(docs_pos)/MAX(docs_neg) silently combines inconsistent
    # priors). One bounded aggregate over the checkpointed {_CLF_D}-row
    # relation — a driver decision on a model artifact, not a corpus
    # collect; it also warms the checkpoint so scoring reuses it.
    chk = m.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("bucket").alias("n_buckets"),
        F.countDistinct("docs_pos", "docs_neg").alias("n_pri"),
        # countDistinct SKIPS rows with a NULL in either prior column,
        # so a model with some NULL-prior rows and one consistent
        # non-null pair would pass n_pri == 1 and silently score via
        # MAX while nb_score_frame's Python-set check on the same
        # artifact raises (ADVICE r12) — count NULL priors explicitly
        # so both scorers reject the same malformed artifacts.
        F.sum(
            (F.col("docs_pos").isNull() | F.col("docs_neg").isNull()).cast("int")
        ).alias("n_null_pri"),
    ).first()
    if chk.n_rows != _CLF_D or chk.n_buckets != _CLF_D:
        raise ValueError(
            f"NB model must have exactly {_CLF_D} distinct bucket rows, "
            f"got {chk.n_rows} rows / {chk.n_buckets} buckets"
        )
    if chk.n_pri != 1 or chk.n_null_pri:
        raise ValueError(
            "NB model rows carry inconsistent (docs_pos, docs_neg) priors"
        )
    tot = m.agg(
        (F.sum("cnt_pos") + alpha * _CLF_D).cast("bigint").alias("tot_pos"),
        (F.sum("cnt_neg") + alpha * _CLF_D).cast("bigint").alias("tot_neg"),
    )
    w = (
        m.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.expr(
                f"CAST((CAST(cnt_pos + {alpha} AS DECIMAL(38,0))"
                f" * tot_neg * {_NB_Q})"
                f" div (CAST(cnt_neg + {alpha} AS DECIMAL(38,0)) * tot_pos)"
                f" - (CAST(cnt_neg + {alpha} AS DECIMAL(38,0))"
                f" * tot_pos * {_NB_Q})"
                f" div (CAST(cnt_pos + {alpha} AS DECIMAL(38,0)) * tot_neg)"
                f" AS BIGINT)"
            ).alias("w_q"),
        )
    )
    # priors repeat on every model row by construction (nb_train_frame's
    # crossJoin); MAX picks the shared value without a per-row collect —
    # safe because the validation above already raised on inconsistent
    # priors
    pri = m.agg(
        F.expr(
            f"CAST((CAST(MAX(docs_pos) + {alpha} AS DECIMAL(38,0)) * {_NB_Q})"
            f" div (MAX(docs_neg) + {alpha})"
            f" - (CAST(MAX(docs_neg) + {alpha} AS DECIMAL(38,0)) * {_NB_Q})"
            f" div (MAX(docs_pos) + {alpha}) AS BIGINT)"
        ).alias("prior_q")
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    )
    scored = (
        toks.select("doc_id", _clf_bucket("tok").alias("bucket"))
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.col("w_q").cast("decimal(38,0)")).alias("sw"),
        )
    )
    return (
        scored.crossJoin(F.broadcast(pri))
        .select(
            "doc_id",
            "n_tokens",
            (F.col("prior_q") + F.col("sw")).cast("bigint").alias("nb_score_q"),
            ((F.col("prior_q") + F.col("sw")) >= 0)
            .cast("bigint")
            .alias("is_quality"),
        )
    )


@register(
    "text_quality_nb_scored",
    oracle=f"""
    WITH {_NB_TRAIN_CTES},
    model AS (
      SELECT b.bucket,
             CAST(COALESCE(a.cnt_pos, 0) AS BIGINT) AS cnt_pos,
             CAST(COALESCE(a.cnt_neg, 0) AS BIGINT) AS cnt_neg
      FROM (SELECT unnest(generate_series(0, {_CLF_D - 1})) AS bucket) b
      LEFT JOIN agg a USING (bucket)),
    tot AS (
      SELECT CAST(SUM(cnt_pos) + {_CLF_D} AS BIGINT) AS tot_pos,
             CAST(SUM(cnt_neg) + {_CLF_D} AS BIGINT) AS tot_neg
      FROM model),
    w AS (
      SELECT m.bucket,
             CAST((CAST(m.cnt_pos + 1 AS HUGEINT) * t.tot_neg * {_NB_Q})
                  // (CAST(m.cnt_neg + 1 AS HUGEINT) * t.tot_pos)
                  - (CAST(m.cnt_neg + 1 AS HUGEINT) * t.tot_pos * {_NB_Q})
                  // (CAST(m.cnt_pos + 1 AS HUGEINT) * t.tot_neg)
                  AS BIGINT) AS w_q
      FROM model m CROSS JOIN tot t),
    prq AS (
      SELECT CAST((CAST(docs_pos + 1 AS HUGEINT) * {_NB_Q}) // (docs_neg + 1)
                  - (CAST(docs_neg + 1 AS HUGEINT) * {_NB_Q}) // (docs_pos + 1)
                  AS BIGINT) AS prior_q
      FROM pri),
    sc AS (
      SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(w.w_q) AS HUGEINT) AS sw
      FROM toks tk JOIN w ON w.bucket = tk.bucket
      GROUP BY tk.doc_id)
    SELECT s.doc_id, s.n_tokens,
           CAST(p.prior_q + s.sw AS BIGINT) AS nb_score_q,
           CAST(p.prior_q + s.sw >= 0 AS BIGINT) AS is_quality
    FROM sc s CROSS JOIN prq p
    """,
)
def text_quality_nb_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-NB quality loop CLOSED under one driver verdict
    (VERDICT r10 item 4): train on the corpus with teacher labels
    (text_quality_nb_train's exact counting pass), score every
    document with the integer-quantized likelihood-ratio scorer, emit
    the per-document keep/drop ledger. The oracle splices the NB-train
    CTEs (``_NB_TRAIN_CTES``) into the scorer CTEs — both halves exact
    integer arithmetic, so the chain hash-matches end to end.

    Alpha is fixed at 1 (the default) in BOTH engines; quantization
    and the arithmetic-mean decision rule are documented on
    :func:`nb_score_quantized_frame`. Teacher agreement of this
    quantized scorer is pinned in tests/test_text_gate.py alongside
    the float scorer's.
    """
    d = load_table(spark, sf_dir, "documents")
    model = nb_train_frame(d, teacher_labels(d))
    return nb_score_quantized_frame(d, model)


# --- HTML strip (web-page -> training text) ---------------------------


@register(
    "text_html_strip",
    oracle=f"""
    WITH page AS (
      SELECT doc_id,
             '<html><body><h1>' || source || '</h1><p>' || text ||
             '</p><a href="https://example.com/' || CAST(doc_id AS VARCHAR) ||
             '">&amp;more &lt;here&gt;</a></body></html>' AS html
      FROM documents),
    stripped AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags,
             trim(regexp_replace(regexp_replace(html, '<[^>]+>', ' ', 'g'),
                                 ' +', ' ', 'g')) AS no_tags
      FROM page)
    SELECT doc_id, n_tags,
           replace(replace(replace(no_tags, '&amp;', '&'), '&lt;', '<'),
                   '&gt;', '>') AS clean_text
    FROM stripped
    """,
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-to-text extraction — the first stage of every web-crawl
    curation pipeline (trafilatura/jusText's job, reduced to its
    regex-expressible core): drop tags, collapse whitespace, decode
    the common entities, count what was removed.

    The page markup is synthesized deterministically around the
    document text (title, paragraph, anchor with entities), so the
    strip kernel — two regexp_replace passes + entity decode, all in
    the Java/RE2-common regex subset — is value-checked end to end
    against DuckDB performing the identical transformation.

    Scale shape: a pure narrow map fused into the scan; zero shuffle,
    zero Python. A real boilerplate extractor (DOM-aware) would slot
    in as a mapInPandas stage like the multimodal codecs; tag-strip +
    whitespace-collapse stays the JVM fast path either way.
    """
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><h1>"), F.col("source"), F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><a href="https://example.com/'),
        F.col("doc_id").cast("string"),
        F.lit('">&amp;more &lt;here&gt;</a></body></html>'),
    )
    no_tags = F.trim(
        F.regexp_replace(F.regexp_replace(html, "<[^>]+>", " "), " +", " ")
    )
    clean = F.replace(
        F.replace(
            F.replace(no_tags, F.lit("&amp;"), F.lit("&")),
            F.lit("&lt;"), F.lit("<"),
        ),
        F.lit("&gt;"), F.lit(">"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(html, F.lit("<[^>]+>")).cast("bigint").alias("n_tags"),
        clean.alias("clean_text"),
    )


# --- corpus-quantile quality gate -------------------------------------

_QG_LO, _QG_HI = -32768, 32767  # clamped histogram domain (2^16 bins)


@register(
    "text_quality_quantile_gate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(SUM(([{", ".join(str(w) for w in _CLF_W)}])
                 [{_CLF_BUCKET_SQL} + 1]) + {_CLF_BIAS} AS BIGINT) AS raw_score
      FROM toks GROUP BY doc_id),
    b AS (SELECT doc_id, raw_score,
                 GREATEST({_QG_LO}, LEAST({_QG_HI}, raw_score)) AS sb
          FROM scored),
    hist AS (SELECT sb, COUNT(*) AS n FROM b GROUP BY sb),
    cum AS (SELECT sb, CAST(SUM(n) OVER (ORDER BY sb) AS BIGINT) AS cum
            FROM hist),
    tot AS (SELECT COUNT(*) AS total FROM b),
    thr AS (SELECT MIN(sb) AS p40_threshold
            FROM cum, tot WHERE cum >= (2*total + 4) // 5)
    SELECT doc_id, raw_score, p40_threshold
    FROM b, thr WHERE sb >= p40_threshold
    """,
)
def text_quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-quantile quality gate: keep documents whose classifier
    score is at or above the corpus's exact 40th percentile — "drop
    the worst 40%", the relative-threshold companion to the absolute
    sign gate in `text_quality_classifier`.

    The global order statistic is the scale hazard: sorting 100 TB of
    scores (or feeding them to a percentile aggregate that buffers
    values) is the wrong plan. Here the threshold comes from a BOUNDED
    integer histogram: scores clamp to the {_QG_HI - _QG_LO + 1}-value
    domain, the histogram is a map-side-combining groupBy (<= 2^16
    rows regardless of corpus size), the cumulative count runs over
    that bounded relation (the one global window — allowlisted and
    plan-guarded), and the threshold broadcasts back for the gate
    join. Exact — not approximate — within the clamped domain: ties at
    the threshold are kept, so the dropped fraction is the largest one
    strictly below 40%. Everything is integer arithmetic; both engines
    compute the identical threshold.

    Two corpus passes (score+histogram, then gate) — the same shape as
    every global-statistic filter; at 100 TB pass one's shuffle is
    (doc_id, score) pairs only, never text.
    """
    scores = text_quality_classifier(spark, sf_dir).select(
        "doc_id",
        "raw_score",
        F.greatest(F.lit(_QG_LO), F.least(F.lit(_QG_HI), F.col("raw_score"))).alias(
            "sb"
        ),
    )
    hist = scores.groupBy("sb").agg(F.count(F.lit(1)).alias("n"))
    cum = hist.withColumn(
        "cum",
        F.sum("n").over(
            Window.orderBy("sb").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    tot = scores.agg(F.count(F.lit(1)).alias("total"))
    thr = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("cum") >= F.expr("(2*total + 4) div 5"))
        .agg(F.min("sb").alias("p40_threshold"))
    )
    return (
        scores.crossJoin(F.broadcast(thr))
        .where(F.col("sb") >= F.col("p40_threshold"))
        .select("doc_id", "raw_score", "p40_threshold")
    )


# --- overlapping chunking (RAG / retrieval prep) ----------------------

_CH_SIZE = 512    # chars per chunk
_CH_STRIDE = 384  # chunk stride (overlap = 128)


@register(
    "text_chunk_overlap",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, CAST(LENGTH(text) AS BIGINT) AS len
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL AND LENGTH(text) > 0),
    ex AS (
      SELECT doc_id, text, CAST(g.k AS BIGINT) AS chunk_idx
      FROM d, LATERAL (SELECT UNNEST(generate_series(CAST(0 AS BIGINT),
                        (len - 1) // {_CH_STRIDE})) AS k) g)
    SELECT doc_id, chunk_idx,
           CAST(LENGTH(substring(text,
                CAST(1 + chunk_idx*{_CH_STRIDE} AS INT), {_CH_SIZE}))
             AS BIGINT) AS chunk_len,
           md5(substring(text,
                CAST(1 + chunk_idx*{_CH_STRIDE} AS INT), {_CH_SIZE}))
             AS chunk_md5
    FROM ex
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking — the retrieval-side prep step
    (RAG indexing, embedding-window generation): each document splits
    into {_CH_SIZE}-char windows every {_CH_STRIDE} chars (128-char
    overlap so no boundary-straddling passage is lost). Emits the
    chunk ledger (index, length, content md5) rather than the chunk
    text, so the differential value-checks every chunk's exact bytes
    without shipping the corpus twice.

    Contract: NULL doc_id / NULL or empty text rows produce no chunks;
    a doc of len chars produces floor((len-1)/{_CH_STRIDE})+1 chunks
    (the last one short). Character positions are code points in both
    engines (unicode-fuzz-checked).

    Scale shape: one narrow map + a bounded explode (len/stride chunks
    per doc), no shuffle at all — chunking is embarrassingly parallel
    and fuses into the scan stage. Downstream embedding is a
    mapInPandas over these spans; the md5 doubles as the chunk-level
    exact-dedup key.
    """
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull() & (F.length("text") > 0)
    )
    d = d.withColumn(
        "chunk_idx",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr(f"(length(text) - 1) div {_CH_STRIDE}").cast("bigint"),
            )
        ),
    )
    chunk = F.expr(f"substring(text, int(1 + chunk_idx*{_CH_STRIDE}), {_CH_SIZE})")
    return d.select(
        "doc_id",
        "chunk_idx",
        F.length(chunk).cast("bigint").alias("chunk_len"),
        F.md5(chunk.cast("binary")).alias("chunk_md5"),
    )


# --- TF-IDF / BM25 retrieval scoring ----------------------------------
#
# Both rankers replace the logarithmic idf with its monotone rational
# argument so every score is a ratio of exact integers: ln() is only
# ~1-ulp-accurate and NOT guaranteed bit-identical across engines,
# while integer products and a single integer floor-division are.
# Scores are quantized to 1e-6 by that division, summed (BM25) as
# exact BIGINTs, so the driver's value-hash matches bit-for-bit.

_TFIDF_Q = 1_000_000  # score quantum: 1e-6
_TFIDF_TOPK = 5


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_W}) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             CAST((t.tf * {_TFIDF_Q} * (SELECT n FROM n)) // d.df AS BIGINT)
               AS score_q
      FROM tf t JOIN df d USING (term)),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY score_q DESC, term) AS rk
      FROM scored)
    SELECT doc_id, term, tf, df, score_q
    FROM ranked WHERE rk <= {_TFIDF_TOPK}
    ORDER BY doc_id, score_q DESC, term
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by tf-idf — the keyword
    extractor behind topic labeling, near-duplicate triage, and
    per-domain vocabulary drift monitoring on a training corpus.

    idf uses the rational form N/df — a deliberate deterministic
    variant: the op ranks by tf*N/df, which is NOT rank-equivalent to
    tf*ln(N/df) once multiplied by tf (e.g. tf=1, N/df=7 outranks
    tf=3, N/df=2 rationally but not under ln); rank-equivalence holds
    only among terms with equal tf. Both sides of the oracle compute
    the same formula, so parity is exact, and the variant still
    surfaces rare-in-corpus/frequent-in-doc terms.
    score_q = (tf * 1e6 * N) div df is one integer floor-division on
    exact BIGINT products — bit-identical across engines. Domain:
    tf*N*1e6 must fit int64 (tf*N < 9.2e12); beyond that production
    drops to a 1e3 quantum or DECIMAL(38,0) products — same plan.

    Scale shape: one token explode feeding TWO hash aggregates (tf by
    (doc,term), df by term), a term-keyed join of tf against df (df is
    corpus-vocabulary-sized — orders smaller than the token stream),
    the 1-row corpus count broadcast in by crossJoin, and the per-doc
    top-5 as a rank window partitioned by doc_id — WindowGroupLimit
    caps each partition's exchange rows at k. No global sort, no
    driver data, shuffles carry (doc_id, term, small ints) only.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(normalized_text("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr(f"(tf * {_TFIDF_Q} * n) div df").cast("bigint").alias("score_q"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_q").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TFIDF_TOPK)
        .drop("rk")
        .orderBy("doc_id", F.col("score_q").desc(), "term")
    )


# BM25 with k1 = 6/5, b = 3/4 (the textbook defaults as exact
# rationals). Clearing denominators, with N docs, T total tokens,
# dl the document token count and avgdl = T/N:
#
#   score(term) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
#               = (2N - 2df + 1) * 22*tf*T
#                 / [ (2df + 1) * (10*tf*T + 3*T + 9*dl*N) ]
#
# (idf's rational argument (N - df + 0.5)/(df + 0.5) scaled by 2 —
# every factor an exact integer). Per-term score quantized by one
# integer floor-division, per-(query, doc) totals are exact BIGINT
# sums. Queries ship as a literal inline table (broadcast side).
_BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "data"), (1, "query"),
    (2, "spark"), (2, "join"), (2, "fast"),
    (3, "window"), (3, "stream"),
    (4, "hash"), (4, "table"), (4, "scan"),
    (5, "slow"), (5, "filter"),
)
_BM25_TOPK = 10
_SQL_BM25_Q = " UNION ALL ".join(
    f"SELECT {qid} AS query_id, '{t}' AS term" for qid, t in _BM25_QUERIES
)


@register(
    "text_bm25_search",
    oracle=f"""
    WITH q AS ({_SQL_BM25_Q}),
    tok AS (
      SELECT doc_id, unnest({_SQL_W}) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    g AS (
      SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n,
             CAST((SELECT SUM(tf) FROM tf) AS BIGINT) AS t),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             CAST((CAST({_TFIDF_Q} AS HUGEINT)
                   * (2*g.n - 2*df.df + 1) * 22 * tf.tf * g.t)
                  // (CAST(2*df.df + 1 AS HUGEINT)
                      * (CAST(10 AS HUGEINT)*tf.tf*g.t + 3*g.t + 9*dl.dl*g.n))
                  AS BIGINT)
               AS sq
      FROM q
      JOIN tf ON tf.term = q.term
      JOIN df ON df.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN g),
    totals AS (
      SELECT query_id, doc_id, CAST(SUM(sq) AS BIGINT) AS score_q
      FROM scored GROUP BY query_id, doc_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY score_q DESC, doc_id) AS rk
      FROM totals)
    SELECT query_id, doc_id, score_q, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_BM25_TOPK}
    ORDER BY query_id, rk
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 full-text retrieval: top-10 documents per query for a
    broadcast query set — the lexical-search half of RAG retrieval
    (the dense half is sim_search_*), and the relevance scorer for
    corpus-quality audits ("which documents dominate query X").

    k1=1.2, b=0.75 as exact rationals with denominators cleared, so
    each term's score is ONE integer floor-division of exact products
    and per-(query, doc) totals are exact BIGINT sums — bit-identical
    across engines with no ln() in the path (see the derivation
    above). The products are computed in DECIMAL(38,0) on the Spark
    side and HUGEINT (int128) in the oracle: the int64 numerator
    bound (~4.4e7 * N * tf * T, counting the 2x idf scaling and the
    1e6 quantum) would already wrap at N~2e4, T~2e6, tf>=6 — sizes
    the scalecheck battery reaches — and Spark's non-ANSI int64
    wraps silently where DuckDB errors. DECIMAL(38,0) holds until
    products exceed 1e38 (N*tf*T < ~2.3e30), far past any corpus;
    the floor-division quotient (a quantized score <= ~1e8) returns
    to BIGINT.

    Scale shape: the query table is a literal inline relation joined
    broadcast against tf on term — the corpus-sized tf relation never
    reshuffles for it; df and dl are term- and doc-keyed hash
    aggregates of tf itself; N and T ride in as a broadcast 1-row
    relation. Only candidate (query, doc) pairs — documents actually
    containing a query term — survive past the join, and the final
    top-10 per query is a rank window over that candidate set
    (WindowGroupLimit bounds the exchange). Zero Python, zero global
    sort, zero driver data.
    """
    d = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame(list(_BM25_QUERIES), "query_id int, term string")
    toks = d.select(
        "doc_id",
        F.explode(F.split(normalized_text("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    g = d.agg(F.count(F.lit(1)).cast("bigint").alias("n")).crossJoin(
        tf.agg(F.sum("tf").cast("bigint").alias("t"))
    )
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(df, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                f"(CAST({_TFIDF_Q} AS DECIMAL(38,0))"
                f" * (2*n - 2*df + 1) * 22 * tf * t)"
                f" div (CAST(2*df + 1 AS DECIMAL(38,0))"
                f" * (CAST(10 AS DECIMAL(38,0))*tf*t + 3*t + 9*dl*n))"
            ).cast("bigint").alias("sq"),
        )
    )
    totals = scored.groupBy("query_id", "doc_id").agg(
        F.sum("sq").cast("bigint").alias("score_q")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_q").desc(), "doc_id")
    return (
        totals.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _BM25_TOPK)
        .orderBy("query_id", "rk")
    )


# --- BPE vocabulary induction (iterative merge training) --------------
#
# text_bpe_pairs counts ONE round's candidate pairs; this trains the
# actual merge list: N rounds of (count adjacent symbol pairs) ->
# (pick the most frequent pair) -> (merge it corpus-wide), the inner
# loop of BPE tokenizer induction. The scalable shape is that training
# runs on the DISTINCT-WORD frequency table (|vocab| rows, one corpus
# pass to build), never the token stream — exactly how production BPE
# trainers work.
#
# Words are carried as space-delimited symbol strings (' h e l l o ')
# and a merge is ONE literal replace(' x y ' -> ' xy '): both engines'
# replace() is the same left-to-right non-overlapping scan that
# resumes AFTER the inserted text (verified: ' a a a a ' -> ' aa a a '
# in both), so the merge is bit-identical cross-engine. Because the
# pattern ' x y ' shares its delimiter space with the next occurrence,
# this deviates from strict leftmost-greedy BPE on ANY back-to-back
# repeat of the winning pair, not just runs of identical symbols:
# ' a a a a ' -> ' aa a a ' (greedy: ' aa aa '), and for pair (x, y)
# ' x y x y ' -> ' xy x y ' (greedy: ' xy xy ') — the trailing space
# of the first match is consumed, so the adjacent repeat is skipped,
# and round-(i+1) pair counts inherit that encoding. The engine
# contract is the shared replace() semantics, and the tiebreak
# (count desc, pair asc) makes every round's winner total-ordered.
_BPE_ROUNDS = 3


def _bpe_sql_round(i: int) -> str:
    return f"""
    p{i} AS (
      SELECT s[j] AS x, s[j + 1] AS y, CAST(SUM(cnt) AS BIGINT) AS pair_n
      FROM (SELECT string_split(trim(w), ' ') AS s, cnt FROM w{i - 1}) t
      CROSS JOIN (SELECT unnest(generate_series(1, 63)) AS j) js
      WHERE j < len(s)
      GROUP BY s[j], s[j + 1]),
    top{i} AS (
      SELECT {i} AS round, x, y, pair_n FROM p{i}
      ORDER BY pair_n DESC, x, y LIMIT 1),
    w{i} AS (
      SELECT replace(w, ' ' || t.x || ' ' || t.y || ' ',
                     ' ' || t.x || t.y || ' ') AS w, cnt
      FROM w{i - 1} CROSS JOIN top{i} t)
    """


@register(
    "text_bpe_train",
    oracle=f"""
    WITH words AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest({_SQL_W}) AS word FROM documents) t
      WHERE word <> '' AND length(word) <= 32
      GROUP BY word),
    w0 AS (
      SELECT ' ' || array_to_string(list_transform(
               generate_series(1, length(word)),
               i -> substring(word, i, 1)), ' ') || ' ' AS w, cnt
      FROM words),
    {", ".join(_bpe_sql_round(i) for i in range(1, _BPE_ROUNDS + 1))}
    SELECT round, x, y, pair_n FROM (
      {" UNION ALL ".join(f"SELECT * FROM top{i}" for i in range(1, _BPE_ROUNDS + 1))}
    ) m ORDER BY round
    """,
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-vocabulary induction: 3 unrolled merge rounds,
    emitting the learned merge list (round, x, y, pair_count) — the
    artifact a tokenizer trainer actually produces. Each round counts
    adjacent symbol pairs over the word-frequency table, picks the
    winner under a total order, and applies the merge with one
    cross-engine-identical literal replace (contract note above).

    Scale shape: the corpus is touched ONCE (word counts — explode +
    hash aggregate, Zipf-collapsed map-side); every round after that
    is |vocab|-sized: a bounded explode (symbols per word <= 32 chars,
    the cap applied at intake like production trainers cap word
    length), a pair-count hash aggregate, a 1-row
    TakeOrderedAndProject winner broadcast back by crossJoin, and a
    narrow replace map. Round depth is compile-time (real trainers run
    10k+ rounds off-corpus on the pair-count table; the DISTRIBUTED
    part — building word counts and applying merges corpus-wide — is
    exactly what's shown here).
    """
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(normalized_text("text"), " ")).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= 32))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tops = _bpe_merge_tops(words.select(_bpe_spaced("word").alias("w"), "cnt"))
    out = tops[0]
    for t in tops[1:]:
        out = out.unionAll(t)
    return out.orderBy("round")


def _bpe_spaced(col: str) -> Column:
    """A word as its space-delimited symbol string with sentinel
    delimiters: 'hello' -> ' h e l l o ' (the representation every
    merge round and the encoder operate on)."""
    return F.expr(
        f"concat(' ', array_join(transform(sequence(1, length({col})),"
        f" i -> substring({col}, i, 1)), ' '), ' ')"
    )


def _bpe_apply_merge(frame: DataFrame, top: DataFrame, keep: list[str]) -> DataFrame:
    """Apply one round's winning merge (the 1-row ``top`` broadcast by
    crossJoin) to ``frame``'s spaced column ``w`` — one literal
    replace(' x y ' -> ' xy '), the cross-engine-identical contract
    documented above _BPE_ROUNDS."""
    t = top.select(F.col("x").alias("_x"), F.col("y").alias("_y"))
    return frame.crossJoin(F.broadcast(t)).select(
        *keep,
        F.replace(
            "w",
            F.concat(F.lit(" "), F.col("_x"), F.lit(" "), F.col("_y"), F.lit(" ")),
            F.concat(F.lit(" "), F.col("_x"), F.col("_y"), F.lit(" ")),
        ).alias("w"),
    )


def _bpe_merge_tops(w: DataFrame) -> list[DataFrame]:
    """Run the _BPE_ROUNDS merge rounds over the spaced word-frequency
    relation ``w`` (columns w, cnt), returning each round's winner as
    a 1-row (round, x, y, pair_n) frame — the training loop shared by
    text_bpe_train (which emits the merge list) and text_bpe_encode
    (which applies it to the corpus)."""
    tops = []
    for i in range(1, _BPE_ROUNDS + 1):
        syms = w.select(F.split(F.trim(F.col("w")), " ").alias("s"), "cnt")
        pairs = (
            syms.select(
                F.posexplode(F.expr("slice(s, 1, size(s) - 1)")).alias("j0", "x"),
                F.expr("s").alias("s"),
                "cnt",
            )
            .select(
                F.col("x"),
                F.expr("s[j0 + 1]").alias("y"),
                "cnt",
            )
            .groupBy("x", "y")
            .agg(F.sum("cnt").cast("bigint").alias("pair_n"))
        )
        top = (
            pairs.orderBy(F.col("pair_n").desc(), "x", "y")
            .limit(1)
            .select(F.lit(i).cast("int").alias("round"), "x", "y", "pair_n")
        )
        tops.append(top)
        w = _bpe_apply_merge(w, top, keep=["cnt"]).select("w", "cnt")
    return tops


def _bpe_enc_sql_round(i: int) -> str:
    return f"""
    e{i} AS (
      SELECT word, replace(w, ' ' || t.x || ' ' || t.y || ' ',
                           ' ' || t.x || t.y || ' ') AS w
      FROM e{i - 1} CROSS JOIN top{i} t)
    """


@register(
    "text_bpe_encode",
    oracle=f"""
    WITH vocab AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest({_SQL_W}) AS word FROM documents) t
      WHERE word <> '' GROUP BY word),
    words AS (SELECT word, cnt FROM vocab WHERE length(word) <= 32),
    w0 AS (
      SELECT ' ' || array_to_string(list_transform(
               generate_series(1, length(word)),
               i -> substring(word, i, 1)), ' ') || ' ' AS w, cnt
      FROM words),
    {", ".join(_bpe_sql_round(i) for i in range(1, _BPE_ROUNDS + 1))},
    e0 AS (
      SELECT word, ' ' || array_to_string(list_transform(
               generate_series(1, length(word)),
               i -> substring(word, i, 1)), ' ') || ' ' AS w
      FROM vocab),
    {", ".join(_bpe_enc_sql_round(i) for i in range(1, _BPE_ROUNDS + 1))},
    encv AS (
      SELECT word, trim(w) AS enc,
             CAST(len(string_split(trim(w), ' ')) AS BIGINT) AS n_sub
      FROM e{_BPE_ROUNDS}),
    docw AS (
      SELECT doc_id, j AS pos, t[j] AS word
      FROM (SELECT doc_id, {_SQL_W} AS t FROM documents) dd,
           LATERAL (SELECT unnest(generate_series(1, len(t))) AS j) g
      WHERE t[j] <> ''),
    sc AS (
      SELECT dw.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(e.n_sub) AS BIGINT) AS n_tokens,
             md5(string_agg(e.enc, ' ' ORDER BY dw.pos)) AS tokens_fp
      FROM docw dw JOIN encv e ON e.word = dw.word
      GROUP BY dw.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(sc.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
           sc.tokens_fp
    FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
    """,
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — apply the trained merge list to tokenize the
    corpus, the consumer step text_bpe_train was missing (VERDICT r8
    item 3: the reference curation chain is gate -> dedup -> budget ->
    tokenize -> pack, and until now pack rode the chars/4 estimator).
    Trains the same {_BPE_ROUNDS}-round merge list as text_bpe_train
    (shared loop, identical winners), applies it to the DISTINCT-WORD
    table in rank order — the same cross-engine literal-replace
    contract, so deviation-from-greedy on back-to-back repeats is
    identical in both engines — and joins the encoded vocabulary back
    to the per-document word stream. Emits the tokenization ledger:
    doc_id, n_words (words seen), n_tokens (BPE subtokens — the REAL
    count text_pack_sequences / sample_token_budget consume via their
    frame-level params), tokens_fp (md5 of the space-joined subtoken
    stream in document order — proves token IDENTITY cross-engine,
    not just counts). Wordless/NULL-text docs stay in the ledger with
    zero counts and a NULL fingerprint (a tokenizer places every
    document).

    Scale shape: TWO corpus scans — one inside the |vocab|-bounded
    localCheckpoint (word counts; training rounds AND the encoder both
    derive from the checkpoint, so the merge loop never re-touches the
    corpus — the text_lm_score c12 lesson), one to stream (doc_id,
    pos, word) into the encode join. That join is a word equi-join
    against the |vocab|-sized encoded table: broadcastable while the
    vocabulary fits, AQE-skew-split beyond (Zipf head words are the
    skew). Per-doc aggregation is one hash agg on doc_id; the ordered
    fingerprint sorts each doc's own tokens only (array_sort over a
    per-doc collect_list — bounded by document length, the same
    per-doc-array class as dedup_paragraph). Words are encoded ONCE
    per distinct word, not once per occurrence — the production
    trainer trick that makes tokenization |vocab|-bounded compute plus
    one streaming join. Unlike training (words > 32 chars excluded
    from COUNTING, like production trainers cap), encoding covers
    EVERY word — an unmergeable long word just stays at one subtoken
    per character.
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(normalized_text("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # |vocab|-bounded, ONE corpus scan
    )
    tops = _bpe_merge_tops(
        vocab.filter(F.length("word") <= 32).select(
            _bpe_spaced("word").alias("w"), "cnt"
        )
    )
    enc = vocab.select("word", _bpe_spaced("word").alias("w"))
    for top in tops:
        enc = _bpe_apply_merge(enc, top, keep=["word"])
    encv = enc.select(
        "word",
        F.trim(F.col("w")).alias("enc"),
        F.size(F.split(F.trim(F.col("w")), " ")).cast("bigint").alias("n_sub"),
    )
    return _bpe_ledger(d, encv)


def _bpe_ledger(d: DataFrame, encv: DataFrame) -> DataFrame:
    """Assemble the per-document tokenization ledger from a corpus
    ``d`` (doc_id, text) and an encoded vocabulary ``encv`` (word,
    enc, n_sub): stream (doc_id, pos, word), equi-join the
    |vocab|-sized encoded table (broadcastable while the vocabulary
    fits; AQE-skew-split beyond — Zipf head words are the skew), one
    hash agg on doc_id. Shared by text_bpe_encode (merges trained
    inline) and bpe_encode_frame (fixed external merge table)."""
    docw = d.select(
        "doc_id",
        F.posexplode(F.split(normalized_text("text"), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    sc = (
        docw.join(encv, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_tokens"),
            F.md5(
                F.expr(
                    "array_join(transform(array_sort(collect_list("
                    "struct(pos, enc))), s -> s.enc), ' ')"
                )
            ).alias("tokens_fp"),
        )
    )
    return d.select("doc_id").join(sc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        "tokens_fp",
    )


_BPE_FRAME_MAX_MERGES = 65_536


def bpe_encode_frame(
    docs: DataFrame,
    merges: DataFrame,
    max_merges: int = _BPE_FRAME_MAX_MERGES,
) -> DataFrame:
    """Tokenize a corpus with a FIXED, pre-trained merge table — the
    production apply step. text_bpe_encode retrains its merges on
    every invocation (so the registry key stays self-contained and
    oracle-checkable); real pipelines train the tokenizer ONCE and
    then apply that frozen artifact to every corpus shard so the data
    matches an existing model's vocabulary. This entry point is that
    step: ``merges`` is any (round, x, y) frame — text_bpe_train's
    output, or an externally-supplied table read from parquet.

    Same output ledger contract as text_bpe_encode (doc_id, n_words,
    n_tokens, tokens_fp), and bit-identical to it when fed the merges
    text_bpe_train learns on the same corpus (pytest-pinned): each
    merge is applied in rank order as a literal left-to-right
    non-overlapping ' x y ' -> ' xy ' replace, the cross-engine
    contract documented at _BPE_ROUNDS — Python str.replace scans
    exactly like Spark's replace() (' a a a a ' -> ' aa a a ' in
    both), so the two apply paths agree on back-to-back repeats too.

    Scale shape: the merge table is the tokenizer artifact — small by
    construction (GPT-2 ships 50k merges) — so it is collected once,
    bounded by ``max_merges`` (limit(max+1) probe; an over-cap table
    raises instead of OOMing the driver), and closure-shipped to
    executors. Words are encoded ONCE per DISTINCT word in an
    Arrow-batched pandas UDF (|vocab|-bounded Python, never
    per-occurrence — the UDF-is-the-slow-path rule: per-token work
    stays JVM-side in _bpe_ledger's join/agg). At 10k+ merges the
    chained-literal-replace Catalyst plan text_bpe_encode builds would
    be 10k expression nodes deep; the per-word Python loop is the
    right physical strategy for a production-sized artifact.
    """
    rows = (
        merges.select("round", "x", "y")
        .orderBy("round")
        .limit(max_merges + 1)
        .collect()
    )
    if len(rows) > max_merges:
        raise ValueError(
            f"merge table exceeds max_merges={max_merges}: a BPE merge "
            "list is a bounded tokenizer artifact; raise the cap "
            "explicitly if yours is genuinely larger"
        )
    pairs = [(r.x, r.y) for r in rows]

    @F.pandas_udf("string")
    def enc_word(words: pd.Series) -> pd.Series:
        def one(word: str) -> str:
            w = " " + " ".join(word) + " "
            for x, y in pairs:
                w = w.replace(f" {x} {y} ", f" {x}{y} ")
            return w.strip()

        return words.map(one)

    vocab = (
        docs.select(F.explode(F.split(normalized_text("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    encv = vocab.select("word", enc_word("word").alias("enc")).select(
        "word",
        "enc",
        F.size(F.split("enc", " ")).cast("bigint").alias("n_sub"),
    )
    return _bpe_ledger(docs, encv)


def _bpe_disjoint_batch(
    cands: list, quota: int
) -> list[tuple[str, str, int]]:
    """The batched-BPE acceptance rule: walk this round's top pair
    candidates in winner order, ACCEPT every candidate disjoint from
    all previously-accepted merges (no shared operand or created
    symbol — {x, y, x+y} must be fresh), and SKIP conflicting ones.

    Why skipping preserves count exactness: the recorded pair_n of an
    APPLIED merge only needs to be correct at the batch-start state,
    and pairwise disjointness makes the applied merges invariant under
    each other — a SKIPPED merge is not applied at all, so it cannot
    invalidate anything; it is simply re-counted (exactly, against the
    post-batch state) next round. A stricter stop-at-first-conflict
    prefix rule has the same exactness but measured ~1.7x fewer
    collects saved at best (early BPE candidates perpetually share the
    common letters — 'e', 'a', 't' — so the prefix rarely got past
    2-3 accepts; see SCALE.md r11). The cost of skipping is only
    larger merge-ORDER divergence from sequential training, already
    the documented n_batch>1 approximation."""
    accepted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for r in cands:
        if len(accepted) >= quota:
            break
        if used & {r.x, r.y, r.x + r.y}:
            continue
        accepted.append((r.x, r.y, r.pair_n))
        used |= {r.x, r.y, r.x + r.y}
    return accepted


def bpe_train_frame(
    corpus_or_wordcounts: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
    max_word_len: int = 32,
    n_batch: int = 1,
) -> DataFrame:
    """Arbitrary-K BPE training — the production trainer the unrolled
    registry keys stand in for (VERDICT r9 item 2: text_bpe_train is
    pinned at {_BPE_ROUNDS} plan-level rounds for oracle stability;
    real tokenizers run tens of thousands). Input is either a corpus
    (doc_id, text) or a pre-aggregated word-frequency table
    (word, cnt); output is the merge-list artifact
    (round, x, y, pair_n) with ``round`` in 1..n_merges, exactly
    text_bpe_train's schema — feed it to bpe_encode_frame.

    Physical strategy: the corpus is touched ONCE (word counts,
    localCheckpoint — the text_lm_score c12 lesson); every merge round
    after that is |vocab|-bounded: one pair-count hash aggregate over
    the checkpointed spaced-word table and ONE bounded winner collect —
    the sanctioned bounded-driver-decision idiom (a BPE winner is a
    driver decision by nature: it parameterizes the next round's
    plan). Winning merges are applied as LITERAL replaces (no
    crossJoin needed — the driver has the values), same cross-engine
    ' x y ' -> ' xy ' contract as the plan-level rounds, so the first
    {_BPE_ROUNDS} winners are pinned equal to text_bpe_train's in
    tests. Lineage is re-checkpointed every ``checkpoint_every``
    merges (superseded checkpoints released), so plan depth stays
    bounded at any K instead of nesting n_merges replace() nodes the
    way the unrolled plan would. Training stops early when no pair
    remains (vocabulary fully merged).

    ``n_batch`` batches the driver round trips (VERDICT r10 item 3:
    one collect per merge is 50k sequential Spark jobs at GPT-2 scale
    — hours of pure scheduling latency at ANY corpus size). Each
    round collects the top-``n_batch`` pair candidates and applies the
    pairwise-DISJOINT subset in winner order (no shared operand or
    created symbol; conflicting candidates are skipped, not stopped at
    — :func:`_bpe_disjoint_batch`, which documents why skipping stays
    count-exact) as stacked literal replaces in one plan node, cutting
    collects up to n_batch-fold. n_batch=1
    is exactly the one-at-a-time loop (pinned); n_batch>1 is the
    standard batched-BPE approximation — counts for accepted merges
    are exact (disjointness keeps them invariant under each other),
    but a pair CREATED by an accepted merge cannot win until the next
    round, so the merge ORDER can differ from strictly-sequential
    training where a fresh pair would have outranked the round's
    lower candidates (both orders are valid BPE vocabularies; pinned
    divergence + conflict-deferral tests in test_retrieval_ml.py).

    Replace-overlap contract (ADVICE r10): a merge is ONE
    non-overlapping left-to-right literal replace of ' x y ' that
    resumes AFTER the inserted text, so back-to-back repeats of the
    winning pair merge only alternate occurrences per round —
    ' a a a a ' -> ' aa a a ' (strict leftmost-greedy BPE would give
    ' aa aa ') — because the shared delimiter space is consumed by
    the first match. pair_n meanwhile counts every adjacent
    occurrence, so merges-applied vs pair_n bookkeeping can diverge
    from canonical BPE on such runs. This IS the registered keys'
    pinned cross-engine contract (both engines' replace() is the same
    scan — see the _BPE_ROUNDS note); callers needing canonical
    counts should apply the replace to fixpoint per round instead.

    Scale shape per round: |vocab| rows × ≤max_word_len symbols explode into a
    byte-pair hash aggregate (map-side combined) + an n_batch-row
    TakeOrderedAndProject — corpus size never re-enters. GPT-2-scale
    (50k merges) is 50k/~n_batch such rounds off ONE corpus scan; the
    per-round cost is seconds at any corpus size because it is
    vocabulary-bounded, the same reason production trainers (e.g.
    HuggingFace tokenizers) train on word counts, not raw text.
    """
    from .. import probes

    cols = set(corpus_or_wordcounts.columns)
    if {"word", "cnt"} <= cols:
        words = corpus_or_wordcounts.select("word", "cnt")
    else:
        words = (
            corpus_or_wordcounts.select(
                F.explode(F.split(normalized_text("text"), " ")).alias("word")
            )
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
    w = (
        words.filter((F.col("word") != "") & (F.length("word") <= max_word_len))
        .select(_bpe_spaced("word").alias("w"), "cnt")
        .localCheckpoint(eager=False)
    )
    if n_batch < 1:
        raise ValueError(f"n_batch must be >= 1, got {n_batch}")
    merges: list[tuple[int, str, str, int]] = []
    prev_ckpt = w
    since_ckpt = 0
    while len(merges) < n_merges:
        syms = w.select(F.split(F.trim(F.col("w")), " ").alias("s"), "cnt")
        cands = (
            syms.select(
                F.posexplode(F.expr("slice(s, 1, size(s) - 1)")).alias("j0", "x"),
                F.expr("s").alias("s"),
                "cnt",
            )
            .select("x", F.expr("s[j0 + 1]").alias("y"), "cnt")
            .groupBy("x", "y")
            .agg(F.sum("cnt").cast("bigint").alias("pair_n"))
            .orderBy(F.col("pair_n").desc(), "x", "y")
            .limit(n_batch)
            .collect()
        )
        if not cands:
            break  # vocabulary fully merged
        batch = _bpe_disjoint_batch(cands, n_merges - len(merges))
        col = F.col("w")
        for x, y, pair_n in batch:
            merges.append((len(merges) + 1, x, y, pair_n))
            col = F.replace(col, F.lit(f" {x} {y} "), F.lit(f" {x}{y} "))
        w = w.select(col.alias("w"), "cnt")
        since_ckpt += len(batch)
        if since_ckpt >= checkpoint_every:
            nxt = w.localCheckpoint(eager=True)
            probes.release(prev_ckpt)
            prev_ckpt = w = nxt
            since_ckpt = 0
    probes.release(prev_ckpt)
    return corpus_or_wordcounts.sparkSession.createDataFrame(
        merges, schema="round int, x string, y string, pair_n bigint"
    )


# --- bigram language-model counts -------------------------------------

_LM_TOPK = 100
_LM_Q = 1_000_000


@register(
    "text_ngram_lm_counts",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_W} AS t FROM documents),
    bg AS (
      SELECT t[j] AS w1, t[j + 1] AS w2
      FROM toks CROSS JOIN (SELECT unnest(generate_series(1, 255)) AS j) js
      WHERE j < len(t) AND t[j] <> '' AND t[j + 1] <> ''),
    c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12
      FROM bg GROUP BY w1, w2),
    c1 AS (
      SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1)
    SELECT c12.w1, c12.w2, c12.n12, c1.n1,
           CAST((c12.n12 * {_LM_Q}) // c1.n1 AS BIGINT) AS cond_q
    FROM c12 JOIN c1 ON c1.w1 = c12.w1
    ORDER BY c12.n12 DESC, c12.w1, c12.w2 LIMIT {_LM_TOPK}
    """,
)
def text_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model estimation: the (w1, w2) -> count table
    plus each bigram's integer-quantized conditional probability
    P(w2|w1) = n12/n1 — the count statistics a KenLM-style n-gram LM
    (and every LM-perplexity quality filter derived from one) is
    trained on. Top-100 bigrams by frequency with a total tiebreak.

    cond_q = (n12 * 1e6) div n1 is one integer floor-division on exact
    BIGINT counts — bit-identical across engines; n1 is defined as
    bigram-start occurrences (sum of n12 over w2), so the conditional
    distribution sums to ~1e6 per w1 by construction.

    Scale shape: in-document adjacency never crosses a partition —
    bigrams come from a bounded positional explode fused into the
    scan (docs capped at 256 tokens here; production shards longer
    docs with a 1-token overlap, same plan); two stacked hash
    aggregates (bigram, then first-word marginals as an aggregate OF
    the bigram table — never a second corpus pass); the final cut is
    TakeOrderedAndProject. Zipf skew collapses map-side exactly like
    every counting op here.
    """
    d = load_table(spark, sf_dir, "documents")
    # scan repartition measured and REJECTED here (OPTIMIZATION_r13):
    # the bounded tokenize+explode feeds a map-side partial aggregate
    # and the added exchange costs more than the 1-task scan (0.55x)
    toks = d.select(F.split(normalized_text("text"), " ").alias("t"))
    bg = (
        toks.select(
            # w1 positions j = 1 .. min(size-1, 255): identical to the
            # oracle's generate_series(1, 255) ∩ j < len(t) bound — a
            # `least(size, 255) - 1` shape would silently drop the
            # 255th bigram of >255-token docs relative to the oracle.
            F.posexplode(F.expr("slice(t, 1, least(size(t) - 1, 255))")).alias(
                "j0", "w1"
            ),
            F.col("t"),
        )
        .select("w1", F.expr("t[j0 + 1]").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    # Materialize the bigram table once: lazily, Catalyst would
    # re-derive c12 from a SECOND corpus scan for the marginal branch
    # (verified in the plan). The checkpointed relation is
    # vocabulary²-bounded — the same localCheckpoint pattern as the
    # dedup cascade's edge relation (operators/dedup.py).
    # eager=False keeps plan CONSTRUCTION side-effect-free: an eager
    # checkpoint here would run a Spark job (and pin executor blocks)
    # the moment the harness merely builds the DataFrame. Registered
    # keys stay lazy until executed, with ONE audited exception idiom:
    # construction-time routing probes, consolidated in
    # net7_etl_bus_spark/probes.py (VERDICT r7 item 3). Its module
    # docstring states the contract and lists every caller — the
    # mega-doc corpus probes in dedup_minhash_verified /
    # dedup_containment_lsh and events_funnel's bot-user probe — each
    # a bounded data-dependent PLAN-SHAPE choice that cannot be
    # expressed inside one lazy plan without either double-executing
    # the signature cascade or eagerly checkpointing it. The
    # truncation still happens on first action; note that once
    # materialized the checkpointed RDD has no lineage fallback if an
    # executor is lost — acceptable for a vocabulary²-bounded table.
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n12")
    ).localCheckpoint(eager=False)
    c1 = c12.groupBy("w1").agg(F.sum("n12").cast("bigint").alias("n1"))
    return (
        c12.join(c1, "w1")
        .select(
            "w1",
            "w2",
            "n12",
            "n1",
            F.expr(f"(n12 * {_LM_Q}) div n1").cast("bigint").alias("cond_q"),
        )
        .orderBy(F.col("n12").desc(), "w1", "w2")
        .limit(_LM_TOPK)
    )

@register(
    "text_lm_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_W} AS t FROM documents),
    bg AS (
      SELECT doc_id, t[j] AS w1, t[j + 1] AS w2
      FROM toks CROSS JOIN (SELECT unnest(generate_series(1, 255)) AS j) js
      WHERE j < len(t) AND t[j] <> '' AND t[j + 1] <> ''),
    c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12
      FROM bg GROUP BY w1, w2),
    c1 AS (
      SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1),
    lm AS (
      SELECT c12.w1, c12.w2,
             CAST((c12.n12 * {_LM_Q}) // c1.n1 AS BIGINT) AS cond_q
      FROM c12 JOIN c1 ON c1.w1 = c12.w1),
    sc AS (
      SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(lm.cond_q) AS BIGINT) AS sum_cond_q
      FROM bg b JOIN lm ON lm.w1 = b.w1 AND lm.w2 = b.w2
      GROUP BY b.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           sc.sum_cond_q,
           CAST(sc.sum_cond_q // sc.n_bigrams AS BIGINT) AS score_q
    FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM predictability score — the quality-filter
    CONSUMER of text_ngram_lm_counts' count table (CCNet-style
    perplexity filtering: score every document under a reference
    n-gram LM, gate on the score). Here the LM side is the corpus
    itself, which makes the op self-contained and oracle-checkable;
    note the self-scoring caveat (pinned in test_retrieval_ml.py):
    hapax bigrams are trivially self-predictable (their w1 has one
    continuation, P=1), so self-scoring ranks REPEATED-vocabulary
    boilerplate below unique-word text rather than flagging gibberish.
    Production gibberish filtering points the LM-side scan at a
    CURATED reference corpus — the identical plan with a different
    ``documents`` path — where out-of-domain bigrams miss the LM
    table: the score join is inner, so ``n_bigrams`` then counts
    in-vocabulary bigrams only and the coverage ratio
    (n_bigrams / tokens-1) is itself the OOV quality signal.

    score_q = floor(mean of the quantized conditional probabilities
    P(w2|w1) * 1e6) over the doc's bigrams — all BIGINT arithmetic on
    exact counts, bit-identical cross-engine. This arithmetic-mean
    predictability proxy is chosen over geometric-mean perplexity
    DELIBERATELY: true perplexity needs ln(), whose last-ulp behavior
    is not cross-engine stable, so it could never be oracle-hashed;
    for gating, both order documents by "how typical is this text
    under the reference LM" and the proxy is the one you can verify.
    Docs with <2 effective tokens score NULL (n_bigrams 0) and stay in
    the ledger — a gate must see every document, not silently drop the
    short ones.

    Scale shape: TWO corpus scans (one to train the vocabulary^2-
    bounded LM table — lazily checkpointed like text_ngram_lm_counts'
    bigram table — one to score), never a corpus-sized
    materialization. The score join is a (w1, w2) equi-join of bigram
    instances against the LM table: broadcastable while the LM fits
    (vocab^2-bounded), AQE-skew-split beyond that (hot function-word
    bigrams are the skew; same Zipf story as every counting op here).
    Per-doc aggregation is one hash agg on doc_id. Docs cap at 256
    tokens here like the LM trainer; production shards longer docs
    with a 1-token overlap, same plan.
    """
    d = load_table(spark, sf_dir, "documents")

    def bigrams(frame):
        # scan repartition measured and REJECTED here as in
        # text_ngram_lm_counts (0.62x — both scans feed partial aggs)
        toks = frame.select(
            "doc_id", F.split(normalized_text("text"), " ").alias("t")
        )
        return (
            toks.select(
                "doc_id",
                F.posexplode(
                    F.expr("slice(t, 1, least(size(t) - 1, 255))")
                ).alias("j0", "w1"),
                F.col("t"),
            )
            .select("doc_id", "w1", F.expr("t[j0 + 1]").alias("w2"))
            .filter((F.col("w1") != "") & (F.col("w2") != ""))
        )

    # Checkpoint c12 ITSELF, not the joined lm: both the marginal c1
    # and the join reference c12, and a checkpoint placed above the
    # join leaves both references below it — lazily Catalyst then
    # re-derives the bigram aggregate from a SECOND full-corpus
    # explode+scan for the marginal branch (the exact re-derivation
    # text_ngram_lm_counts documents; ADVICE r8). With c12 pinned the
    # LM build is ONE corpus scan and the lm table needs no second
    # checkpoint — everything above c12 is vocab^2-bounded arithmetic.
    # Pinned by test_physical_plans.py::test_text_lm_score_two_scans.
    c12 = (
        bigrams(d)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n12"))
        .localCheckpoint(eager=False)  # vocab^2-bounded, one derivation
    )
    c1 = c12.groupBy("w1").agg(F.sum("n12").cast("bigint").alias("n1"))
    lm = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.expr(f"(n12 * {_LM_Q}) div n1").cast("bigint").alias("cond_q"),
    )
    sc = (
        bigrams(d)
        .join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("cond_q").cast("bigint").alias("sum_cond_q"),
        )
    )
    return d.select("doc_id").join(sc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        "sum_cond_q",
        F.expr("sum_cond_q div n_bigrams").cast("bigint").alias("score_q"),
    )
