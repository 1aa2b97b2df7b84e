"""End-to-end training-data curation pipeline — the flagship composite.

One operator chaining the stages a 100 TB pretraining-corpus build
actually runs, in the order production pipelines run them (cheap
narrow filters first, corpus-wide dedup last):

    language gate  ->  quality gate  ->  exact dedup  ->  MinHash
    near-dedup     ->  per-source audit of kept/dropped tokens

Every document gets exactly one disposition (`lang`, `quality`,
`exact_dup`, `near_dup`, `kept`) decided by the FIRST stage that drops
it, and the output is the per-(source, reason) document/token ledger —
the artifact a data team actually reviews before a training run.

The whole composite is one lazy Catalyst plan (no materialization
between stages) and is value-checked end-to-end against a single
DuckDB oracle that recomputes all five stages, including the banded
MinHash LSH + exact-Jaccard verification, from scratch.

Scale shape by stage: the two gates are narrow maps fused into the
scan; exact dedup shuffles (16-byte md5, doc_id); the near-dup stage
is the candidate-restricted cascade from operators/dedup.py (bucket
collisions only, never corpus²); the final ledger is a tiny
two-column groupBy. Nothing in the plan carries document text through
a shuffle except the survivor semi-joins, which carry keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..plans.registry import register
from .dedup import (
    _SQL_BANDS,
    _SQL_SHINGLES,
    _SQL_SIG,
    _SQL_VERIFIED_JACCARD,
    _SQL_XSETS,
    dedup_minhash_verified,
    normalized_text,
)
from .text import _SQL_STOP, _SQL_W, _STOPWORDS

_NEAR_J = 0.5  # verified-Jaccard drop threshold (same as dedup_cc)

_CURATION_ORACLE = f"""
WITH {_SQL_SHINGLES}, {_SQL_SIG}, {_SQL_BANDS},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
{_SQL_XSETS},
verified AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN xsets sa ON sa.doc_id = c.doc_a
  JOIN xsets sb ON sb.doc_id = c.doc_b
  WHERE {_SQL_VERIFIED_JACCARD} >= {_NEAR_J}
),
flags AS (
  SELECT doc_id, source,
         (lang = 'en') AS lang_ok,
         (LENGTH(text) BETWEEN 100 AND 20000 AND
          CAST(len(list_filter({_SQL_W}, x -> x IN ({_SQL_STOP}))) AS DOUBLE)
            / len({_SQL_W}) >= 0.01) AS q_ok,
         CAST(len({_SQL_W}) AS BIGINT) AS n_tokens,
         md5(translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS h
  FROM documents
),
s12 AS (SELECT * FROM flags WHERE lang_ok AND q_ok),
keep3 AS (SELECT MIN(doc_id) AS kid FROM s12 GROUP BY h),
s3 AS (SELECT f.doc_id FROM s12 f JOIN keep3 k ON f.doc_id = k.kid),
neardrop AS (
  SELECT DISTINCT v.doc_b AS doc_id
  FROM verified v
  JOIN s3 a ON v.doc_a = a.doc_id
  JOIN s3 b ON v.doc_b = b.doc_id
),
reasons AS (
  SELECT f.source, f.n_tokens,
         CASE WHEN NOT f.lang_ok THEN 'lang'
              WHEN NOT f.q_ok THEN 'quality'
              WHEN s3.doc_id IS NULL THEN 'exact_dup'
              WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
              ELSE 'kept' END AS reason
  FROM flags f
  LEFT JOIN s3 ON f.doc_id = s3.doc_id
  LEFT JOIN neardrop nd ON f.doc_id = nd.doc_id
)
SELECT source, reason,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM reasons GROUP BY source, reason ORDER BY source, reason
"""


@register("pipeline_curation", oracle=_CURATION_ORACLE)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation ledger (see module docstring).

    Disposition rules, applied in order:

    1. ``lang``      — declared language is not English.
    2. ``quality``   — fails the Gopher/C4-style gate (length in
       [100, 20000] and stopword ratio >= 1%), same predicate as
       `text_quality`.
    3. ``exact_dup`` — not the min-doc_id survivor of its normalized
       md5 group *among gate survivors* (dedup after filtering, the
       production order — a spam doc must not shield a good one).
    4. ``near_dup``  — a verified MinHash pair (Jaccard >= {_NEAR_J})
       links it to a smaller-id exact-stage survivor.
    5. ``kept``.
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.split(normalized_text("text"), " ")
    stop_ratio = (
        F.size(F.filter(w, lambda x: x.isin(*_STOPWORDS))).cast("double") / F.size(w)
    )
    flags = d.select(
        "doc_id",
        "source",
        (F.col("lang") == "en").alias("lang_ok"),
        (
            (F.length("text") >= 100)
            & (F.length("text") <= 20000)
            & (stop_ratio >= 0.01)
        ).alias("q_ok"),
        F.size(w).cast("bigint").alias("n_tokens"),
        F.md5(normalized_text("text")).alias("h"),
    )
    # r13 A/B note: parallelizing + localCheckpointing flags (to stop
    # the three differently-pruned consumers replaying the tokenize +
    # md5 pass) measured WORSE at sf0.1 (med 4.01 s vs 3.39 s,
    # proto_cs2): the eager checkpoint serializes what the scheduler
    # otherwise overlaps, and the replayed flags scans are cheap next
    # to the near-dup cascade. Deliberately left as-is; the cascade
    # inside dedup_minhash_verified carries the r13 win instead.
    s12 = flags.filter(F.col("lang_ok") & F.col("q_ok"))
    keep3 = s12.groupBy("h").agg(F.min("doc_id").alias("kid")).select("kid")
    s3 = s12.join(keep3, s12.doc_id == keep3.kid, "left_semi").select("doc_id")

    pairs = dedup_minhash_verified(spark, sf_dir).filter(F.col("jaccard") >= _NEAR_J)
    neardrop = (
        pairs.join(s3.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(s3.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )

    reasons = (
        flags.join(s3.withColumn("in_s3", F.lit(1)), "doc_id", "left")
        .join(neardrop.withColumn("in_nd", F.lit(1)), "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            F.when(~F.col("lang_ok"), "lang")
            .when(~F.col("q_ok"), "quality")
            .when(F.col("in_s3").isNull(), "exact_dup")
            .when(F.col("in_nd").isNotNull(), "near_dup")
            .otherwise("kept")
            .alias("reason"),
        )
    )
    return (
        reasons.groupBy("source", "reason")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source", "reason")
    )


# --- RAG-prep composite: chunk -> chunk-dedup -> per-source ledger ----

_RAG_ORACLE = """
WITH d AS (
  SELECT doc_id, source, text, CAST(LENGTH(text) AS BIGINT) AS len
  FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL
    AND text IS NOT NULL AND LENGTH(text) > 0),
chunks AS (
  SELECT doc_id, source, CAST(g.k AS BIGINT) AS chunk_idx,
         md5(substring(text, CAST(1 + g.k*384 AS INT), 512)) AS chunk_md5
  FROM d, LATERAL (SELECT UNNEST(generate_series(CAST(0 AS BIGINT),
                    (len - 1) // 384)) AS k) g),
keepers AS (
  SELECT chunk_md5,
         MIN(ROW(doc_id, chunk_idx)) AS keep
  FROM chunks GROUP BY chunk_md5),
flagged AS (
  SELECT c.source,
         CASE WHEN ROW(c.doc_id, c.chunk_idx) = k.keep THEN 1 ELSE 0 END
           AS is_keeper
  FROM chunks c JOIN keepers k USING (chunk_md5))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(is_keeper) AS BIGINT) AS n_unique,
       CAST(COUNT(*) - SUM(is_keeper) AS BIGINT) AS n_dup_dropped
FROM flagged GROUP BY source
"""


@register("pipeline_rag_prep", oracle=_RAG_ORACLE)
def pipeline_rag_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-indexing prep composite, one lazy plan: overlapping
    512/384 chunking (`text_chunk_overlap` semantics) -> chunk-level
    exact dedup (keep the lexicographically-first (doc_id, chunk_idx)
    owner of each content md5 — a total order, so the keeper set is
    deterministic under any partitioning) -> the per-source chunk
    ledger (total / unique / duplicate-dropped) a retrieval team
    reviews before building an index.

    Scale shape: chunking is a narrow bounded explode fused into the
    scan; the dedup stage shuffles (md5, doc_id, chunk_idx) triples —
    never chunk text; the keeper decision is one min_by-style
    aggregate per md5; the ledger is a two-column groupBy. The only
    corpus-sized shuffle carries 16-byte hashes.
    """
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
        & F.col("source").isNotNull()
        & (F.length("text") > 0)
    )
    chunks = d.withColumn(
        "chunk_idx",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr("(length(text) - 1) div 384").cast("bigint"),
            )
        ),
    ).select(
        "doc_id",
        "source",
        "chunk_idx",
        F.md5(
            F.expr("substring(text, int(1 + chunk_idx*384), 512)").cast("binary")
        ).alias("chunk_md5"),
    )
    keepers = chunks.groupBy("chunk_md5").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("keep")
    )
    flagged = chunks.join(keepers, "chunk_md5").select(
        "source",
        (
            (F.col("doc_id") == F.col("keep.doc_id"))
            & (F.col("chunk_idx") == F.col("keep.chunk_idx"))
        )
        .cast("bigint")
        .alias("is_keeper"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("is_keeper").alias("n_unique"),
        (F.count(F.lit(1)) - F.sum("is_keeper")).alias("n_dup_dropped"),
    )
