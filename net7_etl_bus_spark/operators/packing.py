"""Sequence packing: concat-and-chunk documents into fixed-length
token windows — the last operator every LLM pretraining pipeline runs
before the trainer sees data.

Semantics (the GPT-style "concat and chunk" packer): documents are
laid end-to-end in ``doc_id`` order into one global token stream;
the stream is cut every ``L`` tokens; a document whose span crosses a
cut belongs to every sequence it overlaps. The output is the packing
LEDGER — per sequence, how many documents touch it and how many
tokens it holds (== L for all but the final partial sequence) —
which is the shuffle-heavy part of packing; emitting the actual token
arrays is a narrow map over the same span assignment. Token counts
use the chars/4 estimator from ``text_token_count`` (integer
arithmetic, cross-engine exact). Contract: NULL ``doc_id`` / NULL or
empty ``text`` rows are dropped (a packer cannot place them), and
``doc_id`` is unique by the PK contract, so the order — and therefore
the packing — is total and deterministic.

100 TB shape — the global running sum is THE hazard here. A naive
``SUM OVER (ORDER BY doc_id)`` funnels every document through one
partition's sort (the exact anti-pattern the global-window plan guard
exists to catch). Instead this is a textbook two-level distributed
prefix sum, all DataFrame ops:

  1. bucket documents by ``doc_id`` range (monotone, so per-bucket
     order concatenates to global order) and cumsum WITHIN each
     bucket — a partitioned window, fully parallel;
  2. cumsum the per-bucket totals within SUPER-buckets of ``_B2``
     buckets — again partitioned, fully parallel;
  3. only the super-bucket totals — ``n_docs / (_B1 * _B2)`` rows,
     ~24 rows for 100 B documents — go through the one global
     window, then offsets broadcast back down.

The final explode is bounded: a document of ``t`` tokens lands in at
most ``t/L + 2`` sequences, so exploded rows ~= n_docs + total/L.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table, table_rows
from ..plans.registry import register

_L = 8192        # tokens per packed training sequence
_B1 = 65_536     # docs per level-1 prefix-sum bucket
_B2 = 65_536     # level-1 buckets per level-2 super-bucket


@register(
    "text_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(CEIL(LENGTH(text)/4.0) AS BIGINT) AS t
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL AND LENGTH(text) > 0),
    cum AS (SELECT doc_id, t,
                   CAST(SUM(t) OVER (ORDER BY doc_id) AS BIGINT) AS end_tok
            FROM toks),
    spans AS (SELECT doc_id, t, end_tok - t AS start_tok, end_tok FROM cum),
    ex AS (SELECT seq_id, start_tok, end_tok
           FROM spans, LATERAL (SELECT UNNEST(generate_series(
                start_tok // {_L}, (end_tok - 1) // {_L})) AS seq_id) g)
    SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEAST(end_tok, (seq_id+1)*{_L})
                    - GREATEST(start_tok, seq_id*{_L})) AS BIGINT) AS n_tokens
    FROM ex GROUP BY seq_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing ledger over ``documents``: seq_id -> (n_docs,
    n_tokens). The oracle states the same thing with a single-node
    running sum; the engine computes that sum as a two-level
    distributed prefix sum (module docstring). The token counter is a
    PARAMETER: :func:`pack_sequences_frame` packs any (doc_id, t)
    relation, so real BPE token counts from text_bpe_encode drop in
    without a new registry key (VERDICT r8 item 3; wired in
    tests/test_packing.py)."""
    d = load_table(spark, sf_dir, "documents")
    # Scale-adaptive level-1 bucket width (OPTIMIZATION_r13): the
    # prefix sum's VALUES are b1-invariant (any bucketing of a
    # monotone doc_id split concatenates to the same global running
    # sum), but its PARALLELISM is n_docs/b1 level-1 windows — with
    # the fixed 65536 width the whole corpus fell into ONE window
    # task below 65k documents. Aim for ~4 buckets per core, clamped
    # to the designed 65536 ceiling (which keeps the level-2/3
    # reduction shape at 100 TB; the floor keeps tiny fixtures in one
    # bucket). Derived from footer row counts + core count — no
    # constant tuned to either scale. A/B at sf0.1: med 0.94 s ->
    # 0.81 s (proto_cs2).
    n_docs = table_rows(sf_dir, "documents")
    if n_docs:
        target = 4 * spark.sparkContext.defaultParallelism
        b1 = max(64, min(_B1, -(-n_docs // target)))
    else:
        b1 = _B1
    return pack_sequences_frame(
        d.where(F.col("doc_id").isNotNull() & F.col("text").isNotNull()).select(
            "doc_id",
            F.ceil(F.length("text") / 4.0).cast("bigint").alias("t"),
        ),
        b1=b1,
    )


def pack_sequences_frame(
    toks: DataFrame, seq_len: int = _L, b1: int = _B1
) -> DataFrame:
    """:func:`text_pack_sequences`'s body over an ARBITRARY
    ``(doc_id, t)`` token-count relation (t = tokens per document; the
    registered key feeds the chars/4 estimator, a real pipeline feeds
    text_bpe_encode's exact per-document counts). ``doc_id`` must be
    non-null and unique (it IS the packing order); rows with t <= 0
    are dropped (a packer cannot place an empty document). ``b1`` is
    the level-1 bucket width — output-invariant, pure parallelism knob
    (see text_pack_sequences for the adaptive choice)."""
    toks = (
        toks.where(F.col("t") > 0)
        # floor() is monotone in doc_id, so per-bucket doc_id order
        # concatenates to the global order even for negative ids.
        .withColumn("b1", F.floor(F.col("doc_id") / b1))
    )
    _L = seq_len  # local shadow: the span math below reads _L

    # level 1: cumsum within each doc_id-range bucket (parallel)
    w1 = Window.partitionBy("b1").orderBy("doc_id")
    toks = toks.withColumn("cum1", F.sum("t").over(w1))

    # level 2: cumsum of bucket totals within super-buckets (parallel)
    t1 = toks.groupBy("b1").agg(F.sum("t").alias("bt"))
    t1 = t1.withColumn("b2", F.floor(F.col("b1") / _B2))
    w2 = (
        Window.partitionBy("b2")
        .orderBy("b1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t1 = t1.withColumn("off1", F.coalesce(F.sum("bt").over(w2), F.lit(0)))

    # level 3: the only global window — over super-bucket totals,
    # n_docs/(_B1*_B2) rows (single digits even at 100 B documents).
    t2 = t1.groupBy("b2").agg(F.sum("bt").alias("b2t"))
    w3 = Window.orderBy("b2").rowsBetween(Window.unboundedPreceding, -1)
    t2 = t2.withColumn("off2", F.coalesce(F.sum("b2t").over(w3), F.lit(0)))

    offs = t1.join(F.broadcast(t2.select("b2", "off2")), "b2").select(
        "b1", (F.col("off1") + F.col("off2")).alias("off")
    )

    spans = (
        toks.join(offs, "b1")
        .withColumn("end_tok", F.col("cum1") + F.col("off"))
        .withColumn("start_tok", F.col("end_tok") - F.col("t"))
    )
    ex = spans.select(
        F.explode(
            F.sequence(
                F.expr(f"start_tok DIV {_L}"), F.expr(f"(end_tok - 1) DIV {_L}")
            )
        ).alias("seq_id"),
        "start_tok",
        "end_tok",
    )
    return ex.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.least(F.col("end_tok"), (F.col("seq_id") + 1) * _L)
            - F.greatest(F.col("start_tok"), F.col("seq_id") * _L)
        ).alias("n_tokens"),
    )
